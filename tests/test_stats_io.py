"""Statistics + IO + entry-contract tests against the sf0.001 tables."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataframes_spark.functions import stats as dstats
from dataframes_spark.io import readers, writers
from dataframes_spark.session import load_table


def test_column_stats_shape(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = dstats.column_stats(li, "l_quantity").first()
    assert row.min == 1.0 and row.max == 50.0
    assert row.min <= row.median <= row.max
    assert row.var == pytest.approx(row.std**2, rel=1e-9)


def test_describe_rows_per_column(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = dstats.describe(li, ["l_quantity", "l_discount"])
    assert {r.column for r in out.collect()} == {"l_quantity", "l_discount"}


def test_correlation_self_is_one(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = dstats.correlations(li, ["l_quantity", "l_discount"])
    got = {(r.col_a, r.col_b): r.corr for r in out.collect()}
    assert got[("l_quantity", "l_quantity")] == pytest.approx(1.0)
    assert abs(got[("l_quantity", "l_discount")]) < 0.2


def test_describe_na_counts(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0), (3, None)], "i int, v double")
    out = {r.column: (r.null_count, r.null_ratio) for r in dstats.describe_na(df).collect()}
    assert out["v"] == (2, pytest.approx(2 / 3))
    assert out["i"] == (0, 0.0)


def test_csv_roundtrip_with_sniffing(spark, tmp_path):
    df = spark.createDataFrame([(1, "a,b", 1.5), (2, 'q"uote', None)], ["i", "s", "v"])
    path = str(tmp_path / "out.csv")
    writers.write_auto(df, path, single_file=True)
    back = readers.read_auto(spark, path)
    assert back.count() == 2
    assert {r.s for r in back.collect()} == {"a,b", 'q"uote'}


def test_parquet_roundtrip_and_format_detection(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], ["i", "s"])
    path = str(tmp_path / "t.parquet")
    writers.write_auto(df, path)
    assert readers.detect_format(path) == "parquet"
    assert readers.read_auto(spark, path).count() == 1


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


def test_feather_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x", 1.5), (2, "y", None)], ["i", "s", "v"])
    path = str(tmp_path / "t.feather")
    writers.write_auto(df, path)
    assert readers.detect_format(path) == "feather"
    back = readers.read_auto(spark, path)
    assert sorted((r.i, r.s, r.v) for r in back.collect()) == [
        (1, "x", 1.5),
        (2, "y", None),
    ]


def test_csv_inference_reference_precedence(spark, tmp_path):
    """Type deduction matrix (reference csv.cpp:30-41,153-188): INT64 for
    pure ints, DOUBLE when mixed with floats, STRING when any cell is
    non-numeric, TIMESTAMP for pure timestamps, STRING for
    timestamp+number conflicts, empty cells -> null."""
    csv = (
        "ints,mixed_num,mixed_str,ts,ts_conflict,with_empty\n"
        "1,1,1,2023-01-01 10:00:00,2023-01-01 10:00:00,5\n"
        "2,2.5,abc,2023-01-02 11:30:00,7,\n"
        "3,3,3,2023-01-03 12:00:00,2023-01-05 09:00:00,9\n"
    )
    path = str(tmp_path / "varied.csv")
    with open(path, "w") as fh:
        fh.write(csv)
    df = readers.read_csv(spark, path)
    types = dict(df.dtypes)
    assert types["ints"] == "bigint"          # INT64, not int32
    assert types["mixed_num"] == "double"     # DOUBLE over INT64
    assert types["mixed_str"] == "string"     # any string -> STRING
    assert types["ts"] == "timestamp"         # TIMESTAMP-first
    assert types["ts_conflict"] == "string"   # TIMESTAMP+number -> STRING
    assert types["with_empty"] == "bigint"
    rows = df.orderBy("ints").collect()
    assert rows[1].with_empty is None         # empty cell -> null


def test_concat_horizontal_pads_shorter_side(spark):
    from dataframes_spark.operators import reshape

    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["i", "s"])
    right = spark.createDataFrame([(10.0,), (20.0,)], ["v"])
    out = reshape.concat_horizontal(left, right, ["i"], ["v"]).orderBy("i")
    got = [(r.i, r.s, r.v) for r in out.collect()]
    # shorter side padded with nulls (reference Table.fromColumns,
    # Tests.cpp:1108-1123)
    assert got == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)]


def test_read_csv_text_inline(spark):
    """readText (reference src/IO.luna:91-92): parse in-memory CSV."""
    df = readers.read_csv_text(spark, "a,b\n1,x\n2,y\n")
    rows = sorted((r.a, r.b) for r in df.collect())
    assert rows == [(1, "x"), (2, "y")]
    assert dict(df.dtypes)["a"] in ("int", "bigint")


def _ref_quantile(values, q):
    """Python model of the reference midpoint rule (Analysis.cpp:19-37):
    h = N*q - 0.5 clamped to [0, N-1], lerp between sorted neighbors."""
    v = sorted(x for x in values if x is not None)
    n = len(v)
    h = min(max(n * q - 0.5, 0.0), float(n - 1))
    lo, hi = int(h // 1), -(-h // 1)
    return v[int(lo)] + (h - lo) * (v[int(hi)] - v[int(lo)])


def test_reference_quantile_matches_midpoint_rule(spark):
    import math

    from dataframes_spark.functions.stats import quantile

    data = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.0, None, 3.5]
    df = spark.createDataFrame([(x,) for x in data], ["v"])
    for q in (0.0, 0.1, 0.25, 0.5, 1.0 / 3.0, 0.75, 0.9, 1.0):
        got = quantile(df, "v", q, method="reference").first()["quantile"]
        want = _ref_quantile(data, q)
        assert math.isclose(got, want, rel_tol=1e-12), (q, got, want)
    # single-value column: every quantile is that value
    one = spark.createDataFrame([(7.5,)], ["v"])
    assert quantile(one, "v", 0.4, method="reference").first()["quantile"] == 7.5
    # default method matches Spark percentile
    ansi = quantile(df, "v", 0.5).first()["quantile"]
    want_ansi = df.selectExpr("percentile(v, 0.5) p").first()["p"]
    assert math.isclose(ansi, want_ansi, rel_tol=1e-12)


def test_reference_quantile_rejects_bad_args(spark):
    import pytest as _pytest

    from dataframes_spark.functions.stats import quantile

    df = spark.createDataFrame([(1.0,)], ["v"])
    with _pytest.raises(ValueError):
        quantile(df, "v", 0.5, method="nearest")
    with _pytest.raises(ValueError):
        quantile(df, "v", 1.5, method="reference")


def test_read_csv_text_quoted_multiline(spark):
    from dataframes_spark.io import readers

    # RFC-4180: quoted field containing a literal newline and an escaped
    # quote — a splitlines()-based parser breaks this
    text = 'a,b\n1,"line one\nline two"\n2,"say ""hi"""\n'
    df = readers.read_csv_text(spark, text)
    rows = {r.a: r.b for r in df.collect()}
    assert rows[1] == "line one\nline two"
    assert rows[2] == 'say "hi"'


def test_read_csv_text_row_equal_to_header_survives(spark):
    """Spark's Dataset[String] header mode drops EVERY line equal to the
    first; the driver-side header split must keep such data rows."""
    df = readers.read_csv_text(spark, "a,b\n1,2\na,b\n")
    rows = sorted((str(r.a), str(r.b)) for r in df.collect())
    assert rows == [("1", "2"), ("a", "b")]


def test_read_csv_text_huge_field(spark):
    """Fields beyond stdlib csv's default 128 KiB limit must parse (the
    limit is lifted for the record-splitting pass)."""
    big = "x" * 300_000
    df = readers.read_csv_text(spark, f'id,doc\n1,"{big}"\n')
    [r] = df.collect()
    assert len(r.doc) == 300_000


def test_read_csv_text_header_only(spark):
    df = readers.read_csv_text(spark, "a,b\n")
    assert df.columns == ["a", "b"] and df.count() == 0


def test_describe_quotes_awkward_column_names(spark):
    """A column named 'a-b' must be treated as an identifier, not parsed
    as the subtraction a - b (silently wrong stats)."""
    from dataframes_spark.functions import stats

    df = spark.createDataFrame([(1.0, 2.0, 5.0), (3.0, 4.0, 7.0)], ["a", "b", "a-b"])
    rows = {r.column: r for r in stats.describe(df).collect()}
    assert rows["a-b"].mean == 6.0  # NOT mean(a) - mean(b) == -1.0
    corr = {(r.col_a, r.col_b): r.corr for r in stats.correlations(df).collect()}
    assert abs(corr[("a", "a-b")] - 1.0) < 1e-12


def test_fill_na_validates_timestamp_fills(spark):
    import pytest

    from dataframes_spark.operators.nulls import fill_na

    df = spark.createDataFrame([(1, None)], "id int, ts timestamp")
    with pytest.raises(ValueError):
        fill_na(df, "n/a", subset=["ts"])
    [r] = fill_na(df, "2024-01-01 00:00:00", subset=["ts"]).collect()
    assert r.ts is not None


def test_from_columns_empty(spark):
    from dataframes_spark.core.table import Table

    t = Table.fromColumns(spark, {"x": [], "y": []})
    assert t.df.columns == ["x", "y"] and t.df.count() == 0


def test_write_parquet_sized_caps_file_rows(spark, sf_dir, tmp_path):
    from dataframes_spark.io.writers import write_parquet_sized
    from dataframes_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "sized")
    write_parquet_sized(ev, out, rows_per_file=1500, cluster_by=["user_id"])
    import glob
    import pyarrow.parquet as pq

    files = glob.glob(out + "/*.parquet")
    assert files, "no parquet files written"
    assert all(pq.ParquetFile(f).metadata.num_rows <= 1500 for f in files)
    # clustered footers: per-file user_id ranges must be narrow/disjointish,
    # i.e. strictly narrower than the global range on average
    back = spark.read.parquet(out)
    assert back.count() == ev.count()


def test_orc_and_jsonl_roundtrip(spark, tmp_path):
    """ORC and JSON lines route through Spark's native distributed
    readers/writers via extension detection — both directions."""
    from dataframes_spark.io import readers, writers

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, 'q"uote', 2.5)],
        ["id", "s", "v"],
    )
    for ext in ("orc", "jsonl"):
        path = str(tmp_path / f"t.{ext}")
        writers.write_auto(df, path)
        back = readers.read_auto(spark, path)
        got = sorted(
            (r.id, r.s, r.v) for r in back.select("id", "s", "v").collect()
        )
        assert got == [(1, "a", 1.5), (2, "b", None), (3, 'q"uote', 2.5)]


def test_jsonl_roundtrip_auto(spark, tmp_path):
    from dataframes_spark.io.readers import read_auto
    from dataframes_spark.io.writers import write_auto

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, 'b "quoted"', None)], ["id", "s", "v"]
    )
    path = str(tmp_path / "docs.jsonl")
    write_auto(df, path)
    back = read_auto(spark, path)
    got = {r["id"]: (r["s"], r["v"]) for r in back.collect()}
    assert got == {1: ("a", 1.5), 2: ('b "quoted"', None)}


def test_describe_qcut_auto_scale_resolution(spark):
    # exact=None resolves from Catalyst's size estimate: a small input
    # keeps reference-exact percentile; an input estimated over
    # AUTO_EXACT_MAX_BYTES plans the bounded-memory approx_percentile
    # form instead. Plan-only assertions — nothing executes.
    big = spark.range(200_000_000).select(F.col("id").cast("double").alias("v"))
    small = spark.range(1_000).select(F.col("id").cast("double").alias("v"))
    assert dstats._resolve_exact(small, None) is True
    assert dstats._resolve_exact(big, None) is False
    assert dstats._resolve_exact(big, True) is True  # explicit wins

    def plan(df) -> str:
        jqe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
        return jqe.explainString(mode)

    big_desc = plan(dstats.describe(big, ["v"]))
    assert "percentile_approx" in big_desc  # bounded-memory sketch aggregate
    # the exact path plans the distributed counts+rank lane, never the
    # value-buffering percentile aggregate (a percentile_approx DOES
    # appear in it — the global-order bucket bounds — but only steers
    # load balance; the answers are exact by construction)
    small_desc = plan(dstats.describe(small, ["v"]))
    assert "percentile(" not in small_desc and "__dq_" in small_desc

    big_qcut = plan(dstats.qcut(big, "v", 4))
    assert "percentile_approx" in big_qcut
    small_qcut = plan(dstats.qcut(small, "v", 4))
    assert "percentile_approx" not in small_qcut and "percentile(" in small_qcut


def test_exact_quantiles_bit_identical_to_percentile(spark):
    # the distributed exact-quantile lane must reproduce the percentile
    # aggregate BIT for BIT: same-entry targets return the raw value,
    # split targets use Spark's weighted interpolation
    import random

    random.seed(11)
    rows = [
        (
            random.choice([None, float(random.randint(-3, 3))]),
            random.uniform(-1e9, 1e9),
            random.choice([1.5] * 5 + [2.5]),
        )
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    got = {
        r["__dq_name"]: [r[f"__dq_q{i}"] for i in range(len(qs))]
        for r in dstats._exact_quantiles(df, ["a", "b", "c"], qs).collect()
    }
    qlist = ", ".join(f"{q!r}D" for q in qs)
    for c in ("a", "b", "c"):
        ref = df.agg(F.expr(f"percentile({c}, array({qlist}))")).first()[0]
        assert got[c] == list(ref), c
    # all-null column still gets its anchor row, with NULL quantiles —
    # exactly the NULL the percentile aggregate returns (and the anchor
    # is what lets describe INNER-join without losing the row)
    nul = df.select(F.lit(None).cast("double").alias("z"))
    anchor = dstats._exact_quantiles(nul, ["z"], [0.5]).collect()
    assert len(anchor) == 1 and anchor[0]["__dq_q0"] is None
    out = {r["column"]: r for r in dstats.describe(nul, ["z"], exact=True).collect()}
    assert out["z"]["median"] is None and out["z"]["mean"] is None
