"""Distributed global-order lane (operators/global_order.py): the
partition-free shift/interpolate/rolling forms must produce EXACTLY the
single-partition window's answers while never sorting the data on one
reducer. Each test compares the distributed lane against the legacy
global-window construction on data crafted to cross bucket boundaries
(tiny bucket counts, boundary-spanning null runs, frames wider than a
bucket)."""

import pandas as pd
import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataframes_spark.operators import global_order as go
from dataframes_spark.operators import nulls as dnulls
from dataframes_spark.operators import window as dwindow
from dataframes_spark.operators.aggregate import build_aggregate


@pytest.fixture(scope="module")
def seq_df(spark):
    """2000 rows, unique bigint order key, ~25% nulls in value, irregular
    timestamps — enough rows that the 8-shuffle-partition default yields
    real multi-bucket layouts."""
    import random

    random.seed(11)
    rows = [
        (
            i,
            random.random() * 100 if random.random() > 0.25 else None,
            1_700_000_000_000_000 + i * 537_000_000 + random.randint(0, 1000),
        )
        for i in range(2000)
    ]
    return (
        spark.createDataFrame(rows, "id bigint, value double, ts_us bigint")
        .withColumn("ts", F.timestamp_micros("ts_us"))
    )


def _same(a, b, keys):
    pa = a.orderBy(*keys).toPandas()
    pb = b.orderBy(*keys).toPandas()
    pd.testing.assert_frame_equal(pa, pb, check_dtype=False, atol=1e-9)


@pytest.mark.parametrize("periods", [1, 3, -1, -4])
def test_shift_matches_global_window(seq_df, periods):
    col = f"value_shift_{periods}"
    got = go.shift_global(seq_df, "value", periods, "id").select("id", col)
    w = W.orderBy("id")
    expr = (
        F.lag("value", periods).over(w)
        if periods >= 0
        else F.lead("value", -periods).over(w)
    )
    want = seq_df.withColumn(col, expr).select("id", col)
    _same(got, want, ["id"])


def test_shift_tiny_buckets_smaller_than_k(spark):
    # k=3 with 2-row buckets: the needed row is often 2+ buckets back —
    # the export-last-k-per-bucket proof must hold, not just adjacency
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id bigint, v double")
    got = go.shift_global(df, "v", 3, "id", n_buckets=5).select("id", "v_shift_3")
    want = df.withColumn("v_shift_3", F.lag("v", 3).over(W.orderBy("id"))).select(
        "id", "v_shift_3"
    )
    _same(got, want, ["id"])


def test_interpolate_matches_global_window(seq_df):
    got = dnulls.interpolate(seq_df, ["value"], "id").select("id", "value")
    # legacy construction, inlined (the library now routes to the lane)
    base = W.orderBy("id")
    w_back = base.rowsBetween(W.unboundedPreceding, 0)
    w_fwd = base.rowsBetween(0, W.unboundedFollowing)
    v = F.col("value").cast("double")
    tmp = seq_df.withColumn("__pos", F.row_number().over(base))
    pos = F.col("__pos")
    pv = F.last(v, ignorenulls=True).over(w_back)
    nv = F.first(v, ignorenulls=True).over(w_fwd)
    pp = F.last(F.when(v.isNotNull(), pos), ignorenulls=True).over(w_back)
    np_ = F.first(F.when(v.isNotNull(), pos), ignorenulls=True).over(w_fwd)
    lerp = pv + (nv - pv) * (pos - pp) / (np_ - pp)
    filled = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(lerp)
    )
    want = tmp.withColumn("value", filled).select("id", "value")
    _same(got, want, ["id"])


def test_interpolate_null_run_spans_buckets(spark):
    # a null run longer than a whole bucket: the lerp endpoints live 2+
    # buckets apart and must arrive via the cross-bucket edge carry
    rows = [(0, 10.0)] + [(i, None) for i in range(1, 9)] + [(9, 100.0)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    out = go.interpolate_global(df, ["v"], "id", n_buckets=5)
    got = {r["id"]: r["v"] for r in out.collect()}
    for i in range(10):
        assert got[i] == pytest.approx(10.0 + i * 10.0)


def test_interpolate_all_null_column_stays_null(spark):
    df = spark.createDataFrame(
        [(i, None) for i in range(10)], "id bigint, v double"
    )
    out = go.interpolate_global(df, ["v"], "id", n_buckets=4)
    assert all(r["v"] is None for r in out.collect())


def test_interpolate_edge_fills(spark):
    # leading nulls take first valid, trailing take last valid
    # (reference Tests.cpp:1023-1033) — across bucket edges
    rows = [(0, None), (1, None), (2, 5.0), (3, None), (4, 7.0), (5, None), (6, None)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = {r["id"]: r["v"] for r in go.interpolate_global(df, ["v"], "id", n_buckets=4).collect()}
    assert got[0] == got[1] == 5.0
    assert got[3] == pytest.approx(6.0)
    assert got[5] == got[6] == 7.0


@pytest.mark.parametrize("inclusive", [True, False])
def test_rolling_interval_matches_global_window(seq_df, inclusive):
    cols = ["id", "value_sum", "value_length", "value_min", "value_max"]
    got = dwindow.rolling_interval(
        seq_df,
        "ts",
        3600 * 1_000_000,
        [("value", ["sum", "length", "min", "max"])],
        inclusive_left=inclusive,
    ).select(*cols)
    order = F.unix_micros(F.col("ts"))
    lo = -3600 * 1_000_000 if inclusive else -3600 * 1_000_000 + 1
    fr = W.orderBy(order).rangeBetween(lo, 0)
    exprs = [
        build_aggregate(fn, "value", wrap=lambda e, f=fr: e.over(f))
        for fn in ("sum", "length", "min", "max")
    ]
    want = seq_df.select("*", *exprs).select(*cols)
    _same(got, want, ["id"])


def test_rolling_window_wider_than_bucket(spark):
    # width >= the whole key span: fixed-width bucketing must widen the
    # buckets (bw = max(width, span/n)) so ghosts stay one-bucket-deep;
    # here that degenerates to one bucket and still matches
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(50)], "k bigint, v double"
    )
    got = go.rolling_range_global(df, F.col("k"), 100, [("v", ["sum"])], n_buckets=8)
    fr = W.orderBy(F.col("k")).rangeBetween(-100, 0)
    want = df.select("*", build_aggregate("sum", "v", wrap=lambda e, f=fr: e.over(f)))
    _same(got.select("k", "v_sum"), want.select("k", "v_sum"), ["k"])


def test_rolling_rows_matches_global_window(seq_df):
    got = dwindow.rolling_rows(seq_df, "value", 100, ["sum", "rsi"], "id").select(
        "id", "value_sum", "value_rsi"
    )
    fr = W.orderBy("id").rowsBetween(-99, 0)
    exprs = [
        build_aggregate(fn, "value", wrap=lambda e, f=fr: e.over(f))
        for fn in ("sum", "rsi")
    ]
    want = seq_df.select("*", *exprs).select("id", "value_sum", "value_rsi")
    _same(got, want, ["id"])


def test_rolling_rows_frame_wider_than_buckets(spark):
    # n-row frame reaching several buckets back: ghosts come from the
    # offsets join (positional, not adjacency)
    df = spark.createDataFrame([(i, 1.0) for i in range(20)], "id bigint, v double")
    got = go.rolling_rows_global(df, "v", 7, ["length"], "id", n_buckets=6)
    fr = W.orderBy("id").rowsBetween(-6, 0)
    want = df.select("*", build_aggregate("length", "v", wrap=lambda e, f=fr: e.over(f)))
    _same(got.select("id", "v_length"), want.select("id", "v_length"), ["id"])


def test_partitioned_calls_keep_plain_window(seq_df):
    # an explicit partition_by must NOT route through the bucketed lane
    out = dwindow.shift(
        seq_df.withColumn("g", F.col("id") % 4), "value", 1, "id", partition_by=["g"]
    )
    assert "__go_b" not in out._jdf.queryExecution().toString()


def test_string_order_key_falls_back(spark):
    # non-bucketable order key: legacy global window (inherent semantics)
    df = spark.createDataFrame([(chr(97 + i), float(i)) for i in range(5)], "k string, v double")
    out = dwindow.shift(df, "v", 1, "k")
    got = {r["k"]: r["v_shift_1"] for r in out.collect()}
    assert got["a"] is None and got["b"] == 0.0 and got["e"] == 3.0


def test_edge_ghost_lane_adversarial_bucket_populations(spark):
    """The tail-carry boundary exchange (r9: _with_edge_ghosts replaces
    the offsets pass) must equal the single-partition window for ANY
    bucket count — more buckets than rows, duplicate-key quantile
    collapse, nulls in the value column, frames spanning several tiny
    buckets, lag and lead."""
    from pyspark.sql import Window as W

    from dataframes_spark.operators.global_order import (
        rolling_rows_global,
        shift_global,
    )

    rows = [(i, float(i % 5) if i % 7 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v double")

    def truth_shift(p):
        w = W.orderBy("k")
        e = F.lag("v", p).over(w) if p > 0 else F.lead("v", -p).over(w)
        return {r.k: r.s for r in df.withColumn("s", e).collect()}

    def truth_roll(n):
        # single-partition truth with the SAME reference aggregate
        # semantics (all-null-frame sum = 0.0, length counts nulls)
        from dataframes_spark.operators.aggregate import build_aggregate

        w = W.orderBy("k").rowsBetween(-(n - 1), 0)
        s = build_aggregate("sum", "v", wrap=lambda e: e.over(w)).alias("v_sum")
        c = build_aggregate("length", "v", wrap=lambda e: e.over(w)).alias(
            "v_length"
        )
        return {r.k: (r.v_sum, r.v_length) for r in df.select("k", s, c).collect()}

    for nb in (2, 7, 300):  # 300 buckets over 200 rows: most are empty
        for p in (1, 3, -2):
            got = {
                r.k: r[f"v_shift_{p}"]
                for r in shift_global(df, "v", p, "k", n_buckets=nb).collect()
            }
            assert got == truth_shift(p), (nb, p)
        for n in (1, 5, 150):  # 150-row frame chains through many buckets
            got = {
                r.k: (r.v_sum, r.v_length)
                for r in rolling_rows_global(
                    df, "v", n, ["sum", "length"], "k", n_buckets=nb
                ).collect()
            }
            for k, (ws, wc) in truth_roll(n).items():
                gs, gc = got[k]
                assert gc == wc, (nb, n, k)
                assert (gs is None) == (ws is None), (nb, n, k)
                if gs is not None:
                    assert abs(gs - ws) < 1e-9, (nb, n, k)

    # 94% duplicate keys: quantile boundaries collapse to one value and
    # most buckets are empty; count frames are tie-order independent
    rows2 = [(5, float(i)) for i in range(50)] + [(1, 0.5), (9, 2.5), (9, 3.5)]
    df2 = spark.createDataFrame(rows2, "k long, v double")
    w10 = W.orderBy("k").rowsBetween(-9, 0)
    want = sorted(
        r.c for r in df2.select(F.count(F.lit(1)).over(w10).alias("c")).collect()
    )
    for nb in (2, 40):
        out = rolling_rows_global(df2, "v", 10, ["length"], "k", n_buckets=nb).collect()
        assert sorted(int(r.v_length) for r in out) == [int(x) for x in want], nb


def test_percent_ranks_match_window_function(spark):
    """Distributed percent_rank == the single-reducer window form,
    including tie groups and the single-row 0.0 convention."""
    from pyspark.sql import Window as W

    from dataframes_spark.operators.global_order import percent_ranks

    df = spark.range(0, 1000).select(
        ((F.col("id") * 37) % 250).alias("v"),  # 4-way ties everywhere
        F.col("id").alias("k"),
    )
    got = {
        r["k"]: r["pr"]
        for r in percent_ranks(df, "v", n_buckets=8, out_col="pr").collect()
    }
    w = W.orderBy("v")
    want = {
        r["k"]: r["pr"]
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    assert got == want

    one = spark.createDataFrame([(5, 1)], "v long, k long")
    assert percent_ranks(one, "v").collect()[0]["percent_rank"] == 0.0


def test_percent_ranks_null_keys_tie_first(spark):
    """Null order keys form one tie group ranked first (Spark's
    asc-nulls-first order), and survive the null-safe join."""
    from dataframes_spark.operators.global_order import percent_ranks

    df = spark.createDataFrame(
        [(None, 1), (None, 2), (1.0, 3), (2.0, 4), (2.0, 5)],
        "v double, k long",
    )
    got = {r["k"]: r["percent_rank"] for r in percent_ranks(df, "v").collect()}
    assert got == {1: 0.0, 2: 0.0, 3: 0.5, 4: 0.75, 5: 0.75}
