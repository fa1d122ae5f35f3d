"""Parquet layout observability (io/layout.py): the footer-stats report
and predicate skip-rate estimation — the metric that makes
write_zordered / write_partitioned layout quality measurable without
scanning data."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.io.layout import layout_report, skip_rate
from dataframes_spark.io.writers import write_zordered


@pytest.fixture(scope="module")
def frames(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("layout")
    df = spark.range(20_000).select(
        F.col("id").alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(20_000)).alias("b"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("s"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    plain = str(d / "plain")
    zord = str(d / "zord")
    df.repartition(8).write.parquet(plain)
    write_zordered(df, zord, ["a", "b"], n_files=8)
    return df, plain, zord


def test_report_matches_footer_truth(spark, frames):
    import pyarrow.parquet as pq

    _df, plain, _z = frames
    rep = layout_report(spark, plain).filter(F.col("col") == "a").collect()
    assert len(rep) == 8
    for r in rep:
        md = pq.ParquetFile(r.file).metadata
        lo = min(
            md.row_group(g).column(0).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(0).statistics.max
            for g in range(md.num_row_groups)
        )
        assert r.nmin == float(lo) and r.nmax == float(hi)
        assert r.rows == md.num_rows and r.nulls == 0


def test_report_strings_and_nulls(spark, frames):
    _df, plain, _z = frames
    rep = layout_report(spark, plain)
    srow = rep.filter(F.col("col") == "s").first()
    # string stats land in the repr lane, not the numeric lane
    assert srow.min_repr is not None and srow.nmin is None
    nulls = (
        rep.filter(F.col("col") == "v").agg(F.sum("nulls")).first()[0]
    )
    assert nulls == 2_000  # every 10th row


def test_zorder_skips_where_plain_cannot(spark, frames):
    _df, plain, zord = frames
    pr = skip_rate(layout_report(spark, plain), "b", 2_000.0, 4_000.0)
    zr = skip_rate(layout_report(spark, zord), "b", 2_000.0, 4_000.0)
    # plain files are hash-spread: every file spans nearly [0, 20k]
    assert pr["skip_fraction"] == 0.0
    # z-ordered files are clustered on (a, b): most files miss the range
    assert zr["skip_fraction"] >= 0.5
    assert zr["rows_skippable"] > 0
    assert pr["files"] == zr["files"] == 8
    assert pr["rows_total"] == zr["rows_total"] == 20_000


def test_skip_rate_one_sided_and_missing(spark, frames):
    _df, _plain, zord = frames
    rep = layout_report(spark, zord)
    everything = skip_rate(rep, "b", None, None)
    assert everything["skippable"] == 0  # unbounded range skips nothing
    above_all = skip_rate(rep, "b", 1e12, None)
    assert above_all["skip_fraction"] == 1.0  # range above every max
    missing = skip_rate(rep, "no_such_col", 0.0, 1.0)
    assert missing["files"] == 0 and missing["skip_fraction"] == 0.0


def test_remote_uri_rejected_up_front(spark):
    """Remote URIs must fail with a clear message, not 'no parquet
    files' (r8 ADVICE: os.walk silently yields nothing for s3://)."""
    from dataframes_spark.io.layout import layout_report

    for uri in ("s3://bucket/table", "hdfs://nn/table", "dbfs:/x"):
        with pytest.raises(ValueError, match="local filesystem"):
            layout_report(spark, uri)


def test_column_filter_and_validation(spark, frames):
    _df, plain, _z = frames
    rep = layout_report(spark, plain, columns=["a"])
    assert {r.col for r in rep.select("col").distinct().collect()} == {"a"}
    with pytest.raises(ValueError, match="no parquet files"):
        layout_report(spark, "/tmp/definitely_not_a_table_dir_xyz")
