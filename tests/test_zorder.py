"""Z-order clustered writes (io/writers.py with_zorder_key / write_zordered).

The locality test reads parquet FOOTER statistics with pyarrow: after a
z-ordered write, every file's [min, max] interval is narrow in BOTH
z-columns at once, where single-key clustering leaves the second column
spanning ~the full range in every file. That interval width IS the scan
economics: a filter skips a file iff the predicate misses its interval.
"""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dataframes_spark.io.writers import with_zorder_key, write_parquet_sized, write_zordered
from dataframes_spark.session import load_table


def _mean_width(files, col):
    """Mean per-file (max-min) extent of col, normalized by the global
    extent across files."""
    stats = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        stats.append((lo, hi))
    glo = min(s[0] for s in stats)
    ghi = max(s[1] for s in stats)
    if ghi == glo:
        return 0.0
    return sum((hi - lo) for lo, hi in stats) / len(stats) / (ghi - glo)


def _pq_files(path):
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]


def test_zorder_locality_beats_single_key_clustering(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "z")
    cpath = str(tmp_path / "c")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], bits=6, n_files=8)
    # single-key RANGE clustering: the strongest one-column layout
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(cpath)
    )
    zf, cf = _pq_files(zpath), _pq_files(cpath)
    assert len(zf) == 8
    # z-order: BOTH columns narrow per file
    zw_o = _mean_width(zf, "l_orderkey")
    zw_p = _mean_width(zf, "l_partkey")
    assert zw_o < 0.6, zw_o
    assert zw_p < 0.6, zw_p
    # single-key clustering: its key is narrow, the other column is not
    cw_o = _mean_width(cf, "l_orderkey")
    cw_p = _mean_width(cf, "l_partkey")
    assert cw_o < 0.6, cw_o
    assert cw_p > 0.8, cw_p


def test_zorder_roundtrip_content_identical(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "rt")
    write_zordered(li, path, ["l_orderkey", "l_partkey"], bits=6, n_files=4)
    back = spark.read.parquet(path)
    assert back.schema == li.schema
    assert back.count() == li.count()
    # content equality: anti-diff both ways (no collect of the table)
    assert back.exceptAll(li).count() == 0
    assert li.exceptAll(back).count() == 0


def test_zorder_key_null_bands_zero(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (0.0, None), (5.0, 5.0)], "a double, b double"
    )
    out = with_zorder_key(df, ["a", "b"], bits=2)
    rows = {(r.a, r.b): r["__z"] for r in out.collect()}
    # null in a column contributes 0 bits on that axis; the all-present
    # max row has the largest key
    assert rows[(5.0, 5.0)] == max(rows.values())
    assert rows[(None, 1.0)] >= 0


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    with pytest.raises(ValueError, match="2-8 columns"):
        with_zorder_key(df, ["a"])
    with pytest.raises(ValueError, match="fit a long"):
        with_zorder_key(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="collides"):
        with_zorder_key(df.withColumnRenamed("b", "__z"), ["a", "__z"])


def test_zorder_plan_stays_jvm(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    keyed = with_zorder_key(li, ["l_orderkey", "l_partkey"], bits=6)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # boundaries ride as a broadcast join, not a collected literal
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
