"""Distributed histogram (functions/stats.py histogram): bin edges,
closed-last-bin rule, null dropping, constant-column collapse."""

import pytest

from dataframes_spark.functions import stats


def test_histogram_basic(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    out = {r.bin: r for r in stats.histogram(df, "x", bins=10).collect()}
    assert len(out) == 10
    assert sum(r.n for r in out.values()) == 100
    assert out[0].lo == 0.0 and out[0].hi == 9.9
    # 99.0 is the max: exactly at the top edge, lands in the LAST bin
    assert out[9].n == 10


def test_histogram_nulls_dropped_and_constant(spark):
    df = spark.createDataFrame([(5.0,), (5.0,), (None,)], ["x"])
    rows = stats.histogram(df, "x", bins=4).collect()
    assert len(rows) == 1
    assert rows[0].bin == 0 and rows[0].n == 2
    assert rows[0].lo == 5.0 and rows[0].hi == 5.0


def test_histogram_sparse_bins_absent(spark):
    df = spark.createDataFrame([(0.0,), (100.0,)], ["x"])
    rows = {r.bin: r.n for r in stats.histogram(df, "x", bins=10).collect()}
    assert rows == {0: 1, 9: 1}  # middle bins absent, not zero


def test_histogram_rejects_bad_bins(spark):
    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError):
        stats.histogram(df, "x", bins=0)
