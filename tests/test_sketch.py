"""Count-min sketch properties (operators/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_store_read,
    cms_store_update,
    heavy_hitters,
)


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish: key k appears 200//k times, k = 1..40 -> 200, 100, 66...
    rows = [(f"k{k}",) for k in range(1, 41) for _ in range(200 // k)]
    return spark.createDataFrame(rows, "v string")


def _true_counts(df):
    return {
        r.v: r.n for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()
    }


def test_estimate_never_undercounts_and_exact_when_wide(spark, stream):
    true = _true_counts(stream)
    items = stream.select("v").distinct()
    # narrow sketch: collisions guaranteed (40 keys x 8 buckets)
    sk = cms_build(stream, "v", depth=3, width=8)
    est = {r.v: r.est for r in cms_estimate(sk, items, "v", depth=3, width=8).collect()}
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)
    # wide sketch: no collisions -> exact
    skw = cms_build(stream, "v", depth=4, width=4096)
    estw = {
        r.v: r.est
        for r in cms_estimate(skw, items, "v", depth=4, width=4096).collect()
    }
    assert estw == true


def test_merge_equals_whole(spark, stream):
    a = stream.filter(F.length("v") == 2)  # k1..k9
    b = stream.filter(F.length("v") == 3)  # k10..k40
    merged = cms_merge(
        cms_build(a, "v", depth=3, width=32), cms_build(b, "v", depth=3, width=32)
    )
    whole = cms_build(stream, "v", depth=3, width=32)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_heavy_hitters_no_misses(spark, stream):
    true = _true_counts(stream)
    hh = {r.v for r in heavy_hitters(stream, "v", 50, depth=3, width=64).collect()}
    assert {k for k, n in true.items() if n >= 50} <= hh


def test_weighted_and_null_stream(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 3), ("b", 2), (None, 99)], "v string, w long"
    )
    sk = cms_build(df, "v", depth=2, width=128, weight_col="w")
    est = {
        r.v: r.est
        for r in cms_estimate(
            sk, df.select("v").distinct().dropna(), "v", depth=2, width=128
        ).collect()
    }
    assert est == {"a": 8, "b": 2}


def test_md5_lane_matches_independent_arithmetic(spark):
    import hashlib

    df = spark.createDataFrame([("x",), ("x",), ("y",)], "v string")
    sk = cms_build(df, "v", depth=2, width=16, lane_hash="md5")
    cells = {(r.d, r.bucket): r.cnt for r in sk.collect()}
    for val, n in (("x", 2), ("y", 1)):
        for d in range(2):
            b = int(hashlib.md5(f"{d}:{val}".encode()).hexdigest()[:15], 16) % 16
            assert cells[(d, b)] >= n


def test_sketch_plan_shape(spark, stream):
    """Build keeps map-side partial aggregation; estimate broadcasts the
    sketch side and never shuffles the probe frame."""
    sk = cms_build(stream, "v", depth=3, width=32)
    bp = sk._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in bp or "HashAggregate" in bp
    est = cms_estimate(sk, stream.select("v").distinct(), "v", depth=3, width=32)
    ep = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in ep
    assert "SortMergeJoin" not in ep


def test_incremental_store_equals_whole(spark, stream):
    a = stream.filter(F.length("v") == 2)
    b = stream.filter(F.length("v") == 3)
    table = "cms_store_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    r1 = cms_store_update(spark, table, cms_build(a, "v", depth=3, width=32))
    r2 = cms_store_update(spark, table, cms_build(b, "v", depth=3, width=32))
    assert r2["total"] == stream.count() and r2["total"] > r1["total"]
    store = cms_store_read(spark, table)
    whole = cms_build(stream, "v", depth=3, width=32)
    assert store.exceptAll(whole).count() == 0
    assert whole.exceptAll(store).count() == 0
    # estimates probe the store exactly like a fresh sketch
    true = _true_counts(stream)
    est = {
        r.v: r.est
        for r in cms_estimate(
            store, stream.select("v").distinct(), "v", depth=3, width=32
        ).collect()
    }
    assert all(est[k] >= true[k] for k in true)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_validation(spark, stream):
    with pytest.raises(ValueError, match="depth"):
        cms_build(stream, "v", depth=0)
    with pytest.raises(ValueError, match="lane_hash"):
        cms_build(stream, "v", lane_hash="sha1")
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()
