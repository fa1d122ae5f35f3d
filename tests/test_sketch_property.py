"""Property tests for the sketch family (operators/sketch.py): the
guarantees users actually rely on, under arbitrary streams and splits —
CMS never undercounts, HLL merge-of-any-split equals the whole and the
estimate is partitioning-invariant, bottom-k membership equals the k
smallest under the fixed permutation."""

import hashlib

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dataframes_spark.operators.sketch import (
    bottomk_build,
    cms_build,
    cms_estimate,
    hll_build,
    hll_estimate,
    hll_merge,
)

keys = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=1, max_size=60
)


@settings(max_examples=10, deadline=None)
@given(vals=keys)
def test_cms_never_undercounts_any_stream(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = cms_build(df, "v", depth=2, width=8)  # narrow: force collisions
    est = {
        r.v: r.est
        for r in cms_estimate(
            sk, df.select("v").distinct(), "v", depth=2, width=8
        ).collect()
    }
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1
    assert all(est[v] >= n for v, n in true.items())


@settings(max_examples=8, deadline=None)
@given(vals=keys, cut=st.integers(min_value=0, max_value=59))
def test_hll_split_merge_invariance(spark, vals, cut):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    a = df.limit(0) if cut == 0 else spark.createDataFrame(
        [(v,) for v in vals[:cut]], "v string"
    )
    b = spark.createDataFrame([(v,) for v in vals[cut:] or vals[:0]], "v string") \
        if vals[cut:] else df.limit(0)
    whole = hll_build(df, "v", p=6)
    parts = [hll_build(x, "v", p=6) for x in (a, b) if x is not None]
    merged = hll_merge(*parts)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # estimate is a pure function of the registers -> split-invariant
    e1 = hll_estimate(merged, p=6).collect()[0].est_ndv
    e2 = hll_estimate(whole, p=6).collect()[0].est_ndv
    assert e1 == e2
    # and within generous bounds of the truth (1.04/sqrt(64) ~ 13% rse)
    ndv = len(set(vals))
    assert abs(e1 - ndv) <= max(3.0, 0.55 * ndv)


@settings(max_examples=8, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                    max_size=40, unique=True),
       k=st.integers(min_value=1, max_value=10))
def test_bottomk_is_k_smallest_under_permutation(spark, ids, k):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = sorted(
        (r.rnk, r.id) for r in bottomk_build(df, "id", k, salt="p").collect()
    )
    perm = sorted((hashlib.md5(f"{i}/p".encode()).hexdigest(), i) for i in ids)
    expect = [(n + 1, i) for n, (_, i) in enumerate(perm[:k])]
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    cut=st.integers(min_value=0, max_value=500),
    k=st.integers(min_value=1, max_value=5),
)
def test_weighted_merge_law_any_split(spark, rows, cut, k):
    """Merging per-batch weighted top-k frames equals the one-shot
    weighted sample for ANY split point, any weights, any k — the
    invariant weighted_store_update rests on. Also idempotent:
    refolding a batch never changes the result (the ES key is a pure
    function of (id, weight), so dropDuplicates removes refolds)."""
    from dataframes_spark.operators.sample import (
        weighted_sample_merge,
        weighted_sample_topk,
    )

    df = spark.createDataFrame(rows, "id long, w int")
    a = df.filter(F.col("id") < cut)
    b = df.filter(F.col("id") >= cut)
    whole = weighted_sample_topk(df, "w", "id", k=k, salt="p")
    ka = weighted_sample_topk(a, "w", "id", k=k, salt="p")
    kb = weighted_sample_topk(b, "w", "id", k=k, salt="p")
    merged = weighted_sample_merge(ka, kb, key_col="id", k=k)
    refold = weighted_sample_merge(merged, kb, key_col="id", k=k)
    want = sorted(map(tuple, whole.collect()))
    assert sorted(map(tuple, merged.collect())) == want
    assert sorted(map(tuple, refold.collect())) == want
