"""Property-based invariants for the distributed EWMA and the rank
family: pandas/pure-Python models drive random values (with nulls and
ties), alphas, group layouts, and bucket counts."""

import math

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dataframes_spark.operators.ewma import ewma
from dataframes_spark.operators.global_order import ntiles, rank_stats


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-1e4, 1e4, allow_nan=False)),
        min_size=1,
        max_size=60,
    ),
    alpha=st.floats(0.05, 1.0),
    n_groups=st.integers(1, 3),
    nb=st.sampled_from([1, 2, 5]),
)
def test_ewma_matches_pandas_under_any_layout(spark, vals, alpha, n_groups, nb):
    rows = [(i, i % n_groups, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, g long, v double")
    got = {
        r.k: r.ewma
        for r in ewma(df, "v", alpha, "k", by=["g"], n_buckets=nb).collect()
    }
    for g in range(n_groups):
        sub = pd.Series(
            [v for i, v in enumerate(vals) if i % n_groups == g],
            dtype=float,
        )
        want = sub.ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
        ks = [i for i in range(len(vals)) if i % n_groups == g]
        for k, w, v in zip(ks, want, sub):
            if pd.isna(v):
                assert got[k] is None, (k, got[k])
            else:
                assert got[k] == pytest.approx(w, rel=1e-9, abs=1e-12), k


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(0, 8)), min_size=1, max_size=50
    ),
    nb=st.sampled_from([2, 4]),
)
def test_rank_stats_matches_python_model(spark, vals, nb):
    df = spark.createDataFrame(list(enumerate(vals)), "k long, v bigint")
    got = {
        r.k: (r.rank, r.dense_rank, r.cume_dist)
        for r in rank_stats(df, "v", n_buckets=nb).collect()
    }
    key = lambda v: (-1 if v is None else v)  # nulls first
    n = len(vals)
    svals = sorted((key(v) for v in vals))
    distinct = sorted(set(svals))
    for i, v in enumerate(vals):
        kv = key(v)
        before = sum(1 for x in svals if x < kv)
        le = sum(1 for x in svals if x <= kv)
        dr = distinct.index(kv) + 1
        assert got[i] == (before + 1, dr, le / n), (i, v)


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(1, 40),
    tiles=st.integers(1, 12),
)
def test_ntile_uneven_split_law(spark, n, tiles):
    df = spark.range(n).select(F.col("id").alias("k"))
    got = {
        r.k: r.ntile for r in ntiles(df, tiles, "k", n_buckets=3).collect()
    }
    q, rem = divmod(n, tiles)
    # SQL law: first rem tiles take q+1 rows, the rest q
    sizes = [q + 1] * rem + [q] * (tiles - rem)
    pos = 0
    for t, size in enumerate(sizes, start=1):
        for _ in range(size):
            assert got[pos] == t, (n, tiles, pos)
            pos += 1
    assert pos == n


@settings(max_examples=10, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 6), st.booleans()), min_size=2, max_size=60
    ),
)
def test_auc_matches_pairwise_definition(spark, pairs):
    from dataframes_spark.ml import auc_roc

    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in pairs], "s double, y int"
    )
    got = auc_roc(df, "s", "y").first()
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        assert got.auc is None
        return
    num = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    assert got.auc == pytest.approx(num / (len(pos) * len(neg)), rel=1e-12)
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
