"""Property-based invariants for the continuous aggregate
(operators/rollup.py): a pure-Python bucket model drives the one-shot
rollup, and the merge law (finalize(merge(parts)) == finalize(one-shot))
holds under arbitrary splits and widths — the in-memory form of the
store fold law, cheap enough for hypothesis (no table writes)."""

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dataframes_spark.operators import rollup as R

_BASE = 1_700_000_000_000_000


def _mk(spark, rows):
    df = spark.createDataFrame(
        [(i, e, v) for i, (e, v) in enumerate(rows)], "k long, e long, v double"
    )
    return df.select(
        "k", F.timestamp_micros(F.col("e") + _BASE).alias("ts"), "v"
    )


def _model(rows, w_us):
    out = {}
    for e, v in rows:
        b = (e + _BASE) - (e + _BASE) % w_us
        st_ = out.setdefault(b, [0, 0, 0.0, None, None])
        st_[0] += 1
        if v is not None:
            st_[1] += 1
            st_[2] += v
            st_[3] = v if st_[3] is None else min(st_[3], v)
            st_[4] = v if st_[4] is None else max(st_[4], v)
    return out


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000_000_000),
            st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
        ),
        min_size=1,
        max_size=60,
    ),
    width=st.sampled_from(["1 minute", "15 minutes", "1 hour", "1 day"]),
    n_parts=st.integers(1, 4),
)
def test_merge_law_matches_python_model(spark, rows, width, n_parts):
    w_us = R.width_us(width)
    df = _mk(spark, rows)
    parts = [
        R.rollup(df.filter(F.col("k") % n_parts == i), "ts", "v", width)
        for i in range(n_parts)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    got = {
        int(r.bucket_ts.timestamp() * 1_000_000): r
        for r in R.rollup_finalize(
            R.rollup_merge(u),
            stats=("count", "n_rows", "sum", "min", "max"),
        ).collect()
    }
    want = _model(rows, w_us)
    assert got.keys() == want.keys()
    for b, (n_rows, n, s, mn, mx) in want.items():
        g = got[b]
        assert (g["n_rows"], g["count"]) == (n_rows, n)
        if n == 0:
            assert g["sum"] is None and g["min"] is None and g["max"] is None
        else:
            assert g["min"] == mn and g["max"] == mx
            assert g["sum"] == pytest.approx(s, rel=1e-9, abs=1e-9)


@settings(max_examples=8, deadline=None)
@given(
    us=st.lists(st.integers(0, 40), min_size=1, max_size=80),
    n_parts=st.integers(1, 3),
)
def test_distinct_registers_fold_equals_one_shot(spark, us, n_parts):
    """HLL register max-merge over any split == the one-shot registers
    (and therefore identical estimates) — the in-memory distinct fold
    law, plus idempotence under duplicating one part."""
    from dataframes_spark.operators.sketch import hll_merge

    rows = [(i, e) for i, e in enumerate(us)]
    df = spark.createDataFrame(rows, "k long, u long").select(
        "k",
        F.timestamp_micros(
            F.lit(_BASE) + (F.col("k") % 2) * 3_600_000_000
        ).alias("ts"),
        "u",
    )
    one = R.rollup_distinct(df, "ts", "u", "1 hour", p=6)
    parts = [
        R.rollup_distinct(
            df.filter(F.col("k") % n_parts == i), "ts", "u", "1 hour", p=6
        )
        for i in range(n_parts)
    ]
    folded = hll_merge(*parts, parts[0], key_cols=("bucket_ts",))
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, folded.collect()))
    assert a == b
