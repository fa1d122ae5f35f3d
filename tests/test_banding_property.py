"""Property tests for the banding/capping operators: qcut band counts and
ordering, cap_per_group partition invariance — under arbitrary data."""

from hypothesis import given, settings, strategies as st

from dataframes_spark.functions import stats
from dataframes_spark.operators.sample import cap_per_group


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6),
        min_size=8,
        max_size=60,
    ),
    n=st.integers(min_value=2, max_value=5),
)
def test_qcut_bands_are_ordered_and_cover(spark, vals, n):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = stats.qcut(df, "v", n).collect()
    assert all(r["v_bucket"] is not None and 1 <= r["v_bucket"] <= n for r in rows)
    # monotone: bucket number never decreases as the value grows
    by_val = sorted(rows, key=lambda r: (r["v"], r["v_bucket"]))
    buckets = [r["v_bucket"] for r in by_val]
    assert buckets == sorted(buckets)
    # equal values always share one bucket
    seen = {}
    for r in rows:
        assert seen.setdefault(r["v"], r["v_bucket"]) == r["v_bucket"]


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=80, unique=True),
    k=st.integers(min_value=1, max_value=5),
    parts=st.integers(min_value=1, max_value=9),
)
def test_cap_per_group_partition_invariant(spark, keys, k, parts):
    rows = [(key, str(key % 3)) for key in keys]
    df = spark.createDataFrame(rows, "id long, g string")
    a = sorted(r["id"] for r in cap_per_group(df, "g", k, "id").collect())
    b = sorted(
        r["id"] for r in cap_per_group(df.repartition(parts), "g", k, "id").collect()
    )
    assert a == b
    sizes = {}
    for key in keys:
        sizes[str(key % 3)] = sizes.get(str(key % 3), 0) + 1
    expect = sum(min(k, c) for c in sizes.values())
    assert len(a) == expect
