"""Operator tests mirroring the reference's unit-test semantics
(reference: native_libs/test/Tests.cpp — sort goldens 75-130, interpolate
887-897/1023-1033, shift 1063-1089, ungroup 1222-1241, slice 1153-1163)."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators import aggregate as dagg
from dataframes_spark.operators import nulls as dnulls
from dataframes_spark.operators import reshape as dreshape
from dataframes_spark.operators import sample as dsample
from dataframes_spark.operators import sort as dsort
from dataframes_spark.operators import window as dwindow


def test_sort_multikey_null_placement(spark):
    rows = [("b", 2.0), (None, 1.0), ("a", None), ("a", 3.0), ("b", None)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = [
        (r.k, r.v)
        for r in dsort.sort_by(
            df,
            [("k", "asc", "nulls_first"), ("v", "desc", "nulls_last")],
        ).collect()
    ]
    assert got == [(None, 1.0), ("a", 3.0), ("a", None), ("b", 2.0), ("b", None)]


def test_aggregate_contract(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)], ["k", "v"]
    )
    out = dagg.aggregate_by(df, "k", [("v", ["length", "sum", "mean", "min", "std"])])
    rows = {r.k: r for r in out.collect()}
    # length counts nulls (Analysis.cpp:166-183)
    assert rows["a"].v_length == 3.0
    # all-null group: sum = 0 (Analysis.cpp:155-164), mean/min null
    assert rows["b"].v_sum == 0.0 and rows["b"].v_mean is None and rows["b"].v_min is None
    # std needs >= 2 valid samples
    assert rows["a"].v_std is not None and rows["b"].v_std is None
    # every aggregate column is double-typed (Analysis.cpp:701-721)
    assert all(t == "double" for c, t in out.dtypes if c != "k")


def test_rsi_known_value(spark):
    # gains = mean(max(x,0)) = 4/3, losses = mean(min(x,0)) = -1
    # RSI = 100 * (4/3) / (4/3 + 1) = 400/7 (reference: Analysis.cpp:217-239)
    df = spark.createDataFrame([("g", 4.0), ("g", 0.0), ("g", -3.0)], ["k", "v"])
    out = dagg.aggregate_by(df, "k", [("v", ["rsi"])]).first()
    assert out.v_rsi == pytest.approx(400.0 / 7.0)


def test_count_values_includes_null_row(spark):
    df = spark.createDataFrame([("x",), ("x",), (None,), ("y",)], ["c"])
    got = {r.value: r["count"] for r in dagg.count_values(df, "c").collect()}
    assert got == {"x": 2, None: 1, "y": 1}


def test_interpolate_reference_vectors(spark):
    # leading nulls <- first valid; interior lerp; trailing <- last valid
    # (reference tests: Tests.cpp:1023-1033)
    rows = [(1, None), (2, 10.0), (3, None), (4, None), (5, 40.0), (6, None)]
    df = spark.createDataFrame(rows, ["i", "v"])
    got = [r.v for r in dnulls.interpolate(df, ["v"], "i").orderBy("i").collect()]
    assert got == [10.0, 10.0, 20.0, 30.0, 40.0, 40.0]


def test_interpolate_all_null_column_unchanged(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "i int, v double")
    got = [r.v for r in dnulls.interpolate(df, ["v"], "i").collect()]
    assert got == [None, None]


def test_shift_lag_lead(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], ["i", "v"])
    lag = dwindow.shift(df, "v", 1, "i").orderBy("i")
    assert [r["v_shift_1"] for r in lag.collect()] == [None, 10.0, 20.0]
    lead = dwindow.shift(df, "v", -1, "i").orderBy("i")
    assert [r["v_shift_-1"] for r in lead.collect()] == [20.0, 30.0, None]


def test_rolling_rows_window(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(5)], ["i", "v"])
    out = dwindow.rolling_rows(df, "v", 3, ["sum", "length"], "i").orderBy("i")
    assert [r.v_sum for r in out.collect()] == [0.0, 1.0, 3.0, 6.0, 9.0]
    assert [r.v_length for r in out.collect()] == [1.0, 2.0, 3.0, 3.0, 3.0]


def test_ungroup_splitting_drops_null_rows(spark):
    # null-tag rows vanish (reference: Tests.cpp:1222-1241)
    df = spark.createDataFrame([(1, "a,b"), (2, None), (3, "c")], ["id", "tags"])
    got = [(r.id, r.tags) for r in dreshape.ungroup_splitting_on(df, "tags", ",").orderBy("id", "tags").collect()]
    assert got == [(1, "a"), (1, "b"), (3, "c")]


def test_concat_horizontal_alignment(spark):
    a = spark.createDataFrame([(2, "y"), (1, "x")], ["i", "s"])
    b = spark.createDataFrame([(20,), (10,)], ["j"])
    got = [(r.i, r.s, r.j) for r in dreshape.concat_horizontal(a, b, ["i"], ["j"]).orderBy("i").collect()]
    assert got == [(1, "x", 10), (2, "y", 20)]


def test_slice_bounds(spark):
    # bounds-checked slice (reference: Tests.cpp:1153-1163)
    df = spark.createDataFrame([(i,) for i in range(10)], ["i"])
    assert dreshape.slice_rows(df, 3, 4, ["i"]).count() == 4
    assert dreshape.slice_rows(df, 8, 10, ["i"]).count() == 2
    assert dreshape.slice_rows(df, 100, 5, ["i"]).count() == 0


def test_fillna_type_coercion(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0)], "i int, v double")
    got = [r.v for r in dnulls.fill_na(df, 0, ["v"]).orderBy("i").collect()]
    assert got == [0.0, 5.0]


def test_sort_stability_with_tiebreaker(spark):
    # equal keys keep a deterministic order via the stability tiebreaker
    # (reference sorts are stable, Sort.cpp:202-216; Spark orderBy is not,
    # so the facade appends an explicit tiebreaker key)
    rows = [(1, i) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "seq"]).repartition(8)
    out = dsort.sort_by(df, [("k", "asc", "nulls_first")], stable_tiebreaker="seq")
    assert [r.seq for r in out.collect()] == list(range(200))


def test_count_values_includes_null_row(spark):
    df = spark.createDataFrame([("a",), ("a",), (None,), ("b",), (None,)], ["c"])
    out = dagg.count_values(df, "c")
    got = {r.value: r["count"] for r in out.collect()}
    assert got == {"a": 2, None: 2, "b": 1}


def test_interpolate_partitioned(spark):
    rows = [
        ("u1", 1, 0.0), ("u1", 2, None), ("u1", 3, 4.0),
        ("u2", 1, 10.0), ("u2", 2, None), ("u2", 3, None),
    ]
    df = spark.createDataFrame(rows, ["u", "o", "v"])
    out = dnulls.interpolate(df, ["v"], "o", partition_by=["u"])
    got = {(r.u, r.o): r.v for r in out.collect()}
    assert got[("u1", 2)] == 2.0          # lerp within u1 only
    assert got[("u2", 2)] == 10.0         # trailing fill from u2's last valid
    assert got[("u2", 3)] == 10.0


def test_fillna_coerces_value_per_column_type(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, 2.5, "b")], "i bigint, v double, s string"
    )
    # string fill value coerced to each column's type (ConvertTo,
    # Processing.cpp:561-609); Spark's own fillna would skip v entirely
    out = dnulls.fill_na(df, "7", ["v", "s"]).orderBy("i").collect()
    assert out[0].v == 7.0 and out[0].s == "7"
    assert out[1].v == 2.5 and out[1].s == "b"
    # numeric fill into string column becomes text
    out2 = dnulls.fill_na(df, 0, ["s"]).orderBy("i").collect()
    assert out2[0].s == "0"
    with pytest.raises(ValueError, match="coerce"):
        dnulls.fill_na(df, "abc", ["v"])


def test_fillna_rejects_python_only_integer_literals(spark):
    # int('5_000') parses in Python but Spark's cast maps '5_000' to NULL —
    # accepting it would silently leave nulls unfilled (the failure mode
    # the validation exists to prevent)
    df = spark.createDataFrame([(1, None), (2, 7)], "i bigint, v bigint")
    for bad in ("5_000", "٥", "5.5"):
        with pytest.raises(ValueError, match="coerce"):
            dnulls.fill_na(df, bad, ["v"])
    # plain ASCII decimals (with sign, surrounding space) still work
    out = dnulls.fill_na(df, " -12 ", ["v"]).orderBy("i").collect()
    assert out[0].v == -12
    dbl = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="coerce"):
        dnulls.fill_na(dbl, "1_0.5", ["x"])


def test_first_last_require_order_and_are_deterministic(spark):
    rows = [("a", 3, 30.0), ("a", 1, None), ("a", 2, 20.0), ("b", 1, None)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    with pytest.raises(ValueError, match="order-dependent"):
        dagg.aggregate_by(df, "k", [("v", ["first"])])
    for parts in (1, 7):
        out = {
            r.k: (r.v_first, r.v_last)
            for r in dagg.aggregate_by(
                df.repartition(parts), "k", [("v", ["first", "last"])], order_by="o"
            ).collect()
        }
        # first/last VALID value in o-order (null at o=1 skipped)
        assert out["a"] == (20.0, 30.0)
        assert out["b"] == (None, None)


def test_aggregates_invariant_under_repartitioning(spark):
    """The distributed analog of the reference's chunk-boundary fixtures
    (ChunkedFixture shatters columns into random chunks,
    native_libs/test/Fixture.cpp:6-41): results must not depend on the
    physical partition layout."""
    import random

    random.seed(5)
    rows = [
        (random.choice("abc"), i, random.gauss(0, 10) if i % 5 else None)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    fns = ["sum", "length", "min", "max", "mean", "std", "median"]

    def snap(d):
        return sorted(
            tuple(None if x is None else round(x, 9) if isinstance(x, float) else x for x in r)
            for r in dagg.aggregate_by(d, "k", [("v", fns)]).collect()
        )

    assert snap(df.repartition(1)) == snap(df.repartition(13)) == snap(df.repartition(32))


def test_hash_sampling_reproducible_and_stratified(spark):
    from dataframes_spark.operators import sample as dsample

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(3000)], ["k", "g"]
    )
    s1 = {r.k for r in dsample.hash_sample(df, "k", 0.2).collect()}
    s2 = {r.k for r in dsample.hash_sample(df.repartition(11), "k", 0.2).collect()}
    assert s1 == s2                      # partition-layout independent
    assert 0.15 < len(s1) / 3000 < 0.25  # near the target fraction
    # growing the dataset never reshuffles old decisions
    bigger = spark.createDataFrame([(i, "a") for i in range(6000)], ["k", "g"])
    s3 = {r.k for r in dsample.hash_sample(bigger, "k", 0.2).collect()}
    assert s1 <= s3 | s1  # every originally-kept key still kept
    assert {k for k in s3 if k < 3000} == s1
    strat = dsample.stratified_sample(df, "g", {"a": 0.5, "b": 0.1}, "k")
    by_g = {g: n for g, n in strat.groupBy("g").count().collect()}
    assert 0.4 < by_g["a"] / 2000 < 0.6
    assert by_g.get("b", 0) / 1000 < 0.2


def test_mix_datasets_weights(spark):
    from dataframes_spark.operators import sample as dsample

    a = spark.createDataFrame([(i, "a") for i in range(4000)], ["k", "src"])
    b = spark.createDataFrame([(i + 10000, "b") for i in range(4000)], ["k", "src"])
    mixed = dsample.mix_datasets([(a, 0.5), (b, 0.1)], "k")
    by_src = {r.src: r["count"] for r in mixed.groupBy("src").count().collect()}
    assert 0.4 < by_src["a"] / 4000 < 0.6
    assert by_src["b"] / 4000 < 0.2
    # reproducible: same mixture on re-run
    again = dsample.mix_datasets([(a, 0.5), (b, 0.1)], "k")
    assert {r.k for r in mixed.collect()} == {r.k for r in again.collect()}


def test_asof_join_backward_semantics(spark):
    from dataframes_spark.operators.asof import asof_join

    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 20, "t2"), ("A", 25, "t3"), ("B", 5, "t4")],
        ["sym", "ts", "trade"],
    )
    quotes = spark.createDataFrame(
        [("A", 8, 1.0), ("A", 20, 2.0), ("A", 22, 3.0), ("C", 1, 9.0)],
        ["sym", "ts", "px"],
    )
    out = asof_join(trades, quotes, ts_col="ts", by="sym", value_cols=["px"])
    got = {r.trade: r.px for r in out.collect()}
    # t1: quote@8 -> 1.0; t2: quote@20 matches inclusively -> 2.0;
    # t3: quote@22 -> 3.0; t4: no B quote -> null
    assert got == {"t1": 1.0, "t2": 2.0, "t3": 3.0, "t4": None}
    assert out.count() == trades.count()


def test_asof_join_tiebreaker_and_suffix(spark):
    from dataframes_spark.operators.asof import asof_join

    left = spark.createDataFrame([("A", 10, 0.5)], ["k", "ts", "px"])
    # two right rows at the same ts: greatest right_order key must win
    right = spark.createDataFrame(
        [("A", 10, 7.0, 1), ("A", 10, 8.0, 2), ("A", 10, 6.0, 0)],
        ["k", "ts", "px", "seq"],
    )
    out = asof_join(
        left, right, ts_col="ts", by="k",
        value_cols=["px"], right_order=["seq"], rsuffix="_r",
    )
    row = out.collect()[0]
    assert row.px == 0.5 and row.px_r == 8.0


def test_range_join_bounds_and_buckets(spark):
    from dataframes_spark.operators.interval import range_join

    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 15.0), (4, 25.0)], ["pid", "v"]
    )
    # intervals straddle bucket boundaries (width 10) on purpose
    intervals = spark.createDataFrame(
        [("a", 4.0, 10.0), ("b", 9.0, 16.0), ("c", 30.0, 40.0)],
        ["iid", "lo", "hi"],
    )
    out = range_join(points, intervals, "v", "lo", "hi", bucket_width=10.0)
    got = sorted((r.pid, r.iid) for r in out.collect())
    # [) bounds: v=10 not in a (exclusive end) but in b; v=15 in b only
    assert got == [(1, "a"), (2, "b"), (3, "b")]
    closed = range_join(points, intervals, "v", "lo", "hi", 10.0, bounds="[]")
    got_closed = sorted((r.pid, r.iid) for r in closed.collect())
    assert got_closed == [(1, "a"), (2, "a"), (2, "b"), (3, "b")]


def test_range_join_rejects_collisions(spark):
    import pytest as _pytest
    from dataframes_spark.operators.interval import range_join

    df = spark.createDataFrame([(1, 2.0)], ["pid", "v"])
    with _pytest.raises(ValueError):
        range_join(df, df, "v", "v", "v", 1.0)


def test_time_rollup_resolutions(spark):
    from dataframes_spark.operators.window import time_rollup

    rows = [
        ("a", "2024-01-01 10:15:00", 1.0),
        ("a", "2024-01-01 10:45:00", 2.0),
        ("a", "2024-01-01 11:05:00", 4.0),
        ("b", "2024-01-02 00:30:00", 8.0),
    ]
    df = spark.createDataFrame(rows, ["g", "ts_s", "v"]).select(
        "g", F.to_timestamp("ts_s").alias("ts"), "v"
    )
    out = time_rollup(
        df, "ts", ["1 hour", "1 day"],
        [F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n")],
        group_by=["g"],
    )
    got = {
        (r.resolution, str(r.bucket_start), r.g): (r.sum_v, r.n)
        for r in out.collect()
    }
    assert got[("1 hour", "2024-01-01 10:00:00", "a")] == (3.0, 2)
    assert got[("1 hour", "2024-01-01 11:00:00", "a")] == (4.0, 1)
    assert got[("1 day", "2024-01-01 00:00:00", "a")] == (7.0, 3)
    assert got[("1 day", "2024-01-02 00:00:00", "b")] == (8.0, 1)
    # 3 hourly buckets (a@10, a@11, b@00) + 2 daily buckets
    assert len(got) == 5


def test_asof_join_forward_direction(spark):
    from dataframes_spark.operators.asof import asof_join

    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 21, "t2"), ("A", 30, "t3")], ["sym", "ts", "trade"]
    )
    quotes = spark.createDataFrame(
        [("A", 8, 1.0), ("A", 20, 2.0), ("A", 21, 3.0)], ["sym", "ts", "px"]
    )
    out = asof_join(
        trades, quotes, ts_col="ts", by="sym", value_cols=["px"],
        direction="forward",
    )
    got = {r.trade: r.px for r in out.collect()}
    # t1@10 -> next quote @20 = 2.0; t2@21 matches inclusively = 3.0;
    # t3@30 -> nothing after = null
    assert got == {"t1": 2.0, "t2": 3.0, "t3": None}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(trades, quotes, "ts", "sym", direction="nearest")


def test_interval_overlap_join_matches_bruteforce(spark):
    """Bucketized two-sided interval join: exact recall (every
    overlapping pair shares >= 1 bucket) and arithmetic dedup (a pair
    sharing k buckets emits once) against a python brute force,
    including intervals spanning many buckets."""
    import itertools

    from dataframes_spark.operators.interval import interval_overlap_join

    lrows = [(i, float(i * 7 % 50), float(i * 7 % 50 + (i % 13) + 1)) for i in range(40)]
    rrows = [(j, float(j * 11 % 60), float(j * 11 % 60 + (j % 29) + 1)) for j in range(40)]
    L = spark.createDataFrame(lrows, ["lid", "ls", "le"])
    R = spark.createDataFrame(rrows, ["rid", "rs", "re"])
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            L, R, "ls", "le", "rs", "re", bucket_width=5.0
        ).collect()
    }
    want = {
        (li, rj)
        for (li, ls, le), (rj, rs, re) in itertools.product(lrows, rrows)
        if ls < re and rs < le
    }
    assert got == want
    # closed-end variant adds the touching pairs
    got_closed = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            L, R, "ls", "le", "rs", "re", bucket_width=5.0, bounds="[]"
        ).collect()
    }
    want_closed = {
        (li, rj)
        for (li, ls, le), (rj, rs, re) in itertools.product(lrows, rrows)
        if ls <= re and rs <= le
    }
    assert got_closed == want_closed


def test_interval_overlap_join_no_duplicate_pairs(spark):
    from dataframes_spark.operators.interval import interval_overlap_join

    # one long interval spanning 10 buckets x one inside it: exactly 1 row
    L = spark.createDataFrame([(1, 0.0, 100.0)], ["lid", "ls", "le"])
    R = spark.createDataFrame([(2, 40.0, 45.0)], ["rid", "rs", "re"])
    out = interval_overlap_join(L, R, "ls", "le", "rs", "re", bucket_width=10.0)
    assert out.count() == 1


def test_melt_single_scan_and_null_retention(spark):
    from dataframes_spark.operators import reshape

    df = spark.createDataFrame(
        [(1, 10.0, None), (2, 20.0, 5.0)], ["id", "a", "b"]
    )
    out = reshape.melt(df, ["id"], ["a", "b"]).collect()
    got = {(r.id, r.variable): r.value for r in out}
    assert got == {
        (1, "a"): 10.0, (1, "b"): None, (2, "a"): 20.0, (2, "b"): 5.0,
    }
    # single-scan Expand, not a union of per-column scans
    plan = reshape.melt(df, ["id"], ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and "Union" not in plan


def test_top_k_by_group(spark):
    from dataframes_spark.operators import sort as dsort
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    out = dsort.top_k_by_group(df, "g", "v", 3, tiebreak_col="v")
    got = {}
    for r in out.collect():
        got.setdefault(r.g, []).append(r.v)
    assert {g: sorted(vs, reverse=True) for g, vs in got.items()} == {
        0: [96, 92, 88], 1: [97, 93, 89], 2: [98, 94, 90], 3: [99, 95, 91]
    }
    # ascending variant + partition invariance
    lo = dsort.top_k_by_group(df.repartition(13), "g", "v", 2, descending=False, tiebreak_col="v")
    got_lo = sorted((r.g, r.v) for r in lo.collect())
    assert got_lo == [(0, 0), (0, 4), (1, 1), (1, 5), (2, 2), (2, 6), (3, 3), (3, 7)]
    import pytest as _pt

    with _pt.raises(ValueError):
        dsort.top_k_by_group(df, "g", "v", 0)


def test_top_k_by_group_nulls_never_claim_slots(spark):
    from dataframes_spark.operators import sort as dsort

    df = spark.createDataFrame(
        [("a", None), ("a", 5), ("a", 1), ("a", 3)], "g string, v int"
    )
    lo = dsort.top_k_by_group(df, "g", "v", 2, descending=False, tiebreak_col="v")
    assert sorted(r.v for r in lo.collect()) == [1, 3]  # not [None, 1]
    hi = dsort.top_k_by_group(df, "g", "v", 2, descending=True, tiebreak_col="v")
    assert sorted(r.v for r in hi.collect()) == [3, 5]


def test_assign_shards_deterministic_and_uniformish(spark):
    from dataframes_spark.operators.sample import assign_shards

    df = spark.range(2000).selectExpr("id AS doc_id")
    out = assign_shards(df, "doc_id", 8)
    rows = {r.doc_id: r.shard for r in out.collect()}
    assert set(rows.values()) <= set(range(8))
    # every shard is hit and no shard hogs the corpus (md5 is uniform)
    counts = [list(rows.values()).count(s) for s in range(8)]
    assert min(counts) > 0 and max(counts) < 2 * 2000 / 8
    # deterministic under any physical partitioning
    rows2 = {r.doc_id: r.shard for r in assign_shards(df.repartition(7), "doc_id", 8).collect()}
    assert rows == rows2
    # a different salt reshuffles assignments
    rows3 = {r.doc_id: r.shard for r in assign_shards(df, "doc_id", 8, salt="v2").collect()}
    assert rows != rows3


def test_assign_shards_edge_cases(spark):
    import pytest as _pytest

    from dataframes_spark.operators.sample import assign_shards

    df = spark.range(10).selectExpr("id AS doc_id")
    assert {r.shard for r in assign_shards(df, "doc_id", 1).collect()} == {0}
    with _pytest.raises(ValueError):
        assign_shards(df, "doc_id", 0)


def test_temperature_rates_laws(spark):
    # 3 groups with skewed sizes; tau=0.5 must (a) sum q to 1, (b) give
    # the smallest group rate exactly 1 (binding group keeps all),
    # (c) order rates inversely to size
    rows = [(i, "big") for i in range(100)] + [
        (1000 + i, "mid") for i in range(25)
    ] + [(2000 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, "k long, g string")
    r = {x["g"]: x for x in dsample.temperature_rates(df, "g", tau=0.5).collect()}
    assert sum(x["q"] for x in r.values()) == pytest.approx(1.0, abs=1e-12)
    assert r["small"]["rate"] == pytest.approx(1.0, abs=1e-12)
    assert r["small"]["rate"] >= r["mid"]["rate"] >= r["big"]["rate"]
    # tau=1 is proportional: every rate 1 (no reshaping)
    r1 = dsample.temperature_rates(df, "g", tau=1.0).collect()
    assert all(x["rate"] == pytest.approx(1.0, abs=1e-12) for x in r1)


def test_mix_by_temperature_deterministic_and_rate_shaped(spark):
    rows = [(i, "big") for i in range(400)] + [
        (10_000 + i, "small") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k long, g string")
    m1 = dsample.mix_by_temperature(df, "g", "k", tau=0.3)
    m2 = dsample.mix_by_temperature(df, "g", "k", tau=0.3)
    assert sorted(r["k"] for r in m1.collect()) == sorted(
        r["k"] for r in m2.collect()
    )
    counts = {r["g"]: r["cnt"] for r in m1.groupBy("g").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts["small"] == 20  # binding group keeps everything
    rate = {x["g"]: x["rate"] for x in dsample.temperature_rates(
        df, "g", tau=0.3).collect()}["big"]
    assert counts["big"] == pytest.approx(400 * rate, abs=40)


def test_mix_manifest_math(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "d e", "x"), (3, "f", "y")],
        "k long, text string, g string",
    )
    out = {r["g"]: r for r in dsample.mix_manifest(
        df, "g", "text", {"x": 3, "y": 1}, 100).collect()}
    assert out["x"]["n_docs"] == 2 and out["x"]["n_tokens"] == 5
    assert out["x"]["weight"] == pytest.approx(0.75)
    assert out["x"]["target_tokens"] == pytest.approx(75.0)
    assert out["x"]["epochs"] == pytest.approx(15.0)
    assert out["x"]["sample_rate"] == 1.0  # upsampling capped at 1
    assert out["y"]["epochs"] == pytest.approx(25.0)
    with pytest.raises(ValueError, match="positive"):
        dsample.mix_manifest(df, "g", "text", {"x": 0}, 100)
    # a requested component with ZERO matching documents must still row
    # (the shortfall the plan exists to surface), with NULL epochs/rate
    out = {r["g"]: r for r in dsample.mix_manifest(
        df, "g", "text", {"x": 3, "z": 1}, 100).collect()}
    assert out["z"]["n_docs"] == 0 and out["z"]["n_tokens"] == 0
    assert out["z"]["epochs"] is None and out["z"]["sample_rate"] is None
    assert out["z"]["weight"] == pytest.approx(0.25)
    # corpus groups with no requested weight are not planned
    assert set(out) == {"x", "z"}
