"""Dense-spine resample (operators/window.py resample) and quantile
winsorization (functions/stats.py winsorize)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dataframes_spark.functions import stats
from dataframes_spark.operators import window as dwindow


def _events(spark):
    rows = [
        # type a: hours 10, 12 — hour 11 is a gap
        ("a", datetime(2024, 1, 1, 10, 5), 1.0),
        ("a", datetime(2024, 1, 1, 10, 55), 2.0),
        ("a", datetime(2024, 1, 1, 12, 0), 4.0),
        # type b: single hour — spine must NOT cover a's range
        ("b", datetime(2024, 1, 1, 23, 30), 8.0),
    ]
    return spark.createDataFrame(rows, ["t", "ts", "v"])


def _resample(spark, fill):
    return dwindow.resample(
        _events(spark),
        "ts",
        "1 hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
        group_by=["t"],
        fill=fill,
    )


def test_resample_gap_rows_zero_filled(spark):
    out = {(r.t, r.bucket.hour): (r.n, r.s) for r in _resample(spark, "zero").collect()}
    assert out[("a", 10)] == (2, 3.0)
    assert out[("a", 11)] == (0, 0.0)  # gap hour present, zero-filled
    assert out[("a", 12)] == (1, 4.0)
    assert out[("b", 23)] == (1, 8.0)
    assert len(out) == 4  # b's spine is one bucket, not a's range


def test_resample_null_and_ffill(spark):
    nulls = {(r.t, r.bucket.hour): r.s for r in _resample(spark, "null").collect()}
    assert nulls[("a", 11)] is None
    ffill = {(r.t, r.bucket.hour): r.s for r in _resample(spark, "ffill").collect()}
    assert ffill[("a", 11)] == 3.0  # carried forward from hour 10
    assert ffill[("a", 12)] == 4.0  # real data wins over the carry


def test_resample_rejects_bad_fill(spark):
    with pytest.raises(ValueError):
        _resample(spark, "interpolate")


def test_winsorize_clips_and_passes_through(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 10, 20, 30, 40, 50, 60, 70, 80, 1000])],
        ["id", "x"],
    )
    out = {r.id: r.x for r in stats.winsorize(df, "x", 0.1, 0.9).collect()}
    # (N-1)*q rule: lo = 0.9th idx -> 9.0, hi = 8.1th idx -> ~172.0
    assert out[0] == pytest.approx(9.0)
    assert out[9] == pytest.approx(172.0)
    assert out[5] == 50.0  # interior values untouched
    assert len(out) == 10


def test_winsorize_keeps_nulls_and_validates(spark):
    df = spark.createDataFrame([(1, 1.0), (2, None), (3, 3.0)], ["id", "x"])
    out = {r.id: r.x for r in stats.winsorize(df, "x", 0.0, 1.0).collect()}
    assert out[2] is None
    assert out[1] == 1.0 and out[3] == 3.0
    with pytest.raises(ValueError):
        stats.winsorize(df, "x", 0.9, 0.1)


def test_resample_rejects_calendar_units(spark):
    # F.window buckets are fixed durations from the epoch; a calendar
    # (month/year) spine would drift across DST — reject up front
    with pytest.raises(ValueError, match="fixed"):
        _ = dwindow.resample(
            _events(spark), "ts", "1 month",
            aggs=[F.count(F.lit(1)).alias("n")], group_by=["t"],
        )


def test_duration_micros_parses_compound():
    assert dwindow._duration_micros("1 hour") == 3_600_000_000
    assert dwindow._duration_micros("1 day 12 hours") == 129_600_000_000
    assert dwindow._duration_micros("90 minutes") == 5_400_000_000
    with pytest.raises(ValueError):
        dwindow._duration_micros("0 seconds")
    with pytest.raises(ValueError):
        dwindow._duration_micros("hourly")


def test_resample_spine_fixed_duration_across_dst(spark):
    # In a DST timezone (America/New_York, spring-forward 2024-03-10),
    # daily fixed-duration buckets from F.window must still all join the
    # spine — the calendar-arithmetic spine lost every bucket after the
    # transition (they became gap rows silently).
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = [
            ("x", datetime(2024, 3, 8, 12, 0), 1.0),
            ("x", datetime(2024, 3, 9, 12, 0), 2.0),
            ("x", datetime(2024, 3, 11, 12, 0), 3.0),  # after spring-forward
            ("x", datetime(2024, 3, 12, 12, 0), 4.0),
        ]
        df = spark.createDataFrame(rows, ["t", "ts", "v"])
        out = dwindow.resample(
            df, "ts", "1 day",
            aggs=[F.sum("v").alias("s")], group_by=["t"], fill="zero",
        ).collect()
        # every day with data must carry its real sum (not a zero gap)
        sums = sorted(r.s for r in out)
        assert sums.count(0.0) <= 1  # at most the genuine 3-10 gap day
        assert {1.0, 2.0, 3.0, 4.0} <= set(sums)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


# ---------------------------------------------------------------------------
# qcut quantile bucketing
# ---------------------------------------------------------------------------


def test_qcut_quartiles_balanced_and_ordered(spark):
    df = spark.range(1, 101).selectExpr("CAST(id AS DOUBLE) AS v")
    out = stats.qcut(df, "v", 4)
    assert "v_bucket" in out.columns
    counts = {r["v_bucket"]: r["n"] for r in out.groupBy("v_bucket").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {1, 2, 3, 4}
    assert all(20 <= c <= 30 for c in counts.values())
    # monotone: every value in bucket b is <= every value in bucket b+1
    rows = out.collect()
    hi = {b: max(r["v"] for r in rows if r["v_bucket"] == b) for b in (1, 2, 3)}
    lo = {b: min(r["v"] for r in rows if r["v_bucket"] == b) for b in (2, 3, 4)}
    assert hi[1] <= lo[2] and hi[2] <= lo[3] and hi[3] <= lo[4]


def test_qcut_nulls_skew_and_validation(spark):
    df = spark.createDataFrame(
        [(None,)] + [(1.0,)] * 90 + [(100.0,)] * 10, "v double"
    )
    out = stats.qcut(df, "v", 4).collect()
    assert any(r["v_bucket"] is None and r["v"] is None for r in out)
    # heavy skew: all the 1.0s share one bucket (ties never split), the
    # 100.0s land above
    b1 = {r["v_bucket"] for r in out if r["v"] == 1.0}
    b100 = {r["v_bucket"] for r in out if r["v"] == 100.0}
    assert len(b1) == 1 and len(b100) == 1 and max(b1) < max(b100)
    import pytest as _pt

    with _pt.raises(ValueError):
        stats.qcut(df, "v", 1)


def test_qcut_approx_mode_close_to_exact(spark):
    df = spark.range(0, 10_000).selectExpr("CAST(id AS DOUBLE) AS v")
    exact = stats.qcut(df, "v", 10)
    approx = stats.qcut(df, "v", 10, exact=False)
    ne = exact.groupBy("v_bucket").count().collect()
    na = {r["v_bucket"]: r["count"] for r in approx.groupBy("v_bucket").count().collect()}
    for r in ne:
        assert abs(na[r["v_bucket"]] - r["count"]) <= 200  # 2% of rows


def test_qcut_per_group_boundaries(spark):
    # group a: values 1..100; group b: values 1000..1100 — per-group
    # quartiles must band each group within itself (a global qcut would
    # put ALL of a in bucket 1)
    from pyspark.sql import functions as F

    df = spark.range(1, 101).selectExpr("CAST(id AS DOUBLE) v", "'a' g").union(
        spark.range(1000, 1100).selectExpr("CAST(id AS DOUBLE) v", "'b' g")
    )
    out = stats.qcut(df, "v", 4, by=["g"])
    counts = {
        (r["g"], r["v_bucket"]): r["n"]
        for r in out.groupBy("g", "v_bucket").agg(F.count("*").alias("n")).collect()
    }
    for g in ("a", "b"):
        assert {b for (gg, b) in counts if gg == g} == {1, 2, 3, 4}
        assert all(20 <= counts[(g, b)] <= 30 for b in (1, 2, 3, 4))


def test_qcut_null_group_key_gets_null_bucket(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (3.0, "a"), (4.0, "a"), (9.0, None)],
        "v double, g string",
    )
    out = {(r["v"], r["g"]): r["v_bucket"] for r in stats.qcut(df, "v", 2, by=["g"]).collect()}
    assert out[(9.0, None)] is None  # unknown group -> no band
    assert out[(1.0, "a")] == 1 and out[(4.0, "a")] == 2


class TestRobustOutliers:
    def test_hand_computed_fence(self, spark):
        from dataframes_spark.functions.stats import robust_outliers

        # values 1..9 plus a wild 1000: median 5.5, |x-med| sorted ->
        # MAD = median(0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5) = 2.5
        df = spark.createDataFrame(
            [(float(i),) for i in range(1, 10)] + [(1000.0,)], "v double"
        )
        rows = {r.v: r for r in robust_outliers(df, "v").collect()}
        assert rows[1000.0].is_outlier
        assert rows[1000.0].robust_z == pytest.approx(
            (1000.0 - 5.5) / (1.4826 * 2.5)
        )
        assert not any(rows[float(i)].is_outlier for i in range(1, 10))
        # the 50% breakdown point: the wild value did not drag the fence
        assert rows[9.0].robust_z == pytest.approx((9.0 - 5.5) / (1.4826 * 2.5))

    def test_grouped_equals_per_group_global(self, spark):
        from dataframes_spark.functions.stats import robust_outliers

        df = spark.createDataFrame(
            [("a", float(i)) for i in range(20)]
            + [("a", 500.0), ("b", 3.0), ("b", 4.0), ("b", 5.0), ("b", 90.0)],
            "g string, v double",
        )
        grouped = {
            (r.g, r.v): (r.robust_z, r.is_outlier)
            for r in robust_outliers(df, "v", by=["g"]).collect()
        }
        for g in ("a", "b"):
            solo = {
                (g, r.v): (r.robust_z, r.is_outlier)
                for r in robust_outliers(
                    df.filter(F.col("g") == g), "v"
                ).collect()
            }
            for k, v in solo.items():
                assert grouped[k] == pytest.approx(v)
        assert grouped[("a", 500.0)][1] and grouped[("b", 90.0)][1]

    def test_degenerate_mad_and_nulls(self, spark):
        from dataframes_spark.functions.stats import robust_outliers

        df = spark.createDataFrame(
            [(5.0,), (5.0,), (5.0,), (None,)], "v double"
        )
        rows = robust_outliers(df, "v").collect()
        by_v = {r.v: r for r in rows}
        assert by_v[5.0].robust_z == 0.0 and by_v[5.0].is_outlier is False
        assert by_v[None].robust_z is None and by_v[None].is_outlier is None

    def test_validation_and_passthrough(self, spark):
        from dataframes_spark.functions.stats import robust_outliers

        df = spark.createDataFrame([(1, 2.0)], "id long, v double")
        with pytest.raises(ValueError, match="threshold"):
            robust_outliers(df, "v", threshold=0)
        out = robust_outliers(df, "v")
        assert out.columns == ["id", "v", "robust_z", "is_outlier"]

    def test_grouped_plan_single_exchange(self, spark):
        from dataframes_spark.functions.stats import robust_outliers

        df = spark.createDataFrame(
            [("g%d" % (i % 3), float(i)) for i in range(100)],
            "g string, v double",
        )
        out = robust_outliers(df, "v", by=["g"])
        p = out._jdf.queryExecution().executedPlan().toString()
        # the second percentile window REUSES the first's partitioning:
        # one hashpartitioning exchange total, never two
        assert p.count("Exchange hashpartitioning") == 1
