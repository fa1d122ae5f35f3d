"""Funnel + cohort retention semantics (operators/funnel.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators import funnel as _fmod
from dataframes_spark.operators.funnel import (
    cohort_retention,
    funnel,
    funnel_stage,
    funnel_stage_windowed,
    funnel_windowed,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)) for u, t, m in rows],
        "user_id long, event_type string, ts timestamp",
    )


STEPS = ["a", "b", "c"]


def test_funnel_order_matters(spark):
    # u1 completes in order; u2 has all three types but b before a ->
    # stage 2 only via the later b?  a@10, b@5, c@20: after a@10 the only
    # b is at 5 (not later) -> stage 1.  u3 never does a -> stage 0.
    df = _ev(
        spark,
        [
            (1, "a", 0), (1, "b", 1), (1, "c", 2),
            (2, "b", 5), (2, "a", 10), (2, "c", 20),
            (3, "b", 0), (3, "c", 1),
        ],
    )
    stages = {r.user_id: r.stage for r in funnel_stage(df, STEPS).collect()}
    assert stages == {1: 3, 2: 1, 3: 0}
    rep = funnel(df, STEPS).collect()
    assert [(r.step, r.step_name, r.users) for r in rep] == [
        (1, "a", 2), (2, "b", 1), (3, "c", 1),
    ]


def test_funnel_strict_ts_and_greedy_optimality(spark):
    # equal timestamps never advance (strict >): b at the same minute as
    # a does not count, the later b does.
    df = _ev(spark, [(1, "a", 0), (1, "b", 0), (1, "b", 3)])
    assert funnel_stage(df, STEPS).collect()[0].stage == 2
    # greedy earliest-a is optimal: a@0 (no b after) would fail if the
    # fold latched a@5 -- but there is a b@6 after BOTH; the fold must
    # still reach stage 2 via a@0 < b@6.
    df2 = _ev(spark, [(2, "a", 0), (2, "a", 5), (2, "b", 6)])
    assert funnel_stage(df2, STEPS).collect()[0].stage == 2


def test_funnel_zero_user_steps_still_row(spark):
    df = _ev(spark, [(1, "a", 0)])
    rep = funnel(df, STEPS).collect()
    assert [(r.step, r.users) for r in rep] == [(1, 1), (2, 0), (3, 0)]


def test_funnel_validates_steps(spark):
    df = _ev(spark, [(1, "a", 0)])
    with pytest.raises(ValueError, match=">= 2 steps"):
        funnel(df, ["a"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(df, ["a", "a"])


def test_funnel_completed_ts_is_earliest_completion(spark):
    df = _ev(spark, [(1, "a", 0), (1, "b", 2), (1, "b", 9), (1, "c", 4)])
    row = funnel_stage(df, STEPS).collect()[0]
    assert row.stage == 3
    assert row.completed_ts == dt.datetime(2024, 1, 1, 0, 4)


def _stage_w(spark, rows, window_s):
    df = _ev(spark, rows)
    return {
        r.user_id: r.stage
        for r in funnel_stage_windowed(df, STEPS, window_s).collect()
    }


def test_windowed_funnel_window_bounds(spark):
    # chain a@0 b@10 c@20 (minutes): inside a 30-min window, outside 15
    rows = [(1, "a", 0), (1, "b", 10), (1, "c", 20)]
    assert _stage_w(spark, rows, 30 * 60) == {1: 3}
    assert _stage_w(spark, rows, 15 * 60) == {1: 2}
    assert _stage_w(spark, rows, 5 * 60) == {1: 1}


def test_windowed_funnel_later_start_rescues(spark):
    # a@0 cannot reach b@100 within 50 min, but a@90 can — the fold's
    # max-start dominance must pick the later chain start
    rows = [(1, "a", 0), (1, "a", 90), (1, "b", 100)]
    assert _stage_w(spark, rows, 50 * 60) == {1: 2}
    # and the window is measured from the CHAIN start, not per hop:
    # a@0 b@30 c@60 with window 40 fails at c (60 > 0+40) even though
    # each hop is 30 apart; a@0->b@30 still gives stage 2
    rows2 = [(2, "a", 0), (2, "b", 30), (2, "c", 60)]
    assert _stage_w(spark, rows2, 40 * 60) == {2: 2}


def test_windowed_funnel_nonstrict_ties_and_order(spark):
    # non-strict: equal timestamps chain (in step order)
    assert _stage_w(spark, [(1, "a", 5), (1, "b", 5)], 600) == {1: 2}
    # but order still matters: b strictly before a does not chain
    assert _stage_w(spark, [(2, "b", 0), (2, "a", 5)], 600) == {2: 1}


def test_windowed_funnel_report_and_validation(spark):
    df = _ev(spark, [(1, "a", 0), (1, "b", 10), (2, "a", 0)])
    rep = funnel_windowed(df, STEPS, 3600)
    assert [(r.step, r.users) for r in rep.collect()] == [(1, 2), (2, 1), (3, 0)]
    with pytest.raises(ValueError, match="window_seconds"):
        funnel_windowed(df, STEPS, 0)


def test_cohort_retention_matrix(spark):
    # u1 first seen day0, active day0+day2; u2 first seen day2 only.
    df = _ev(
        spark,
        [
            (1, "x", 0), (1, "x", 10),          # day 0 twice -> one pair
            (1, "x", 2 * 24 * 60),              # day 2
            (2, "x", 2 * 24 * 60 + 30),         # day 2
        ],
    )
    out = cohort_retention(df, period="day").collect()
    got = [(r.cohort.isoformat(), r.offset, r.users) for r in out]
    assert got == [
        ("2024-01-01", 0, 1),
        ("2024-01-01", 2, 1),
        ("2024-01-03", 0, 1),
    ]


def test_cohort_retention_month_and_null_rows(spark):
    df = _ev(spark, [(1, "x", 0), (1, "x", 40 * 24 * 60)]).union(
        _ev(spark, []).select(
            F.lit(None).cast("long").alias("user_id"),
            F.lit("x").alias("event_type"),
            F.lit(None).cast("timestamp").alias("ts"),
        )
    )
    out = cohort_retention(df, period="month").collect()
    assert [(r.offset, r.users) for r in out] == [(0, 1), (1, 1)]
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, period="year")


def test_funnel_plan_shape(spark):
    """No window over the event log and NO per-user event buffer: the
    unwindowed funnel's state is two scalars per user, so the plan must
    carry no collect_list (the chained conditional-min formulation) and
    no cartesian."""
    df = _ev(spark, [(1, "a", 0), (1, "b", 1)])
    plan = funnel_stage(df, STEPS)._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan
    assert "collect_list" not in plan
    assert "CartesianProduct" not in plan


def test_funnel_whale_user_bounded_state(spark):
    """One user with 1e5 step events: the chained-min funnel computes
    the exact stage with two scalars of per-user state (the old
    collect_list fold buffered all 1e5 events in one aggregation
    buffer). Types cycle a,b,c with increasing ts -> stage 3, completed
    at the first c (id=2)."""
    base = dt.datetime(2024, 1, 1)
    df = (
        spark.range(100_000)
        .select(
            F.lit(1).alias("user_id"),
            F.element_at(
                F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                (F.col("id") % 3).cast("int") + 1,
            ).alias("event_type"),
            (F.lit(base) + F.make_interval(secs=F.col("id"))).alias("ts"),
        )
    )
    out = funnel_stage(df, STEPS).collect()
    assert len(out) == 1
    assert out[0].stage == 3
    assert out[0].completed_ts == base + dt.timedelta(seconds=2)


def test_funnel_nontimestamp_ts_and_seeded_init(spark):
    """ts as epoch LONG works in both the one-shot and the seeded form
    (the null seed is cast from the column's actual dtype — the old
    hard-coded timestamp cast failed analysis here)."""
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 5)],
        "user_id long, event_type string, ts long",
    )
    one = funnel_stage(df, STEPS, ts_col="ts")
    got = {r.user_id: (r.stage, r.completed_ts) for r in one.collect()}
    assert got == {1: (2, 20), 2: (1, 5)}
    later = spark.createDataFrame(
        [(2, "b", 30), (3, "a", 1)],
        "user_id long, event_type string, ts long",
    )
    seeded = funnel_stage(later, STEPS, ts_col="ts", init=one)
    got2 = {r.user_id: (r.stage, r.completed_ts) for r in seeded.collect()}
    assert got2 == {1: (2, 20), 2: (2, 30), 3: (1, 1)}


def test_windowed_funnel_max_per_step_cap(spark):
    """The cap keeps the earliest N per (user, step): exact when the
    chain lives in the kept prefix, a documented lower bound when the
    completing event is dropped."""
    df = _ev(
        spark,
        [(1, "a", 0), (1, "a", 1), (1, "a", 2), (1, "b", 3)]
        + [(2, "a", 0)] + [(2, "b", m) for m in range(1, 6)] + [(2, "c", 60)],
    )
    # u1: chain a@0..b@3 within 300s — kept even at cap 1 (earliest a)
    s = {r.user_id: r.stage for r in funnel_stage_windowed(
        df, STEPS, 300, max_per_step=1).collect()}
    assert s[1] == 2
    # u2 completes via b@5->c@60 inside the 3600s window regardless of cap
    s2 = {r.user_id: r.stage for r in funnel_stage_windowed(
        df, STEPS, 3600, max_per_step=10).collect()}
    assert s2[2] == 3
    # cap=1 keeps only b@1; c@60 still chains (window 3600) -> exactness
    # when the earliest candidates suffice
    s3 = {r.user_id: r.stage for r in funnel_stage_windowed(
        df, STEPS, 3600, max_per_step=1).collect()}
    assert s3[2] == 3
    # the lower-bound direction: with window 3600 and cap 1, u2's kept
    # events are a@0, b@1, c@60 -> still 3; dropping later candidates
    # can only ever LOWER the stage, never raise it
    uncapped = {r.user_id: r.stage for r in funnel_stage_windowed(
        df, STEPS, 3600).collect()}
    assert all(s3[u] <= uncapped[u] for u in s3)
    with pytest.raises(ValueError, match="max_per_step"):
        funnel_stage_windowed(df, STEPS, 60, max_per_step=0)


def test_funnel_skew_report_counts_step_events_only(spark):
    df = _ev(
        spark,
        [(1, "a", m) for m in range(30)]
        + [(1, "zzz", m) for m in range(50)]  # non-step noise excluded
        + [(2, "b", 0), (3, "a", 0)],
    )
    rep = _fmod.funnel_skew_report(df, STEPS, top_n=2).collect()
    assert rep[0]["user_id"] == 1 and rep[0]["n_rows"] == 30
    assert rep[0]["skew_ratio"] > 1.0 and len(rep) == 2


def test_event_transitions_counts_and_probs(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, "a"), (2, 1, "b"), (3, 1, "a"), (4, 1, "b"),
            (5, 2, "a"), (6, 2, "a"),
        ],
        "event_id long, user_id long, event_type string",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    out = _fmod.event_transitions(
        ev, "user_id", "ts", "event_type", tiebreak_col="event_id"
    )
    rows = {(r["prev_type"], r["next_type"]): (r["n"], r["p"]) for r in out.collect()}
    # user1: a>b, b>a, a>b ; user2: a>a
    assert rows[("a", "b")][0] == 2 and rows[("b", "a")][0] == 1
    assert rows[("a", "a")][0] == 1
    # row-normalized: from 'a' -> b 2/3, a 1/3
    assert rows[("a", "b")][1] == pytest.approx(0.666667)
    assert rows[("a", "a")][1] == pytest.approx(0.333333)
    assert rows[("b", "a")][1] == 1.0


def test_event_transitions_tiebreak_determinism(spark):
    # two events share a timestamp: the tiebreak column decides order
    ev = spark.createDataFrame(
        [(1, 1, "x"), (2, 1, "y"), (3, 1, "z")],
        "event_id long, user_id long, event_type string",
    ).withColumn("ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    out = _fmod.event_transitions(
        ev, "user_id", "ts", "event_type", tiebreak_col="event_id"
    )
    rows = {(r["prev_type"], r["next_type"]) for r in out.collect()}
    assert rows == {("x", "y"), ("y", "z")}


def test_top_paths_orders_and_truncates(spark):
    ev = spark.createDataFrame(
        [
            # user 1 and 2 share journey a>b>c (and user 1 has a 4th
            # event that must be cut by steps=3)
            (1, 1, "a"), (2, 1, "b"), (3, 1, "c"), (4, 1, "d"),
            (5, 2, "a"), (6, 2, "b"), (7, 2, "c"),
            (8, 3, "z"),
        ],
        "event_id long, user_id long, event_type string",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    out = _fmod.top_paths(
        ev, "user_id", "ts", "event_type", steps=3, k=10,
        tiebreak_col="event_id",
    )
    rows = [(r["path"], r["n_users"]) for r in out.collect()]
    assert rows[0] == ("a>b>c", 2)
    assert ("z", 1) in rows
    assert len(rows) == 2


def test_top_paths_k_limit_and_tie_order(spark):
    ev = spark.createDataFrame(
        [(i, i, "t%d" % i) for i in range(1, 6)],
        "event_id long, user_id long, event_type string",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    out = _fmod.top_paths(
        ev, "user_id", "ts", "event_type", steps=2, k=3,
        tiebreak_col="event_id",
    )
    rows = [r["path"] for r in out.collect()]
    # all ties at n_users=1 -> lexicographic path order, capped at k
    assert rows == sorted(rows) and len(rows) == 3
