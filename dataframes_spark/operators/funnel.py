"""Ordered-step funnel analysis and cohort retention over an event log.

Product-analytics staples the reference's event tooling stops short of
(its analysis surface ends at rolling windows, `Analysis.cpp:735-918`);
both are first-class operators here because a training-data pipeline's
telemetry — crawl fetches, filter passes, human review — is itself an
event log that gets funnel'd ("fetched -> parsed -> kept") and
cohorted ("docs first seen in week W still surviving dedup at W+k").

Scale design:

- The unwindowed funnel runs as k CHAINED CONDITIONAL-MIN aggregates
  (``completion(i) = min ts of step-i events strictly after
  completion(i-1)``): each round is a map-side-partial min over ONE
  step's events plus a user-keyed join against the user-sized state
  relation. Per-user state is two scalars (stage, ts) — NOTHING grows
  with a user's event volume, so a bot/whale user with millions of
  events costs the same executor memory as anyone else.
- The windowed funnel needs candidate events inside the aggregation
  buffer (the window constraint couples steps); its per-(user, step)
  candidate set can be capped with ``max_per_step`` (a map-side
  WindowGroupLimit) when whale users are a concern — see
  `funnel_stage_windowed`. `funnel_skew_report` measures the
  max-events-per-user BEFORE committing to the groupBy.
- The post-fold relation is user-sized, and the final report
  aggregation reduces it to k rows (funnel) or |cohorts| x |offsets|
  rows (retention) with a second, tiny shuffle.
- Retention buffers one row per DISTINCT (user, period) — bounded by
  the calendar, not the event volume.

Funnel semantics (the standard "ordered funnel" definition): a user
reaches step i when there exist events e_1 < e_2 < ... < e_i (strictly
increasing timestamps) with the required types, in order. The fold takes
the EARLIEST qualifying event for each step; the greedy choice is
optimal (any later step-i event admits a superset of step-i+1
continuations), so "deepest step reached" is exact, not heuristic.
Equal timestamps never satisfy the strict `>`, making the result
independent of the within-timestamp scan order — deterministic on any
engine and any partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    init: DataFrame | None = None,
) -> DataFrame:
    """Per-user deepest funnel step: ``(user_col, stage, completed_ts)``
    with ``stage`` in 0..len(steps) (0 = never did step 1) and
    ``completed_ts`` the timestamp at which that deepest stage was
    reached (NULL at stage 0).

    The greedy chain is computed as k CHAINED CONDITIONAL-MIN
    aggregates: ``completion(i) = min ts of step-i events strictly
    after completion(i-1)`` — exactly the earliest-chain fold (the
    greedy choice is optimal, see the module docstring), with ZERO
    per-user buffering. Each round is a map-side-partial min over that
    step's events plus a user-keyed join against the user-sized state
    relation, so per-user state is two scalars however many events a
    whale user (bot, crawler) has — the previous formulation collected
    ALL of a user's step events into one aggregation-buffer array,
    which at 100x data is an executor-memory risk. ``ts_col`` may be
    any orderable type (timestamp, epoch long, date); the state's null
    seed is cast from the column's ACTUAL dtype.

    ``init`` (optional) seeds each user's state from a prior
    ``funnel_stage`` result — the incremental form: because the greedy
    fold's ``(stage, last_ts)`` pair is a SUFFICIENT STATISTIC (the
    earliest prefix chain admits a superset of continuations, and later
    events can never improve an earlier prefix), folding time-ordered
    batches through ``init`` equals the one-shot fold over their union.
    Users present only in ``init`` carry their state through unchanged.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")

    # ONE user-keyed exchange for the whole fold: after this explicit
    # repartition every per-step conditional-min groupBy and every
    # state join consumes the SAME hashpartitioning(user) — filters
    # preserve partitioning, so the k rounds add sorts and stages but
    # never move event data again (plan-pinned in tests/test_funnel.py)
    # Exchange accounting (measured, r11): the k rounds shuffle k
    # DISJOINT step-typed subsets — 1x the event data in total, in k
    # stages. A single up-front repartition(user) does NOT collapse
    # them: Catalyst pushes each round's step filter below the
    # exchange (k distinct exchanges, zero reuse), and a checkpoint
    # barrier loses the partitioning metadata (LogicalRDD reads back
    # as unknown-partitioned) while paying a full materialization —
    # both variants benched slower than the plain form. An exact
    # ONE-aggregation form does not exist: conditional min i depends
    # on aggregate i-1's result, which no order-independent aggregate
    # can reference mid-pass, and no fixed per-(user, step) timestamp
    # cap preserves exactness (min{ts > c} may need arbitrarily deep
    # order statistics). k subset-exchanges with two scalars of state
    # per user IS the scale-correct shape.
    ev = df.filter(
        F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    users = ev.select(user_col).distinct()
    ts_type = df.schema[ts_col].dataType

    if init is not None:
        seed = init.select(
            F.col(user_col),
            F.col("stage").alias("__stage"),
            F.col("completed_ts").alias("__ts0"),
        )
        state = users.join(seed, user_col, "full_outer").select(
            F.col(user_col),
            F.coalesce(F.col("__stage"), F.lit(0)).alias("__stage"),
            F.col("__ts0"),
        )
    else:
        state = users.select(
            F.col(user_col),
            F.lit(0).alias("__stage"),
            F.lit(None).cast(ts_type).alias("__ts0"),
        )

    for i, step in enumerate(steps, start=1):
        # earliest step-i event strictly after the user's current
        # completion ts, for users sitting at stage i-1
        nxt = (
            ev.filter(F.col("__t") == step)
            .join(
                state.filter(F.col("__stage") == i - 1).select(
                    user_col, "__ts0"
                ),
                user_col,
            )
            .filter(F.col("__ts0").isNull() | (F.col("__ts") > F.col("__ts0")))
            .groupBy(user_col)
            .agg(F.min("__ts").alias("__mn"))
        )
        adv = (F.col("__stage") == i - 1) & F.col("__mn").isNotNull()
        state = state.join(nxt, user_col, "left").select(
            F.col(user_col),
            F.when(adv, F.lit(i)).otherwise(F.col("__stage")).alias("__stage"),
            F.when(adv, F.col("__mn")).otherwise(F.col("__ts0")).alias("__ts0"),
        )

    return state.select(
        F.col(user_col),
        F.col("__stage").alias("stage"),
        F.col("__ts0").alias("completed_ts"),
    )


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel report: one row per step — ``(step, step_name, users)``
    where ``users`` counts users whose ordered event history reaches
    that step (see module docstring for the exact semantics).

    Cost: the `funnel_stage` shuffle, then a k-row aggregate. The
    cumulative "reached >= i" sums happen on the k-row stage histogram
    via a window — bounded by the step count, never by the data.
    """
    return funnel_report_from_stages(
        funnel_stage(df, steps, user_col, type_col, ts_col), steps
    )


def funnel_report_from_stages(
    stages: DataFrame, steps: Sequence[str]
) -> DataFrame:
    """The k-row funnel report from a `funnel_stage` result (one-shot or
    store-seeded) — factored out so the streaming store derives the
    identical report from its persisted per-user stages."""
    k = len(list(steps))
    hist = stages.groupBy("stage").agg(F.count(F.lit(1)).alias("__n"))
    # users reaching step i = sum of histogram counts with stage >= i;
    # computed by exploding each histogram row to the steps it satisfies
    # (<= k rows out per row in) and re-aggregating — k*(k+1)/2 rows max.
    reached = (
        hist.filter(F.col("stage") >= 1)
        .select(
            F.explode(F.sequence(F.lit(1), F.col("stage"))).alias("step"),
            F.col("__n"),
        )
        .groupBy("step")
        .agg(F.sum("__n").alias("users"))
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    # left-join against the full step spine so zero-user steps still row
    # (the <= k-row reached side broadcasts; the spine is driver-tiny)
    spine = stages.sparkSession.range(1, k + 1).select(
        F.col("id").cast("int").alias("step")
    )
    return (
        spine.join(F.broadcast(reached), "step", "left")
        .select(
            F.col("step"),
            F.element_at(steps_lit, F.col("step")).alias("step_name"),
            F.coalesce(F.col("users"), F.lit(0)).cast("long").alias("users"),
        )
        .orderBy("step")
    )


def funnel_skew_report(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    top_n: int = 20,
) -> DataFrame:
    """Whale-user diagnosis for a prospective funnel: the ``top_n``
    users by STEP-TYPED event count (exactly the rows a funnel's
    user-keyed aggregation would carry), with share and skew ratio —
    `operators/skew.skew_report` scoped to the funnel's own filter.
    Run this before a `funnel_windowed` over an untrusted event log:
    a bot with millions of step events shows up here first, and
    ``max_per_step`` (see `funnel_stage_windowed`) is the dial that
    bounds it. The unwindowed `funnel` needs no bound — its per-user
    state is two scalars regardless of volume."""
    from dataframes_spark.operators.skew import skew_report

    steps = list(steps)
    return skew_report(
        df.filter(F.col(type_col).isin(steps)), user_col, top_n
    )


def funnel_stage_windowed(
    df: DataFrame,
    steps: Sequence[str],
    window_seconds: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_per_step: int | None = None,
) -> DataFrame:
    """Per-user deepest funnel step WITHIN a time window:
    ``(user_col, stage)`` where a user reaches stage i iff there exist
    events e_1 .. e_i with the required types, NON-DECREASING
    timestamps, and ``ts(e_i) - ts(e_1) <= window_seconds`` — the
    "converted within T" question (same semantics family as
    ClickHouse's windowFunnel). Note the ordering is non-strict here
    (ties may chain, in step order), unlike the unwindowed `funnel`'s
    strict ordering: with a window, non-strict is what makes the
    exists-quantified semantics scan-order-free.

    Same cost shape as `funnel_stage`: one groupBy shuffle of step-typed
    events, then a JVM fold. The fold keeps, per stage, the MAXIMUM
    chain-start timestamp seen so far; scanning in (ts, step-index)
    order makes every stored chain extendable by the current event
    (its last event cannot be later), so max-start is a complete
    dominance order and the fold is exact, not heuristic: a larger
    start can only admit MORE continuations within the window.

    ``max_per_step`` bounds the aggregation buffer for whale users: only
    the EARLIEST ``max_per_step`` events per (user, step) enter the fold
    (a map-side WindowGroupLimit — the limit applies before rows leave
    the scan task). Exact whenever no (user, step) pair exceeds the cap
    (`funnel_skew_report` measures that); for users beyond it the
    result is a documented LOWER bound on the true stage (chains built
    from dropped later events are missed, never invented). Events equal
    on (user, step, ts) are interchangeable to the fold, so which
    survives the cap cannot change the answer."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    if max_per_step is not None and max_per_step < 1:
        raise ValueError(f"max_per_step must be >= 1, got {max_per_step}")
    k = len(steps)
    w_us = int(window_seconds * 1_000_000)
    # step index BEFORE the shuffle so the sort key is (us, step order)
    idx = F.lit(None).cast("int")
    for i in reversed(range(k)):
        idx = F.when(F.col(type_col) == steps[i], F.lit(i + 1)).otherwise(idx)
    ev = df.filter(
        F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col),
        # NTZ-tolerant: unix_micros requires TIMESTAMP proper
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        idx.alias("__j"),
    )
    if max_per_step is not None:
        from pyspark.sql import Window as W

        wcap = W.partitionBy(user_col, "__j").orderBy(F.col("__us").asc())
        ev = ev.withColumn("__rn", F.row_number().over(wcap)).filter(
            F.col("__rn") <= max_per_step
        ).drop("__rn")
    per_user = (
        ev.select(
            F.col(user_col),
            F.struct(F.col("__us").alias("us"), F.col("__j").alias("j")).alias(
                "__e"
            ),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("__e")).alias("__ev"))
    )
    acc0 = F.array_repeat(F.lit(None).cast("long"), k)  # best chain start/stage
    def merge(acc, e):
        first = F.greatest(F.element_at(acc, 1), e["us"])
        prev = F.element_at(acc, e["j"] - 1)  # null when j == 1 via guard
        extended = F.when(
            prev.isNotNull() & (e["us"] <= prev + F.lit(w_us)),
            F.greatest(F.element_at(acc, e["j"]), prev),
        ).otherwise(F.element_at(acc, e["j"]))
        newv = F.when(e["j"] == 1, first).otherwise(extended)
        return F.transform(
            acc, lambda x, i: F.when(i == e["j"] - 1, newv).otherwise(x)
        )

    fold = F.aggregate(F.col("__ev"), acc0, merge)
    stage = F.size(F.filter(fold, lambda x: x.isNotNull()))
    return per_user.select(F.col(user_col), stage.alias("stage"))


def funnel_windowed(
    df: DataFrame,
    steps: Sequence[str],
    window_seconds: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_per_step: int | None = None,
) -> DataFrame:
    """Windowed funnel report: ``(step, step_name, users)`` with users
    counted per `funnel_stage_windowed` (reached within the window);
    ``max_per_step`` passes through to bound whale-user buffers."""
    k = len(list(steps))
    stages = funnel_stage_windowed(
        df, steps, window_seconds, user_col, type_col, ts_col, max_per_step
    )
    hist = stages.groupBy("stage").agg(F.count(F.lit(1)).alias("__n"))
    reached = (
        hist.filter(F.col("stage") >= 1)
        .select(
            F.explode(F.sequence(F.lit(1), F.col("stage"))).alias("step"),
            F.col("__n"),
        )
        .groupBy("step")
        .agg(F.sum("__n").alias("users"))
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    spine = stages.sparkSession.range(1, k + 1).select(
        F.col("id").cast("int").alias("step")
    )
    return (
        spine.join(F.broadcast(reached), "step", "left")
        .select(
            F.col("step"),
            F.element_at(steps_lit, F.col("step")).alias("step_name"),
            F.coalesce(F.col("users"), F.lit(0)).cast("long").alias("users"),
        )
        .orderBy("step")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix in long form: ``(cohort, offset, users)``
    — users whose FIRST event falls in period ``cohort`` and who were
    active again ``offset`` periods later (offset 0 = the cohort period
    itself, so ``offset=0`` rows give cohort sizes). ``period`` is
    ``"week"`` (ISO Monday start), ``"month"``, or ``"day"``.

    ONE shuffle of (user, period) pairs: the per-user activity set is
    collected as a ``collect_set`` of period starts (map-side partial
    sets, bounded by the calendar span), the cohort is its array MIN,
    and offsets explode from the set — the event log itself never
    shuffles twice and no distinct+join re-partitioning happens.
    """
    return retention_from_pairs(
        activity_pairs(df, user_col, ts_col, period), period
    )


def activity_pairs(
    df: DataFrame, user_col: str, ts_col: str, period: str
) -> DataFrame:
    """The ``(u, p)`` activity relation retention is a pure function of:
    user x truncated period date, null-filtered. NOT deduplicated here —
    the per-user ``collect_set`` dedups in-flight; a persisted store
    should ``.distinct()`` before appending (retention_each_batch
    does). Set semantics make this the ideal incremental state: pairs
    of a union = union of pairs, idempotent under re-delivery and
    independent of batch order."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day|week|month, got {period!r}")
    p = F.date_trunc(period, F.col(ts_col))
    return df.filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(F.col(user_col).alias("u"), p.cast("date").alias("p"))


def retention_from_pairs(pairs: DataFrame, period: str) -> DataFrame:
    """The cohort matrix from an ``activity_pairs`` relation (one-shot
    or a persisted pair store) — the `cohort_retention` fold, factored
    so the streaming store derives the identical report."""
    per_user = (
        pairs.groupBy("u")
        .agg(F.collect_set("p").alias("__ps"))
        .select(
            F.array_min("__ps").alias("__cohort"),
            F.explode("__ps").alias("__active"),
        )
    )
    if period == "month":
        off = (
            (F.year("__active") - F.year("__cohort")) * 12
            + (F.month("__active") - F.month("__cohort"))
        ).cast("int")
    elif period == "week":
        off = (F.datediff("__active", "__cohort") / 7).cast("int")
    else:
        off = F.datediff("__active", "__cohort").cast("int")
    return (
        per_user.groupBy(
            F.col("__cohort").alias("cohort"), off.alias("offset")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("cohort", "offset")
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition report over an event log:
    ``(prev_type, next_type, n, p)`` where ``p`` is the row-normalized
    transition probability (rounded 6) — the "what do users do next"
    matrix and the input to journey/path diagnostics.

    Per-user successor pairing is a lag window over (ts, tiebreak) —
    PARTITIONED by user, so the one exchange it costs spreads over all
    reducers and the per-partition sort is per-user-sized. The pair
    counts relation is at most |types|^2 rows; its row totals fold back
    with a broadcast join, never a second full shuffle. Ties on ``ts``
    are ordered by ``tiebreak_col`` (default: the event id is
    recommended) so the pairing is deterministic on any engine and any
    partitioning."""
    from pyspark.sql import Window as W

    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = W.partitionBy(user_col).orderBy(*order)
    prev = F.lag(type_col).over(w)
    pairs = (
        df.select(prev.alias("prev_type"), F.col(type_col).alias("next_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("__t"))
    return pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("__t"), 6).alias("p"),
    )


def top_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: int = 5,
    k: int = 20,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """The ``k`` most common first-``steps`` user journeys:
    ``(path, n_users)`` with ``path`` the '>'-joined event types of each
    user's first ``steps`` events — the path-analysis staple (sankey /
    sunburst input).

    Plan: ONE user-keyed exchange does all the work — the rank window
    (map-side cut via WindowGroupLimit: at most ``steps`` rows per user
    survive per input partition) and the per-user fold reuse the same
    hash partitioning, so the fold adds no exchange. The path relation
    is user-sized, its count is path-sized, and the final top-k is a
    TakeOrdered heap, never a global sort. Deterministic: (ts, tiebreak)
    totally orders each user's events."""
    from pyspark.sql import Window as W

    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = W.partitionBy(user_col).orderBy(*order)
    ranked = (
        df.select(
            F.col(user_col).alias("__u"),
            F.col(type_col).alias("__e"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") <= steps)
    )
    paths = ranked.groupBy("__u").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct("__rn", "__e"))),
                lambda s: s["__e"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(k)
    )
