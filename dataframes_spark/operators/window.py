"""Window / time-series operators: shift (lag/lead) and rolling interval
aggregation.

Reference: ``shift`` (reference: src/Table.luna:1463-1468, engine
native_libs/src/Processing.cpp:534-559) and ``rollingIntervalMultiple`` —
a per-row trailing time window over a sorted timestamp column with
per-window aggregates (src/Table.luna:1397-1436, engine
native_libs/src/Analysis.cpp:735-918, two-pointer window collection at
769-805).

Spark-first: both are ``Window`` frame specs — ``rowsBetween`` for shift,
``rangeBetween`` over the epoch-microsecond ordering for the time
interval. The frame aggregation runs inside the sort, no recompute-per-row
pass like the reference's O(n*w) loop.

Scale note: the reference assumes one global row order. Distributed, a
naive un-partitioned window is a single-reducer bottleneck; every entry
point takes ``partition_by`` so callers with a natural key (user_id,
device, symbol) get the plain per-key window. Partition-FREE calls with
an orderable numeric/timestamp key now route through the range-bucketed
two-pass lane in ``operators/global_order.py`` (per-bucket window +
broadcast boundary exchange — same answers, no SinglePartition sort of
the data; pinned in tests/test_plans.py). Non-bucketable order keys
(strings) keep the legacy global window, which is inherent to their
semantics.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from dataframes_spark.operators.aggregate import build_aggregate, validate_aggregate_types


def _window(order_by, partition_by: Sequence[str] | None):
    parts = list(partition_by) if partition_by else []
    return W.partitionBy(*parts).orderBy(order_by) if parts else W.orderBy(order_by)


def shift(
    df: DataFrame,
    col: str,
    periods: int,
    order_by: str,
    partition_by: Sequence[str] | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Lag (periods>0) / lead (periods<0) by k rows, null-filled, appended
    as ``<col>_shift_<k>`` (reference naming: src/Table.luna:1463-1468).

    Without ``partition_by`` and with an orderable numeric/timestamp
    key, runs on the distributed global-order lane (range buckets +
    boundary exchange, ``global_order.shift_global``) instead of a
    single-partition window; same answers, scalable plan."""
    if not partition_by:
        from dataframes_spark.operators import global_order as go

        if go.is_bucketable(df, order_by):
            return go.shift_global(df, col, periods, order_by, n_buckets)
    w = _window(order_by, partition_by)
    expr = F.lag(col, periods).over(w) if periods >= 0 else F.lead(col, -periods).over(w)
    return df.withColumn(f"{col}_shift_{periods}", expr)


def rolling_interval(
    df: DataFrame,
    ts_col: str,
    interval_us: int,
    pairs: Iterable[tuple[str, Sequence[str]]],
    partition_by: Sequence[str] | None = None,
    inclusive_left: bool = True,
) -> DataFrame:
    """Per-row trailing time window ``[t - interval, t]`` (or the
    reference's strict ``(t - interval, t]`` with ``inclusive_left=False``,
    Analysis.cpp:794), computing ``<col>_<agg>`` double columns.

    Implemented as ``rangeBetween`` over the timestamp cast to epoch
    microseconds — Spark evaluates the sliding frame inside the sorted
    partition, one pass. Without ``partition_by``, runs on the
    distributed fixed-width-bucket lane (``global_order.
    rolling_range_global``): per-bucket frames + boundary ghost rows,
    no single-reducer sort.
    """
    validate_aggregate_types(df, pairs := [(c, list(fns)) for c, fns in pairs])
    order = F.unix_micros(F.col(ts_col))
    if not partition_by:
        from dataframes_spark.operators import global_order as go

        return go.rolling_range_global(
            df, order, int(interval_us), pairs, inclusive_left
        )
    w = _window(order, partition_by)
    lo = -int(interval_us) if inclusive_left else -int(interval_us) + 1
    frame = w.rangeBetween(lo, 0)

    exprs = [
        build_aggregate(fn, col, wrap=lambda e, f=frame: e.over(f))
        for col, fns in pairs
        for fn in fns
    ]
    return df.select("*", *exprs)


def rolling_range(
    df: DataFrame,
    key_col: str,
    width: int,
    pairs: Iterable[tuple[str, Sequence[str]]],
    partition_by: Sequence[str] | None = None,
    inclusive_left: bool = True,
) -> DataFrame:
    """Trailing window over a NUMERIC ordering key: ``[k - width, k]``
    (strict left edge with ``inclusive_left=False``). The reference's
    two-pointer engine supports INT64/DOUBLE interval keys
    (native_libs/src/Core/ArrowUtilities.h:111,160; Analysis.cpp:775-801)
    even though only TIMESTAMP is reachable from its Luna API — this is
    the numeric twin of ``rolling_interval`` (partition-free calls run
    on the distributed fixed-width-bucket lane, see
    ``rolling_interval``)."""
    validate_aggregate_types(df, pairs := [(c, list(fns)) for c, fns in pairs])
    if not partition_by:
        from dataframes_spark.operators import global_order as go

        return go.rolling_range_global(
            df, F.col(key_col), int(width), pairs, inclusive_left
        )
    w = _window(F.col(key_col), partition_by)
    lo = -int(width) if inclusive_left else -int(width) + 1
    frame = w.rangeBetween(lo, 0)
    exprs = [
        build_aggregate(fn, col, wrap=lambda e, f=frame: e.over(f))
        for col, fns in pairs
        for fn in fns
    ]
    return df.select("*", *exprs)


def rolling_rows(
    df: DataFrame,
    col: str,
    n: int,
    fns: Sequence[str],
    order_by: str,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Trailing n-row window (Spark-native companion to the time-interval
    variant). Partition-free calls with an orderable key run on the
    distributed positional lane (``global_order.rolling_rows_global``)."""
    validate_aggregate_types(df, [(col, list(fns))])
    if not partition_by:
        from dataframes_spark.operators import global_order as go

        if go.is_bucketable(df, order_by):
            return go.rolling_rows_global(df, col, n, fns, order_by)
    w = _window(order_by, partition_by).rowsBetween(-(n - 1), 0)
    exprs = [build_aggregate(fn, col, wrap=lambda e, f=w: e.over(f)) for fn in fns]
    return df.select("*", *exprs)


def time_rollup(
    df: DataFrame,
    ts_col: str,
    resolutions: Sequence[str],
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Multi-resolution time rollup (hypertable-style continuous-aggregate
    shape): one output row per (resolution, time bucket [, group]) with
    the same aggregate set at every resolution.

    Computed as a single pass per resolution over the source, unioned —
    each branch is a plain hash aggregate on (bucket, group), so map-side
    partial aggregation applies and nothing is recomputed from another
    resolution's output. At warehouse scale, write each resolution
    partitioned by ``resolution, bucket_start`` and newest-partition
    refreshes stay incremental.

    ``resolutions`` are Spark window durations ('1 hour', '1 day', ...);
    ``aggs`` are ready aggregate expressions (aliased by the caller).
    """
    branches = []
    for res in resolutions:
        bucket = F.window(F.col(ts_col), res)
        agged = df.groupBy(bucket.alias("bucket"), *[F.col(g) for g in group_by]).agg(
            *aggs
        )
        agg_cols = [c for c in agged.columns if c != "bucket" and c not in group_by]
        branches.append(
            agged.select(
                F.lit(res).alias("resolution"),
                F.col("bucket.start").alias("bucket_start"),
                *[F.col(g) for g in group_by],
                *[F.col(c) for c in agg_cols],
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


_DURATION_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def _duration_micros(every: str) -> int:
    """Parse a FIXED-duration interval string ("1 hour", "90 minutes",
    "1 day 12 hours") to microseconds. Calendar units (month/year) are
    rejected: ``resample`` buckets with ``F.window``, whose durations
    are fixed from the epoch, and a calendar spine would drift from
    those buckets across DST transitions."""
    toks = every.strip().lower().split()
    if not toks or len(toks) % 2:
        raise ValueError(
            f"resample every={every!r}: expected '<n> <unit>' pairs"
        )
    total = 0
    for num, unit in zip(toks[::2], toks[1::2]):
        unit = unit.rstrip("s")
        if unit not in _DURATION_US:
            raise ValueError(
                f"resample every={every!r}: {unit!r} is not a fixed "
                "duration (month/year would drift from F.window's "
                "epoch-fixed buckets); use microsecond..week units"
            )
        try:
            n = int(num)
        except ValueError:
            raise ValueError(
                f"resample every={every!r}: {num!r} is not an integer "
                "count (fractional durations: use a smaller unit, "
                "e.g. '90 minutes' for 1.5 hours)"
            ) from None
        total += n * _DURATION_US[unit]
    if total <= 0:
        raise ValueError(f"resample every={every!r}: must be positive")
    return total


def resample(
    df: DataFrame,
    ts_col: str,
    every: str,
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
    fill: str = "null",
) -> DataFrame:
    """Downsample to a fixed interval on a DENSE per-group time spine:
    one row per (group, bucket) from each group's first bucket to its
    last, with buckets that saw no data present as gap rows — what
    ``time_rollup`` (sparse, bucket-per-datum) cannot express and every
    time-series consumer eventually needs (charts, diff-vs-previous,
    gap detection).

    ``fill`` controls gap rows: ``"null"`` keeps the aggregates null,
    ``"zero"`` coalesces them to 0, ``"ffill"`` carries the last seen
    value forward within the group (ordered by bucket).

    Scale shape: the source aggregates ONCE (hash agg on
    (bucket, group), map-side partial combine — the only pass over the
    data); the spine derives from that already-bucket-sized result (a
    per-group min/max agg + one ``sequence`` explode, never a
    driver-side range probe), and the gap join runs at bucket
    granularity, so everything after the first aggregate is
    output-sized. The ffill window partitions by group — with no
    ``group_by`` it is the documented single-reducer global form, at
    bucket (not datum) cardinality.
    """
    if fill not in ("null", "zero", "ffill"):
        raise ValueError(f"fill must be null|zero|ffill, got {fill}")
    # spine arithmetic must match F.window's: window buckets are FIXED
    # durations from the epoch, while sequence(ts, ts, interval) is
    # calendar arithmetic (DST-aware) — for day-or-larger steps in a DST
    # session timezone the calendar spine drifts an hour past a
    # transition and every real bucket after it would miss the join.
    # So the step is validated as a fixed duration and the spine is
    # generated in epoch-microsecond space.
    step_us = _duration_micros(every)
    gb = [F.col(g) for g in group_by]
    bucket = F.window(F.col(ts_col), every)
    agged0 = df.groupBy(bucket.alias("__w"), *gb).agg(*aggs)
    agg_cols = [c for c in agged0.columns if c not in ("__w", *group_by)]
    agged = agged0.select(
        F.col("__w.start").alias("bucket"), *group_by, *agg_cols
    )
    spine = (
        agged.groupBy(*gb)
        .agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
        .select(
            *group_by,
            F.explode(
                F.sequence(
                    F.unix_micros(F.col("__mn")),
                    F.unix_micros(F.col("__mx")),
                    F.lit(step_us),
                )
            ).alias("__bucket_us"),
        )
        .select(
            *group_by,
            F.timestamp_micros(F.col("__bucket_us")).alias("bucket"),
        )
    )
    out = spine.join(agged, [*group_by, "bucket"], "left")
    if fill == "zero":
        out = out.select(
            *group_by,
            "bucket",
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in agg_cols],
        )
    elif fill == "ffill":
        from pyspark.sql import Window as W

        w = (
            W.partitionBy(*group_by)
            .orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        out = out.select(
            *group_by,
            "bucket",
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                for c in agg_cols
            ],
        )
    else:
        out = out.select(*group_by, "bucket", *agg_cols)
    return out
