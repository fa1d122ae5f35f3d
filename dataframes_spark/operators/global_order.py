"""Distributed lane for the reference's GLOBAL-row-order operators.

The reference runs ``shift`` / ``interpolate`` / ``rollingInterval`` over
one implicit global row order — free on its single-threaded engine
(reference: native_libs/src/Processing.cpp:534-559 shift,
Processing.cpp:271-321 interpolate, Analysis.cpp:735-918 rolling) — but
the naive Spark translation (``Window.orderBy(key)`` with no partition)
plans an ``Exchange SinglePartition``: one reducer sorts the whole table.
This module makes the PARTITION-FREE call itself scale:

1. **Bucketize.** The order key splits into n contiguous ranges —
   quantile boundaries (one ``percentile_approx`` aggregate riding into
   the plan as a broadcast 1-row frame, the ``qcut`` pattern) for the
   positional operators, fixed-width ranges (``max(width, span/n)`` wide,
   from a min/max aggregate) for the range-window operators so a row's
   trailing window can reach AT MOST one bucket back. Equal keys always
   colocate (assignment is a monotonic pure function of the key), so
   range frames never split a tie group.
2. **Local pass.** Each bucket computes the operator with an ordinary
   window partitioned by bucket id — n-way parallel sort, the same
   per-bucket plan Spark builds for an explicit ``partition_by``.
3. **Boundary exchange.** Only rows whose frame crosses a bucket edge
   move: k skinny ``(pos, value)`` rows per bucket for shift-k, four
   scalars per bucket per column for interpolate, the trailing ``width``
   key-span for rolling windows (ghost copies unioned into the next
   bucket, aggregated, then dropped). All are broadcast-sized relations.

Global positions come from per-bucket ``row_number`` plus a running
offset over the bucket-count relation — the only single-partition
work anywhere is over ≤ n-buckets-row aggregates (the same shape as any
``df.agg()``); the full table is never sorted on one reducer
(pinned in tests/test_plans.py: every ``Exchange SinglePartition`` in
these plans sits directly above an aggregate, never above a scan).

Results are bucketing-independent: the boundary exchange reconstructs
exactly the rows a global window would have seen, so the same inputs
produce the same answers as the single-partition form (the driver's
DuckDB oracle rows for ``shift_lag`` / ``interpolate_linear`` /
``rolling_1h`` hold across both lanes).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from dataframes_spark.operators.aggregate import build_aggregate

# dtypes an order key must have for range bucketization (percentile /
# arithmetic over the key); anything else falls back to the legacy
# single-partition lane at the call site
BUCKETABLE_PREFIXES = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "decimal",
    "date",
    "timestamp",
)


# plan-estimated input bytes each global-order bucket should own: the
# bucketize + boundary-exchange machinery has a fixed per-bucket cost
# (percentile slot, offsets row, edge scalars), so tiny inputs must not
# pay for hundreds of buckets (r8: 200 buckets of 3k rows at sf0.1 made
# interpolate/rolling 3-4x slower than the single-reducer lane they
# replaced). 16 MiB of scan-estimate per bucket keeps a bucket's sort
# comfortably in-executor while sizing the count to the data.
_TARGET_BUCKET_BYTES = 16 * 1024 * 1024


def default_buckets(df: DataFrame) -> int:
    """Bucket count for the global lane: one bucket per
    ``_TARGET_BUCKET_BYTES`` of the optimized plan's size estimate
    (never fewer than 2 — the no-data-bearing-SinglePartition invariant
    holds at any count), capped at the session's shuffle-partition
    setting (the parallelism every other shuffle in the job gets, and
    what a 100 TB input saturates to). Bucketing only steers load —
    results are bucketing-independent by construction — so the estimate
    being rough is free."""
    try:
        cap = max(2, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")))
    except (ValueError, TypeError):
        cap = 200
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        est = max(2, -(-size // _TARGET_BUCKET_BYTES))  # ceil div
        return min(cap, est)
    except Exception:  # noqa: BLE001 — estimate unavailable: keep old cap
        return cap


def is_bucketable(df: DataFrame, order_by: str) -> bool:
    dt = dict(df.dtypes).get(order_by, "")
    return dt.startswith(BUCKETABLE_PREFIXES)


def _bucketize_quantile(
    df: DataFrame, order: Column, n_buckets: int, accuracy: int | None = None
) -> DataFrame:
    """Add ``__go_b``: the row's range bucket from n-1 approximate
    quantile boundaries of the order key. Boundaries only steer load
    balance — results never depend on where a row lands, so the sketch's
    approximation is free, and the accuracy only needs to resolve
    ~1/n_buckets-wide ranks (4x oversampling bounds the per-bucket load
    imbalance at ~25%); the old fixed 10_000 made the bounds aggregate
    the most expensive stage of the whole lane. Null order keys take
    bucket 0 (the global nulls-first sort position)."""
    if accuracy is None:
        accuracy = max(100, 4 * n_buckets)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    x = order.cast("double")
    bounds = df.agg(F.percentile_approx(x, qs, accuracy).alias("__go_bnds"))
    bucket = F.aggregate(
        F.col("__go_bnds"),
        F.lit(0),
        lambda acc, b: acc + F.when(x > b, 1).otherwise(0),
    ).cast("int")
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__go_b", F.coalesce(bucket, F.lit(0)))
        .drop("__go_bnds")
    )


def _sort_proxy(df: DataFrame, order_cols: Sequence[str]) -> Column:
    """A numeric expression MONOTONE (non-strictly) in the row ordering
    of ``order_cols``, for quantile bucketization of arbitrary keys:
    numeric/temporal first column → the column itself; string first
    column → its first 8 UTF8 bytes as an unsigned big-endian integer
    (monotone because Spark compares strings byte-wise). Non-strict is
    enough: rows equal on the proxy land in ONE bucket (they can never
    straddle a quantile boundary — the bucket comparison is on the
    proxy itself), which preserves correctness and only affects load
    balance, exactly like quantile-boundary ties on a numeric key.
    Multi-column orders proxy on the first column alone for the same
    reason. NOT range-repartition + spark_partition_id: the range
    partitioner SAMPLES its boundaries with a per-RDD seed, so two plan
    branches over the same input could bucketize differently;
    percentile boundaries are a deterministic function of the data."""
    first = order_cols[0]
    dt = dict(df.dtypes).get(first, "")
    if dt.startswith(BUCKETABLE_PREFIXES):
        return F.col(first).cast("double")
    # first 8 UTF8 bytes as hex, zero-padded on the right to 16 digits
    # (0x00 sorts below every byte, so prefix < extension survives the
    # padding), read as an unsigned integer. conv emits a decimal
    # STRING; the double cast rounds monotonically, which keeps the
    # non-strict ordering (conv to long would overflow the sign bit
    # for leading bytes >= 0x80).
    first8 = F.substring(F.encode(F.col(first).cast("string"), "UTF-8"), 1, 8)
    return F.conv(F.rpad(F.hex(first8), 16, "0"), 16, 10).cast("double")


def _with_positions(
    bdf: DataFrame, order: Column | Sequence[Column]
) -> tuple[DataFrame, DataFrame]:
    """Per-bucket row numbers + global positions. Returns the positioned
    frame (``__go_lrn``, ``__go_cnt``, ``__go_off``, ``__go_pos``) and the
    tiny per-bucket offsets relation (``__go_b``, ``__go_cnt``,
    ``__go_off``). The running-offset window runs over ≤ n-buckets rows —
    the only single-partition step, at bucket (not row) cardinality."""
    orders = list(order) if isinstance(order, (list, tuple)) else [order]
    counts = bdf.groupBy("__go_b").agg(F.count(F.lit(1)).alias("__go_cnt"))
    woff = W.orderBy("__go_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "__go_b",
        "__go_cnt",
        F.coalesce(F.sum("__go_cnt").over(woff), F.lit(0)).alias("__go_off"),
    )
    w = W.partitionBy("__go_b").orderBy(*orders)
    pos = bdf.withColumn("__go_lrn", F.row_number().over(w)).join(
        F.broadcast(offsets), "__go_b"
    )
    return (
        pos.withColumn(
            "__go_pos", (F.col("__go_off") + F.col("__go_lrn")).cast("bigint")
        ),
        offsets,
    )


def _bucketized(
    df: DataFrame, order_cols: Sequence[str], n_buckets: int | None
) -> DataFrame:
    """Bucketize for the row-position lane: deterministic quantile
    boundaries over a numeric SORT PROXY of the first order column (see
    `_sort_proxy`) — handles any orderable key type, and both plan
    branches (data + offsets) bucketize identically by construction."""
    return _bucketize_quantile(
        df, _sort_proxy(df, order_cols), n_buckets or default_buckets(df)
    )


def nullsafe_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Join with NULL-SAFE equality on ``on`` (right-side key copies
    dropped) — the join-back every grouped lane needs: a NULL group key
    is a real group to groupBy/collect/window, so a USING join would
    silently orphan its rows. One definition instead of a per-site
    hand-rolled alias/eqNullSafe/drop block."""
    renamed = right.select(
        *[F.col(c).alias(f"__nsj_{c}") for c in on],
        *[c for c in right.columns if c not in on],
    )
    cond = None
    for c in on:
        piece = left[c].eqNullSafe(renamed[f"__nsj_{c}"])
        cond = piece if cond is None else cond & piece
    r = F.broadcast(renamed) if broadcast_right else renamed
    return left.join(r, cond, how).drop(*[f"__nsj_{c}" for c in on])


def global_positions(
    df: DataFrame,
    order_by: str | Sequence[str],
    n_buckets: int | None = None,
    pos_col: str = "pos",
) -> DataFrame:
    """Global 1..N row positions over an explicit ordering WITHOUT a
    single-reducer sort — the distributed replacement for
    ``row_number().over(Window.orderBy(...))`` (whose plan funnels the
    whole table through one ``Exchange SinglePartition``).

    Bucketize on the order key (quantile boundaries for a numeric key,
    range repartition otherwise), number rows per bucket with an
    ordinary partitioned window, and add the running per-bucket count
    offset (a ≤ n-buckets-row relation — the only single-partition work
    is that bucket-cardinality aggregate, the same shape as any
    ``df.agg()``). Equal keys get an arbitrary-but-valid resolution,
    the same contract as the global window form. Row-POSITION semantics
    (``createIndex``, horizontal concat, positional slicing) ride this
    lane at any scale.

    The data crosses ONE exchange (the bucket hash for the per-bucket
    window sort). The offsets branch aggregates the bucketized input
    BEFORE any window — a map-side partial count whose exchange carries
    ≤ n-buckets rows — so the table is never shuffled twice however the
    optimizer slices the two branches."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    # one EXPLICIT bucket exchange feeds both consumers below: the
    # window's required distribution and the counts groupBy are both
    # satisfied by hashpartitioning(__go_b), and because the two
    # branches reference the identical Exchange subtree the engine
    # materializes it once (exchange/stage reuse) — without this, each
    # branch re-derived the full input lineage (bounds pass aside,
    # THREE computations of the input; now two)
    bdf = _bucketized(df, order_cols, n_buckets).repartition("__go_b")
    w = W.partitionBy("__go_b").orderBy(*[F.col(c).asc() for c in order_cols])
    pdf = bdf.withColumn("__go_lrn", F.row_number().over(w))
    counts = bdf.groupBy("__go_b").agg(F.count(F.lit(1)).alias("__go_cnt"))
    woff = W.orderBy("__go_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "__go_b",
        F.coalesce(F.sum("__go_cnt").over(woff), F.lit(0)).alias("__go_off"),
    )
    return pdf.join(F.broadcast(offsets), "__go_b").select(
        *df.columns,
        (F.col("__go_off") + F.col("__go_lrn")).cast("bigint").alias(pos_col),
    )


def cumsum_global(
    df: DataFrame,
    size_col: str,
    order_by: str | Sequence[str],
    n_buckets: int | None = None,
    out_col: str = "cumsum_before",
) -> DataFrame:
    """Global EXCLUSIVE running sum of ``size_col`` over an explicit
    ordering, without a single-reducer sort: per-bucket exclusive sums
    via an ordinary partitioned window, plus each bucket's running
    TOTAL offset from the ≤ n-buckets-row bucket relation (broadcast
    back). Same answer as ``sum().over(Window.orderBy(...).rowsBetween(
    unboundedPreceding, -1))`` for any bucketization — the offsets
    reconstruct exactly the prefix a global row-frame would have seen.
    Null sizes contribute nothing (SQL sum semantics) on both lanes.

    The data crosses ONE exchange; the totals branch is a map-side
    partial sum over the bucketized input (≤ n-buckets rows exchanged),
    the same shape as `global_positions`' offsets."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    # shared bucket exchange (see `global_positions`): the window lane
    # and the totals lane both read ONE materialized
    # hashpartitioning(__go_b) exchange instead of each re-deriving the
    # input lineage
    bdf = _bucketized(df, order_cols, n_buckets).repartition("__go_b")
    orders = [F.col(c).asc() for c in order_cols]
    w = (
        W.partitionBy("__go_b")
        .orderBy(*orders)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    pdf = bdf.withColumn(
        "__go_lb", F.coalesce(F.sum(size_col).over(w), F.lit(0))
    )
    totals = bdf.groupBy("__go_b").agg(
        F.coalesce(F.sum(size_col), F.lit(0)).alias("__go_t")
    )
    woff = W.orderBy("__go_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "__go_b",
        F.coalesce(F.sum("__go_t").over(woff), F.lit(0)).alias("__go_off"),
    )
    return pdf.join(F.broadcast(offsets), "__go_b").select(
        *df.columns,
        (F.col("__go_off") + F.col("__go_lb")).alias(out_col),
    )


def _with_edge_ghosts(
    df: DataFrame,
    bdf: DataFrame,
    order_by: str,
    col: str,
    k: int,
    forward: bool = False,
) -> DataFrame:
    """Union ``bdf`` (bucketized ``df``) with ghost copies of the k data
    rows adjacent to each bucket's edge — the boundary exchange shared
    by the positional operators (trailing-row windows, lag/lead),
    WITHOUT a global-offsets pass over the data.

    The k rows preceding a bucket span at most k non-empty buckets, so:
    per bucket, the last (first, when ``forward``) ``min(k, count)``
    rows fold into ONE sorted tail array (a filter + groupBy sharing
    the main plan's bucket exchange — the candidates are identified by
    ``row_number``/``count`` windows, never a separate offsets
    aggregation); the carry for each bucket is the flattened
    concatenation of the ≤ k neighbouring tails sliced to its last
    (first) k elements — bucket-cardinality work, ≤ k² carried structs
    per bucket; the carried rows explode back as ghosts (order key +
    local rank + ``col``; every other column NULL — aggregates only
    ever read ``col``, and ghost output rows drop).

    Exact for ANY bucket population (empty buckets contribute no tail
    and no output; tiny buckets chain through the multi-tail flatten).
    Ghost keys are strictly outside the target bucket's key range
    (equal keys colocate), so ordering by ``(order, __go_lrn)`` places
    every ghost before (after) all real rows deterministically; within
    a tie group the row_number resolution is arbitrary-but-valid, the
    same contract as a single-partition sort."""
    order = F.col(order_by)
    w_asc = W.partitionBy("__go_b").orderBy(order)
    w_all = W.partitionBy("__go_b").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    pdf = bdf.withColumn("__go_lrn", F.row_number().over(w_asc)).withColumn(
        "__go_cnt", F.count(F.lit(1)).over(w_all)
    )
    if forward:
        cand = pdf.filter(F.col("__go_lrn") <= k)
    else:
        cand = pdf.filter(F.col("__go_lrn") > F.col("__go_cnt") - k)
    tails = cand.groupBy("__go_b").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    order.alias("o"),
                    F.col("__go_lrn").alias("l"),
                    F.col(col).alias("v"),
                )
            )
        ).alias("__t")
    )
    if forward:
        wk = W.orderBy("__go_b").rowsBetween(1, k)
        flat = F.flatten(F.collect_list("__t").over(wk))
        carry = F.slice(flat, 1, k)
    else:
        wk = W.orderBy("__go_b").rowsBetween(-k, -1)
        flat = F.flatten(F.collect_list("__t").over(wk))
        carry = F.slice(
            flat,
            F.greatest(F.size(flat) - F.lit(k) + 1, F.lit(1)),
            F.lit(k),
        )
    carried = tails.select("__go_b", carry.alias("__go_carry"))
    dtypes = dict(df.dtypes)
    gcols = []
    for c in df.columns:
        if c == col:
            gcols.append(F.col("__g.v").alias(c))
        elif c == order_by:
            gcols.append(F.col("__g.o").alias(c))
        else:
            gcols.append(F.lit(None).cast(dtypes[c]).alias(c))
    ghosts = carried.select(
        "__go_b", F.explode("__go_carry").alias("__g")
    ).select(
        *gcols,
        F.col("__go_b"),
        F.col("__g.l").alias("__go_lrn"),
        F.lit(1).alias("__go_ghost"),
    )
    return (
        pdf.drop("__go_cnt")
        .withColumn("__go_ghost", F.lit(0))
        .unionByName(ghosts)
    )


def shift_global(
    df: DataFrame,
    col: str,
    periods: int,
    order_by: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Partition-free lag/lead WITHOUT a single-reducer sort: the k rows
    adjacent to each bucket edge ghost into the neighbouring bucket
    through the tail-carry exchange (`_with_edge_ghosts` — no offsets
    pass, two data consumers of one bucket exchange), one per-bucket
    lag/lead over reals+ghosts sees exactly the rows a global window
    would, ghost rows drop."""
    k = abs(periods)
    if k == 0:
        return df.withColumn(f"{col}_shift_0", F.col(col))
    n = n_buckets or default_buckets(df)
    order = F.col(order_by)
    bdf = _bucketize_quantile(df, order, n)
    union = _with_edge_ghosts(df, bdf, order_by, col, k, forward=periods < 0)
    w = W.partitionBy("__go_b").orderBy(order, "__go_lrn")
    local = (
        F.lag(col, periods).over(w)
        if periods > 0
        else F.lead(col, -periods).over(w)
    )
    out_col = f"{col}_shift_{periods}"
    return (
        union.withColumn(out_col, local)
        .filter(F.col("__go_ghost") == 0)
        .select(*df.columns, out_col)
    )


def interpolate_global(
    df: DataFrame,
    cols: Sequence[str],
    order_by: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Partition-free linear interpolation. In-bucket windows find the
    nearest valid neighbours as usual; null runs that CROSS a bucket edge
    take them from a per-bucket edge summary (last/first valid value+pos,
    4 scalars per bucket per column) carried across buckets on the tiny
    relation and broadcast back. Edge rules match the single-partition
    form: leading nulls take the first valid value, trailing nulls the
    last, all-null columns stay null (Tests.cpp:1023-1033).

    Two r9 scale fixes: (a) the bucket counts ride in the SAME groupBy
    as the edge summary (the old separate offsets materialization cost a
    full extra aggregation stage re-deriving the positioned lineage —
    measured 1.12 s -> 0.62 s on sf0.1 events); (b) next-valid lookups
    run as ``last`` over a DESC-ordered unbounded-PRECEDING frame —
    Spark's unbounded-FOLLOWING frame re-aggregates from scratch per row
    (O(rows^2) per bucket, catastrophic once buckets own real data;
    observed minutes-long tasks at 300k-row buckets), while the growing
    frame is incremental O(rows)."""
    n = n_buckets or default_buckets(df)
    order = F.col(order_by)
    bdf = _bucketize_quantile(df, order, n)
    w = W.partitionBy("__go_b").orderBy(order)
    bdf = bdf.withColumn("__go_lrn", F.row_number().over(w))

    # ONE per-bucket aggregate: row count + last/first valid (value,
    # local position) per column — offsets derive from the counts by a
    # running sum over this ≤ n-buckets-row relation, so no second
    # aggregation pass touches the data
    aggs = [F.count(F.lit(1)).alias("__go_cnt")]
    for c in cols:
        v = F.col(c).cast("double")
        vl = F.when(v.isNotNull(), F.col("__go_lrn"))
        aggs += [
            F.max_by(v, vl).alias(f"__go_lv_{c}"),
            F.max(vl).alias(f"__go_ll_{c}"),
            F.min_by(v, vl).alias(f"__go_fv_{c}"),
            F.min(vl).alias(f"__go_fl_{c}"),
        ]
    edges = bdf.groupBy("__go_b").agg(*aggs)
    woff = W.orderBy("__go_b").rowsBetween(W.unboundedPreceding, -1)
    edges = edges.withColumn(
        "__go_off", F.coalesce(F.sum("__go_cnt").over(woff), F.lit(0))
    )
    # cross-bucket carry over the ≤ n-buckets-row edges relation, edge
    # markers translated to GLOBAL positions via each bucket's offset
    wprev = W.orderBy("__go_b").rowsBetween(W.unboundedPreceding, -1)
    wnext = W.orderBy("__go_b").rowsBetween(1, W.unboundedFollowing)
    carry = [F.col("__go_b"), F.col("__go_off")]
    for c in cols:
        lme = F.struct(
            F.col(f"__go_lv_{c}").alias("v"),
            (F.col("__go_off") + F.col(f"__go_ll_{c}")).cast("bigint").alias("p"),
        )
        fme = F.struct(
            F.col(f"__go_fv_{c}").alias("v"),
            (F.col("__go_off") + F.col(f"__go_fl_{c}")).cast("bigint").alias("p"),
        )
        carry += [
            F.last(
                F.when(F.col(f"__go_ll_{c}").isNotNull(), lme), ignorenulls=True
            ).over(wprev).alias(f"__go_pe_{c}"),
            F.first(
                F.when(F.col(f"__go_fl_{c}").isNotNull(), fme), ignorenulls=True
            ).over(wnext).alias(f"__go_ne_{c}"),
        ]
    out = bdf.join(F.broadcast(edges.select(*carry)), "__go_b")

    base = W.partitionBy("__go_b").orderBy(order)
    w_back = base.rowsBetween(W.unboundedPreceding, 0)
    # next-valid via the reversed growing frame (incremental, never the
    # quadratic unbounded-following frame)
    w_fwdr = (
        W.partitionBy("__go_b")
        .orderBy(order.desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    pos = (F.col("__go_off") + F.col("__go_lrn")).cast("bigint")
    for c in cols:
        v = F.col(c).cast("double")
        prev_val = F.coalesce(
            F.last(v, ignorenulls=True).over(w_back), F.col(f"__go_pe_{c}.v")
        )
        prev_pos = F.coalesce(
            F.last(F.when(v.isNotNull(), pos), ignorenulls=True).over(w_back),
            F.col(f"__go_pe_{c}.p"),
        )
        next_val = F.coalesce(
            F.last(v, ignorenulls=True).over(w_fwdr), F.col(f"__go_ne_{c}.v")
        )
        next_pos = F.coalesce(
            F.last(F.when(v.isNotNull(), pos), ignorenulls=True).over(w_fwdr),
            F.col(f"__go_ne_{c}.p"),
        )
        lerp = prev_val + (next_val - prev_val) * (pos - prev_pos) / (
            next_pos - prev_pos
        )
        filled = (
            F.when(v.isNotNull(), v)
            .when(prev_val.isNull(), next_val)  # leading nulls <- first valid
            .when(next_val.isNull(), prev_val)  # trailing nulls <- last valid
            .otherwise(lerp)
        )
        out = out.withColumn(c, filled)
    return out.select(*df.columns)


def rolling_range_global(
    df: DataFrame,
    order: Column,
    width: int,
    pairs: Iterable[tuple[str, Sequence[str]]],
    inclusive_left: bool = True,
    n_buckets: int | None = None,
) -> DataFrame:
    """Partition-free trailing range window ``[k - width, k]`` (strict
    left edge with ``inclusive_left=False``) without a single-reducer
    sort. Buckets are FIXED-WIDTH ranges at least ``width`` wide
    (``max(width, key_span/n)``), so a row's trailing window reaches at
    most ONE bucket back: rows whose key+width crosses their bucket's
    right edge get a single ghost copy unioned into the next bucket,
    the per-bucket range frame aggregates over reals+ghosts (exactly the
    rows a global frame would see), and ghost output rows drop. Data
    moves once for the bucket shuffle plus the ≤ width-span boundary
    ghosts — never through one reducer. Bucket membership uses the same
    floor arithmetic as the ghost test, so boundary rounding can only
    ADD a harmless ghost, never lose a frame row."""
    n = n_buckets or default_buckets(df)
    x = order.cast("double")
    span = df.agg(
        F.min(x).alias("__go_mn"),
        F.greatest(
            (F.max(x) - F.min(x)) / F.lit(float(n)), F.lit(float(width))
        ).alias("__go_bw"),
    )
    bucket = F.floor((x - F.col("__go_mn")) / F.col("__go_bw")).cast("int")
    bdf = df.crossJoin(F.broadcast(span)).withColumn(
        "__go_b", F.coalesce(bucket, F.lit(-1))  # null keys: own bucket
    )
    # ghost = the row's key+width lands in a later bucket (same floor
    # arithmetic as assignment: monotone, so every needed sender ghosts)
    reach = F.floor((x + F.lit(float(width)) - F.col("__go_mn")) / F.col("__go_bw")).cast("int")
    ghosts = (
        bdf.filter(F.col("__go_b") >= 0)
        .filter(reach > F.col("__go_b"))
        .withColumn("__go_b", F.col("__go_b") + 1)
        .withColumn("__go_ghost", F.lit(1))
    )
    union = bdf.withColumn("__go_ghost", F.lit(0)).unionByName(ghosts)

    w = W.partitionBy("__go_b").orderBy(order)
    lo = -int(width) if inclusive_left else -int(width) + 1
    frame = w.rangeBetween(lo, 0)
    pairs = [(c, list(fns)) for c, fns in pairs]
    exprs = [
        build_aggregate(fn, col, wrap=lambda e, f=frame: e.over(f))
        for col, fns in pairs
        for fn in fns
    ]
    agg_names = [f"{col}_{fn.lower()}" for col, fns in pairs for fn in fns]
    return (
        union.select("*", *exprs)
        .filter(F.col("__go_ghost") == 0)
        .select(*df.columns, *agg_names)
    )


def rolling_rows_global(
    df: DataFrame,
    col: str,
    n_rows: int,
    fns: Sequence[str],
    order_by: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Partition-free trailing n-row window. Quantile buckets; the n-1
    rows immediately before each bucket's start ghost into it through
    the tail-carry exchange (`_with_edge_ghosts` — exact for any bucket
    population, no offsets pass over the data), the per-bucket row
    frame aggregates reals+ghosts, ghost rows drop."""
    n = n_buckets or default_buckets(df)
    order = F.col(order_by)
    bdf = _bucketize_quantile(df, order, n)
    union = _with_edge_ghosts(df, bdf, order_by, col, n_rows - 1)

    # ghosts are exactly the (at most) n-1 data rows preceding the
    # bucket in global (order, local-rank) order, so each real row's
    # trailing frame is complete and nothing else precedes it
    w = (
        W.partitionBy("__go_b")
        .orderBy(order, "__go_lrn")
        .rowsBetween(-(n_rows - 1), 0)
    )
    exprs = [build_aggregate(fn, col, wrap=lambda e, f=w: e.over(f)) for fn in fns]
    agg_names = [f"{col}_{fn.lower()}" for fn in fns]
    return (
        union.select("*", *exprs)
        .filter(F.col("__go_ghost") == 0)
        .select(*df.columns, *agg_names)
    )


def grouped_positions(
    df: DataFrame,
    part_by: str | Sequence[str],
    order_by: str | Sequence[str],
    n_buckets: int | None = None,
    pos_col: str = "pos",
) -> DataFrame:
    """Per-GROUP row positions (1..N_g within each group) over an
    explicit ordering, for groups too large for one task — the
    distributed replacement for
    ``row_number().over(Window.partitionBy(g).orderBy(...))`` when the
    partition key has FEW, HUGE groups (mixture components, languages,
    sources): the plain window funnels each whole group through one
    task, exactly the whale-partition shape the global lane exists to
    avoid.

    Same construction as `global_positions`, with the group key joined
    in: bucketize on the ORDER key's quantile boundaries (groups share
    buckets, so tasks balance by data volume, not group sizes), number
    rows per (group, bucket) with an ordinary window, and add
    per-group running bucket-count offsets — a (groups x buckets)-row
    relation, broadcast back. The data crosses ONE exchange. Equal
    order keys resolve arbitrarily-but-validly, the `global_positions`
    contract; add a unique tiebreak column for a deterministic order."""
    part_cols = [part_by] if isinstance(part_by, str) else list(part_by)
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    # shared (group, bucket) exchange (see `global_positions`): the
    # window lane and the counts lane read one materialized exchange
    bdf = _bucketize_quantile(
        df, _sort_proxy(df, order_cols), n_buckets or default_buckets(df)
    ).repartition(*part_cols, "__go_b")
    w = W.partitionBy(*part_cols, "__go_b").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    pdf = bdf.withColumn("__go_lrn", F.row_number().over(w))
    counts = bdf.groupBy(*part_cols, "__go_b").agg(
        F.count(F.lit(1)).alias("__go_cnt")
    )
    woff = (
        W.partitionBy(*part_cols)
        .orderBy("__go_b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *part_cols,
        "__go_b",
        F.coalesce(F.sum("__go_cnt").over(woff), F.lit(0)).alias("__go_off"),
    )
    return nullsafe_join(
        pdf, offsets, [*part_cols, "__go_b"], broadcast_right=True
    ).select(
        *df.columns,
        (F.col("__go_off") + F.col("__go_lrn")).cast("bigint").alias(pos_col),
    )


def cumsum_grouped(
    df: DataFrame,
    size_col: str,
    part_by: str | Sequence[str],
    order_by: str | Sequence[str],
    n_buckets: int | None = None,
    out_col: str = "cumsum_before",
) -> DataFrame:
    """Per-GROUP exclusive running sum over an explicit ordering — the
    grouped twin of `cumsum_global`, for groups too large for one task
    (the `grouped_positions` argument): bucketize on the ORDER key's
    quantile boundaries (groups share buckets, so tasks balance by
    data volume), per-(group, bucket) exclusive window sums, plus each
    group's running bucket-total offsets — a (groups x buckets)-row
    relation, broadcast back. ONE data exchange; same answer as
    ``sum().over(Window.partitionBy(g).orderBy(...).rowsBetween(
    unboundedPreceding, -1))`` for any bucketization."""
    part_cols = [part_by] if isinstance(part_by, str) else list(part_by)
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    # shared (group, bucket) exchange (see `global_positions`)
    bdf = _bucketized(df, order_cols, n_buckets).repartition(
        *part_cols, "__go_b"
    )
    orders = [F.col(c).asc() for c in order_cols]
    w = (
        W.partitionBy(*part_cols, "__go_b")
        .orderBy(*orders)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    pdf = bdf.withColumn(
        "__go_lb", F.coalesce(F.sum(size_col).over(w), F.lit(0))
    )
    totals = bdf.groupBy(*part_cols, "__go_b").agg(
        F.coalesce(F.sum(size_col), F.lit(0)).alias("__go_t")
    )
    woff = (
        W.partitionBy(*part_cols)
        .orderBy("__go_b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *part_cols,
        "__go_b",
        F.coalesce(F.sum("__go_t").over(woff), F.lit(0)).alias("__go_off"),
    )
    return nullsafe_join(
        pdf, offsets, [*part_cols, "__go_b"], broadcast_right=True
    ).select(
        *df.columns,
        (F.col("__go_off") + F.col("__go_lb")).alias(out_col),
    )


def positions_and_cumsum(
    df: DataFrame,
    size_col: str,
    order_by: str | Sequence[str],
    n_buckets: int | None = None,
    pos_col: str = "pos",
    cum_col: str = "cumsum_before",
) -> DataFrame:
    """`global_positions` AND `cumsum_global` over the SAME ordering in
    ONE lane pass: one bucketize, one data exchange, one per-bucket
    window carrying both the row number and the exclusive sum, one
    offsets relation carrying both the running count and the running
    total. For a consumer that needs both (`rank_stats`: rank from the
    cumulative count, dense rank from the position), this halves the
    lane — the second bounds pass, bucket exchange, window and
    broadcast join disappear. Results are identical to running the two
    lanes separately: positions/cumsums are bucketization-independent
    by construction, and both columns are exact arithmetic over the
    same per-bucket window frame."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    bdf = _bucketized(df, order_cols, n_buckets).repartition("__go_b")
    orders = [F.col(c).asc() for c in order_cols]
    w = W.partitionBy("__go_b").orderBy(*orders)
    wcum = w.rowsBetween(W.unboundedPreceding, -1)
    pdf = bdf.withColumn("__go_lrn", F.row_number().over(w)).withColumn(
        "__go_lb", F.coalesce(F.sum(size_col).over(wcum), F.lit(0))
    )
    agg = bdf.groupBy("__go_b").agg(
        F.count(F.lit(1)).alias("__go_cnt"),
        F.coalesce(F.sum(size_col), F.lit(0)).alias("__go_t"),
    )
    woff = W.orderBy("__go_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = agg.select(
        "__go_b",
        F.coalesce(F.sum("__go_cnt").over(woff), F.lit(0)).alias("__go_coff"),
        F.coalesce(F.sum("__go_t").over(woff), F.lit(0)).alias("__go_soff"),
    )
    return pdf.join(F.broadcast(offsets), "__go_b").select(
        *df.columns,
        (F.col("__go_coff") + F.col("__go_lrn")).cast("bigint").alias(pos_col),
        (F.col("__go_soff") + F.col("__go_lb")).alias(cum_col),
    )


def rank_stats(
    df: DataFrame,
    order_by: str | Sequence[str],
    n_buckets: int | None = None,
    rank_col: str | None = "rank",
    dense_rank_col: str | None = "dense_rank",
    cume_dist_col: str | None = "cume_dist",
    part_by: Sequence[str] = (),
) -> DataFrame:
    """Distributed ``rank()`` / ``dense_rank()`` / ``cume_dist()`` over
    a global ordering — exact SQL tie semantics (ties share a rank;
    ``cume_dist = rows_with_key_lte / N``) without the single-reducer
    window, completing the rank family `percent_ranks` started.

    Same construction: fold to per-DISTINCT-KEY counts (the only
    full-data exchange, map-side partial), then at key cardinality
    run `cumsum_global` (exclusive running count = rank - 1) and
    `global_positions` (position among distinct keys = dense rank)
    over the key relation, and join back null-safe (null keys tie
    first, Spark's asc-nulls-first order). Ranks are exact integers;
    cume_dist is ONE division of exact integers — engine-reproducible
    with no rounding. Set an out-column to None to omit it.

    ``part_by`` gives the PER-GROUP form (``rank().over(partitionBy(g)
    .orderBy(...))`` — per-language quantile normalization) on the
    grouped lanes (`cumsum_grouped` / `grouped_positions`): groups
    share order-key buckets, so a whale group's distinct keys never
    funnel through one task."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    part_cols = list(part_by)
    key_cols = [*part_cols, *order_cols]
    vc = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__rk_cnt"))
    if part_cols:
        keyed = cumsum_grouped(
            vc, "__rk_cnt", part_cols, order_cols, n_buckets,
            out_col="__rk_before",
        )
        if dense_rank_col:
            keyed = grouped_positions(
                keyed, part_cols, order_cols, n_buckets, pos_col="__rk_dr"
            )
    else:
        if dense_rank_col:
            # both the cumulative count (rank) and the distinct-key
            # position (dense rank) in ONE lane pass — the second
            # bounds/bucketize/window/join chain disappears
            keyed = positions_and_cumsum(
                vc, "__rk_cnt", order_cols, n_buckets,
                pos_col="__rk_dr", cum_col="__rk_before",
            )
        else:
            keyed = cumsum_global(
                vc, "__rk_cnt", order_cols, n_buckets, out_col="__rk_before"
            )
    out = nullsafe_join(
        df,
        keyed.select(
            *key_cols,
            *[c for c in keyed.columns if c.startswith("__rk_")],
        ),
        key_cols,
    )
    cols = list(df.columns)
    if rank_col:
        out = out.withColumn(
            rank_col, (F.col("__rk_before") + 1).cast("bigint")
        )
        cols.append(rank_col)
    if dense_rank_col:
        out = out.withColumn(dense_rank_col, F.col("__rk_dr").cast("bigint"))
        cols.append(dense_rank_col)
    if cume_dist_col:
        # N from the key relation, not a second df.agg scan: the vc
        # subtree is shared with the rank branch, so AQE's exchange
        # reuse serves both from one corpus pass
        if part_cols:
            totals = vc.groupBy(*part_cols).agg(
                F.sum("__rk_cnt").alias("__rk_n")
            )
            out = nullsafe_join(out, totals, part_cols, broadcast_right=True)
        else:
            total = vc.agg(F.sum("__rk_cnt").alias("__rk_n"))
            out = out.crossJoin(F.broadcast(total))
        out = out.withColumn(
            cume_dist_col,
            (F.col("__rk_before") + F.col("__rk_cnt")).cast("double")
            / F.col("__rk_n").cast("double"),
        )
        cols.append(cume_dist_col)
    return out.select(*cols)


def ntiles(
    df: DataFrame,
    n: int,
    order_by: str | Sequence[str],
    n_buckets: int | None = None,
    out_col: str = "ntile",
    part_by: Sequence[str] = (),
) -> DataFrame:
    """Distributed ``ntile(n)`` over a global ordering — exact SQL
    semantics (with ``N = q*n + r``, the first ``r`` tiles take
    ``q + 1`` rows) from `global_positions` + a broadcast 1-row total;
    pure integer arithmetic, no single-reducer window. Row-POSITION
    semantics: equal keys resolve arbitrarily-but-validly — pass a
    unique tiebreak column for a deterministic result (the
    `global_positions` contract). ``part_by`` gives the per-group form
    (``ntile(n).over(partitionBy(g).orderBy(...))`` — per-language
    curriculum bands) on `grouped_positions` + per-group totals."""
    if n < 1:
        raise ValueError(f"need n >= 1 tiles, got {n}")
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    part_cols = list(part_by)
    if part_cols:
        pos = grouped_positions(
            df, part_cols, order_cols, n_buckets, pos_col="__nt_pos"
        )
        totals = df.groupBy(*part_cols).agg(
            F.count(F.lit(1)).alias("__nt_n")
        )
        joined = nullsafe_join(pos, totals, part_cols, broadcast_right=True)
    else:
        pos = global_positions(df, order_cols, n_buckets, pos_col="__nt_pos")
        total = df.agg(F.count(F.lit(1)).alias("__nt_n"))

    def idiv(a, b):  # exact bigint floor division (non-negative a)
        return ((a - F.pmod(a, b)) / b).cast("bigint")

    q = idiv(F.col("__nt_n"), F.lit(n))
    r = F.col("__nt_n") % n
    big = r * (q + 1)  # rows covered by the r larger tiles
    p = F.col("__nt_pos")
    tile = (
        F.when(p <= big, idiv(p - 1, q + 1))
        .otherwise(r + idiv(p - big - 1, F.greatest(q, F.lit(1))))
        + 1
    )
    if not part_cols:
        joined = pos.crossJoin(F.broadcast(total))
    return joined.withColumn(out_col, tile.cast("bigint")).select(
        *df.columns, out_col
    )


def percent_ranks(
    df: DataFrame,
    order_by: str | Sequence[str],
    n_buckets: int | None = None,
    out_col: str = "percent_rank",
) -> DataFrame:
    """Distributed ``percent_rank().over(Window.orderBy(...))`` — exact
    SQL semantics (ties share a rank; ``pr = (rank - 1) / (N - 1)``;
    a single row ranks 0.0) without the single-reducer window Spark
    plans for a global ORDER BY frame. The rank-transform /
    quantile-normalization primitive at corpus scale.

    Construction: fold the data to per-DISTINCT-KEY counts (map-side
    partial groupBy — the only full-data exchange), run
    `cumsum_global` over the distinct-key relation (exclusive running
    count = rows strictly before each key, at key-cardinality cost),
    and join the ranks back on the key (null-safe, so null keys rank
    as one tie group, first under Spark's asc-nulls-first order). The
    denominator rides a broadcast 1-row total. Ranks are exact
    integers and the division is single-row double arithmetic —
    engine-reproducible with no rounding."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    vc = df.groupBy(*order_cols).agg(F.count(F.lit(1)).alias("__pr_cnt"))
    before = cumsum_global(
        vc, "__pr_cnt", order_cols, n_buckets, out_col="__pr_before"
    )
    renamed = before.select(
        *[F.col(c).alias(f"__pr_k_{c}") for c in order_cols], "__pr_before"
    )
    cond = None
    for c in order_cols:
        piece = df[c].eqNullSafe(renamed[f"__pr_k_{c}"])
        cond = piece if cond is None else cond & piece
    total = df.agg(F.count(F.lit(1)).alias("__pr_n"))
    pr = F.when(
        F.col("__pr_n") > 1,
        F.col("__pr_before").cast("double")
        / (F.col("__pr_n") - F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        df.join(renamed, cond)
        .crossJoin(F.broadcast(total))
        .select(*df.columns, pr.alias(out_col))
    )
