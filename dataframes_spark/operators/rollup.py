"""Hypertable-style continuous aggregates: time-bucketed rollups with
MERGEABLE partial state, an incremental persisted store, and serving
finalizers — the "rollup a 100 TB event stream into calendar-bounded
summaries once, serve forever" primitive (the continuous-aggregate /
materialized-rollup design popularized by TimescaleDB and Druid; no
reference analog — the reference's aggregation surface is one-shot
``aggregateBy``, ``src/Table.luna`` group-by only).

Design for scale:

- ``rollup`` is ONE map-side-combining groupBy: the exchange carries
  (bucket x group)-cardinality partial-state rows, never data rows.
  Partial state is the classic mergeable five-tuple per bucket —
  ``(n_rows, n, s, mn, mx, ss)`` — from which count / sum / mean / min /
  max / variance / stddev all finalize with row-local arithmetic.
- ``rollup_store_update`` folds a batch into a persisted catalog table
  at O(batch) cost: history is never re-scanned, the store stays
  calendar-bounded ((buckets so far) x groups rows) forever, and the
  swap is crash-safe (`io.store.staging_swap`). Counts/sums SUM-merge
  (CMS semantics: NOT idempotent — fold each batch exactly once);
  min/max merge idempotently. The store is stamped with
  ``(value col, width, group cols)`` and REFUSES a mismatched fold —
  buckets that silently changed meaning between epochs would corrupt
  every stored row.
- ``rollup_serve`` finalizes from the store without touching raw data:
  the serving scan is bounded by the store's cardinality, not the
  corpus's.

Bucketing is exact integer arithmetic on epoch microseconds
(``e - pmod(e, width)``) — no double division, so boundary instants land
deterministically at any epoch including pre-1970 (floor semantics, not
truncation toward zero).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..io.store import staging_swap

_UNITS_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
    "week": 7 * 86_400 * 1_000_000,
}

#: partial-state columns, in storage order
STATE_COLS = ("n_rows", "n", "s", "mn", "mx", "ss")

#: finalizable statistics
STATS = ("count", "n_rows", "sum", "mean", "min", "max", "var", "std")


def width_us(width: str | int) -> int:
    """Parse a bucket width — ``"15 minutes"``, ``"1 hour"``, or a raw
    microsecond count — to microseconds. Calendar-irregular units
    (month, year) are deliberately unsupported: fixed-width buckets are
    what makes the store mergeable across epochs without a calendar."""
    if isinstance(width, int):
        if width <= 0:
            raise ValueError(f"need a positive width, got {width}")
        return width
    parts = width.strip().split()
    if len(parts) == 1:
        parts = ["1", parts[0]]
    if len(parts) != 2:
        raise ValueError(f"cannot parse width {width!r}")
    count, unit = parts
    unit = unit.rstrip("s").lower()
    if unit not in _UNITS_US:
        raise ValueError(
            f"unsupported unit {unit!r} (fixed-width units only: "
            f"{sorted(_UNITS_US)})"
        )
    n = int(count)
    if n <= 0:
        raise ValueError(f"need a positive width, got {width!r}")
    return n * _UNITS_US[unit]


def time_bucket(ts: Column | str, width: str | int) -> Column:
    """The bucket-start timestamp for ``ts`` under fixed ``width``
    buckets anchored at the epoch — exact bigint floor arithmetic
    (``e - pmod(e, w)``), no doubles near the boundary."""
    w = width_us(width)
    e = F.unix_micros(F.col(ts) if isinstance(ts, str) else ts)
    return F.timestamp_micros(e - F.pmod(e, F.lit(w)))


def rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    width: str | int,
    by: Sequence[str] = (),
) -> DataFrame:
    """Time-bucketed PARTIAL aggregates of ``value_col``: one row per
    (``bucket_ts``, *by*) carrying the mergeable five-tuple state.
    ONE map-side-combining groupBy — the only exchange is at
    (buckets x groups) cardinality. Null timestamps drop (a bucket for
    "no time" has no serving meaning); null values count in ``n_rows``
    but not in ``n``/``s``/``ss`` (SQL aggregate semantics)."""
    v = F.col(value_col).cast("double")
    return (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            time_bucket(ts_col, width).alias("bucket_ts"),
            *[F.col(c) for c in by],
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(v).alias("n"),
            F.sum(v).alias("s"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
            F.sum(v * v).alias("ss"),
        )
    )


def rollup_merge(
    parts: DataFrame, by: Sequence[str] = ()
) -> DataFrame:
    """Merge partial-state frames (a union of `rollup` outputs) back to
    one row per (bucket, group): counts/sums sum, min/max fold
    idempotently. The merge is associative and commutative — batches
    may arrive in any order and any grouping."""
    return parts.groupBy("bucket_ts", *by).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.sum("ss").alias("ss"),
    )


def rollup_finalize(
    partials: DataFrame,
    stats: Sequence[str] = ("count", "sum", "mean", "min", "max"),
    by: Sequence[str] = (),
) -> DataFrame:
    """Serve final statistics from partial state with row-local
    arithmetic (no further shuffle): ``count``=non-null values,
    ``n_rows``=rows, ``sum``/``mean``/``min``/``max``, and population
    ``var``/``std`` via the moment identity ``ss/n - mean^2`` (clamped
    at 0 against FP cancellation). Empty-value buckets serve NULL for
    value statistics."""
    unknown = set(stats) - set(STATS)
    if unknown:
        raise ValueError(f"unknown stats {sorted(unknown)}; have {STATS}")
    n = F.col("n")
    mean = F.when(n > 0, F.col("s") / n)
    var = F.when(
        n > 0, F.greatest(F.col("ss") / n - mean * mean, F.lit(0.0))
    )
    exprs = {
        "count": n.alias("count"),
        "n_rows": F.col("n_rows").alias("n_rows"),
        "sum": F.when(n > 0, F.col("s")).alias("sum"),
        "mean": mean.alias("mean"),
        "min": F.col("mn").alias("min"),
        "max": F.col("mx").alias("max"),
        "var": var.alias("var"),
        "std": F.sqrt(var).alias("std"),
    }
    return partials.select(
        "bucket_ts", *by, *[exprs[s] for s in stats]
    )


def _meta_cols(value_col: str, w_us: int, by: Sequence[str]) -> list[Column]:
    return [
        F.lit(value_col).alias("__ra_col"),
        F.lit(int(w_us)).alias("__ra_width_us"),
        F.lit(",".join(by)).alias("__ra_by"),
    ]


def rollup_store_update(
    spark,
    table: str,
    df: DataFrame,
    ts_col: str,
    value_col: str,
    width: str | int,
    by: Sequence[str] = (),
    report: bool = True,
) -> dict:
    """Fold one batch into a persisted continuous-aggregate store
    (catalog parquet table, the sketch-store staging-swap idiom).

    Cost per fold: one map-side-combining scan of the BATCH plus a
    merge against the store's (buckets x groups) rows — history data is
    never re-read, so a year of epochs costs a year of batches, not a
    year squared. The store is stamped with its configuration and a
    fold under a different (value col, width, group cols) raises.
    Sum-merged state is NOT idempotent: fold each batch exactly once
    (the CMS/histogram-store contract). Returns ``{"rows", "buckets"}``
    — rows folded in this call and the store's bucket-row count after.

    ``report=False`` skips the two statistics (returns None for both):
    the batch count and the store read-back are one extra job each —
    per fold, a third of the wall time — and the STORE is identical
    either way; callers that fold pipelines and never read the dict
    should pass False."""
    by = list(by)
    w_us = width_us(width)
    if report:
        # persist the bucket-cardinality batch rollup at the fork: the
        # row count AND the staging write both consume it — without the
        # cache every fold would scan the batch twice
        batch = rollup(df, ts_col, value_col, width, by).persist()
        n_batch = batch.agg(F.sum("n_rows")).first()[0] or 0
    else:
        # the staging write is the only consumer: no fork, no persist
        batch = rollup(df, ts_col, value_col, width, by)
        n_batch = None
    stamped = batch.select("*", *_meta_cols(value_col, w_us, by))
    # existence check, not a broad except: transient JVM errors must
    # propagate, never be read as "store absent" (history reset)
    if spark.catalog.tableExists(table):
        existing = spark.table(table)
        meta = existing.select("__ra_col", "__ra_width_us", "__ra_by").first()
        if meta is not None and (
            meta["__ra_col"] != value_col
            or meta["__ra_width_us"] != w_us
            or meta["__ra_by"] != ",".join(by)
        ):
            raise ValueError(
                f"rollup store {table!r} was built with "
                f"(col={meta['__ra_col']!r}, width_us="
                f"{meta['__ra_width_us']}, by={meta['__ra_by']!r}); "
                f"refusing to fold (col={value_col!r}, width_us={w_us}, "
                f"by={','.join(by)!r})"
            )
        merged = rollup_merge(
            existing.unionByName(stamped).drop(
                "__ra_col", "__ra_width_us", "__ra_by"
            ),
            by,
        ).select("*", *_meta_cols(value_col, w_us, by))
    else:
        merged = stamped
    try:
        staging_swap(spark, table, merged)
    finally:
        if report:
            batch.unpersist()
    if not report:
        return {"rows": None, "buckets": None}
    return {"rows": int(n_batch), "buckets": int(spark.table(table).count())}


def rollup_serve(
    spark,
    table: str,
    stats: Sequence[str] = ("count", "sum", "mean", "min", "max"),
) -> DataFrame:
    """Finalize statistics from a persisted rollup store — the serving
    read touches only the store's calendar-bounded rows, never raw
    data. Group columns recover from the STAMP when a row exists
    (collision-proof: a group column may share a name with another
    lane's state) and from the SCHEMA on an EMPTY store — possible
    after folding an empty first batch — so the served frame is empty
    but correctly shaped either way."""
    store = spark.table(table)
    return rollup_finalize(
        store.drop("__ra_col", "__ra_width_us", "__ra_by"),
        stats,
        _recover_by(store),
    )


#: everything in a numeric-rollup store that is NOT a group column
#: (schema-fallback lane only; the stamp wins whenever a row exists)
_ROLLUP_FIXED = frozenset(
    ("bucket_ts", "n_rows", "n", "s", "mn", "mx", "ss",
     "__ra_col", "__ra_width_us", "__ra_by")
)


def _recover_by(store: DataFrame, extra_fixed: Sequence[str] = ()) -> list[str]:
    """Group columns of a rollup store: the ``__ra_by`` stamp when the
    store has rows (immune to group-column/state name collisions);
    otherwise the schema minus bucket/state/meta, in schema order (the
    fold's ``by`` order by construction)."""
    meta = store.select("__ra_by").first()
    if meta is not None:
        return [c for c in (meta["__ra_by"] or "").split(",") if c]
    fixed = _ROLLUP_FIXED | set(extra_fixed)
    return [c for c in store.columns if c not in fixed]


def rollup_distinct(
    df: DataFrame,
    ts_col: str,
    distinct_col: str,
    width: str | int,
    by: Sequence[str] = (),
    p: int = 12,
    lane_hash: str = "xxhash64",
) -> DataFrame:
    """Count-DISTINCT continuous aggregate, sketch half: an HLL
    register frame keyed by (``bucket_ts``, *by*) — the "distinct users
    per hour" state the numeric five-tuple cannot carry (distinct
    counts don't sum across batches; HLL registers max-merge). ONE
    scan, one max-combining exchange bounded at ``2^p`` rows per
    (bucket, group); rows with null timestamps drop, null values
    contribute no distinct (the `rollup`/`hll_build` contracts)."""
    from .sketch import hll_build

    keyed = df.filter(F.col(ts_col).isNotNull()).withColumn(
        "bucket_ts", time_bucket(ts_col, width)
    )
    return hll_build(
        keyed, distinct_col, key_cols=("bucket_ts", *by), p=p,
        lane_hash=lane_hash,
    )


def rollup_distinct_serve(
    registers: DataFrame, by: Sequence[str] = (), p: int = 12
) -> DataFrame:
    """Estimates from a distinct-rollup register frame:
    ``(bucket_ts, *by, est_ndv)`` — exact-BIGINT harmonic denominator,
    one IEEE division per bucket (`sketch.hll_estimate`)."""
    from .sketch import hll_estimate

    return hll_estimate(registers, ("bucket_ts", *tuple(by)), p)


def rollup_distinct_store_update(
    spark,
    table: str,
    df: DataFrame,
    ts_col: str,
    distinct_col: str,
    width: str | int,
    by: Sequence[str] = (),
    p: int = 12,
    lane_hash: str = "xxhash64",
    report: bool = True,
) -> dict:
    """Fold one batch into a persisted distinct-rollup store — the HLL
    twin of `rollup_store_update`, with one upgrade: register max-merge
    is IDEMPOTENT, so re-delivered batches cannot inflate the counts
    (exactly-once is NOT required, unlike the sum-merged numeric
    store). Store size is calendar-bounded at (buckets x groups x 2^p)
    rows; config is stamped and a mismatched fold raises. Returns
    ``{"registers", "buckets"}`` (both None under ``report=False``,
    which skips the two read-back jobs — the store is identical)."""
    from .sketch import hll_merge

    by = list(by)
    w_us = width_us(width)
    # ONE stamp definition: the batch select and the merged re-stamp
    # must stay field-for-field identical or the mismatch check rots
    stamp = [
        F.lit(distinct_col).alias("__rd_col"),
        F.lit(int(w_us)).alias("__rd_width_us"),
        F.lit(",".join(by)).alias("__rd_by"),
        F.lit(int(p)).alias("__rd_p"),
        F.lit(lane_hash).alias("__rd_hash"),
    ]
    meta_cols = ["__rd_col", "__rd_width_us", "__rd_by", "__rd_p", "__rd_hash"]
    batch = rollup_distinct(
        df, ts_col, distinct_col, width, by, p, lane_hash
    ).select("*", *stamp)
    if spark.catalog.tableExists(table):
        existing = spark.table(table)
        meta = existing.select(*meta_cols).first()
        want = (distinct_col, w_us, ",".join(by), p, lane_hash)
        if meta is not None and tuple(meta) != want:
            raise ValueError(
                f"distinct-rollup store {table!r} was built with "
                f"{tuple(meta)}; refusing to fold {want}"
            )
        merged = hll_merge(
            existing.drop(*meta_cols),
            batch.drop(*meta_cols),
            key_cols=("bucket_ts", *by),
        ).select("*", *stamp)
    else:
        merged = batch
    staging_swap(spark, table, merged)
    if not report:
        return {"registers": None, "buckets": None}
    out = spark.table(table)
    return {
        "registers": out.count(),
        "buckets": out.select("bucket_ts", *by).distinct().count(),
    }


def rollup_distinct_serve_store(
    spark, table: str, p: int | None = None
) -> DataFrame:
    """Estimates straight from a persisted distinct-rollup store.
    Group columns recover from the ``__rd_by`` stamp when a row exists
    (collision-proof) and from the SCHEMA on an EMPTY store — possible
    after folding an empty first batch — so the served frame keeps its
    group columns either way; ``p`` recovers from the stamp when
    present (empty store: the default)."""
    store = spark.table(table)
    meta = store.select("__rd_by", "__rd_p").first()
    if meta is not None:
        by = [c for c in (meta["__rd_by"] or "").split(",") if c]
    else:
        fixed = (
            "bucket_ts", "r", "maxrho",
            "__rd_col", "__rd_width_us", "__rd_by", "__rd_p", "__rd_hash",
        )
        by = [c for c in store.columns if c not in fixed]
    if p is None:
        p = int(meta["__rd_p"]) if meta is not None else 12
    return rollup_distinct_serve(
        store.drop("__rd_col", "__rd_width_us", "__rd_by", "__rd_p", "__rd_hash"),
        by,
        p,
    )


def rollup_store_refresh(
    spark,
    table: str,
    df: DataFrame,
    ts_col: str,
    value_col: str,
    width: str | int,
    lo,
    hi,
    by: Sequence[str] = (),
) -> dict:
    """Range REFRESH — the hypertable correction path for late or
    revised data the sum-merged fold cannot absorb (folding a
    correction batch would double-count): recompute the buckets whose
    start falls in ``[lo, hi)`` from ``df`` (the corrected source rows
    for that range) and REPLACE them in the store; buckets outside the
    range are untouched. One scan of the correction slice + a store
    rewrite (the staging swap the folds already pay). The stamp must
    match (same refusal as `rollup_store_update`). Returns
    ``{"replaced", "buckets"}``."""
    by = list(by)
    w_us = width_us(width)
    if not spark.catalog.tableExists(table):
        raise ValueError(f"rollup store {table!r} does not exist")
    existing = spark.table(table)
    meta = existing.select("__ra_col", "__ra_width_us", "__ra_by").first()
    if meta is not None and (
        meta["__ra_col"] != value_col
        or meta["__ra_width_us"] != w_us
        or meta["__ra_by"] != ",".join(by)
    ):
        raise ValueError(
            f"rollup store {table!r} was built with "
            f"(col={meta['__ra_col']!r}, width_us={meta['__ra_width_us']}, "
            f"by={meta['__ra_by']!r}); refusing to refresh "
            f"(col={value_col!r}, width_us={w_us}, by={','.join(by)!r})"
        )
    lo_c, hi_c = F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp")
    in_range = (F.col("bucket_ts") >= lo_c) & (F.col("bucket_ts") < hi_c)
    fresh = rollup(
        df.filter(
            (time_bucket(ts_col, width) >= lo_c)
            & (time_bucket(ts_col, width) < hi_c)
        ),
        ts_col,
        value_col,
        width,
        by,
    ).select("*", *_meta_cols(value_col, w_us, by))
    kept = existing.filter(~in_range)
    replaced = existing.filter(in_range).count()
    staging_swap(spark, table, kept.unionByName(fresh))
    return {
        "replaced": int(replaced),
        "buckets": spark.table(table).count(),
    }


def rollup_multi(
    df: DataFrame,
    ts_col: str,
    value_cols: Sequence[str],
    width: str | int,
    by: Sequence[str] = (),
) -> DataFrame:
    """k-COLUMN time-bucketed partials in ONE scan (the
    `quality.hist_store_update_multi` argument — per-column passes
    would re-read the corpus k times): each row fans out to k
    ``(col, value)`` cells map-side, then the same map-side-combining
    groupBy — the exchange carries (buckets x groups x k) partial rows.
    Output is the long form ``(bucket_ts, *by, col, <five-tuple>)``;
    `rollup_merge` / `rollup_finalize` apply with ``by=[*by, "col"]``.
    Per-column semantics identical to `rollup` (null values count in
    n_rows only)."""
    cols = list(value_cols)
    if not cols:
        raise ValueError("need at least one value column")
    arr = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(c).cast("double").alias("v"),
            )
            for c in cols
        ]
    )
    cells = df.filter(F.col(ts_col).isNotNull()).select(
        time_bucket(ts_col, width).alias("bucket_ts"),
        *[F.col(c) for c in by],
        F.explode(arr).alias("__rm"),
    )
    v = F.col("__rm.v")
    return cells.groupBy(
        "bucket_ts", *by, F.col("__rm.col").alias("col")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(v).alias("n"),
        F.sum(v).alias("s"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
        F.sum(v * v).alias("ss"),
    )


def rollup_multi_store_update(
    spark,
    table: str,
    df: DataFrame,
    ts_col: str,
    value_cols: Sequence[str],
    width: str | int,
    by: Sequence[str] = (),
    report: bool = True,
) -> dict:
    """Fold one batch's k-column partials into a persisted store — the
    `rollup_store_update` contract (stamped config, refuse-on-mismatch,
    sum-merge = fold each batch once, crash-safe swap) with the column
    set in the stamp. Returns ``{"rows", "buckets"}`` (both None under
    ``report=False``, which skips the two statistics jobs — the store
    is identical)."""
    by = list(by)
    cols = list(value_cols)
    w_us = width_us(width)
    sig = ",".join(cols)
    if report:
        batch = rollup_multi(df, ts_col, cols, width, by).persist()
        n_batch = (
            batch.filter(F.col("col") == cols[0]).agg(F.sum("n_rows")).first()[0]
            or 0
        )
    else:
        batch = rollup_multi(df, ts_col, cols, width, by)
        n_batch = None
    meta = [
        F.lit(sig).alias("__ra_col"),
        F.lit(int(w_us)).alias("__ra_width_us"),
        F.lit(",".join(by)).alias("__ra_by"),
    ]
    stamped = batch.select("*", *meta)
    if spark.catalog.tableExists(table):
        existing = spark.table(table)
        m = existing.select("__ra_col", "__ra_width_us", "__ra_by").first()
        if m is not None and (
            m["__ra_col"] != sig
            or m["__ra_width_us"] != w_us
            or m["__ra_by"] != ",".join(by)
        ):
            raise ValueError(
                f"multi-rollup store {table!r} was built with "
                f"(cols={m['__ra_col']!r}, width_us={m['__ra_width_us']}, "
                f"by={m['__ra_by']!r}); refusing to fold "
                f"(cols={sig!r}, width_us={w_us}, by={','.join(by)!r})"
            )
        merged = rollup_merge(
            existing.unionByName(stamped).drop(
                "__ra_col", "__ra_width_us", "__ra_by"
            ),
            [*by, "col"],
        ).select("*", *meta)
    else:
        merged = stamped
    try:
        staging_swap(spark, table, merged)
    finally:
        if report:
            batch.unpersist()
    if not report:
        return {"rows": None, "buckets": None}
    return {
        "rows": int(n_batch),
        "buckets": int(spark.table(table).count()),
    }


def rollup_multi_serve(
    spark,
    table: str,
    stats: Sequence[str] = ("count", "sum", "mean", "min", "max"),
) -> DataFrame:
    """Finalize the k-column store: ``(bucket_ts, *by, col, <stats>)``.
    Group columns recover stamp-first with a schema fallback
    (`rollup_serve`), so an empty store serves the correct empty
    frame."""
    store = spark.table(table)
    by = _recover_by(store, extra_fixed=("col",))
    return rollup_finalize(
        store.drop("__ra_col", "__ra_width_us", "__ra_by"),
        stats,
        [*by, "col"],
    )
