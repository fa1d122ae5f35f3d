"""Descriptive statistics: whole-column stats, describe, correlations.

Reference surface: whole-column min/max/mean/median/std/var/sum/quantile
(reference: native_libs/src/Analysis.cpp:255-413), ``describe``
(src/Table.luna:1199-1208,1321-1361), ``describeNa``/null counts
(src/Table.luna:1096-1105), Pearson ``correlations`` matrix with
pairwise-complete semantics (native_libs/src/Analysis.cpp:415-519),
``correlationsWith`` (Analysis.cpp:469-488) and ``autoCorr``
(Analysis.cpp:521-526).

All of it is a single distributed aggregation pass — one job, map-side
partials, a one-row (or #columns-row) result. Nothing collects data to the
driver except the final tiny frame.

Quantile semantics: the default follows ANSI ``percentile_cont``-style
``(N-1)*q`` interpolation (Spark ``percentile``, DuckDB
``quantile_cont``), NOT the reference's ``N*q - 0.5`` midpoint rule
(Analysis.cpp:19-37) — documented delta, SURVEY.md §7. Users who need
bit-level parity with the reference opt in via
``quantile(df, col, q, method="reference")``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}



def _bq(name: str) -> str:
    """Backtick-quote an identifier for use inside F.expr SQL text — a
    column named ``a-b`` must not parse as subtraction (silently wrong
    stats), and spaces/dots/keywords must not throw."""
    return "`" + name.replace("`", "``") + "`"


def _sq(name: str) -> str:
    """Single-quote a name as a SQL string literal (stack labels)."""
    return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"


def numeric_columns(df: DataFrame) -> list[str]:
    return [c for c, t in df.dtypes if t.split("(")[0] in NUMERIC_TYPES]


def column_stats(df: DataFrame, col: str, quantile: float = 1.0 / 3.0) -> DataFrame:
    """Single-row frame of whole-column statistics (reference:
    src/Column.luna:174-181). std/var are population moments
    (boost accumulators in Analysis.cpp:136-153 are population variance)."""
    c = F.col(col)
    return df.agg(
        F.min(c).cast("double").alias("min"),
        F.max(c).cast("double").alias("max"),
        F.avg(c).alias("mean"),
        F.expr(f"percentile({_bq(col)}, 0.5)").alias("median"),
        F.stddev_pop(c).alias("std"),
        F.var_pop(c).alias("var"),
        F.sum(c).cast("double").alias("sum"),
        F.expr(f"percentile({_bq(col)}, {quantile!r})").alias("quantile"),
    )


def quantile(
    df: DataFrame, col: str, q: float, method: str = "ansi"
) -> DataFrame:
    """One-row ``(quantile)`` frame for an exact continuous quantile.

    method="ansi" (default): ``(N-1)*q`` interpolation — Spark
    ``percentile`` / DuckDB ``quantile_cont`` semantics, matching every
    other quantile in this package.

    method="reference": the reference's midpoint rule (reference:
    native_libs/src/Analysis.cpp:19-37) — index ``h = N*q - 0.5`` clamped
    to ``[0, N-1]``, linear interpolation between the surrounding sorted
    values. Spark's ``percentile`` cannot express this directly (its
    percentage argument must be foldable, but ``h`` depends on the
    aggregate N), so the plan ranks the non-null values through the
    DISTRIBUTED global-order lane (quantile buckets + per-bucket
    row_number + a running offset over the bucket-cardinality counts
    relation — ``global_order._with_positions``; the r8 form global-
    windowed every value through one reducer), broadcasts the one-row
    ``(N, h)`` frame onto the two bracketing ranks, and lerps —
    action-free, no data-bearing single partition anywhere. Ties share
    a value, so bucket-local tie order cannot change the lerp.
    """
    if method == "ansi":
        return df.agg(F.expr(f"percentile({_bq(col)}, {q!r})").alias("quantile"))
    if method != "reference":
        raise ValueError(f"method must be 'ansi' or 'reference', got {method!r}")
    from dataframes_spark.operators import global_order as go

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q!r}")
    vals = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).cast("double").alias("__v"))
    )
    order = F.col("__v")
    bdf, _ = go._with_positions(
        go._bucketize_quantile(vals, order, go.default_buckets(vals)), order
    )
    pos = bdf.select("__v", (F.col("__go_pos") - 1).alias("__i"))
    h = F.least(
        F.greatest(F.col("__n") * F.lit(float(q)) - F.lit(0.5), F.lit(0.0)),
        (F.col("__n") - 1).cast("double"),
    )
    bounds = (
        vals.agg(F.count(F.lit(1)).alias("__n"))
        .select(h.alias("__h"))
        .select("__h", F.floor("__h").alias("__lo"), F.ceil("__h").alias("__hi"))
    )
    return (
        pos.join(
            F.broadcast(bounds),
            (F.col("__i") == F.col("__lo")) | (F.col("__i") == F.col("__hi")),
        )
        .agg(
            F.min(F.when(F.col("__i") == F.col("__lo"), F.col("__v"))).alias("__vlo"),
            F.min(F.when(F.col("__i") == F.col("__hi"), F.col("__v"))).alias("__vhi"),
            F.first("__h").alias("__fh"),
            F.first("__lo").alias("__flo"),
        )
        .select(
            (
                F.col("__vlo")
                + (F.col("__fh") - F.col("__flo"))
                * (F.col("__vhi") - F.col("__vlo"))
            ).alias("quantile")
        )
    )


# Exact percentile buffers every value of each aggregated column in the
# aggregation buffer — fine on a dimension table, memory-unbounded on a
# 100 TB fact. `exact=None` (the auto default for describe/qcut)
# resolves per call from Catalyst's optimized-plan size estimate for the
# input: exact when the estimate is <= this bound, approx (bounded-
# memory t-digest sketch) when larger or unknown.
AUTO_EXACT_MAX_BYTES = 256 << 20


def _resolve_exact(df: DataFrame, exact: bool | None) -> bool:
    """Resolve an ``exact=None`` auto request against the input's
    Catalyst size estimate; an explicit True/False always wins.

    When auto downgrades to approx a warning is emitted: the switch
    changes the ANSWER (approximate quantiles), not just the plan, and
    callers comparing against an exact oracle must pass ``exact=True``
    themselves rather than rely on the estimate staying small."""
    import warnings

    if exact is not None:
        return exact
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        # no JVM plan handle (e.g. Spark Connect): unknown size, so take
        # the bounded-memory form — the only safe default at any scale
        warnings.warn(
            "exact=None with no plan-size estimate available (e.g. Spark "
            "Connect): resolving to APPROXIMATE quantiles; pass exact=True "
            "if exact answers are required",
            stacklevel=3,
        )
        return False
    if size <= AUTO_EXACT_MAX_BYTES:
        return True
    warnings.warn(
        f"exact=None auto-resolved to APPROXIMATE quantiles (input size "
        f"estimate {size} B > {AUTO_EXACT_MAX_BYTES} B); pass exact=True "
        "if exact answers are required",
        stacklevel=3,
    )
    return False


_BRACKET_ACCURACY = 10_000


def _exact_quantiles(
    df: DataFrame, cols: Sequence[str], qs: Sequence[float]
) -> DataFrame:
    """Exact ``percentile``-semantics quantiles for several columns at
    once, WITHOUT the ``percentile`` aggregate's value-buffering (which
    merges every distinct value of every column into ONE final task's
    in-memory map — both the single-reducer scale hazard and, measured,
    ~1.8s of describe's 2.8s on lineitem's 583k-distinct
    ``l_extendedprice`` at sf0.1).

    Two passes, classic distributed selection:

    1. ONE wide sketch aggregate: per column, ``percentile_approx`` at
       every target's bracket percentages ``q ± 4/accuracy`` plus the
       exact non-null count. The GK sketch's rank-error bound is HARD
       (``±N/accuracy``), so each bracket provably contains its
       target's ``floor/ceil((N-1)q)`` order statistics whenever
       ``N > 2*accuracy`` (below that the fold is skipped outright and
       every distinct value — at most N <= 2*accuracy of them — is a
       candidate). A bracket end whose percentage clamps at 0 or 1
       stays OPEN (no fold on that side) because the bound cannot
       guarantee containment there.
    2. ONE scan that folds every out-of-bracket row onto an exact-count
       SENTINEL key that sorts exactly where its region sorts (-inf
       below the first bracket, the bracket-gap midpoint between two
       brackets — always strictly between them when the gap is
       non-empty — +inf above the last, NaN keeps its own key and its
       last-place sort order), then groups ``(column, key)`` to counts.
       Map-side combine collapses the folded regions, so the shuffled
       candidate relation is ~``10*N/accuracy`` ranks per target plus
       edge ties — at any scale the per-task work is one column's
       candidates, never the data.

    A per-column window over the tiny candidate relation turns counts
    into exact 0-based first-rank indexes; the bracketing values for
    each target index ``h = (N-1)*q`` then reproduce the aggregate's
    own interpolation BIT for BIT (verified on an 840-case random
    battery incl. ties and extremes):

    - same-entry targets (``floor(h) == ceil(h)`` or both indexes
      inside one distinct value's count range) return the value with no
      arithmetic, exactly like ``Percentile.getPercentile``'s
      accumulated-counts lookup;
    - split targets use the weighted form
      ``vlo*(ihi - h) + vhi*(h - ilo)``.

    The sketch only STEERS (which rows fold); every count and rank the
    answer is computed from is exact, so the result does not depend on
    the sketch's merge order.

    Returns EXACTLY one row per requested column:
    ``(__dq_name, __dq_q0, __dq_q1, ...)`` in ``qs`` order; a column
    with no non-null rows gets NULL quantiles, mirroring the NULL the
    ``percentile`` aggregate returns. The anchor row per column comes
    from the count aggregate, so callers may INNER join — which also
    keeps a bare ``count()`` of a joined describe honest (a left outer
    join to this aggregate's unique keys is legally ELIMINATED under
    count, silently skipping the whole lane).

    The ONLY known semantic divergence is a column containing BOTH
    +0.0 and -0.0: grouping normalizes -0.0 to 0.0 while the
    aggregate's map keeps boxed keys distinct — either way every
    affected quantile is a zero, differing at most in sign."""
    names = list(cols)
    k = len(names)
    acc = _BRACKET_ACCURACY
    margin = 4.0 / acc
    qsorted = sorted(set(float(q) for q in qs))
    # bracket percentages per sorted target; None = open end (clamped)
    lo_ps = [q - margin if q - margin > 0.0 else None for q in qsorted]
    hi_ps = [q + margin if q + margin < 1.0 else None for q in qsorted]
    ps = sorted({p for p in lo_ps + hi_ps if p is not None})
    pidx = {p: i for i, p in enumerate(ps)}

    # ---- pass 1: one wide aggregate — brackets + exact counts
    aggs: list[Column] = []
    for i, c in enumerate(names):
        if ps:
            aggs.append(F.percentile_approx(c, ps, acc).alias(f"__dq_br{i}"))
        aggs.append(F.count(c).alias(f"__dq_n{i}"))
    brk = df.agg(*aggs)

    def _fold(i: int, v: Column) -> Column:
        """The sentinel fold for column i — exact-rank-preserving keys."""
        br = F.col(f"__dq_br{i}")
        blos = [
            None if p is None else F.element_at(br, pidx[p] + 1) for p in lo_ps
        ]
        bhis = [
            None if p is None else F.element_at(br, pidx[p] + 1) for p in hi_ps
        ]
        # NaN first: its key is itself (sorts last, exactly like the raw
        # data), so a NaN-region target still resolves exactly
        folded = F.when(F.isnan(v), v)
        for j in range(len(qsorted)):
            if blos[j] is not None:
                lower = (
                    F.lit(float("-inf"))
                    if j == 0
                    else (
                        # gap midpoint: strictly between the brackets
                        # whenever any double lies strictly between them
                        (bhis[j - 1] + blos[j]) / F.lit(2.0)
                        if bhis[j - 1] is not None
                        else None
                    )
                )
                if lower is not None:
                    folded = folded.when(v < blos[j], lower)
            if bhis[j] is not None:
                folded = folded.when(v <= bhis[j], v)
            else:
                # open top end: everything from here up stays a candidate
                return folded.otherwise(v)
        folded = folded.otherwise(F.lit(float("inf")))
        # fold only when the guarantee holds; small columns keep every
        # distinct value (bounded by N <= 2*acc rows)
        return F.when(F.col(f"__dq_n{i}") > F.lit(2 * acc), folded).otherwise(v)

    # ---- pass 2: one scan -> sentinel fold -> (column, key) counts
    stack_args = ", ".join(
        f"{i}, cast({_bq(c)} as double)" for i, c in enumerate(names)
    )
    stacked = (
        df.select(F.expr(f"stack({k}, {stack_args}) as (__dq_idx, __dq_v)"))
        .filter(F.col("__dq_v").isNotNull())
        .crossJoin(F.broadcast(brk))
    )
    key = F.col("__dq_v")
    for i in range(k - 1, -1, -1):
        key = F.when(F.col("__dq_idx") == i, _fold(i, F.col("__dq_v"))).otherwise(
            key
        )
    cand = (
        stacked.select("__dq_idx", key.alias("__dq_k"))
        .groupBy("__dq_idx", "__dq_k")
        .agg(F.count(F.lit(1)).alias("__dq_cnt"))
    )
    w = (
        W.partitionBy("__dq_idx")
        .orderBy("__dq_k")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = cand.withColumn(
        "__dq_lo", F.coalesce(F.sum("__dq_cnt").over(w), F.lit(0))
    )

    # ---- targets: (column idx, q, h, floor, ceil) from the counts —
    # derived from the SAME broadcast as the scan, never a second agg
    targets = (
        df.sparkSession.range(1)
        .crossJoin(F.broadcast(brk))
        .select(
            F.posexplode(
                F.array(*[F.col(f"__dq_n{i}") for i in range(k)])
            ).alias("__dq_idx", "__dq_n")
        )
        .select(
            "__dq_idx",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("__dq_q"),
            "__dq_n",
        )
        .select(
            "__dq_idx",
            "__dq_q",
            F.when(
                F.col("__dq_n") > 0, (F.col("__dq_n") - 1) * F.col("__dq_q")
            ).alias("__dq_h"),
        )
        .select(
            "__dq_idx",
            "__dq_q",
            "__dq_h",
            F.floor("__dq_h").alias("__dq_ilo"),
            F.ceil("__dq_h").alias("__dq_ihi"),
        )
    )
    r = ranked.alias("r")
    t = targets.alias("t")
    hit_lo = (F.col("r.__dq_lo") <= F.col("t.__dq_ilo")) & (
        F.col("t.__dq_ilo") < F.col("r.__dq_lo") + F.col("r.__dq_cnt")
    )
    hit_hi = (F.col("r.__dq_lo") <= F.col("t.__dq_ihi")) & (
        F.col("t.__dq_ihi") < F.col("r.__dq_lo") + F.col("r.__dq_cnt")
    )
    picked = (
        t.join(
            F.broadcast(r),
            (F.col("r.__dq_idx") == F.col("t.__dq_idx"))
            & (F.col("r.__dq_lo") <= F.col("t.__dq_ihi"))
            & (F.col("r.__dq_lo") + F.col("r.__dq_cnt") > F.col("t.__dq_ilo")),
            "left",
        )
        .groupBy(
            F.col("t.__dq_idx").alias("__dq_idx"),
            F.col("t.__dq_q").alias("__dq_q"),
            F.col("t.__dq_h").alias("__dq_h"),
            F.col("t.__dq_ilo").alias("__dq_ilo"),
            F.col("t.__dq_ihi").alias("__dq_ihi"),
        )
        .agg(
            F.min(F.when(hit_lo, F.col("r.__dq_k"))).alias("__dq_vlo"),
            F.min(F.when(hit_hi, F.col("r.__dq_k"))).alias("__dq_vhi"),
        )
    )
    val = F.when(
        (F.col("__dq_ilo") == F.col("__dq_ihi"))
        | (F.col("__dq_vlo") == F.col("__dq_vhi")),
        F.col("__dq_vlo"),
    ).otherwise(
        F.col("__dq_vlo") * (F.col("__dq_ihi") - F.col("__dq_h"))
        + F.col("__dq_vhi") * (F.col("__dq_h") - F.col("__dq_ilo"))
    )
    aggs2 = [
        F.min(F.when(F.col("__dq_q") == F.lit(float(q)), val)).alias(f"__dq_q{i}")
        for i, q in enumerate(qs)
    ]
    name = F.element_at(
        F.array(*[F.lit(c) for c in names]), F.col("__dq_idx").cast("int") + 1
    )
    return (
        picked.groupBy("__dq_idx")
        .agg(*aggs2)
        .select(name.alias("__dq_name"), *[f"__dq_q{i}" for i in range(len(qs))])
    )


def describe(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact: bool | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-numeric-column mean/std/min/q25/median/q75/max, one row per
    column (reference: src/Table.luna:1321-1361). Computed as ONE wide
    aggregation then unpivoted — a single pass over the data regardless of
    column count.

    ``exact=False`` is the one-pass sketch form: the three quantiles
    per column come from ONE array-argument ``percentile_approx``
    aggregate (t-digest-style sketch, bounded memory at any scale, rank
    error <= 1/``accuracy``), same contract as the
    ``median``/``median_approx`` pair in ``aggregate.py``.

    ``exact=True`` quantiles ride `_exact_quantiles` — distinct-value
    counts plus a distributed cumulative rank, bit-identical to the
    ``percentile`` aggregate but spillable and parallel. The former
    ``percentile``-aggregate form buffered every distinct value of every
    column in ONE final-aggregation task's in-memory map (both the
    single-reducer scale hazard and, measured, ~1.8s of describe's 2.8s
    on lineitem's 583k-distinct ``l_extendedprice`` at sf0.1);
    mean/std/min/max stay in the one wide raw-row aggregation pass,
    untouched.

    ``exact=None`` (default) auto-resolves: exact when Catalyst
    estimates the input under ``AUTO_EXACT_MAX_BYTES``, approx
    otherwise — a naive ``describe(huge_table)`` can no longer OOM an
    executor. Pass ``exact=True`` when reference-exact quantiles are
    required regardless of size."""
    cols = list(cols) if cols is not None else numeric_columns(df)
    exact = _resolve_exact(df, exact)
    aggs: list[Column] = []
    for c in cols:
        aggs += [
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_pop(c).alias(f"{c}__std"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
        if not exact:
            aggs.append(
                F.percentile_approx(c, [0.25, 0.5, 0.75], accuracy).alias(f"{c}__q")
            )
    wide = df.agg(*aggs)
    unpack: list[Column] = []
    for c in cols:
        unpack += [
            F.col(f"{c}__mean"),
            F.col(f"{c}__std"),
            F.col(f"{c}__min"),
        ]
        if not exact:
            unpack += [
                F.col(f"{c}__q")[0].cast("double").alias(f"{c}__q25"),
                F.col(f"{c}__q")[1].cast("double").alias(f"{c}__median"),
                F.col(f"{c}__q")[2].cast("double").alias(f"{c}__q75"),
            ]
        unpack.append(F.col(f"{c}__max"))
    wide = wide.select(*unpack)
    n = len(cols)
    if not exact:
        stack_args = ", ".join(
            f"{_sq(c)}, " + ", ".join(_bq(f"{c}__{s}") for s in
                ("mean", "std", "min", "q25", "median", "q75", "max"))
            for c in cols
        )
        return wide.select(
            F.expr(
                f"stack({n}, {stack_args}) as "
                "(column, mean, std, min, q25, median, q75, max)"
            )
        )
    stack_args = ", ".join(
        f"{_sq(c)}, " + ", ".join(_bq(f"{c}__{s}") for s in ("mean", "std", "min", "max"))
        for c in cols
    )
    moments = wide.select(
        F.expr(f"stack({n}, {stack_args}) as (column, mean, std, min, max)")
    )
    # INNER join on the lane's guaranteed per-column anchor row — a left
    # outer join here is legally eliminated under a bare count() (the
    # right keys are unique aggregate keys), which would let a count
    # action skip computing the quantiles entirely
    qrows = _exact_quantiles(df, cols, [0.25, 0.5, 0.75])
    return (
        moments.join(
            F.broadcast(qrows),
            moments["column"] == qrows["__dq_name"],
        )
        .select(
            "column",
            "mean",
            "std",
            "min",
            F.col("__dq_q0").alias("q25"),
            F.col("__dq_q1").alias("median"),
            F.col("__dq_q2").alias("q75"),
            "max",
        )
    )


def describe_na(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Null count + null ratio per column (reference:
    src/Table.luna:1096-1105), one aggregation pass."""
    cols = list(cols) if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"{c}__nulls"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"{_sq(c)}, {_bq(f'{c}__nulls')}" for c in cols)
    return wide.select(
        F.expr(f"stack({len(cols)}, {stack_args}) as (column, null_count)"),
        (F.col("__n")).alias("__n"),
    ).select(
        "column",
        "null_count",
        (F.col("null_count") / F.col("__n")).alias("null_ratio"),
    )


def correlations(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Pearson correlation for every pair of numeric columns, long format
    ``(col_a, col_b, corr)`` (reference matrix: Analysis.cpp:415-519;
    pairwise-complete — Spark's ``corr`` aggregate also skips any-null
    pairs). One aggregation pass computes all O(k^2) cells."""
    cols = list(cols) if cols is not None else numeric_columns(df)
    aggs = [
        F.corr(a, b).alias(f"{a}__{b}")
        for i, a in enumerate(cols)
        for b in cols[i:]
    ]
    wide = df.agg(*aggs)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    stack_args = ", ".join(
        f"{_sq(a)}, {_sq(b)}, {_bq(f'{a}__{b}')}" for a, b in pairs
    )
    return wide.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) as (col_a, col_b, corr)")
    )


def correlations_with(df: DataFrame, target: str, cols: Sequence[str] | None = None) -> DataFrame:
    """Correlation of each numeric column with ``target``, sorted by value
    (reference: Analysis.cpp:469-488)."""
    cols = list(cols) if cols is not None else numeric_columns(df)
    aggs = [F.corr(c, target).alias(c) for c in cols]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"{_sq(c)}, {_bq(c)}" for c in cols)
    return wide.select(
        F.expr(f"stack({len(cols)}, {stack_args}) as (column, corr)")
    ).orderBy(F.col("corr").desc())


def auto_corr(df: DataFrame, col: str, order_by: str, lag: int = 1) -> DataFrame:
    """Pearson corr of a column against its lag, over an explicit ordering
    (reference: Analysis.cpp:521-526 — implicit row order; distribution
    requires the order to be named). The lag runs on the distributed
    global-order lane (``operators.window.shift`` — range buckets +
    boundary exchange, no single-reducer sort), then one corr aggregate."""
    from dataframes_spark.operators.window import shift

    lagged = shift(df, col, lag, order_by)
    return lagged.agg(F.corr(col, f"{col}_shift_{lag}").alias("autocorr"))


def histogram(df: DataFrame, col: str, bins: int = 20) -> DataFrame:
    """Distributed equal-width histogram as a DataFrame:
    ``(bin, lo, hi, n)`` — the data-plane twin of ``viz.histogram``
    (which collects only the already-binned counts for plotting).

    The min/max range folds into the plan as a 1-row broadcast
    aggregate, so construction launches no job and the whole thing is
    two aggregation passes over the column (range + counts), map-side
    partial both times. Values exactly at the upper edge land in the
    last bin (the standard closed-last-bin rule); nulls are dropped;
    a constant column collapses into one bin. Empty bins are absent
    from the output (count is by presence, not a dense bin spine).
    ``lo``/``hi`` are rounded to 6dp for cross-engine stability."""
    if bins <= 0:
        raise ValueError(f"bins must be positive, got {bins}")
    x = F.col(col).cast("double")
    rng = df.where(x.isNotNull()).agg(
        F.min(x).alias("__mn"), F.max(x).alias("__mx")
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(bins))
    bin_ = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((x - F.col("__mn")) / width), F.lit(bins - 1)
        )
    ).cast("int")
    return (
        df.where(x.isNotNull())
        .crossJoin(F.broadcast(rng))
        .select(bin_.alias("bin"), "__mn", "__mx")
        .groupBy("bin", "__mn", "__mx")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.col("__mn") + F.col("bin") * width, 6).alias("lo"),
            F.round(F.col("__mn") + (F.col("bin") + 1) * width, 6).alias("hi"),
            "n",
        )
    )


def winsorize(
    df: DataFrame, col: str, lower: float = 0.01, upper: float = 0.99
) -> DataFrame:
    """Clip a column to its [``lower``, ``upper``] quantiles — the
    standard outlier-taming pass before training-statistics or
    normalization. The two bounds fold into the plan as a 1-row
    broadcast aggregate (Spark's exact distributed ``percentile``), so
    construction launches no job and the clip itself is a pure
    projection. The clipped column comes back as DOUBLE (quantiles
    interpolate); nulls stay null; all other columns pass through."""
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(f"need 0 <= lower <= upper <= 1, got {lower}, {upper}")
    x = F.col(col).cast("double")
    bounds = df.agg(
        F.expr(f"percentile({_bq(col)}, {lower!r})").alias("__qlo"),
        F.expr(f"percentile({_bq(col)}, {upper!r})").alias("__qhi"),
    )
    clipped = (
        F.when(x < F.col("__qlo"), F.col("__qlo"))
        .when(x > F.col("__qhi"), F.col("__qhi"))
        .otherwise(x)
    )
    return df.crossJoin(F.broadcast(bounds)).select(
        *[clipped.alias(c) if c == col else F.col(c) for c in df.columns]
    )


def standardize(
    df: DataFrame,
    cols: Sequence[str],
    method: str = "zscore",
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Feature scaling in place: replace each of ``cols`` with its
    z-score (``(x - mean) / std``, population std) or min-max
    (``(x - min) / (max - min)``) scaled DOUBLE value — globally, or
    within ``by`` groups.

    Global statistics fold in as a 1-row broadcast aggregate
    (construction launches no job); grouped statistics are unbounded
    window aggregates over the group — one shuffle on the group key,
    no self-join. Degenerate spans (std = 0 / max = min) scale to 0.0
    by convention rather than null-ing out a constant feature; nulls
    stay null; all other columns pass through unchanged.
    """
    if method not in ("zscore", "minmax"):
        raise ValueError(f"method must be zscore|minmax, got {method}")
    cols = list(cols)

    def scaled(c: str, lo: Column, span: Column) -> Column:
        x = F.col(c).cast("double")
        return F.when(x.isNull(), None).otherwise(
            F.when(span == 0, F.lit(0.0)).otherwise((x - lo) / span)
        )

    if by:
        from pyspark.sql import Window as W

        w = W.partitionBy(*by)
        out_cols = []
        for c in df.columns:
            if c not in cols:
                out_cols.append(F.col(c))
                continue
            x = F.col(c).cast("double")
            if method == "zscore":
                lo, span = F.avg(x).over(w), F.stddev_pop(x).over(w)
            else:
                lo, span = F.min(x).over(w), F.max(x).over(w) - F.min(x).over(w)
            out_cols.append(scaled(c, lo, span).alias(c))
        return df.select(*out_cols)

    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        if method == "zscore":
            aggs += [F.avg(x).alias(f"__lo_{c}"), F.stddev_pop(x).alias(f"__sp_{c}")]
        else:
            aggs += [
                F.min(x).alias(f"__lo_{c}"),
                (F.max(x) - F.min(x)).alias(f"__sp_{c}"),
            ]
    stats_row = df.agg(*aggs)
    return df.crossJoin(F.broadcast(stats_row)).select(
        *[
            scaled(c, F.col(f"__lo_{c}"), F.col(f"__sp_{c}")).alias(c)
            if c in cols
            else F.col(c)
            for c in df.columns
        ]
    )


def robust_outliers(
    df: DataFrame,
    col: str,
    threshold: float = 3.5,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Median/MAD outlier flagging (Iglewicz-Hoaglin robust z-score):
    appends ``robust_z = (x - median) / (1.4826 * MAD)`` and
    ``is_outlier = |robust_z| > threshold``. Unlike mean/std flagging
    (`standardize`), the breakdown point is 50% — the outliers being
    hunted cannot drag the fence toward themselves. 1.4826 is the
    standard normal-consistency factor (1 / Phi^-1(3/4)); 3.5 is the
    Iglewicz-Hoaglin recommended cut.

    Two exact-percentile passes by construction (MAD needs the median
    first). Globally both fold in as 1-row broadcast aggregates — the
    data rows never shuffle; with ``by``, both are unbounded window
    aggregates over ONE exchange on the group key (the second window
    reuses the first's partitioning). Degenerate MAD = 0 scores 0.0
    (the `standardize` span convention); nulls stay null and never
    flag; all other columns pass through."""
    if threshold <= 0:
        raise ValueError(f"need threshold > 0, got {threshold}")
    x = F.col(col).cast("double")

    def z(med: Column, mad: Column) -> Column:
        return F.when(x.isNull(), None).otherwise(
            F.when(mad == 0, F.lit(0.0)).otherwise(
                (x - med) / (F.lit(1.4826) * mad)
            )
        )

    if by:
        from pyspark.sql import Window as W

        w = W.partitionBy(*list(by))
        with_med = df.select(
            "*", F.expr(f"percentile({_bq(col)}, 0.5)").over(w).alias("__med")
        )
        with_mad = with_med.select(
            "*",
            F.expr(
                f"percentile(abs({_bq(col)} - __med), 0.5)"
            ).over(w).alias("__mad"),
        )
        zc = z(F.col("__med"), F.col("__mad"))
    else:
        med_row = df.agg(
            F.expr(f"percentile({_bq(col)}, 0.5)").alias("__med")
        )
        with_med = df.crossJoin(F.broadcast(med_row))
        mad_row = with_med.agg(
            F.expr(f"percentile(abs({_bq(col)} - __med), 0.5)").alias("__mad")
        )
        with_mad = with_med.crossJoin(F.broadcast(mad_row))
        zc = z(F.col("__med"), F.col("__mad"))
    return with_mad.select(
        *df.columns,
        zc.alias("robust_z"),
        F.when(x.isNull(), None)
        .otherwise(F.abs(zc) > threshold)
        .alias("is_outlier"),
    )


def qcut(
    df: DataFrame,
    col: str,
    n_buckets: int,
    out_col: str | None = None,
    by: Sequence[str] | None = None,
    exact: bool | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Quantile bucketing (pandas ``qcut`` shape): adds an INT bucket
    column 1..``n_buckets`` assigning each row to its quantile band of
    ``col`` — the curriculum/quality-band primitive (e.g. split a corpus
    into quality quartiles, then mix per band). With ``by``, boundaries
    are computed PER GROUP (e.g. length quartiles within each language,
    so short-form languages aren't all banded low by long-form ones).

    NOT ``ntile``: a global ntile is a single-reducer sort of the whole
    table. Here the n-1 boundaries come from ONE percentile aggregate
    (array-argument — one buffer, same layout as ``describe``), ride
    into the plan as a broadcast 1-row frame (data, not a literal; a
    group-count-sized frame with ``by``), and assignment is a map-only
    fold: ``bucket = 1 + #(boundaries < value)``. Row order never
    matters, no shuffle of the table, and the same boundaries give the
    same assignment on any engine. Ties AT a boundary go to the lower
    bucket (value <= b_i). With heavy value skew duplicate boundaries
    leave intermediate buckets empty rather than splitting equal values
    arbitrarily — deterministic by design.

    ``exact=False`` swaps in ``percentile_approx`` (bounded-memory
    sketch) for corpus scale; ``exact=None`` (default) auto-resolves
    from Catalyst's input-size estimate (exact under
    ``AUTO_EXACT_MAX_BYTES``, approx above — see ``describe``). Null
    values get bucket NULL, and with ``by`` so do rows whose GROUP key
    is null (standard join semantics: a null key matches no boundary
    row — a band within an unknown group is meaningless)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    exact = _resolve_exact(df, exact)
    out_col = out_col or f"{col}_bucket"
    qs = [i / n_buckets for i in range(1, n_buckets)]
    x = F.col(col).cast("double")
    if exact:
        qlist = ", ".join(f"{q}D" for q in qs)
        bounds = F.expr(f"percentile({_bq(col)}, array({qlist}))")
    else:
        bounds = F.percentile_approx(col, qs, accuracy)
    bucket = (
        F.lit(1)
        + F.aggregate(
            F.col("__qb"),
            F.lit(0),
            lambda acc, b: acc + F.when(x > b.cast("double"), 1).otherwise(0),
        )
    ).cast("int")
    if by:
        bframe = df.groupBy(*by).agg(bounds.alias("__qb"))
        joined = df.join(F.broadcast(bframe), list(by), "left")
    else:
        bframe = df.agg(bounds.alias("__qb"))
        joined = df.crossJoin(F.broadcast(bframe))
    return joined.select(
        *df.columns,
        F.when(x.isNotNull(), bucket).alias(out_col),
    )
