"""Multi-key sort with per-key direction and null placement.

Reference: stable multi-key lexicographic sort, per key Asc/Desc x
NullsBefore/NullsAfter (reference: src/Table.luna:806-952, engine
native_libs/src/Sort.cpp:131-216 — permutation built by reversed
successive std::stable_sort passes).

Spark's ``orderBy`` is a range-partitioned distributed sort — sampled
range boundaries, one shuffle, per-partition sort; it scales where the
reference's single-threaded permutation sort cannot. Spark's sort is NOT
stable across equal keys, so callers needing the reference's stability add
an explicit tiebreaker key (a pre-existing row id).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort_by(
    df: DataFrame,
    keys: Sequence[tuple[str, str, str]],
    stable_tiebreaker: str | None = None,
) -> DataFrame:
    """``keys`` is a list of (column, 'asc'|'desc', 'nulls_first'|'nulls_last').

    ``stable_tiebreaker``: optional column appended ascending to emulate
    the reference's stable sort deterministically.
    """
    exprs: list[Column] = []
    for col, direction, nulls in keys:
        c = F.col(col)
        asc = direction.lower() == "asc"
        first = nulls.lower() == "nulls_first"
        if asc and first:
            exprs.append(c.asc_nulls_first())
        elif asc:
            exprs.append(c.asc_nulls_last())
        elif first:
            exprs.append(c.desc_nulls_first())
        else:
            exprs.append(c.desc_nulls_last())
    if stable_tiebreaker:
        exprs.append(F.col(stable_tiebreaker).asc())
    return df.orderBy(*exprs)


def top_k(df: DataFrame, keys: Sequence[tuple[str, str, str]], k: int) -> DataFrame:
    """orderBy + limit — Spark plans this as TakeOrderedAndProject: each
    partition keeps a k-row heap, only k rows per partition move, no full
    sort. The reference can only full-sort then take
    (src/Table.luna:602-663)."""
    return sort_by(df, keys).limit(k)


def top_k_by_group(
    df: DataFrame,
    group_cols: str | Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Largest-``k`` (or smallest, ``descending=False``) rows of
    ``order_col`` within each group — the grouped twin of ``top_k``
    (e.g. the 10 longest documents per source, the 5 most recent events
    per user). ``tiebreak_col`` pins a total order for deterministic
    results on ties.

    One rank window per group; Spark's rank-limit pushdown
    (WindowGroupLimit) cuts each input partition to k candidates
    MAP-SIDE before the exchange — at most k*P rows per group cross the
    wire however large the group, the same two-phase shape as
    ``cap_per_group`` and the global ``weighted_sample_topk``."""
    from pyspark.sql import Window as W

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    # nulls_last in BOTH directions: plain asc() is nulls-first, so a
    # null would claim a smallest-k slot and push out real data; a null
    # is never among the "top k by value" either way
    order = [
        F.col(order_col).desc_nulls_last()
        if descending
        else F.col(order_col).asc_nulls_last()
    ]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = W.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .drop("__rnk")
    )
