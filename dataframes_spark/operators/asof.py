"""As-of (last-value-before) join — an operator Spark lacks natively.

For every left row, attach the most recent right row with
``right.ts <= left.ts`` (per key). The naive formulation — range join then
per-left-row max — explodes to O(|L| x matches) intermediate rows. This
implementation is the scalable UNION + WINDOW form:

1. tag both sides and union them into one stream of (key, ts, side, ...);
2. one window per key ordered by (ts, side) computes ``last_value
   IGNORE NULLS`` of each right column over the unbounded-preceding frame
   — right rows deposit values, left rows pick up the latest deposit;
3. filter back to left rows.

Cost: one shuffle of |L| + |R| rows on the key, one sort per partition —
the same shape as a sort-merge join, with NO intermediate blowup. Skew in
the key column is AQE-invisible here (it's a window, not a join), so a
hot key serializes its partition: salt upstream or sessionize first if a
single key dominates.

The right side wins ties (right.ts == left.ts matches), matching
DuckDB/pandas ``merge_asof`` backward semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str | Sequence[str],
    value_cols: Sequence[str] | None = None,
    right_order: Sequence[str] = (),
    rsuffix: str = "",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows + the right ``value_cols`` nearest at-or-
    before (``direction="backward"``, default) or at-or-after
    (``"forward"``) each left timestamp, matched within ``by`` keys.
    Right-side columns come back null when no matching right row exists.

    ``right_order`` names extra right-side columns used to break ties
    among right rows sharing a timestamp (the greatest wins) — without it
    the pick among same-``ts`` right rows is partition-order dependent.
    ``rsuffix`` is appended to the right value columns in the output so
    they can coexist with same-named left columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [by] if isinstance(by, str) else list(by)
    value_cols = (
        list(value_cols)
        if value_cols is not None
        else [c for c in right.columns if c not in keys and c != ts_col]
    )
    lhs = left.select(
        *left.columns,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__o_{c}") for c in right_order],
    )
    rhs = right.select(
        *[
            F.col(c) if c in keys or c == ts_col else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c).alias(f"__o_{c}") for c in right_order],
    )
    # order right rows BEFORE left rows at equal ts: right at t is visible
    # to left at t (inclusive semantics in either direction). Tiebreakers
    # only order right rows among themselves (left rows carry nulls there,
    # and the __is_left key already separates the sides). Forward is the
    # mirror image: scan timestamps descending, so the "latest deposit"
    # the window carries is the nearest right row at-or-after.
    unioned = lhs.unionByName(rhs)
    ts_ordered = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        W.partitionBy(*keys)
        .orderBy(
            ts_ordered,
            F.col("__is_left").asc(),
            *[F.col(f"__o_{c}").asc() for c in right_order],
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    picked = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__p_{c}")
            for c in value_cols
        ],
    )
    out = picked.filter(F.col("__is_left") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"__p_{c}").alias(f"{c}{rsuffix}") for c in value_cols],
    )
    return out


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str | Sequence[str],
    left_id: str,
    value_cols: Sequence[str] | None = None,
    right_order: Sequence[str] = (),
    rsuffix: str = "",
) -> DataFrame:
    """As-of join, ``nearest`` direction: each left row takes the right
    row minimizing ``|left.ts - right.ts|`` within its ``by`` keys;
    equidistant candidates resolve BACKWARD (the earlier right row wins
    — deterministic, matching the lateral ``ORDER BY abs(diff), ts``
    oracle). ``left_id`` must name a column unique per left row AND
    non-null (a null id never matches the backward/forward re-join and
    that left row would silently vanish): nearest composes one backward
    and one forward pass and re-joins them on it (a generated id would
    be recomputation-unstable across the two lazy branches).

    Cost is exactly two union-window passes plus one id-equi-join — no
    pair blowup, same scale shape as the single-direction form run
    twice. Both passes carry the matched right timestamp so the
    distance pick is a pure projection.
    """
    keys = [by] if isinstance(by, str) else list(by)
    value_cols = (
        list(value_cols)
        if value_cols is not None
        else [c for c in right.columns if c not in keys and c != ts_col]
    )
    # ride the right timestamp along as a value column so each side
    # exposes the ts of the row it picked
    vc = list(value_cols) + [ts_col]
    bwd = asof_join(
        left, right, ts_col, by, vc, right_order, "__b", "backward"
    )
    fwd = asof_join(
        left, right, ts_col, by, vc, right_order, "__f", "forward"
    )
    merged = bwd.join(
        fwd.select(left_id, *[F.col(f"{c}__f") for c in vc]), left_id, "inner"
    )
    from pyspark.sql import types as T

    # exact integer distance for timestamps (double epoch-seconds round
    # at the microsecond and can flip an equidistant tie); double for
    # numeric as-of keys
    if isinstance(left.schema[ts_col].dataType, (T.TimestampType, T.TimestampNTZType)):
        num = F.unix_micros
    else:
        def num(c):
            return c.cast("double")
    bts, fts = F.col(f"{ts_col}__b"), F.col(f"{ts_col}__f")
    t = num(F.col(ts_col))
    use_bwd = F.when(fts.isNull(), F.lit(True)).when(
        bts.isNull(), F.lit(False)
    ).otherwise((t - num(bts)) <= (num(fts) - t))
    picked = [
        F.when(use_bwd, F.col(f"{c}__b"))
        .otherwise(F.col(f"{c}__f"))
        .alias(f"{c}{rsuffix}")
        for c in value_cols
    ]
    return merged.select(*left.columns, *picked)
