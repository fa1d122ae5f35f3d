"""Reshaping: split+explode (ungroup), horizontal concat, slice/take/drop.

Reference: ``ungroupSplittingOn`` splits a string column on a separator
and explodes, duplicating the other columns per element; rows whose string
is null vanish (reference: native_libs/src/Processing.cpp:694-819, test
Tests.cpp:1222-1241). Horizontal ``concat`` zips same-length tables by
column (src/Table.luna:278-310). ``slice``/``take``/``drop`` are row
ranges (src/Table.luna:602-663).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ungroup_splitting_on(df: DataFrame, col: str, sep: str) -> DataFrame:
    """split -> explode. Plain ``explode`` yields zero rows for null/empty
    arrays, which is exactly the reference's null-row-vanishes semantics
    (Tests.cpp:1222-1241). Explode is a generator inside whole-stage
    codegen — no shuffle."""
    others = [c for c in df.columns if c != col]
    # escape the separator: reference splits on a literal string
    import re

    pattern = re.escape(sep)
    return df.select(*others, F.explode(F.split(F.col(col), pattern)).alias(col)) \
             .select(*df.columns)


def ungroup(df: DataFrame, col: str) -> DataFrame:
    """Explode an existing array column (reference C++-only ``ungroup``,
    Processing.cpp:774-812)."""
    others = [c for c in df.columns if c != col]
    return df.select(*others, F.explode(F.col(col)).alias(col)).select(*df.columns)


def concat_horizontal(left: DataFrame, right: DataFrame, order_left: Sequence[str], order_right: Sequence[str]) -> DataFrame:
    """Horizontal (by-column) concat of two same-length frames
    (reference: src/Table.luna:278-310).

    Spark has no positional row identity, so rows are aligned by a
    GLOBAL position over an explicit deterministic ordering of each
    side, then joined on it. Positions come from the distributed
    global-order lane (`global_order.global_positions`: per-bucket
    row numbers + a bucket-cardinality offsets relation), NOT from a
    partition-free ``row_number`` window — so neither side ever funnels
    through one reducer, at any scale. Cost: one bucket exchange per
    side + the position equi-join.

    Mismatched lengths pad the shorter side with nulls, like the
    reference's ``Table.fromColumns`` (src/Table.luna:68-96; test
    native_libs/test/Tests.cpp:1108-1123) — hence the full outer join.
    """
    from dataframes_spark.operators.global_order import global_positions

    l_idx = global_positions(left, list(order_left), pos_col="__rid")
    r_idx = global_positions(right, list(order_right), pos_col="__rid")
    return l_idx.join(r_idx, "__rid", "full").drop("__rid")


def slice_rows(df: DataFrame, begin: int, count: int, order_by: Sequence[str]) -> DataFrame:
    """Row-range selection over an explicit ordering (reference
    ``slice``/``take``/``drop``, src/Table.luna:602-663). Uses
    offset+limit (Spark 3.4+) so the plan stays a bounded fetch."""
    out = df.orderBy(*order_by)
    if begin:
        out = out.offset(begin)
    return out.limit(count)


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide-to-long unpivot: one output row per (id row, value column),
    ``(ids..., variable, value)`` — the inverse of pivot and the other
    half of the reshape family (§2.10). Values are cast to DOUBLE (the
    unpivoted column must have one type; the reference's numeric model
    is INT64/DOUBLE and DOUBLE is the join of both).

    Runs as a single-scan Expand node (each input row fans out to
    len(value_cols) output rows in the same task) — not a UNION of
    per-column scans, so the source is read once however many columns
    unpivot and column pruning still reaches the scan."""
    return df.select(
        *id_cols, *[F.col(c).cast("double").alias(c) for c in value_cols]
    ).unpivot(list(id_cols), list(value_cols), var_name, value_name)
