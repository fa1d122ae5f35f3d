"""The arbitrary-UDF escape hatch: ``Column.map`` / ``Array.map``.

Reference: element-at-a-time mapping through the FFI, explicitly
"provisional and low-performance" (reference: src/Array.luna:42-47,
src/Column.luna:51-54,127-129 — each element round-trips Luna <-> C++).

Spark-first: a Pandas UDF. Arrow moves a whole batch per call and the
function body is vectorized pandas/numpy, so the per-element overhead the
reference warns about simply doesn't exist — this is the 10-100x-faster
tier of Python UDF, and still only for logic that genuinely can't be a
built-in Column expression (everything in SURVEY §2.3 compiles to
built-ins via functions/lquery.py; use that first).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_column(
    df: DataFrame,
    col: str,
    fn: Callable,
    return_type: str = "double",
    out_name: str | None = None,
) -> DataFrame:
    """``table.each name (x: f x)`` for arbitrary Python ``fn``.

    ``fn`` receives a pandas Series per Arrow batch and must return a
    same-length Series (vectorized). The result is appended as
    ``out_name`` (default ``<col>_map``)."""
    mapped = F.pandas_udf(fn, return_type)(F.col(col))
    return df.withColumn(out_name or f"{col}_map", mapped)


def map_expression(fn: Callable, return_type: str = "double") -> Callable[[Column], Column]:
    """Lift a pandas-Series function into a reusable Column transformer."""
    udf = F.pandas_udf(fn, return_type)

    def apply(c: Column) -> Column:
        return udf(c)

    return apply
