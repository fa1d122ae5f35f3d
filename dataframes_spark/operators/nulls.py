"""Null-handling operators: dropNa, fillNa, interpolate.

Reference: ``dropNa``/``dropNaAt`` (reference: src/Table.luna:972-997,
engine native_libs/src/Processing.cpp:376-402), ``fillNa``/``fillNaAt``
with per-type value coercion (src/Table.luna:1019-1048, Processing.cpp:
404-495) and linear ``interpolate`` (src/Table.luna:1071-1072,
Processing.cpp:271-321,341-374).

dropna/fillna map directly onto Spark's ``DataFrameNaFunctions`` (pure
Catalyst). Interpolation is the interesting one — see ``interpolate``.
"""

from __future__ import annotations

import re as _re
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def drop_na(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Drop rows with a null in any (or the given) columns."""
    return df.dropna(subset=list(subset) if subset else None)


def fill_na(df: DataFrame, value, subset: Sequence[str] | None = None) -> DataFrame:
    """Fill nulls with per-column value COERCION, like the reference's
    ConvertTo pass (Processing.cpp:561-609): a string "5" fills an int64
    column as 5, a number fills a string column as its text form. Spark's
    own ``fillna`` silently skips type-mismatched columns instead, so the
    fill is an explicit typed ``coalesce`` per column. An unparseable
    string for a numeric column raises (the reference throws too)."""
    cols = set(subset) if subset else set(df.columns)
    dtypes = dict(df.dtypes)
    integral = ("int", "bigint", "smallint", "tinyint")
    probed: dict[str, bool] = {}  # one cast probe per distinct dtype
    if isinstance(value, str):
        for c in cols:
            if dtypes[c].startswith(integral):
                # lit("5.5").cast(bigint) is NULL in non-ANSI Spark, which
                # would silently leave nulls unfilled; the reference's
                # ConvertTo throws instead (Processing.cpp:561-609). Python's
                # int() is LOOSER than Spark's cast — it accepts '5_000' and
                # unicode digits that Spark maps to NULL — so validate with
                # the exact ASCII-decimal grammar Spark's cast accepts.
                if not _re.fullmatch(r"[+-]?[0-9]+", value.strip()):
                    raise ValueError(
                        f"cannot coerce fill value {value!r} to integral column {c!r}"
                    )
            elif dtypes[c].startswith(("double", "float", "decimal")):
                # same looseness hazard: float('5_0.5') parses but Spark's
                # cast nulls it — reject underscored literals explicitly
                try:
                    if "_" in value:
                        raise ValueError(value)
                    float(value)
                except ValueError:
                    raise ValueError(
                        f"cannot coerce fill value {value!r} to numeric column {c!r}"
                    ) from None
            elif dtypes[c].startswith(("timestamp", "date", "boolean")):
                # for non-numeric typed columns the hazard is mode-dependent
                # (non-ANSI: cast -> NULL -> silent no-op fill; ANSI: a raw
                # DateTimeException at action time) and there is no cheap
                # driver-side grammar twin of Spark's parser; probe with
                # try_cast on a literal-only plan (no data scan, constant-
                # folded, never throws) so an unparseable fill raises ONE
                # clear ValueError up front under either mode
                if dtypes[c] not in probed:
                    probe = df.sparkSession.range(1).select(
                        F.lit(value).try_cast(df.schema[c].dataType).alias("v")
                    )
                    probed[dtypes[c]] = probe.first()["v"] is not None
                if not probed[dtypes[c]]:
                    raise ValueError(
                        f"cannot coerce fill value {value!r} to {dtypes[c]} column {c!r}"
                    )
    elif isinstance(value, float) and not value.is_integer():
        for c in cols:
            if dtypes[c].startswith(integral):
                raise ValueError(
                    f"cannot coerce non-integer fill value {value!r} to integral column {c!r}"
                )
    exprs = [
        F.coalesce(F.col(c), F.lit(value).cast(df.schema[c].dataType)).alias(c)
        if c in cols
        else F.col(c)
        for c in df.columns
    ]
    return df.select(*exprs)


def interpolate(
    df: DataFrame,
    cols: Sequence[str],
    order_by: str,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Linear interpolation of nulls in numeric columns over an explicit
    ordering (the reference interpolates in implicit row order,
    Processing.cpp:271-321; distributed execution needs the order named).

    Edge rules kept from the reference (tests: native_libs/test/
    Tests.cpp:1023-1033): leading nulls take the first valid value,
    trailing nulls take the last valid value; an all-null column is
    returned unchanged (Processing.cpp:345-350).

    Plan shape: two window passes (last-valid-before and first-valid-after)
    plus a positional lerp between them — all built-in window aggregates,
    no UDF. With ``partition_by`` the windows are per-partition and scale
    horizontally; WITHOUT it (and an orderable numeric/timestamp key) the
    call routes through the distributed global-order lane
    (``global_order.interpolate_global``: per-bucket windows + a tiny
    cross-bucket edge carry) instead of a single-reducer sort.
    """
    if not partition_by:
        from dataframes_spark.operators import global_order as go

        if go.is_bucketable(df, order_by):
            return go.interpolate_global(df, list(cols), order_by)
    parts = list(partition_by) if partition_by else []
    base = W.partitionBy(*parts).orderBy(order_by) if parts else W.orderBy(order_by)
    w_back = base.rowsBetween(W.unboundedPreceding, 0)
    # next-valid via `last` over the DESC-ordered growing frame: Spark's
    # unbounded-FOLLOWING frame re-aggregates from scratch per row
    # (O(rows^2) per partition), the growing frame is incremental
    rev = (
        W.partitionBy(*parts).orderBy(F.col(order_by).desc())
        if parts
        else W.orderBy(F.col(order_by).desc())
    )
    w_fwdr = rev.rowsBetween(W.unboundedPreceding, 0)

    out = df.withColumn("__pos", F.row_number().over(base))
    for c in cols:
        val = F.col(c).cast("double")
        pos = F.col("__pos")
        prev_val = F.last(val, ignorenulls=True).over(w_back)
        next_val = F.last(val, ignorenulls=True).over(w_fwdr)
        prev_pos = F.last(F.when(val.isNotNull(), pos), ignorenulls=True).over(w_back)
        next_pos = F.last(F.when(val.isNotNull(), pos), ignorenulls=True).over(w_fwdr)
        lerp = prev_val + (next_val - prev_val) * (pos - prev_pos) / (next_pos - prev_pos)
        filled = (
            F.when(val.isNotNull(), val)
            .when(prev_val.isNull(), next_val)   # leading nulls <- first valid
            .when(next_val.isNull(), prev_val)   # trailing nulls <- last valid
            .otherwise(lerp)
        )
        out = out.withColumn(c, filled)
    return out.drop("__pos")
