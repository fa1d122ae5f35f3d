"""Range (interval) join — an operator Spark lacks natively.

``points.join(intervals, point BETWEEN start AND end)`` has no equi-key,
so Catalyst plans a broadcast-nested-loop (or cartesian) join: every
point is tested against every interval — O(|P| x |I|), hopeless at scale.

This implementation is the bucketized equi-join form:

1. pick a bucket width ``w`` (in the units of the join column);
2. each point maps to bucket ``floor(v / w)``;
3. each interval EXPLODES to every bucket it overlaps
   (``sequence(floor(start/w), floor(end/w))`` — short for intervals
   near ``w`` long);
4. equi-join on (bucket [, extra keys]) — a plain shuffled/broadcast hash
   join Catalyst knows how to optimize — then a residual filter applies
   the exact bounds.

Cost: one shuffle of |P| + |I| x avg_buckets rows on the bucket key.
Choose ``w`` near the typical interval length so intervals explode to
~2 buckets. Timestamp columns are bucketed on their microsecond value;
the residual filter still compares the original columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bucket_val(df: DataFrame, col: str) -> Column:
    """Numeric view of a column for bucket arithmetic (timestamps -> us)."""
    if isinstance(df.schema[col].dataType, T.TimestampType):
        return F.unix_micros(F.col(col)).cast("double")
    return F.col(col).cast("double")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    extra_on: Sequence[str] = (),
    bounds: str = "[)",
) -> DataFrame:
    """Inner-join each point row to every interval row containing it:
    ``start <= point < end`` (``bounds="[)"``, default) or
    ``start <= point <= end`` (``bounds="[]"``), optionally also matching
    ``extra_on`` equality keys. Column names must not collide across the
    two inputs (rename before joining). ``bucket_width`` is in the join
    column's units — seconds x 1e6 for timestamps.
    """
    if bounds not in ("[)", "[]"):
        raise ValueError(f"bounds must be '[)' or '[]', got {bounds!r}")
    overlap = set(points.columns) & set(intervals.columns) - set(extra_on)
    if overlap:
        raise ValueError(f"column collision between inputs: {sorted(overlap)}")

    w = float(bucket_width)
    p = points.withColumn("__bucket", F.floor(_bucket_val(points, point_col) / w))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(_bucket_val(intervals, start_col) / w),
                F.floor(_bucket_val(intervals, end_col) / w),
            )
        ),
    )
    on = ["__bucket", *extra_on]
    pt, lo, hi = F.col(point_col), F.col(start_col), F.col(end_col)
    residual = (pt >= lo) & ((pt < hi) if bounds == "[)" else (pt <= hi))
    return p.join(i, on=on, how="inner").filter(residual).drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    extra_on: Sequence[str] = (),
    bounds: str = "[)",
) -> DataFrame:
    """Inner-join every pair of OVERLAPPING intervals — the two-sided
    sibling of :func:`range_join` (the multimodal-alignment shape: audio
    segments x transcript spans, shot boundaries x caption windows).

    Same bucketized equi-join strategy: BOTH sides explode to every
    bucket their interval touches, the bucket (+ ``extra_on``) equi-join
    meets candidates, and the exact overlap predicate
    (``l_start < r_end AND r_start < l_end``, closed-end variant with
    ``bounds="[]"``) filters residually. An overlapping pair shares at
    least one bucket, so recall is exact; a pair overlapping across k
    shared buckets would join k times, so the bucket-join keeps each
    side's bucket index and the residual keeps only the FIRST shared
    bucket (``greatest(floor(l_start/w), floor(r_start/w))``) — dedup by
    arithmetic, no distinct shuffle.

    Cost: one shuffle of ``(|L| + |R|) x avg_buckets_per_interval`` rows.
    Choose ``bucket_width`` near the typical interval length so each
    side explodes to ~2 buckets."""
    if bounds not in ("[)", "[]"):
        raise ValueError(f"bounds must be '[)' or '[]', got {bounds!r}")
    overlap = set(left.columns) & set(right.columns) - set(extra_on)
    if overlap:
        raise ValueError(f"column collision between inputs: {sorted(overlap)}")

    w = float(bucket_width)
    lb_lo = F.floor(_bucket_val(left, left_start) / w)
    lb_hi = F.floor(_bucket_val(left, left_end) / w)
    rb_lo = F.floor(_bucket_val(right, right_start) / w)
    rb_hi = F.floor(_bucket_val(right, right_end) / w)
    l = left.withColumn("__lb_lo", lb_lo).withColumn(
        "__bucket", F.explode(F.sequence(lb_lo, lb_hi))
    )
    r = right.withColumn("__rb_lo", rb_lo).withColumn(
        "__bucket", F.explode(F.sequence(rb_lo, rb_hi))
    )
    on = ["__bucket", *extra_on]
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    if bounds == "[)":
        overlaps = (ls < re_) & (rs < le)
    else:
        overlaps = (ls <= re_) & (rs <= le)
    first_shared = F.greatest(F.col("__lb_lo"), F.col("__rb_lo"))
    return (
        l.join(r, on=on, how="inner")
        .filter(overlaps & (F.col("__bucket") == first_shared))
        .drop("__bucket", "__lb_lo", "__rb_lo")
    )
