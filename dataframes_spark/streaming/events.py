"""Structured Streaming variants of the event-table operators.

The reference has no streaming at all (SURVEY.md §2.13); these are the
Spark-native streaming counterparts of its batch time-window operators —
same aggregate contract, incremental execution:

- windowed_aggregate: tumbling/sliding event-time windows with a watermark
  (late data beyond the watermark is dropped deterministically);
- sessionize: session windows keyed by user;
- stream_from_directory: file-source stream over the same parquet layout
  the batch path reads, so batch and stream share one schema.

These run identically against a Kafka source by swapping readStream
options; file source keeps the tests hermetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataframes_spark.operators.aggregate import aggregate_exprs


def stream_from_directory(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream: each new parquet file in ``path`` becomes a
    micro-batch. maxFilesPerTrigger bounds batch size for steady latency."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def windowed_aggregate(
    events: DataFrame,
    ts_col: str,
    window: str,
    slide: str | None,
    watermark: str,
    pairs: Sequence[tuple[str, Sequence[str]]],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Event-time windowed aggregation with late-data handling.

    The watermark bounds state: groups older than (max event time -
    watermark) finalize and evict, so state size is O(active windows), not
    O(history) — the property that lets this run forever at 100 TB/day.
    """
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *keys)
        .agg(*aggregate_exprs(pairs))
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def sessionize_batch(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    gap_s: int = 1800,
) -> DataFrame:
    """Batch twin of ``sessionize``: gap-based sessions via lag +
    running-sum of session starts — two window passes inside one
    per-user sort, then a hash aggregate. Same output columns as the
    streaming variant, so batch backfill and live stream reconcile."""
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    gap_us = F.lit(int(gap_s) * 1_000_000)
    new_session = (
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(us - F.unix_micros(F.lag(ts_col).over(w)) > gap_us, 1)
        .otherwise(0)
    )
    with_id = events.withColumn(
        "__sess", F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy(F.col(user_col), F.col("__sess"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("__sess")
    )


def sessionize(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of user inactivity.
    State per active user only, evicted by the watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col(user_col),
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
