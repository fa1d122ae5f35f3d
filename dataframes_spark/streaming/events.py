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
