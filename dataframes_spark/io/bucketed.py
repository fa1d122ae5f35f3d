"""Bucketed table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the join key. Writing each table bucketed (hash-partitioned into a
fixed number of files per key) moves that shuffle to WRITE TIME, once:
every subsequent join or aggregation on the bucket key reads co-located
buckets and plans with NO Exchange on either side
(``tests/test_plans.py::test_bucketed_join_has_no_exchange`` pins this).

Spark bucketing needs the table catalog (``saveAsTable``), not plain
``save`` — bucket metadata lives in the catalog entry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | Sequence[str],
    num_buckets: int = 32,
    sort_by: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (optionally bucket-sorted) parquet
    table. ``sort_by`` additionally sorts within buckets, which lets
    sort-merge joins skip the per-task sort too."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *cols)
    if sort_by is not None:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata flows from the catalog, so
    joins/aggregations on the bucket key skip their shuffle)."""
    return spark.table(table)


def write_fingerprints(
    fps: DataFrame, table: str, num_buckets: int = 32, mode: str = "overwrite"
) -> None:
    """Persist an incremental-dedup fingerprint store
    (``dedup.content_fingerprints``, flat ``(len, xx, md5)`` schema)
    BUCKETED BY its xxhash64 component. ``exact_dedup_incremental``'s
    anti join uses ``xx`` as its single equi-key, so the bucketed
    store's scan-time partitioning satisfies the join's required
    distribution and the history side never reshuffles — per-batch
    dedup stays O(batch) in shuffle volume as the store grows toward
    1e10 keys (the no-Exchange plan is pinned in tests/test_plans.py)."""
    write_bucketed(fps, table, bucket_by="xx", num_buckets=num_buckets, mode=mode)


def write_lsh_store(
    banded: DataFrame, table: str, num_buckets: int = 32, mode: str = "overwrite"
) -> None:
    """Persist an incremental near-dup LSH store
    (``dedup.lsh_bucket_store``, flat ``(id, band, bucket)`` schema)
    BUCKETED BY ``(band, bucket)``. ``near_dup_incremental``'s candidate
    join uses exactly those equi-keys, so the bucketed store's scan-time
    partitioning satisfies the join's required distribution and the
    history side never reshuffles — per-batch near-dup detection stays
    O(batch) in shuffle volume as the store grows (plan pinned in
    tests/test_plans.py)."""
    write_bucketed(
        banded, table, bucket_by=("band", "bucket"), num_buckets=num_buckets, mode=mode
    )


def read_lsh_store(spark: SparkSession, table: str) -> DataFrame:
    """Read a persisted LSH bucket store (flat ``(id, band, bucket)``) —
    bucket metadata flows from the catalog, so the candidate join's
    ``(band, bucket)`` equi-keys stay co-located. Do NOT project the
    columns through expressions: a projection over the scan discards
    its bucketed output partitioning."""
    return spark.table(table)


def read_fingerprints(spark: SparkSession, table: str) -> DataFrame:
    """Read a persisted fingerprint store (flat ``(len, xx, md5)``) —
    bucket metadata flows from the catalog, so the incremental anti
    join's xx equi-key stays co-located. Do NOT project the columns
    into a struct or reorder them with expressions: a projection over
    the scan discards its bucketed output partitioning."""
    return spark.table(table)
