"""Shared staging-swap for the persisted sketch/histogram stores.

Every incremental store (CMS / HLL / bottom-k / weighted sample / PCA
moments / numeric, multi-column and categorical histograms) folds a
batch with the same idiom: materialize the merged frame into
``<table>__staging`` (reading the CURRENT store), then drop the store
and rename staging over it — readers see either the old store or the
new one, never a partial write.

This module owns the one fragile step: a fold that crashes INSIDE the
staging write (upstream evaluation error, executor loss) leaves an
uncataloged staging DIRECTORY behind. ``DROP TABLE IF EXISTS`` cannot
see it (it is not in the catalog) and ``saveAsTable`` then refuses the
location (``LOCATION_ALREADY_EXISTS``) — one crashed fold would brick
the store forever. ``staging_swap`` clears such an orphan through the
Hadoop FileSystem API (any scheme the session can reach) before
writing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def staging_swap(
    spark,
    table: str,
    merged: DataFrame,
    bucket_by=None,
    num_buckets: int = 32,
) -> None:
    """Write ``merged`` to ``<table>__staging`` and atomically (at
    catalog granularity) swap it in as ``table``.

    ``merged`` may read from ``spark.table(table)`` — it is fully
    materialized into staging BEFORE the old table is dropped. Plain
    (non-qualified, default-database) table names only, like every
    store that uses this. With ``bucket_by`` the staging table is
    written BUCKETED (catalog bucket metadata survives the rename), for
    stores whose read-side joins must never reshuffle."""
    staging = f"{table}__staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    _clear_orphan_location(spark, staging)
    if bucket_by is not None:
        cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
        merged.write.format("parquet").bucketBy(num_buckets, *cols).saveAsTable(
            staging
        )
    else:
        merged.write.format("parquet").saveAsTable(staging)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")


def compact_swap_store(spark, table: str, num_files: int = 1) -> dict:
    """Rewrite a staging-swap store to ``num_files`` files.

    Swap stores (funnel stage state, transitions counts + last-event,
    the sketch/histogram/DSIR stores) are SELF-compacting in data —
    every fold rewrites the whole table — but each rewrite emits one
    file per write task, so a store folded with many shuffle partitions
    carries that many near-empty files forever. One coalesced rewrite
    (same staging-swap safety: readers see old or new, never partial)
    bounds scan setup for serving reads. Contents are untouched —
    report-invariance is pinned in tests. Returns ``{"files_before",
    "files_after", "rows"}``."""
    from pyspark.sql import functions as F

    df = spark.table(table)
    files_before = df.select(F.input_file_name()).distinct().count()
    rows = df.count()
    staging_swap(spark, table, df.coalesce(max(1, num_files)))
    out = spark.table(table)
    files_after = out.select(F.input_file_name()).distinct().count()
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
    }


def drop_table_and_location(spark, table: str) -> None:
    """DROP TABLE IF EXISTS plus orphan-location cleanup: a fresh
    session's in-memory catalog does not know tables a PREVIOUS process
    left in the warehouse directory, so the DROP is a no-op and
    ``saveAsTable``/RENAME then refuse the location. Queries that
    rebuild a deterministically-named store each run start with this."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    _clear_orphan_location(spark, table)


def _clear_orphan_location(spark, staging: str) -> None:
    """Remove a staging DIRECTORY orphaned by a crashed fold (present
    on disk, absent from the catalog — the DROP above was a no-op)."""
    try:
        jvm = spark._jvm
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        path = jvm.org.apache.hadoop.fs.Path(warehouse, staging.lower())
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    except Exception:  # noqa: BLE001 — no JVM handle (Spark Connect):
        # fall through; saveAsTable will raise its own clear error if an
        # orphan actually blocks the location
        pass
