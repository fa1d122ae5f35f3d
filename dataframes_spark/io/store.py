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


def staging_swap(spark, table: str, merged: DataFrame) -> None:
    """Write ``merged`` to ``<table>__staging`` and atomically (at
    catalog granularity) swap it in as ``table``.

    ``merged`` may read from ``spark.table(table)`` — it is fully
    materialized into staging BEFORE the old table is dropped. Plain
    (non-qualified, default-database) table names only, like every
    store that uses this."""
    staging = f"{table}__staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    _clear_orphan_location(spark, staging)
    merged.write.format("parquet").saveAsTable(staging)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")


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
