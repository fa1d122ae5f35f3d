"""Upsert (merge) between two same-schema frames — the table-maintenance
primitive every incremental pipeline needs and the reference lacks
(its tables are immutable in-memory artifacts; see SURVEY §2's absent
rows). Spark-first shape: one full-outer join on the key, per-column
coalesce(updates, base) — no driver loops, no row-at-a-time logic.
At scale this is a single co-partitioned shuffle on the key; when the
updates side is small (the common incremental case) Catalyst broadcasts
it and the base never shuffles at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, key_col: str) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``base``; new keys in
    ``updates`` are inserted; all other ``base`` rows pass through.
    Frames must share a schema. Column-level semantics are whole-row
    replacement (not per-column patching): a null in an update row
    overwrites a non-null base value, matching SQL MERGE's UPDATE SET *.

    Precondition: ``key_col`` must be unique within ``updates`` (SQL
    MERGE raises on multi-match; here a duplicated update key would fan
    the matched base row out once per duplicate). Dedupe first —
    ``exact_dedup``/``dropDuplicates`` — when ingesting raw feeds. The
    check is not performed inline because it would force an extra
    aggregation over the updates on every call.
    """
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(base.columns)} vs "
            f"updates {sorted(updates.columns)}"
        )
    b = base.alias("b")
    u = updates.alias("u")
    joined = b.join(u, F.col(f"b.{key_col}") == F.col(f"u.{key_col}"), "full_outer")
    take_update = F.col(f"u.{key_col}").isNotNull()
    cols = [
        F.when(take_update, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        for c in base.columns
    ]
    return joined.select(*cols)
