"""Scale-gated scan spreading for compute-dense lanes.

A parquet scan's parallelism is bounded by its files' ROW-GROUP layout:
byte-range splitting cannot cut inside a row group, so a small table
written as one file with one row group scans as ONE task no matter how
many cores the session has. For IO-shaped queries that is irrelevant —
the scan is cheap either way — but the corpus featurizers in this repo
(md5 n-gram bucketing, shingling, tokenize-and-explode lanes) put their
per-row compute INSIDE the scan stage (Project/Generate collapse into
it), so a single-row-group input serializes the most compute-dense part
of the query onto one core (guide §2.5: one huge unsplittable input
file — repartition immediately after the read).

``spread_small_scan`` inserts a round-robin repartition to session
parallelism ONLY when the optimizer's size estimate says the relation
is small (below ``_SPREAD_BYTES_PER_CORE`` per core, i.e. exactly when
the repartition itself is cheap); a corpus-scale relation — whose scan
already carries thousands of natural splits — passes through untouched,
so nothing is ever shuffled at 100 TB that was not shuffled before. The
gate is the same construction-time plan-stats probe `default_buckets`
uses (cheap, runs no jobs, plan-pure).

Every consumer of this helper is partitioning-independent by
construction (the md5-lane contract: results are a pure function of the
input multiset), so spreading only steers load.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: size-estimate budget per core under which a relation counts as
#: "small" (the repartition moves at most cores x this many bytes —
#: trivial locally, bounded on a cluster, and exactly the inputs whose
#: natural scan parallelism can be row-group-bound). Override with
#: SPARK_GRAFT_SPREAD_BYTES_PER_CORE (0 disables spreading).
_SPREAD_BYTES_PER_CORE = int(
    os.environ.get("SPARK_GRAFT_SPREAD_BYTES_PER_CORE", 16 * 1024 * 1024)
)


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the session's shuffle
    parallelism when its plan-estimated size is small enough that a
    single-row-group file could be (and a repartition is cheap); return
    ``df`` unchanged otherwise. Apply to the PROJECTED relation (id +
    text, not the full row) right before a compute-dense explode."""
    if _SPREAD_BYTES_PER_CORE <= 0:
        return df
    try:
        cores = max(
            2, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        )
    except (ValueError, TypeError):
        return df
    try:
        # enough files to feed every core -> the scan parallelizes on
        # its own, whatever the sizes (pure plan metadata, no job).
        # Non-file inputs report zero files: createDataFrame already
        # parallelizes, and mid-pipeline relations have exchanges.
        nfiles = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — no plan handle: leave untouched
        return df
    if nfiles == 0 or nfiles >= cores:
        return df
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # noqa: BLE001 — no estimate (e.g. Connect): skip
        return df
    if size < cores * _SPREAD_BYTES_PER_CORE:
        return df.repartition(cores)
    return df
