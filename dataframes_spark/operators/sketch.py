"""Count-min sketch: mergeable sublinear frequency estimation.

The Cormode-Muthukrishnan CMS (J. Algorithms 55, 2005): ``depth``
pairwise-independent hash rows of ``width`` counters; an item's count
adds 1 to one counter per row, its estimate is the MIN over its ``depth``
counters. Guarantees: estimate >= true count always (only collisions
inflate, nothing deflates), and with width w the overestimate exceeds
2N/w with probability <= 2^-depth (N = stream length).

Why it belongs in a 100 TB engine: an EXACT `groupBy(col).count()`
shuffles one row per distinct key — at corpus scale a token/URL/IP
column has billions of keys and the aggregation state is the problem.
The sketch's state is ``depth x width`` counters NO MATTER the
cardinality, the per-partition partial aggregation is the classic
map-side combine (each partition contributes at most depth*width rows
to the shuffle), and two sketches over disjoint data MERGE by cell-wise
addition (`cms_merge`) — the property that makes it incremental:
sketch today's batch, add it to the store, never rescan history.

Representation: a sketch IS a DataFrame ``(d, bucket, cnt)`` holding the
non-zero cells — absent cells are zero, so estimation coalesces misses
to 0. Hash lanes mirror the dedup family: ``xxhash64`` (fast JVM path)
or ``md5`` (hash-verifiable in any engine with md5 — the driver oracle
replicates the whole sketch, cell for cell, in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, row: int, width: int, lane_hash: str) -> Column:
    """Bucket of ``col`` under hash row ``row``: pmod(h_row(col), width).
    Each row prepends a distinct tag, so rows are independent hashes of
    the same value; md5's 15 hex chars (60 bits) keep the conv() exact
    (16 would overflow a signed long)."""
    if lane_hash == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(row), col), F.lit(width))
    if lane_hash == "md5":
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{row}:"), col.cast("string")).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(width))
    raise ValueError(f"lane_hash must be xxhash64|md5, got {lane_hash!r}")


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    lane_hash: str = "xxhash64",
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch ``df[col]`` into a ``(d, bucket, cnt)`` cell frame.

    One scan: each value explodes to its ``depth`` (row, bucket) cells
    map-side, then ONE hash aggregation whose partial combine bounds any
    partition's shuffle contribution at depth*width rows — the exchange
    carries sketch cells, never values. NULLs are skipped (a null key
    has no frequency). ``weight_col`` sketches a weighted stream
    (e.g. pre-aggregated counts)."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2, got {depth}x{width}")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = df.filter(F.col(col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        _bucket(F.col(col), i, width, lane_hash).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__c"),
        w.alias("__w"),
    )
    return (
        cells.select("__c.d", "__c.bucket", "__w")
        .groupBy("d", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shaped sketches (the mergeability that
    makes CMS incremental: union the cell frames, re-aggregate)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    lane_hash: str = "xxhash64",
) -> DataFrame:
    """Estimated count for every row of ``items[col]``: min over the
    item's ``depth`` cells, absent cells = 0. The sketch side is
    depth*width rows at most — it BROADCASTS, so estimation never
    shuffles the (possibly huge) item frame."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        _bucket(F.col(col), i, width, lane_hash).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__c"),
    ).select(F.col(col), "__c.d", "__c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_store_update(spark, table: str, batch_sketch: DataFrame) -> dict:
    """Fold a batch's sketch into a persisted CMS store (catalog parquet
    table, same staging-swap idiom as ``io.bucketed.compact_store``) —
    the incremental-epoch loop: sketch each arriving batch (one scan of
    the batch, never of history), ``cms_merge`` it with the stored
    cells, swap. The store is AT MOST depth*width rows no matter how
    many epochs fold in, so the update is a constant-size job and the
    store never needs compaction. Not transactional: run between
    increments, like the other stores. Returns ``{"cells", "total"}``
    (non-zero cells and the stream length folded so far — cnt sums in
    any one hash row equal the total stream length)."""
    from py4j.protocol import Py4JError
    from pyspark.sql.utils import AnalysisException

    try:
        existing = spark.table(table)
        merged = cms_merge(existing, batch_sketch)
    except (AnalysisException, Py4JError):
        merged = batch_sketch
    staging = f"{table}__staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    merged.write.format("parquet").saveAsTable(staging)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    out = spark.table(table)
    cells = out.count()
    total = (
        out.filter(F.col("d") == 0).agg(F.sum("cnt").alias("t")).first()["t"]
    )
    return {"cells": cells, "total": int(total or 0)}


def cms_store_read(spark, table: str) -> DataFrame:
    """Read a persisted CMS cell store (``(d, bucket, cnt)``) for
    `cms_estimate` / `heavy_hitters` probing."""
    return spark.table(table)


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    depth: int = 4,
    width: int = 2048,
    lane_hash: str = "xxhash64",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Values whose estimated frequency is >= ``min_count`` —
    ``(value_col, est)``. CMS never under-counts, so NO true heavy
    hitter is missed (one-sided error: collision-inflated light keys
    can appear; raise ``width`` to thin them).

    ``candidates`` scopes which values are reported. Default: the
    distinct values of ``df[col]`` — exact, but it shuffles one row per
    distinct key, which is precisely what the sketch exists to avoid;
    at corpus scale pass a candidate frame from a cheap source instead
    (a deterministic sample — operators/sample.py sample_md5 — or last
    epoch's heavy hitters): any candidate set containing the true heavy
    keys preserves the no-miss guarantee."""
    sk = cms_build(df, col, depth, width, lane_hash)
    cand = (candidates or df).select(col).filter(F.col(col).isNotNull()).distinct()
    est = cms_estimate(sk, cand, col, depth, width, lane_hash)
    return est.filter(F.col("est") >= min_count)
