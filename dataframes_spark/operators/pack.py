"""Sequence packing and chunking for training-data pipelines.

LLM pre-training consumes documents in fixed token-budget context
windows; the two standard preparation steps are CHUNKING (split
over-long documents into window-sized pieces, optionally overlapping)
and PACKING (group short documents so windows are full). Neither exists
in the reference (it predates this workload); both are first-class here
because a 100 TB corpus pipeline runs them over every document.

Scale design:

- ``chunk_text`` is pure JVM expressions (sequence + substring +
  explode): embarrassingly parallel, no shuffle, no Python.
- ``pack_by_cumsum`` assigns pack ids with ONE window cumulative sum —
  a single shuffle on the partition key (or a documented single-reducer
  global form). Deterministic given the ordering column, so retries and
  re-runs produce identical packs. Packs may overflow the budget by at
  most one document (the window rule closes a pack only after the
  boundary is crossed) — the tradeoff for expressing packing without
  sequential state.
- ``pack_greedy`` is the exact first-fit-sequential rule ("close the
  pack when the next document would overflow") — inherently stateful,
  so it runs as an Arrow-batched ``applyInPandas`` kernel over one
  whole group at a time (never a per-batch kernel, whose state would
  reset at Arrow batch seams), the same sanctioned escape hatch as
  sessionize. Oversized single documents get their own pack (callers
  chunk first).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_chars: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into ``chunk_chars``-sized pieces with
    ``overlap`` characters of context carried between consecutive chunks:
    ``(id, chunk_index, chunk)``. Pure expression pipeline — the explode
    fans out JVM-side and every chunk substring is taken directly from
    the parent row, so nothing is shuffled and pushdown/pruning pass
    through to the scan."""
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive, got {chunk_chars}")
    if not 0 <= overlap < chunk_chars:
        raise ValueError(f"overlap must be in [0, chunk_chars), got {overlap}")
    step = chunk_chars - overlap
    # NULL text coalesces to '' so the document still emits its one
    # (empty) chunk — a null length would null the sequence bound and
    # explode would silently DROP the row, losing the id from the output
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(text) - F.lit(overlap)) / F.lit(step)).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        text.alias("__t"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index"),
    ).select(
        "id",
        "chunk_index",
        F.substring(
            F.col("__t"), F.col("chunk_index") * step + 1, chunk_chars
        ).alias("chunk"),
    )


def pack_by_cumsum(
    df: DataFrame,
    size_col: str,
    budget: int,
    order_by: str,
    partition_by: str | None = None,
) -> DataFrame:
    """Assign each row a ``pack_id`` by budget-crossing of the EXCLUSIVE
    running size sum, ordered by ``order_by`` (within ``partition_by`` if
    given): ``pack_id = floor(cumsum_before_row / budget)``.

    SQL-expressible (hence oracle-checkable), fully deterministic.
    Packs can overflow by at most the straddling document; mean
    utilization stays >= 1 - mean_size/budget, which for chunked-first
    corpora (sizes << budget) is near-perfect. With ``partition_by``
    it's one ordinary partitioned window pass. Without, the whole-corpus
    running total rides the DISTRIBUTED global-order lane
    (`global_order.cumsum_global`: per-bucket exclusive sums + a
    bucket-cardinality offsets relation) — no data-bearing
    single-reducer sort at any scale."""
    from pyspark.sql import Window as W

    if partition_by:
        w = W.partitionBy(partition_by).orderBy(order_by)
        cum_before = F.coalesce(
            F.sum(size_col).over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
        out = df.withColumn("pack_id", cum_before)
    else:
        from dataframes_spark.operators.global_order import cumsum_global

        out = cumsum_global(df, size_col, order_by, out_col="pack_id")
    return out.withColumn(
        "pack_id", F.floor(F.col("pack_id") / F.lit(budget)).cast("bigint")
    )


def pack_greedy(
    df: DataFrame,
    size_col: str,
    budget: int,
    order_by: str,
    partition_by: str | None = None,
) -> DataFrame:
    """Exact first-fit-sequential packing: walk rows in ``order_by``
    order, close the current pack whenever adding the next row would
    exceed ``budget`` (a row alone larger than the budget gets its own
    pack). Stateful by definition, so it runs through ``applyInPandas``,
    which hands each group to the kernel as ONE pandas frame — sorted
    once, scanned once; pack state can never reset at an Arrow batch
    seam (``mapInPandas`` splits a partition into ~10k-row batches, so
    a per-batch kernel silently restarts packs mid-partition at corpus
    scale). Without ``partition_by`` the whole input is one group —
    single task, documented; shard first at scale exactly as with
    :func:`pack_by_cumsum`, e.g.::

        sharded = df.withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(1024)))
        pack_greedy(sharded, "n_tokens", budget, order_by="doc_id",
                    partition_by="shard")

    Packs are then exact per shard (the form distributed training uses:
    packs never cross shard boundaries anyway)."""
    from pyspark.sql import types as T

    # fresh StructType — StructType.add mutates in place, and df.schema
    # returns the frame's own cached schema object
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("pack_id", T.LongType())]
    )
    size_idx_col = size_col
    order_col = order_by

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["__g"], errors="ignore")
        pdf = pdf.sort_values(order_col, kind="mergesort")
        sizes = pdf[size_idx_col].to_numpy()
        ids = []
        pack, used = 0, 0
        for s in sizes:
            s = int(s) if s == s else 0  # nulls pack as zero-size
            if used > 0 and used + s > budget:
                pack += 1
                used = 0
            used += s
            ids.append(pack)
        pdf = pdf.copy()
        pdf["pack_id"] = pd.array(ids, dtype="int64")
        return pdf

    if partition_by:
        return df.groupBy(partition_by).applyInPandas(assign, schema=out_schema)
    return (
        df.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(assign, schema=out_schema)
    )


def materialize_packs(
    packed: DataFrame,
    text_col: str,
    id_col: str,
    order_by: str,
    sep: str = "\n\n",
    partition_by: str | None = None,
) -> DataFrame:
    """ONE training row per pack: the pack's documents concatenated in
    ``order_by`` order with ``sep`` between them — the materialization
    step after :func:`pack_by_cumsum` / :func:`pack_greedy` assign
    ``pack_id``. Returns the pack keys plus ``text`` (the packed
    window), ``doc_ids`` (provenance, in concatenation order),
    ``n_docs`` and ``n_chars``.

    Scale shape: one groupBy on the pack keys — the ONLY shuffle, and
    it moves each document's text exactly once. Ordering happens
    inside the aggregation buffer (collect structs, ``array_sort``,
    join) instead of a window sort over the whole corpus; pack groups
    are budget-bounded (~budget chars of text each), so buffers stay
    small no matter the corpus size. NULL texts concatenate as ''
    (mirroring ``chunk_text``'s rule: the document still occupies its
    slot and its id stays in provenance)."""
    keys = ([partition_by] if partition_by else []) + ["pack_id"]
    # array_sort on structs orders by field position: order_by, then id
    # as the deterministic tiebreaker for duplicate order values
    members = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(order_by).alias("o"),
                F.col(id_col).alias("i"),
                F.coalesce(F.col(text_col), F.lit("")).alias("t"),
            )
        )
    )
    return (
        packed.groupBy(*keys)
        .agg(members.alias("__m"))
        .select(
            *keys,
            F.array_join(F.transform("__m", lambda s: s["t"]), sep).alias("text"),
            F.transform("__m", lambda s: s["i"]).alias("doc_ids"),
            F.size("__m").alias("n_docs"),
        )
        .withColumn("n_chars", F.length("text"))
    )


def pack_stats(packed: DataFrame, size_col: str, budget: int) -> DataFrame:
    """Utilization report for a packed frame: one row per pack plus the
    ``fill`` ratio — the monitoring twin every packing job should emit."""
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size_col).alias("total_size"),
        )
        .withColumn("fill", F.round(F.col("total_size") / F.lit(budget), 6))
    )

