"""Writers: format from extension (reference: src/Table.luna:148-149,
native_libs/src/IO/IO.cpp:92-99).

Spark writers are distributed — each partition writes its own file; a
single-file CSV (what the reference produces) needs coalesce(1), which is
only sane for small outputs, so it's opt-in.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataframes_spark.io.readers import detect_format


def _default_num_partitions(df: DataFrame) -> int:
    """``spark.sql.shuffle.partitions`` as an int, falling back to the
    input's current partition count then 200 — some platforms set the
    conf to a non-numeric token (e.g. "auto" under AQE-managed
    shuffles), and int() on it must not make a writer unusable."""
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):
        try:
            return df.rdd.getNumPartitions() or 200
        except Exception:
            return 200


def write_parquet_sized(
    df: DataFrame,
    path: str,
    rows_per_file: int,
    cluster_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet output with bounded file sizes — the 100 TB hygiene knob.
    ``maxRecordsPerFile`` caps each task's output files at
    ``rows_per_file`` rows, so downstream scans see uniform splits
    instead of one multi-GB file per giant task (small files come from
    partition count, big files from this cap; tune both). Optional
    ``cluster_by`` repartitions + sorts within partitions on the given
    keys before writing, so min/max column statistics in the parquet
    footers become selective — scans filtering on those keys skip whole
    row groups (poor man's Z-order for single-key access paths)."""
    out = df
    if cluster_by:
        out = df.repartition(*cluster_by).sortWithinPartitions(*cluster_by)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> None:
    """Hive-style partitioned layout (``path/col=value/...``) with the
    small-files problem solved at write time.

    A naive ``df.write.partitionBy(cols)`` lets EVERY task that holds
    rows for a partition value open its own file there: P shuffle
    partitions x K partition values = up to P*K files — at 100 TB that
    is millions of kilobyte-sized parquet files, and the next scan dies
    on open() overhead and footer reads. This writer pre-shuffles on the
    partition columns first, so each value's rows land on exactly
    ``files_per_partition`` writer tasks and the layout comes out with
    exactly that many files per directory (raise it only for partition
    values too large for one task; a deterministic per-row salt —
    xxhash64 of the row — spreads rows across the N writers).

    ``files_per_partition`` is an UPPER bound: each value's rows are
    salted across exactly that many writer tasks (deterministic xxhash64
    row salt, so reruns produce the same layout), and a task emits one
    file per directory — two of a value's salts hash-colliding into the
    same task merge into one file, so counts land in [1, N], nearly
    always N. For a deterministic file-SIZE bound instead, set
    ``rows_per_file`` (``maxRecordsPerFile``): each value then gets
    ceil(rows / rows_per_file) files regardless of task layout.

    Readers that filter on ``partition_cols`` prune whole directories at
    PLANNING time: the predicate shows up as ``PartitionFilters`` on the
    scan and non-matching directories are never listed, let alone read
    (pinned in tests/test_plans.py). Choose low-cardinality, always-
    filtered columns (ingest date, source, language) — high-cardinality
    partition keys recreate the small-files problem as a directory
    explosion.
    """
    from pyspark.sql import functions as F

    if not partition_cols:
        raise ValueError("write_partitioned: partition_cols must be non-empty")
    rows_per_file = options.pop("rows_per_file", None)
    # explicit numPartitions: REPARTITION_BY_NUM, which AQE will not
    # coalesce — column-only repartition is coalescible, and on a small
    # write AQE merges every shuffle partition into one task, silently
    # collapsing the salted layout back to one file per value
    num = _default_num_partitions(df)
    if files_per_partition <= 1:
        out = df.repartition(num, *partition_cols)
    else:
        # deterministic salt: same data -> same file layout (a rand()
        # salt would make reruns non-reproducible)
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        out = df.withColumn("__fpp_salt", salt).repartition(
            num, *partition_cols, "__fpp_salt"
        ).drop("__fpp_salt")
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    if rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(rows_per_file))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.format(fmt).save(path)


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    key_col: str = "__z",
    accuracy: int = 10_000,
) -> DataFrame:
    """Add a Morton (Z-order) key over ``cols``: each column is
    rank-bucketed into ``2**bits`` quantile bands and the band indices'
    bits are interleaved into one long. Rows close on the Z-curve are
    close in EVERY listed column at once — the multi-column locality
    that single-key clustering cannot give (sorting by col A leaves
    col B uniformly scattered across every file).

    Quantile banding (not min/max width) so value skew cannot collapse
    the curve: a heavy hitter occupies many bands of rank space instead
    of one band of value space. Boundaries come from ONE
    ``percentile_approx`` aggregate (bounded-memory sketch — this keys a
    LAYOUT, approximation cannot change any answer) and ride into the
    plan as a broadcast 1-row frame, exactly like ``stats.qcut``; band
    assignment is a map-only JVM fold, bit interleaving pure integer
    expressions — no Python, no extra shuffle. NULL values band to 0
    (nulls cluster first along their column's axis)."""
    cols = list(cols)
    if not 2 <= len(cols) <= 8:
        raise ValueError(
            f"zorder needs 2-8 columns (1 column is plain clustering — "
            f"use write_parquet_sized(cluster_by=...)), got {cols!r}"
        )
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) must be in [1, 63] to fit a long, got "
            f"{bits}*{len(cols)}"
        )
    if key_col in df.columns:
        raise ValueError(f"key column {key_col!r} collides with input")
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    bounds = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs, accuracy).alias(
                f"__zb_{j}"
            )
            for j, c in enumerate(cols)
        ]
    )
    out = df.crossJoin(F.broadcast(bounds))
    band_arrays = [F.col(f"__zb_{j}") for j in range(len(cols))]
    z = _interleave_bands(cols, bits, band_arrays)
    return out.select(*df.columns, z.alias(key_col))


def _band_search(v: Column, arr: Column, m: int) -> Column:
    """Rank band of ``v`` against a SORTED boundary array: the count of
    boundaries <= v (equivalently, the upper-bound binary-search index),
    as a depth-ceil(log2(m+1)) nested-CASE tree — ~6 comparisons per row
    for 64 bands instead of the 63-step linear ``aggregate`` fold this
    replaced (guide §1.2 per-task work: the fold was the dominant cost of
    the z-order write, and it is evaluated TWICE — once by the range
    partitioner's sampling pass and once by the real exchange).
    ``F.get`` (0-based, out-of-bounds/NULL-array safe under ANSI mode)
    makes a NULL or short array fall through every comparison to band 0,
    matching the old fold's ``coalesce(.., 0)`` NULL rule."""

    def go(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        # band >= mid  <=>  v >= arr[mid-1]  (sorted boundaries)
        return F.when(v >= F.get(arr, mid - 1), go(mid, hi)).otherwise(
            go(lo, mid - 1)
        )

    return go(0, m)


def _interleave_bands(
    cols: Sequence[str],
    bits: int,
    band_arrays: Sequence[Column],
    lengths: Sequence[int] | None = None,
) -> Column:
    """Morton key from per-column boundary arrays: rank-band each value
    (count of boundaries <= v, a binary-search CASE tree; NULL bands to
    0), then interleave the band indices' bits. Shared by the lazy
    broadcast lane (`with_zorder_key`) and the literal-bounds write lane
    (`write_zordered`, which passes the true per-column boundary-array
    ``lengths`` — they can be shorter than 2**bits-1 for degenerate
    inputs)."""
    k = len(cols)
    m_default = (1 << bits) - 1
    z: Column = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.col(c).cast("double")
        m = lengths[j] if lengths is not None else m_default
        band = _band_search(v, band_arrays[j], m).cast("long")
        for bit in range(bits):
            z = z + F.shiftleft(
                F.shiftright(band, bit).bitwiseAND(F.lit(1)), bit * k + j
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    n_files: int | None = None,
    rows_per_file: int | None = None,
    mode: str = "overwrite",
    accuracy: int | None = None,
) -> None:
    """Z-order-clustered parquet: range-partition + sort on the Morton
    key of ``cols`` (`with_zorder_key`), then write. The public prior
    art is Delta Lake's OPTIMIZE ZORDER BY; this is the same layout
    idea expressed as a plain one-pass Spark write.

    Why it matters at 100 TB: parquet scans skip row groups whose
    footer min/max excludes the predicate. After this write, every file
    covers a small Z-range — a narrow rectangle in ALL ``cols`` at once
    — so selective filters on ANY of them (or any conjunction) skip
    most files outright, where single-key clustering only serves its
    one key. The write costs one range-exchange of the data (the same
    shuffle any explicit layout costs); ``repartitionByRange`` samples
    the key so output files are even-sized even under skew. Layout
    only: the row CONTENT is byte-identical to the input (hash-verified
    by the roundtrip driver row).

    The quantile boundaries are collected FIRST and embedded as literal
    arrays (driver-tiny by construction: (2^bits - 1) doubles per
    column) rather than riding as `with_zorder_key`'s broadcast
    aggregate: ``repartitionByRange`` runs a separate key-sampling job
    before the write, and with the aggregate in the plan that job
    re-runs the whole percentile pass — measured ~40% of the write's
    wall-clock at sf0.1. With literal bounds the sampler evaluates only
    the cheap band fold. Use `with_zorder_key` directly when a lazy,
    action-free transformation is needed."""
    cols = list(cols)
    if not 2 <= len(cols) <= 8:
        raise ValueError(f"zorder needs 2-8 columns, got {cols!r}")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) must be in [1, 63] to fit a long, got "
            f"{bits}*{len(cols)}"
        )
    if "__z" in df.columns:
        raise ValueError("key column '__z' collides with input")
    n = 1 << bits
    # boundaries key a LAYOUT, so they only need to be accurate relative
    # to the band width 1/n: 32 sketch units per band (rank error
    # band_width/32) is far inside what file-skipping can perceive, and
    # the percentile pass is ~2x cheaper than the old fixed 10_000 at
    # bits=6 (guide §1.2: don't compute precision you throw away)
    if accuracy is None:
        accuracy = max(1_000, 32 * n)
    qs = [i / n for i in range(1, n)]
    brow = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs, accuracy).alias(
                f"__zb_{j}"
            )
            for j, c in enumerate(cols)
        ]
    ).first()
    band_arrays = []
    lengths = []
    for j in range(len(cols)):
        vals = brow[j] if brow is not None and brow[j] is not None else []
        vals = vals or [float("inf")]  # empty/all-null input: band 0
        band_arrays.append(F.array(*[F.lit(float(b)) for b in vals]))
        lengths.append(len(vals))
    keyed = df.select(
        *df.columns,
        _interleave_bands(cols, bits, band_arrays, lengths).alias("__z"),
    )
    num = n_files or _default_num_partitions(df)
    out = (
        keyed.repartitionByRange(num, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.mode(mode)
    if rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(rows_per_file))
    writer.parquet(path)


def write_auto(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False, **options) -> None:
    fmt = detect_format(path)
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if fmt == "csv":
        # RFC-4180 quoting: escaped quote is a doubled quote, matching the
        # reference's CSV generator (csv.cpp:270-459) and our reader
        writer = writer.option("header", options.pop("header", True)).option("escape", '"')
    for k, v in options.items():
        writer = writer.option(k, v)
    if fmt == "feather":
        # Arrow IPC has no distributed Spark writer; collect through Arrow
        # on the driver (the reference's feather files are single-machine
        # artifacts by definition — small data only)
        import pyarrow.feather as pf

        pf.write_feather(out.toArrow(), path)
        return
    if fmt == "xlsx":
        # self-contained stdlib SpreadsheetML writer (io/xlsx.py) — no
        # openpyxl; driver-side by design with a max_rows guard (a
        # spreadsheet is a single-machine artifact; Excel caps ~1M rows)
        from dataframes_spark.io.xlsx import write_xlsx

        write_xlsx(out, path)
        return
    writer.format(fmt).save(path)
