"""Writers: format from extension (reference: src/Table.luna:148-149,
native_libs/src/IO/IO.cpp:92-99).

Spark writers are distributed — each partition writes its own file; a
single-file CSV (what the reference produces) needs coalesce(1), which is
only sane for small outputs, so it's opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dataframes_spark.io.readers import detect_format


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
