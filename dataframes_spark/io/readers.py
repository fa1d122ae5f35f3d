"""Readers: format auto-detection + CSV with reference-style type inference.

Reference: ``Table.read`` sniffs the file signature then fallback-parses in
XLSX -> Feather -> CSV order (reference: native_libs/src/IO/IO.cpp:83-90,
signature sniffing IO.cpp:182-216). Its CSV parser infers per-column types
with precedence TIMESTAMP > INT64 > DOUBLE > STRING and conflict rules
(csv.cpp:30-41,153-188): TIMESTAMP + anything-else -> STRING, any STRING ->
STRING, else DOUBLE over INT64; an empty cell marks the column nullable.

Spark-first: sniff only the first few bytes driver-side (cheap, one small
read), then hand the path to ``spark.read.<format>`` so the actual data
flows through Spark's distributed, vectorized readers. Parquet replaces
Feather as the idiomatic columnar format (both are Arrow-compatible
columnar; parquet scans support predicate pushdown + partition pruning).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# magic-byte signatures (reference: IO/IO.cpp:182-216, Feather.cpp:10-13)
_SIGNATURES = [
    (b"PAR1", "parquet"),
    (b"FEA1", "feather"),
    (b"PK\x03\x04", "xlsx"),  # xlsx is a zip container
    (b"ORC", "orc"),
    (b"Obj\x01", "avro"),
]

_EXTENSIONS = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".txt": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".orc": "orc",
    ".feather": "feather",
    ".xlsx": "xlsx",
}


def detect_format(path: str) -> str:
    """Extension first, magic bytes as fallback, CSV as last resort —
    the reference's sniff-then-fallback-parse chain (IO.cpp:83-90)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in _EXTENSIONS:
        return _EXTENSIONS[ext]
    try:
        head = open(path, "rb").read(8)
    except (OSError, IsADirectoryError):
        return "parquet"  # directories: assume a parquet dataset
    for sig, fmt in _SIGNATURES:
        if head.startswith(sig):
            return fmt
    return "csv"


def read_auto(spark: SparkSession, path: str, **options) -> DataFrame:
    fmt = detect_format(path)
    if fmt == "csv":
        return read_csv(spark, path, **options)
    if fmt == "feather":
        return _read_feather(spark, path)
    if fmt == "xlsx":
        return _read_xlsx(spark, path)
    return spark.read.format(fmt).load(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer: bool = True,
    **options,
) -> DataFrame:
    """CSV with Spark's distributed parser. ``inferSchema`` gives the
    reference's INT64/DOUBLE/STRING precedence; timestamp inference is
    enabled to match its TIMESTAMP-first rule (csv.cpp:153-188).
    RFC-4180 quoting/escaping/multiline handled by the multiLine option."""
    reader = (
        spark.read.option("header", header)
        .option("inferSchema", infer)
        .option("multiLine", True)
        .option("escape", '"')
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("inferTimestamp", True)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    if infer:
        df = _conform_reference_types(df)
    return df


def _conform_reference_types(df: DataFrame) -> DataFrame:
    """Post-inference conformance pass: the reference's numeric types are
    exactly INT64 and DOUBLE (src/Types.luna:7-172; deduction
    csv.cpp:153-188), so narrower widths Spark may infer are upcast.
    Everything else (string fallback on mixed columns, timestamp-first,
    empty->null) already matches Spark's inference behavior."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    casts = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType)):
            casts.append(F.col(f.name).cast("long").alias(f.name))
            changed = True
        elif isinstance(f.dataType, T.FloatType):
            casts.append(F.col(f.name).cast("double").alias(f.name))
            changed = True
        else:
            casts.append(F.col(f.name))
    return df.select(*casts) if changed else df


def read_csv_text(spark: SparkSession, text: str, **options) -> DataFrame:
    """Parse in-memory CSV text (reference ``readText``,
    src/IO.luna:91-92). Driver-side convenience — the text already lives
    on the driver.

    Cluster-safe by construction: a driver-local temp file would be
    invisible to executors on any non-local master, so instead the
    records ship THROUGH the session (``parallelize``) into Spark's own
    CSV parser + schema inference — the same parser and inference as
    ``Table.read`` (INT64/DOUBLE/timestamp precedence, quote/escape
    semantics). The Dataset[String] form of that parser takes one
    RECORD per element, so record boundaries are found driver-side
    first with the stdlib ``csv`` module (RFC-4180: quoted fields may
    contain newlines and doubled quotes) and each record is
    re-serialized to one element, quoting only fields that need it so
    bare empty cells stay null. Splitting N records of driver-resident
    text in Python is not a data-plane cost — by definition the input
    fit in one driver string.

    Two sharp edges of Spark's Dataset[String] reader are neutralized
    here rather than inherited: its ``header`` mode drops EVERY element
    equal to the first line (a data row that happens to repeat the
    header would vanish), so the header is consumed driver-side and the
    parsed columns renamed instead; and elements that are empty strings
    are filtered as blank lines, so a record whose only field is empty
    re-serializes as ``\"\"`` to survive the trip (it still parses to
    null, matching the file path)."""
    import csv as _csv
    import io as _io
    import sys as _sys

    header = options.pop("header", True)
    infer = options.pop("infer", True)

    # stdlib csv caps fields at 128 KiB by default; corpus documents in
    # a quoted cell easily exceed that and Spark's own parser has no
    # such limit, so lift it for the record-splitting pass
    old_limit = _csv.field_size_limit(_sys.maxsize)
    try:
        # drop truly blank lines (csv.reader yields [] for them) for
        # parity with the file path, where Spark's reader skips them; a
        # quoted-empty single-field record yields [''] and is KEPT
        rows = [r for r in _csv.reader(_io.StringIO(text)) if r]
    finally:
        _csv.field_size_limit(old_limit)

    names: list[str] | None = None
    if header and rows:
        names = rows[0]
        rows = rows[1:]

    def _serialize(row: list[str]) -> str:
        out = []
        for cell in row:
            if any(ch in cell for ch in (',', '"', '\n', '\r')):
                cell = '"' + cell.replace('"', '""') + '"'
            out.append(cell)
        rec = ",".join(out)
        return rec if rec else '""'  # lone empty field: survive blank-line drop

    records = [_serialize(r) for r in rows]
    if not records and names is not None:
        # header-only input: an empty frame with the header's columns
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(n if n else f"_c{i}", T.StringType())
                    for i, n in enumerate(names)
                ]
            ),
        )
    reader = (
        spark.read.option("header", False)
        .option("inferSchema", infer)
        .option("escape", '"')
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("inferTimestamp", True)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(spark.sparkContext.parallelize(records))
    if names is not None:
        df = df.toDF(*[n if n else f"_c{i}" for i, n in enumerate(names)])
    if infer:
        df = _conform_reference_types(df)
    return df


def _read_feather(spark: SparkSession, path: str) -> DataFrame:
    """Feather (Arrow IPC) has no distributed Spark reader; read via
    pyarrow on the driver and parallelize through Arrow. Fine for the
    reference's convenience use case; large data should be parquet."""
    import pyarrow.feather as feather

    table = feather.read_table(path)
    return spark.createDataFrame(table.to_pandas())


def _read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """XLSX via the self-contained stdlib SpreadsheetML parser
    (io/xlsx.py) — no optional dependency, unlike the reference's xlnt
    gate (src/IO.luna:94-123). Driver-side like feather: a spreadsheet
    is a single-machine interchange artifact."""
    from dataframes_spark.io.xlsx import read_xlsx

    return read_xlsx(spark, path)
