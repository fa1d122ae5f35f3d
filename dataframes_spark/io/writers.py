"""Writers: format from extension (reference: src/Table.luna:148-149,
native_libs/src/IO/IO.cpp:92-99).

Spark writers are distributed — each partition writes its own file; a
single-file CSV (what the reference produces) needs coalesce(1), which is
only sane for small outputs, so it's opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dataframes_spark.io.readers import detect_format


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
        try:
            import openpyxl  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "xlsx output needs openpyxl (not in this environment); "
                "write csv/parquet/feather instead"
            ) from e
        out.toPandas().to_excel(path, index=False)
        return
    writer.format(fmt).save(path)
