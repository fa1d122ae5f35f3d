"""Parquet layout observability: per-file footer statistics and
predicate skip-rate estimation.

At 100 TB, scan cost is decided before the first row is read: a
predicate prunes a file when the footer's min/max for that column
excludes the predicate's range, so LAYOUT QUALITY (clustering,
z-ordering, partitioning) determines whether a query touches 0.1% or
100% of the files. `write_zordered` / `write_partitioned` /
`write_bucketed` produce good layouts; this module is their
observability twin — it answers "how good is this table's layout for
THIS predicate?" without scanning any data.

Scale design: the driver lists file paths (metadata-scale, the same
listing every Spark scan performs), then a `mapInPandas` task per path
batch opens ONLY the parquet FOOTER via pyarrow (a few KB per file, no
row groups deserialized) — a million-file table costs a million footer
reads spread across the cluster, not a data scan. The report is a plain
DataFrame, so skip-rate estimation is an aggregation over file-count
rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPORT_SCHEMA = (
    "file string, rows long, col string, nulls long, "
    "min_repr string, max_repr string, nmin double, nmax double"
)

_NUMERIC_KINDS = {"i", "u", "f", "b"}  # int / uint / float / bool


def _list_parquet_files(path: str) -> list[str]:
    """Recursive *.parquet listing (hive partition dirs included).

    LOCAL filesystem only: the listing walks with os.walk and the
    footer kernel opens files with pyarrow directly, so remote URIs
    (s3://, hdfs://, dbfs:/...) are rejected up front instead of
    silently yielding zero files. Distributed-store layouts can be
    audited by mounting (s3fs/fuse) or pointing at a local mirror;
    the report itself is advisory tooling, not a data-plane operator."""
    head = path.split("/", 1)[0]
    scheme = head[:-1] if head.endswith(":") and len(head) > 1 else ""
    if scheme and scheme != "file":
        raise ValueError(
            f"layout_report/skip_rate only support local filesystem "
            f"paths; got {path!r} (scheme {scheme!r}). Mount the store "
            "locally or run against a local mirror."
        )
    path = path.removeprefix("file://")
    out = []
    if os.path.isfile(path):
        return [path]
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def layout_report(
    spark, path: str, columns: list[str] | None = None
) -> DataFrame:
    """One row per (file, column): row count, null count, min/max as
    canonical strings, plus a numeric lane (``nmin``/``nmax``) for
    int/float/bool columns — the inputs `skip_rate` needs. Columns with
    no footer statistics (e.g. nested types) report NULL min/max.
    Row-group stats are folded to file granularity (Spark prunes whole
    files first; row-group pruning refines within survivors)."""
    files = _list_parquet_files(path)
    if not files:
        raise ValueError(f"no parquet files under {path!r}")

    want = set(columns) if columns else None

    def kernel(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            recs = []
            for fp in pdf["file"]:
                md = pq.ParquetFile(fp).metadata
                per_col: dict[str, dict] = {}
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    for idx in range(rg.num_columns):
                        c = rg.column(idx)
                        name = c.path_in_schema.split(".")[0]
                        if want is not None and name not in want:
                            continue
                        st = c.statistics
                        d = per_col.setdefault(
                            name, {"nulls": 0, "min": None, "max": None}
                        )
                        if st is None:
                            continue
                        if st.null_count is not None:
                            d["nulls"] += st.null_count
                        if st.has_min_max:
                            mn, mx = st.min, st.max
                            d["min"] = mn if d["min"] is None else min(d["min"], mn)
                            d["max"] = mx if d["max"] is None else max(d["max"], mx)
                for name, d in per_col.items():
                    mn, mx = d["min"], d["max"]

                    def as_num(v):
                        try:
                            import numpy as np

                            if isinstance(v, (bool,)):
                                return float(v)
                            if isinstance(v, (int, float, np.integer, np.floating)):
                                return float(v)
                        except Exception:
                            pass
                        return None

                    recs.append(
                        {
                            "file": fp,
                            "rows": md.num_rows,
                            "col": name,
                            "nulls": d["nulls"],
                            "min_repr": None if mn is None else str(mn),
                            "max_repr": None if mx is None else str(mx),
                            "nmin": as_num(mn),
                            "nmax": as_num(mx),
                        }
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "file",
                    "rows",
                    "col",
                    "nulls",
                    "min_repr",
                    "max_repr",
                    "nmin",
                    "nmax",
                ],
            )

    n_slices = max(1, min(len(files), 64))
    paths_df = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(n_slices)
    return paths_df.mapInPandas(kernel, _REPORT_SCHEMA)


def skip_rate(
    report: DataFrame, col: str, lo: float | None, hi: float | None
) -> dict:
    """Fraction of files a scan with ``lo <= col <= hi`` can SKIP from
    footer min/max alone (pass ``lo=None``/``hi=None`` for one-sided
    ranges). A file is skippable when its [nmin, nmax] misses the
    predicate range; files without numeric stats count as unskippable
    (the scanner must read them). Returns ``{"files", "skippable",
    "skip_fraction", "rows_total", "rows_skippable"}`` — computed with
    one aggregation over the file-count-sized report."""
    r = report.filter(F.col("col") == col)
    misses = F.col("nmin").isNotNull() & F.col("nmax").isNotNull()
    skippable = F.lit(False)
    if lo is not None:
        skippable = skippable | (F.col("nmax") < F.lit(float(lo)))
    if hi is not None:
        skippable = skippable | (F.col("nmin") > F.lit(float(hi)))
    skippable = misses & skippable
    agg = r.agg(
        F.count(F.lit(1)).alias("files"),
        F.sum(skippable.cast("long")).alias("skippable"),
        F.sum("rows").alias("rows_total"),
        F.sum(F.when(skippable, F.col("rows")).otherwise(F.lit(0))).alias(
            "rows_skippable"
        ),
    ).first()
    files = agg["files"] or 0
    skippable_n = int(agg["skippable"] or 0)
    return {
        "files": int(files),
        "skippable": skippable_n,
        "skip_fraction": (skippable_n / files) if files else 0.0,
        "rows_total": int(agg["rows_total"] or 0),
        "rows_skippable": int(agg["rows_skippable"] or 0),
    }
