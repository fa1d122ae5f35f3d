"""Local differential harness: run every ``queries()`` entry on Spark and
its ``oracle_sql()`` twin on DuckDB over the same parquet tables, compare
row counts + canonicalized values — a local stand-in for the driver's
CORRECTNESS gate.

Canonicalization mirrors the driver contract described in the repo docs:
columns sorted by name, rows sorted, values stringified (floats via
repr, -0.0 rendered faithfully). Queries are expected to round any
floating-point aggregate identically on both sides, so exact string
equality is the bar.

Round 9: the driver's value hash is dtype-sensitive (round 8 shipped two
hash-reds that were value-identical but differed in integer width /
DuckDB HUGEINT float-rendering — ORACLE.md rules 3 and 8). This harness
now ALSO compares a canonical per-column type signature: Spark ``int``
must meet DuckDB ``INTEGER``, ``bigint`` must meet ``BIGINT``, and a
DuckDB ``HUGEINT`` (uncast ``sum()`` over integers) never matches
anything — exactly the two classes that slipped through ``str()``
canonicalization in round 8.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # -0.0 is rendered faithfully ("-0.0" != "0.0"): the driver's
        # hash distinguishes them (r8's embedding_covariance_upper red
        # was a single -0.0 cell), so queries whose values can be ~0
        # must normalize with `+ 0.0` on both sides — ORACLE.md rule 7.
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


_SPARK_SCALARS = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "bytes",
    "void": "null",
}

_DUCK_SCALARS = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int128",  # never matches a Spark type: cast the oracle
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "TIMESTAMP_MS": "timestamp",
    "TIMESTAMP_S": "timestamp",
    "BLOB": "bytes",
    '"NULL"': "null",
    "NULL": "null",
}


def canon_spark_type(t: str) -> str:
    t = t.strip()
    low = t.lower()
    if low.startswith("array<") and low.endswith(">"):
        return f"list<{canon_spark_type(t[6:-1])}>"
    if low.startswith("decimal"):
        return "decimal"
    return _SPARK_SCALARS.get(low, low)


def canon_duck_type(t) -> str:
    s = str(t).strip()
    up = s.upper()
    if up.endswith("[]"):
        return f"list<{canon_duck_type(s[:-2])}>"
    if up.startswith("DECIMAL"):
        return "decimal"
    return _DUCK_SCALARS.get(up, up.lower())


def dtype_mismatches(
    sdtypes: list[tuple[str, str]], ocols: list[str], otypes: list
) -> list[str]:
    """Per-column canonical-type diffs between a Spark schema and a
    DuckDB relation, matched by (sorted) column name. Empty = faithful."""
    smap = {c: canon_spark_type(t) for c, t in sdtypes}
    omap = {c: canon_duck_type(t) for c, t in zip(ocols, otypes)}
    out = []
    for c in sorted(set(smap) & set(omap)):
        if smap[c] != omap[c]:
            out.append(f"{c}: spark={smap[c]} oracle={omap[c]}")
    return out


def canon_frame(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from dataframes_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else SF_DIR
    only = set(a for a in sys.argv[1:] if "/" not in a)

    spark = get_spark(cpus="8")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, no_oracle = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: SPARK ERROR {str(e)[:200]}", flush=True)
            continue
        if name not in oracles:
            no_oracle.append(name)
            print(f"~ {name}: rows-only ({len(srows)} rows, no oracle)", flush=True)
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"✗ {name}: ORACLE ERROR {str(e)[:200]}", flush=True)
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"SCHEMA: spark={sorted(scols)} oracle={sorted(ocols)}"))
            print(f"✗ {name}: SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        tdiff = dtype_mismatches(sdf.dtypes, ocols, rel.types)
        if tdiff:
            failures.append((name, f"DTYPE: {'; '.join(tdiff)}"))
            print(f"✗ {name}: DTYPE {'; '.join(tdiff)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"ROWCOUNT: spark={len(srows)} oracle={len(orows)}"))
            print(f"✗ {name}: ROWCOUNT spark={len(srows)} oracle={len(orows)}")
            continue
        s_can = canon_frame(scols, [tuple(r) for r in srows])
        o_can = canon_frame(ocols, orows)
        if s_can != o_can:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(s_can, o_can)) if a != b
            )
            failures.append((name, f"VALUES at sorted-row {diff[0]}"))
            print(f"✗ {name}: VALUES differ, first at sorted-row {diff[0]}")
            print(f"    spark : {diff[1]}")
            print(f"    oracle: {diff[2]}")
            continue
        passed.append(name)
        print(f"✓ {name} ({len(srows)} rows)", flush=True)

    print(
        f"\n{len(passed)} passed, {len(failures)} failed, "
        f"{len(no_oracle)} rows-only of {len(queries)} queries"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
