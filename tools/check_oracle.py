"""Local differential harness: run every ``queries()`` entry on Spark and
its ``oracle_sql()`` twin on DuckDB over the same parquet tables, compare
row counts + canonicalized values — a local stand-in for the driver's
CORRECTNESS gate.

Canonicalization mirrors the driver contract described in the repo docs:
columns sorted by name, rows sorted, values stringified (floats via repr
after -0.0 normalization). Queries are expected to round any
floating-point aggregate identically on both sides, so exact string
equality is the bar.

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
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


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
