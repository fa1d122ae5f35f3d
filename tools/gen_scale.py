"""Generate scaled-up test data by replicating the driver's sf0.1
parquet K times with key shifting — the input for the sf1 scaling
spot-bench (tools/scale_bench.py; BENCH_SF1.json).

Replication semantics per table:

- every primary/foreign key shifts by ``replica * OFFSET`` so key
  relationships (orders->lineitem, customer->orders, events.user_id)
  stay intact and cardinalities scale linearly;
- ``documents.text`` gets a per-replica prefix token and
  ``embeddings.embedding`` a per-replica first-component nudge, so
  content stays mostly DISTINCT across replicas — otherwise every
  document would gain K-1 exact copies and the dedup rows would
  measure the (quadratic) duplicate blow-up of the generator, not the
  engine's scaling;
- dimension tables (region, nation) do NOT replicate: real scale-ups
  grow facts, not the dimension spine.

Usage: python3 tools/gen_scale.py [K] [src_dir] [dst_dir]
Defaults: K=10, src=/root/testdata/sf0.1, dst=/root/repo/.scale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 100_000_000


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale/sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE TABLE reps AS SELECT unnest(range({k})) AS r")

    def gen(table: str, select: str, replicate: bool = True) -> None:
        src_rel = f"read_parquet('{src}/{table}.parquet')"
        if replicate:
            q = f"SELECT {select} FROM {src_rel} t, reps"
        else:
            q = f"SELECT * FROM {src_rel}"
        con.sql(f"COPY ({q}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    o = f"r * {OFFSET}"
    gen("region", "*", replicate=False)
    gen("nation", "*", replicate=False)
    gen("customer", f"c_custkey + {o} AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment")
    gen("supplier", f"s_suppkey + {o} AS s_suppkey, "
        "s_name, s_nationkey, s_acctbal")
    gen("part", f"p_partkey + {o} AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice")
    gen("orders", f"o_orderkey + {o} AS o_orderkey, "
        f"o_custkey + {o} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem", f"l_orderkey + {o} AS l_orderkey, "
        f"l_partkey + {o} AS l_partkey, "
        f"l_suppkey + {o} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate")
    gen("events", f"event_id + {o} AS event_id, ts, "
        f"user_id + {o} AS user_id, event_type, value, props")
    gen("documents", f"doc_id + {o} AS doc_id, "
        "CASE WHEN r = 0 THEN text ELSE 'r' || r || ' ' || text END AS text, "
        "lang, source, n_chars")
    gen("embeddings", f"vec_id + {o} AS vec_id, "
        "CASE WHEN r = 0 THEN embedding ELSE "
        "list_prepend(embedding[1] + r * 0.01, embedding[2:]) END "
        "AS embedding, label")


if __name__ == "__main__":
    main()
