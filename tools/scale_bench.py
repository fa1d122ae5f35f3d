"""sf1 scaling spot-bench (the r10 verdict's item 6): run the most
expensive BENCH_LOCAL queries at sf0.1 AND at the 10x replicated sf1
set (tools/gen_scale.py), and record per-query wall-clock ratios —
the cheapest way to catch a hidden super-linear constant before a
real cluster does. A scale-correct query should grow ≲ linearly in
rows (ratio ≲ 10 for 10x data; overhead-dominated rows grow less).

Writes BENCH_SF1.json: {"sf_ratio": 10, "queries": {name:
{"sf01": s, "sf1": s, "ratio": r}}, "top_n": N, "excluded": {...}}.

Usage: python3 tools/scale_bench.py [top_n]   (default 15)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from dataframes_spark import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scale/sf1"

#: rows excluded beyond bench.py's own exclusions, with the reason
EXCLUDED = {
    # writes+reads its own store per run: measures parquet commit
    # overhead at BOTH scales, fine, but the store tables collide with
    # concurrent runs — keep it, nothing to exclude structurally.
}


def main() -> None:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    base = json.load(open("BENCH_LOCAL.json"))
    import bench

    ranked = sorted(
        (
            (t, n)
            for n, t in base["queries"].items()
            if n not in bench.EXCLUDED and n not in EXCLUDED
        ),
        reverse=True,
    )
    names = [n for _t, n in ranked[:top_n]]
    spark = get_spark()
    qs = entry.queries()
    out = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:  # renamed/rotated since the recording
            continue
        row = {}
        fn(spark, "/root/testdata/sf0.01").count()  # warm-up: JIT + code paths
        for key, sf_dir in (("sf01", SF01), ("sf1", SF1)):
            t0 = time.time()
            fn(spark, sf_dir).count()
            row[key] = round(time.time() - t0, 3)
        row["ratio"] = round(row["sf1"] / max(row["sf01"], 1e-9), 2)
        out[name] = row
        print(f"{name}: sf0.1={row['sf01']}s sf1={row['sf1']}s "
              f"ratio={row['ratio']}x", flush=True)
    result = {
        "sf_ratio": 10,
        "top_n": top_n,
        "queries": out,
        "note": "10x replicated rows (tools/gen_scale.py); ratio <= ~10 "
                "means at-most-linear row scaling, lower = overhead-"
                "dominated at sf0.1",
    }
    with open("BENCH_SF1.json", "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
