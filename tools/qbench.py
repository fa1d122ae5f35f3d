"""Per-query micro-bench + plan capture for the optimization rounds.

Usage:
    python tools/qbench.py [--runs N] [--plan-dir plans/r12] [--suffix before]
                           [--sf SF_DIR] query [query ...]

For each named query this times best-of-N with the SAME action the bench
uses (``df.count()``), ALSO times one noop-sink run (guide §1.4 — forces
every column, so column-pruning wins show up honestly), and (when
--plan-dir is given) writes ``<plan-dir>/<query>_<suffix>.txt`` with the
``explain("formatted")`` output. Jobs are labelled (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from dataframes_spark import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="qbench")
    qs = entry.queries()
    # warm: parquet footers + python worker pool, mirroring bench.py
    qs["q1_pricing_summary"](spark, args.sf).count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, dict] = {}
    names = list(args.queries)
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        rec: dict = {}
        sc = spark.sparkContext
        # best-of-N count() — bench-comparable number
        best = float("inf")
        for i in range(args.runs):
            sc.setJobDescription(f"{name} count run {i}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            df.count()
            best = min(best, time.perf_counter() - t0)
        rec["count_best"] = round(best, 4)
        if not args.no_noop:
            sc.setJobDescription(f"{name} noop")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            rec["noop"] = round(time.perf_counter() - t0, 4)
        sc.setJobDescription(None)
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print("TOTALS " + json.dumps(out))


if __name__ == "__main__":
    main()
