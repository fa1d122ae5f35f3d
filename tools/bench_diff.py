"""Round-over-round bench comparison: reads two BENCH_r*.json files (the
driver's wrapped format with a ``parsed`` key, or bench.py's raw JSON
line) and reports per-query deltas over the common query set — the
analysis every round's verdict does by hand.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold]

threshold (default 1.3): flag queries slower than threshold x their old
time AND at least 100 ms absolute — small absolute moves are run-to-run
noise on this harness (demonstrated in rounds 4-6: a 0.26->0.34 s
"regression" disproved by the next best-of-5).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver wrapper
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' key (not a bench file?)")
    return d


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    so, sn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    print(f"common queries: {len(common)}")
    print(f"common-set total: {so:.2f}s -> {sn:.2f}s ({sn / so:.2f}x)")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(
            f"newly benched: {len(only_new)} queries, "
            f"{sum(qn[k] for k in only_new):.2f}s"
        )
    dropped = sorted(set(qo) - set(qn))
    if dropped:
        print(f"no longer benched: {', '.join(dropped)}")
    regs = [
        (qn[k] / qo[k], k)
        for k in common
        if qn[k] > qo[k] * threshold and qn[k] - qo[k] > 0.1
    ]
    if regs:
        print(f"regressions (> {threshold}x and > 100 ms):")
        for r, k in sorted(regs, reverse=True):
            print(f"  {k:36s} {qo[k]:7.3f} -> {qn[k]:7.3f}  ({r:.2f}x)")
    else:
        print(f"no regressions > {threshold}x + 100 ms")
    wins = [
        (qo[k] / qn[k], k)
        for k in common
        if qo[k] > qn[k] * threshold and qo[k] - qn[k] > 0.1
    ]
    if wins:
        print("improvements:")
        for r, k in sorted(wins, reverse=True)[:10]:
            print(f"  {k:36s} {qo[k]:7.3f} -> {qn[k]:7.3f}  ({r:.2f}x faster)")


if __name__ == "__main__":
    main()
