"""Physical-plan audit: the scale checklist as a runtime tool.

``plan_report(df)`` inspects a DataFrame's compiled physical plan
(plan-time only — nothing executes) and returns the properties that
decide whether a query survives a 100 TB scale-up: how many shuffles,
whether filters reached the parquet scan, which columns the scan reads,
whether Python sits in the hot path, and a ``warnings`` list naming the
known scale-killers (single-partition exchanges, row-at-a-time Python
UDFs, cartesian products, filters that pushed nothing into the scan
they sit on, sort-merge joins whose smaller side is estimated
broadcastable). The same checks ``tests/test_plans.py`` pins for the
shipped queries, packaged so users can audit their own.

``assert_scalable(df)`` turns the warnings into an exception — drop it
into a pipeline's tests the way this repo's own plan tests do.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    jqe = df._jdf.queryExecution()
    m = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jqe.explainString(m)


# nodes a filter predicate passes through untouched on its way to a scan
# — if only these sit between a Filter and its Scan, the filter COULD
# have been pushed down (at least as IsNotNull), so an empty
# PushedFilters list on that scan is a real pushdown miss
_PASS_THROUGH = ("Project", "ColumnarToRow", "Filter", "InputAdapter", "Coalesce")


def _tree_nodes(formatted: str) -> list[tuple[int, str, str]]:
    """Parse the formatted explain's tree sketch into
    ``(depth, node_name, node_id)`` rows, pre-order."""
    out: list[tuple[int, str, str]] = []
    in_tree = False
    for line in formatted.splitlines():
        if line.startswith("== Physical Plan =="):
            in_tree = True
            continue
        if in_tree:
            m = re.match(r"^([:+\-| ]*)(?:\* )?([A-Za-z][A-Za-z0-9_]*).*\((\d+)\)\s*$", line)
            if m is None:
                if not line.strip():
                    break
                continue
            out.append((len(m.group(1)), m.group(2), m.group(3)))
    return out


# a predicate parquet/orc pushdown handles directly: isnotnull over a
# bare attribute, or a comparison with a bare attribute operand —
# "value#12 > 5.0", "isnotnull(value#12)". Expression-wrapped forms
# (coalesce(x,0) > 5, isnotnull(CASE WHEN ...)) do NOT match: those are
# inherently unpushable and only reported, not warned.
_PUSHABLE_PRED = re.compile(
    r"isnotnull\(\w+#\d+[A-Za-z]?\)"
    r"|\(\w+#\d+[A-Za-z]? (?:<=>|=|>=|<=|>|<|IN) "
    r"|(?:<=>|=|>=|<=|>|<) \w+#\d+[A-Za-z]?\)"
)


def _unpushed_filter_scans(formatted: str) -> list[dict]:
    """Scans that sit directly under a Filter (only pass-through nodes
    between) yet pushed NOTHING — the filter runs post-read over every
    row of the file. Each entry is ``{"scan": id, "pushable": bool}``:
    ``pushable`` is True when the condition contains a predicate the
    source's pushdown handles directly (so the miss points at disabled/
    broken pushdown — warned), False when every predicate wraps an
    expression (unpushable by construction — reported only, since
    filters over computed columns are often intrinsic to the query)."""
    nodes = _tree_nodes(formatted)
    # scan id -> pushed-filter payload. A parquet/orc scan OMITS the
    # PushedFilters line when nothing pushed, so absence there means
    # empty; for sources without pushdown support (text, binary) the
    # miss is inherent to the format — not assessable, never flagged.
    pushed: dict[str, str | None] = {}
    conditions: dict[str, str] = {}
    for block in re.split(r"^\(", formatted, flags=re.M):
        m = re.match(r"(\d+)\) Scan (\w+)", block)
        if m:
            pf = re.search(r"PushedFilters: \[([^\]]*)\]", block)
            if pf is not None:
                pushed[m.group(1)] = pf.group(1).strip()
            else:
                pushed[m.group(1)] = "" if m.group(2) in ("parquet", "orc") else None
        mf = re.match(r"(\d+)\) Filter", block)
        if mf:
            mc = re.search(r"Condition : (.*)", block)
            conditions[mf.group(1)] = mc.group(1) if mc else ""
    flagged: dict[str, bool] = {}
    for i, (depth, name, fid) in enumerate(nodes):
        if name != "Filter":
            continue
        # walk the Filter's chain toward the leaves; stop at the first
        # non-pass-through node — a join/agg/exchange in between means
        # pushdown through it is Catalyst's call, not a plan defect
        for d2, n2, id2 in nodes[i + 1 :]:
            if d2 <= depth:
                break
            if n2 == "Scan":
                if pushed.get(id2) == "":
                    could_push = bool(_PUSHABLE_PRED.search(conditions.get(fid, "")))
                    flagged[id2] = flagged.get(id2, False) or could_push
                break
            if n2 not in _PASS_THROUGH:
                break
    return [{"scan": k, "pushable": v} for k, v in sorted(flagged.items())]


def _bytes_conf(value: str) -> int:
    """Parse a Spark byte-string conf ('10MB', '10485760b', '-1')."""
    m = re.match(r"^\s*(-?\d+)\s*([kmgtp]?b?)\s*$", value.lower())
    if not m:
        return -1
    mult = {
        "": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
        "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40,
        "tb": 1 << 40, "p": 1 << 50, "pb": 1 << 50,
    }[m.group(2)]
    return int(m.group(1)) * mult


def _tiny_side_join_sizes(df: DataFrame, threshold: int) -> list[int]:
    """Estimated sizes (bytes) of the smaller side of every logical join
    whose smaller side is under ``threshold`` — i.e. joins Catalyst
    COULD broadcast. Walks the optimized logical plan via the JVM handle
    (plan-time stats only; nothing runs)."""
    try:
        stack = [df._jdf.queryExecution().optimizedPlan()]
    except Exception:
        return []
    tiny: list[int] = []
    while stack:
        node = stack.pop()
        kids = node.children()
        kids = [kids.apply(i) for i in range(kids.length())]
        if node.nodeName() == "Join" and len(kids) == 2:
            try:
                left, right = (int(k.stats().sizeInBytes()) for k in kids)
                jt = node.joinType().toString()
            except Exception:
                left = right = threshold + 1
                jt = "Inner"
            # broadcasting is side-constrained by join type: a FULL
            # OUTER hash join cannot broadcast either side (every
            # unmatched row of both sides must surface), an outer/semi/
            # anti join can only broadcast the non-preserved side — a
            # tiny side that CANNOT legally broadcast is not a hazard
            if jt in ("Inner", "Cross"):
                candidates = [left, right]
            elif jt in ("LeftOuter", "LeftSemi", "LeftAnti") or jt.startswith("Existence"):
                candidates = [right]
            elif jt == "RightOuter":
                candidates = [left]
            else:  # FullOuter and anything unrecognized
                candidates = []
            if candidates and min(candidates) <= threshold:
                tiny.append(min(candidates))
        stack.extend(kids)
    return tiny


_AGG_CHILD = re.compile(r"HashAggregate|ObjectHashAggregate|SortAggregate")


def _single_partition_data_exchanges(simple: str) -> int:
    """Count ``Exchange SinglePartition`` nodes whose immediate child (the
    next line of the simple-mode tree) is NOT an aggregate — i.e. the
    exchanges that funnel raw data rows, not pre-reduced aggregate
    buffers, through one reducer."""
    lines = simple.splitlines()
    n = 0
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if not _AGG_CHILD.search(child):
            n += 1
    return n


def plan_report(df: DataFrame) -> dict:
    """Audit the compiled physical plan; see the keys below. Plan-time
    only: no job runs, so this is safe on any size of input."""
    p = _explain(df, "formatted")
    simple = _explain(df, "simple")

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    scan_columns = [
        [c.split(":")[0] for c in s.split(",") if c] for s in schemas
    ]

    # formatted mode prints every node TWICE — once in the tree sketch
    # and once as a "(n) NodeName" detail header — so substring counts
    # over the whole text double every metric. Count the detail headers
    # only: exactly one per physical node.
    nodes = re.findall(r"^\(\d+\) (\S+)", p, re.M)

    def n_nodes(*names: str) -> int:
        return sum(1 for n in nodes if any(n.startswith(x) for x in names))

    report = {
        # shuffle exchanges (broadcasts counted separately below) — the
        # dominant cost at scale
        "exchanges": n_nodes("Exchange"),
        "broadcast_exchanges": n_nodes("BroadcastExchange"),
        # the distribution is on the Arguments line in formatted mode
        # ("Arguments: SinglePartition, ..."), one line per exchange
        "single_partition_exchanges": len(
            re.findall(r"Arguments: SinglePartition", p)
        ),
        # the subset of those that carry DATA rows: a SinglePartition
        # exchange whose child is an aggregate moves pre-reduced rows
        # (one row per group of an un-keyed agg / a bucket-cardinality
        # relation — every df.agg() has one; benign at any scale); one
        # whose child is anything else moves the full input through one
        # reducer — the global-sort/window shape that dies at 100 TB
        "single_partition_data_exchanges": _single_partition_data_exchanges(
            simple
        ),
        "sort_merge_joins": n_nodes("SortMergeJoin"),
        "broadcast_hash_joins": n_nodes("BroadcastHashJoin"),
        "cartesian_products": n_nodes("CartesianProduct"),
        # scan health: predicate pushdown + column pruning
        "pushed_filters": [s for s in pushed if s.strip()],
        "scan_columns": scan_columns,
        # Python in the plan: Arrow-batched pandas UDFs are the
        # sanctioned escape hatch; BatchEvalPython is row-at-a-time.
        # The list covers the Arrow-batched node shapes: scalar/grouped/
        # window pandas UDFs, mapInPandas, mapInArrow, applyInPandas
        # (grouped, cogrouped) and applyInPandasWithState.
        "pandas_udf_nodes": n_nodes(
            "ArrowEvalPython",
            "MapInPandas",
            "FlatMapGroupsInPandas",      # prefix also covers ...WithState
            "FlatMapCoGroupsInPandas",
            "AggregateInPandas",
            "WindowInPandas",
            "MapInArrow",
            "PythonMapInArrow",
        ),
        "row_python_udf_nodes": n_nodes("BatchEvalPython"),
        # whole-stage codegen spans from the simple plan ("*(n)" prefixes)
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "plan": p,
    }

    warnings = []
    if report["row_python_udf_nodes"]:
        warnings.append(
            "row-at-a-time Python UDF (BatchEvalPython) in the plan — "
            "10-100x slower than a pandas_udf; rewrite with built-in "
            "functions or an Arrow-batched UDF"
        )
    if report["cartesian_products"]:
        warnings.append(
            "CartesianProduct in the plan — O(N*M) pairs; add an equi-join "
            "key (bucketize ranges, LSH-block similarity) or broadcast a "
            "provably tiny side"
        )
    if report["single_partition_data_exchanges"]:
        warnings.append(
            "Exchange SinglePartition — the full input flows through ONE "
            "reducer (global window/sort without partitioning?); "
            "partition the window, or pre-reduce per partition first"
        )
    unpushed = _unpushed_filter_scans(p)
    report["unpushed_filter_scans"] = [u["scan"] for u in unpushed]
    warn_scans = [u["scan"] for u in unpushed if u["pushable"]]
    if warn_scans:
        warnings.append(
            "Filter with pushdown-eligible predicates sits on a scan "
            f"that pushed NOTHING (scan node id(s) {', '.join(warn_scans)})"
            " — every row of the file is read then filtered; check "
            "spark.sql.parquet.filterPushdown and the source's pushdown "
            "support. (Filters made unpushable by wrapping columns in "
            "expressions are listed in unpushed_filter_scans without a "
            "warning — rewrite to compare raw columns where possible.)"
        )
    if report["sort_merge_joins"]:
        try:
            conf = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
            thresh = _bytes_conf(conf)
        except Exception:
            thresh = -1
        if thresh <= 0:
            thresh = 10 << 20  # notionally broadcastable even when auto-broadcast is off
        tiny = _tiny_side_join_sizes(df, thresh)
        # joins with a tiny side that Catalyst already broadcasts cancel
        # out; more tiny-side joins than broadcast joins means at least
        # one tiny side is being SHUFFLED through a sort-merge join
        n_bcast = n_nodes("BroadcastHashJoin", "BroadcastNestedLoopJoin")
        if len(tiny) > n_bcast:
            report["tiny_side_join_bytes"] = tiny
            warnings.append(
                "sort-merge join although one side's estimated size "
                f"({min(tiny)} bytes) is broadcastable — both sides "
                "shuffle; raise spark.sql.autoBroadcastJoinThreshold or "
                "add a broadcast() hint on the small side"
            )
    report["warnings"] = warnings
    return report


def assert_scalable(df: DataFrame, allow: tuple[str, ...] = ()) -> dict:
    """Raise ``AssertionError`` if the plan carries a known scale-killer
    (any ``plan_report`` warning whose text contains none of the
    ``allow`` substrings). Returns the report when clean — use in
    pipeline tests exactly like this repo's tests/test_plans.py."""
    report = plan_report(df)
    bad = [
        w for w in report["warnings"] if not any(a in w for a in allow)
    ]
    if bad:
        raise AssertionError(
            "plan has scale hazards:\n- " + "\n- ".join(bad)
        )
    return report
