"""Physical-plan audit: the scale checklist as a runtime tool.

``plan_report(df)`` inspects a DataFrame's compiled physical plan
(plan-time only — nothing executes) and returns the properties that
decide whether a query survives a 100 TB scale-up: how many shuffles,
whether filters reached the parquet scan, which columns the scan reads,
whether Python sits in the hot path, and a ``warnings`` list naming the
known scale-killers (single-partition exchanges, row-at-a-time Python
UDFs, cartesian products). The same checks ``tests/test_plans.py`` pins
for the shipped queries, packaged so users can audit their own.

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
    if report["single_partition_exchanges"]:
        warnings.append(
            "Exchange SinglePartition — the full input flows through ONE "
            "reducer (global window/sort without partitioning?); "
            "partition the window, or pre-reduce per partition first"
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
