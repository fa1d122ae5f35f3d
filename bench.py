"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query set mirrors the reference's benchmark harness operations
(reference: native_libs/test/Benchmarks.cpp:62-322 — filter, map,
countValues, column stats, correlation matrix, dropna/fillna,
group-aggregate, interpolate, rolling window, sort) on the driver's
synthetic tables, plus the beyond-reference pipeline headliners.
Coverage is the FULL entry.queries() inventory minus an explicit,
reasoned exclusion list (EXCLUDED below, echoed in the output JSON) —
so a perf regression cannot hide in an unmeasured query.

Each query is timed to completion of a real action. Aggregation-shaped
queries use .count() on the result (forces full execution, avoids
driver-side transfer noise); top-k queries collect their (small) output.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

import __spark_entry__ as entry
from dataframes_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Queries EXCLUDED from the bench, with the reason — everything else in
# entry.queries() is measured, so a regression cannot hide outside the
# measured set; the exclusions ride along in the output JSON.
EXCLUDED = {
    # md5-mode twins are verification lanes, not perf paths — the
    # xxhash64 defaults are what a pipeline runs; benching the md5 lanes
    # would measure hex-parsing, not the engine
    "minhash_signatures_md5": "md5 verification lane of minhash_signatures",
    "lsh_buckets_md5": "md5 verification lane of hyperplane_buckets",
    "simhash_fingerprints_md5": "md5 verification lane of simhash",
    "minhash_lsh_pairs_md5": "md5 verification lane of minhash_lsh_pairs",
    "langid_classifier_docs": "md5 verification lane of langid_score; langid_scores_docs is the benched xxhash64 production lane",
    # the synthetic corpus draws documents from a tiny phrase pool, so
    # the fingerprint df distribution is degenerate (median df ~6% of
    # the corpus) and the pair join measures corpus pathology, not the
    # engine
    "shared_passages_docs": "degenerate synthetic-corpus fingerprint distribution",
    # documented verification-grade quadratic baseline (sum df^2 pair
    # blowup is inherent to exact n-gram Jaccard); its scale path —
    # banded LSH — IS benched via minhash_lsh_candidates and
    # near_dup_jaccard_lsh
    "jaccard_pairs_3gram": "verification-grade quadratic baseline; LSH is the scale path",
}

# Structured Streaming queries measure the streaming runtime's FIXED
# overhead (source discovery, state store, microbatch scheduling), not
# operator cost — attribution_stream_clicks runs ~9 s where its batch
# twin (range_join_purchase_clicks) runs ~0.5 s. Folding that constant
# into the batch headline would mask real batch regressions, so these
# are measured in their own lane and reported as `streaming_total`.
STREAMING = {
    "attribution_stream_clicks": (
        "real availableNow streaming run; cost is streaming fixed "
        "overhead, batch twin is range_join_purchase_clicks"
    ),
}

# Legacy headline ordering kept first for continuity with BENCH_r01-r05
# (round-over-round diffs track this prefix); the remainder of
# entry.queries() is appended at import time in main().
BENCH_QUERIES = [
    "q1_pricing_summary",
    "lquery_filter",
    "lquery_map",
    "aggregate_contract",
    "count_values",
    "column_stats",
    "correlations",
    "sort_slice",
    "rolling_1h",
    "interpolate_linear",
    "dropna_rows",
    "fillna_zero",
    "ungroup_explode",
    "join_revenue_topn",
    "join_region_revenue",
    "window_topn_orders",
    "dedup_exact_docs",
    "near_dup_jaccard_lsh",
    "doc_profile",
    "embedding_topk",
    "minhash_lsh_candidates",
    "rolling_rows_100",
    "group_collect_lists",
    "setop_union_except",
    "ols_price_qty",
    "pandas_map_column",
    "media_decode_stats",
    "simhash_fingerprints",
    "lquery_datetime",
    "pipeline_clean_corpus",
    "sessionize_events",
    "reproducible_sample",
    "asof_last_purchase",
    "range_join_purchase_clicks",
    "embedding_near_dup_pairs",
    "time_rollup_events",
    "ewma_user_value",
    "winnow_fingerprints_docs",
    "chunk_documents",
    "pack_documents_cumsum",
    "pack_documents_greedy",
    "decontaminate_docs",
    "interval_overlap_purchases",
    "near_dup_clusters",
    "repetition_docs",
    "mix_corpus_sources",
    "vocab_topk_docs",
    "tfidf_top_terms",
    "weighted_sample_docs",
    "split_documents",
    "upsert_documents",
    "fuzzy_part_names",
    "repeated_lines_docs",
    "strip_repeated_lines_docs",
    "unigram_logprob_docs",
    "bloom_semi_orders",
    "cube_qty",
    "length_histogram_docs",
    "resample_events_hourly",
    "winsorize_prices",
    "asof_nearest_purchase",
    "skew_report_orders",
    "standardize_prices",
    "melt_lineitem",
    "facade_column_surgery",
]


def main() -> None:
    spark = get_spark(app_name="dataframes_spark_bench")
    queries = entry.queries()
    # full coverage: every queries() entry not explicitly excluded is
    # measured — new queries enter the bench automatically
    bench_set = BENCH_QUERIES + [
        n
        for n in queries
        if n not in BENCH_QUERIES and n not in EXCLUDED and n not in STREAMING
    ]

    # warm the JVM + parquet footer caches with one untimed pass
    q1 = queries["q1_pricing_summary"](spark, SF_DIR)
    q1.count()
    # ... and spawn the Python UDF workers + Arrow serialization path once:
    # the first pandas-UDF query of a session otherwise pays worker fork +
    # Arrow init (measured ~1-2.5 s), which a best-of-2 cannot amortize —
    # it showed up as phantom "regressions" of sessionize/winnow in r03
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    # best-of-N per query — the reference's own measurement policy
    # (best time of repeated runs, native_libs/src/Core/Benchmark.h:41-126,
    # report loop Benchmarks.cpp:50-57). Rounds are INTERLEAVED: run the
    # whole query list N times and take each query's minimum across
    # rounds, rather than N back-to-back runs per query — with
    # back-to-back runs a transient load spike on the machine sinks every
    # sample of whichever query it lands on (the r4 file recorded 3-4x
    # phantom regressions that best-of-5 in a quiet session disproved);
    # interleaving spreads one query's samples across the full wall-clock
    # span so a spike costs at most one of its N samples.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {name: float("inf") for name in bench_set}
    for _ in range(runs):
        for name in bench_set:
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.count()
            timings[name] = min(timings[name], time.perf_counter() - t0)
    timings = {name: round(t, 4) for name, t in timings.items()}
    total = round(sum(timings.values()), 4)
    # streaming lane: measured (a regression here is still a regression)
    # but reported under its own total so the batch headline stays
    # comparable round-over-round; best-of-2 — the number is dominated by
    # the streaming runtime's fixed overhead, not sampling noise
    streaming_timings: dict[str, float] = {}
    for name in STREAMING:
        if name not in queries:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        streaming_timings[name] = round(best, 4)
    streaming_total = round(sum(streaming_timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "streaming_total": streaming_total,
        "streaming": streaming_timings,
        "streaming_reasons": STREAMING,
        "excluded": EXCLUDED,
        "sf": sf_val,
    }
    # The full-inventory JSON line outgrew the driver's bounded tail
    # capture in round 6 (BENCH_r06.json recorded `parsed: null`), losing
    # the headline total. Two-layer fix: (1) persist the complete record
    # to BENCH_LOCAL.json next to this script so round-over-round diffs
    # (tools/bench_diff.py) never depend on the capture size; (2) print
    # the full line FIRST and then ONE compact trailing summary line —
    # a tail capture of any reasonable size always retains the last,
    # short line intact, so the headline total is always parseable.
    local_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    with open(local_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(json.dumps(full))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "streaming_total": streaming_total,
                "sf": sf_val,
                "detail": "BENCH_LOCAL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
