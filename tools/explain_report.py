"""Dump formatted physical plans for the headline queries to EXPLAIN.md —
the artifact version of tests/test_plans.py: pushdown, pruning, partial
aggregation, broadcast joins, and top-k heaps, visible per query.

Usage: python tools/explain_report.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SHOWCASE = [
    ("q1_pricing_summary", "scan -> pushed filter -> partial+final agg -> sort"),
    ("lquery_filter", "LQuery JSON -> Catalyst filter, pushed to parquet"),
    ("join_revenue_topn", "3-way join, broadcast dim, TakeOrdered top-k"),
    ("join_region_revenue", "star join, all dims broadcast"),
    ("rolling_1h", "range-frame window over event time"),
    ("near_dup_jaccard_lsh", "minhash fold -> banded buckets -> verify joins"),
    ("embedding_topk", "literal query vector, per-partition k-heap"),
    ("media_decode_stats", "Arrow-batched mapInPandas decode"),
    ("pipeline_clean_corpus", "dedup semi-join -> quality gate -> rollup"),
    ("asof_last_purchase", "as-of join: union -> one window shuffle -> filter"),
    ("range_join_purchase_clicks", "range join: bucket explode -> hash join + residual"),
    ("embedding_near_dup_pairs", "blocked matmul: block-pair tasks -> applyInPandas"),
    ("chunk_documents", "expression explode chunking: no shuffle, no Python"),
    ("pack_documents_cumsum", "distributed global cumsum: proxy-quantile buckets, per-bucket window, broadcast offsets"),
    ("pack_documents_greedy", "exact first-fit: single-group applyInPandas kernel"),
    ("minhash_signatures_md5", "md5 lane hashes JVM-side -> Arrow min-fold -> posexplode"),
    ("decontaminate_docs", "eval n-gram hashes broadcast; corpus side never shuffles"),
    ("repetition_docs", "repetition signals: map-only scan, no Exchange, 2-col pruning"),
    ("mix_corpus_sources", "md5 mixture: single filtered scan, stratum IN pushed"),
    ("vocab_topk_docs", "explode -> partial+final agg -> top-k heap"),
    ("tfidf_top_terms", "two partial-combine aggs + rank window; 1-row ns broadcast"),
    ("fuzzy_part_names", "edit-distance join: length-band hash join, no cartesian"),
    ("repeated_lines_docs", "line dedup report: all-HashAggregate, string group keys"),
    ("strip_repeated_lines_docs", "boilerplate strip: hash-count -> flag join -> ordered rebuild"),
    ("unigram_logprob_docs", "corpus-LM score: token agg + 1-row broadcast total"),
    ("bloom_semi_orders", "bloom prune: broadcast bitmap row -> getbit filter -> semi join"),
    ("length_histogram_docs", "histogram: 1-row broadcast range -> bin -> partial+final agg"),
    ("resample_events_hourly", "dense spine: agg once -> per-group sequence explode -> gap join"),
    ("asof_nearest_purchase", "nearest as-of: backward+forward windows re-joined on left id"),
    ("skew_report_orders", "heavy keys: hash agg -> broadcast totals -> top-n heap"),
    ("standardize_prices", "grouped z-score: unbounded window, one shuffle"),
    # round 6
    ("minhash_lsh_pairs_md5", "banded LSH verification lane: exact value buckets, one shuffle"),
    ("ivf_probe_pinned", "pinned-centroid IVF: map-only assign -> cluster filter -> k-heap"),
    ("weighted_sample_docs", "ES weighted top-k: WindowGroupLimit cuts to k map-side"),
    ("cap_docs_per_source", "per-domain cap: md5-order rank, map-side group limit"),
    ("quality_quartiles_docs", "qcut: 1-buffer percentile -> broadcast bounds -> map-only fold"),
    ("describe_table", "describe: ONE wide agg, array percentiles (one buffer/column)"),
    ("xlsx_roundtrip_agg", "stdlib xlsx write/read roundtrip -> hash agg"),
    ("dedup_incremental_docs", "incremental dedup: batch keys anti-join the store, history never rescans"),
    ("near_dup_incremental_docs", "incremental near-dup: batch bands once, joins the LSH store on its bucket keys"),
    ("shard_report_docs", "md5-mod shard assignment: map-only expression -> partial+final agg"),
    ("pack_materialize_docs", "pack materialization: one groupBy, in-buffer array_sort, no corpus window"),
    ("dedup_best_quality_docs", "best-per-cluster dedup: pair-sized ranking window -> broadcast anti join"),
    # round 8
    ("shift_lag", "distributed global shift: quantile buckets -> boundary rows ghost through the main exchange -> per-bucket lag"),
    ("interpolate_linear", "distributed global interpolate: per-bucket windows (next-valid via DESC growing frame) + fused edge/offset carry"),
    ("rolling_1h", "distributed global rolling: fixed-width buckets -> ghost rows -> per-bucket range frame"),
    ("ivf_probe_partitioned", "on-disk IVF: cluster-partitioned store, probe prunes directories (PartitionFilters)"),
    ("ann_recall_report", "recall@k: broadcast query set, per-lane candidates, windowed top-k, ratio aggs"),
    ("funnel_events", "ordered funnel: k chained conditional-min aggregates, two scalars of per-user state"),
    ("funnel_events_windowed", "windowed funnel: max-chain-start fold, linear state vs the quadratic exists-join"),
    ("cohort_retention_daily", "cohort matrix: ONE (user,period) shuffle, collect_set + array_min + explode"),
    ("cms_heavy_tokens_md5", "count-min sketch: cell-bounded partial agg, broadcast estimation join"),
    ("zorder_roundtrip_agg", "z-order write roundtrip: literal quantile bands (sampler-safe), JVM bit interleave, range exchange"),
    ("hll_distinct_users_md5", "HyperLogLog: bit-smear ranks, register-bounded partial max, exact-BIGINT harmonic estimate"),
    ("bm25_docs", "BM25: map-only doc lengths, query-filtered postings, broadcast stats, k-heap on rounded score"),
    ("outlier_events_value", "median/MAD fences: two percentile windows over ONE exchange"),
    ("bottomk_sample_docs", "bottom-k sample: md5 permutation, WindowGroupLimit map-side cut"),
    ("weighted_merge_docs", "weighted-sample merge law: k-frame union -> dedup -> rank, shuffle carries k rows"),
    ("hll_overlap_users_md5", "pairwise HLL overlap: register broadcast joins, union-max per pair, sketch-sized stages"),
    ("embedding_covariance_upper", "PCA covariance: constant-size moment partials, dim^2 reduce, broadcast assembly"),
    ("pca_label_summary", "PCA projection: literal components, zip_with dots, no Python and no Exchange pre-agg"),
    ("pca_project_pinned", "pinned-component PCA projection: literal mean/components, JVM zip_with dots, map-only"),
    ("pq_probe_pinned", "PQ ANN: literal codebooks, argmin encode + ADC lookup adds, no vector read at query"),
    ("drift_psi_prices", "PSI drift: two scans fold to bins-row partials, broadcast spine joins, smoothed terms"),
    ("drift_categorical_events", "categorical PSI: per-value partials -> top-k+other broadcast buckets -> smoothed terms"),
    ("drift_multi_lineitem", "k-column PSI in one scan per side: map-side (col,bin) explode, k*bins-row exchange"),
    # round 9 continuation
    ("dsir_weights_docs", "DSIR weights: one scan+explode to (doc,bucket) partials, B-row broadcast model join"),
    ("dsir_sample_docs", "DSIR Gumbel top-k: md5 uniform, log-weight shift, TakeOrdered heap"),
    ("gopher_rules_docs", "Gopher rules: all seven verdicts from JVM higher-order functions, map-only"),
    ("event_transitions_users", "Markov transitions: ONE user-partitioned lag window, broadcast row totals"),
    ("top_paths_events", "top paths: WindowGroupLimit map-side cut, fold reuses the window's partitioning"),
    ("mix_temperature_docs", "temperature mixing: count agg + two 1-row broadcast folds + md5 threshold scan"),
    ("zipf_docs", "Zipf fit: explode to counts, TakeOrdered heap, regr_* fold over k rows"),
    ("hist_quantiles_events", "histogram quantiles: bins-row partial agg, covering-bin broadcast join"),
    ("snapshot_diff_docs", "rebuild diff: ONE null-safe full outer join, all counts in one aggregate"),
    ("lang_mix_docs", "language mixing: doc + per-line langid argmax, one id-keyed fold"),
    # round 10
    ("concat_horizontal", "distributed row positions: proxy-quantile buckets -> per-bucket row_number + broadcast offsets, position full-outer join"),
    ("oov_report_docs", "OOV report: explode -> broadcast vocab left join -> id-keyed fold, tokenless docs survive"),
    ("dsir_ess_docs", "Kish ESS: B-row broadcast model scoring, 1-row max shift, 1-row ratio fold"),
    ("c4_rules_docs", "C4 rules: one map-only scan, higher-order line filters + page verdicts"),
    ("ccnet_buckets_docs", "CCNet tertiles: one cached LM pass -> languages-row percentile agg -> broadcast threshold join, map-only label"),
    ("epoch_shuffle_docs", "per-epoch shuffle: md5 shard map-only, ONE exchange, per-shard row_number"),
    ("semdedup_pinned_vecs", "SemDedup: literal-centroid argmax map-only -> cluster equi-join pairs -> loser anti flag"),
    ("mixture_order_docs", "stride-scheduled mixture interleave: grouped_positions + global_positions lanes, two data exchanges total"),
    ("pipeline_curation_docs", "curation capstone: C4 verdicts + CCNet tail drop + exact dedup + epoch shuffle, one composed plan"),
    # bpe_merges_docs / bpe_incremental_docs / wordpiece_merges_docs /
    # pipeline_tokenize_pack_docs are NOT showcased: the
    # training loop runs eagerly (one 1-row argmax collect per round);
    # the returned merge table is a local relation. The per-round plan
    # (pair-count groupBy + TakeOrdered(1) + map-only fold rewrite) is
    # pinned by tests/test_bpe.py and the registry plan gate.
    # cluster_store_incremental_docs is NOT showcased: the fold runs
    # eagerly inside the query (two store swaps); the returned frame is
    # a bucketed-store read. The no-reshuffle probe plan is pinned in
    # tests/test_cluster_store.py.
    # quality_report_lineitem is NOT showcased: check_report collects the
    # one-pass aggregate driver-side and re-wraps the tiny result, so its
    # "plan" is just a local scan; the single-agg property is pinned by
    # tests/test_quality.py::test_single_aggregation_for_whole_suite
    # -- round 10, second batch --
    ("ewma_user_values", "distributed EWMA: JVM affine summaries + carry fold, ONE Arrow pass per bucket"),
    ("decayed_sum_events", "half-life decayed sum: fixed time buckets, RANGE-frame prefix, gap-aware JVM carry fold — zero Python"),
    ("rank_family_events", "rank/dense_rank/cume_dist at key cardinality + ntile from global positions"),
    ("decontaminate_semantic_vecs", "semantic decontamination: broadcast eval NLJ inside the corpus scan, flagged-pair-sized exchange"),
    ("quality_classifier_docs", "hashed classifier scoring: broadcast (bucket, weight) join + per-doc reduction, pure JVM"),
    ("classifier_eval_docs", "rank-sum AUC + thresholded metrics over the persisted scored fork"),
    ("kll_by_lang_docs", "keyed KLL: compaction windows per (lang, shard, level), quantile cut per group"),
    ("pipeline_observability_events", "observability capstone: rollup + keyed md5-HLL + half-life trend, three lanes joined on the hour bucket"),
    # -- round 11 --
    ("url_dedup_docs", "URL canonicalization + dedup: RFC 3986 regex/array work map-side, ONE slim (canonical, id) exchange"),
    ("url_dedup_incremental_docs", "incremental URL dedup: batch-internal min-id + anti join against the canonical-url history"),
    ("langid_classifier_docs", "trained langid scoring: char-n-gram explode, broadcast (lang, bucket, weight) join, (doc, lang) reduction, struct-max argmax"),
    ("unigram_fertility_docs", "unigram-LM E-step: substring lattice broadcast-joined to pieces, map-only Viterbi JVM fold, piece-sized count"),
    # unigram_lm_docs is NOT showcased: the scheduled trainer runs
    # eagerly (per-stage snapshots); each stage's E-step plan is the
    # unigram_fertility_docs shape above and is covered by the
    # registry plan gate.
    # rollup_hourly_events / rollup_distinct_hourly_events are NOT
    # showcased: the folds run eagerly inside the query (store swaps);
    # the served read is a bounded store scan. The map-side-combining
    # fold shape is pinned by the registry plan gate and
    # tests/test_rollup.py.
    # -- round 12 --
    ("html_extract_docs", "HTML→text extraction: the whole rewrite chain + block verdicts as ONE map-only projection, no shuffle"),
    ("pipeline_curation_docs", "curation capstone: html gate (map-only + slim id semi-join) -> URL dedup -> C4 -> CCNet -> content dedup -> epoch shard"),
    ("image_hashes_docs", "perceptual fingerprints: Arrow-batched mapInPandas, 8 bytes/image out"),
    ("phash_pairs_pinned", "Hamming-banded near-dup: byte-band bucket groupBy (ONE shuffle) -> pair explode -> fp joins -> XOR-popcount verify"),
    ("phash_dedup_incremental_docs", "incremental phash: batch bands vs store on (band, bucket), inline Hamming verify, no fetch-back join"),
    ("kll_quantiles_events", "KLL build as ONE window + closed-form fate CASE; quantile cut shares its Window with the group total"),
    ("langid_scores_docs", "vectorized langid scoring: broadcast weight-vector join x1, k scalar sums in one groupBy, map-only argmax"),
    ("image_dedup_docs", "image-dedup capstone: banded pairs -> cap-gated components -> quality-keep window"),
    # byte_bpe_merges_docs is NOT showcased: the trainer loops eagerly
    # (per-round 1-row argmax, the bpe_merges_docs exclusion); the
    # byte seeding is a map-only projection covered by the registry
    # plan gate.
]


def main() -> None:
    import __spark_entry__ as entry
    from dataframes_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="explain_report", cpus="8")
    qs = entry.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    out = [
        "# EXPLAIN — physical plans of the headline queries",
        "",
        f"Generated by `tools/explain_report.py` at `{sf_dir}`. The",
        "machine-checked version of these properties lives in",
        "`tests/test_plans.py`; this file is the human-readable audit trail.",
        "",
    ]
    for name, why in SHOWCASE:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        out += [f"## {name}", "", f"*{why}*", "", "```", plan.rstrip(), "```", ""]
    with open("/root/repo/EXPLAIN.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
