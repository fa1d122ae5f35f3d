"""C4 cleaning heuristics (functions/text.py c4_rules / c4_clean,
Raffel et al. 2020 §2.2) and CCNet perplexity buckets
(perplexity_buckets, Wenzek et al. 2020): each rule's verdict on
documents engineered to exercise exactly that rule, and the tertile
bucketing's rank semantics."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.functions import text as T

GOOD = (
    "the quick brown fox jumps over the lazy dog today.\n"
    "a second sentence with plenty of words arrives right here.\n"
    "and a third sentence closes out the page very nicely."
)


def _rules(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = T.c4_rules(df, "text", "doc_id", **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_good_page_passes_all(spark):
    r = _rules(spark, [(1, GOOD)])[1]
    assert r["pass_all"] == 1
    assert r["n_lines"] == 3 and r["n_kept_lines"] == 3
    assert r["n_sentences"] == 3
    assert r["kept_frac"] == 1.0


def test_line_needs_terminal_punctuation(spark):
    # middle line has no terminal mark -> dropped -> only 2 sentences
    doc = GOOD.replace("arrives right here.", "arrives right here")
    r = _rules(spark, [(1, doc)])[1]
    assert r["n_kept_lines"] == 2
    assert r["pass_sentences"] == 0 and r["pass_all"] == 0


def test_line_needs_min_words(spark):
    doc = GOOD + "\ntoo short."
    r = _rules(spark, [(1, doc)])[1]
    assert r["n_lines"] == 4 and r["n_kept_lines"] == 3


def test_javascript_line_dropped(spark):
    doc = GOOD + "\nplease enable javascript to view this page."
    r = _rules(spark, [(1, doc)])[1]
    assert r["n_kept_lines"] == 3  # the js line is filtered
    assert r["pass_all"] == 1  # page-level verdicts unaffected


def test_lorem_and_brace_fail_the_page(spark):
    r = _rules(
        spark,
        [
            (1, GOOD + "\nlorem ipsum dolor sit amet consectetur."),
            (2, GOOD + "\nvar x = { a: 1 }; code follows here."),
            (3, GOOD),
        ],
    )
    assert r[1]["pass_lorem"] == 0 and r[1]["pass_all"] == 0
    assert r[2]["pass_brace"] == 0 and r[2]["pass_all"] == 0
    assert r[3]["pass_all"] == 1


def test_quote_is_terminal_and_blank_page_survives(spark):
    quoted = (
        'he said "this is a fine quoted sentence ending well."\n'
        'she replied "indeed it is and here are more words."\n'
        'they agreed "a third line closes the page properly."'
    )
    r = _rules(spark, [(1, quoted), (2, ""), (3, None)])
    assert r[1]["n_kept_lines"] == 3 and r[1]["pass_all"] == 1
    assert r[2]["n_lines"] == 0 and r[2]["pass_sentences"] == 0
    assert r[3]["n_lines"] == 0  # null text reports, never drops


def test_c4_clean_keeps_surviving_lines_of_passing_pages(spark):
    df = spark.createDataFrame(
        [
            (1, GOOD + "\nno terminal mark on this trailing line"),
            (2, "lorem ipsum dolor sit amet.\n" + GOOD),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in T.c4_clean(df, "text", "doc_id").collect()
    }
    assert set(out) == {1}  # page 2 fails the lorem rule
    assert out[1] == GOOD  # failing line stripped, survivors rejoined


def test_perplexity_buckets_tertiles_per_language(spark):
    # 9 docs per lang; within a lang, docs built from tokens of
    # decreasing corpus frequency score monotonically lower
    rows = []
    for li, lang in enumerate(("aa", "bb")):
        for i in range(9):
            # common token repeated, then increasingly rare fillers
            toks = ["common"] * (9 - i) + [f"rare{li}_{i}"] * (i + 1)
            rows.append((li * 100 + i, lang, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = T.perplexity_buckets(df, "text", "doc_id", "lang")
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    for li in (0, 100):
        buckets = [got[li + i] for i in range(9)]
        # likelihood decreases with i -> head first, tail last
        assert buckets[0] == "head" and buckets[8] == "tail"
        assert buckets.index("middle") < buckets.index("tail")
        # strictly above each threshold -> 3/3/3 won't hold exactly at
        # ties, but with distinct scores the tertiles are balanced
        assert sorted(buckets) == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_perplexity_buckets_approx_path_runs(spark):
    df = spark.createDataFrame(
        [(i, "aa", f"tok{i % 3} tok{i % 5}") for i in range(12)],
        "doc_id long, lang string, text string",
    )
    out = T.perplexity_buckets(df, "text", "doc_id", "lang", approx=True)
    assert out.count() == 12
    assert set(out.columns) == {
        "doc_id", "lang", "n_tokens", "avg_logprob", "bucket",
    }


def test_perplexity_buckets_single_lm_pass_when_persisted(spark):
    """persist=True (default) shares ONE cached scored relation between
    the threshold branch and the output — the corpus is scanned once;
    persist=False keeps the pure two-pass plan (no cache)."""
    df = spark.createDataFrame(
        [(i, "aa", f"tok{i % 5} tok{i % 3} filler") for i in range(30)],
        "doc_id long, lang string, text string",
    )
    out = T.perplexity_buckets(df, "text", "doc_id", "lang")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2  # both branches read it
    # the pure path over DIFFERENT data (cache substitution would kick
    # in for an identical subtree regardless of the persist flag)
    df2 = spark.createDataFrame(
        [(i, "bb", f"word{i % 7} word{i % 2} pad") for i in range(24)],
        "doc_id long, lang string, text string",
    )
    pure = T.perplexity_buckets(df2, "text", "doc_id", "lang", persist=False)
    pure.collect()
    plan2 = pure._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan2
