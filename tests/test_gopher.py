"""Gopher filtering rules (functions/text.py gopher_rules): each rule's
verdict on documents engineered to fail exactly that rule."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.functions import text as T

GOOD = (
    "the quick brown fox jumps over that lazy dog moving with great "
    "haste to be first among many animals of the forest and beyond "
) * 3  # ~60 words, mean len ~4, stopword-rich, no symbols


def _rules(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = T.gopher_rules(df, "text", "doc_id", **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_good_document_passes_all(spark):
    r = _rules(spark, [(1, GOOD)])[1]
    assert r["pass_all"] == 1
    assert all(v == 1 for k, v in r.items() if k.startswith("pass_"))


def test_word_count_bounds(spark):
    r = _rules(spark, [(1, "too short"), (2, GOOD)], min_words=50)
    assert r[1]["pass_word_count"] == 0 and r[2]["pass_word_count"] == 1
    # upper bound
    r = _rules(spark, [(1, GOOD)], max_words=10)
    assert r[1]["pass_word_count"] == 0


def test_mean_word_length_rule(spark):
    short = " ".join(["a b c d"] * 20)  # mean length 1
    long = " ".join(["pneumonoultramicroscopic"] * 60)  # mean length 24
    r = _rules(spark, [(1, short), (2, long), (3, GOOD)])
    assert r[1]["pass_word_len"] == 0
    assert r[2]["pass_word_len"] == 0
    assert r[3]["pass_word_len"] == 1


def test_symbol_ratio_counts_hashes_and_ellipses(spark):
    spam = GOOD + " " + "# " * 30  # 30 hashes over ~90+30 words
    r = _rules(spark, [(1, spam)])[1]
    assert r["pass_symbol"] == 0
    dots = GOOD + " w... x... y... z... " * 5
    r = _rules(spark, [(1, dots)])[1]
    assert r["symbol_ratio"] > 0


def test_symbol_ratios_are_per_symbol_not_summed(spark):
    # Rae et al. 2021 A1.1 rejects when the ratio exceeds 0.1 "for
    # either the hash symbol or the ellipsis" — 0.06 of each passes
    # (a summed 0.12 would wrongly fail), while 0.12 of one fails.
    words = " ".join(["w%d" % i for i in range(100)])
    mild = words + " " + "# " * 6 + "... " * 6  # 6/112 ≈ 0.054 each
    hot = words + " " + "# " * 13  # 13/113 ≈ 0.115 hash alone
    r = _rules(spark, [(1, mild), (2, hot)], min_words=10)
    assert r[1]["pass_symbol"] == 1
    assert r[2]["pass_symbol"] == 0
    # symbol_ratio reports the max of the two per-symbol ratios
    assert r[1]["symbol_ratio"] == pytest.approx(6 / 112.0, abs=1e-6)


def test_unicode_ellipsis_counts_in_symbol_ratio(spark):
    words = " ".join(["w%d" % i for i in range(20)])
    uni = words + " " + "… " * 5  # 5/25 = 0.2 ellipsis ratio
    r = _rules(spark, [(1, uni)], min_words=5)
    assert r[1]["pass_symbol"] == 0
    assert r[1]["symbol_ratio"] == pytest.approx(0.2, abs=1e-6)


def test_bullet_and_ellipsis_line_fractions(spark):
    bullets = "\n".join(["- item %d etc" % i for i in range(10)])
    r = _rules(spark, [(1, bullets)])[1]
    assert r["bullet_frac"] == 1.0 and r["pass_bullet"] == 0
    ell = "\n".join(["this line trails off..." for _ in range(10)])
    r = _rules(spark, [(1, ell)])[1]
    assert r["ellipsis_frac"] == 1.0 and r["pass_ellipsis"] == 0
    mixed = "plain line one\n- a bullet\nplain line two\nplain three"
    r = _rules(spark, [(1, mixed)])[1]
    assert r["bullet_frac"] == pytest.approx(0.25)
    assert r["pass_bullet"] == 1


def test_alpha_word_fraction(spark):
    nums = " ".join(["1234 5678 9#@! %%%"] * 20)
    r = _rules(spark, [(1, nums)])[1]
    assert r["alpha_frac"] == 0.0 and r["pass_alpha"] == 0


def test_stopword_rule_needs_two_distinct(spark):
    one = " ".join(["the cat cat cat"] * 20)  # only 'the'
    two = " ".join(["the cat and dog"] * 20)  # 'the' + 'and'
    r = _rules(spark, [(1, one), (2, two)])
    assert r[1]["stop_hits"] == 1 and r[1]["pass_stopwords"] == 0
    assert r[2]["stop_hits"] == 2 and r[2]["pass_stopwords"] == 1


def test_empty_and_null_documents_fail_closed(spark):
    r = _rules(spark, [(1, ""), (2, None), (3, "   \n  \n ")])
    for d in (1, 2, 3):
        assert r[d]["n_words"] == 0
        assert r[d]["pass_all"] == 0


def test_report_aggregates_per_group(spark):
    df = spark.createDataFrame(
        [(1, GOOD, "a"), (2, "tiny", "a"), (3, GOOD, "b")],
        "doc_id long, text string, source string",
    )
    rep = T.gopher_report(df, "text", "doc_id", "source")
    rows = {r["source"]: r.asDict() for r in rep.collect()}
    assert rows["a"]["n_docs"] == 2 and rows["a"]["n_pass_all"] == 1
    assert rows["b"]["n_docs"] == 1 and rows["b"]["n_pass_all"] == 1
