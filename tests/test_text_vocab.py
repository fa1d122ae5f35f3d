"""vocab_topk and tfidf_top_terms semantics on constructed corpora."""

import math

import pytest

from dataframes_spark.functions.text import tfidf_top_terms, vocab_topk


def test_vocab_topk_counts_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "b a b"), (2, "A c b")], "id long, text string"
    )
    rows = vocab_topk(df, "text", k=2).collect()
    # lowercased: b=3, a=2, c=1 -> top-2 [b, a]
    assert [(r["token"], r["n"]) for r in rows] == [("b", 3), ("a", 2)]
    # tie at n=1 broken by token asc
    rows = vocab_topk(df, "text", k=10).collect()
    assert [r["token"] for r in rows] == ["b", "a", "c"]


def test_tfidf_ranks_group_exclusive_terms_first(spark):
    df = spark.createDataFrame(
        [
            ("s1", "common unique1 common"),
            ("s2", "common unique2"),
        ],
        "source string, text string",
    )
    out = tfidf_top_terms(df, "text", "source", k=2)
    rows = {(r["source"], r["rnk"]): r for r in out.collect()}
    # the group-exclusive term wins rank 1 in each source
    assert rows[("s1", 1)]["token"] == "unique1"
    assert rows[("s2", 1)]["token"] == "unique2"
    assert rows[("s1", 1)]["tfidf"] == pytest.approx(math.log(2), abs=1e-6)
    # the everywhere-term scores idf = ln(2/2) = 0
    assert rows[("s1", 2)]["token"] == "common"
    assert rows[("s1", 2)]["tfidf"] == 0.0
    # tf/df are exact counts
    assert rows[("s1", 2)]["tf"] == 2 and rows[("s1", 2)]["df"] == 2
