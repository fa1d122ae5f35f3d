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


def test_redact_scrubs_pii_forms(spark):
    from pyspark.sql import functions as F

    from dataframes_spark.functions.text import redact

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk now"),
            (2, "server at 192.168.1.250 port"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "account 1234567890 closed"),
            (5, "clean text stays clean"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r["out"] for r in df.select("id", redact(F.col("text")).alias("out")).collect()}
    assert rows[1] == "mail <EMAIL> now"
    assert rows[2] == "server at <IP> port"
    assert rows[3] == "call <PHONE> today"
    assert rows[4] == "account <NUM> closed"
    assert rows[5] == "clean text stays clean"


def test_assign_split_bands_and_growth_stability(spark):
    from dataframes_spark.operators.sample import assign_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    out = {r["id"]: r["split"] for r in assign_split(df, "id").collect()}
    frac_train = sum(1 for v in out.values() if v == "train") / 2000
    assert 0.96 < frac_train < 1.0
    assert set(out.values()) == {"train", "val", "test"}
    # growth stability: adding rows never moves an existing assignment
    bigger = spark.createDataFrame([(i,) for i in range(3000)], "id long")
    out2 = {r["id"]: r["split"] for r in assign_split(bigger, "id").collect()}
    assert all(out2[i] == out[i] for i in out)
    import pytest as _pt

    with _pt.raises(ValueError, match="sum to 1"):
        assign_split(df, "id", {"a": 0.5, "b": 0.4})
