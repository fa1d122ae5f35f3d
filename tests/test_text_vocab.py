"""vocab_topk and tfidf_top_terms semantics on constructed corpora."""

import math

import pytest

from dataframes_spark.functions import text as dtext
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


def test_split_by_cluster_no_straddle_and_singleton_parity(spark):
    from dataframes_spark.operators.sample import assign_split, split_by_cluster

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "id long, text string"
    )
    # clusters: {0,1,2} (chained), {10,11}; everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["id"]: (r["rep"], r["split"])
        for r in split_by_cluster(docs, "id", pairs).collect()
    }
    assert len(out) == 200
    # transitive closure labels with the min id; whole cluster co-splits
    assert out[0][0] == out[1][0] == out[2][0] == 0
    assert out[0][1] == out[1][1] == out[2][1]
    assert out[10][0] == out[11][0] == 10
    assert out[10][1] == out[11][1]
    # singletons are their own representative and match plain assign_split
    plain = {
        r["id"]: r["split"] for r in assign_split(docs, "id").collect()
    }
    for i in range(200):
        if i not in (1, 2, 11):
            assert out[i][0] == i
            assert out[i][1] == plain[i]
    # clustered non-representatives inherit the REPRESENTATIVE's band
    assert out[1][1] == plain[0] and out[11][1] == plain[10]


def _bm25_ref(docs, query_terms, k1=1.2, b=0.75):
    """Independent textbook BM25 for cross-checking the Spark plan."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dft = {
        q: sum(1 for v in toks.values() if q in v) for q in query_terms
    }
    out = {}
    for i, v in toks.items():
        s = 0.0
        for q in query_terms:
            tf = v.count(q)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dft[q] + 0.5) / (dft[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s:
            out[i] = s
    return out


def test_bm25_matches_reference_arithmetic(spark):
    from dataframes_spark.functions.text import bm25_topk

    docs = [
        (1, "hash join hash join hash"),
        (2, "hash join vector scan filter sort merge batch row column"),
        (3, "vector vector vector"),
        (4, "scan filter sort"),
        (5, "hash"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.bm25
        for r in bm25_topk(df, "text", "doc_id", "hash vector", k=10).collect()
    }
    ref = _bm25_ref(docs, ["hash", "vector"])
    assert set(got) == set(ref)  # only matching docs appear
    for i in ref:
        assert got[i] == pytest.approx(ref[i], abs=1e-6)
    # per-doc term count and length-normalization sanity: doc 5 (short,
    # tf=1) outranks nothing with tf>=2 but appears with one term
    rows = {
        r.doc_id: r
        for r in bm25_topk(df, "text", "doc_id", "hash vector", k=10).collect()
    }
    assert rows[2].n_terms == 2 and rows[5].n_terms == 1


def test_bm25_topk_truncation_and_ties(spark):
    from dataframes_spark.functions.text import bm25_topk

    # identical docs -> identical scores; tie broken by doc_id, k cuts
    df = spark.createDataFrame(
        [(i, "alpha beta") for i in range(10)] + [(99, "alpha alpha beta")],
        "doc_id long, text string",
    )
    out = bm25_topk(df, "text", "doc_id", "alpha", k=3).collect()
    assert [r.doc_id for r in out] == [99, 0, 1]  # higher tf first, then ids


def test_bm25_nulls_and_validation(spark):
    from dataframes_spark.functions.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "hash join"), (2, None), (3, "   ")], "doc_id long, text string"
    )
    out = bm25_topk(df, "text", "doc_id", ["HASH"], k=5).collect()
    assert [r.doc_id for r in out] == [1]  # null/blank docs never match
    # ...but they DO count toward N and avgdl cannot divide by zero
    assert out[0].dl == 2
    with pytest.raises(ValueError, match="at least one"):
        bm25_topk(df, "text", "doc_id", [])
    with pytest.raises(ValueError, match="k >= 1"):
        bm25_topk(df, "text", "doc_id", "hash", k=0)


def test_bm25_plan_is_topk_heap_with_broadcasts(spark):
    from dataframes_spark.functions.text import bm25_topk

    df = spark.createDataFrame(
        [(i, "hash join vector") for i in range(100)], "doc_id long, text string"
    )
    out = bm25_topk(df, "text", "doc_id", "hash vector", k=5)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p  # k-heap, never a global sort
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    # the only SinglePartition shape is the sanctioned 1-row stats agg:
    # the scale gate's plan_report must see nothing to warn about
    from dataframes_spark.plan import plan_report

    assert plan_report(out)["warnings"] == []


def test_zipf_report_recovers_powerlaw_slope(spark):
    # construct an exactly Zipfian corpus: token t_r appears
    # round(1000 / r) times -> slope ~= -1, r2 ~= 1
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * round(1000 / r)
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    row = dtext.zipf_report(df, "text", k=20).collect()[0]
    assert row["n_tokens_ranked"] == 20
    assert abs(row["slope"] + 1.0) < 0.05
    assert row["r2"] > 0.99


def test_zipf_report_flat_corpus_scores_far_from_language(spark):
    # uniform frequencies -> slope 0
    df = spark.createDataFrame(
        [(1, (" ".join(f"t{i}" for i in range(50)) + " ") * 3)],
        "doc_id long, text string",
    )
    row = dtext.zipf_report(df, "text", k=50).collect()[0]
    assert abs(row["slope"]) < 1e-9


def test_lang_mix_report_semantics(spark):
    df = spark.createDataFrame(
        [
            # en doc with one Spanish line -> 1/3 foreign
            (1, "the cat is that and of\nthe dog is with and that\n"
                "el perro la casa de que"),
            # empty doc survives with zero lines
            (2, ""),
            # und lines never count as foreign
            (3, "xyz qrs tuv\nthe cat is that and of"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in dtext.lang_mix_report(
        df, "text", "doc_id").collect()}
    assert rows[1]["doc_lang"] == "en"
    assert rows[1]["n_lines"] == 3 and rows[1]["n_foreign"] == 1
    assert rows[1]["mix_frac"] == pytest.approx(0.333333)
    assert rows[2]["n_lines"] == 0 and rows[2]["mix_frac"] == 0.0
    # doc 3: doc guess en (the en line dominates); the und line is not
    # foreign
    assert rows[3]["doc_lang"] == "en" and rows[3]["n_foreign"] == 0


def test_oov_report_counts_and_edges(spark):
    docs = spark.createDataFrame(
        [(1, "the cat THE bat"), (2, "zzz qqq"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("the",), ("cat",)], "token string")
    rows = {r["doc_id"]: r.asDict() for r in dtext.oov_report(
        docs, "text", "doc_id", vocab).collect()}
    # case-insensitive: THE is in-vocab; bat is OOV
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_oov"] == 1
    assert rows[1]["oov_frac"] == pytest.approx(0.25)
    assert rows[2]["n_oov"] == 2 and rows[2]["oov_frac"] == 1.0
    # tokenless docs survive with zeros
    assert rows[3]["n_tokens"] == 0 and rows[3]["oov_frac"] == 0.0
    assert rows[4]["n_tokens"] == 0


def test_oov_report_against_corpus_vocab(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = dtext.vocab_topk(docs, "text", k=30).select("token")
    out = dtext.oov_report(docs, "text", "doc_id", vocab)
    assert out.count() == docs.count()
    fr = [r["oov_frac"] for r in out.collect()]
    assert all(0.0 <= f <= 1.0 for f in fr)
