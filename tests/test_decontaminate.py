"""Eval-set decontamination (operators/decontaminate.py)."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators import decontaminate as dc


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "The QUICK brown fox, jumps over the lazy dog!!!"),  # case/punct twin
        (3, "a completely different document about spark plans"),
        (4, "short doc"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def evals(spark):
    return spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )


def test_flags_normalized_overlap(corpus, evals):
    rep = {
        r.id: r.n_hits
        for r in dc.contamination_report(
            corpus, evals, "text", "doc_id", n=8
        ).collect()
    }
    # docs 1 and 2 share the eval 8-gram after normalization; 3-5 do not
    assert set(rep) == {1, 2}
    assert all(v >= 1 for v in rep.values())


def test_decontaminate_drops_flagged_rows_only(corpus, evals):
    kept = sorted(
        r.doc_id
        for r in dc.decontaminate(corpus, evals, "text", "doc_id", n=8).collect()
    )
    assert kept == [3, 4, 5]


def test_short_and_empty_docs_yield_no_ngrams(spark):
    df = spark.createDataFrame([(1, "one two three"), (2, "")], ["i", "t"])
    out = df.select(dc.word_ngrams(F.col("t"), 4).alias("g")).collect()
    assert all(r.g == [] for r in out)


def test_ngrams_are_distinct_and_normalized(spark):
    df = spark.createDataFrame([(1, "A b; a B. a b")], ["i", "t"])
    [r] = df.select(dc.word_ngrams(F.col("t"), 2).alias("g")).collect()
    assert sorted(r.g) == ["a b", "b a"]


def test_corpus_side_never_shuffles_before_flagging(spark, corpus, evals):
    """The contamination join must be planned broadcast: the only
    Exchanges allowed are the eval-side broadcast and the final
    (contaminated-only) aggregate — no shuffle of corpus n-grams."""
    import re

    rep = dc.contamination_report(corpus, evals, "text", "doc_id", n=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = rep._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    # the only shuffle Exchanges are the eval-side distinct (small side)
    # and the flagged-only groupBy — never the corpus n-gram relation,
    # whose branch must run scan -> generate -> broadcast-join unbroken
    shuffles = re.findall(r"\(\d+\) Exchange", p)
    assert len(shuffles) == 2, p
    # corpus branch: nothing between its scan and the join but the
    # n-gram Generate/Project chain
    tree = p.split("(1) Scan")[0]
    corpus_branch = tree.split("BroadcastExchange")[0]
    assert "Exchange" not in corpus_branch.split("BroadcastHashJoin")[-1], p


def test_word_ngrams_match_python_model_property(spark):
    """Hypothesis-driven parity with a direct Python model of the
    normalize -> split -> n-gram rule (one Spark job for all examples)."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    texts_strategy = st.lists(
        st.text(alphabet="aB c.!2\n", min_size=0, max_size=30),
        min_size=1,
        max_size=5,
    )

    def py_ngrams(text: str, n: int) -> list[str]:
        words = _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")
        if len(words) - (n - 1) <= 0:
            return []
        seen, out = set(), []
        for i in range(len(words) - n + 1):
            g = " ".join(words[i : i + n])
            if g not in seen:
                seen.add(g)
                out.append(g)
        return out

    @settings(max_examples=20, deadline=None)
    @given(texts=texts_strategy, n=st.integers(1, 4))
    def check(texts, n):
        df = spark.createDataFrame(list(enumerate(texts)), ["i", "t"])
        got = {
            r.i: list(r.g)
            for r in df.select(
                "i", dc.word_ngrams(F.col("t"), n).alias("g")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == py_ngrams(t, n), (t, n)

    check()


def test_eval_frame_needs_no_id_column(spark, corpus):
    """Benchmark frames carry their own schemas; the eval side must work
    with only a text column (no corpus id column present)."""
    evals = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",)], ["text"]
    )
    rep = dc.contamination_report(corpus, evals, "text", "doc_id", n=8)
    assert {r.id for r in rep.collect()} == {1, 2}


def _vec_df(spark, rows, id_name="vid"):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_name, T.LongType()),
            T.StructField("emb", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_semantic_report_exact_flags_and_argmax(spark):
    from dataframes_spark.operators.decontaminate import (
        semantic_contamination_report,
    )

    corpus = _vec_df(
        spark,
        [
            (1, [1.0, 0.0]),       # exact leak of eval 10
            (2, [0.9, 0.1]),       # near eval 10
            (3, [0.0, 1.0]),       # exact leak of eval 11
            (4, [-1.0, 0.0]),      # anti-correlated: clean
            (5, [0.7, 0.7]),       # equidistant: ties at cos(45°)
        ],
    )
    evals = _vec_df(
        spark, [(10, [1.0, 0.0]), (11, [0.0, 1.0])], id_name="eid"
    )
    rep = {
        r.id: (r.eval_id, r.cosine)
        for r in semantic_contamination_report(
            corpus, evals, "emb", "vid", threshold=0.6,
            eval_vec_col="emb", eval_id_col="eid",
        ).collect()
    }
    assert set(rep) == {1, 2, 3, 5}
    assert rep[1][0] == 10 and rep[1][1] == pytest.approx(1.0)
    assert rep[2][0] == 10 and rep[2][1] == pytest.approx(0.9938837,
                                                          abs=1e-6)
    assert rep[3][0] == 11
    # exact cosine tie -> larger eval id, deterministically
    assert rep[5][0] == 11 and rep[5][1] == pytest.approx(0.70710678,
                                                          abs=1e-7)


def test_semantic_decontaminate_drops_flagged_only(spark):
    from dataframes_spark.operators.decontaminate import (
        decontaminate_semantic,
    )

    corpus = _vec_df(
        spark,
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]),
         (4, [0.0, -1.0])],
    )
    evals = _vec_df(spark, [(10, [1.0, 0.0])], id_name="eid")
    kept = sorted(
        r.vid
        for r in decontaminate_semantic(
            corpus, evals, "emb", "vid", threshold=0.9,
            eval_vec_col="emb", eval_id_col="eid",
        ).collect()
    )
    assert kept == [2, 3, 4]


def test_semantic_bucketed_mode_subset_of_exact(spark):
    """num_planes > 0 prunes to same-bucket pairs: every flag it raises
    is a true exact-mode flag (precision 1, recall <= 1), and
    self-leaks (identical vectors, same bucket by construction) are
    always caught."""
    import random

    from dataframes_spark.operators.decontaminate import (
        semantic_contamination_report,
    )

    rnd = random.Random(7)
    vecs = [
        (i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(40)
    ]
    corpus = _vec_df(spark, vecs)
    evals = _vec_df(
        spark, [(100 + i, v) for i, v in vecs[:5]], id_name="eid"
    )
    exact = {
        r.id
        for r in semantic_contamination_report(
            corpus, evals, "emb", "vid", threshold=0.5,
            eval_vec_col="emb", eval_id_col="eid",
        ).collect()
    }
    bucketed = {
        r.id
        for r in semantic_contamination_report(
            corpus, evals, "emb", "vid", threshold=0.5,
            eval_vec_col="emb", eval_id_col="eid", num_planes=4,
        ).collect()
    }
    assert bucketed <= exact
    assert set(range(5)) <= bucketed  # identical vecs share buckets


def test_semantic_exact_plan_never_shuffles_corpus(spark):
    from dataframes_spark.operators.decontaminate import (
        semantic_contamination_report,
    )
    from dataframes_spark.plan import plan_report

    corpus = _vec_df(spark, [(i, [float(i), 1.0]) for i in range(20)])
    evals = _vec_df(spark, [(1, [1.0, 0.0])], id_name="eid")
    rep = plan_report(
        semantic_contamination_report(
            corpus, evals, "emb", "vid", threshold=0.9,
            eval_vec_col="emb", eval_id_col="eid",
        )
    )
    # eval side broadcast; the only exchange is the flagged-pair agg
    assert rep["cartesian_products"] == 0
    assert rep["row_python_udf_nodes"] == 0
    assert rep["broadcast_exchanges"] >= 1


def test_semantic_zero_norm_corpus_flagged_not_silent(spark):
    """A zero-norm (or NULL) corpus embedding is unscreenable — it must
    surface as a diagnostic flag row (eval_id/cosine NULL) and be
    DROPPED by decontaminate_semantic (fail closed), never silently
    kept because its cosine went NULL."""
    from dataframes_spark.operators.decontaminate import (
        decontaminate_semantic,
        semantic_contamination_report,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 0.0]),       # zero norm: unscreenable
            (3, None),             # NULL embedding: unscreenable
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    evals = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rep = {
        r.id: (r.eval_id, r.cosine)
        for r in semantic_contamination_report(
            corpus, evals, "embedding", "vec_id", threshold=0.9
        ).collect()
    }
    assert rep[1] == (100, pytest.approx(1.0))
    assert rep[2] == (None, None)
    assert rep[3] == (None, None)
    assert 4 not in rep  # orthogonal, screened, clean
    kept = sorted(
        r.vec_id
        for r in decontaminate_semantic(
            corpus, evals, "embedding", "vec_id", threshold=0.9
        ).collect()
    )
    assert kept == [4]
    # the bucketed screening mode carries the same diagnostic
    rep_lsh = {
        r.id: (r.eval_id, r.cosine)
        for r in semantic_contamination_report(
            corpus, evals, "embedding", "vec_id", threshold=0.9, num_planes=2
        ).collect()
    }
    assert rep_lsh[2] == (None, None) and rep_lsh[3] == (None, None)


def test_semantic_zero_norm_eval_raises(spark):
    """A zero-norm eval vector breaks the screen's contract (nothing
    can ever match it) — the plan raises at execution time."""
    from dataframes_spark.operators.decontaminate import (
        semantic_contamination_report,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    evals = spark.createDataFrame(
        [(100, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="zero-norm or NULL eval"):
        semantic_contamination_report(
            corpus, evals, "embedding", "vec_id", threshold=0.5
        ).collect()
