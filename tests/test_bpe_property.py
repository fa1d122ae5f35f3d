"""Property-based invariants for BPE merge induction (functions/bpe.py)
against the pure-Python reference model over hypothesis-generated
corpora: learned merges, final type relation, fold law, and the encode
path. Small alphabets force dense pair collisions (ties, overlapping
runs like 'aaaa') — exactly where greedy-merge implementations drift."""

import collections

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dataframes_spark.functions import bpe


def _ref_bpe(texts, k):
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[w] += 1
    words = {w: list(w) + [bpe.END_MARKER] for w in vocab}
    merges = []
    for step in range(1, k + 1):
        counts = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += vocab[w]
        if not counts:
            break
        best_n = max(counts.values())
        lhs, rhs = min(p for p, n in counts.items() if n == best_n)
        merges.append((step, lhs, rhs, lhs + rhs, best_n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


corpus = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=24).filter(
        lambda t: t.strip()
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=15, deadline=None)
@given(texts=corpus, k=st.integers(1, 4))
def test_learn_matches_model_on_adversarial_corpora(spark, texts, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got, words = bpe.bpe_learn(df, "text", k)
    want, ref_words = _ref_bpe(texts, k)
    assert [
        (m["step"], m["lhs"], m["rhs"], m["merged"], m["n"]) for m in got
    ] == want
    assert {r["word"]: r["syms"] for r in words.collect()} == ref_words


@settings(max_examples=10, deadline=None)
@given(texts=corpus, k=st.integers(1, 3), mod=st.integers(2, 3))
def test_fold_law_any_split(spark, texts, k, mod):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    one = bpe.word_type_counts(df, "text")
    folded = None
    for i in range(mod):
        part = bpe.word_type_counts(
            df.filter(F.col("doc_id") % mod == i), "text"
        )
        folded = part if folded is None else bpe.merge_type_counts(folded, part)
    m1, _ = bpe.bpe_learn_from_counts(one, k)
    m2, _ = bpe.bpe_learn_from_counts(folded, k)
    assert m1 == m2


@settings(max_examples=10, deadline=None)
@given(texts=corpus, k=st.integers(1, 3))
def test_segment_reproduces_training_types(spark, texts, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, words = bpe.bpe_learn(df, "text", k)
    final = {r["word"]: r["syms"] for r in words.collect()}
    seg = bpe.bpe_segment(df, "text", "doc_id", merges)
    for r in seg.collect():
        w = texts[r["doc_id"]].lower().split()[r["word_index"]]
        assert r["tokens"] == final[w], (w, merges)
