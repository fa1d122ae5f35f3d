"""Corpus-unigram LM scoring (functions/text.py unigram_logprob):
hand-computed probabilities on a three-document corpus, including the
null-text survival rule."""

import math

from dataframes_spark.functions import text


def test_unigram_logprob_hand_values(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a"), (3, None)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in text.unigram_logprob(df, "text", "doc_id").collect()}
    # tokens: doc1 -> a a b, doc2 -> a; doc3 (null text) has NO tokens —
    # it drops from the result rather than injecting a phantom '' token
    # into the vocabulary and corpus total. counts: a=3, b=1, T=4.
    assert len(out) == 2 and 3 not in out
    assert out[1].n_tokens == 3
    assert out[2].n_tokens == 1
    assert out[1].avg_logprob == round(
        (2 * math.log(3 / 4) + math.log(1 / 4)) / 3, 6
    )
    assert out[2].avg_logprob == round(math.log(3 / 4), 6)
    # the rarer-token document scores lower
    assert out[1].avg_logprob < out[2].avg_logprob


def test_unigram_logprob_empty_doc_no_model_mass(spark):
    # a whitespace-only doc must not perturb other documents' scores
    base = spark.createDataFrame([(1, "a a b"), (2, "a")], ["doc_id", "text"])
    with_blank = spark.createDataFrame(
        [(1, "a a b"), (2, "a"), (3, "   ")], ["doc_id", "text"]
    )
    s1 = {r.doc_id: r.avg_logprob for r in text.unigram_logprob(base, "text", "doc_id").collect()}
    s2 = {r.doc_id: r.avg_logprob for r in text.unigram_logprob(with_blank, "text", "doc_id").collect()}
    assert s1 == s2


def test_unigram_logprob_case_fold(spark):
    df = spark.createDataFrame([(1, "Word word"), (2, "WORD")], ["doc_id", "text"])
    out = {r.doc_id: r for r in text.unigram_logprob(df, "text", "doc_id").collect()}
    # case-folded: every token is 'word', p = 1, logprob = 0
    assert out[1].avg_logprob == 0.0
    assert out[2].avg_logprob == 0.0


# ---------------------------------------------------------------------------
# bigram LM (functions/text.py bigram_logprob)
# ---------------------------------------------------------------------------


def test_bigram_logprob_hand_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a"), (3, None)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r for r in text.bigram_logprob(df, "text", "doc_id").collect()
    }
    # corpus: tokens a,b,a,b,a -> c1: a=3, b=2; V=2; N=5
    # bigrams (doc1): (a,b)x2, (b,a)x1 -> c2: (a,b)=2, (b,a)=1
    a = 0.5
    p_first_a = (3 + a) / (5 + a * 2)  # unigram-smoothed first token
    p_ab = (2 + a) / (3 + a * 2)  # c2(a,b)+a over c1(a)+aV
    p_ba = (1 + a) / (2 + a * 2)
    assert len(out) == 2 and 3 not in out
    assert out[1].n_tokens == 4
    assert out[1].avg_logprob == round(
        (
            math.log(p_first_a)
            + 2 * math.log(p_ab)
            + math.log(p_ba)
        )
        / 4,
        6,
    )
    # single-token doc: first-token term only
    assert out[2].n_tokens == 1
    assert out[2].avg_logprob == round(math.log(p_first_a), 6)


def test_bigram_scores_impossible_transitions_below_unigram(spark):
    # both docs draw from the same unigram pool; doc 2's transitions
    # never occur in the corpus majority — the bigram model separates
    # them where the unigram model scores them identically
    rows = [(i, "the cat sat on the mat") for i in range(1, 9)]
    rows.append((9, "mat the on sat cat the"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uni = {
        r.doc_id: r.avg_logprob
        for r in text.unigram_logprob(df, "text", "doc_id").collect()
    }
    bi = {
        r.doc_id: r.avg_logprob
        for r in text.bigram_logprob(df, "text", "doc_id").collect()
    }
    assert uni[9] == uni[1]
    assert bi[9] < bi[1]


def test_bigram_logprob_blank_doc_no_model_mass(spark):
    base = spark.createDataFrame(
        [(1, "a b a"), (2, "b a")], ["doc_id", "text"]
    )
    with_blank = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "   ")], ["doc_id", "text"]
    )
    s1 = {
        r.doc_id: r.avg_logprob
        for r in text.bigram_logprob(base, "text", "doc_id").collect()
    }
    s2 = {
        r.doc_id: r.avg_logprob
        for r in text.bigram_logprob(with_blank, "text", "doc_id").collect()
    }
    assert s1 == s2
