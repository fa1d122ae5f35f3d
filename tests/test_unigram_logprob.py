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
