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
    # tokens: doc1 -> a a b, doc2 -> a, doc3 -> '' (empty token; the doc
    # still scores instead of vanishing). counts: a=3, b=1, ''=1, T=5.
    assert len(out) == 3
    assert out[1].n_tokens == 3
    assert out[2].n_tokens == 1
    assert out[3].n_tokens == 1
    assert out[1].avg_logprob == round(
        (2 * math.log(3 / 5) + math.log(1 / 5)) / 3, 6
    )
    assert out[2].avg_logprob == round(math.log(3 / 5), 6)
    assert out[3].avg_logprob == round(math.log(1 / 5), 6)
    # rarer-token documents score lower
    assert out[3].avg_logprob < out[2].avg_logprob


def test_unigram_logprob_case_fold(spark):
    df = spark.createDataFrame([(1, "Word word"), (2, "WORD")], ["doc_id", "text"])
    out = {r.doc_id: r for r in text.unigram_logprob(df, "text", "doc_id").collect()}
    # case-folded: every token is 'word', p = 1, logprob = 0
    assert out[1].avg_logprob == 0.0
    assert out[2].avg_logprob == 0.0
