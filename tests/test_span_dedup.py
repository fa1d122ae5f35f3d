"""Token-level duplicated-span dedup (operators/dedup.py duplicate_spans /
strip_duplicate_spans) — the ExactSubstr pass of Lee et al. 2022 in its
window-hash scale form. Micro-corpora with hand-computed span coordinates.
"""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED = "alpha beta gamma delta epsilon zeta"  # 6 tokens


def test_shared_run_reported_with_exact_bounds(spark):
    # 6 shared tokens at offset 2 in doc 1 and offset 0 in doc 2; n=4
    # gives 3 duplicated windows per doc merging into ONE span each.
    df = _docs(
        spark,
        [
            (1, "pre one " + SHARED + " post"),
            (2, SHARED + " tail1 tail2 tail3"),
        ],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in dd.duplicate_spans(df, "text", "doc_id", n=4).collect()
    }
    assert got == {(1, 2, 7, 3), (2, 0, 5, 3)}


def test_no_spans_on_disjoint_corpus(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "q r s t u v w x"),
        ],
    )
    assert dd.duplicate_spans(df, "text", "doc_id", n=4).count() == 0


def test_matching_is_case_insensitive_but_strip_keeps_raw_casing(spark):
    df = _docs(
        spark,
        [
            (1, "Alpha Beta Gamma Delta KEEP1 keep2"),
            (2, "alpha beta gamma delta other1 other2"),
        ],
    )
    spans = dd.duplicate_spans(df, "text", "doc_id", n=4).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in spans} == {
        (1, 0, 3),
        (2, 0, 3),
    }
    out = {
        r.doc_id: r.text
        for r in dd.strip_duplicate_spans(df, "text", "doc_id", n=4).collect()
    }
    assert out == {1: "KEEP1 keep2", 2: "other1 other2"}


def test_within_doc_repeat_not_flagged_by_distinct_doc_count(spark):
    # the run repeats twice inside doc 1 but exists nowhere else
    df = _docs(
        spark,
        [
            (1, SHARED + " mid " + SHARED),
            (2, "totally different words here ok fine"),
        ],
    )
    assert dd.duplicate_spans(df, "text", "doc_id", n=4).count() == 0


def test_min_docs_threshold(spark):
    df = _docs(
        spark,
        [
            (1, SHARED + " x1 y1"),
            (2, SHARED + " x2 y2"),
            (3, "unrelated tokens in this document z3"),
        ],
    )
    assert dd.duplicate_spans(df, "text", "doc_id", n=4, min_docs=3).count() == 0
    assert dd.duplicate_spans(df, "text", "doc_id", n=4, min_docs=2).count() == 2


def test_adjacent_and_overlapping_windows_merge_to_one_span(spark):
    # 10 shared tokens, n=4 -> 7 windows all merging into one span 0..9
    long_run = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    df = _docs(spark, [(1, long_run + " u1"), (2, long_run + " v1")])
    spans = dd.duplicate_spans(df, "text", "doc_id", n=4).collect()
    assert {(r.doc_id, r.span_start, r.span_end, r.n_windows) for r in spans} == {
        (1, 0, 9, 7),
        (2, 0, 9, 7),
    }


def test_two_separate_spans_in_one_doc(spark):
    run2 = "k0 k1 k2 k3 k4"
    df = _docs(
        spark,
        [
            (1, SHARED + " gapgap middle filler " + run2),
            (2, SHARED + " something unrelated entirely here"),
            (3, "prefix words before it " + run2),
        ],
    )
    spans = {
        (r.span_start, r.span_end)
        for r in dd.duplicate_spans(df, "text", "doc_id", n=4)
        .filter(F.col("doc_id") == 1)
        .collect()
    }
    assert spans == {(0, 5), (9, 13)}


def test_strip_all_duplicate_doc_survives_empty(spark):
    df = _docs(spark, [(1, SHARED), (2, SHARED), (3, "keep me intact ok")])
    out = {
        r.doc_id: r.text
        for r in dd.strip_duplicate_spans(df, "text", "doc_id", n=4).collect()
    }
    assert out[1] == "" and out[2] == ""
    assert out[3] == "keep me intact ok"


def test_strip_keeps_other_columns_and_folds_whitespace(spark):
    df = spark.createDataFrame(
        [(1, SHARED + "  extra   spaces", "web"), (2, SHARED + " y z", "book")],
        "doc_id long, text string, source string",
    )
    out = dd.strip_duplicate_spans(df, "text", "doc_id", n=4)
    assert out.columns == ["doc_id", "text", "source"]
    rows = {r.doc_id: (r.text, r.source) for r in out.collect()}
    assert rows[1] == ("extra spaces", "web")
    assert rows[2] == ("y z", "book")


def test_short_null_and_empty_docs_are_safe(spark):
    df = _docs(
        spark,
        [(1, None), (2, ""), (3, "one two three"), (4, SHARED), (5, SHARED)],
    )
    spans = dd.duplicate_spans(df, "text", "doc_id", n=4)
    assert {r.doc_id for r in spans.collect()} == {4, 5}
    out = {
        r.doc_id: r.text
        for r in dd.strip_duplicate_spans(df, "text", "doc_id", n=4).collect()
    }
    assert out[1] == "" and out[2] == "" and out[3] == "one two three"


def test_n_below_two_rejected(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        dd.duplicate_spans(df, "text", "doc_id", n=1)
    with pytest.raises(ValueError):
        dd.duplicate_spans_incremental(
            df, dd.span_window_hashes(df, "text", "doc_id"), "text", "doc_id", n=1
        )


# ---------------------------------------------------------------------------
# incremental store
# ---------------------------------------------------------------------------


def test_incremental_flags_history_and_in_batch(spark):
    b1 = _docs(spark, [(1, "intro words then " + SHARED)])
    b2 = _docs(
        spark,
        [
            (10, SHARED + " novel continuation here"),  # vs history
            (11, "k0 k1 k2 k3 k4 one"),  # in-batch pair with 12
            (12, "k0 k1 k2 k3 k4 two"),
            (13, "completely fresh text nothing shared"),
        ],
    )
    store = dd.span_window_hashes(b1, "text", "doc_id", n=4)
    spans, updated = dd.duplicate_spans_incremental(
        b2, store, "text", "doc_id", n=4
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in spans.collect()
    }
    assert got == {(10, 0, 5), (11, 0, 4), (12, 0, 4)}
    # store grows by exactly the batch's new hashes, stays distinct
    all_wh = dd.span_window_hashes(
        b1.unionByName(b2), "text", "doc_id", n=4
    )
    assert updated.count() == updated.distinct().count() == all_wh.count()
    assert updated.join(all_wh, "wh", "left_anti").count() == 0


def test_incremental_equals_batch_mode_on_the_batch_rows(spark):
    # the documented law: with the store built from all prior batches,
    # incremental spans == batch-mode spans of the UNION restricted to
    # batch documents — over an arbitrary split with cross-batch dups,
    # in-batch dups, and a within-doc repeat
    rows = [
        (1, "pre " + SHARED + " post words here"),
        (2, "k0 k1 k2 k3 k4 filler " + SHARED),
        (3, "unique text one two three four five six"),
        (4, "k0 k1 k2 k3 k4 other ending tokens"),
        (5, SHARED + " mid " + SHARED),  # within-doc repeat + cross
        (6, "nothing shared with anything at all ever"),
    ]
    for batch2_ids in [{4, 5, 6}, {2, 3}, {1, 2, 3, 4, 5, 6}]:
        b1 = _docs(spark, [r for r in rows if r[0] not in batch2_ids])
        b2 = _docs(spark, [r for r in rows if r[0] in batch2_ids])
        store = dd.span_window_hashes(b1, "text", "doc_id", n=4)
        inc, _ = dd.duplicate_spans_incremental(
            b2, store, "text", "doc_id", n=4
        )
        full = dd.duplicate_spans(
            _docs(spark, rows), "text", "doc_id", n=4, min_docs=2
        ).filter(F.col("doc_id").isin(list(batch2_ids)))
        got = {tuple(r) for r in inc.collect()}
        want = {tuple(r) for r in full.collect()}
        assert got == want, (batch2_ids, got, want)


def test_incremental_empty_store_reduces_to_batch_mode(spark):
    b = _docs(spark, [(1, SHARED + " a1 b1"), (2, SHARED + " a2 b2")])
    empty = dd.span_window_hashes(_docs(spark, []), "text", "doc_id", n=4)
    inc, updated = dd.duplicate_spans_incremental(
        b, empty, "text", "doc_id", n=4
    )
    batch = dd.duplicate_spans(b, "text", "doc_id", n=4)
    assert {tuple(r) for r in inc.collect()} == {
        tuple(r) for r in batch.collect()
    }
    assert updated.count() == dd.span_window_hashes(
        b, "text", "doc_id", n=4
    ).count()
