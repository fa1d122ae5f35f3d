"""Property tests for DSIR (operators/dsir.py): the fold law under
arbitrary corpus splits, partitioning invariance of weights, and the
temperature-mixing share laws under arbitrary group sizes."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dataframes_spark.operators import dsir
from dataframes_spark.operators.sample import temperature_rates

docs = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=24),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(texts=docs, mod=st.integers(min_value=2, max_value=4))
def test_counts_fold_law_any_split(spark, texts, mod):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    whole = dsir.bucket_counts(df, "text", "doc_id", buckets=16)
    merged = None
    for i in range(mod):
        part = dsir.bucket_counts(
            df.filter(F.col("doc_id") % mod == i), "text", "doc_id", buckets=16
        )
        merged = part if merged is None else dsir.merge_counts(merged, part)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


@settings(max_examples=6, deadline=None)
@given(texts=docs)
def test_weights_partitioning_invariant(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    model = dsir.dsir_fit(df, df, "text", "doc_id", buckets=16)
    a = dsir.dsir_weights(df, model, "text", "doc_id", buckets=16)
    b = dsir.dsir_weights(
        df.repartition(7), model, "text", "doc_id", buckets=16
    )
    ra = sorted((r["doc_id"], r["n_feats"], r["log_weight"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["n_feats"], r["log_weight"]) for r in b.collect())
    assert ra == rb
    # self-fit: every weight is exactly 0 (log_ratio identically 0)
    assert all(w == 0.0 for _, _, w in ra)


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=5),
    tau=st.sampled_from([0.0, 0.3, 0.7, 1.0]),
)
def test_temperature_rate_laws_any_sizes(spark, sizes, tau):
    rows = [
        (g * 1000 + i, f"g{g}") for g, n in enumerate(sizes) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k long, g string")
    out = temperature_rates(df, "g", tau=tau).collect()
    # shares sum to 1; every rate in (0, 1]; the binding group rate is 1
    assert sum(r["q"] for r in out) == pytest.approx(1.0, abs=1e-9)
    assert all(0.0 < r["rate"] <= 1.0 + 1e-12 for r in out)
    assert max(r["rate"] for r in out) == pytest.approx(1.0, abs=1e-9)
    # expected output size q_s * N is achievable: n_total * rate
    # proportional to q (same N for every group)
    n_over_q = [r["n_total"] * r["rate"] / r["q"] for r in out]
    assert max(n_over_q) - min(n_over_q) < 1e-6 * max(n_over_q)
