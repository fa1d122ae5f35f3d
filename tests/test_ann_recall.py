"""ANN recall report (operators/similarity.py recall_report): pinned
lower bounds on the synthetic embeddings corpus (the dedup-banding
analogue of tests/test_lsh_recall.py) plus the structural invariants —
exhaustive nprobe recovers everything, recall is monotone in nprobe,
pinned query ids override the hash sample."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators import similarity as S
from dataframes_spark.session import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def centers(emb):
    rows = (
        emb.filter(F.col("vec_id").between(1, 8))
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return [[float(x) for x in r.embedding] for r in rows]


def _recalls(emb, centers, **kw):
    rep = S.recall_report(emb, "embedding", "vec_id", k=10, centers=centers, **kw)
    return {r["method"]: r["recall_at_k"] for r in rep.collect()}


def test_recall_bounds_on_synthetic_corpus(emb, centers):
    got = _recalls(emb, centers, n_queries=12, num_planes=2, nprobe=4)
    # 2 hyperplanes -> 4 buckets over 500 vectors: generous candidate
    # sets, so LSH must recover a solid fraction of true neighbors
    assert 0.0 < got["lsh_buckets"] <= 1.0
    assert got["lsh_buckets"] >= 0.25, got
    assert got["ivf_nprobe"] >= 0.5, got


def test_exhaustive_nprobe_is_exact(emb, centers):
    # probing ALL 8 clusters searches the whole corpus: recall == 1.0
    # exactly — the report's own correctness proof
    got = _recalls(emb, centers, n_queries=12, num_planes=4, nprobe=8)
    assert got["ivf_nprobe"] == pytest.approx(1.0)


def test_recall_monotone_in_nprobe(emb, centers):
    r = [
        _recalls(emb, centers, n_queries=12, num_planes=4, nprobe=n)["ivf_nprobe"]
        for n in (2, 4, 8)
    ]
    assert r[0] <= r[1] <= r[2], r


def test_pinned_query_ids(emb, centers):
    rep = S.recall_report(
        emb,
        "embedding",
        "vec_id",
        k=10,
        centers=centers,
        nprobe=4,
        query_ids=[3, 44, 85],
    )
    rows = rep.collect()
    assert all(r["n_queries"] == 3 for r in rows)
    assert {r["method"] for r in rows} == {"lsh_buckets", "ivf_nprobe"}
