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


# --------------------------------------------------------------------------
# Product quantization (round 9)
# --------------------------------------------------------------------------


def _pq_setup(spark):
    from dataframes_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    return emb, emb.filter(F.col("vec_id") > 0), q


def test_pq_fit_deterministic_and_shapes(spark):
    from dataframes_spark.operators.similarity import pq_fit

    emb, _, _ = _pq_setup(spark)
    b1 = pq_fit(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    b2 = pq_fit(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    assert b1 == b2  # hash-sampled init, Lloyd with lowest-index ties
    assert len(b1) == 8 and len(b1[0]) == 16 and len(b1[0][0]) == 8
    with pytest.raises(ValueError, match="divide"):
        pq_fit(emb, "embedding", "vec_id", dim=64, m=7, k=4)


def test_pq_codes_are_valid_and_plan_is_expression_only(spark):
    from dataframes_spark.operators.similarity import pq_encode, pq_fit

    emb, corpus, _ = _pq_setup(spark)
    books = pq_fit(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    enc = pq_encode(corpus, "embedding", books)
    rows = enc.select("pq_code").collect()
    assert all(len(r.pq_code) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r.pq_code)
    p = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Python" not in p  # map-only JVM encode


def test_pq_adc_recall_tracks_code_budget(spark):
    """ADC over PQ codes finds the true neighbours, and recall grows
    with the code budget — the property the operator exists for. The
    synthetic embeddings are near-random unit vectors (the hardest
    case); the fits are deterministic so these bounds cannot flake."""
    from dataframes_spark.operators.similarity import (
        brute_force_topk,
        pq_encode,
        pq_fit,
        pq_topk,
    )

    emb, corpus, q = _pq_setup(spark)
    exact10 = {r.vec_id for r in brute_force_topk(corpus, "embedding", "vec_id", q, k=10).collect()}

    def recall(m, k, probe):
        books = pq_fit(emb, "embedding", "vec_id", dim=64, m=m, k=k)
        enc = pq_encode(corpus, "embedding", books)
        got = {r.vec_id for r in pq_topk(enc, "vec_id", books, q, k=probe).collect()}
        return len(got & exact10) / 10

    coarse = recall(8, 16, 50)   # measured 0.6
    fine = recall(16, 32, 50)    # measured 0.9
    assert fine >= 0.7 and coarse >= 0.4
    assert fine >= coarse
    assert recall(16, 32, 10) >= 0.3  # measured 0.5


def test_ivfpq_partitioned_store_prunes_and_scores(spark, tmp_path):
    """The combined IVF+PQ store: cluster directories prune at planning
    time (PartitionFilters on the scan), the stored rows carry codes
    (m ints) instead of vectors, and the probe's ADC result equals
    pq_topk restricted to the probed clusters."""
    import re

    from dataframes_spark.operators.similarity import (
        ivf_assign,
        ivfpq_topk,
        ivfpq_write_partitioned,
        pq_encode,
        pq_fit,
        pq_topk,
    )

    emb, corpus, q = _pq_setup(spark)
    centers = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id").between(1, 4))
        .orderBy("vec_id")
        .collect()
    ]
    books = pq_fit(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    path = str(tmp_path / "ivfpq")
    ivfpq_write_partitioned(corpus, path, "embedding", "vec_id", centers, books)

    store = spark.read.parquet(path)
    assert set(store.columns) == {"vec_id", "pq_code", "cluster"}  # no vectors

    out = ivfpq_topk(spark, path, centers, books, "vec_id", q, k=10, nprobe=2)
    p = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m and "cluster" in m.group(1)  # directories pruned at planning

    # equals pq_topk over the probed clusters of the in-memory encode
    assigned = pq_encode(ivf_assign(corpus, "embedding", centers), "embedding", books)
    got = [(r.vec_id, round(r.adc_dist, 9)) for r in out.collect()]
    # recompute expected from the unpartitioned lane
    import math as _math

    qn = _math.sqrt(sum(float(x) ** 2 for x in q)) or 1.0

    def cosq(c):
        cn = _math.sqrt(sum(v * v for v in c)) or 1.0
        return sum(a * float(b) for a, b in zip(c, q)) / (cn * qn)

    probes = sorted(range(len(centers)), key=lambda i: -cosq(centers[i]))[:2]
    want = [
        (r.vec_id, round(r.adc_dist, 9))
        for r in pq_topk(
            assigned.filter(F.col("cluster").isin(probes)), "vec_id", books, q, k=10
        ).collect()
    ]
    assert got == want


def test_pq_adc_lane_bounds_and_lossless_codebooks(spark, emb):
    from dataframes_spark.operators import similarity as S2

    # real fitted codebooks: the quantized ranking recovers a solid
    # fraction of the exact top-10 and the report stays in [0, 1]
    books = S2.pq_fit(emb, "embedding", "vec_id", dim=64, m=16, k=16)
    rep = S2.recall_report(
        emb, "embedding", "vec_id", k=10, n_queries=8, codebooks=books
    )
    got = {r["method"]: r["recall_at_k"] for r in rep.collect()}
    assert set(got) == {"lsh_buckets", "pq_adc"}
    assert 0.0 <= got["pq_adc"] <= 1.0
    assert got["pq_adc"] >= 0.35, got

    # lossless case: a corpus drawn from few distinct subvector patterns
    # quantizes exactly when every pattern is a centroid -> ADC distance
    # equals the true distance and recall is exactly 1.0
    import itertools

    pats = [(1.0, 0.0), (0.0, 1.0), (0.5, 0.5), (1.0, 1.0)]
    rows = [
        (i, [float(x) for x in a + b])
        for i, (a, b) in enumerate(itertools.product(pats, pats))
    ]
    tiny = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # unit-normalized subvectors of each corpus vector, per subspace
    import math

    def norm_sub(row):
        n = math.sqrt(sum(v * v for v in row))
        return [v / n for v in row]

    books2 = [
        sorted({tuple(norm_sub(r[1])[0:2]) for r in rows}),
        sorted({tuple(norm_sub(r[1])[2:4]) for r in rows}),
    ]
    books2 = [[list(c) for c in b] for b in books2]
    rep2 = S2.recall_report(
        tiny, "embedding", "vec_id", k=3, n_queries=6, codebooks=books2
    )
    got2 = {r["method"]: r["recall_at_k"] for r in rep2.collect()}
    assert got2["pq_adc"] == pytest.approx(1.0), got2
