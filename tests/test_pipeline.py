"""Dedup / similarity / text / multimodal pipeline operator tests."""

import importlib.util

import pytest
from pyspark.sql import functions as F

from dataframes_spark.functions import text as dtext
from dataframes_spark.operators import dedup, multimodal, similarity

HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_SOUNDFILE = importlib.util.find_spec("soundfile") is not None


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    rows = [
        (1, base),
        (2, base),                              # exact dup of 1
        (3, base + " with a small extra tail"),  # near dup of 1
        (4, "completely different content about spark query engines and shuffles"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "text", "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [1, 3, 4]


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs, "text", "doc_id", 64, 16).collect()}
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup collides in some band
    assert not any(4 in p for p in pairs)  # unrelated doc stays out


def test_jaccard_exact_values(spark):
    df = spark.createDataFrame([(1, "abcd"), (2, "abcd"), (3, "zzzz")], ["doc_id", "text"])
    out = {(r.id_a, r.id_b): r.jaccard for r in dedup.jaccard_pairs(df, "text", "doc_id", 3).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out


def test_simhash_identical_and_distinct(docs):
    fps = {r.doc_id: r.simhash for r in dedup.simhash(docs, "text", "doc_id").collect()}
    assert fps[1] == fps[2]
    ham = bin((fps[1] ^ fps[3]) & ((1 << 64) - 1)).count("1")
    assert ham <= 16  # near dup: small hamming distance
    ham_far = bin((fps[1] ^ fps[4]) & ((1 << 64) - 1)).count("1")
    assert ham_far > ham


def test_brute_force_topk_self_is_one(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    top = similarity.brute_force_topk(df, "embedding", "vec_id", [1.0, 0.0, 0.0, 0.0], k=1).first()
    assert top.vec_id == 0 and top.cosine == pytest.approx(1.0)


def test_all_pairs_topk_orthogonal(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.all_pairs_topk(df, "embedding", "vec_id", k=1)
    best = {r.id_a: r.id_b for r in out.collect()}
    assert best[0] == 1 and best[1] == 0


def test_text_profile_values(spark):
    df = spark.createDataFrame([(1, "the cat sat!")], ["doc_id", "text"])
    row = dtext.document_profile(df, "text").first()
    assert row.n_tokens == 3
    assert row.punct_ratio == pytest.approx(1 / 12)
    assert row.lang_guess == "en"
    assert row.n_bpe_tokens == 4  # the / cat / sat / !


def test_multimodal_fake_decode_roundtrip(spark):
    media = multimodal.make_fake_media(spark, 8)
    out = multimodal.decode_image(media, fake=True)
    rows = out.collect()
    assert len(rows) == 8
    assert all(r.n_pixels == r.width * r.height for r in rows)
    assert all(len(r.feature) == 8 for r in rows)


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed; error path n/a")
def test_multimodal_decode_stub_raises(spark):
    media = multimodal.make_fake_media(spark, 1)
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.decode_image(media)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_decode_image_real_lane(spark):
    # real lane: a true PNG decodes to its true dimensions; a corrupt
    # blob yields NULLs instead of failing the job
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (40, 30), (255, 0, 0)).save(buf, format="PNG")
    rows = [
        (1, buf.getvalue(), ("image/png", None, None, None, "png")),
        (2, b"not an image", ("image/png", None, None, None, "png")),
    ]
    media = spark.createDataFrame(rows, multimodal.media_schema())
    out = {r.media_id: r for r in multimodal.decode_image(media).collect()}
    assert (out[1].width, out[1].height, out[1].n_pixels) == (40, 30, 1200)
    assert len(out[1].feature) == 8
    assert out[1].feature[0] == pytest.approx(1.0)  # solid red: mean R = 1
    assert out[1].feature[1] == pytest.approx(0.0)  # mean G = 0
    assert out[2].width is None and out[2].feature is None


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_resize_images_real_lane(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (64, 48), (0, 128, 255)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, buf.getvalue(), ("image/png", None, None, None, "png"))],
        multimodal.media_schema(),
    )
    row = multimodal.resize_images(media, target=16).first()
    assert (row.width, row.height) == (16, 16)
    with Image.open(io.BytesIO(bytes(row.payload))) as img:
        assert img.size == (16, 16)


@pytest.mark.skipif(not HAS_SOUNDFILE, reason="soundfile not installed")
def test_decode_audio_real_lane(spark):
    import io

    import numpy as np
    import soundfile as sf

    sr, seconds = 8000, 0.5
    signal = 0.25 * np.sin(2 * np.pi * 440 * np.arange(int(sr * seconds)) / sr)
    buf = io.BytesIO()
    sf.write(buf, signal, sr, format="WAV", subtype="FLOAT")
    media = spark.createDataFrame(
        [(1, buf.getvalue(), ("audio/wav", None, None, None, "pcm"))],
        multimodal.media_schema(),
    )
    row = multimodal.decode_audio(media).first()
    assert row.sample_rate == sr
    assert row.n_samples == int(sr * seconds)
    assert row.duration_ms == pytest.approx(500.0)
    # RMS of a sine of amplitude A is A/sqrt(2)
    assert row.rms == pytest.approx(0.25 / 2**0.5, rel=1e-3)


def test_frame_sample_counts(spark):
    media = multimodal.make_fake_media(spark, 4)  # durations 5000..5750 ms
    out = multimodal.frame_sample_plan(media, 1000)
    counts = out.groupBy("media_id").count().collect()
    assert all(r["count"] == 5 for r in counts)


def test_ivf_exact_when_probing_all_clusters(spark):
    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = rows[0][1]
    rest = df.filter("vec_id != 0")
    bf = [r.vec_id for r in similarity.brute_force_topk(rest, "embedding", "vec_id", q, 10).collect()]
    assigned, centers = similarity.ivf_build(rest, "embedding", "vec_id", n_clusters=8)
    # probing every cluster degrades to exact brute force
    ivf_all = [r.vec_id for r in similarity.ivf_topk(assigned, centers, "embedding", "vec_id", q, 10, nprobe=8).collect()]
    assert ivf_all == bf


def test_ivf_finds_planted_cluster_with_one_probe(spark):
    import random

    random.seed(11)
    # 8 tight clusters; true neighbors of a query live in its own cluster
    centers = [[random.choice([-5.0, 5.0]) for _ in range(16)] for _ in range(8)]
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append((i, [x + random.uniform(-0.1, 0.1) for x in c]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = rows[0][1]
    rest = df.filter("vec_id != 0")
    bf = {r.vec_id for r in similarity.brute_force_topk(rest, "embedding", "vec_id", q, 10).collect()}
    assigned, cs = similarity.ivf_build(rest, "embedding", "vec_id", n_clusters=8)
    ivf = {r.vec_id for r in similarity.ivf_topk(assigned, cs, "embedding", "vec_id", q, 10, nprobe=1).collect()}
    # clustered data: one probe recovers the exact neighbor set while
    # scanning 1/8 of the corpus
    assert ivf == bf


def test_resize_images_fake_plan(spark):
    media = multimodal.make_fake_media(spark, 6)
    out = multimodal.resize_images(media, target=32, fake=True).collect()
    assert all(r.width == 32 and r.height == 32 for r in out)
    assert all(len(r.payload) == 32 * 4 for r in out)
    if not HAS_PIL:
        with pytest.raises(NotImplementedError, match="Pillow"):
            multimodal.resize_images(media)


def test_embedding_near_dups_exact_and_lsh(spark):
    from dataframes_spark.operators import dedup

    # two near-identical vectors, one orthogonal
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vid", "emb"])
    exact = dedup.embedding_near_dups(df, "emb", "vid", threshold=0.95)
    got = [(r.id_a, r.id_b) for r in exact.collect()]
    assert got == [(1, 2)]
    # LSH path finds the same pair (identical-direction vectors always
    # share every hyperplane sign) and never invents extra pairs
    lsh = dedup.embedding_near_dups(df, "emb", "vid", threshold=0.95, num_planes=4)
    assert {(r.id_a, r.id_b) for r in lsh.collect()} == {(1, 2)}


def test_winnow_fingerprints_shared_passage(spark):
    from dataframes_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a lazy cat naps; the quick brown fox jumps far"),
            (3, "zzz"),  # shorter than k: no fingerprints
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = winnow_fingerprints(df, "text", "doc_id", k=5, window=4)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, set()).add(r.fp)
    # winnowing guarantee: a shared substring of length >= k + window - 1
    # ("the quick brown fox jumps", 25 chars) yields shared fingerprints
    assert by_doc[1] & by_doc[2]
    # unrelated docs share nothing; sub-k docs emit nothing
    assert 3 not in by_doc and 4 not in by_doc
    # density: ~2/(window+1) of gram hashes survive winnowing
    assert 5 <= len(by_doc[1]) <= 25


def test_shared_passages_finds_copy(spark):
    from dataframes_spark.functions.text import shared_passages

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, base),
        (2, "intro text then " + base + " and an outro"),  # contains the passage
        (3, "completely different content about spark query planning"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = shared_passages(df, "text", "doc_id", min_shared=3, max_df=10)
    got = {(r.id_a, r.id_b): r.n_shared for r in out.collect()}
    assert (1, 2) in got and got[(1, 2)] >= 3
    assert all(p == (1, 2) for p in got)


def test_duplicate_groups_report(spark):
    from dataframes_spark.operators.dedup import duplicate_groups

    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa"), (5, "cc")],
        ["doc_id", "text"],
    )
    got = {
        r.text: (r.representative_id, r.n_copies)
        for r in duplicate_groups(df, "text", "doc_id").collect()
    }
    assert got == {"aa": (1, 3), "bb": (2, 1), "cc": (5, 1)}


def test_ivf_assign_picks_nearest_pinned_centroid(spark):
    from dataframes_spark.operators import similarity

    centers = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    df = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [0.1, 2.0]), (3, [-5.0, 0.2]), (4, [0.7, 0.7])],
        ["vec_id", "embedding"],
    )
    out = {r.vec_id: r.cluster for r in similarity.ivf_assign(df, "embedding", centers).collect()}
    # vec 4 ties between centroids 0 and 1 (cos 45° to both): the
    # first-lowest-index tie-break must pick 0
    assert out == {1: 0, 2: 1, 3: 2, 4: 0}


def test_ivf_assign_plus_topk_equals_brute_force_full_probe(spark):
    from dataframes_spark.operators import similarity
    from dataframes_spark.session import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id").between(1, 4)).orderBy("vec_id").collect()
    ]
    base = emb.filter(F.col("vec_id") > 4)
    assigned = similarity.ivf_assign(base, "embedding", cents)
    # probing every cluster must recover exact brute-force top-k
    ivf = [r.vec_id for r in similarity.ivf_topk(assigned, cents, "embedding", "vec_id", q, 10, nprobe=4).collect()]
    bf = [r.vec_id for r in similarity.brute_force_topk(base, "embedding", "vec_id", q, 10).collect()]
    assert ivf == bf


def test_decode_audio_fake_deterministic(spark):
    import math

    from dataframes_spark.operators import multimodal

    media = multimodal.make_fake_media(spark, 8)
    out = {r.media_id: r for r in multimodal.decode_audio(media, fake=True).collect()}
    assert len(out) == 8
    # recompute one row's stand-in arithmetic exactly
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, b in src.items():
        r = out[mid]
        assert r.n_samples == len(b)
        assert abs(r.duration_ms - 1000.0 * len(b) / r.sample_rate) < 1e-9
        want_rms = math.sqrt(sum((x - 128.0) ** 2 for x in b) / len(b)) / 128.0
        assert abs(r.rms - want_rms) < 1e-12
    # identical runs give identical results (no RNG anywhere)
    again = {r.media_id: r.rms for r in multimodal.decode_audio(media, fake=True).collect()}
    assert again == {m: r.rms for m, r in out.items()}


@pytest.mark.skipif(HAS_SOUNDFILE, reason="soundfile installed; error path n/a")
def test_decode_audio_gated_without_libs(spark):
    media = multimodal.make_fake_media(spark, 1)
    with pytest.raises(NotImplementedError, match="soundfile"):
        multimodal.decode_audio(media)


def test_ivf_sample_fit_exact_when_probing_all(spark):
    from pyspark.sql import functions as F
    from dataframes_spark.operators import similarity
    from dataframes_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    rest = emb.filter(F.col("vec_id") != 0)
    # fit on ~25% of the corpus, assign everything; probing every
    # cluster must still recover exact brute-force top-k
    assigned, cs = similarity.ivf_build(
        rest, "embedding", "vec_id", n_clusters=8, fit_sample_rows=rest.count() // 4
    )
    assert assigned.count() == rest.count()  # every row assigned
    ivf = [r.vec_id for r in similarity.ivf_topk(assigned, cs, "embedding", "vec_id", q, 10, nprobe=8).collect()]
    bf = [r.vec_id for r in similarity.brute_force_topk(rest, "embedding", "vec_id", q, 10).collect()]
    assert ivf == bf
    # determinism: the same sample-fit returns identical centroids
    _, cs2 = similarity.ivf_build(
        rest, "embedding", "vec_id", n_clusters=8, fit_sample_rows=rest.count() // 4
    )
    assert cs == cs2


def test_ivf_sample_fraction_tiny_never_empty(spark):
    # an extreme fraction must CEIL to at least one hash bucket, not
    # truncate to an empty fit
    from pyspark.sql import functions as F
    from dataframes_spark.operators import similarity
    from dataframes_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    assigned, cs = similarity.ivf_build(
        emb, "embedding", "vec_id", n_clusters=2, fit_sample_fraction=1e-7
    )
    assert len(cs) == 2 and assigned.count() == emb.count()


# ---------------------------------------------------------------------------
# incremental semantic near-dup store (dedup.embedding_dedup_incremental)
# ---------------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_dedup_incremental_history_and_in_batch(spark):
    from dataframes_spark.operators import dedup as dd

    a = [1.0, 0.0, 0.0, 0.0]
    a_near = [0.999, 0.04, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    hist = _vecs(spark, [(1, a), (2, b)])
    store = dd.embedding_store(hist, "embedding", "vec_id", num_planes=4)
    batch = _vecs(
        spark,
        [
            (10, a_near),        # near-dups history vec 1
            (11, [0.0, 0.0, 1.0, 0.0]),
            (12, [0.0, 0.0, 0.999, 0.04]),  # in-batch pair with 11
        ],
    )
    dups, updated = dd.embedding_dedup_incremental(
        batch, store, "embedding", "vec_id", threshold=0.95, num_planes=4
    )
    got = {(r.id_new, r.id_seen) for r in dups.collect()}
    assert (10, 1) in got
    assert (12, 11) in got
    assert all(new in (10, 11, 12) for new, _ in got)
    # cosine values are genuine cosines
    vals = {(r.id_new, r.id_seen): r.cosine for r in dups.collect()}
    assert abs(vals[(10, 1)] - 0.999 / (0.999**2 + 0.04**2) ** 0.5) < 1e-9
    # store grows by exactly the batch rows
    assert updated.count() == 5
    assert {r.id for r in updated.select("id").collect()} == {1, 2, 10, 11, 12}


def test_embedding_dedup_incremental_matches_batch_lsh_pairs(spark):
    # the incremental pair relation over (history, batch) equals the
    # batch-mode LSH pair relation restricted to pairs touching the batch
    from dataframes_spark.operators import dedup as dd

    import random

    rng = random.Random(7)
    rows = []
    for i in range(30):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, [float(x) for x in base]))
        if i % 3 == 0:  # planted near-dup partner
            rows.append(
                (100 + i, [float(x + rng.uniform(-0.01, 0.01)) for x in base])
            )
    df = _vecs(spark, rows)
    hist = df.filter("vec_id % 2 = 0")
    batch = df.filter("vec_id % 2 = 1")
    store = dd.embedding_store(hist, "embedding", "vec_id", num_planes=4, seed=3)
    inc, _ = dd.embedding_dedup_incremental(
        batch, store, "embedding", "vec_id", threshold=0.98, num_planes=4, seed=3
    )
    full = dd.embedding_near_dups(
        df, "embedding", "vec_id", threshold=0.98, num_planes=4, seed=3
    )
    batch_ids = {r.vec_id for r in batch.select("vec_id").collect()}
    want = set()
    for r in full.collect():
        # batch-mode emits id_a < id_b; incremental emits (new, seen)
        if r.id_b in batch_ids:
            want.add((r.id_b, r.id_a))
        elif r.id_a in batch_ids:
            want.add((r.id_a, r.id_b))
    got = {(r.id_new, r.id_seen) for r in inc.collect()}
    # pairs where BOTH sides are history never appear incrementally;
    # pairs with at least one batch side must match exactly, except
    # history-seen/batch-new orientation where the batch id is SMALLER
    # (batch-mode a<b emits it, incremental emits (new, seen) with
    # new=batch regardless) — normalize by membership, not order
    def norm(p):
        x, y = p
        return (min(x, y), max(x, y))

    assert {norm(p) for p in got} == {norm(p) for p in want}
