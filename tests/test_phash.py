"""Perceptual image fingerprints + Hamming-banded near-dup
(operators/multimodal.py image_hashes / phash_bands / phash_pairs /
phash_incremental): the fake-lane determinism contract, the pigeonhole
recall guarantee, inline Hamming verification, and the incremental
store's one-shot equivalence."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators import multimodal as M


def _fps(spark, rows):
    return spark.createDataFrame(rows, "media_id long, fp array<int>")


def test_fake_lane_deterministic_sha256(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, b"hello"), (2, None)], "media_id long, payload binary"
    )
    out = {r["media_id"]: r["fp"] for r in M.image_hashes(df, fake=True).collect()}
    expect = [int(b) for b in hashlib.sha256(b"hello").digest()[8:16]]
    assert out[1] == expect
    assert out[2] is None


def test_hamming_distance_expression(spark):
    df = _fps(spark, [(1, [255, 0, 0, 0, 0, 0, 0, 1])])
    d = df.select(
        M.hamming_distance(
            F.col("fp"), F.array(*[F.lit(x) for x in [0, 0, 0, 0, 0, 0, 0, 0]])
        ).alias("d")
    ).first()["d"]
    assert d == 9


def test_bands_guarantee_and_null_fail_closed(spark):
    base = [10, 20, 30, 40, 50, 60, 70, 80]
    near = list(base)
    near[0] ^= 0b11  # 2 bits, one byte
    df = _fps(spark, [(1, base), (2, near), (3, None)])
    bands = M.phash_bands(df, band_bytes=1)
    # null fp produces no bands (fail-closed)
    assert bands.filter(F.col("id") == 3).count() == 0
    # near pair agrees on 7 of 8 single-byte bands
    shared = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bucket"])
        .filter((F.col("a.id") == 1) & (F.col("b.id") == 2))
        .count()
    )
    assert shared == 7
    # 2-byte bands (default): byte 0 dirty -> band 0 dirty, 3 of 4 agree
    wide = M.phash_bands(df)
    assert wide.filter(F.col("id") == 1).count() == 4
    shared2 = (
        wide.alias("a")
        .join(wide.alias("b"), ["band", "bucket"])
        .filter((F.col("a.id") == 1) & (F.col("b.id") == 2))
        .count()
    )
    assert shared2 == 3


def test_pairs_verified_distance(spark):
    base = [10, 20, 30, 40, 50, 60, 70, 80]
    near = list(base)
    near[2] ^= 0b111  # distance 3
    far = list(base)
    for i in range(8):
        far[i] ^= 0b11111  # distance 40, but shares... no byte agrees
    coincident = [10, 99, 98, 97, 96, 95, 94, 93]  # shares band 0 only
    df = _fps(spark, [(1, base), (2, near), (3, far), (4, coincident)])
    pairs = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in M.phash_pairs(df, max_distance=6, band_bytes=1).collect()
    }
    # (1,2) verified at distance 3; (1,4) was a candidate (band 0
    # collision) but fails the distance verify; (3,*) shares no band
    assert pairs == {(1, 2): 3}


def test_pairs_distance_bound_enforced(spark):
    df = _fps(spark, [(1, [0] * 8)])
    with pytest.raises(ValueError):
        M.phash_pairs(df, max_distance=8, band_bytes=1)
    with pytest.raises(ValueError):
        M.phash_pairs(df, max_distance=4)  # 2-byte bands: limit is 3
    with pytest.raises(ValueError):
        M.phash_pairs(df, max_distance=1, band_bytes=3)
    with pytest.raises(ValueError):
        M.phash_incremental(df, M.phash_bands(df), max_distance=99)


def test_incremental_matches_one_shot(spark):
    import hashlib

    def fp(i):
        h = hashlib.sha256(str(i // 3).encode()).digest()
        out = [int(b) for b in h[:8]]
        out[i % 3] ^= (1 << (i % 2))  # near-dups within each trio
        return out

    rows = [(i, fp(i)) for i in range(30)]
    all_fps = _fps(spark, rows)
    one_shot = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in M.phash_pairs(all_fps, max_distance=2).collect()
    }
    first = _fps(spark, rows[:15])
    second = _fps(spark, rows[15:])
    c1, store = M.phash_incremental(
        first, M.phash_bands(_fps(spark, [])), max_distance=2
    )
    c2, _ = M.phash_incremental(second, store, max_distance=2)
    inc = {
        (min(r["id_new"], r["id_seen"]), max(r["id_new"], r["id_seen"]), r["distance"])
        for c in (c1, c2)
        for r in c.collect()
    }
    assert inc == one_shot


@pytest.mark.skipif(not M._has("PIL"), reason="Pillow not installed")
def test_real_dhash_lane(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    img = Image.new("L", (100, 80))
    for x in range(100):
        for y in range(80):
            img.putpixel((x, y), (x * 2) % 256)
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id long, payload binary"
    )
    fp = M.image_hashes(df, method="dhash").first()["fp"]
    assert len(fp) == 8 and all(0 <= b <= 255 for b in fp)


def test_image_dedup_report_quality_keep(spark):
    # two clusters by construction: {1,2,3} chained (1~2, 2~3 within
    # distance; 1~3 only via the closure) and {10,11}; 20 unclustered
    base = [10, 20, 30, 40, 50, 60, 70, 80]
    def flip(b, i, m):
        out = list(b); out[i] ^= m; return out
    fps = _fps(
        spark,
        [
            (1, base),
            (2, flip(base, 0, 0b1)),
            (3, flip(flip(base, 0, 0b1), 1, 0b1)),
            (10, [200, 201, 202, 203, 204, 205, 206, 207]),
            (11, [200, 201, 202, 203, 204, 205, 206, 204]),
            (20, [90, 91, 92, 93, 94, 95, 96, 97]),
        ],
    )
    quality = spark.createDataFrame(
        [(1, 100), (2, 900), (3, 500), (10, 10), (11, 10), (20, 7)],
        "media_id long, n_pixels long",
    )
    rep = {
        r["media_id"]: (r["cluster"], r["keep"])
        for r in M.image_dedup_report(fps, quality, max_distance=2).collect()
    }
    # 20 never pairs -> absent from the report (implicitly kept)
    assert set(rep) == {1, 2, 3, 10, 11}
    assert rep[1][0] == rep[2][0] == rep[3][0] == 1
    assert rep[10][0] == rep[11][0] == 10
    # highest quality survives; tie in {10,11} -> smaller id
    assert [m for m, (_c, k) in rep.items() if k == 1] == [2, 10] or {
        m for m, (_c, k) in rep.items() if k == 1
    } == {2, 10}
