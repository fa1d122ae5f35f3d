"""md5 lane-hash mode of minhash_signatures: engine-independent twin.

The md5 mode exists so the WHOLE signature computation (normalize ->
shingle -> hash -> affine lanes -> min) is reproducible outside Spark:
the DuckDB oracle behind the `minhash_signatures_md5` driver query runs
the identical formula. This test pins the Spark side against a direct
pure-Python model, so a drift in either normalization or lane arithmetic
fails locally before the driver sees it.
"""

import hashlib
import re

from dataframes_spark.operators import dedup as dd

P = (1 << 31) - 1


def _py_signature(text: str, num_hashes: int, k: int) -> list[int]:
    norm = re.sub(r"\s+", " ", text).lower()
    n = max(len(norm) - (k - 1), 1)
    shingles = {norm[i : i + k] for i in range(n)}
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P for s in shingles
    ]
    return [
        min(((h * (2 * i + 1) + 7919 * (i + 1)) % P) for h in hs)
        for i in range(num_hashes)
    ]


def test_md5_lane_signatures_match_python_model(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "the  quick\tBROWN fox",  # whitespace folding + case
        "ab",  # shorter than the shingle width
        "aaaaaaa",  # single repeated shingle
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: list(r.signature)
        for r in dd.minhash_signatures(
            df, "text", "doc_id", num_hashes=8, shingle_k=5, lane_hash="md5"
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_signature(t, 8, 5), t


def test_lane_hash_rejects_unknown(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dd.minhash_signatures(df, "text", "doc_id", lane_hash="sha1")


def test_hyperplane_md5_mode_deterministic_and_complementary(spark):
    import pytest as _pytest

    from dataframes_spark.operators import similarity as ds

    df = spark.createDataFrame([(1, [1.0, 0.0]), (2, [-1.0, 0.0])], ["id", "v"])
    a = {
        r.id: r.bucket
        for r in ds.hyperplane_buckets(df, "v", "id", 4, plane_hash="md5").collect()
    }
    b = {
        r.id: r.bucket
        for r in ds.hyperplane_buckets(df, "v", "id", 4, plane_hash="md5").collect()
    }
    assert a == b  # plane derivation is seed-deterministic, no RNG state
    # antipodal vectors flip every projection sign -> complementary buckets
    assert a[1] ^ a[2] == 0b1111
    with _pytest.raises(ValueError):
        ds.hyperplane_buckets(df, "v", "id", plane_hash="crc32")


def _py_simhash32(text: str, k: int) -> int:
    norm = re.sub(r"\s+", " ", text).lower()
    n = max(len(norm) - (k - 1), 1)
    shingles = {norm[i : i + k] for i in range(n)}
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shingles]
    fp = 0
    for b in range(32):
        v = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if v > 0:
            fp |= 1 << b
    return fp


def test_md5_simhash_matches_python_model(spark):
    texts = ["the quick brown fox", "THE  quick\tbrown fox", "ab", "zzzz"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: r.simhash
        for r in dd.simhash(
            df, "text", "doc_id", shingle_k=4, num_bits=32, lane_hash="md5"
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_simhash32(t, 4), t


def test_simhash_md5_rejects_too_many_bits(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dd.simhash(df, "text", "doc_id", num_bits=64, lane_hash="md5")


def test_bucket_pair_expand_no_self_pairs_on_duplicate_ids(spark):
    """A non-key id column (duplicate ids) must not produce degenerate
    (x, x) candidate pairs from the positional in-bucket expansion."""
    df = spark.createDataFrame(
        [(7, "same text here ok"), (7, "same text here ok"), (8, "same text here ok")],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in dd.simhash_candidates(df, "text", "doc_id").collect()
    }
    assert (7, 7) not in pairs
    assert (7, 8) in pairs


def test_minhash_lsh_pairs_md5_matches_xxhash_candidates(spark):
    """The md5 verification lane (exact value buckets) and the fast
    xxhash64 lane group by the SAME band slices — on a corpus with no
    64-bit hash collisions the candidate sets are identical."""
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",
        "completely different text about distributed query processing",
        "another unrelated document concerning parquet column pruning",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    kw = dict(num_hashes=16, bands=4, shingle_k=5)
    fast = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(df, "text", "doc_id", **kw).collect()
    }
    md5 = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(
            df, "text", "doc_id", lane_hash="md5", **kw
        ).collect()
    }
    assert md5 == fast
    assert (0, 1) in md5  # the near-identical pair must collide


def test_minhash_lsh_pairs_rejects_bad_lane_hash(spark):
    import pytest

    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dd.minhash_lsh_pairs(df, "text", "doc_id", lane_hash="sha1")
