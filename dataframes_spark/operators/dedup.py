"""Deduplication operators for large-scale text corpora.

Beyond the reference's surface (it has no dedup at all) — these are the
operators a 100 TB training-data pipeline needs, designed shuffle-first:

- exact_dedup:      hash-groupBy on content — one shuffle on a 64-bit key.
- minhash_lsh:      shingle -> minhash signature -> banded LSH buckets ->
                    candidate pairs via a self-join on (band, bucket).
                    The only shuffle of document pairs is WITHIN buckets,
                    never the full cross product.
- simhash:          64-bit weighted fingerprint; near-dups differ in a few
                    bits; banded into 4 x 16-bit keys for candidate joins.
- ngram_jaccard:    exact Jaccard on character shingle sets for candidate
                    pairs (verification stage after LSH, or standalone on
                    small slices).

All hashing uses built-in expressions (xxhash64 / crc32 / md5) — JVM-side,
no Python in the hot path. Every function returns a DataFrame and keeps
the pipeline lazy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact content value.

    GroupBy on ``xxhash64(text)`` + min-id representative: the shuffle key
    is 8 bytes regardless of document size, so 100 TB of text shuffles
    ~8 B x N keys plus one id column. A second semi-join pulls the full
    surviving rows without shuffling text bodies.
    """
    hashed = df.withColumn("__h", F.xxhash64(F.col(text_col)))
    keep = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), id_col, "left_semi")


def duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-duplicate group report: one row per distinct content with its
    representative id and multiplicity."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias("representative_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def shingle_ngrams(text_col: str, k: int = 5) -> Column:
    """Distinct character k-shingle array (lowercased, whitespace folded)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    n = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """Per-document minhash signature: ``min over shingles of
    (a_i * xxhash64(shingle) + b_i mod p)`` for ``num_hashes`` independent
    affine hash functions. Everything is array expressions over the
    exploded-free shingle array — no shuffle at this stage, embarrassingly
    parallel per document."""
    # p = 2^31 - 1 keeps a*h + b well inside int64 (a < 2^8, h < 2^31)
    p = (1 << 31) - 1
    # deterministic hash-family coefficients (fixed, no RNG at plan time)
    coeffs = [(2 * i + 1, (7919 * (i + 1)) % p) for i in range(num_hashes)]
    sh = shingle_ngrams(text_col, shingle_k)
    base = df.select(id_col, sh.alias("__sh"))
    hashes = F.transform(F.col("__sh"), lambda s: F.pmod(F.xxhash64(s), F.lit(p)))
    def affine(a: int, b: int):
        # single-arg closure: PySpark maps lambda arity onto the HOF
        # signature, so defaults/extra params would bind the array index
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(p)

    sig = F.array(
        *[F.array_min(F.transform(hashes, affine(a, b))) for a, b in coeffs]
    )
    return base.select(id_col, sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows; a
    pair colliding in ANY band becomes a candidate. The join is a
    shuffle on (band_id, band_hash) — documents only meet inside a bucket,
    so the cross product never materializes. AQE's skew-join handles the
    pathological all-identical-docs bucket.

    Returns (id_a, id_b) with id_a < id_b; verify with ``jaccard_verify``.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join with PREFIX FILTERING — the
    standard exact all-pairs technique (PPJoin family).

    A naive shingle self-join explodes on common shingles (a 3-gram present
    in every document produces O(N^2) pairs by itself). Instead:

    1. rank shingles by global document frequency (rarest first);
    2. sort each document's shingle set in that order;
    3. index only the PREFIX of length ``|A| - ceil(t*|A|) + 1`` — if two
       sets' prefixes are disjoint under a shared total order, their
       Jaccard is provably < t, so candidates joining only on prefix
       shingles lose no true pair;
    4. verify every candidate exactly via ``array_intersect`` on the full
       sorted sets.

    The candidate join shuffles on rare shingles only, so bucket sizes stay
    bounded even when the corpus shares a small vocabulary. With
    ``min_jaccard=0`` the prefix is the whole set (no pruning, all
    co-occurring pairs) — one code path, exact in both modes.
    """
    t = float(min_jaccard)
    sh = df.select(
        F.col(id_col).alias("id"), shingle_ngrams(text_col, shingle_k).alias("sh")
    )
    ex = sh.select("id", F.explode("sh").alias("g"))
    # global document frequency per shingle (shingle sets are distinct, so
    # count(*) == doc frequency)
    freq = ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    # re-assemble each doc's shingles sorted by (df asc, shingle asc)
    sorted_sets = (
        ex.join(freq, "g")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "g"))).alias("sg"))
        .select(
            "id",
            F.transform(F.col("sg"), lambda x: x["g"]).alias("sh"),
            F.size("sg").alias("n_sh"),
        )
    )
    if t > 0:
        prefix_len = (F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1).cast("int")
    else:
        prefix_len = F.col("n_sh")
    indexed = sorted_sets.select(
        "id", "sh", "n_sh", F.slice("sh", 1, prefix_len).alias("prefix")
    )
    cand = (
        indexed.select("id", F.explode("prefix").alias("g"))
        .alias("a")
        .join(
            indexed.select("id", F.explode("prefix").alias("g")).alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    full = sorted_sets.select("id", "sh", "n_sh")
    verified = (
        cand.join(
            full.select(
                F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("n_a")
            ),
            "id_a",
        )
        .join(
            full.select(
                F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("n_b")
            ),
            "id_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    if t > 0:
        verified = verified.filter(F.col("jaccard") >= t)
    return verified


def simhash(df: DataFrame, text_col: str, id_col: str, shingle_k: int = 4) -> DataFrame:
    """64-bit SimHash fingerprint: per shingle hash, each bit votes +1/-1;
    the sign of each bit-sum forms the fingerprint. Near-duplicate texts
    land within small Hamming distance. Pure array expressions."""
    sh = shingle_ngrams(text_col, shingle_k)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    # each shingle votes +1/-1 per bit; sign of the vote sum sets the bit.
    # bit positions are plan-time literals (shiftright needs an int), so
    # this unrolls to 64 array-aggregate expressions — all JVM-side.
    def bit_vote(b: int):
        return lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)

    fingerprint = None
    for bit in range(64):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(bit))
        mask = (1 << bit) if bit < 63 else -(1 << 63)  # bit 63 = sign bit in int64
        bit_val = F.when(vote > 0, F.lit(mask).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = bit_val if fingerprint is None else fingerprint.bitwiseOR(bit_val)
    return df.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_candidates(df: DataFrame, text_col: str, id_col: str, shingle_k: int = 4) -> DataFrame:
    """Candidate pairs whose SimHash collides in any 16-bit band (Hamming
    distance <= 3 guaranteed to collide in at least one of 4 bands)."""
    fp = simhash(df, text_col, id_col, shingle_k)
    banded = fp.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    return (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
