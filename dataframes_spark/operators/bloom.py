"""Bloom-filter semi join: prune a large relation against a key set that
is too large to broadcast as a hash relation but whose Bloom bitmap fits
anywhere.

The niche at 100 TB: a plain broadcast semi join ships the whole build
key set to every executor (~8 B+ per key — 1e8 keys is ~1 GB and
broadcast stops being an option), while a shuffle semi join shuffles the
ENTIRE probe side. A Bloom bitmap needs ~1.2 bytes per key at 1% false
positives, so the same 1e8-key prune broadcasts as a ~150 MB bitmap —
far smaller at the dimension sizes that dominate in practice —
then every probe row is tested scan-side with pure JVM expressions
before any shuffle. This mirrors Spark's own runtime bloom-filter join
(`spark.sql.optimizer.runtime.bloomFilter.*`), whose expressions
(`bloom_filter_agg` / `might_contain`) are optimizer-internal and not
callable from the public API — so the bitmap here is built from public
expressions only: xxhash64 positions, bit_or word aggregation.

Build cost is ONE small job over the build side (the same sanctioned
driver-tiny action as IVF centroids in operators/similarity.py): the
bitmap words collect to the driver (m/8 bytes, e.g. 128 KiB at the
default 2^20 bits) and ride back out as a broadcast 1-row
``array<long>`` relation — data, not an expression tree (an array
LITERAL of 16k elements costs megabytes of plan per task; measured 20x
slower). The probe never shuffles, collects, or calls Python.

With ``exact=True`` (default) a real left-semi join runs AFTER the bloom
prune, so the result is exactly the semi join — the bloom only shrinks
what reaches the shuffle; false positives cost nothing but the bytes
they fail to prune. With ``exact=False`` the caller accepts the bloom's
false-positive rate (~(1 - e^(-kn/m))^k) in exchange for running no join
at all.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# integral widths all coerce losslessly to bigint; int/long mixed with
# float/double/decimal coerce to double (lossy above 2^53 — but BOTH
# sides round identically, so that can only add false positives, which
# the exact semi join removes; never false negatives)
_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_FRACTIONAL = {"float", "double"}
_NUMERIC = _INTEGRAL | _FRACTIONAL | {"decimal"}


def _key_cast_type(build_type: str, probe_type: str) -> str:
    """xxhash64 is TYPE-sensitive (int 7 and bigint 7 hash differently),
    so both sides must hash one common type — and that type must agree
    wherever Spark's own equi-join coercion would call the keys equal,
    or the bloom prunes TRUE matches (false negatives, which no exact
    pass can recover). String is NOT a safe universal fallback:
    decimal(12,2) 7.00 renders '7.00' while bigint 7 renders '7', yet
    the plain join matches them. So the common type is derived from the
    same coercion Spark applies, and a pair with no agreement-preserving
    cast raises instead of silently mis-hashing."""
    b, p = build_type.split("(")[0], probe_type.split("(")[0]
    if build_type == probe_type:
        # identical types (incl. identical decimal precision/scale)
        # hash identically with no cast at all
        return build_type
    if b in _INTEGRAL and p in _INTEGRAL:
        return "bigint"
    if b in _NUMERIC and p in _NUMERIC:
        # any mix involving float/double/decimal (incl. two decimals of
        # differing scale): double agrees wherever the join coercion
        # matches; >2^53 loss → false positives only (exact pass removes)
        return "double"
    if {b, p} <= _INTEGRAL | {"string"}:
        # ANSI comparison coercion promotes string-vs-integral to bigint
        # ('07' matches 7). A malformed string: under ANSI mode (the
        # Spark 4 default) the cast throws, exactly as the plain
        # equi-join would; with spark.sql.ansi.enabled=false it yields
        # NULL instead (no throw) — hashing a NULL can only ADD bloom
        # false positives, never drop a match, so results stay correct
        # in both modes
        return "bigint"
    if {b, p} <= _NUMERIC | {"string"}:
        return "double"
    if {b, p} == {"date", "timestamp"}:
        return "timestamp"
    if {b, p} == {"date", "timestamp_ntz"}:
        return "timestamp_ntz"
    raise ValueError(
        "bloom_semi_join: no agreement-preserving common hash type for "
        f"key types {build_type!r} vs {probe_type!r}; cast the join keys "
        "to a common type explicitly before calling"
    )


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    cast_to: str = "string",
) -> list[int]:
    """Build the Bloom bitmap for a key column: ``num_bits`` bits as a
    dense list of 64-bit words. One aggregation job; the result is
    driver-tiny by construction (num_bits/8 bytes, independent of the
    number of keys). ``cast_to`` must match the probe side's
    (``bloom_might_contain``) — ``bloom_semi_join`` derives an
    agreement-preserving common type from both schemas; the string
    default is safe for standalone callers only when both sides hold
    the SAME key type (identical values then render identically)."""
    if num_bits <= 0 or num_bits % 64:
        raise ValueError(
            f"num_bits must be a positive multiple of 64, got {num_bits}"
        )
    if num_hashes <= 0:
        raise ValueError(f"num_hashes must be positive, got {num_hashes}")
    n_words = num_bits // 64
    # see _key_cast_type: both sides must hash ONE common type, or an
    # int probe against a bigint build silently prunes every true match
    key = F.col(key_col).cast(cast_to)
    # k positions per key; seed folded in by hashing (key, seed) together
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(key, F.lit(j)), F.lit(num_bits))
                for j in range(num_hashes)
            ]
        )
    ).alias("p")
    words = (
        df.where(key.isNotNull())
        .select(pos)
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            # shiftleft's Python wrapper only takes a literal shift; the
            # SQL form accepts an expression
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r.w] = r.bits
    return bitmap


def bloom_might_contain(
    bitmap: Column,
    num_bits: int,
    key: Column,
    num_hashes: int = 5,
    cast_to: str = "string",
) -> Column:
    """Pure-expression Bloom membership test against an ``array<long>``
    bitmap COLUMN: true iff all ``num_hashes`` bit positions of ``key``
    are set. Nulls test false (a semi join never matches null keys).

    The bitmap must arrive as DATA (a broadcast 1-row frame, see
    ``bloom_semi_join``), never as ``F.lit(<list>)``: a 2^20-bit bitmap
    as an array literal is a 16384-node expression tree that bloats
    analysis and ships megabytes of plan with every task — measured 20x
    slower than the same probe against a broadcast column."""
    probe = key.cast(cast_to)  # MUST match bloom_bitmap's cast_to
    tests = []
    for j in range(num_hashes):
        h = F.pmod(F.xxhash64(probe, F.lit(j)), F.lit(num_bits))
        word = F.element_at(bitmap, (h / 64).cast("int") + F.lit(1))
        tests.append(F.getbit(word, (h % 64).cast("int")) == 1)
    return key.isNotNull() & functools.reduce(operator.and_, tests)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Rows of ``big`` whose ``big_key`` appears in ``small``'s
    ``small_key`` set, pruned scan-side by a Bloom bitmap before any
    shuffle. ``exact=True`` finishes with a true left-semi join (result
    identical to the plain semi join); ``exact=False`` skips it and
    keeps the bloom's false positives."""
    small_key = small_key or big_key
    cast_to = _key_cast_type(
        dict(small.dtypes)[small_key], dict(big.dtypes)[big_key]
    )
    bitmap = bloom_bitmap(small, small_key, num_bits, num_hashes, cast_to)
    # the bitmap rides as a broadcast 1-row frame (data), NOT an array
    # literal (a 16k-element expression tree) — see bloom_might_contain
    bm = F.broadcast(
        big.sparkSession.createDataFrame([(bitmap,)], "__bloom_bm array<bigint>")
    )
    pruned = (
        big.crossJoin(bm)
        .where(
            bloom_might_contain(
                F.col("__bloom_bm"), num_bits, F.col(big_key), num_hashes, cast_to
            )
        )
        .drop("__bloom_bm")
    )
    if not exact:
        return pruned
    keys = small.select(F.col(small_key).alias(big_key)).distinct()
    return pruned.join(keys, big_key, "left_semi")
