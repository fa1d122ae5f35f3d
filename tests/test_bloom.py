"""Bloom-filter semi join (operators/bloom.py): exact mode must equal a
plain left-semi join regardless of bitmap size (false positives are
pruning misses, never result rows); approx mode is a superset containing
every true match; null build keys are ignored and null probe keys never
pass."""

from pyspark.sql import functions as F

from dataframes_spark.operators import bloom


def _sides(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(i,) for i in range(0, 500, 50)] + [(None,)], "k long"
    )
    return big, small


def test_exact_equals_semi_join(spark):
    big, small = _sides(spark)
    out = sorted(map(tuple, bloom.bloom_semi_join(big, small, "k").collect()))
    ref = sorted(
        map(
            tuple,
            big.join(small.dropna().distinct(), "k", "left_semi").collect(),
        )
    )
    assert out == ref and len(out) == 100


def test_exact_survives_saturated_bitmap(spark):
    # 64-bit bitmap saturates: the bloom prunes nothing, the exact join
    # still removes every false positive
    big, small = _sides(spark)
    out = sorted(
        map(tuple, bloom.bloom_semi_join(big, small, "k", num_bits=64).collect())
    )
    ref = sorted(
        map(
            tuple,
            big.join(small.dropna().distinct(), "k", "left_semi").collect(),
        )
    )
    assert out == ref


def test_approx_superset_and_null_probe(spark):
    big, small = _sides(spark)
    big_with_null = big.union(
        big.sparkSession.createDataFrame([(None, -1)], big.schema)
    )
    approx = bloom.bloom_semi_join(big_with_null, small, "k", exact=False)
    got = set(r.k for r in approx.collect())
    assert set(range(0, 500, 50)) <= got
    assert None not in got  # null probe keys never pass


def test_bitmap_small_and_deterministic(spark):
    _, small = _sides(spark)
    b1 = bloom.bloom_bitmap(small, "k", num_bits=1 << 12)
    b2 = bloom.bloom_bitmap(small, "k", num_bits=1 << 12)
    assert b1 == b2
    assert len(b1) == (1 << 12) // 64


def test_bloom_rejects_degenerate_params(spark):
    import pytest

    _, small = _sides(spark)
    with pytest.raises(ValueError):
        bloom.bloom_bitmap(small, "k", num_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom.bloom_bitmap(small, "k", num_bits=0)
    with pytest.raises(ValueError):
        bloom.bloom_bitmap(small, "k", num_hashes=0)


def test_bloom_coerces_mismatched_key_types(spark):
    # xxhash64 hashes int and bigint differently; without string
    # coercion an int probe against a bigint build pruned EVERY match
    big = spark.createDataFrame(
        [(i,) for i in range(100)], "k int"
    ).withColumn("v", F.col("k") * 2)
    small = spark.createDataFrame([(i,) for i in range(0, 100, 10)], "k long")
    out = bloom.bloom_semi_join(big, small, "k")
    ref = big.join(small.distinct(), "k", "left_semi")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))
    assert out.count() == 10


def test_bloom_mixed_numeric_types(spark):
    # int build vs double probe coerce to double: 1 matches 1.0
    big = spark.createDataFrame([(float(i),) for i in range(20)], "k double")
    small = spark.createDataFrame([(0,), (5,), (19,)], "k int")
    out = bloom.bloom_semi_join(big, small, "k")
    assert sorted(r.k for r in out.collect()) == [0.0, 5.0, 19.0]


def test_bloom_decimal_vs_bigint_no_false_negatives(spark):
    # decimal(12,2) 7.00 renders '7.00' while bigint 7 renders '7' — a
    # string-cast bloom pruned every true match; the cast type must
    # follow the join coercion (double) instead
    big = spark.sql(
        "SELECT CAST(id AS DECIMAL(12,2)) AS k, id AS v FROM range(100)"
    )
    small = spark.createDataFrame([(0,), (7,), (42,)], "k long")
    out = bloom.bloom_semi_join(big, small, "k")
    ref = big.join(small.distinct(), big["k"] == small["k"], "left_semi")
    assert sorted(r.v for r in out.collect()) == sorted(
        r.v for r in ref.collect()
    )
    assert out.count() == 3


def test_bloom_mismatched_decimal_scales(spark):
    big = spark.sql(
        "SELECT CAST(id AS DECIMAL(12,2)) AS k, id AS v FROM range(50)"
    )
    small = spark.sql(
        "SELECT CAST(id * 10 AS DECIMAL(10,3)) AS k FROM range(5)"
    )
    out = bloom.bloom_semi_join(big, small, "k")
    assert sorted(r.v for r in out.collect()) == [0, 10, 20, 30, 40]


def test_bloom_date_vs_timestamp(spark):
    big = spark.sql(
        "SELECT CAST(date_add(DATE '2024-01-01', CAST(id AS INT)) AS TIMESTAMP)"
        " AS k, id AS v FROM range(30)"
    )
    small = spark.sql(
        "SELECT date_add(DATE '2024-01-01', CAST(id * 7 AS INT)) AS k"
        " FROM range(4)"
    )
    out = bloom.bloom_semi_join(big, small, "k")
    assert sorted(r.v for r in out.collect()) == [0, 7, 14, 21]


def test_bloom_string_vs_int_join_coercion(spark):
    # ANSI comparison coercion promotes string-vs-int to bigint, so '07'
    # matches 7; the bloom must agree ('07' as a string hash never would).
    # (Malformed strings throw in the plain join too — same contract.)
    big = spark.createDataFrame([("07", 1), ("8", 2), ("19", 3)], "k string, v int")
    small = spark.createDataFrame([(7,), (9,)], "k int")
    out = bloom.bloom_semi_join(big, small, "k")
    ref = big.join(small.distinct(), big["k"] == small["k"], "left_semi")
    assert sorted(r.v for r in out.collect()) == sorted(
        r.v for r in ref.collect()
    ) == [1]


def test_bloom_raises_on_uncoercible_key_pair(spark):
    import pytest

    big = spark.createDataFrame([("a", 1)], "k string, v int")
    small = spark.sql("SELECT DATE '2024-01-01' AS k")
    with pytest.raises(ValueError, match="agreement-preserving"):
        bloom.bloom_semi_join(big, small, "k")


def test_bloom_identical_exotic_types_passthrough(spark):
    # identical types on both sides need no cast at all — dates here
    big = spark.sql(
        "SELECT date_add(DATE '2024-01-01', CAST(id AS INT)) AS k, id AS v"
        " FROM range(20)"
    )
    small = spark.sql(
        "SELECT date_add(DATE '2024-01-01', CAST(id * 5 AS INT)) AS k"
        " FROM range(3)"
    )
    out = bloom.bloom_semi_join(big, small, "k")
    assert sorted(r.v for r in out.collect()) == [0, 5, 10]
