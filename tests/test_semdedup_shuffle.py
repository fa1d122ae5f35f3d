"""SemDedup (operators/dedup.py semdedup, Abbas et al. 2023) and the
deterministic per-epoch shuffle (operators/sample.py epoch_shuffle)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators.dedup import semdedup
from dataframes_spark.operators.sample import epoch_shuffle

# two well-separated centroids on the axes
CENTERS = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_semdedup_marks_within_cluster_duplicates(spark):
    df = _vecs(
        spark,
        [
            (1, [1.0, 0.05, 0.0]),   # cluster 0, very near 2
            (2, [1.0, 0.06, 0.01]),  # cluster 0, very near 1
            (3, [0.2, 1.0, 0.0]),    # cluster 1, alone-ish
            (4, [0.0, 1.0, 0.3]),    # cluster 1, not similar to 3
        ],
    )
    out = {
        r["vec_id"]: r.asDict()
        for r in semdedup(df, "embedding", "vec_id", CENTERS, 0.99).collect()
    }
    assert out[1]["cluster"] == 0 and out[2]["cluster"] == 0
    assert out[3]["cluster"] == 1 and out[4]["cluster"] == 1
    # 1 and 2 are a similar pair: exactly one marked duplicate, and the
    # survivor is the one FARTHER from the centroid (lower cent_cos)
    dups = {i for i in (1, 2) if out[i]["is_dup"] == 1}
    assert len(dups) == 1
    kept = ({1, 2} - dups).pop()
    assert out[kept]["cent_cos"] <= out[dups.pop()]["cent_cos"]
    # 3 and 4 are dissimilar: both survive
    assert out[3]["is_dup"] == 0 and out[4]["is_dup"] == 0


def test_semdedup_cross_cluster_pairs_never_compared(spark):
    # identical vectors pulled to different clusters never pair
    df = _vecs(spark, [(1, [1.0, 0.9, 0.0]), (2, [0.9, 1.0, 0.0])])
    out = {
        r["vec_id"]: r.asDict()
        for r in semdedup(df, "embedding", "vec_id", CENTERS, 0.5).collect()
    }
    assert out[1]["cluster"] != out[2]["cluster"]
    assert out[1]["is_dup"] == 0 and out[2]["is_dup"] == 0


def test_semdedup_every_row_reported_and_empty_centers_raise(spark):
    df = _vecs(spark, [(i, [float(i), 1.0, 0.0]) for i in range(10)])
    out = semdedup(df, "embedding", "vec_id", CENTERS, 0.999999)
    assert out.count() == 10
    with pytest.raises(ValueError):
        semdedup(df, "embedding", "vec_id", [], 0.9)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_epoch_shuffle_matches_reference_md5_and_is_contiguous(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "k")
    out = epoch_shuffle(df, "k", epoch=3, n_shards=4)
    rows = out.collect()
    assert len(rows) == 200
    for r in rows:
        h = _md5_60(f"{r['k']}/epoch3")
        assert r["shard"] == h % 4
    # positions are a contiguous 0..n-1 range within each shard, ordered
    # by the epoch hash
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, grp in by_shard.items():
        grp.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in grp] == list(range(len(grp)))
        keys = [(_md5_60(f"{r['k']}/epoch3"), r["k"]) for r in grp]
        assert keys == sorted(keys)


def test_epoch_shuffle_different_epochs_differ_and_rerun_is_stable(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    a = {(r["k"]): (r["shard"], r["pos"])
         for r in epoch_shuffle(df, "k", 1, 4).collect()}
    a2 = {(r["k"]): (r["shard"], r["pos"])
          for r in epoch_shuffle(df.repartition(7), "k", 1, 4).collect()}
    b = {(r["k"]): (r["shard"], r["pos"])
         for r in epoch_shuffle(df, "k", 2, 4).collect()}
    assert a == a2  # partitioning-independent
    assert a != b  # epochs reshuffle


def test_grouped_positions_match_plain_window(spark):
    from pyspark.sql import Window as W

    from dataframes_spark.operators.global_order import grouped_positions

    df = spark.range(0, 500).select(
        (F.col("id") % 7).alias("g"),
        ((F.col("id") * 7919) % 500).alias("v"),
        F.col("id").alias("k"),
    )
    got = {
        (r["g"], r["k"]): r["pos"]
        for r in grouped_positions(
            df, "g", ["v", "k"], n_buckets=8, pos_col="pos"
        ).collect()
    }
    w = W.partitionBy("g").orderBy("v", "k")
    want = {
        (r["g"], r["k"]): r["pos"]
        for r in df.withColumn("pos", F.row_number().over(w)).collect()
    }
    assert got == want


def test_mixture_order_prefix_shares_and_determinism(spark):
    from dataframes_spark.operators.sample import mixture_order

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = mixture_order(df, "g", {"a": 3.0, "b": 1.0}, "k", epoch=1)
    got = sorted(
        ((r["ord"], r["g"]) for r in out.collect())
    )
    # contiguous 1..N total order
    assert [o for o, _ in got] == list(range(1, 401))
    # over any sizeable prefix, group a's share approaches 3/4
    for n in (40, 100, 200):
        share = sum(1 for o, g in got[:n] if g == "a") / n
        assert abs(share - 0.75) < 0.08, (n, share)
    # partitioning-independent
    out2 = mixture_order(df.repartition(13), "g", {"a": 3.0, "b": 1.0}, "k", 1)
    assert sorted(((r["ord"], r["k"]) for r in out2.collect())) == sorted(
        ((r["ord"], r["k"]) for r in out.collect())
    )


def test_mixture_order_drops_unweighted_groups_and_validates(spark):
    import pytest as _pytest

    from dataframes_spark.operators.sample import mixture_order

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, g string"
    )
    out = mixture_order(df, "g", {"a": 1.0, "b": 1.0}, "k")
    assert {r["g"] for r in out.collect()} == {"a", "b"}
    with _pytest.raises(ValueError):
        mixture_order(df, "g", {}, "k")


def test_grouped_positions_whale_group(spark):
    """One group holding ~95% of rows — the shape the plain
    partitionBy(g) window serializes — still numbers correctly and
    spreads the whale across order-key buckets."""
    from pyspark.sql import Window as W

    from dataframes_spark.operators.global_order import grouped_positions

    df = spark.range(0, 4000).select(
        F.when(F.col("id") % 20 == 0, F.lit("small"))
        .otherwise(F.lit("whale"))
        .alias("g"),
        ((F.col("id") * 7919) % 4000).alias("v"),
        F.col("id").alias("k"),
    )
    out = grouped_positions(df, "g", ["v", "k"], n_buckets=16, pos_col="pos")
    got = {(r["g"], r["k"]): r["pos"] for r in out.collect()}
    w = W.partitionBy("g").orderBy("v", "k")
    want = {
        (r["g"], r["k"]): r["pos"]
        for r in df.withColumn("pos", F.row_number().over(w)).collect()
    }
    assert got == want
