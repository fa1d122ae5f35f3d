"""Distributed rank family (operators/global_order.py rank_stats /
ntiles): exact SQL-window equality under ties/nulls at any bucket
count, ntile's uneven-split law, plan pins."""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataframes_spark.operators.global_order import ntiles, rank_stats


def _df(spark, n=500):
    # heavy ties (97 distinct), a few nulls
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 41 != 0, (F.col("id") * 7919 % 97)).alias("v"),
    )


def test_rank_stats_matches_window_any_bucketing(spark):
    df = _df(spark)
    w = W.orderBy(F.col("v").asc_nulls_first())
    exp = {
        r.k: (r.rk, r.dr, r.cd)
        for r in df.select(
            "k",
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("dr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    for nb in (2, 7, 32):
        got = {
            r.k: (r.rank, r.dense_rank, r.cume_dist)
            for r in rank_stats(df, "v", n_buckets=nb).collect()
        }
        assert got == exp, nb


def test_rank_stats_multi_key_and_column_opt_out(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 1), (3, "b", 0), (4, None, 5)],
        "k long, s string, v int",
    )
    out = rank_stats(df, ["s", "v"], rank_col=None, dense_rank_col="dr",
                     cume_dist_col=None)
    assert set(out.columns) == {"k", "s", "v", "dr"}
    got = {r.k: r.dr for r in out.collect()}
    # nulls first: (None,5)=1, (a,1)=2 tie, (b,0)=3
    assert got == {4: 1, 1: 2, 2: 2, 3: 3}


def test_ntile_matches_window_even_and_uneven(spark):
    df = _df(spark, 103).filter(F.col("v").isNotNull())
    for n in (1, 4, 7, 50, 200):
        w = W.orderBy("v", "k")
        exp = {
            r.k: r.t
            for r in df.select("k", F.ntile(n).over(w).alias("t")).collect()
        }
        got = {
            r.k: r.ntile
            for r in ntiles(df, n, ["v", "k"], n_buckets=5).collect()
        }
        assert got == exp, n
    with pytest.raises(ValueError):
        ntiles(df, 0, ["v", "k"])


def test_plans_have_no_data_bearing_single_partition(spark):
    from dataframes_spark.plan import plan_report

    df = _df(spark, 300)
    for out in (
        rank_stats(df, "v", n_buckets=4),
        ntiles(df.filter(F.col("v").isNotNull()), 7, ["v", "k"], n_buckets=4),
    ):
        rep = plan_report(out)
        assert rep["single_partition_data_exchanges"] == 0
        assert rep["row_python_udf_nodes"] == 0


def test_grouped_rank_stats_matches_partitioned_windows(spark):
    """part_by == the partitioned window forms exactly, including a
    NULL group key and heavy in-group ties."""
    df = spark.range(600).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 != 0, (F.col("id") % 3).cast("string")).alias("g"),
        F.when(F.col("id") % 37 != 0, F.col("id") * 7919 % 29).alias("v"),
    )
    w = W.partitionBy("g").orderBy(F.col("v").asc_nulls_first())
    exp = {
        r.k: (r.rk, r.dr, r.cd)
        for r in df.select(
            "k",
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("dr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    for nb in (2, 8):
        got = {
            r.k: (r.rank, r.dense_rank, r.cume_dist)
            for r in rank_stats(df, "v", n_buckets=nb, part_by=["g"]).collect()
        }
        assert got == exp, nb


def test_cumsum_grouped_matches_partitioned_window(spark):
    from dataframes_spark.operators.global_order import cumsum_grouped

    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 7919 % 97).alias("o"),
        (F.col("id") % 7).alias("s"),
    )
    w = (
        W.partitionBy("g")
        .orderBy("o", "k")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    exp = {
        r.k: r.c
        for r in df.select(
            "k", F.coalesce(F.sum("s").over(w), F.lit(0)).alias("c")
        ).collect()
    }
    got = {
        r.k: r.cumsum_before
        for r in cumsum_grouped(df, "s", ["g"], ["o", "k"], n_buckets=5).collect()
    }
    assert got == exp


def test_grouped_ntile_matches_partitioned_window(spark):
    df = spark.range(211).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 != 0, (F.col("id") % 3).cast("string")).alias("g"),
        (F.col("id") * 7919 % 83).alias("v"),
    )
    for n in (1, 4, 9):
        w = W.partitionBy("g").orderBy("v", "k")
        exp = {
            r.k: r.t
            for r in df.select("k", F.ntile(n).over(w).alias("t")).collect()
        }
        got = {
            r.k: r.ntile
            for r in ntiles(
                df, n, ["v", "k"], n_buckets=4, part_by=["g"]
            ).collect()
        }
        assert got == exp, n
