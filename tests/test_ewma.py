"""Batch distributed EWMA (operators/ewma.py): pandas-reference
equality, bucketization invariance (the affine carry law), per-group
semantics, null handling, whale-group boundedness, streaming parity."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators.ewma import ewma


def _ref(values, alpha):
    return (
        pd.Series(values, dtype=float)
        .ewm(alpha=alpha, adjust=False)
        .mean()
        .tolist()
    )


def _df(spark, n=400, groups=1):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % groups).alias("g"),
        ((F.col("id") * 7919 % 997) / 7.0).alias("v"),
    )


def test_matches_pandas_reference_any_bucketing(spark):
    df = _df(spark, 300)
    want = _ref([(i * 7919 % 997) / 7.0 for i in range(300)], 0.3)
    for nb in (1, 2, 7, 64):
        got = {
            r.k: r.ewma
            for r in ewma(df, "v", 0.3, "k", n_buckets=nb).collect()
        }
        assert len(got) == 300
        for i in range(300):
            assert got[i] == pytest.approx(want[i], rel=1e-11), (nb, i)


def test_per_group_matches_pandas(spark):
    df = _df(spark, 400, groups=3)
    vals = {g: [] for g in range(3)}
    for i in range(400):
        vals[i % 3].append((i * 7919 % 997) / 7.0)
    want = {g: _ref(v, 0.5) for g, v in vals.items()}
    got = ewma(df, "v", 0.5, "k", by=["g"], n_buckets=5).collect()
    assert len(got) == 400
    for r in got:
        g = r.g
        pos = r.k // 3
        assert r.ewma == pytest.approx(want[g][pos], rel=1e-11), (g, r.k)


def test_null_values_skip_state_and_output_null(spark):
    rows = [(0, 1.0), (1, None), (2, 3.0), (3, None), (4, 5.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {r.k: r.ewma for r in ewma(df, "v", 0.5, "k", n_buckets=2).collect()}
    # recursion runs over non-null values only: 1, 2, 3.5
    assert got[0] == 1.0 and got[1] is None
    assert got[2] == pytest.approx(2.0)
    assert got[3] is None
    assert got[4] == pytest.approx(3.5)


def test_alpha_one_is_identity_and_bad_alpha_raises(spark):
    df = _df(spark, 50)
    got = ewma(df, "v", 1.0, "k", n_buckets=3)
    assert all(
        r.ewma == pytest.approx(r.v) for r in got.collect()
    )
    with pytest.raises(ValueError):
        ewma(df, "v", 0.0, "k")
    with pytest.raises(ValueError):
        ewma(df, "v", 1.5, "k")


def test_whale_group_stays_bucket_bounded(spark):
    """ONE group owning every row still distributes: with the group key
    as the partition column a plain window would funnel 20k rows through
    one task; the lane's buckets split it. Values still exact."""
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.lit("whale").alias("g"),
        (F.col("id") % 101).cast("double").alias("v"),
    )
    out = ewma(df, "v", 0.1, "k", by=["g"], n_buckets=16)
    got = {r.k: r.ewma for r in out.collect()}
    want = _ref([i % 101 for i in range(n)], 0.1)
    for i in (0, 1, 9_999, 19_999):
        assert got[i] == pytest.approx(want[i], rel=1e-9)
    # bucketization really split the whale: >1 distinct bucket
    from dataframes_spark.operators.global_order import _bucketized

    nb = _bucketized(df, ["k"], 16).select("__go_b").distinct().count()
    assert nb > 1


def test_matches_streaming_ewma_semantics(spark):
    """Batch EWMA == the streaming per-key EWMA folded over batches
    (the stream==batch law for the ewma pair)."""
    from dataframes_spark.streaming.events import _ewma_pdf

    vals = [(i * 31 % 97) / 3.0 for i in range(60)]
    pdf = pd.DataFrame({"k": range(60), "v": vals})
    out1, prev = _ewma_pdf(
        pdf.iloc[:25].copy(), "k", "v", 0.2, None
    )
    out2, _ = _ewma_pdf(pdf.iloc[25:].copy(), "k", "v", 0.2, prev)
    stream = list(out1["ewma"]) + list(out2["ewma"])
    df = spark.createDataFrame(pdf, "k long, v double")
    got = {r.k: r.ewma for r in ewma(df, "v", 0.2, "k", n_buckets=4).collect()}
    for i in range(60):
        assert got[i] == pytest.approx(stream[i], rel=1e-11)


def test_plan_has_no_data_bearing_single_partition(spark):
    from dataframes_spark.plan import plan_report

    df = _df(spark, 200, groups=4)
    rep = plan_report(ewma(df, "v", 0.25, "k", by=["g"], n_buckets=4))
    assert rep["single_partition_data_exchanges"] == 0
    assert rep["row_python_udf_nodes"] == 0
    # exactly ONE Arrow stage: the per-bucket output pass (summaries
    # and carries are pure JVM — the per-(group, bucket) cells never
    # pay per-group Arrow overhead)
    assert rep["pandas_udf_nodes"] == 1


def _decay_model(rows, hl_us):
    import math

    lam = math.log(2.0) / hl_us
    out = []
    for i, (e, v) in enumerate(rows):
        y = sum(
            (x or 0.0) * math.exp(-lam * (e - ej))
            for ej, x in rows
            if ej <= e
        )
        out.append(y)
    return out


def test_decayed_sum_matches_model_across_buckets(spark):
    """Irregular timestamps spanning MANY carry buckets (incl. long
    empty gaps), nulls contribute nothing, ties are mutual."""
    import pyspark.sql.functions as F

    from dataframes_spark.operators.ewma import decayed_sum

    hl_us = 3_600_000_000  # 1 hour
    rows = [
        (0, 10.0),
        (1_800_000_000, 4.0),          # +30min
        (1_800_000_000, None),         # tie, null value
        (7_200_000_000, 2.0),          # +2h
        (400 * 3_600_000_000, 8.0),    # 400h gap: many empty buckets
        (401 * 3_600_000_000, 1.0),
    ]
    df = spark.createDataFrame(
        [(i, e, v) for i, (e, v) in enumerate(rows)], "k long, e long, v double"
    ).select("k", F.timestamp_micros(F.col("e") + 1_700_000_000_000_000).alias("ts"), "v")
    got = {
        r.k: r.decayed_sum
        for r in decayed_sum(df, "ts", "v", "1 hour").collect()
    }
    want = _decay_model(rows, hl_us)
    for i in range(len(rows)):
        assert got[i] == pytest.approx(want[i], rel=1e-9, abs=1e-12), i


def test_decayed_sum_per_group_and_plan(spark):
    import pyspark.sql.functions as F

    from dataframes_spark.operators.ewma import decayed_sum
    from dataframes_spark.plan import plan_report

    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 977_000_001
        ).alias("ts"),
        (F.col("id") % 101).cast("double").alias("v"),
    )
    out = decayed_sum(df, "ts", "v", "30 minutes", by=["g"])
    rep = plan_report(out)
    assert rep["pandas_udf_nodes"] == 0  # pure JVM
    assert rep["row_python_udf_nodes"] == 0
    assert rep["single_partition_data_exchanges"] == 0
    # spot-check group 3 against the model
    rows = [
        ((i * 977_000_001), float(i % 101)) for i in range(n) if i % 7 == 3
    ]
    want = _decay_model(rows, 1_800_000_000)
    got = {
        r.k: r.decayed_sum
        for r in out.filter(F.col("g") == 3).collect()
    }
    ks = [i for i in range(n) if i % 7 == 3]
    for j in (0, 1, len(ks) // 2, len(ks) - 1):
        assert got[ks[j]] == pytest.approx(want[j], rel=1e-9), j
    import pytest as _pt

    with _pt.raises(ValueError):
        decayed_sum(df, "ts", "v", "30 minutes", bucket_halflives=1)


def test_null_group_key_carries_across_buckets(spark):
    """A NULL group key is a real group: its EWMA must chain across
    bucket boundaries exactly like any other group (null-safe carry
    join), for both ewma and decayed_sum."""
    n = 200
    rows = [(i, None if i % 2 == 0 else "g1", float(i % 13)) for i in range(n)]
    df = spark.createDataFrame(rows, "k long, g string, v double")
    got = {
        r.k: r.ewma
        for r in ewma(df, "v", 0.3, "k", by=["g"], n_buckets=6).collect()
    }
    for gval in (None, "g1"):
        sub = [v for i, (_, g, v) in enumerate(rows) if g == gval]
        want = _ref(sub, 0.3)
        ks = [k for k, g, _ in rows if g == gval]
        for k, w in zip(ks, want):
            assert got[k] == pytest.approx(w, rel=1e-11), (gval, k)

    from dataframes_spark.operators.ewma import decayed_sum

    ts_df = spark.createDataFrame(
        [(k, g, v, 1_700_000_000_000_000 + k * 37_000_000_000)
         for (k, g, v) in rows],
        "k long, g string, v double, e long",
    ).select("k", "g", "v", F.timestamp_micros("e").alias("ts"))
    dgot = {
        r.k: r.decayed_sum
        for r in decayed_sum(ts_df, "ts", "v", "1 hour", by=["g"]).collect()
    }
    sub_rows = [
        (k * 37_000_000_000, v) for (k, g, v) in rows if g is None
    ]
    want = _decay_model(sub_rows, 3_600_000_000)
    ks = [k for k, g, _ in rows if g is None]
    for k, w in zip(ks, want):
        assert dgot[k] == pytest.approx(w, rel=1e-9), k


def test_decayed_sum_keeps_null_ts_rows(spark):
    from dataframes_spark.operators.ewma import decayed_sum

    df = spark.createDataFrame(
        [(1, 1_700_000_000_000_000, 5.0), (2, None, 7.0)],
        "k long, e long, v double",
    ).select("k", F.timestamp_micros("e").alias("ts"), "v")
    got = {r.k: r.decayed_sum for r in decayed_sum(df, "ts", "v", "1 hour").collect()}
    assert got[1] == pytest.approx(5.0) and got[2] is None


def test_null_parity_with_streaming_fold(spark):
    """Nulls are transparent on BOTH lanes now: the streaming _ewma_pdf
    fold (incl. a carried state across batches) and the batch ewma
    agree value-for-value on a null-bearing series."""
    import math

    from dataframes_spark.streaming.events import _ewma_pdf

    vals = [1.0, None, 3.0, None, None, 5.0, 2.0, None]
    pdf = pd.DataFrame({"k": range(len(vals)), "v": vals})
    o1, prev = _ewma_pdf(pdf.iloc[:4].copy(), "k", "v", 0.5, None)
    o2, _ = _ewma_pdf(pdf.iloc[4:].copy(), "k", "v", 0.5, prev)
    stream = list(o1["ewma"]) + list(o2["ewma"])
    df = spark.createDataFrame(pdf, "k long, v double")
    got = {r.k: r.ewma for r in ewma(df, "v", 0.5, "k", n_buckets=3).collect()}
    for i, v in enumerate(vals):
        if v is None:
            assert got[i] is None and math.isnan(stream[i]), i
        else:
            assert got[i] == pytest.approx(stream[i], rel=1e-12), i
