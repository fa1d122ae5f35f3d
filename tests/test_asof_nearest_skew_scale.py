"""asof_nearest (operators/asof.py), skew_report (operators/skew.py),
standardize (functions/stats.py): semantics pinned on hand-built frames."""

from datetime import datetime, timedelta

import pytest

from dataframes_spark.functions import stats
from dataframes_spark.operators import skew
from dataframes_spark.operators.asof import asof_nearest


def _ts(m):
    return datetime(2024, 1, 1) + timedelta(minutes=m)


def test_asof_nearest_picks_closer_side(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(40)), (3, "v", _ts(10))],
        ["id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [("u", _ts(8), 100.0), ("u", _ts(13), 200.0), ("u", _ts(60), 300.0)],
        ["user", "ts", "val"],
    )
    out = {
        r.id: r.val
        for r in asof_nearest(
            left, right, "ts", "user", left_id="id", value_cols=["val"]
        ).collect()
    }
    assert out[1] == 100.0  # 2 min back beats 3 min forward
    assert out[2] == 300.0  # 20 min forward beats 27 min back
    assert out[3] is None  # no right rows for user v


def test_asof_nearest_equidistant_backward_wins(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))], ["id", "user", "ts"])
    right = spark.createDataFrame(
        [("u", _ts(5), 1.0), ("u", _ts(15), 2.0)], ["user", "ts", "val"]
    )
    out = asof_nearest(
        left, right, "ts", "user", left_id="id", value_cols=["val"]
    ).collect()
    assert out[0].val == 1.0


def test_asof_nearest_exact_match_and_tiebreak(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))], ["id", "user", "ts"])
    right = spark.createDataFrame(
        [("u", _ts(10), 7, 1.0), ("u", _ts(10), 9, 2.0)],
        ["user", "ts", "seq", "val"],
    )
    out = asof_nearest(
        left, right, "ts", "user", left_id="id",
        value_cols=["val"], right_order=["seq"],
    ).collect()
    assert out[0].val == 2.0  # greatest right_order wins at equal ts


def test_skew_report_shares_and_ratio(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, ["k"]
    )
    rows = skew.skew_report(df, "k", top_n=2).collect()
    assert [(r.k, r.n_rows) for r in rows] == [("a", 6), ("b", 3)]
    assert rows[0].share == 0.6
    # mean key size = 10/3; skew ratio of 'a' = 6/(10/3) = 1.8
    assert rows[0].skew_ratio == 1.8


def test_standardize_zscore_grouped_and_minmax_global(spark):
    df = spark.createDataFrame(
        [("g1", 0.0), ("g1", 10.0), ("g2", 5.0), ("g2", None)],
        ["g", "x"],
    )
    z = {
        (r.g, i): r.x
        for i, r in enumerate(
            stats.standardize(df, ["x"], "zscore", by=["g"]).collect()
        )
    }
    vals = sorted(v for (g, _), v in z.items() if g == "g1")
    assert vals == [-1.0, 1.0]  # mean 5, pop std 5
    # g2: single value -> std 0 -> 0.0 by convention; null stays null
    g2 = [v for (g, _), v in z.items() if g == "g2"]
    assert sorted(g2, key=lambda v: (v is None, v)) == [0.0, None]

    mm = stats.standardize(df.dropna(), ["x"], "minmax")
    got = sorted(r.x for r in mm.collect())
    assert got == [0.0, 0.5, 1.0]


def test_standardize_rejects_bad_method(spark):
    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError):
        stats.standardize(df, ["x"], "robust")
