"""Snapshot diffing (operators/diff.py): status semantics, null-safe
compares, column scoping, and the summary's consistency laws."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators import diff as D


def _ab(spark):
    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", None), (4, "w", 4.0)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [(2, "y", 2.0), (3, "z2", None), (4, "w", None), (5, "n", 5.0)],
        "k long, s string, v double",
    )
    return a, b


def test_diff_status_semantics(spark):
    a, b = _ab(spark)
    got = {r["k"]: r["status"] for r in D.diff_status(a, b, ["k"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",  # s changed; v null==null is NOT a change
        4: "changed",  # v 4.0 -> null IS a change
        5: "added",
    }


def test_diff_status_compare_cols_scoping(spark):
    a, b = _ab(spark)
    # only compare v: key 3 (z -> z2, v null==null) becomes unchanged
    got = {
        r["k"]: r["status"]
        for r in D.diff_status(a, b, ["k"], compare_cols=["v"]).collect()
    }
    assert got[3] == "unchanged" and got[4] == "changed"
    with pytest.raises(ValueError, match="key"):
        D.diff_status(a, b, [])


def test_diff_summary_counts_and_consistency(spark):
    a, b = _ab(spark)
    rows = {(r["kind"], r["name"]): r["n"] for r in D.diff_summary(a, b, ["k"]).collect()}
    assert rows[("rows", "added")] == 1
    assert rows[("rows", "removed")] == 1
    assert rows[("rows", "changed")] == 2
    assert rows[("rows", "unchanged")] == 1
    assert rows[("column", "s")] == 1
    assert rows[("column", "v")] == 1
    # consistency: surviving keys = changed + unchanged; every changed
    # key changed in >= 1 column
    surviving = rows[("rows", "changed")] + rows[("rows", "unchanged")]
    assert surviving == 3
    assert rows[("column", "s")] + rows[("column", "v")] >= rows[("rows", "changed")]


def test_diff_identical_snapshots_all_unchanged(spark):
    a, _ = _ab(spark)
    rows = {(r["kind"], r["name"]): r["n"] for r in D.diff_summary(a, a, ["k"]).collect()}
    assert rows[("rows", "unchanged")] == 4
    assert rows[("rows", "added")] == 0 == rows[("rows", "removed")]
    assert rows[("column", "s")] == 0 == rows[("column", "v")]
