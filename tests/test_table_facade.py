"""Table facade sweep: the thin-wrapper surface of SURVEY §2.2 (column
surgery, metadata, slicing) plus the aggregate typing rule and toJSON cap."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.core import Table
from dataframes_spark.operators import aggregate as dagg


@pytest.fixture()
def t(spark):
    return Table(
        spark.createDataFrame(
            [(1, 1.5, "x"), (2, 2.5, "y"), (3, 3.5, "z")], ["i", "v", "s"]
        )
    )


def test_metadata(t):
    assert t.columnNames == ["i", "v", "s"]
    assert t.rowCount() == 3
    assert t.columnCount() == 3


def test_column_surgery(t):
    assert t.at("v").columnNames == ["v"]
    assert t.columns(["s", "i"]).columnNames == ["s", "i"]
    assert t.remove("v").columnNames == ["i", "s"]
    assert t.rename("v", "val").columnNames == ["i", "val", "s"]
    # setAt replaces in place; new name appends
    assert t.setAt("v", F.col("v") * 2).df.select("v").first()[0] == 3.0
    assert "w" in t.setAt("w", F.lit(0)).columnNames


def test_filter_columns_numeric(t):
    kept = t.filterColumns(lambda name, dtype: not dtype.startswith("string"))
    assert kept.columnNames == ["i", "v"]


def test_take_slice(t):
    assert t.take(2, ["i"]).rowCount() == 2
    got = [r.i for r in t.slice(1, 2, ["i"]).toList()]
    assert got == [2, 3]


def test_set_ops(t, spark):
    other = Table(spark.createDataFrame([(2, 2.5, "y")], ["i", "v", "s"]))
    assert t.union(other).rowCount() == 4
    assert t.intersect(other).rowCount() == 1
    assert t.except_(other).rowCount() == 2


def test_tojson_cell_cap(t):
    out = t.toJSON(max_cells=3)  # 3 columns -> 1 row
    assert len(out) == 1 and out[0].startswith("{")


def test_aggregate_typing_rule(t):
    # Length accepts any column; arithmetic aggregates reject strings
    ok = dagg.aggregate_by(t.df, "s", [("s", ["length"])])
    assert ok.count() == 3
    with pytest.raises(TypeError, match="arithmetic"):
        dagg.aggregate_by(t.df, "i", [("s", ["min"])])
    with pytest.raises(ValueError, match="no such column"):
        dagg.aggregate_by(t.df, "i", [("nope", ["sum"])])


def test_median_approx_close_to_exact(spark):
    import random

    random.seed(3)
    df = spark.createDataFrame(
        [("g", random.gauss(100, 15)) for _ in range(5000)], ["k", "v"]
    )
    out = dagg.aggregate_by(df, "k", [("v", ["median", "median_approx"])]).first()
    assert abs(out.v_median - out.v_median_approx) < 0.5


def test_from_columns_pads_to_longest(spark):
    t2 = Table.fromColumns(spark, {"a": [1, 2, 3], "b": ["x"]})
    rows = sorted(t2.toList(), key=lambda r: r.a)
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, None), (3, None)]


def test_create_index(spark):
    t2 = Table.createIndex(spark, "idx", 5, start=10, step=2)
    assert [r.idx for r in t2.df.orderBy("idx").collect()] == [10, 12, 14, 16, 18]


def test_map_pandas_escape_hatch(spark, t):
    out = t.map("v", lambda s: s * 2, "double", "v2")
    got = {r.i: r.v2 for r in out.toList()}
    assert got == {1: 3.0, 2: 5.0, 3: 7.0}


def test_positional_column_ops(t):
    assert t.columnAt(1).columnNames == ["v"]
    added = t.addColumn(1, "w", F.col("i") * 10)
    assert added.columnNames == ["i", "w", "v", "s"]
    assert added.df.orderBy("i").first().w == 10
    assert t.removeByIndex(0).columnNames == ["v", "s"]


def test_each_column(t):
    doubled = Table(t.df.select("i", "v")).eachColumn(lambda c: c * 2)
    row = doubled.df.orderBy("i").first()
    assert (row.i, row.v) == (2, 3.0)


def test_table_equality(t, spark):
    same = Table(spark.createDataFrame([(3, 3.5, "z"), (1, 1.5, "x"), (2, 2.5, "y")], ["i", "v", "s"]))
    assert t.equals(same)  # order-insensitive multiset equality
    assert not t.equals(Table(t.df.filter("i < 3")))
    assert not t.equals(Table(t.df.withColumnRenamed("v", "w")))
