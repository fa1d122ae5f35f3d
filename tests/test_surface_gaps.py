"""Coverage for public surfaces no other test file exercised directly:
top_k's plan shape, the bulk table loader, the multimodal schema
factory, LQuery predicate validation, and the reusable map lifter."""

import pytest
from pyspark.sql import functions as F


def test_top_k_plans_take_ordered(spark):
    from dataframes_spark.operators.sort import top_k

    df = spark.createDataFrame([(i, i % 3) for i in range(100)], ["v", "g"])
    out = top_k(df, [("v", "desc", "last")], 5)
    got = [r.v for r in out.collect()]
    assert got == [99, 98, 97, 96, 95]
    # orderBy+limit must plan as a per-partition k-heap, never a global sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_load_tables_all_present(spark, sf_dir):
    from dataframes_spark.session import TABLES, load_tables

    tables = load_tables(spark, sf_dir)
    assert set(tables) == set(TABLES)
    assert tables["region"].count() == 5


def test_media_schema_shape(spark):
    from dataframes_spark.operators.multimodal import media_schema

    s = media_schema()
    assert [f.name for f in s.fields] == ["media_id", "payload", "meta"]
    # the schema is usable as-is for an empty typed frame
    assert spark.createDataFrame([], s).count() == 0


def test_validate_predicate_rejects_reference_errors():
    from dataframes_spark.functions.lquery import LQueryError, validate_predicate

    dtypes = {"a": "bigint", "c": "string"}
    with pytest.raises(LQueryError):
        validate_predicate("nope", dtypes)
    with pytest.raises(LQueryError):
        # mixed string/number comparison (reference Functions.h:19-30)
        validate_predicate(
            {"predicate": "gt", "arguments": [{"column": "c"}, 5]}, dtypes
        )
    # a legal tree passes silently
    validate_predicate(
        {"predicate": "gt", "arguments": [{"column": "a"}, 5]}, dtypes
    )


def test_map_expression_reusable_lifter(spark):
    from dataframes_spark.functions.udf import map_expression

    double_it = map_expression(lambda s: s * 2.0, "double")
    df = spark.createDataFrame([(1.0,), (2.0,)], ["x"])
    out = df.select(double_it(F.col("x")).alias("y"), double_it(F.col("x") + 1).alias("z"))
    assert [(r.y, r.z) for r in out.orderBy("y").collect()] == [(2.0, 4.0), (4.0, 6.0)]
