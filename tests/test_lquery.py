"""LQuery DSL compiler tests — golden inputs/outputs mirror the reference's
FilteringFixture cases (reference: native_libs/test/Tests.cpp:285-712)."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.functions.lquery import LQueryError, compile_json, compile_predicate, compile_value


@pytest.fixture(scope="module")
def tbl(spark):
    # mirrors the reference fixture: a=0..9, b=10..19, c="five chars"-ish
    rows = [(i, float(10 + i), f"s{i}") for i in range(10)]
    return spark.createDataFrame(rows, ["a", "b", "c"])


def _filter_a(tbl, node):
    return [r.a for r in tbl.filter(compile_predicate(node)).orderBy("a").collect()]


def test_arithmetic_ops(tbl):
    expr = compile_value(
        {"operation": "plus", "arguments": [{"column": "a"}, {"operation": "times", "arguments": [{"column": "b"}, 2]}]}
    )
    got = [r.v for r in tbl.select(expr.alias("v")).orderBy("v").collect()]
    assert got == [float(i + 2 * (10 + i)) for i in range(10)]


def test_mod_matches_cpp_semantics(spark):
    # C++ % : sign follows dividend (reference: LQuery/Functions.h:97-121)
    tbl = spark.createDataFrame([(-7,), (-2,), (2,), (7,)], ["x"])
    expr = compile_value({"operation": "mod", "arguments": [{"column": "x"}, 3]})
    got = [r.m for r in tbl.select(expr.alias("m")).orderBy("x").collect()]
    assert got == [-1, -2, 2, 1]


def test_negate_abs(tbl):
    expr = compile_value({"operation": "abs", "arguments": [{"operation": "negate", "arguments": [{"column": "a"}]}]})
    got = [r.v for r in tbl.select(expr.alias("v")).collect()]
    assert sorted(got) == list(range(10))


def test_comparisons_and_booleans(tbl):
    node = {
        "boolean": "and",
        "arguments": [
            {"predicate": "gt", "arguments": [{"column": "a"}, 2]},
            {"boolean": "not", "arguments": [{"predicate": "eq", "arguments": [{"column": "a"}, 5]}]},
        ],
    }
    assert _filter_a(tbl, node) == [3, 4, 6, 7, 8, 9]


def test_starts_with(tbl):
    node = {"predicate": "startsWith", "arguments": [{"column": "c"}, "s1"]}
    assert _filter_a(tbl, node) == [1]


def test_matches_is_full_match(spark):
    # std::regex_match, not search (reference: LQuery/Functions.h:81-94)
    tbl = spark.createDataFrame([("abc",), ("zabc",), ("abcz",)], ["s"])
    node = {"predicate": "matches", "arguments": [{"column": "s"}, "abc"]}
    got = [r.s for r in tbl.filter(compile_predicate(node)).collect()]
    assert got == ["abc"]


def test_condition_node(tbl):
    node = {
        "condition": {"predicate": "lt", "arguments": [{"column": "a"}, 5]},
        "onTrue": {"column": "a"},
        "onFalse": {"operation": "negate", "arguments": [{"column": "a"}]},
    }
    got = {r.a: r.v for r in tbl.select("a", compile_value(node).alias("v")).collect()}
    assert got == {i: (i if i < 5 else -i) for i in range(10)}


def test_null_rows_dropped_by_filter(spark):
    # reference nulls out any row whose referenced column is null
    # (Interpreter.cpp:320-338; test Tests.cpp:714-800)
    tbl = spark.createDataFrame([(1.0,), (None,), (4.0,), (None,)], ["a"])
    node = {"predicate": "eq", "arguments": [{"operation": "mod", "arguments": [{"column": "a"}, 2]}, 0]}
    got = [r.a for r in tbl.filter(compile_predicate(node)).collect()]
    assert got == [4.0]


def test_null_propagates_through_map(spark):
    tbl = spark.createDataFrame([(1.0,), (None,)], ["a"])
    expr = compile_value({"operation": "plus", "arguments": [{"column": "a"}, 1]})
    got = [r.v for r in tbl.select(expr.alias("v")).collect()]
    assert got == [2.0, None]


def test_timestamp_literal(spark):
    ns = 1_700_000_000_000_000_000
    expr = compile_json('{"timestampNs": %d}' % ns)
    got = spark.range(1).select(expr.alias("t")).first().t
    assert got.year == 2023


def test_errors():
    with pytest.raises(LQueryError):
        compile_json('{"operation": "frobnicate", "arguments": []}')
    with pytest.raises(LQueryError):
        compile_json("true")
    with pytest.raises(LQueryError):
        compile_predicate({"predicate": "like", "arguments": []})


def test_mixed_type_comparison_throws(spark):
    from dataframes_spark.core import Table
    from dataframes_spark.functions.lquery import LQueryError

    t = Table(spark.createDataFrame([(1, "x")], ["n", "s"]))
    with pytest.raises(LQueryError, match="mixed types"):
        t.filter({"predicate": "gt", "arguments": [{"column": "s"}, 5]})
    with pytest.raises(LQueryError, match="string column"):
        t.filter({"predicate": "startsWith", "arguments": [{"column": "n"}, "a"]})
    with pytest.raises(LQueryError, match="numeric arguments"):
        t.each("y", {"operation": "plus", "arguments": [{"column": "s"}, 1]})
    with pytest.raises(LQueryError, match="timestamp argument"):
        t.each("y", {"operation": "year", "arguments": [{"column": "n"}]})
    # well-typed trees still pass
    assert t.filter({"predicate": "eq", "arguments": [{"column": "s"}, "x"]}).rowCount() == 1


def test_integer_divide_truncates_like_cpp(spark):
    # C++ int64/int64 division truncates toward zero (reference:
    # LQuery/Functions.h BINARY_ARIT_OPERATOR(/)); Spark `/` is float
    # division, so the compiler must emit truncating division when both
    # operand types are integral — which it only knows given dtypes.
    from dataframes_spark.functions.lquery import map_expr

    tbl = spark.createDataFrame([(-7,), (-2,), (2,), (7,)], ["x"])
    node = {"operation": "divide", "arguments": [{"column": "x"}, 3]}
    dtypes = dict(tbl.dtypes)
    got = {r.x: r.v for r in tbl.select("x", map_expr(node, dtypes).alias("v")).collect()}
    assert got == {-7: -2, -2: 0, 2: 0, 7: 2}  # trunc toward zero, not floor
    out_type = dict(tbl.select(map_expr(node, dtypes).alias("v")).dtypes)["v"]
    assert out_type == "bigint"
    # without dtypes the documented float-division delta remains
    got_f = {r.x: r.v for r in tbl.select("x", map_expr(node).alias("v")).collect()}
    assert abs(got_f[-7] - (-7 / 3)) < 1e-12


def test_float_divide_stays_float(spark):
    from dataframes_spark.functions.lquery import map_expr

    tbl = spark.createDataFrame([(7, 2.0)], ["x", "y"])
    node = {"operation": "divide", "arguments": [{"column": "x"}, {"column": "y"}]}
    got = tbl.select(map_expr(node, dict(tbl.dtypes)).alias("v")).collect()[0].v
    assert got == 3.5


def test_integer_divide_exact_past_2_53(spark):
    # ((x - x%y)/y).cast('long') routes through IEEE doubles and is off by
    # up to ~100 ulps for epoch-ns magnitudes; the compiler must use exact
    # long arithmetic (Spark IntegralDivide). 1700000000123456789 // 10 is
    # the loader's own epoch-ns -> µs conversion shape (session.py:124).
    from dataframes_spark.functions.lquery import map_expr

    big = 1700000000123456789
    tbl = spark.createDataFrame([(big,), (2**62,)], ["x"])
    node = {"operation": "divide", "arguments": [{"column": "x"}, 10]}
    got = sorted(r.v for r in tbl.select(map_expr(node, dict(tbl.dtypes)).alias("v")).collect())
    assert got == sorted([big // 10, (2**62) // 10])


def test_is_integral_rejects_interval_dtype():
    # 'interval day'.startswith('int') is True — membership must be exact
    from dataframes_spark.functions.lquery import _is_integral

    assert _is_integral({"column": "c"}, {"c": "bigint"})
    assert not _is_integral({"column": "c"}, {"c": "interval day"})
    assert not _is_integral({"column": "c"}, {"c": "interval year to month"})


def test_setat_addcolumn_use_dtype_aware_division(spark):
    # setAt/addColumn must compile LQuery dicts with the same dtype-aware
    # truncating division as each() — not silently fall back to float `/`
    from dataframes_spark.core import Table

    t = Table(spark.createDataFrame([(-7,)], ["x"]))
    node = {"operation": "divide", "arguments": [{"column": "x"}, 3]}
    assert t.setAt("q", node).toList()[0].q == -2
    assert t.addColumn(0, "q", node).toList()[0].q == -2
    # and they validate types like each() does
    import pytest as _pytest

    from dataframes_spark.functions.lquery import LQueryError

    t2 = Table(spark.createDataFrame([(1, "s")], ["n", "s"]))
    with _pytest.raises(LQueryError):
        t2.setAt("y", {"operation": "plus", "arguments": [{"column": "s"}, 1]})
