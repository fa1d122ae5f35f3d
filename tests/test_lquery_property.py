"""Property-based differential test of the LQuery compiler.

An independent pure-Python evaluator implements the REFERENCE's semantics
(vectorized ops + post-hoc null rule: any referenced column null -> row
dropped for filters / null output for maps, reference
Interpreter.cpp:320-338,419-449; C++ `%` sign-follows-dividend,
Functions.h:97-121; std::regex_match full-match, Functions.h:81-94).
Hypothesis generates expression trees; both evaluators must agree on a
null-laden fixture for every tree. This is the differential coverage the
reference's own test suite lacks (SURVEY.md §5)."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from dataframes_spark.functions import lquery

# ---------------------------------------------------------------------------
# fixture rows: two numeric columns + a string column, with nulls
# ---------------------------------------------------------------------------
ROWS = [
    (0, 1.0, 2.0, "alpha"),
    (1, -3.5, None, "beta"),
    (2, None, 4.0, "alps"),
    (3, 7.25, -1.5, None),
    (4, 0.0, 0.5, "gamma"),
    (5, -2.0, -8.0, "alp"),
    (6, 9.5, 3.25, "delta"),
    (7, None, None, "al"),
]
COLS = ["i", "a", "b", "s"]


def _py_value(node, row):
    """Evaluate a value node on one row dict; None = null. Mirrors the
    interpreter's compute-then-null-fixup: we compute structurally and
    return None when any referenced column is null (checked by caller)."""
    if isinstance(node, (int, float)):
        return float(node)
    if isinstance(node, str):
        return node
    if "column" in node:
        return row[node["column"]]
    if "operation" in node:
        args = [_py_value(a, row) for a in node["arguments"]]
        if any(a is None for a in args):
            return None
        op = node["operation"]
        if op == "plus":
            return args[0] + args[1]
        if op == "minus":
            return args[0] - args[1]
        if op == "times":
            return args[0] * args[1]
        if op == "divide":
            return args[0] / args[1] if args[1] != 0 else None
        if op == "mod":
            # C++ fmod: sign follows the dividend
            return math.fmod(args[0], args[1]) if args[1] != 0 else None
        if op == "negate":
            return -args[0]
        if op == "abs":
            return abs(args[0])
    if "condition" in node:
        c = _py_pred(node["condition"], row)
        return _py_value(node["onTrue"] if c else node["onFalse"], row)
    raise AssertionError(node)


def _py_pred(node, row):
    if "predicate" in node:
        a = [_py_value(x, row) for x in node["arguments"]]
        if any(x is None for x in a):
            return False  # never true on incomplete rows; guard nulls later
        op = node["predicate"]
        if op == "gt":
            return a[0] > a[1]
        if op == "lt":
            return a[0] < a[1]
        if op == "eq":
            return a[0] == a[1]
        if op == "startsWith":
            return a[0].startswith(a[1])
    if "boolean" in node:
        args = [_py_pred(x, row) for x in node["arguments"]]
        op = node["boolean"]
        if op == "and":
            return all(args)
        if op == "or":
            return any(args)
        if op == "not":
            return not args[0]
    raise AssertionError(node)


def _refs_complete(node, row):
    return all(row[c] is not None for c in lquery.referenced_columns(node))


# ---------------------------------------------------------------------------
# expression-tree strategies (numeric-typed, so comparisons stay legal —
# the reference throws on mixed string/number comparisons)
# ---------------------------------------------------------------------------
num_col = st.sampled_from([{"column": "a"}, {"column": "b"}])
num_lit = st.sampled_from([-2.0, 0.5, 1.0, 3.0, 7])


def num_value(depth):
    if depth == 0:
        return st.one_of(num_col, num_lit)
    sub = num_value(depth - 1)
    return st.one_of(
        num_col,
        num_lit,
        st.builds(
            lambda op, x, y: {"operation": op, "arguments": [x, y]},
            st.sampled_from(["plus", "minus", "times"]),
            sub,
            sub,
        ),
        st.builds(lambda x: {"operation": "abs", "arguments": [x]}, sub),
        st.builds(lambda x: {"operation": "negate", "arguments": [x]}, sub),
    )


def predicate(depth):
    leaf = st.builds(
        lambda op, x, y: {"predicate": op, "arguments": [x, y]},
        st.sampled_from(["gt", "lt", "eq"]),
        num_value(1),
        num_value(1),
    )
    str_leaf = st.builds(
        lambda p: {"predicate": "startsWith", "arguments": [{"column": "s"}, p]},
        st.sampled_from(["al", "alp", "b", "x"]),
    )
    if depth == 0:
        return st.one_of(leaf, str_leaf)
    sub = predicate(depth - 1)
    return st.one_of(
        leaf,
        str_leaf,
        st.builds(
            lambda op, x, y: {"boolean": op, "arguments": [x, y]},
            st.sampled_from(["and", "or"]),
            sub,
            sub,
        ),
        st.builds(lambda x: {"boolean": "not", "arguments": [x]}, sub),
    )


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(ROWS, COLS).cache()


@settings(max_examples=30, deadline=None)
@given(node=predicate(2))
def test_filter_matches_reference_semantics(spark, fixture_df, node):
    got = sorted(r.i for r in fixture_df.filter(lquery.filter_expr(node)).collect())
    want = sorted(
        r[0]
        for r in ROWS
        if _refs_complete(node, dict(zip(COLS, r))) and _py_pred(node, dict(zip(COLS, r)))
    )
    assert got == want, node


@settings(max_examples=30, deadline=None)
@given(node=num_value(2))
def test_map_matches_reference_semantics(spark, fixture_df, node):
    out = fixture_df.select("i", lquery.map_expr(node).alias("v")).collect()
    got = {r.i: r.v for r in out}
    for raw in ROWS:
        row = dict(zip(COLS, raw))
        want = _py_value(node, row) if _refs_complete(node, row) else None
        g = got[row["i"]]
        if want is None:
            assert g is None, (node, row)
        else:
            assert g is not None and math.isclose(g, want, rel_tol=1e-12), (node, row)


def test_null_or_true_drops_row(spark, fixture_df):
    # the case SQL three-valued logic gets wrong: a is null but the other
    # disjunct is true -> SQL keeps the row, the reference drops it
    node = {
        "boolean": "or",
        "arguments": [
            {"predicate": "gt", "arguments": [{"column": "a"}, 100]},
            {"predicate": "gt", "arguments": [{"column": "b"}, -100]},
        ],
    }
    got = sorted(r.i for r in fixture_df.filter(lquery.filter_expr(node)).collect())
    # rows 2, 7 have null a; rows 1, 7 null b -> all dropped despite b > -100
    assert got == [0, 3, 4, 5, 6]


def test_null_condition_yields_null_not_otherwise(spark, fixture_df):
    node = {
        "condition": {"predicate": "gt", "arguments": [{"column": "a"}, 0]},
        "onTrue": 1.0,
        "onFalse": 0.0,
    }
    got = {r.i: r.v for r in fixture_df.select("i", lquery.map_expr(node).alias("v")).collect()}
    assert got[2] is None and got[7] is None  # null a -> null, not onFalse
    assert got[0] == 1.0 and got[1] == 0.0