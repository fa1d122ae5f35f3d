"""LQuery: the reference's JSON scalar-expression DSL, compiled to Spark
``Column`` expressions.

The reference ships filter predicates and row-wise maps from the host
language to its C++ engine as a small JSON AST (grammar parsed in
reference: native_libs/src/LQuery/AST.cpp:60-152) and interprets it
whole-column (reference: native_libs/src/LQuery/Interpreter.cpp). Here the
same JSON compiles to a Catalyst expression tree instead — the "interpreter"
is whole-stage codegen, so filters push down to the parquet scan and the
expression fuses with neighboring operators for free.

Grammar (one JSON node each):
    {"column": name}                        column reference
    123 / 1.5 / "text"                      literals
    {"timestampNs": i}                      timestamp literal (ns since epoch)
    {"operation": op, "arguments": [...]}   op in: plus minus times divide mod
                                            negate abs day month year
    {"predicate": op, "arguments": [...]}   op in: gt lt eq startsWith matches
    {"boolean": op, "arguments": [...]}     op in: and or not
    {"condition": p, "onTrue": v, "onFalse": v}

Null semantics: the reference evaluates on raw buffers then nulls out any
row where a REFERENCED column is null — filters drop the row, maps yield
null (reference: native_libs/src/LQuery/Interpreter.cpp:320-338,419-449).
SQL null propagation alone is NOT equivalent: ``null OR true`` is true in
SQL (the reference drops the row), and ``F.when`` with a null condition
falls through to ``otherwise`` (the reference yields null). So the
compiled expression must be wrapped with an explicit all-referenced-
columns-not-null guard — ``filter_expr`` / ``map_expr`` below do exactly
that, and the extra IsNotNull conjuncts push down to the scan like any
other filter.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


class LQueryError(ValueError):
    pass


def _binary_chain(op, args: list[Column]) -> Column:
    if len(args) < 2:
        raise LQueryError("binary operation needs >= 2 arguments")
    out = args[0]
    for a in args[1:]:
        out = op(out, a)
    return out


def _trunc_div(x: Column, y: Column) -> Column:
    # C++ int64/int64 division truncates toward zero — exactly Spark's
    # IntegralDivide (`div`) on integral operands. Computing it via float
    # division ((x - x%y)/y) is WRONG past 2^53: epoch-ns-scale bigints
    # (realistic here — session.py's loader divides epoch-ns by 1000) lose
    # low digits to double rounding. `div` stays in exact long arithmetic.
    return F.call_function("div", x, y)


# `mod` in the reference is C++ `%` / fmod — sign follows the dividend,
# which is Spark's `%` too (reference: native_libs/src/LQuery/Functions.h:97-121).
_OPERATIONS = {
    "plus": lambda a: _binary_chain(lambda x, y: x + y, a),
    "minus": lambda a: _binary_chain(lambda x, y: x - y, a),
    "times": lambda a: _binary_chain(lambda x, y: x * y, a),
    "divide": lambda a: _binary_chain(lambda x, y: x / y, a),
    "mod": lambda a: _binary_chain(lambda x, y: x % y, a),
    "negate": lambda a: -a[0],
    "abs": lambda a: F.abs(a[0]),
    "day": lambda a: F.dayofmonth(a[0]),
    "month": lambda a: F.month(a[0]),
    "year": lambda a: F.year(a[0]),
}

_PREDICATES = {
    "gt": lambda a: a[0] > a[1],
    "lt": lambda a: a[0] < a[1],
    "eq": lambda a: a[0] == a[1],
    # Reference uses std::string::starts_with semantics
    # (reference: native_libs/src/LQuery/Functions.h:67-80).
    "startsWith": lambda a: a[0].startswith(a[1]),
    # Reference `matches` is std::regex_match — a FULL match
    # (reference: native_libs/src/LQuery/Functions.h:81-94); Spark rlike is
    # find-anywhere, so anchor the pattern in a non-capturing group.
    "matches": lambda a: a[0].rlike(_anchor_regex(a[1])),
}

_BOOLEANS = {
    "and": lambda a: _binary_chain(lambda x, y: x & y, a),
    "or": lambda a: _binary_chain(lambda x, y: x | y, a),
    "not": lambda a: ~a[0],
}


def _anchor_regex(pattern_col: Any) -> str:
    # rlike takes a string pattern, not a column — the DSL only ever ships
    # literal patterns (reference: native_libs/src/LQuery/AST.cpp:120-130).
    if not isinstance(pattern_col, str):
        raise LQueryError("matches requires a literal string pattern")
    return f"^(?:{pattern_col})$"


def _is_integral(node: Any, dtypes: dict[str, str]) -> bool:
    """True if an LQuery value node statically evaluates to an integer —
    mirrors the C++ interpreter's type dispatch, where int64 is preserved
    through arithmetic (Functions.h BINARY_ARIT_OPERATOR on int64/int64
    yields int64)."""
    if isinstance(node, bool):
        return False
    if isinstance(node, int):
        return True
    if isinstance(node, float) or isinstance(node, str):
        return False
    if isinstance(node, dict):
        if "column" in node:
            # exact membership, not startswith — 'interval day' also
            # startswith('int') and must not be classified integral
            return dtypes.get(node["column"], "") in (
                "int",
                "bigint",
                "smallint",
                "tinyint",
            )
        if "operation" in node:
            op = node["operation"]
            args = node.get("arguments", [])
            if op in ("day", "month", "year"):
                return True
            if op in ("plus", "minus", "times", "divide", "mod", "negate", "abs"):
                return all(_is_integral(a, dtypes) for a in args)
            return False
        if "condition" in node:
            return _is_integral(node["onTrue"], dtypes) and _is_integral(
                node["onFalse"], dtypes
            )
    return False


def compile_value(node: Any, dtypes: dict[str, str] | None = None) -> Column:
    """Compile a value-producing LQuery node to a Column.

    ``dtypes`` (column name -> Spark dtype string) enables reference-exact
    integer semantics: C++ ``/`` on int64/int64 truncates toward zero,
    while Spark ``/`` is always float division. When dtypes are unknown the
    float-division delta remains (documented, SURVEY.md §7).
    """
    if isinstance(node, bool):
        raise LQueryError("boolean literals are not in the LQuery grammar")
    if isinstance(node, (int, float)):
        return F.lit(node)
    if isinstance(node, str):
        return F.lit(node)
    if isinstance(node, dict):
        if "column" in node:
            return F.col(node["column"])
        if "timestampNs" in node:
            # Reference timestamps are ns since epoch; Spark's are µs —
            # truncate (documented delta, SURVEY.md §7).
            return F.timestamp_micros(F.lit(int(node["timestampNs"]) // 1000))
        if "operation" in node:
            op = node["operation"]
            if op not in _OPERATIONS:
                raise LQueryError(f"unknown operation {op!r}")
            args = [compile_value(x, dtypes) for x in node.get("arguments", [])]
            if (
                op == "divide"
                and dtypes is not None
                and all(_is_integral(x, dtypes) for x in node.get("arguments", []))
            ):
                return _binary_chain(_trunc_div, args)
            return _OPERATIONS[op](args)
        if "condition" in node:
            return F.when(
                compile_predicate(node["condition"], dtypes),
                compile_value(node["onTrue"], dtypes),
            ).otherwise(compile_value(node["onFalse"], dtypes))
        if "predicate" in node or "boolean" in node:
            return compile_predicate(node, dtypes)
    raise LQueryError(f"unrecognized LQuery value node: {node!r}")


def compile_predicate(node: Any, dtypes: dict[str, str] | None = None) -> Column:
    """Compile a predicate LQuery node to a boolean Column."""
    if isinstance(node, dict):
        if "predicate" in node:
            op = node["predicate"]
            if op not in _PREDICATES:
                raise LQueryError(f"unknown predicate {op!r}")
            raw_args = node.get("arguments", [])
            if op in ("startsWith", "matches"):
                args = [compile_value(raw_args[0], dtypes), raw_args[1]]
                if op == "startsWith":
                    args[1] = F.lit(args[1])
            else:
                args = [compile_value(x, dtypes) for x in raw_args]
            return _PREDICATES[op](args)
        if "boolean" in node:
            op = node["boolean"]
            if op not in _BOOLEANS:
                raise LQueryError(f"unknown boolean op {op!r}")
            args = [compile_predicate(x, dtypes) for x in node.get("arguments", [])]
            return _BOOLEANS[op](args)
    raise LQueryError(f"unrecognized LQuery predicate node: {node!r}")


_NUMERIC_DTYPES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def infer_type(node: Any, dtypes: dict[str, str]) -> str:
    """Static type of an LQuery node: 'number' | 'string' | 'timestamp'.
    Mirrors the reference's runtime dispatch so ill-typed trees fail at
    compile time here instead of throwing mid-interpretation there."""
    if isinstance(node, (int, float)) and not isinstance(node, bool):
        return "number"
    if isinstance(node, str):
        return "string"
    if isinstance(node, dict):
        if "column" in node:
            name = node["column"]
            if name not in dtypes:
                raise LQueryError(f"unknown column {name!r}")
            dt = dtypes[name]
            if dt.startswith(_NUMERIC_DTYPES):
                return "number"
            if dt.startswith("timestamp"):
                return "timestamp"
            if dt.startswith("string"):
                return "string"
            raise LQueryError(f"column {name!r} has unsupported type {dt}")
        if "timestampNs" in node:
            return "timestamp"
        if "operation" in node:
            op = node["operation"]
            args = [infer_type(a, dtypes) for a in node.get("arguments", [])]
            if op in ("day", "month", "year"):
                if args != ["timestamp"]:
                    raise LQueryError(f"{op} requires a timestamp argument")
                return "number"
            if any(a != "number" for a in args):
                raise LQueryError(f"operation {op!r} requires numeric arguments")
            return "number"
        if "condition" in node:
            validate_predicate(node["condition"], dtypes)
            t, f = (
                infer_type(node["onTrue"], dtypes),
                infer_type(node["onFalse"], dtypes),
            )
            if t != f:
                raise LQueryError(f"condition branches disagree: {t} vs {f}")
            return t
    raise LQueryError(f"cannot type LQuery node: {node!r}")


def validate_predicate(node: Any, dtypes: dict[str, str]) -> None:
    """Reject the trees the reference's kernels throw on: mixed
    string/number comparisons (Functions.h:19-30) and non-string
    startsWith/matches operands."""
    if not isinstance(node, dict):
        raise LQueryError(f"not a predicate node: {node!r}")
    if "predicate" in node:
        op = node["predicate"]
        args = node.get("arguments", [])
        if op in ("gt", "lt", "eq"):
            ta, tb = infer_type(args[0], dtypes), infer_type(args[1], dtypes)
            if ta != tb:
                raise LQueryError(
                    f"{op} on mixed types {ta}/{tb} (reference throws, Functions.h:19-30)"
                )
        elif op in ("startsWith", "matches"):
            if infer_type(args[0], dtypes) != "string":
                raise LQueryError(f"{op} requires a string column")
        return
    if "boolean" in node:
        for a in node.get("arguments", []):
            validate_predicate(a, dtypes)
        return
    raise LQueryError(f"unrecognized predicate node: {node!r}")


def referenced_columns(node: Any) -> set[str]:
    """Column names referenced anywhere in an LQuery tree (the reference
    dedups these into its ColumnMapping, AST.cpp:30-37,65-81)."""
    out: set[str] = set()
    if isinstance(node, dict):
        if "column" in node:
            out.add(node["column"])
        for key in ("arguments", "condition", "onTrue", "onFalse"):
            sub = node.get(key)
            if isinstance(sub, list):
                for x in sub:
                    out |= referenced_columns(x)
            elif sub is not None:
                out |= referenced_columns(sub)
    return out


def _null_guard(node: Any) -> Column | None:
    refs = sorted(referenced_columns(node))
    if not refs:
        return None
    guard = F.col(refs[0]).isNotNull()
    for c in refs[1:]:
        guard = guard & F.col(c).isNotNull()
    return guard


def filter_expr(node: Any, dtypes: dict[str, str] | None = None) -> Column:
    """Predicate with the reference's null rule: a row with null in ANY
    referenced column is dropped, even where SQL three-valued logic would
    keep it (``null OR true``)."""
    pred = compile_predicate(node, dtypes)
    guard = _null_guard(node)
    return pred & guard if guard is not None else pred


def map_expr(node: Any, dtypes: dict[str, str] | None = None) -> Column:
    """Row-wise value with the reference's null rule: null in ANY
    referenced column nulls the output, even where SQL would produce a
    value (``condition`` with a null condition falls to ``otherwise`` in
    SQL; the reference yields null)."""
    value = compile_value(node, dtypes)
    guard = _null_guard(node)
    return F.when(guard, value) if guard is not None else value


def compile_json(text: str, *, predicate: bool = False, dtypes: dict[str, str] | None = None) -> Column:
    """Compile LQuery JSON text, the exact payload the reference ships over
    its FFI (reference: src/Internal/CWrappers.luna:307-323)."""
    node = json.loads(text)
    return filter_expr(node, dtypes) if predicate else map_expr(node, dtypes)
