"""Group-by aggregation with the reference's output contract.

Reference: ``aggregateBy`` groups by ONE key column and computes, per
(value column x aggregate function) pair, a double-typed output column named
``<col>_<fn>`` (reference: native_libs/src/Analysis.cpp:640-730, naming at
701-721). Aggregate set is a fixed enum (reference:
native_libs/src/Analysis.h:67-70; Luna mirror src/Table.luna:30-52).

Spark-first: ``df.groupBy(key).agg(...)`` — a distributed hash aggregate
with map-side partial aggregation; at 100 TB the shuffle carries only
per-group partial states, not rows. All aggregates here are built-in JVM
expressions (no Python in the hot path). The same builders serve window
frames (operators/window.py) — each primitive aggregate is wrapped by a
caller-supplied function (identity for groupBy, ``.over(frame)`` for
windows) so composed aggregates like RSI work in both contexts.

Contract details kept from the reference:
- every output column is cast to double (Analysis.cpp:701-721);
- ``Length`` counts rows INCLUDING nulls — ``F.count(F.lit(1))``, not
  ``F.count(col)`` (Analysis.cpp:166-183);
- an aggregate yields NULL unless the group had >= RequiredSampleCount
  valid values: 1 for min/max/mean/median/first/last/rsi, 2 for std, 0 for
  sum/length (Analysis.cpp:552-561,705-715);
- ``Sum`` of an empty/all-null group is 0, not null (Analysis.cpp:155-164);
- ``RSI`` = 100 * mean(max(x,0)) / (mean(max(x,0)) - mean(min(x,0)))
  (Analysis.cpp:217-239);
- the reference's group ordering (nulls first, then first-appearance,
  Analysis.h:29-64) is nondeterministic under distribution — output order
  is explicitly unspecified here; callers sort.

NOT replicated (known reference bugs, SURVEY.md §7): Maximum's
numeric_limits<double>::min() init (Analysis.cpp:103) and naive int Mean
overflow (Analysis.cpp:111-122).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Wrap = Callable[[Column], Column]
_IDENTITY: Wrap = lambda e: e  # noqa: E731


def _simple(agg: Callable[[Column], Column]):
    return lambda c, wrap: wrap(agg(F.col(c)))


def _median(c: str, wrap: Wrap) -> Column:
    return wrap(F.percentile(F.col(c), F.lit(0.5)))


def _sum(c: str, wrap: Wrap) -> Column:
    # empty/all-null group sums to 0, not null (Analysis.cpp:155-164)
    return F.coalesce(wrap(F.sum(F.col(c))), F.lit(0.0))


def _length(c: str, wrap: Wrap) -> Column:
    return wrap(F.count(F.lit(1)))


def _rsi(c: str, wrap: Wrap) -> Column:
    # nulls must stay OUT of both conditional means: the reference's Mean
    # accumulator is a no-op on null (Analysis.cpp Mean::operator()), so a
    # null row contributes to neither the gains nor the losses average.
    # F.avg skips nulls, and the isNotNull guard keeps the when() null for
    # null inputs instead of mapping them to 0.0 (which would inflate the
    # denominators of both means).
    col = F.col(c)
    gains = wrap(F.avg(F.when(col.isNotNull(), F.greatest(col, F.lit(0.0)))))
    losses = wrap(F.avg(F.when(col.isNotNull(), F.least(col, F.lit(0.0)))))
    return F.lit(100.0) * gains / (gains - losses)


# name -> (builder(col_name, wrap) -> Column, required_sample_count)
AGGREGATES: dict[str, tuple] = {
    "min": (_simple(F.min), 1),
    "max": (_simple(F.max), 1),
    "mean": (_simple(F.avg), 1),
    "length": (_length, 0),
    "median": (_median, 1),
    "first": (_simple(lambda c: F.first(c, ignorenulls=True)), 1),
    "last": (_simple(lambda c: F.last(c, ignorenulls=True)), 1),
    "sum": (_sum, 0),
    "rsi": (_rsi, 1),
    "std": (_simple(F.stddev_pop), 2),
    # scale path: exact percentile buffers every group value on one
    # reducer; the GK-sketch variant has bounded state (the 100 TB choice
    # when exact rank error < 1/10000 isn't required)
    "median_approx": (
        lambda c, wrap: wrap(F.percentile_approx(F.col(c), 0.5, 10_000)),
        1,
    ),
}


def build_aggregate(fn: str, col: str, wrap: Wrap = _IDENTITY) -> Column:
    """One contract-conforming aggregate: gated on RequiredSampleCount,
    cast to double, aliased ``<col>_<fn>``."""
    fn = fn.lower()
    if fn not in AGGREGATES:
        raise ValueError(f"unknown aggregate {fn!r}; have {sorted(AGGREGATES)}")
    builder, required = AGGREGATES[fn]
    expr = builder(col, wrap)
    if required > 0:
        expr = F.when(wrap(F.count(F.col(col))) >= required, expr)
    return expr.cast("double").alias(f"{col}_{fn}")


def aggregate_exprs(pairs: Iterable[tuple[str, Sequence[str]]], wrap: Wrap = _IDENTITY) -> list[Column]:
    return [build_aggregate(fn, col, wrap) for col, fns in pairs for fn in fns]


def aggregate_by(
    df: DataFrame,
    key: str | Sequence[str],
    pairs: Iterable[tuple[str, Sequence[str]]],
    order_by: str | None = None,
) -> DataFrame:
    """``table.aggregateBy key [(col, [fns])]`` (reference:
    src/Table.luna:1264-1300). Accepts multiple keys as a Spark-native
    extension (the reference allows exactly one).

    ``first``/``last`` need ``order_by``: the reference's "first valid in
    group order" rides its single-threaded row order, which doesn't exist
    distributed — Spark's ``F.first`` would return whichever partition
    wins the race. With an explicit order they become ``min_by/max_by``
    over valid rows: deterministic under any partitioning."""
    keys = [key] if isinstance(key, str) else list(key)
    pairs = [(c, list(fns)) for c, fns in pairs]
    validate_aggregate_types(df, pairs)
    ordered = {"first", "last"}
    needs_order = [
        (c, fn) for c, fns in pairs for fn in fns if fn.lower() in ordered
    ]
    if needs_order and order_by is None:
        raise ValueError(
            f"{sorted({fn for _, fn in needs_order})} are order-dependent; "
            "pass order_by= (distributed row order is undefined without it)"
        )
    exprs = []
    for c, fns in pairs:
        for fn in fns:
            if fn.lower() in ordered:
                # min_by/max_by over rows where the value is valid ==
                # first/last VALID value in order (reference
                # Analysis.cpp:185-215)
                o = F.when(F.col(c).isNotNull(), F.col(order_by))
                agg = F.min_by(F.col(c), o) if fn.lower() == "first" else F.max_by(F.col(c), o)
                gate = F.count(F.col(c)) >= 1
                exprs.append(F.when(gate, agg).cast("double").alias(f"{c}_{fn.lower()}"))
            else:
                exprs.append(build_aggregate(fn, c))
    return df.groupBy(*keys).agg(*exprs)


_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def validate_aggregate_types(df: DataFrame, pairs: Iterable[tuple[str, Sequence[str]]]) -> None:
    """The reference's relaxed typing rule: ``Length`` accepts any column,
    every other aggregate requires an arithmetic one and THROWS otherwise
    (Analysis.cpp:79-87,166-183; test Tests.cpp:1183-1220). Spark would
    happily min() a string lexicographically and cast to null — surfacing
    the error beats silently conforming output types."""
    dtypes = dict(df.dtypes)
    for c, fns in pairs:
        if c not in dtypes:
            raise ValueError(f"no such column {c!r}")
        numeric = dtypes[c].startswith(_NUMERIC_PREFIXES)
        for fn in fns:
            if fn.lower() != "length" and not numeric:
                raise TypeError(
                    f"aggregate {fn!r} requires an arithmetic column; "
                    f"{c!r} is {dtypes[c]} (only 'length' accepts it)"
                )


def group_collect(
    df: DataFrame,
    key: str | Sequence[str],
    cols: Sequence[str],
    order_by: str,
) -> DataFrame:
    """``groupBy`` list-collect: non-key columns become LIST columns
    (reference: native_libs/src/Processing.cpp:611-692 — C++-only, not
    exposed to Luna; its lists KEEP nulls).

    Spark's ``collect_list`` silently drops nulls, so each value is
    struct-wrapped with its order key: collect structs, sort by the key,
    then project the (possibly null) value back out. One hash-aggregate
    shuffle; list order is deterministic (``order_by`` ascending) where
    the reference inherits input order."""
    keys = [key] if isinstance(key, str) else list(key)
    aggs = [
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col(order_by).alias("o"), F.col(c).alias("v")))),
            lambda x: x["v"],
        ).alias(f"{c}_list")
        for c in cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def count_values(df: DataFrame, col: str) -> DataFrame:
    """``Column.countValues`` — value -> occurrence count, including a row
    for nulls (reference: native_libs/src/Analysis.cpp:40-77). The
    reference's hash-map iteration order is nondeterministic; we make the
    output deterministic by sorting on count desc, value asc."""
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("value").asc_nulls_first())
    )
