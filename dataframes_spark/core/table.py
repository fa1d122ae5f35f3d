"""Table — a thin fluent wrapper giving the reference's API surface over a
lazy Spark DataFrame.

The reference's Table (reference: src/Table.luna:54-64) is eager and
materializes after every call; here each method just composes the logical
plan and Catalyst fuses the chain — same API semantics ("every call
returns a new table"), distributed execution.

Method names follow src/Table.luna so a reference user can map 1:1:
    at / columns / setAt / remove / rename    column surgery (Table.luna:214-484)
    filter / each / eachTo                    LQuery expressions (Table.luna:695-804)
    dropNa / fillNa / interpolate             null handling (Table.luna:972-1072)
    sort / sortByColumn                       multi-key sort (Table.luna:806-952)
    aggregateBy / countValues                 aggregation (Table.luna:1264-1300)
    shift / rollingInterval                   time series (Table.luna:1397-1468)
    ungroupSplittingOn                        reshaping (Table.luna:1471-1473)
    describe / describeNa / correlations      statistics (Table.luna:1096-1361)
    take / drop / slice                       row ranges (Table.luna:602-663)
    join / union / intersect / except_        beyond-reference (absent there, §2.4/§2.9)
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataframes_spark.functions import lquery
from dataframes_spark.functions import stats as _stats
from dataframes_spark.operators import aggregate as _agg
from dataframes_spark.operators import nulls as _nulls
from dataframes_spark.operators import reshape as _reshape
from dataframes_spark.operators import sort as _sort
from dataframes_spark.operators import window as _window


def _as_column(expr: Any, dtypes: dict | None = None) -> Column:
    """Accept a Column, an LQuery dict/JSON node, or a column name.
    LQuery nodes get the reference's null rule (null referenced column ->
    null output) via ``map_expr``; passing dtypes enables reference-exact
    integer division (C++ int64/int64 truncates)."""
    if isinstance(expr, Column):
        return expr
    if isinstance(expr, dict):
        return lquery.map_expr(expr, dtypes)
    if isinstance(expr, str):
        return F.col(expr)
    return F.lit(expr)


def _as_predicate(expr: Any, dtypes: dict | None = None) -> Column:
    """LQuery nodes get the reference's null rule (null referenced column
    -> row dropped) via ``filter_expr``."""
    if isinstance(expr, Column):
        return expr
    if isinstance(expr, dict):
        return lquery.filter_expr(expr, dtypes)
    if isinstance(expr, str):
        return F.expr(expr)
    raise TypeError(f"cannot interpret {expr!r} as a predicate")


class Table:
    """Immutable fluent wrapper; ``.df`` exposes the underlying DataFrame."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- construction -----------------------------------------------------
    @classmethod
    def read(cls, spark, path: str, **options) -> "Table":
        from dataframes_spark.io.readers import read_auto

        return cls(read_auto(spark, path, **options))

    def write(self, path: str, **options) -> None:
        from dataframes_spark.io.writers import write_auto

        write_auto(self.df, path, **options)

    @classmethod
    def fromColumns(cls, spark, columns: dict) -> "Table":
        """Build from name -> python list (reference ``Table.fromColumns`` /
        ``Column.fromList``, src/Table.luna:92-96, src/Column.luna:147-152).
        Shorter columns are padded with nulls to the longest
        (src/Table.luna:68-96)."""
        n = max((len(v) for v in columns.values()), default=0)
        rows = [
            tuple(v[i] if i < len(v) else None for v in columns.values())
            for i in range(n)
        ]
        if not rows:
            # empty columns are legal in the reference (Table.luna:68-96);
            # with zero rows Spark cannot infer types, so give the frame
            # an explicit all-string schema (the reference's untyped-empty
            # columns default to its text type as well)
            from pyspark.sql import types as T

            schema = T.StructType(
                [T.StructField(name, T.StringType()) for name in columns]
            )
            return cls(spark.createDataFrame([], schema))
        return cls(spark.createDataFrame(rows, list(columns.keys())))

    @classmethod
    def createIndex(cls, spark, name: str, n: int, start: int = 0, step: int = 1) -> "Table":
        """Int sequence column (reference ``createIndex``,
        src/Column.luna:154-156) — ``spark.range`` is already a
        distributed, partitioned source."""
        df = spark.range(start, start + n * step, step).select(F.col("id").alias(name))
        return cls(df)

    def map(self, col: str, fn, return_type: str = "double", out_name: str | None = None) -> "Table":
        """``Column.map`` escape hatch -> Arrow-batched pandas UDF
        (functions/udf.py); prefer LQuery/``each`` for anything a builtin
        expression can say."""
        from dataframes_spark.functions.udf import map_column

        return Table(map_column(self.df, col, fn, return_type, out_name))

    # -- metadata ----------------------------------------------------------
    @property
    def columnNames(self) -> list[str]:
        return self.df.columns

    @property
    def schema(self):
        return self.df.schema

    def rowCount(self) -> int:
        return self.df.count()

    def columnCount(self) -> int:
        return len(self.df.columns)

    # -- column surgery (reference: src/Table.luna:214-484) ----------------
    def at(self, name: str) -> "Table":
        return Table(self.df.select(name))

    def columns(self, names: Sequence[str]) -> "Table":
        return Table(self.df.select(*names))

    def columnAt(self, i: int) -> "Table":
        """Select by position (reference ``columnAt``, src/Table.luna:214-216)."""
        return Table(self.df.select(self.df.columns[i]))

    def addColumn(self, i: int, name: str, expr: Any) -> "Table":
        """Insert a column at position ``i`` (reference ``addColumn``,
        src/Table.luna:248-249) — column order is part of the reference's
        table identity, so the projection is rebuilt explicitly."""
        names = list(self.df.columns)
        names.insert(i, name)
        compiled = self._compile_value(expr)
        cols = [compiled.alias(name) if c == name else F.col(c) for c in names]
        return Table(self.df.select(*cols))

    def removeByIndex(self, i: int) -> "Table":
        """Drop by position (reference ``removeByIndex``, src/Table.luna:457-458)."""
        return Table(self.df.drop(self.df.columns[i]))

    def eachColumn(self, fn) -> "Table":
        """Apply a Column -> Column function to every column (reference
        ``eachColumn``, src/Table.luna:749-752)."""
        return Table(self.df.select(*[fn(F.col(c)).alias(c) for c in self.df.columns]))

    def equals(self, other: "Table") -> bool:
        """Schema + data (multiset) equality (reference ``==``,
        src/Table.luna:574-575 via arrow::Table::Equals). Distributed:
        two anti-diffs, no driver-side collect of the data."""
        if [f.simpleString() for f in self.df.schema.fields] != [
            f.simpleString() for f in other.df.schema.fields
        ]:
            return False
        return (
            self.df.exceptAll(other.df).isEmpty()
            and other.df.exceptAll(self.df).isEmpty()
        )

    def setAt(self, name: str, expr: Any) -> "Table":
        return Table(self.df.withColumn(name, self._compile_value(expr)))

    def remove(self, name: str) -> "Table":
        return Table(self.df.drop(name))

    def rename(self, old: str, new: str) -> "Table":
        return Table(self.df.withColumnRenamed(old, new))

    def filterColumns(self, pred) -> "Table":
        keep = [c for c, t in self.df.dtypes if pred(c, t)]
        return Table(self.df.select(*keep))

    # -- expressions (LQuery; reference: src/Table.luna:695-804) ------------
    def _compile_value(self, expr: Any) -> Column:
        """Compile a value expression exactly like ``each`` does: LQuery
        dicts are type-validated and get dtype-aware integer semantics.
        ``df.dtypes`` is fetched ONCE here — each fetch analyzes the logical
        plan JVM-side, and doubling it per call measurably slowed chained
        filter/each pipelines (2.5x on lquery_datetime)."""
        if isinstance(expr, dict):
            dtypes = dict(self.df.dtypes)
            lquery.infer_type(expr, dtypes)
            return _as_column(expr, dtypes)
        return _as_column(expr)

    def filter(self, expr: Any) -> "Table":
        if isinstance(expr, dict):
            dtypes = dict(self.df.dtypes)
            lquery.validate_predicate(expr, dtypes)
            return Table(self.df.filter(_as_predicate(expr, dtypes)))
        return Table(self.df.filter(_as_predicate(expr)))

    def each(self, name: str, expr: Any) -> "Table":
        """Reference ``eachTo name f`` — append a computed column."""
        return Table(self.df.withColumn(name, self._compile_value(expr)))

    # -- null handling ------------------------------------------------------
    def dropNa(self, subset: Sequence[str] | None = None) -> "Table":
        return Table(_nulls.drop_na(self.df, subset))

    def fillNa(self, value, subset: Sequence[str] | None = None) -> "Table":
        return Table(_nulls.fill_na(self.df, value, subset))

    def interpolate(self, cols: Sequence[str], order_by: str, partition_by=None) -> "Table":
        return Table(_nulls.interpolate(self.df, cols, order_by, partition_by))

    # -- sorting -------------------------------------------------------------
    def sort(self, keys, stable_tiebreaker: str | None = None) -> "Table":
        return Table(_sort.sort_by(self.df, keys, stable_tiebreaker))

    # -- aggregation ----------------------------------------------------------
    def aggregateBy(self, key, pairs: Iterable[tuple[str, Sequence[str]]]) -> "Table":
        return Table(_agg.aggregate_by(self.df, key, pairs))

    def countValues(self, col: str) -> "Table":
        return Table(_agg.count_values(self.df, col))

    # -- statistics -------------------------------------------------------------
    def describe(self, cols=None) -> "Table":
        return Table(_stats.describe(self.df, cols))

    def describeNa(self, cols=None) -> "Table":
        return Table(_stats.describe_na(self.df, cols))

    def correlations(self, cols=None) -> "Table":
        return Table(_stats.correlations(self.df, cols))

    def correlationsWith(self, target: str, cols=None) -> "Table":
        return Table(_stats.correlations_with(self.df, target, cols))

    # -- time series ----------------------------------------------------------
    def shift(self, col: str, periods: int, order_by: str, partition_by=None) -> "Table":
        return Table(_window.shift(self.df, col, periods, order_by, partition_by))

    def rollingInterval(self, ts_col: str, interval_us: int, pairs, partition_by=None) -> "Table":
        return Table(_window.rolling_interval(self.df, ts_col, interval_us, pairs, partition_by))

    # -- reshaping ---------------------------------------------------------------
    def ungroupSplittingOn(self, col: str, sep: str) -> "Table":
        return Table(_reshape.ungroup_splitting_on(self.df, col, sep))

    def concat(self, other: "Table", order_self, order_other) -> "Table":
        return Table(_reshape.concat_horizontal(self.df, other.df, order_self, order_other))

    def take(self, n: int, order_by: Sequence[str]) -> "Table":
        return Table(_reshape.slice_rows(self.df, 0, n, order_by))

    def slice(self, begin: int, count: int, order_by: Sequence[str]) -> "Table":
        return Table(_reshape.slice_rows(self.df, begin, count, order_by))

    # -- beyond-reference: joins & set ops (absent in reference, SURVEY §2.4/§2.9)
    def join(self, other: "Table", on, how: str = "inner", broadcast_other: bool = False) -> "Table":
        rhs = F.broadcast(other.df) if broadcast_other else other.df
        return Table(self.df.join(rhs, on, how))

    def union(self, other: "Table") -> "Table":
        return Table(self.df.unionByName(other.df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self.df.intersect(other.df))

    def except_(self, other: "Table") -> "Table":
        return Table(self.df.exceptAll(other.df))

    # -- beyond-reference: pipeline hooks (plan audit + quality gate) --------
    def assert_scalable(self, allow: tuple[str, ...] = ()) -> "Table":
        """Raise if this table's plan carries a known scale-killer
        (dataframes_spark.plan.assert_scalable); returns self so it
        chains inside a pipeline expression."""
        from dataframes_spark.plan import assert_scalable

        assert_scalable(self.df, allow=allow)
        return self

    def validate(self, checks) -> "Table":
        """Run the one-pass data-quality suite
        (dataframes_spark.quality.validate) and raise naming every
        failed check; returns self for chaining."""
        from dataframes_spark.quality import validate

        validate(self.df, checks)
        return self

    # -- materialization ------------------------------------------------------
    def toList(self):
        return self.df.collect()

    def show(self, n: int = 20):
        return self.df.show(n)

    def toJSON(self, max_cells: int = 1000) -> list[str]:
        """JSON rows, capped like the reference's UI payload (~1000 cells,
        src/Table.luna:502-523)."""
        max_rows = max(1, max_cells // max(1, len(self.df.columns)))
        return self.df.limit(max_rows).toJSON().collect()
