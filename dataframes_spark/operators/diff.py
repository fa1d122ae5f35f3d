"""Snapshot diffing: what changed between two corpus versions.

Training-data pipelines re-materialize corpora every run (new crawl,
new filters, new dedup thresholds); the first question after every
rebuild is "what actually changed?". These operators answer it at scale:
ONE null-safe full outer join on the key — each side shuffles once on
the key it is probably already bucketed/partitioned by — and everything
downstream folds to status-cardinality or column-cardinality rows.
No reference analog (the reference has no versioned-corpus tooling);
north-star surface alongside the data card and drift gates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_status(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key diff between snapshot ``a`` (old) and ``b`` (new):
    ``(*key_cols, status)`` with status ``added`` (key only in b),
    ``removed`` (only in a), ``changed`` (present in both, any compared
    column differs — null-safe), or ``unchanged``. ``compare_cols``
    defaults to every shared non-key column. Exactly one full outer
    join; comparison is a JVM expression over the joined row, so the
    relation never widens or re-shuffles."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("diff_status needs at least one key column")
    if compare_cols is None:
        compare_cols = [
            c for c in a.columns if c in set(b.columns) and c not in keys
        ]
    la = a.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_a"),
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
    )
    lb = b.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_b"),
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
    )
    j = la.join(lb, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
    status = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))


def diff_summary(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """The rebuild report: ``(kind, name, n)`` — row-status counts
    (``kind='rows'``: added/removed/changed/unchanged) plus, for every
    compared column, how many surviving keys changed in THAT column
    (``kind='column'``). One full outer join feeds both folds; the
    per-column counts ride the same joined relation as a single
    aggregate (no per-column rescans), folded map-side to a handful of
    cells."""
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in a.columns if c in set(b.columns) and c not in keys
        ]
    la = a.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_a"),
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
    )
    lb = b.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_b"),
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
    )
    j = la.join(lb, keys, "full_outer")
    both = F.col("__in_a").isNotNull() & F.col("__in_b").isNotNull()
    col_diff = {
        c: both & ~F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
        for c in compare_cols
    }
    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | col_diff[c]
    # coalesce: two EMPTY snapshots must report zeros, not NULL sums
    # (caught by tests/test_diff_property.py's accounting identity)
    z = lambda col: F.coalesce(F.sum(col), F.lit(0))  # noqa: E731
    aggs = [
        z(F.col("__in_a").isNull().cast("long")).alias("__added"),
        z(F.col("__in_b").isNull().cast("long")).alias("__removed"),
        z((both & any_diff).cast("long")).alias("__changed"),
        z((both & ~any_diff).cast("long")).alias("__unchanged"),
    ] + [
        z(col_diff[c].cast("long")).alias(f"__col_{c}")
        for c in compare_cols
    ]
    wide = j.agg(*aggs)
    parts = [
        wide.select(
            F.lit("rows").alias("kind"),
            F.lit(s).alias("name"),
            F.col(f"__{s}").alias("n"),
        )
        for s in ("added", "removed", "changed", "unchanged")
    ] + [
        wide.select(
            F.lit("column").alias("kind"),
            F.lit(c).alias("name"),
            F.col(f"__col_{c}").alias("n"),
        )
        for c in compare_cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
