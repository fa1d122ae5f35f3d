"""Skew-mitigation operators.

AQE's skew-join splitting (on in session.py) handles skewed SORT-MERGE
JOINS at runtime; these helpers cover the cases AQE cannot re-plan:

- aggregate_by_skew_safe: group-by with a handful of hot keys leaves most
  reducers idle and concentrates one key's whole partial state on one
  task. Salting splits every key into ``salt_buckets`` sub-keys, reduces
  each shard in parallel, then merges the tiny per-shard states. Only
  aggregates with decomposable state are offered (sum/length/min/max/
  mean/std via moment sums) — median/percentile have no mergeable state
  and must go through the plain path.
- replicate_join: broadcast-replicate pattern for joining a big skewed
  fact against a small dimension WITHOUT relying on the broadcast
  planner: the dimension is exploded once per salt bucket so each fact
  shard meets exactly one dimension copy. Useful when the dimension is
  small enough to replicate but the optimizer lacks stats to see it.

Aggregate output follows the same contract as operators/aggregate.py:
``<col>_<fn>`` names, double-typed, Length counts nulls.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = ("sum", "length", "min", "max", "mean", "std")


def _salt(df: DataFrame, buckets: int, id_col: str | None = None) -> Column:
    # deterministic per-row salt, stable under task retries: the salt feeds
    # shuffle keys, so it must reproduce identically when a partial stage is
    # recomputed after a fetch failure. rand() and
    # monotonically_increasing_id() both fail that bar (their values depend
    # on runtime partition layout / intra-partition order, which a retry of
    # a post-shuffle input need not reproduce), so only value-derived
    # expressions are allowed here. Content hash alone leaves one residual
    # skew mode: a corpus where one EXACT row repeats millions of times
    # re-concentrates in a single shard. Callers with such data pass
    # ``id_col`` — a column that is unique per row (a real key, a file
    # offset, a pre-assigned id) — and ties spread fully while staying
    # retry-safe.
    cols = ([id_col] if id_col else []) + df.columns
    return F.pmod(F.xxhash64(*cols), F.lit(buckets))


def aggregate_by_skew_safe(
    df: DataFrame,
    key: str | Sequence[str],
    pairs: Iterable[tuple[str, Sequence[str]]],
    salt_buckets: int = 32,
    id_col: str | None = None,
) -> DataFrame:
    """Two-stage salted group-by for hot/low-cardinality keys.

    Stage 1 groups on (key, salt) and reduces each shard to moment sums
    (n, n_valid, sum, sum_sq, min, max); stage 2 merges ``salt_buckets``
    shard states per key. The heavy shuffle carries shard STATES (a few
    doubles each), never row-level values, and stage-1 parallelism is
    ``distinct_keys x salt_buckets`` instead of ``distinct_keys``.

    The salt is a deterministic content hash (retry-safe; see ``_salt``).
    If the data contains exact-duplicate rows repeated at skew scale, pass
    ``id_col`` naming a per-row-unique column so duplicates still spread."""
    keys = [key] if isinstance(key, str) else list(key)
    pairs = [(c, list(fns)) for c, fns in pairs]
    for c, fns in pairs:
        bad = [f for f in fns if f.lower() not in _MERGEABLE]
        if bad:
            raise ValueError(
                f"{bad} have non-mergeable state; use operators.aggregate.aggregate_by"
            )

    value_cols = sorted({c for c, _ in pairs})
    stage1 = df.withColumn("__salt", _salt(df, salt_buckets, id_col)).groupBy(
        *keys, "__salt"
    )
    partials = []
    for c in value_cols:
        col = F.col(c)
        partials += [
            F.count(F.lit(1)).alias(f"__{c}_n"),
            F.count(col).alias(f"__{c}_nv"),
            F.sum(col).alias(f"__{c}_s"),
            # per-shard Welford variance: each shard's M2 comes from
            # Spark's numerically stable var_pop, so the raw sum-of-
            # squares moment (catastrophic cancellation at large means,
            # sqrt(negative) -> NaN) never exists
            F.var_pop(col).alias(f"__{c}_vp"),
            F.min(col).alias(f"__{c}_mn"),
            F.max(col).alias(f"__{c}_mx"),
        ]
    shards = stage1.agg(*partials)

    def merged(c: str, fn: str) -> Column:
        n = F.sum(f"__{c}_n")
        nv = F.sum(f"__{c}_nv")
        s = F.sum(f"__{c}_s")
        if fn == "length":
            expr = n
        elif fn == "sum":
            expr = F.coalesce(s, F.lit(0.0))
        elif fn == "min":
            expr = F.min(f"__{c}_mn")
        elif fn == "max":
            expr = F.max(f"__{c}_mx")
        elif fn == "mean":
            expr = F.when(nv >= 1, s / nv)
        elif fn == "std":
            # population std via parallel-variance merge: total M2 =
            # sum of shard M2s (vp_i * nv_i) + between-shard term.
            # Clamped at 0: the between-shard cancellation can leave a
            # tiny negative (or ~1e-18 positive -> std ~1e-9 on exactly-
            # constant columns — the documented delta vs the plain
            # path's exact 0.0); the clamp guarantees no NaN.
            m2w = F.sum(
                F.coalesce(F.col(f"__{c}_vp") * F.col(f"__{c}_nv"), F.lit(0.0))
            )
            smw = F.sum(
                F.when(
                    F.col(f"__{c}_nv") > 0,
                    F.col(f"__{c}_s") * F.col(f"__{c}_s") / F.col(f"__{c}_nv"),
                ).otherwise(F.lit(0.0))
            )
            var = (m2w + smw - s * s / nv) / nv
            expr = F.when(nv >= 2, F.sqrt(F.greatest(F.lit(0.0), var)))
        else:  # pragma: no cover - guarded above
            raise AssertionError(fn)
        return expr.cast("double").alias(f"{c}_{fn}")

    finals = [merged(c, fn.lower()) for c, fns in pairs for fn in fns]
    return shards.groupBy(*keys).agg(*finals)


def replicate_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    id_col: str | None = None,
) -> DataFrame:
    """Salted fact-dimension join: fact rows get a deterministic
    content-hash salt (retry-safe — no rand()/monotonic id in a shuffle
    key; pass ``id_col`` to spread exact-duplicate fact rows), the
    dimension is exploded ``salt_buckets`` times, and the join key becomes
    (on, salt) — every hot join key spreads over ``salt_buckets`` reducers
    instead of one.

    Only fact-preserving join types are accepted: under right/full outer
    joins an UNMATCHED dimension row survives once per salt replica, so
    the result would carry ``salt_buckets`` copies of it. Those joins
    need a different strategy (AQE skew handling on a plain join), not
    replication."""
    if how.lower().replace("_", "") not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti", "cross",
    ):
        raise ValueError(
            f"replicate_join supports fact-preserving joins only, got {how!r}: "
            "an unmatched dim row would be emitted once per salt replica"
        )
    salted_fact = fact.withColumn("__salt", _salt(fact, salt_buckets, id_col))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(salted_dim, [on, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame, key_cols: str | Sequence[str], top_n: int = 20
) -> DataFrame:
    """Heavy-key diagnosis for a prospective join/aggregation key:
    the ``top_n`` most frequent key values with row count, share of the
    table, and a skew ratio vs the mean key size — the numbers that
    decide whether a key needs salting (``aggregate_by_skew_safe``),
    replication (``replicate_join``), or nothing.

    One hash aggregate keyed by the key columns (map-side combine), the
    table total and distinct-key mean folded in as a 1-row broadcast
    aggregate, and a top-n heap (TakeOrderedAndProject) — no global
    sort, no collect. Null keys count as a key value (they hot-spot
    joins like any other value).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").cast("double").alias("__total"),
        F.avg("n_rows").alias("__mean_sz"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(F.col("n_rows") / F.col("__mean_sz"), 4).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_n)
    )
