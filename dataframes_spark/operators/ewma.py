"""Batch exponentially-weighted moving average over an explicit
ordering, distributed — the batch twin of the streaming per-key EWMA
(`streaming/events.py _ewma_pdf`, which pins the semantics: pandas
``ewm(alpha, adjust=False)`` seeded by the first value — ``y_1 = x_1``,
``y_t = a*x_t + (1-a)*y_{t-1}``), with no per-group buffering: a whale
user's million events never sit in one task.

Construction (the global-order lane's shapes, `operators/global_order.py`):

1. Bucketize on quantile boundaries of the ORDER key (groups share
   buckets, so tasks balance by data volume, not group sizes).
2. Per (group, bucket): ONE JVM window + aggregate pass produces the
   affine summary — non-null count ``n``, zero-seeded recursion tail
   ``t = a * sum(x_r * (1-a)^(n-r))`` (exact closed form of the
   recursion; the deepest exponents underflow to the zero they are),
   and the first non-null value ``f``. The recursion is AFFINE in its
   seed (``state_out = (1-a)^n * state_in + t``), which is what makes
   per-bucket summaries compose. No Python here — tiny (group, bucket)
   cells would pay per-group Arrow overhead thousands of times.
3. Per group: fold the ≤ n_buckets summary rows serially with a JVM
   higher-order ``F.aggregate`` over one sorted ``collect_list`` array —
   group-cardinality work; for the global (no-group) variant the
   collect rides an un-keyed aggregate, the benign
   SinglePartition-over-aggregate shape every ``df.agg()`` has.
4. Per BUCKET (not per group!): one Arrow-batched output pass seeds
   pandas' C-level grouped ``ewm`` with each group's carried-in state
   (synthetic seed row prepended per group, dropped after — the
   streaming module's trick, vectorized across all groups in the
   bucket). Task memory stays bucket-bounded; Arrow overhead is paid
   n_buckets times, not groups x buckets times.

Numerics: within-bucket values ride the sequential recursion; summaries
and carries compose through ``pow`` — mathematically identical, FP-equal
to ~1e-13 relative. Cross-engine comparisons round (ORACLE.md rule 2);
with power-of-two alpha and small-integer values everything is exactly
representable and the lanes agree BIT for bit (the `ewma_user_values`
driver pin).

Null VALUES output NULL and leave the state unchanged (pandas
``ignore_na=True`` relative weighting); null ORDER keys sort first (the
lane's asc-nulls-first contract). Equal order keys resolve
arbitrarily-but-validly — pass a unique tiebreak column for a
deterministic result (the `grouped_positions` contract).

No reference analog (the reference's rolling surface is
``rollingInterval``, `src/Table.luna`); public semantics per pandas
``DataFrame.ewm``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .global_order import _bucketized, nullsafe_join


def _join_carries(
    data: DataFrame, carries: DataFrame, by: Sequence[str], bucket: str = "__go_b"
) -> DataFrame:
    """Left-join per-(group, bucket) carries onto the bucketized data
    with NULL-SAFE group-key equality — groupBy/collect kept NULL group
    keys as a real group, so the join must too (a USING join would
    silently orphan their carry state)."""
    if not by:
        return data.join(carries, [bucket], "left")
    return nullsafe_join(data, carries, [*by, bucket], how="left")


def ewma(
    df: DataFrame,
    value_col: str,
    alpha: float,
    order_by: str | Sequence[str],
    by: Sequence[str] = (),
    n_buckets: int | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """EWMA of ``value_col`` over ``order_by`` (globally, or per ``by``
    group), streaming-identical semantics, whale-safe: memory per task
    is bounded by the BUCKET, never by a group's size."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"need 0 < alpha <= 1, got {alpha}")
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    by = list(by)
    decay = 1.0 - alpha

    bdf = _bucketized(df, order_cols, n_buckets)

    # ---- stage 1: per-(group, bucket) affine summaries — pure JVM ---
    x = F.col(value_col).cast("double")
    nn = bdf.filter(x.isNotNull())
    wpart = W.partitionBy(*by, "__go_b").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    wall = W.partitionBy(*by, "__go_b").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ranked = nn.select(
        *by,
        "__go_b",
        x.alias("__ew_x"),
        F.row_number().over(wpart).alias("__ew_r"),
        F.count(F.lit(1)).over(wall).alias("__ew_cnt"),
    )
    summaries = ranked.groupBy(*by, "__go_b").agg(
        F.max("__ew_cnt").cast("long").alias("__ew_n"),
        (
            F.lit(alpha)
            * F.sum(
                F.col("__ew_x")
                * F.pow(F.lit(decay), (F.col("__ew_cnt") - F.col("__ew_r")).cast("double"))
            )
        ).alias("__ew_t"),
        F.max(F.when(F.col("__ew_r") == 1, F.col("__ew_x"))).alias("__ew_f"),
    )

    # ---- stage 2: serial carry fold over each group's ≤ n_buckets
    # summary rows (JVM higher-order fold over ONE sorted array) ------
    packed = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("__go_b").alias("b"),
                F.col("__ew_n").alias("n"),
                F.col("__ew_t").alias("t"),
                F.col("__ew_f").alias("f"),
            )
        )
    ).alias("__ew_arr")
    grouped = (
        summaries.groupBy(*by).agg(packed) if by else summaries.agg(packed)
    )
    out_t = "array<struct<b:int,c:double,has:boolean>>"
    zero = F.struct(
        F.lit(0.0).alias("s"),
        F.lit(False).alias("seeded"),
        F.expr(f"CAST(array() AS {out_t})").alias("out"),
    )

    def _step(acc, e):
        fresh = F.when(
            acc["seeded"],
            F.pow(F.lit(decay), e["n"].cast("double")) * acc["s"] + e["t"],
        ).otherwise(
            # first seeded bucket: y_1 = x_1, i.e. the zero-seeded tail
            # plus the seed's weight top-up (1-a)^n * first
            e["t"] + F.pow(F.lit(decay), e["n"].cast("double")) * e["f"]
        )
        return F.struct(
            F.when(e["n"] > 0, fresh).otherwise(acc["s"]).alias("s"),
            (acc["seeded"] | (e["n"] > 0)).alias("seeded"),
            F.array_append(
                acc["out"],
                F.struct(
                    e["b"].alias("b"),
                    acc["s"].alias("c"),
                    acc["seeded"].alias("has"),
                ),
            ).alias("out"),
        )

    carries_arr = F.aggregate(
        F.col("__ew_arr"), zero, _step, lambda acc: acc["out"]
    ).alias("__ew_cs")
    carries = (
        grouped.select(*by, carries_arr)
        .select(*by, F.explode("__ew_cs").alias("__ew_c"))
        .select(
            *by,
            F.col("__ew_c.b").alias("__go_b"),
            F.col("__ew_c.c").alias("__ew_carry"),
            F.col("__ew_c.has").alias("__ew_has"),
        )
    )
    if not by:
        carries = F.broadcast(carries)

    # ---- stage 3: ONE output pass per BUCKET: pandas' C-level grouped
    # ewm, carry-seeded via synthetic first rows ----------------------
    # null-SAFE join on the group keys: a NULL group is a real group
    # (stage 1/2 kept it), and a USING join would orphan its carries
    joined = _join_carries(bdf, carries, by)
    data_cols = list(df.columns)
    out_schema = T.StructType(
        [df.schema[c] for c in data_cols]
        + [T.StructField(out_col, T.DoubleType())]
    )
    gcols = list(by)

    def _emit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [*gcols, *order_cols], kind="mergesort", na_position="first"
        ).reset_index(drop=True)
        if gcols:
            first_of_group = ~pdf.duplicated(subset=gcols)
        else:
            first_of_group = pd.Series(False, index=pdf.index)
            if len(pdf):
                first_of_group.iloc[0] = True
        has = pdf["__ew_has"].fillna(False).astype(bool)
        seed_rows = pdf[first_of_group & has].copy()
        seed_rows[value_col] = seed_rows["__ew_carry"].astype(float)
        seed_rows["__ew_ord"] = 0
        body = pdf.copy()
        body["__ew_ord"] = 1
        combined = pd.concat([seed_rows, body], ignore_index=True)
        combined = combined.sort_values(
            [*gcols, "__ew_ord", *order_cols],
            kind="mergesort",
            na_position="first",
        ).reset_index(drop=True)
        vals = combined[value_col].astype(float)
        if gcols:
            e = (
                combined.assign(__ew_v=vals)
                .groupby(gcols, sort=False, dropna=False)["__ew_v"]
                .ewm(alpha=alpha, adjust=False, ignore_na=True)
                .mean()
            )
            # the grouped ewm returns (group..., row) MultiIndex; align
            # back to combined's RangeIndex positionally via the row level
            e.index = e.index.get_level_values(-1)
            e = e.sort_index()
        else:
            e = vals.ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
        keep = combined["__ew_ord"] == 1
        res = combined.loc[keep, data_cols].copy()
        ewma_vals = e[keep]
        # null inputs output NULL (state unchanged handled by ignore_na)
        mask = combined.loc[keep, value_col].notna()
        res[out_col] = ewma_vals.where(mask, other=float("nan"))
        return res

    return joined.groupBy("__go_b").applyInPandas(_emit, schema=out_schema)


def decayed_sum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    halflife: str | int,
    by: Sequence[str] = (),
    out_col: str = "decayed_sum",
    bucket_halflives: int = 16,
) -> DataFrame:
    """Half-life-decayed running sum over IRREGULAR event times — the
    trending / freshness-weighting primitive (every item's weight
    halves each ``halflife`` of wall-clock):
    ``y_t = sum_{e_j <= e_t} x_j * exp(-ln2 * (e_t - e_j) / halflife)``,
    tie-INCLUSIVE on equal timestamps (time-based semantics, so the
    result is deterministic without a tiebreak column — unlike the
    row-ordered EWMA). Null values contribute nothing but still
    observe the state; null-TIMESTAMP rows have no place on the time
    axis and pass through with a NULL score (all input rows survive,
    the `ewma` contract).

    Pure JVM, no Python anywhere: time is cut into FIXED buckets of
    ``bucket_halflives`` half-lives (16 by default, so within-bucket
    exponent magnitudes stay <= ln2*16 ~ 11 — no overflow however long
    the corpus spans); within each (group, bucket) a RANGE-frame window
    builds the rescaled prefix, one groupBy folds bucket totals, and a
    JVM higher-order fold composes carries across buckets with
    gap-aware decay (empty buckets = extra ``2^-16`` factors, which
    underflow to the zeros they are). Buckets here are time-anchored
    (not the quantile lane): the decay factor between buckets must be
    a constant of the BUCKET, which is exactly what makes the carry
    fold exact. Per-group fold state is the group's ACTIVE bucket
    count (span / (bucket_halflives * halflife)) — pick a wider
    ``bucket_halflives`` for very long spans at very short
    half-lives."""
    import math

    from .rollup import width_us

    if bucket_halflives < 2:
        raise ValueError(
            f"need bucket_halflives >= 2, got {bucket_halflives}"
        )
    hl_us = width_us(halflife)
    lam_per_us = math.log(2.0) / hl_us
    w_us = hl_us * bucket_halflives
    q = 0.5**bucket_halflives  # exp(-lam * w_us), exactly

    by = list(by)
    e = F.unix_micros(F.col(ts_col))
    base = df.filter(F.col(ts_col).isNotNull())
    bidx = ((e - F.pmod(e, F.lit(w_us))) / F.lit(w_us)).cast("long")
    rel = (e - bidx * F.lit(w_us)).cast("double") * F.lit(lam_per_us)
    x = F.coalesce(F.col(value_col).cast("double"), F.lit(0.0))
    prepped = base.select(
        "*",
        bidx.alias("__ds_b"),
        (x * F.exp(rel)).alias("__ds_g"),
        rel.alias("__ds_rel"),
    )
    wfr = (
        W.partitionBy(*by, "__ds_b")
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(W.unboundedPreceding, 0)
    )
    pref = prepped.withColumn("__ds_p", F.sum("__ds_g").over(wfr))
    totals = prepped.groupBy(*by, "__ds_b").agg(
        F.sum("__ds_g").alias("__ds_gt")
    )
    packed = F.sort_array(
        F.collect_list(
            F.struct(F.col("__ds_b").alias("b"), F.col("__ds_gt").alias("g"))
        )
    ).alias("__ds_arr")
    grouped = totals.groupBy(*by).agg(packed) if by else totals.agg(packed)
    out_t = "array<struct<b:bigint,s:double>>"
    zero = F.struct(
        F.lit(0.0).alias("s"),
        F.lit(None).cast("bigint").alias("pb"),
        F.expr(f"CAST(array() AS {out_t})").alias("out"),
    )

    def _step(acc, el):
        # acc.s = decayable mass anchored at the PREVIOUS summary's
        # bucket start (prior state + that bucket's total); the state
        # at THIS bucket's start is that mass decayed by the gap-aware
        # bucket distance (empty buckets are just extra q factors)
        s_new = F.when(acc["pb"].isNull(), F.lit(0.0)).otherwise(
            acc["s"] * F.pow(F.lit(q), (el["b"] - acc["pb"]).cast("double"))
        )
        return F.struct(
            (s_new + el["g"]).alias("s"),
            el["b"].alias("pb"),
            F.array_append(
                acc["out"],
                F.struct(el["b"].alias("b"), s_new.alias("s")),
            ).alias("out"),
        )

    carries_arr = F.aggregate(
        F.col("__ds_arr"), zero, _step, lambda acc: acc["out"]
    ).alias("__ds_cs")
    carries = (
        grouped.select(*by, carries_arr)
        .select(*by, F.explode("__ds_cs").alias("__ds_c"))
        .select(
            *by,
            F.col("__ds_c.b").alias("__ds_b"),
            F.col("__ds_c.s").alias("__ds_s"),
        )
    )
    if not by:
        carries = F.broadcast(carries)
    joined = _join_carries(pref, carries, by, bucket="__ds_b")
    y = (F.col("__ds_p") + F.coalesce(F.col("__ds_s"), F.lit(0.0))) * F.exp(
        -F.col("__ds_rel")
    )
    out = joined.select(*df.columns, y.alias(out_col))
    # null-timestamp rows have no place on the time axis but stay in
    # the output (NULL score), matching `ewma`'s keep-all-rows contract
    null_ts = df.filter(F.col(ts_col).isNull()).select(
        *df.columns, F.lit(None).cast("double").alias(out_col)
    )
    return out.unionByName(null_ts)
