"""Batch exponentially-weighted moving average over an explicit
ordering, distributed — the batch twin of the streaming per-key EWMA
(`streaming/events.py _ewma_pdf`, which pins the semantics: pandas
``ewm(alpha, adjust=False)`` seeded by the first value — ``y_1 = x_1``,
``y_t = a*x_t + (1-a)*y_{t-1}``), with no per-group buffering: a whale
user's million events never sit in one task.

Construction (the global-order lane's shapes, `operators/global_order.py`):

1. Bucketize on quantile boundaries of the ORDER key (groups share
   buckets, so tasks balance by data volume, not group sizes).
2. Per (group, bucket): ONE Arrow-batched summary row — non-null count
   ``n``, zero-seeded recursion tail ``t`` and first non-null value
   ``f``. The recursion is AFFINE in its seed (``state_out = (1-a)^n *
   state_in + t``), which is what makes per-bucket summaries compose.
3. Per group: fold the ≤ n_buckets summary rows serially with a JVM
   higher-order ``F.aggregate`` over one sorted ``collect_list`` array —
   group-cardinality work; for the global (no-group) variant the
   collect rides an un-keyed aggregate, the benign
   SinglePartition-over-aggregate shape every ``df.agg()`` has.
4. Per (group, bucket): the output pass seeds pandas ``ewm`` with the
   bucket's carried-in state (prepend + drop, the streaming module's
   trick) — Arrow-batched, bucket-bounded memory.

Numerics: within-bucket values ride the sequential recursion; carries
compose through ``pow`` — mathematically identical, FP-equal to ~1e-13
relative. Cross-engine comparisons round (ORACLE.md rule 2).

Null VALUES output NULL and leave the state unchanged; null ORDER keys
sort first (the lane's asc-nulls-first contract). Equal order keys
resolve arbitrarily-but-validly — pass a unique tiebreak column for a
deterministic result (the `grouped_positions` contract).

No reference analog (the reference's rolling surface is
``rollingInterval``, `src/Table.luna`); public semantics per pandas
``DataFrame.ewm``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .global_order import _bucketized

_SUMMARY_FIELDS = [
    T.StructField("__ew_n", T.LongType()),
    T.StructField("__ew_t", T.DoubleType()),
    T.StructField("__ew_f", T.DoubleType()),
]


def _zero_seeded_tail(vals, alpha: float) -> float:
    s = 0.0
    for x in vals:
        s = alpha * x + (1.0 - alpha) * s
    return s


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

    # ---- stage 1: per-(group, bucket) affine summaries -------------
    sum_schema = T.StructType(
        [bdf.schema[c] for c in (*by, "__go_b")] + _SUMMARY_FIELDS
    )

    def _summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort", na_position="first")
        vals = pdf[value_col].dropna().astype(float)
        head = pdf.iloc[:1][[*by, "__go_b"]].copy()
        head["__ew_n"] = int(len(vals))
        head["__ew_t"] = (
            _zero_seeded_tail(vals.to_numpy(), alpha) if len(vals) else 0.0
        )
        head["__ew_f"] = float(vals.iloc[0]) if len(vals) else 0.0
        return head

    summaries = bdf.groupBy(*by, "__go_b").applyInPandas(
        _summarize, schema=sum_schema
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
        summaries.groupBy(*by).agg(packed)
        if by
        else summaries.agg(packed)
    )
    out_t = "array<struct<b:int,c:double,has:boolean>>"
    zero = F.struct(
        F.lit(0.0).alias("s"),
        F.lit(False).alias("seeded"),
        F.expr(f"CAST(array() AS {out_t})").alias("out"),
    )

    def _step(acc, x):
        fresh = F.when(
            acc["seeded"],
            F.pow(F.lit(decay), x["n"].cast("double")) * acc["s"] + x["t"],
        ).otherwise(
            # first seeded bucket: y_1 = x_1, i.e. the zero-seeded tail
            # plus the seed's weight top-up (1-a)^n * first
            x["t"] + F.pow(F.lit(decay), x["n"].cast("double")) * x["f"]
        )
        return F.struct(
            F.when(x["n"] > 0, fresh).otherwise(acc["s"]).alias("s"),
            (acc["seeded"] | (x["n"] > 0)).alias("seeded"),
            F.array_append(
                acc["out"],
                F.struct(
                    x["b"].alias("b"),
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

    # ---- stage 3: per-(group, bucket) output pass, carry-seeded ----
    joined = bdf.join(carries, [*by, "__go_b"], "left")
    data_cols = list(df.columns)
    out_schema = T.StructType(
        [df.schema[c] for c in data_cols]
        + [T.StructField(out_col, T.DoubleType())]
    )

    def _emit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort", na_position="first")
        vals = pdf[value_col].astype(float)
        mask = vals.notna()
        sub = vals[mask]
        has = bool(pdf["__ew_has"].fillna(False).iloc[0]) if len(pdf) else False
        if len(sub):
            if has:
                carry = float(pdf["__ew_carry"].iloc[0])
                seeded = pd.concat(
                    [pd.Series([carry], dtype=float), sub], ignore_index=True
                )
                e = (
                    seeded.ewm(alpha=alpha, adjust=False)
                    .mean()
                    .iloc[1:]
                    .to_numpy()
                )
            else:
                e = sub.ewm(alpha=alpha, adjust=False).mean().to_numpy()
        else:
            e = []
        out = pd.Series(float("nan"), index=pdf.index, dtype=float)
        out[mask] = e
        res = pdf[data_cols].copy()
        res[out_col] = out
        return res

    return joined.groupBy(*by, "__go_b").applyInPandas(
        _emit, schema=out_schema
    )
