"""ML bridge: the reference's sklearn adjunct re-expressed on Spark MLlib.

Reference surface (src/Learn/*.luna; C++ marshalling
native_libs/learn/Learn.h:13-36, Learn.cpp:17-73): LinearRegression,
LogisticRegression (fit / predict / score), confusionMatrix, oneHotEncode.
The reference ships whole columns to an embedded CPython running sklearn;
here the same capabilities are distributed MLlib estimators — fit is a
Spark job, predict is a plan transformation, nothing round-trips through
the driver.

All helpers take/return DataFrames with plain numeric columns; the
VectorAssembler step is internal so callers never touch MLlib vector
types.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assemble(df: DataFrame, features: Sequence[str]):
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=list(features), outputCol="__features").transform(df)


def linear_regression(
    df: DataFrame,
    features: Sequence[str],
    label: str,
    fit_intercept: bool = True,
):
    """Fit OLS (``solver='normal'`` — exact least squares, deterministic).

    Returns ``(model_summary_dict, predict)`` where ``predict(df)`` appends
    a ``prediction`` column lazily."""
    from pyspark.ml.regression import LinearRegression

    assembled = _assemble(df, features)
    lr = LinearRegression(
        featuresCol="__features",
        labelCol=label,
        solver="normal",
        regParam=0.0,
        fitIntercept=fit_intercept,
    )
    model = lr.fit(assembled)
    summary = {
        "coefficients": [float(c) for c in model.coefficients],
        "intercept": float(model.intercept),
        "r2": float(model.summary.r2),
        "rmse": float(model.summary.rootMeanSquaredError),
    }

    def predict(new_df: DataFrame) -> DataFrame:
        out = model.transform(_assemble(new_df, features))
        return out.drop("__features").withColumnRenamed("prediction", "prediction")

    return summary, predict


def logistic_regression(
    df: DataFrame,
    features: Sequence[str],
    label: str,
    max_iter: int = 100,
):
    """Binary/multinomial logistic regression (L-BFGS). Returns
    ``(model, predict)``; ``predict`` appends ``prediction`` and
    ``probability`` columns."""
    from pyspark.ml.classification import LogisticRegression

    assembled = _assemble(df, features)
    model = LogisticRegression(
        featuresCol="__features", labelCol=label, maxIter=max_iter
    ).fit(assembled)

    def predict(new_df: DataFrame) -> DataFrame:
        return model.transform(_assemble(new_df, features)).drop("__features")

    return model, predict


def confusion_matrix(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """Long-form confusion matrix: (label, prediction, n) — a groupBy, so
    it scales to any row count; pivot driver-side only if a dense matrix is
    wanted (class count is small by definition)."""
    return (
        df.groupBy(
            F.col(label_col).alias("label"), F.col(pred_col).alias("prediction")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "prediction")
    )


def one_hot_encode(df: DataFrame, col: str, drop_last: bool = False) -> DataFrame:
    """One-hot a categorical column into explicit 0/1 columns named
    ``<col>=<value>``. Category discovery is one distinct aggregation
    (driver receives only the category list — bounded by cardinality, not
    rows); encoding is a plan-side projection, no shuffle."""
    cats = [
        r[0]
        for r in df.select(col).distinct().orderBy(col).collect()
        if r[0] is not None
    ]
    if drop_last and cats:
        cats = cats[:-1]
    exprs = [
        F.when(F.col(col) == v, F.lit(1)).otherwise(F.lit(0)).alias(f"{col}={v}")
        for v in cats
    ]
    return df.select("*", *exprs)


def train_test_split(df: DataFrame, test_ratio: float = 0.25, seed: int = 42):
    """Deterministic hash-based split (stable across runs and partitioning,
    unlike randomSplit which depends on partition layout)."""
    bucket = F.pmod(F.xxhash64(*df.columns), F.lit(10_000))
    test = df.filter(bucket < int(test_ratio * 10_000))
    train = df.filter(bucket >= int(test_ratio * 10_000))
    return train, test
