"""Driver-side plotting adjunct (reference: src/Table.luna:1475-1657,
which shells into matplotlib/seaborn the same way).

Plotting is inherently a driver-side convenience: the data is SAMPLED or
AGGREGATED down to plot size in the CLUSTER first, and only the tiny
result is collected — never the raw table. Guarded on matplotlib, which
is optional in this environment (like the reference's optional plotting
deps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")  # headless-safe; callers can switch later
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "plotting requires matplotlib (optional, not in this environment)"
        ) from e


def histogram(df: DataFrame, col: str, bins: int = 50, out_path: str | None = None):
    """Histogram of a numeric column. Bin counting runs DISTRIBUTED
    (width_bucket-style aggregation); only ``bins`` rows reach the driver."""
    plt = _plt()  # fail fast on the missing optional dep, before any job
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    if lo is None:  # empty or all-null column: an empty-axes figure
        fig, ax = plt.subplots()
        ax.set_xlabel(col)
        ax.set_ylabel("count")
        if out_path:
            fig.savefig(out_path)
            plt.close(fig)
        return fig
    if hi == lo:
        hi = lo + 1
    width = (hi - lo) / bins
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(
            F.least(
                F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
            ).alias("__b")
        )
        .count()
        .collect()
    )
    ys = [0] * bins
    for r in counts:
        ys[int(r["__b"])] = r["count"]
    xs = [lo + (i + 0.5) * width for i in range(bins)]
    fig, ax = plt.subplots()
    ax.bar(xs, ys, width=width * 0.95)
    ax.set_xlabel(col)
    ax.set_ylabel("count")
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig


def scatter(
    df: DataFrame,
    x: str,
    y: str,
    max_points: int = 10_000,
    out_path: str | None = None,
):
    """Scatter plot of two numeric columns; inputs larger than
    ``max_points`` are uniformly sampled in the cluster before collect."""
    plt = _plt()
    pts = df.select(x, y).dropna()
    n = pts.count()
    if n > max_points:
        pts = pts.sample(fraction=max_points / n, seed=42)
    rows = pts.collect()
    fig, ax = plt.subplots()
    ax.scatter([r[0] for r in rows], [r[1] for r in rows], s=4, alpha=0.5)
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig
