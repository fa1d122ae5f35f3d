"""Driver-side plotting adjunct (reference: src/Table.luna:1475-1657 —
histogram/scatter/plot/plotDate/kde/kde2/heatmap/fillBetween — which
shells into matplotlib/seaborn the same way via
src/Plot/Matplotlib.luna:18-50).

Plotting is inherently a driver-side convenience: the data is SAMPLED or
AGGREGATED down to plot size in the CLUSTER first, and only the tiny
result is collected — never the raw table. Every plot is therefore split
in two:

- a ``*_grid`` / ``*_data`` REDUCTION function holding all the
  distributed work (binning, bucketed downsampling, stats) — runs and is
  tested with no plotting dependency at all;
- a thin RENDER function gated on matplotlib, which is optional in this
  environment (like the reference's optional plotting deps).

KDE uses the binned approximation: the cluster produces a fine histogram
(one small aggregation, ``grid`` rows collected), and the driver
convolves it with a Gaussian kernel in numpy — O(grid^2) on plot-sized
arrays. Exact KDE would evaluate every kernel at every grid point
cluster-side for no visible difference at plot resolution.
"""

from __future__ import annotations

import math

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
    if max_points <= 0:
        raise ValueError(f"max_points must be positive, got {max_points}")
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


# ---------------------------------------------------------------------------
# distributed reduction stages (no plotting dependency)
# ---------------------------------------------------------------------------


def _silverman_bandwidth(df: DataFrame, col: str) -> tuple[float, int, float, float]:
    """Silverman's rule-of-thumb bandwidth from ONE distributed
    aggregation: h = 0.9 * min(sigma, IQR/1.34) * n^(-1/5).
    Returns (h, n, lo, hi); h=0 signals a degenerate column."""
    row = df.agg(
        F.count(col).alias("n"),
        F.stddev_samp(col).alias("sd"),
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        F.percentile_approx(col, 0.25).alias("q1"),
        F.percentile_approx(col, 0.75).alias("q3"),
    ).first()
    n = int(row["n"] or 0)
    if n < 2 or row["sd"] is None:
        return 0.0, n, float(row["lo"] or 0.0), float(row["hi"] or 0.0)
    sd = float(row["sd"])
    iqr = float(row["q3"]) - float(row["q1"])
    spread = min(x for x in (sd, iqr / 1.34) if x > 0) if (sd > 0 or iqr > 0) else 0.0
    return 0.9 * spread * n ** (-1 / 5), n, float(row["lo"]), float(row["hi"])


def _binned_counts(df: DataFrame, col: str, lo: float, width: float, bins: int):
    """Fine histogram for the KDE approximation: distributed groupBy on
    the bucket index, only ``bins`` rows collected."""
    rows = (
        df.filter(F.col(col).isNotNull())
        .groupBy(
            F.least(
                F.greatest(
                    F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)),
                    F.lit(0),
                ),
                F.lit(bins - 1),
            ).alias("__b")
        )
        .count()
        .collect()
    )
    counts = [0] * bins
    for r in rows:
        counts[int(r["__b"])] = r["count"]
    return counts


def kde_grid(
    df: DataFrame, col: str, grid: int = 256, bandwidth: float | None = None
) -> tuple[list[float], list[float]]:
    """Gaussian KDE of a numeric column, binned approximation:
    ``(xs, density)`` of length ``grid``. All heavy work is the one
    fine-histogram aggregation; the kernel convolution runs driver-side
    on the ``grid``-sized array (numpy outer product, O(grid^2) on
    plot-sized data). Returns empty lists for <2 data points."""
    import numpy as np

    h, n, lo, hi = _silverman_bandwidth(df, col)
    if bandwidth is not None:
        h = float(bandwidth)
    if n < 2 or h <= 0:
        return [], []
    lo_p, hi_p = lo - 3 * h, hi + 3 * h
    width = (hi_p - lo_p) / grid or 1.0
    counts = np.asarray(_binned_counts(df, col, lo_p, width, grid), dtype=np.float64)
    centers = lo_p + (np.arange(grid) + 0.5) * width
    z = (centers[:, None] - centers[None, :]) / h
    dens = (np.exp(-0.5 * z * z) / math.sqrt(2 * math.pi)) @ counts / (n * h)
    return centers.tolist(), dens.tolist()


def kde2_grid(
    df: DataFrame,
    x: str,
    y: str,
    grid: int = 64,
    bandwidths: tuple[float, float] | None = None,
):
    """2-D Gaussian KDE (reference ``kde2``): ``(xs, ys, Z)`` with Z a
    ``grid x grid`` nested list. One distributed 2-D bucket count
    (``grid^2`` rows collected, 4096 at the default); the separable
    kernel convolution is two plot-sized matrix products driver-side."""
    import numpy as np

    pts = df.select(x, y).dropna()
    # one combined aggregation for both axes' bandwidth stats — two
    # per-axis _silverman_bandwidth calls would scan the input twice
    row = pts.agg(
        F.count(x).alias("n"),
        F.stddev_samp(x).alias("sdx"),
        F.min(x).alias("lox"),
        F.max(x).alias("hix"),
        F.percentile_approx(x, 0.25).alias("q1x"),
        F.percentile_approx(x, 0.75).alias("q3x"),
        F.stddev_samp(y).alias("sdy"),
        F.min(y).alias("loy"),
        F.max(y).alias("hiy"),
        F.percentile_approx(y, 0.25).alias("q1y"),
        F.percentile_approx(y, 0.75).alias("q3y"),
    ).first()
    nx = int(row["n"] or 0)

    def silverman(sd, q1, q3) -> float:
        if nx < 2 or sd is None:
            return 0.0
        iqr = float(q3) - float(q1)
        spreads = [s for s in (float(sd), iqr / 1.34) if s > 0]
        return 0.9 * min(spreads) * nx ** (-1 / 5) if spreads else 0.0

    hx = silverman(row["sdx"], row["q1x"], row["q3x"])
    hy = silverman(row["sdy"], row["q1y"], row["q3y"])
    lox, hix = float(row["lox"] or 0.0), float(row["hix"] or 0.0)
    loy, hiy = float(row["loy"] or 0.0), float(row["hiy"] or 0.0)
    if bandwidths is not None:
        hx, hy = float(bandwidths[0]), float(bandwidths[1])
    if nx < 2 or hx <= 0 or hy <= 0:
        return [], [], []
    lox_p, hix_p = lox - 3 * hx, hix + 3 * hx
    loy_p, hiy_p = loy - 3 * hy, hiy + 3 * hy
    wx = (hix_p - lox_p) / grid or 1.0
    wy = (hiy_p - loy_p) / grid or 1.0

    def bucket(c, lo, w):
        return F.least(
            F.greatest(F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(w)), F.lit(0)),
            F.lit(grid - 1),
        )

    rows = (
        pts.groupBy(bucket(x, lox_p, wx).alias("__bx"), bucket(y, loy_p, wy).alias("__by"))
        .count()
        .collect()
    )
    C = np.zeros((grid, grid))
    for r in rows:
        C[int(r["__bx"]), int(r["__by"])] = r["count"]
    xs = lox_p + (np.arange(grid) + 0.5) * wx
    ys = loy_p + (np.arange(grid) + 0.5) * wy
    zx = (xs[:, None] - xs[None, :]) / hx
    zy = (ys[:, None] - ys[None, :]) / hy
    kx = np.exp(-0.5 * zx * zx) / math.sqrt(2 * math.pi)
    ky = np.exp(-0.5 * zy * zy) / math.sqrt(2 * math.pi)
    Z = kx @ C @ ky.T / (nx * hx * hy)
    return xs.tolist(), ys.tolist(), Z.tolist()


def heatmap_matrix(
    df: DataFrame, label_col: str | None = None, max_cells: int = 100_000
):
    """Matrix extraction for ``heatmap`` (reference applies it to
    already-aggregated tables like the correlations matrix): collects a
    PLOT-SIZED table — guarded by ``max_cells`` so a raw fact table
    cannot be pulled to the driver by mistake. Returns
    ``(row_labels, col_labels, values)``."""
    cols = list(df.columns)
    dtypes = dict(df.dtypes)
    if label_col is None and cols and dtypes[cols[0]] == "string":
        label_col = cols[0]
    value_cols = [c for c in cols if c != label_col]
    # validate BEFORE collecting: a non-numeric value column would
    # otherwise surface as an opaque float() TypeError after the data
    # already crossed to the driver
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
    bad = [c for c in value_cols if not dtypes[c].startswith(numeric)]
    if bad:
        raise ValueError(
            f"heatmap value column(s) {bad} are non-numeric "
            f"({[dtypes[c] for c in bad]}); select numeric columns, or "
            "pass label_col to mark the label column explicitly"
        )
    n = df.count()
    if n * len(value_cols) > max_cells:
        raise ValueError(
            f"heatmap input has {n} x {len(value_cols)} cells > max_cells="
            f"{max_cells}; aggregate first (heatmap renders plot-sized "
            "matrices, not raw tables)"
        )
    rows = df.collect()
    row_labels = [
        str(r[label_col]) if label_col else str(i) for i, r in enumerate(rows)
    ]
    values = [
        [float(r[c]) if r[c] is not None else float("nan") for c in value_cols]
        for r in rows
    ]
    return row_labels, value_cols, values


def series_data(
    df: DataFrame,
    x: str,
    y_cols: list[str] | tuple[str, ...],
    max_points: int = 10_000,
):
    """Shared reduction for line-shaped plots (``plot`` / ``plotDate`` /
    ``fillBetween``): an x-ordered series of at most ``max_points``
    rows. Larger inputs are BUCKETED on x in the cluster (groupBy on the
    bucket index, per-bucket mean of x and each y) — a distributed
    downsample, never a raw collect. Timestamps bucket in epoch-micro
    space and come back as timestamps. Returns a list of Rows ordered
    by x."""
    if max_points <= 0:
        raise ValueError(f"max_points must be positive, got {max_points}")
    ts = dict(df.dtypes)[x] in ("timestamp", "timestamp_ntz", "date")
    pts = df.select(x, *y_cols).dropna()
    n = pts.count()
    if n <= max_points:
        return pts.orderBy(x).collect()
    xv = F.unix_micros(F.col(x).cast("timestamp")) if ts else F.col(x).cast("double")
    b = pts.select(F.min(xv).alias("lo"), F.max(xv).alias("hi")).first()
    lo, hi = float(b["lo"]), float(b["hi"])
    width = (hi - lo) / max_points or 1.0
    agged = (
        pts.groupBy(
            F.least(
                F.floor((xv - F.lit(lo)) / F.lit(width)), F.lit(max_points - 1)
            ).alias("__b")
        )
        .agg(
            F.avg(xv).alias("__xm"),
            *[F.avg(F.col(c).cast("double")).alias(c) for c in y_cols],
        )
        .orderBy("__b")
    )
    xm = (
        F.timestamp_micros(F.col("__xm").cast("long")) if ts else F.col("__xm")
    ).alias(x)
    return agged.select(xm, *y_cols).collect()


# ---------------------------------------------------------------------------
# render stages (gated on matplotlib)
# ---------------------------------------------------------------------------


def kde(df: DataFrame, col: str, grid: int = 256, out_path: str | None = None):
    """KDE curve of a numeric column (reference Table.kde,
    src/Table.luna:1556-1563)."""
    plt = _plt()
    xs, dens = kde_grid(df, col, grid)
    fig, ax = plt.subplots()
    ax.plot(xs, dens)
    ax.fill_between(xs, dens, alpha=0.3)
    ax.set_xlabel(col)
    ax.set_ylabel("density")
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig


def kde2(
    df: DataFrame, x: str, y: str, grid: int = 64, out_path: str | None = None
):
    """2-D KDE contour plot (reference Table.kde2,
    src/Table.luna:1577-1585)."""
    plt = _plt()
    xs, ys, Z = kde2_grid(df, x, y, grid)
    fig, ax = plt.subplots()
    if xs:
        import numpy as np

        ax.contourf(xs, ys, np.asarray(Z).T, levels=16)
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig


def heatmap(
    df: DataFrame,
    label_col: str | None = None,
    annot: bool = False,
    out_path: str | None = None,
):
    """Heatmap of an already-aggregated matrix table (reference
    Table.heatmap, src/Table.luna:1626-1631 — canonically applied to the
    ``correlations`` output)."""
    plt = _plt()
    row_labels, col_labels, values = heatmap_matrix(df, label_col)
    fig, ax = plt.subplots()
    im = ax.imshow(values, aspect="auto")
    ax.set_xticks(range(len(col_labels)), labels=col_labels, rotation=45)
    ax.set_yticks(range(len(row_labels)), labels=row_labels)
    if annot:
        for i, row in enumerate(values):
            for j, v in enumerate(row):
                ax.text(j, i, f"{v:.2f}", ha="center", va="center", fontsize=7)
    fig.colorbar(im, ax=ax)
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig


def plot(
    df: DataFrame,
    x: str,
    y: str,
    style: str = "-",
    max_points: int = 10_000,
    out_path: str | None = None,
):
    """Line plot of y versus x (reference Matplotlib.plot,
    src/Plot/Matplotlib.luna:28-31); bucketed downsample above
    ``max_points``."""
    plt = _plt()
    rows = series_data(df, x, [y], max_points)
    fig, ax = plt.subplots()
    ax.plot([r[0] for r in rows], [r[1] for r in rows], style)
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig


def plot_date(
    df: DataFrame,
    x: str,
    y: str,
    max_points: int = 10_000,
    out_path: str | None = None,
):
    """Time-series plot with a date axis (reference Table.plotDate,
    src/Table.luna:1604-1611)."""
    plt = _plt()
    rows = series_data(df, x, [y], max_points)
    fig, ax = plt.subplots()
    # plain plot(): datetime x-values get date locators automatically;
    # ax.plot_date was deprecated and removed in matplotlib >= 3.9
    ax.plot([r[0] for r in rows], [r[1] for r in rows], "-")
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    fig.autofmt_xdate()
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig


def fill_between(
    df: DataFrame,
    x: str,
    y1: str,
    y2: str,
    alpha: float = 0.5,
    max_points: int = 10_000,
    out_path: str | None = None,
):
    """Filled band between two series over x (reference
    Table.fillBetween, src/Table.luna:1648-1657)."""
    plt = _plt()
    rows = series_data(df, x, [y1, y2], max_points)
    fig, ax = plt.subplots()
    xs = [r[0] for r in rows]
    ax.fill_between(xs, [r[1] for r in rows], [r[2] for r in rows], alpha=alpha)
    ax.set_xlabel(x)
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig
