"""Optional-dependency surfaces: XLSX IO (openpyxl) and plotting
(matplotlib). Both run the real path when the dependency is present and
skip (or assert the documented clear error) when it is absent — so the
suite is green in this container and exercises the full roundtrip in any
environment that has the deps.
"""

import importlib.util

import pytest
from pyspark.sql import functions as F

HAS_OPENPYXL = importlib.util.find_spec("openpyxl") is not None
HAS_MPL = importlib.util.find_spec("matplotlib") is not None


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)], ["id", "s", "v"]
    )


@pytest.mark.skipif(not HAS_OPENPYXL, reason="openpyxl not installed")
def test_xlsx_roundtrip(spark, small_df, tmp_path):
    from dataframes_spark.io.readers import read_auto
    from dataframes_spark.io.writers import write_auto

    path = str(tmp_path / "t.xlsx")
    write_auto(small_df, path)
    back = read_auto(spark, path)
    assert sorted(back.columns) == ["id", "s", "v"]
    assert back.count() == 3
    got = {r["id"]: (r["s"], r["v"]) for r in back.collect()}
    assert got[1] == ("a", 1.5)


@pytest.mark.skipif(HAS_OPENPYXL, reason="openpyxl installed; error path n/a")
def test_xlsx_write_raises_clear_error_without_openpyxl(small_df, tmp_path):
    from dataframes_spark.io.writers import write_auto

    with pytest.raises(NotImplementedError, match="openpyxl"):
        write_auto(small_df, str(tmp_path / "t.xlsx"))


@pytest.mark.skipif(not HAS_MPL, reason="matplotlib not installed")
def test_histogram_and_scatter(spark, tmp_path):
    from dataframes_spark import viz

    df = spark.range(0, 1000).select(
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 13).cast("double").alias("y"),
    )
    viz.histogram(df, "x", bins=10, out_path=str(tmp_path / "h.png"))
    viz.scatter(df, "x", "y", max_points=100, out_path=str(tmp_path / "s.png"))
    assert (tmp_path / "h.png").stat().st_size > 0
    assert (tmp_path / "s.png").stat().st_size > 0


@pytest.mark.skipif(HAS_MPL, reason="matplotlib installed; error path n/a")
def test_plot_raises_clear_error_without_matplotlib(spark):
    from dataframes_spark import viz

    df = spark.range(0, 10).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(NotImplementedError, match="matplotlib"):
        viz.histogram(df, "x", bins=2)


def test_histogram_empty_column_returns_empty_axes(spark):
    """Empty/all-null input must yield an empty figure, not a TypeError
    from None arithmetic (lo stays None when min() has no rows)."""
    pytest.importorskip("matplotlib")
    from dataframes_spark import viz

    df = spark.createDataFrame([(None,), (None,)], "v double")
    fig = viz.histogram(df, "v", bins=10)
    assert fig is not None
