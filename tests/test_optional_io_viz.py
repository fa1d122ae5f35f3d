"""XLSX IO (self-contained stdlib SpreadsheetML, no dependency — the
roundtrip runs everywhere) and plotting (matplotlib-gated render stages;
the distributed reduction stages run without it)."""

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


def test_xlsx_roundtrip(spark, small_df, tmp_path):
    from dataframes_spark.io.readers import read_auto
    from dataframes_spark.io.writers import write_auto

    path = str(tmp_path / "t.xlsx")
    write_auto(small_df, path)
    back = read_auto(spark, path)
    assert back.columns == ["id", "s", "v"]
    assert dict(back.dtypes) == {"id": "bigint", "s": "string", "v": "double"}
    got = {r["id"]: (r["s"], r["v"]) for r in back.collect()}
    assert got == {1: ("a", 1.5), 2: ("b", 2.5), 3: ("c", None)}


def test_xlsx_types_escaping_and_nulls(spark, tmp_path):
    from dataframes_spark.io.readers import read_auto
    from dataframes_spark.io.writers import write_auto

    df = spark.createDataFrame(
        [
            (1, 'quote " & <tag>', True, 1.25),
            (2, "  spaces kept  ", False, -3.0),
            (3, None, None, None),
        ],
        ["id", "txt", "flag", "x"],
    )
    path = str(tmp_path / "e.xlsx")
    write_auto(df, path)
    back = read_auto(spark, path)
    assert dict(back.dtypes) == {
        "id": "bigint", "txt": "string", "flag": "boolean", "x": "double"
    }
    got = {r["id"]: (r["txt"], r["flag"], r["x"]) for r in back.collect()}
    assert got[1] == ('quote " & <tag>', True, 1.25)
    assert got[2] == ("  spaces kept  ", False, -3.0)
    assert got[3] == (None, None, None)


def test_xlsx_reads_shared_strings_variant(spark, tmp_path):
    # Excel/openpyxl write strings via a sharedStrings table rather than
    # inline — the reader must handle that layout too
    import zipfile

    from dataframes_spark.io import xlsx as X

    path = str(tmp_path / "shared.xlsx")
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="s"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><t>k</t></si><si><t>name</t></si><si><r><t>two-</t></r><r><t>runs</t></r></si></sst>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", X._CONTENT_TYPES)
        z.writestr("_rels/.rels", X._RELS)
        z.writestr("xl/workbook.xml", X._WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", X._WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", shared)
    back = X.read_xlsx(spark, path)
    assert back.columns == ["k", "name"]
    row = back.collect()[0]
    assert row["k"] == 7 and row["name"] == "two-runs"


def test_xlsx_write_guards_table_sized_inputs(spark, tmp_path):
    from dataframes_spark.io.xlsx import write_xlsx

    df = spark.range(100)
    with pytest.raises(ValueError, match="max_rows"):
        write_xlsx(df, str(tmp_path / "big.xlsx"), max_rows=10)


@pytest.mark.skipif(not HAS_OPENPYXL, reason="openpyxl not installed")
def test_xlsx_interop_with_openpyxl(spark, small_df, tmp_path):
    # cross-check: our writer's output parses in openpyxl (and therefore
    # in Excel), not only in our own reader
    import openpyxl

    from dataframes_spark.io.writers import write_auto

    path = str(tmp_path / "interop.xlsx")
    write_auto(small_df, path)
    ws = openpyxl.load_workbook(path).active
    assert [c.value for c in ws[1]] == ["id", "s", "v"]
    assert ws["A2"].value == 1 and ws["B2"].value == "a"


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


# ---------------------------------------------------------------------------
# distributed reduction stages: run WITHOUT matplotlib — the cluster-side
# half of every plot is real tested code; only rendering is gated
# ---------------------------------------------------------------------------


def test_kde_grid_integrates_to_one_and_peaks_at_mode(spark):
    import numpy as np

    from dataframes_spark import viz

    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.normal(0, 1, 4000), rng.normal(8, 0.5, 2000)])
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    xs, dens = viz.kde_grid(df, "x", grid=256)
    assert len(xs) == len(dens) == 256
    width = xs[1] - xs[0]
    mass = sum(dens) * width
    assert 0.97 < mass < 1.03  # integrates to ~1 (tails truncated at 3h)
    # bimodal: density near 0 and near 8 both dominate the valley at 4
    d = dict(zip(xs, dens))
    near = lambda t: max(v for x, v in d.items() if abs(x - t) < 0.5)
    assert near(0) > 4 * near(4) and near(8) > 4 * near(4)


def test_kde_grid_degenerate_inputs(spark):
    from dataframes_spark import viz

    one = spark.createDataFrame([(1.0,)], "x double")
    assert viz.kde_grid(one, "x") == ([], [])
    const = spark.createDataFrame([(2.0,), (2.0,), (2.0,)], "x double")
    assert viz.kde_grid(const, "x") == ([], [])


def test_kde2_grid_mass_and_shape(spark):
    import numpy as np

    from dataframes_spark import viz

    rng = np.random.RandomState(3)
    pts = rng.normal(0, 1, size=(3000, 2))
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "x double, y double"
    )
    xs, ys, Z = viz.kde2_grid(df, "x", "y", grid=48)
    assert len(xs) == len(ys) == 48 and len(Z) == 48 and len(Z[0]) == 48
    Z = np.asarray(Z)
    mass = Z.sum() * (xs[1] - xs[0]) * (ys[1] - ys[0])
    assert 0.9 < mass < 1.1
    # unimodal standard normal: the peak sits near the origin
    i, j = np.unravel_index(Z.argmax(), Z.shape)
    assert abs(xs[i]) < 1 and abs(ys[j]) < 1


def test_heatmap_matrix_labels_and_cap(spark):
    import pytest

    from dataframes_spark import viz

    m = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, None)], "lbl string, c1 double, c2 double"
    )
    rows, cols, vals = viz.heatmap_matrix(m)
    assert rows == ["a", "b"] and cols == ["c1", "c2"]
    assert vals[0] == [1.0, 2.0] and vals[1][0] == 3.0
    assert vals[1][1] != vals[1][1]  # NaN for the null cell
    big = spark.range(0, 2000).selectExpr("CAST(id AS DOUBLE) c1", "CAST(id AS DOUBLE) c2")
    with pytest.raises(ValueError, match="max_cells"):
        viz.heatmap_matrix(big, max_cells=100)


def test_series_data_small_passthrough_and_bucketed_downsample(spark):
    from pyspark.sql import functions as F

    from dataframes_spark import viz

    df = spark.range(0, 50_000).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).cast("double").alias("y"),
    )
    small = viz.series_data(df.limit(100), "x", ["y"], max_points=1000)
    assert len(small) == 100
    assert [r["x"] for r in small] == sorted(r["x"] for r in small)
    down = viz.series_data(df, "x", ["y"], max_points=500)
    assert len(down) <= 500
    xs = [r["x"] for r in down]
    assert xs == sorted(xs)
    # bucket means preserve the linear relation y = 2x
    assert all(abs(r["y"] - 2 * r["x"]) < 1e-6 for r in down)


def test_series_data_timestamp_axis_round_trips(spark):
    from datetime import datetime

    from dataframes_spark import viz

    rows = [(datetime(2024, 1, 1, h), float(h)) for h in range(24)]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = viz.series_data(df, "ts", ["v"], max_points=6)
    assert len(out) <= 6
    assert all(isinstance(r["ts"], datetime) for r in out)
    assert [r["ts"] for r in out] == sorted(r["ts"] for r in out)


def test_render_functions_gated_without_matplotlib(spark):
    import pytest

    from dataframes_spark import viz

    if HAS_MPL:
        pytest.skip("matplotlib installed; error path n/a")
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    for fn in (
        lambda: viz.kde(df, "x"),
        lambda: viz.kde2(df, "x", "y"),
        lambda: viz.heatmap(df),
        lambda: viz.plot(df, "x", "y"),
        lambda: viz.plot_date(df, "x", "y"),
        lambda: viz.fill_between(df, "x", "y", "y"),
    ):
        with pytest.raises(NotImplementedError, match="matplotlib"):
            fn()


def test_xlsx_decimal_and_timestamp_cells(spark, tmp_path):
    from dataframes_spark.io.readers import read_auto
    from dataframes_spark.io.writers import write_auto

    df = spark.sql(
        "SELECT 1 AS id, CAST(7.25 AS DECIMAL(10,2)) AS d,"
        " TIMESTAMP '2024-03-01 12:30:00' AS ts, DATE '2024-03-01' AS dt"
    )
    path = str(tmp_path / "tt.xlsx")
    write_auto(df, path)
    back = read_auto(spark, path)
    r = back.collect()[0]
    assert r["d"] == 7.25  # decimal -> number cell -> DOUBLE
    assert r["ts"] == "2024-03-01 12:30:00"  # ISO string, to_timestamp-able
    assert r["dt"] == "2024-03-01"


def test_xlsx_wide_table_beyond_column_z(spark, tmp_path):
    # 30 columns exercises AA/AB/... cell references in both directions
    from dataframes_spark.io.xlsx import read_xlsx, write_xlsx

    cols = [f"c{i:02d}" for i in range(30)]
    df = spark.createDataFrame(
        [tuple(range(30)), tuple(range(100, 130))], ", ".join(f"{c} long" for c in cols)
    )
    path = str(tmp_path / "wide.xlsx")
    write_xlsx(df, path)
    back = read_xlsx(spark, path)
    assert back.columns == cols
    rows = sorted(map(tuple, back.collect()))
    assert rows == [tuple(range(30)), tuple(range(100, 130))]


def test_xlsx_control_chars_roundtrip(spark, tmp_path):
    # C0 controls are illegal in XML 1.0 even as entities; they use
    # Excel's _xHHHH_ convention — and a literal '_x0001_' in the data
    # must survive too (underscore-escaped on write)
    from dataframes_spark.io.xlsx import read_xlsx, write_xlsx

    df = spark.createDataFrame(
        [(1, "bad\x01char"), (2, "tab\tok\nnewline"), (3, "literal _x0001_ text")],
        "id long, s string",
    )
    path = str(tmp_path / "ctrl.xlsx")
    write_xlsx(df, path)
    got = {r["id"]: r["s"] for r in read_xlsx(spark, path).collect()}
    assert got[1] == "bad\x01char"
    assert got[2] == "tab\tok\nnewline"
    assert got[3] == "literal _x0001_ text"


def test_xlsx_int64_exact_roundtrip(spark, tmp_path):
    # 64-bit ids/hashes past 2^53 must NOT round through float
    from dataframes_spark.io.xlsx import read_xlsx, write_xlsx

    big = 9007199254740993  # 2^53 + 1
    df = spark.createDataFrame(
        [(big,), (-(2**62),), (7,)], "k long"
    )
    path = str(tmp_path / "big.xlsx")
    write_xlsx(df, path)
    back = read_xlsx(spark, path)
    assert dict(back.dtypes) == {"k": "bigint"}
    assert sorted(r["k"] for r in back.collect()) == sorted([big, -(2**62), 7])


def test_xlsx_nan_inf_keep_double_column(spark, tmp_path):
    import math

    from dataframes_spark.io.xlsx import read_xlsx, write_xlsx

    df = spark.createDataFrame(
        [(1, 1.5e300), (2, float("nan")), (3, float("inf")), (4, float("-inf")), (5, None)],
        "id long, x double",
    )
    path = str(tmp_path / "nan.xlsx")
    write_xlsx(df, path)
    back = read_xlsx(spark, path)
    assert dict(back.dtypes)["x"] == "double"
    got = {r["id"]: r["x"] for r in back.collect()}
    assert got[1] == 1.5e300 and math.isnan(got[2])
    assert got[3] == float("inf") and got[4] == float("-inf") and got[5] is None


def test_xlsx_literal_token_strings_stay_strings(spark, tmp_path):
    # literal text "NaN"/"INF" must NOT fold into a double column —
    # float tokens travel as t="str" cells, real strings as inlineStr
    from dataframes_spark.io.xlsx import read_xlsx, write_xlsx

    df = spark.createDataFrame(
        [(1, "NaN"), (2, "INF"), (3, "-INF")], "id long, s string"
    )
    path = str(tmp_path / "tok.xlsx")
    write_xlsx(df, path)
    back = read_xlsx(spark, path)
    assert dict(back.dtypes)["s"] == "string"
    assert {r["s"] for r in back.collect()} == {"NaN", "INF", "-INF"}


def test_xlsx_overlapping_escape_sequences_roundtrip(spark, tmp_path):
    # '_x005F_x0001_' shares an underscore between two candidate
    # sequences; the selective escape corrupted it (13 chars -> 7)
    from dataframes_spark.io.xlsx import read_xlsx, write_xlsx

    tricky = [
        "_x005F_x0001_",
        "_x005F_",
        "__x0041__",
        "a_b_c",
        "_x005F" + "\x01",
    ]
    df = spark.createDataFrame(list(enumerate(tricky)), "id long, s string")
    path = str(tmp_path / "esc.xlsx")
    write_xlsx(df, path)
    got = {r["id"]: r["s"] for r in read_xlsx(spark, path).collect()}
    assert got == dict(enumerate(tricky))


def test_heatmap_matrix_rejects_non_numeric_value_columns(spark):
    from dataframes_spark import viz

    df = spark.createDataFrame(
        [("r1", 1.0, "oops"), ("r2", 2.0, "nope")], ["label", "a", "b"]
    )
    with pytest.raises(ValueError, match=r"\['b'\].*non-numeric"):
        viz.heatmap_matrix(df)
    # numeric-only value columns still work, including decimals
    ok = spark.createDataFrame([("r1", 1.0, 2), ("r2", 3.0, 4)], ["label", "a", "b"])
    rows, cols, vals = viz.heatmap_matrix(ok)
    assert rows == ["r1", "r2"] and cols == ["a", "b"]
    assert vals == [[1.0, 2.0], [3.0, 4.0]]


def test_xlsx_multi_sheet_read(spark, tmp_path):
    """sheet= selects by name or 0-based workbook-order index; the
    workbook.xml + rels mapping is authoritative (here deliberately
    CROSSED against part filenames), not sheetN.xml numbering."""
    import zipfile

    from dataframes_spark.io import xlsx as X

    def ws(cells_rows):
        body = "".join(f'<row r="{i + 1}">{r}</row>' for i, r in enumerate(cells_rows))
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{body}</sheetData></worksheet>"
        )

    istr = lambda ref, s: f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>'
    num = lambda ref, v: f'<c r="{ref}"><v>{v}</v></c>'
    # "alpha" lives in sheet2.xml, "beta" in sheet1.xml
    alpha = ws([istr("A1", "a") + istr("B1", "b"), num("A2", 1) + num("B2", 2)])
    beta = ws([istr("A1", "x"), istr("A2", "hi")])
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="alpha" sheetId="1" r:id="rA"/>'
        '<sheet name="beta" sheetId="2" r:id="rB"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rA" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>'
        '<Relationship Id="rB" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    path = str(tmp_path / "two.xlsx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", X._CONTENT_TYPES)
        z.writestr("_rels/.rels", X._RELS)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", beta)
        z.writestr("xl/worksheets/sheet2.xml", alpha)

    assert X.sheet_names(path) == ["alpha", "beta"]
    header, rows = X.read_xlsx_rows(path)  # default: first in workbook order
    assert header == ["a", "b"] and rows == [[1, 2]]
    header, rows = X.read_xlsx_rows(path, sheet="beta")
    assert header == ["x"] and rows == [["hi"]]
    header, _ = X.read_xlsx_rows(path, sheet=1)
    assert header == ["x"]
    df = X.read_xlsx(spark, path, sheet="beta")
    assert df.columns == ["x"] and df.first().x == "hi"
    with pytest.raises(ValueError, match="no sheet named"):
        X.read_xlsx_rows(path, sheet="gamma")
    with pytest.raises(ValueError, match="out of range"):
        X.read_xlsx_rows(path, sheet=2)


def test_xlsx_shared_strings_writer_roundtrip(spark, tmp_path):
    import zipfile

    from dataframes_spark.io import xlsx as X

    rows = [(i, "repeated_value", f"u_{i % 3}\x01tail") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "const", "grp"])
    inline_p = str(tmp_path / "inline.xlsx")
    shared_p = str(tmp_path / "shared.xlsx")
    X.write_xlsx(df, inline_p)
    X.write_xlsx(df, shared_p, shared_strings=True)
    with zipfile.ZipFile(shared_p) as z:
        assert "xl/sharedStrings.xml" in z.namelist()
    # identical data back from both forms (incl. control-char escaping)
    a = sorted(map(tuple, X.read_xlsx_rows(inline_p)[1]))
    b = sorted(map(tuple, X.read_xlsx_rows(shared_p)[1]))
    assert a == b
    assert b[0][1] == "repeated_value" and b[0][2].startswith("u_0\x01")
    # the dedup is the point: each distinct string is stored once, so
    # the total UNCOMPRESSED payload shrinks (zip-level DEFLATE can mask
    # this on tiny files, so compare the structural size, not the file)
    def raw_bytes(p):
        with zipfile.ZipFile(p) as z:
            return sum(i.file_size for i in z.infolist())

    assert raw_bytes(shared_p) < raw_bytes(inline_p)
