"""Property test: the stdlib XLSX roundtrip (io/xlsx.py) is lossless for
the reference's cell types — long, double, string (including XML
metacharacters and whitespace), boolean, and null — across arbitrary
small tables."""

import math

from hypothesis import given, settings, strategies as st

from dataframes_spark.io.xlsx import read_xlsx, write_xlsx

# printable text incl. XML-hostile characters; no control chars (illegal
# in XML 1.0 and rejected by Excel itself)
_text = st.text(
    alphabet=st.characters(
        codec="utf-8", min_codepoint=32, exclude_characters="\x7f"
    ),
    max_size=12,
)
_num = st.floats(
    allow_nan=False, allow_infinity=False, width=64,
    min_value=-1e12, max_value=1e12,
)


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.one_of(st.none(), _text),
            st.one_of(st.none(), _num),
            st.one_of(st.none(), st.booleans()),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_xlsx_roundtrip_lossless(spark, tmp_path_factory, data):
    df = spark.createDataFrame(
        data, "k long, s string, x double, b boolean"
    )
    path = str(tmp_path_factory.mktemp("xl") / "t.xlsx")
    write_xlsx(df, path)
    back = read_xlsx(spark, path)
    assert back.columns == ["k", "s", "x", "b"]
    keyf = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    got = sorted(map(tuple, back.collect()), key=keyf)
    want = sorted(data, key=keyf)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3]
        if w[2] is None:
            assert g[2] is None
        else:
            assert g[2] is not None and math.isclose(g[2], w[2], rel_tol=0, abs_tol=0)
