"""Property tests for snapshot diffing (operators/diff.py) and the
Gopher rule verdicts (functions/text.py): the accounting identities that
must hold for ANY pair of snapshots / any document."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dataframes_spark.functions import text as T
from dataframes_spark.operators import diff as D

frame = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),           # key
        st.sampled_from(["a", "b", None]),                # s
        st.sampled_from([1.0, 2.0, None]),                # v
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda r: r[0],
)


@settings(max_examples=10, deadline=None)
@given(ra=frame, rb=frame)
def test_diff_accounting_identities(spark, ra, rb):
    a = spark.createDataFrame(ra, "k long, s string, v double")
    b = spark.createDataFrame(rb, "k long, s string, v double")
    rows = {
        (r["kind"], r["name"]): r["n"]
        for r in D.diff_summary(a, b, ["k"]).collect()
    }
    ka, kb = {r[0] for r in ra}, {r[0] for r in rb}
    # status counts partition the key universe
    assert rows[("rows", "added")] == len(kb - ka)
    assert rows[("rows", "removed")] == len(ka - kb)
    assert rows[("rows", "changed")] + rows[("rows", "unchanged")] == len(
        ka & kb
    )
    # a changed key changed in >= 1 column; column counts never exceed
    # the surviving-key count
    col_total = rows[("column", "s")] + rows[("column", "v")]
    assert col_total >= rows[("rows", "changed")]
    assert rows[("column", "s")] <= len(ka & kb)
    assert rows[("column", "v")] <= len(ka & kb)
    # status frame agrees with the summary
    st_counts = {
        r["status"]: r["n"]
        for r in D.diff_status(a, b, ["k"])
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for name in ("added", "removed", "changed", "unchanged"):
        assert st_counts.get(name, 0) == rows[("rows", name)]


texts = st.text(
    alphabet="abcdef .#\n-", min_size=0, max_size=80
)


@settings(max_examples=10, deadline=None)
@given(txts=st.lists(texts, min_size=1, max_size=8))
def test_gopher_verdicts_are_binary_and_composite(spark, txts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(txts)], "doc_id long, text string"
    )
    rows = T.gopher_rules(df, "text", "doc_id").collect()
    assert len(rows) == len(txts)
    for r in rows:
        d = r.asDict()
        verdicts = [v for k, v in d.items() if k.startswith("pass_") and k != "pass_all"]
        assert all(v in (0, 1) for v in verdicts)
        prod = 1
        for v in verdicts:
            prod *= v
        assert d["pass_all"] == prod
        for frac in ("bullet_frac", "ellipsis_frac", "alpha_frac", "symbol_ratio"):
            assert d[frac] >= 0.0
        assert 0.0 <= d["bullet_frac"] <= 1.0
        assert 0.0 <= d["ellipsis_frac"] <= 1.0
        assert 0.0 <= d["alpha_frac"] <= 1.0
