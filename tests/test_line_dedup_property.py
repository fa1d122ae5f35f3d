"""Property-based invariants for the round-5 second-batch operators:
strip_repeated_lines vs a pure-Python model, asof_nearest vs brute
force, histogram mass conservation. Hypothesis drives the inputs; each
property collects once per example (a handful of Spark jobs, not one
per row)."""

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from dataframes_spark.functions import stats
from dataframes_spark.operators import dedup
from dataframes_spark.operators.asof import asof_nearest


# ---------------------------------------------------------------------------
# strip_repeated_lines: pure-Python model
# ---------------------------------------------------------------------------

def _py_strip(docs: dict[int, str], min_docs: int) -> dict[int, str]:
    from collections import defaultdict

    seen = defaultdict(set)
    for i, text in docs.items():
        for ln in text.split("\n"):
            if ln.strip():
                seen[ln].add(i)
    common = {ln for ln, ids in seen.items() if len(ids) >= min_docs}
    return {
        i: "\n".join(ln for ln in text.split("\n") if ln not in common)
        for i, text in docs.items()
    }


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab \n", min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    ),
    min_docs=st.integers(2, 3),
)
def test_strip_matches_python_model(spark, texts, min_docs):
    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = {
        r.doc_id: r.text
        for r in dedup.strip_repeated_lines(
            df, "text", "doc_id", min_docs=min_docs
        ).collect()
    }
    assert got == _py_strip(docs, min_docs)


# ---------------------------------------------------------------------------
# asof_nearest: brute-force model
# ---------------------------------------------------------------------------

def _py_nearest(lefts, rights):
    out = {}
    for lid, user, lts in lefts:
        best = None
        for user_r, rts, seq, val in rights:
            if user_r != user:
                continue
            d = abs((lts - rts).total_seconds())
            # distance asc, earlier ts wins ties, greatest seq within ts
            key = (d, rts > lts, -seq)
            if best is None or key < best[0]:
                best = (key, val)
        out[lid] = best[1] if best else None
    return out


@settings(max_examples=20, deadline=None)
@given(
    lmins=st.lists(st.integers(0, 120), min_size=1, max_size=8, unique=True),
    rrows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 120), st.integers(0, 9)),
        min_size=0,
        max_size=8,
        unique=True,
    ),
)
def test_asof_nearest_matches_brute_force(spark, lmins, rrows):
    base = datetime(2024, 1, 1)
    lefts = [(i, "u", base + timedelta(minutes=m)) for i, m in enumerate(lmins)]
    rights = [
        ("u" if g == 0 else "v", base + timedelta(minutes=m), s, float(10 * m + s))
        for g, m, s in rrows
    ]
    ldf = spark.createDataFrame(lefts, ["id", "user", "ts"])
    rdf = spark.createDataFrame(
        rights, "user string, ts timestamp, seq bigint, val double"
    )
    got = {
        r.id: r.val
        for r in asof_nearest(
            ldf, rdf, "ts", "user", left_id="id",
            value_cols=["val"], right_order=["seq"],
        ).collect()
    }
    want = _py_nearest(lefts, [r for r in rights if r[0] == "u"])
    assert got == want


# ---------------------------------------------------------------------------
# histogram: mass conservation + edge coverage
# ---------------------------------------------------------------------------

@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    ),
    bins=st.integers(1, 12),
)
def test_histogram_conserves_mass(spark, vals, bins):
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    rows = stats.histogram(df, "x", bins=bins).collect()
    assert sum(r.n for r in rows) == len(vals)
    assert all(0 <= r.bin < bins for r in rows)
    los = [r.lo for r in rows if r.bin == 0]
    if los:
        assert los[0] == round(min(vals), 6)
