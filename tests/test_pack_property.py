"""Property-based invariants for packing/chunking (operators/pack.py).

A pure-Python model implements the documented rules; hypothesis drives
document sizes, budgets, and chunk geometry. Spark evaluation happens
once per example set (collected to dicts), so each property runs a
handful of jobs, not one per hypothesis example.
"""

import pytest
from hypothesis import given, settings, strategies as st

from dataframes_spark.operators import pack as dpack


# ---------------------------------------------------------------------------
# chunk_text: pure-Python model + reassembly invariants
# ---------------------------------------------------------------------------

def _py_chunks(text: str, chunk_chars: int, overlap: int) -> list[str]:
    step = chunk_chars - overlap
    n = max(1, -(-max(len(text) - overlap, 0) // step)) if len(text) else 1
    return [text[i * step : i * step + chunk_chars] for i in range(n)]


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="abcdefg 123", min_size=0, max_size=40), min_size=1, max_size=6
    ),
    chunk_chars=st.integers(2, 12),
    overlap_frac=st.floats(0, 0.9),
)
def test_chunk_text_matches_python_model(spark, texts, chunk_chars, overlap_frac):
    overlap = min(int(chunk_chars * overlap_frac), chunk_chars - 1)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got: dict[int, dict[int, str]] = {}
    for r in dpack.chunk_text(df, "text", "doc_id", chunk_chars, overlap).collect():
        got.setdefault(r.id, {})[r.chunk_index] = r.chunk
    for i, t in enumerate(texts):
        want = _py_chunks(t, chunk_chars, overlap)
        chunks = [got[i][j] for j in range(len(got[i]))]
        assert chunks == want, (t, chunk_chars, overlap)
        # reassembly: drop each chunk's overlap prefix after the first
        reassembled = (chunks[0] + "".join(c[overlap:] for c in chunks[1:])) if t else ""
        assert reassembled == t


# ---------------------------------------------------------------------------
# packing: invariants of both rules
# ---------------------------------------------------------------------------

@settings(max_examples=15, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 120), min_size=1, max_size=30),
    budget=st.integers(50, 200),
)
def test_pack_rules_invariants(spark, sizes, budget):
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["id", "size"])

    greedy = {
        r.id: r.pack_id
        for r in dpack.pack_greedy(df, "size", budget, "id").collect()
    }
    cumsum = {
        r.id: r.pack_id
        for r in dpack.pack_by_cumsum(df, "size", budget, "id").collect()
    }

    for assignment in (greedy, cumsum):
        ids = [assignment[i] for i in range(len(sizes))]
        # pack ids are nondecreasing in processing order and start at 0
        assert ids[0] == 0
        assert all(b >= a for a, b in zip(ids, ids[1:]))
    # greedy additionally never skips a pack id (cumsum may, when an
    # oversized document's exclusive cumsum jumps more than one budget)
    g_ids = [greedy[i] for i in range(len(sizes))]
    assert all(b - a in (0, 1) for a, b in zip(g_ids, g_ids[1:]))

    # greedy never overflows except oversized singletons
    packs: dict[int, list[int]] = {}
    for i, s in enumerate(sizes):
        packs.setdefault(greedy[i], []).append(s)
    for members in packs.values():
        assert sum(members) <= budget or len(members) == 1

    # cumsum: exclusive cumsum of any row is < total, so floor
    # monotonicity bounds every pack id by total // budget
    total = sum(sizes)
    assert max(cumsum.values()) <= total // budget
