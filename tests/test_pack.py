"""Sequence packing / chunking operators (operators/pack.py)."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.operators import pack as dpack


@pytest.fixture()
def sized_df(spark):
    # (id, user, size): sizes chosen so budget=100 exercises boundary
    # straddles, exact fits, and an oversized row
    rows = [
        (1, "u1", 40),
        (2, "u1", 50),
        (3, "u1", 30),  # straddles the 100 boundary
        (4, "u1", 100),  # exact fit
        (5, "u1", 250),  # oversized
        (6, "u1", 10),
        (7, "u2", 60),
        (8, "u2", 60),
    ]
    return spark.createDataFrame(rows, ["id", "user", "size"])


def test_chunk_text_covers_and_overlaps(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")], ["doc_id", "text"]
    )
    out = dpack.chunk_text(df, "text", "doc_id", chunk_chars=5, overlap=2).collect()
    got = {(r.id, r.chunk_index): r.chunk for r in out}
    # starts at 0,3,6 (step=3): full coverage, 2-char overlap between chunks
    assert got[(1, 0)] == "abcde"
    assert got[(1, 1)] == "defgh"
    assert got[(1, 2)] == "ghij"
    assert got[(2, 0)] == "xy"  # short doc -> single chunk
    assert got[(3, 0)] == ""  # empty doc -> one empty chunk
    assert len(got) == 5
    # reassembling non-overlap prefixes reproduces the document
    assert "".join(got[(1, i)][:3] for i in range(2)) + got[(1, 2)] == "abcdefghij"


def test_chunk_text_no_shuffle(spark):
    df = spark.createDataFrame([(1, "abcdef")], ["doc_id", "text"])
    plan = dpack.chunk_text(df, "text", "doc_id", 4)._jdf.queryExecution().toString()
    assert "Exchange" not in plan


def test_chunk_text_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dpack.chunk_text(df, "text", "doc_id", 0)
    with pytest.raises(ValueError):
        dpack.chunk_text(df, "text", "doc_id", 5, overlap=5)


def test_pack_by_cumsum_rule(spark, sized_df):
    out = {
        r.id: r.pack_id
        for r in dpack.pack_by_cumsum(
            sized_df.filter("user = 'u1'"), "size", 100, "id"
        ).collect()
    }
    # exclusive cumsums: 0,40,90,120,220,470 -> floor(/100): 0,0,0,1,2,4
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2, 6: 4}


def test_pack_by_cumsum_partitioned_matches_per_key(spark, sized_df):
    out = dpack.pack_by_cumsum(sized_df, "size", 100, "id", partition_by="user")
    per_key = {
        (r.user, r.id): r.pack_id for r in out.collect()
    }
    # u2 packs independently: cumsums 0,60 -> packs 0,0
    assert per_key[("u2", 7)] == 0 and per_key[("u2", 8)] == 0
    # u1 unchanged from the global-per-user rule
    assert per_key[("u1", 4)] == 1


def test_pack_greedy_first_fit(spark, sized_df):
    out = {
        r.id: r.pack_id
        for r in dpack.pack_greedy(
            sized_df.filter("user = 'u1'"), "size", 100, "id"
        ).collect()
    }
    # greedy: [40,50] fits (90), 30 would overflow -> new pack [30];
    # 100 overflows (30+100=130) -> pack [100]; 250 overflows -> own pack;
    # 10 overflows 250's pack -> new pack
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3, 6: 4}
    # no pack except oversized singletons exceeds the budget
    stats = dpack.pack_stats(
        dpack.pack_greedy(sized_df.filter("user = 'u1'"), "size", 100, "id"),
        "size",
        100,
    ).collect()
    for r in stats:
        assert r.total_size <= 100 or r.n_docs == 1


def test_pack_greedy_grouped_runs_per_key(spark, sized_df):
    out = dpack.pack_greedy(sized_df, "size", 100, "id", partition_by="user")
    got = {(r.user, r.id): r.pack_id for r in out.collect()}
    assert got[("u2", 7)] == 0 and got[("u2", 8)] == 1  # 60+60 > 100


def _py_first_fit(sizes: list[int], budget: int) -> list[int]:
    ids, pack, used = [], 0, 0
    for s in sizes:
        if used > 0 and used + s > budget:
            pack, used = pack + 1, 0
        used += s
        ids.append(pack)
    return ids


def test_pack_greedy_state_survives_arrow_batch_seams(spark):
    # mapInPandas-style per-batch kernels silently reset pack state every
    # ~maxRecordsPerBatch rows; pin that the kernel sees each group WHOLE
    # by shrinking the Arrow batch size far below the row count and
    # feeding rows in scrambled order (so a per-batch sort would differ).
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        n = 400
        sizes = [(i * 37) % 90 + 10 for i in range(n)]  # 10..99
        rows = [(i, sizes[i]) for i in range(n)]
        rows = rows[1::2] + rows[0::2]  # scrambled input order
        df = spark.createDataFrame(rows, ["id", "size"]).repartition(8)
        got = {
            r.id: r.pack_id
            for r in dpack.pack_greedy(df, "size", 300, "id").collect()
        }
        want = _py_first_fit(sizes, 300)
        assert [got[i] for i in range(n)] == want
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_pack_greedy_partitioned_budget_invariants(spark):
    # the sharded-at-scale form: uniform hash shard as partition key;
    # per-shard packs must respect the budget (oversized singletons aside)
    # and reproduce the per-shard sequential rule exactly
    n = 200
    rows = [(i, (i * 13) % 120 + 5) for i in range(n)]
    df = (
        spark.createDataFrame(rows, ["id", "size"])
        .withColumn("shard", F.pmod(F.xxhash64("id"), F.lit(4)))
    )
    out = dpack.pack_greedy(df, "size", 250, "id", partition_by="shard").collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) >= 2  # the test is vacuous on one shard
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r.id)
        want = _py_first_fit([r.size for r in members], 250)
        assert [r.pack_id for r in members] == want, shard
        packs: dict[int, int] = {}
        npack: dict[int, int] = {}
        for r in members:
            packs[r.pack_id] = packs.get(r.pack_id, 0) + r.size
            npack[r.pack_id] = npack.get(r.pack_id, 0) + 1
        for pid, tot in packs.items():
            assert tot <= 250 or npack[pid] == 1


def test_pack_stats_fill(spark, sized_df):
    # cumsum rule lets the straddling doc overflow: u2's 60+60 share pack 0
    # (exclusive cumsum 60 < 100) -> fill 1.2, the documented overflow mode
    packed = dpack.pack_by_cumsum(
        sized_df.filter("user = 'u2'"), "size", 100, "id"
    )
    stats = {r.pack_id: r for r in dpack.pack_stats(packed, "size", 100).collect()}
    assert stats[0].n_docs == 2 and stats[0].fill == 1.2


def test_chunk_text_null_text_keeps_row(spark):
    # null text must not silently drop the document from the chunk
    # output (a null sequence bound would explode to zero rows)
    df = spark.createDataFrame([(1, None), (2, "abcdef")], "doc_id int, text string")
    got = {(r.id, r.chunk_index): r.chunk for r in dpack.chunk_text(df, "text", "doc_id", 4).collect()}
    assert got[(1, 0)] == ""
    assert got[(2, 0)] == "abcd"


def test_materialize_packs_orders_and_concats(spark):
    from dataframes_spark.operators import pack as P

    df = spark.createDataFrame(
        [("a", 3, "ccc", 1), ("a", 1, "aaa", 1), ("a", 2, None, 1),
         ("b", 9, "zz", 0)],
        "src string, doc_id long, text string, pack_id long",
    )
    out = P.materialize_packs(df, "text", "doc_id", "doc_id", sep="|", partition_by="src")
    rows = {(r.src, r.pack_id): r for r in out.collect()}
    a = rows[("a", 1)]
    # ordered by doc_id; NULL text concatenates as ''
    assert a.text == "aaa||ccc"
    assert a.doc_ids == [1, 2, 3]
    assert a.n_docs == 3 and a.n_chars == len("aaa||ccc")
    b = rows[("b", 0)]
    assert b.text == "zz" and b.doc_ids == [9]


def test_materialize_packs_composes_with_cumsum(spark):
    from dataframes_spark.operators import pack as P

    docs = spark.createDataFrame(
        [(i, "x" * 40) for i in range(10)], "doc_id long, text string"
    ).selectExpr("doc_id", "text", "length(text) AS sz")
    packed = P.pack_by_cumsum(docs, "sz", 100, "doc_id")
    out = P.materialize_packs(packed, "text", "doc_id", "doc_id")
    got = sorted((r.pack_id, r.n_docs) for r in out.collect())
    # 40-char docs vs 100 budget: exclusive-cumsum rule packs 3,2,3,2
    assert [n for _, n in got] == [3, 2, 3, 2]
    assert all(r.n_chars == r.n_docs * 40 + (r.n_docs - 1) * 2 for r in out.collect())
