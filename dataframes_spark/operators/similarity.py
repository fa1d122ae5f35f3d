"""Similarity search over embedding columns (``array<float>``).

Beyond the reference's surface — approximate-nearest-neighbor primitives
for a training-data pipeline:

- brute_force_topk:  exact cosine top-k against one query vector. The
                     query is a plan-time literal, so the scan is a single
                     map + TakeOrdered — no shuffle of the corpus.
- all_pairs_topk:    exact top-k neighbors for every row (small/medium
                     corpora or within LSH buckets).
- lsh_bucket_topk:   scale path — random-hyperplane LSH buckets the
                     corpus; candidates only meet inside a bucket, so the
                     join shuffles each vector a constant number of times
                     instead of O(N^2).

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM array expressions,
no Python UDF. Norms are precomputed once per row.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lit_dvec(vals: Sequence[float]) -> Column:
    """A double-array literal column built from ONE SQL parse instead of
    per-element ``F.lit`` calls. Every ``F.lit``/``F.array`` is a py4j
    driver roundtrip (~1ms), so a 64-dim centroid list costs ~0.5s of
    pure QUERY-CONSTRUCTION time per 8-center argmax (measured: the
    recall-report construction alone was 2.2-4.6s); one parsed string is
    milliseconds. ``repr(float)`` round-trips exactly through Spark's
    correctly-rounded double parser, so the resulting Literal is
    bit-identical to ``F.lit(float(x))``."""
    return F.expr(_dvec_sql(vals))


def _dvec_sql(vals: Sequence[float]) -> str:
    parts = []
    for x in vals:
        x = float(x)
        if math.isnan(x):
            parts.append("double('NaN')")
        elif math.isinf(x):
            parts.append(f"double('{'' if x > 0 else '-'}Infinity')")
        else:
            parts.append(repr(x) + "D")
    return "array(" + ",".join(parts) + ")"


def lit_dmat(rows: Sequence[Sequence[float]]) -> Column:
    """``lit_dvec``'s matrix twin: an array-of-double-arrays literal
    (PQ codebooks are m x k x d_sub — thousands of elements) from one
    SQL parse."""
    return F.expr("array(" + ",".join(_dvec_sql(r) for r in rows) + ")")


def _bq(name: str) -> str:
    """Backtick-quote an identifier for SQL-text expression building."""
    return "`" + name.replace("`", "``") + "`"


def _vd_sql(vec_col: str) -> str:
    """SQL text of the standard to-double vector cast."""
    return f"transform({_bq(vec_col)}, v -> cast(v as double))"


def _dot_sql(a: str, b: str) -> str:
    """SQL text of `_dot` — identical parsed expression, ONE py4j call
    when embedded in an ``F.expr`` instead of ~10 per higher-order
    function (each HOF lambda is several driver roundtrips; a
    many-centroid argmax built from Column ops measured ~0.5s of pure
    construction time)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
        " (acc, v) -> acc + v)"
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def _unit(vd: Column) -> Column:
    """Normalize an array to unit length in O(d) per row.

    NOT ``transform(vd, v -> v / norm)``: a lambda-captured norm
    aggregate re-evaluates PER ELEMENT (O(d^2)/row, measured ~25x at
    512 dims — the HOF-capture pitfall dedup._shingles_of_norm
    documents; a withColumn barrier does not help, CollapseProject
    re-inlines single-use projections). Instead the norm is passed as a
    regular argument to ``array_repeat`` — evaluated once — and
    ``zip_with`` divides element-wise with no capture. Pair-scoring
    operators still prefer carrying ``(vec, nrm)`` and dividing norms
    out per pair, which also skips the repeated-norm array."""
    n = _norm(vd)
    return F.zip_with(
        vd, F.array_repeat(n, F.size(vd)), lambda v, nn: v / nn
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (cast to double first for
    stable arithmetic)."""
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for one query vector.

    The query enters the plan as a literal array; the per-row score is one
    fused expression, and orderBy+limit plans as TakeOrderedAndProject —
    each partition keeps a k-heap, only k rows per partition reach the
    driver-side merge. Scales linearly with the corpus.
    """
    q = [float(x) for x in query]
    qn = math.sqrt(sum(x * x for x in q)) or 1.0
    qcol = lit_dvec(q)
    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    score = _dot(vd, qcol) / (_norm(vd) * F.lit(qn))
    return (
        df.select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def all_pairs_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact k nearest neighbors for every row: normalized self-join +
    per-id window top-k. O(N^2) dot products — correct baseline for
    small corpora and the verification stage inside LSH buckets."""
    from pyspark.sql import Window as W

    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    # raw vector + scalar norm, norms divided out once per pair: O(d)
    # per pair, where a unit-normalize transform would re-evaluate the
    # captured norm per element (O(d^2) per row; see _unit)
    prepped = df.select(
        F.col(id_col).alias("id"),
        vd.alias("vec"),
        _norm(vd).alias("nrm"),
    )
    pairs = (
        prepped.alias("a")
        .join(prepped.alias("b"), F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    num_planes: int = 8,
    seed: int = 42,
    plane_hash: str = "xxhash64",
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of ``num_planes`` fixed random
    projections forms a bucket id.

    Plane components are generated INSIDE the expression from a hash of
    ``(seed, plane, dim_index)`` scaled to [-1, 1) — deterministic,
    dimension-agnostic, and fully lazy: no driver-side action to learn the
    vector width (a ``.first()`` here would force a job per plan
    construction), and no ``dim x num_planes`` literal array bloating
    whole-stage codegen at 768-dim embedding widths.

    ``plane_hash="xxhash64"`` (default) is the fast path;
    ``plane_hash="md5"`` derives components from
    ``md5("<seed>:<plane>:<dim>")`` — a universal hash any engine can
    recompute, making the bucket assignment verifiable outside Spark
    (the DuckDB oracle behind ``lsh_buckets_md5`` reruns the identical
    projection). Buckets are NOT comparable across modes."""
    if plane_hash not in ("xxhash64", "md5"):
        raise ValueError(
            f"plane_hash must be 'xxhash64' or 'md5', got {plane_hash!r}"
        )
    # the whole bucket expression is built as ONE SQL string (single
    # parse) — the Column-op form cost ~0.5s of py4j construction per
    # plan (3 HOF lambdas per plane, several roundtrips each); the
    # parsed tree is identical, so buckets are bit-identical
    vd = _vd_sql(vec_col)
    int_seed = int(seed)

    def component_sql(p: int) -> str:
        if plane_hash == "md5":
            h = (
                f"cast(conv(substring(md5(cast(concat('{int_seed}:{p}:',"
                " cast(i as string)) as binary)), 1, 15), 16, 10) as bigint)"
            )
        else:
            h = f"xxhash64({int_seed}, {p}, i)"
        return f"pmod({h}, {1 << 20}) / {float(1 << 19)!r}D - 1.0D"

    bits = []
    for p in range(num_planes):
        proj = (
            f"aggregate(transform({vd}, (v, i) -> v * ({component_sql(p)})),"
            " 0.0D, (acc, x) -> acc + x)"
        )
        bits.append(f"(CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END)")
    return df.select(
        F.col(id_col), F.col(vec_col), F.expr(" + ".join(bits)).alias("bucket")
    )


def ivf_build(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int = 16,
    seed: int = 42,
    fit_sample_rows: int | None = None,
    fit_sample_fraction: float | None = None,
):
    """IVF (inverted-file) index build: KMeans centroids over the corpus,
    every vector assigned to its nearest centroid.

    Returns ``(assigned_df, centers)`` — ``assigned_df`` adds a
    ``cluster`` column (at corpus scale, WRITE IT PARTITIONED BY cluster:
    probe-time cluster filters then become partition pruning and a
    query touches ``nprobe/n_clusters`` of the data on disk);
    ``centers`` is the tiny driver-side centroid list (n_clusters x dim
    floats) that travels into query plans as literals.

    ``fit_sample_rows`` is the 100 TB knob: KMeans iterates over its
    input several times, and fitting on the FULL corpus is both slow
    and pointless — centroid quality saturates long before corpus size.
    When set, the fit runs on a DETERMINISTIC content-hash sample of
    ~that many rows (xxhash64 of ``id_col`` — same rows on any
    partitioning or rerun, unlike ``df.sample``); sizing the fraction
    costs one ``count()`` of the input, so corpora that already know
    their size should pass ``fit_sample_fraction`` instead (no count).
    The threshold CEILs (never truncates to an empty sample at extreme
    fractions) and the row target is floored at ``20 * n_clusters`` so
    the fit always has enough points.

    Assignment ALWAYS uses the pure-expression max-cosine argmax
    (``ivf_assign``) against the fitted centroids — one metric whether
    or not the fit was sampled, and the SAME metric the probe stage
    ranks centroids with (KMeans' own euclidean ``transform`` disagrees
    with cosine when centroid norms differ, which would make cluster
    membership depend on whether sampling kicked in). Standard IVF
    practice (FAISS trains on a sample for the same reason)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    # cluster UNIT vectors: euclidean k-means on the unit sphere is
    # monotone in cosine, so centroid regions align with the cosine
    # neighborhoods the probe stage searches
    base = df.withColumn("__vd", _unit(vd))
    fraction = fit_sample_fraction
    if fraction is None and fit_sample_rows is not None:
        target = max(int(fit_sample_rows), 20 * n_clusters)
        n = df.count()
        fraction = target / n if n > target else None
    fit_input = base
    if fraction is not None and fraction < 1.0:
        buckets = 1 << 20
        # ceil, not int(): a 100 TB corpus with a modest row target
        # gives fraction * 2^20 < 1, which int() truncates to an EMPTY
        # sample (h < 0) and a cryptic KMeans failure
        thr = max(1, math.ceil(fraction * buckets))
        h = F.pmod(
            F.xxhash64(F.col(id_col).cast("string"), F.lit(f"ivf{seed}")),
            F.lit(buckets),
        )
        fit_input = base.filter(h < thr)
        # chance guard: on a SMALL input an aggressive fraction can
        # still hash to fewer rows than the fit needs — fall back to
        # the full input (the one extra count runs only on the already
        # filtered sample)
        if fit_input.count() < n_clusters:
            fit_input = base
    feat = fit_input.withColumn("__features", array_to_vector("__vd"))
    km = KMeans(
        k=n_clusters, seed=seed, featuresCol="__features", predictionCol="cluster"
    )
    model = km.fit(feat)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    return ivf_assign(df, vec_col, centers), centers


def ivf_assign(df: DataFrame, vec_col: str, centers: list) -> DataFrame:
    """Assign every vector to its nearest (max-cosine) PINNED centroid —
    the probe half of IVF split from the KMeans fit. Given fixed
    centroids this is exact relational algebra (per-centroid dot
    product, argmax), so a pinned-centroid index is fully
    cross-engine-verifiable even though the fit itself is not; it is
    also the path for re-assigning fresh data into an EXISTING index
    without refitting.

    Pure JVM expressions: one score per centroid (dot(v, c)/|c| — the
    shared |v| factor cannot change the argmax and is skipped), argmax
    via ``array_position(scores, array_max(scores))`` with
    first-lowest-index tie-break. Map-only, no shuffle; centroids ride
    as plan literals (n_clusters x dim doubles — tiny, built as one SQL
    parse — the per-literal Column form cost ~0.5s of py4j
    construction per 8x64 argmax)."""
    vd = _vd_sql(vec_col)
    scores = []
    for c in centers:
        cn = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        scores.append(f"({_dot_sql(vd, _dvec_sql(c))} / {float(cn)!r}D)")
    sarr = "array(" + ",".join(scores) + ")"
    cluster = f"cast(array_position({sarr}, array_max({sarr})) - 1 as int)"
    return df.withColumn("cluster", F.expr(cluster))


def ivf_topk(
    assigned: DataFrame,
    centers: list,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF probe: rank centroids against the query DRIVER-SIDE (tiny),
    then brute-force cosine only inside the ``nprobe`` nearest clusters.
    With cluster-partitioned storage the filter prunes partitions, so the
    scan itself shrinks by ``nprobe/n_clusters`` — the property that makes
    this the 100 TB path while brute_force_topk stays the small-corpus
    baseline."""
    q = [float(x) for x in query]
    qn = math.sqrt(sum(x * x for x in q)) or 1.0

    def cos_to_query(center: list) -> float:
        cn = math.sqrt(sum(x * x for x in center)) or 1.0
        return sum(a * b for a, b in zip(center, q)) / (cn * qn)

    probes = sorted(range(len(centers)), key=lambda i: -cos_to_query(centers[i]))[:nprobe]
    qcol = lit_dvec(q)
    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    score = _dot(vd, qcol) / (_norm(vd) * F.lit(qn))
    return (
        assigned.filter(F.col("cluster").isin(probes))
        .select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_bucket_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate per-row top-k: bucket by random hyperplanes, exact
    cosine within each bucket. The self-join shuffles on the bucket id —
    at 100 TB each vector meets only its bucket-mates, never the corpus."""
    from pyspark.sql import Window as W

    b = hyperplane_buckets(df, vec_col, id_col, num_planes, seed)
    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    # (vec, nrm) with norms divided out per pair — not a unit-normalize
    # transform, whose captured norm re-evaluates per element (see _unit)
    prepped = b.select(
        F.col(id_col).alias("id"),
        "bucket",
        vd.alias("vec"),
        _norm(vd).alias("nrm"),
    )
    pairs = (
        prepped.alias("a")
        .join(
            prepped.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_write_partitioned(
    assigned: DataFrame, path: str, files_per_partition: int = 1, **options
) -> None:
    """Materialize an IVF index as cluster-partitioned parquet
    (``cluster=<id>/...`` hive layout via ``io.writers.write_partitioned``
    — pre-shuffled so each cluster gets a bounded file count, not one
    file per task per cluster). This is the missing physical half of the
    probe: once the corpus lives under cluster directories, a probe's
    ``cluster IN (...)`` filter prunes at PLANNING time and the scan
    itself touches only ``nprobe/n_clusters`` of the bytes on disk —
    the property that makes IVF the 100 TB path."""
    from dataframes_spark.io.writers import write_partitioned

    write_partitioned(
        assigned, path, ["cluster"], files_per_partition=files_per_partition, **options
    )


def ivf_topk_partitioned(
    spark,
    path: str,
    centers: list,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe a cluster-partitioned IVF store written by
    ``ivf_write_partitioned``: identical ranking to ``ivf_topk``, but the
    nprobe cluster filter lands on the hive partition column, so the scan
    lists and reads ONLY the probed cluster directories (PartitionFilters
    on the scan — pinned in tests/test_plans.py)."""
    assigned = spark.read.parquet(path)
    return ivf_topk(assigned, centers, vec_col, id_col, query, k=k, nprobe=nprobe)


def recall_report(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_queries: int = 16,
    num_planes: int = 8,
    seed: int = 42,
    centers: list | None = None,
    nprobe: int = 4,
    plane_hash: str = "xxhash64",
    query_ids: Sequence | None = None,
    codebooks: list | None = None,
) -> DataFrame:
    """Recall@k of the approximate ANN paths against exact brute force —
    the quality dial every ANN deployment needs before trusting its
    ``num_planes``/``nprobe`` settings. One row per method:
    ``(method, recall_at_k, n_queries, k)`` where recall is the fraction
    of each query's exact top-k the approximate path recovered, averaged
    over a DETERMINISTIC sample of ``n_queries`` query rows (smallest
    ``xxhash64(id, seed)`` — same queries on any partitioning or rerun),
    or over an explicit ``query_ids`` list (the cross-engine-verifiable
    form: with pinned query ids, pinned centers, and
    ``plane_hash="md5"`` every stage is exact relational algebra).

    Methods: ``lsh_buckets`` (random-hyperplane buckets, candidates only
    meet in-bucket); with ``centers``, ``ivf_nprobe`` (in-cluster search
    of the ``nprobe`` best clusters per query); with ``codebooks``,
    ``pq_adc`` (the whole corpus ranked by quantized ADC distance over
    PQ codes — the compression path's quality dial).

    Scale shape: the exact baseline scores n_queries x corpus pairs via
    a BROADCAST of the tiny query set — linear in the corpus with a
    constant factor, never a corpus self-join. Each approximate path
    scores only its own candidate set. All ranking is windowed per
    query id (hash-partitioned on n_queries keys)."""
    from pyspark.sql import Window as W

    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    corpus = df.select(
        F.col(id_col).alias("__cid"), vd.alias("__cvec"), _norm(vd).alias("__cnrm")
    )
    qbase = df.select(
        F.col(id_col).alias("__qid"), vd.alias("__qvec"), _norm(vd).alias("__qnrm")
    )
    if query_ids is not None:
        queries = qbase.filter(F.col("__qid").isin(list(query_ids)))
        n_queries = len(list(query_ids))
    else:
        queries = (
            qbase.withColumn(
                "__h",
                F.xxhash64(F.col("__qid").cast("string"), F.lit(f"recall{seed}")),
            )
            .orderBy("__h", "__qid")
            .limit(n_queries)
            .drop("__h")
        )
    w = W.partitionBy("__qid").orderBy(F.col("__score").desc(), F.col("__cid").asc())
    score = (
        _dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qnrm") * F.col("__cnrm"))
    ).alias("__score")

    def topk(cands: DataFrame) -> DataFrame:
        return (
            cands.select("__qid", "__cid", score)
            .withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= k)
            .select("__qid", "__cid")
        )

    exact = topk(
        corpus.join(F.broadcast(queries), F.col("__cid") != F.col("__qid"))
    )

    def recall_of(approx: DataFrame, method: str) -> DataFrame:
        # ONE aggregate over a left join — the former two scalar counts
        # + crossJoin ran two extra jobs per method. approx top-k rows
        # are unique per (qid, cid) (row_number ranks), so the left join
        # preserves exact's cardinality and sum(hit)/count(*) is the
        # same exact-integer division as n_hit/n_exact, bit for bit.
        hit = approx.withColumn("__m", F.lit(1))
        return (
            exact.join(hit, ["__qid", "__cid"], "left")
            .agg(
                (
                    F.sum(F.coalesce(F.col("__m"), F.lit(0)))
                    / F.count(F.lit(1))
                ).alias("recall_at_k")
            )
            .select(
                F.lit(method).alias("method"),
                "recall_at_k",
                F.lit(n_queries).alias("n_queries"),
                F.lit(k).alias("k"),
            )
        )

    # LSH lane: queries meet only their bucket-mates
    buckets = hyperplane_buckets(df, vec_col, id_col, num_planes, seed, plane_hash)
    cb = buckets.select(
        F.col(id_col).alias("__cid"), F.col("bucket").alias("__cb")
    ).join(corpus, "__cid")
    qb = (
        buckets.select(F.col(id_col).alias("__qid"), F.col("bucket").alias("__qb"))
        .join(queries, "__qid")
    )
    lsh_cands = cb.join(
        F.broadcast(qb),
        (F.col("__cb") == F.col("__qb")) & (F.col("__cid") != F.col("__qid")),
    )
    report = recall_of(topk(lsh_cands), "lsh_buckets")

    if centers is not None:
        assigned = ivf_assign(df, vec_col, centers).select(
            F.col(id_col).alias("__cid"), F.col("cluster").alias("__ccl")
        ).join(corpus, "__cid")
        # per-query nprobe best clusters: score array over the centroid
        # literals, sort (desc score, asc cluster id), slice, explode —
        # pure expressions on the tiny query frame, built as one SQL
        # parse (see `_dot_sql`)
        cscores = []
        for ci, c in enumerate(centers):
            cn = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
            cscores.append(
                "named_struct('neg',"
                f" -{_dot_sql('`__qvec`', _dvec_sql(c))} / {float(cn)!r}D,"
                f" 'cid', {ci})"
            )
        probes = queries.select(
            "__qid",
            "__qvec",
            "__qnrm",
            F.explode(
                F.expr(
                    "slice(array_sort(array("
                    + ",".join(cscores)
                    + f")), 1, {int(nprobe)})"
                )
            ).alias("__p"),
        ).select("__qid", "__qvec", "__qnrm", F.col("__p.cid").alias("__ccl"))
        ivf_cands = assigned.alias("a").join(
            F.broadcast(probes).alias("p"),
            (F.col("a.__ccl") == F.col("p.__ccl")) & (F.col("a.__cid") != F.col("p.__qid")),
        ).select("a.__cid", "a.__cvec", "a.__cnrm", "p.__qid", "p.__qvec", "p.__qnrm")
        report = report.unionByName(recall_of(topk(ivf_cands), "ivf_nprobe"))

    if codebooks is not None:
        # PQ lane: rank the WHOLE corpus by ADC distance over codes —
        # PQ is a compression, not a pruning, so its recall loss is
        # quantized scores reordering the top-k. On unit vectors
        # ||q - c||^2 = 2 - 2 cos, so the L2-ADC ranking compares
        # apples-to-apples with the exact cosine baseline. The chosen
        # centroid is an element_at into a literal (k x d_sub) matrix
        # by the stored code — same no-vector-read scan as `pq_topk`,
        # generalized to a query FRAME (per-query LUTs are a driver
        # loop; the fold below is one plan for any n_queries).
        m = len(codebooks)
        d_sub = len(codebooks[0][0])
        encoded = pq_encode(df, vec_col, codebooks).select(
            F.col(id_col).alias("__cid"), "pq_code"
        )
        pq_queries = queries.select("__qid", _unit(F.col("__qvec")).alias("__qu"))
        pairs = encoded.join(
            F.broadcast(pq_queries), F.col("__cid") != F.col("__qid")
        )
        dist = None
        for j, book in enumerate(codebooks):
            qsub = F.slice(F.col("__qu"), j * d_sub + 1, d_sub)
            matrix = lit_dmat(book)
            chosen = F.element_at(
                matrix, F.element_at(F.col("pq_code"), j + 1) + 1
            )
            term = F.aggregate(
                F.zip_with(qsub, chosen, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            dist = term if dist is None else dist + term
        wpq = W.partitionBy("__qid").orderBy(
            F.col("__d").asc(), F.col("__cid").asc()
        )
        pq_top = (
            pairs.select("__qid", "__cid", dist.alias("__d"))
            .withColumn("__rank", F.row_number().over(wpq))
            .filter(F.col("__rank") <= k)
            .select("__qid", "__cid")
        )
        report = report.unionByName(recall_of(pq_top, "pq_adc"))
    return report


# --------------------------------------------------------------------------
# Product quantization (PQ): memory-bounded ANN codes
# --------------------------------------------------------------------------
#
# The billion-scale half of the classic IVF+PQ recipe (Jégou, Douze,
# Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
# 2011; FAISS IndexIVFPQ is the reference implementation): split the
# dim-d unit vector into m contiguous subspaces, k-means each subspace
# to k centroids (the codebooks — m * k * (dim/m) floats, driver-tiny),
# and store each vector as its m argmin centroid indices — dim floats
# compress to m small ints, so a 100 TB float corpus becomes a few TB
# of codes that scan far faster than the vectors. Queries score codes
# by Asymmetric Distance Computation (ADC): one m x k lookup table of
# query-subvector-to-centroid distances, computed driver-side and
# shipped as plan literals, turns per-row scoring into m array lookups
# + adds — pure JVM expressions, no vectors touched at query time.
# Vectors are unit-normalized first, so squared-L2 ADC ranks exactly
# like cosine (||a-b||^2 = 2 - 2 cos on the unit sphere).


def _pq_subspaces(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} must divide into m={m} subspaces")
    return dim // m


def pq_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    fit_sample_rows: int = 4096,
    iters: int = 20,
) -> list:
    """Fit PQ codebooks: per-subspace Lloyd k-means on a DETERMINISTIC
    content-hash sample (the `ivf_build` sampling rationale — codebook
    quality saturates long before corpus size, and a hash sample picks
    the same rows on any partitioning or rerun). The driver-side fit is
    the sanctioned small closing step (sample_rows x dim floats, like
    the OLS normal equations / PCA eigh); init takes the first k
    sample subvectors in md5-of-id order (deterministic, no RNG state),
    ties in assignment break to the lowest centroid index. Returns
    ``codebooks``: m lists of k centroids of dim/m doubles."""
    import numpy as np

    d_sub = _pq_subspaces(dim, m)
    if k < 1 or m < 1:
        raise ValueError(f"need m >= 1, k >= 1, got m={m}, k={k}")
    sample = (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"/pq{seed}")))
            .alias("__h"),
            _unit(
                F.transform(F.col(vec_col), lambda v: v.cast("double"))
            ).alias("__v"),
        )
        .orderBy("__h")
        .limit(int(fit_sample_rows))
        .collect()
    )
    if len(sample) < k:
        raise ValueError(
            f"pq_fit needs at least k={k} vectors, got {len(sample)}"
        )
    x = np.asarray([r["__v"] for r in sample], dtype=np.float64)
    codebooks = []
    for j in range(m):
        sub = x[:, j * d_sub : (j + 1) * d_sub]
        cents = sub[:k].copy()  # first-k-by-hash-order init
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties -> lowest index
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        codebooks.append([[float(v) for v in c] for c in cents])
    return codebooks


def pq_encode(df: DataFrame, vec_col: str, codebooks: list) -> DataFrame:
    """Append ``pq_code`` (array<int>, length m): each subspace's argmin
    centroid under squared L2 on the unit-normalized vector. Map-only
    JVM expressions — per subspace, k literal-centroid distance folds
    and a first-match argmin (``array_position`` of the min — the same
    lowest-index tie rule as the fit). At corpus scale this is the
    write-time pass that shrinks dim floats to m codes."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    u = _unit(F.transform(F.col(vec_col), lambda v: v.cast("double")))
    out = df.withColumn("__pq_u", u)
    # per-subspace argmin built as ONE SQL parse each — the Column form
    # was m x k HOF lambdas (256 at m=8, k=16), ~1s of pure py4j
    # construction per plan; the parsed tree is identical
    codes = []
    for j, book in enumerate(codebooks):
        sub = f"slice(`__pq_u`, {j * d_sub + 1}, {d_sub})"
        dists = "array(" + ",".join(
            f"aggregate(zip_with({sub}, {_dvec_sql(cent)},"
            " (a, b) -> (a - b) * (a - b)), 0.0D, (acc, v) -> acc + v)"
            for cent in book
        ) + ")"
        codes.append(
            f"cast(array_position({dists}, array_min({dists})) - 1 as int)"
        )
    return out.withColumn(
        "pq_code", F.expr("array(" + ",".join(codes) + ")")
    ).drop("__pq_u")


def pq_topk(
    encoded: DataFrame,
    id_col: str,
    codebooks: list,
    query: Sequence[float],
    k: int = 10,
) -> DataFrame:
    """ADC top-k over PQ codes: the m x k table of query-subvector-to-
    centroid squared distances is computed DRIVER-SIDE (tiny) and rides
    into the plan as literal arrays; each row's approximate distance is
    m ``element_at`` lookups added in subspace order — no vector column
    is read, so the scan is as narrow as the codes. Ascending distance,
    id tiebreak, TakeOrdered heap."""
    import math as _math

    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    q = [float(x) for x in query]
    qn = _math.sqrt(sum(v * v for v in q)) or 1.0
    qu = [v / qn for v in q]
    luts = []
    for j, book in enumerate(codebooks):
        qs = qu[j * d_sub : (j + 1) * d_sub]
        luts.append(
            [sum((a - b) * (a - b) for a, b in zip(qs, c)) for c in book]
        )
    score = None
    for j in range(m):
        term = F.element_at(
            lit_dvec(luts[j]),
            F.element_at(F.col("pq_code"), j + 1) + 1,
        )
        score = term if score is None else score + term
    return (
        encoded.select(F.col(id_col), score.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_write_partitioned(
    df: DataFrame,
    path: str,
    vec_col: str,
    id_col: str,
    centers: list,
    codebooks: list,
    files_per_partition: int = 1,
    keep_vectors: bool = False,
    **options,
) -> None:
    """Materialize the full IVF+PQ index: vectors assigned to their
    nearest pinned centroid (`ivf_assign`), PQ-encoded (`pq_encode`),
    and written cluster-partitioned WITHOUT the vector column (unless
    ``keep_vectors`` — e.g. for a re-rank stage). This is the classic
    billion-scale layout: a probe prunes whole cluster directories at
    planning time AND the surviving scan reads m small ints per row
    instead of dim floats — the two compressions multiply, so a
    nprobe/n_clusters probe over codes touches a tiny fraction of the
    bytes the raw corpus occupies."""
    assigned = pq_encode(ivf_assign(df, vec_col, centers), vec_col, codebooks)
    cols = [id_col, "cluster", "pq_code"] + ([vec_col] if keep_vectors else [])
    ivf_write_partitioned(
        assigned.select(*cols),
        path,
        files_per_partition=files_per_partition,
        **options,
    )


def ivfpq_topk(
    spark,
    path: str,
    centers: list,
    codebooks: list,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe an `ivfpq_write_partitioned` store: rank centroids against
    the query driver-side, filter to the ``nprobe`` best clusters (hive
    partition pruning — only those directories are listed or read),
    then ADC-score the surviving codes (`pq_topk` — m lookup adds per
    row, no vector bytes anywhere). Returns ``(id, adc_dist)``
    ascending; on unit vectors ADC squared-L2 ranks like cosine, so the
    result is directly comparable to the exact/IVF cosine lanes (e.g.
    for a recall_report-style audit or a keep_vectors re-rank)."""
    q = [float(x) for x in query]
    qn = math.sqrt(sum(x * x for x in q)) or 1.0

    def cos_to_query(center: list) -> float:
        cn = math.sqrt(sum(x * x for x in center)) or 1.0
        return sum(a * b for a, b in zip(center, q)) / (cn * qn)

    probes = sorted(
        range(len(centers)), key=lambda i: -cos_to_query(centers[i])
    )[:nprobe]
    store = spark.read.parquet(path).filter(F.col("cluster").isin(probes))
    return pq_topk(store, id_col, codebooks, q, k=k)
