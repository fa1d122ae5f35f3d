"""Eval-set decontamination for training corpora.

A training corpus must not contain the benchmarks the model will be
evaluated on. The standard guard (the n-gram collision rule used by the
GPT-3/PaLM/Llama training reports) flags every training document that
shares at least one word-level n-gram with any eval document; flagged
docs are dropped or quarantined. Not in the reference (it predates the
workload) — first-class here because every corpus build runs it.

Scale design — the asymmetry IS the design:

- The eval side is small BY DEFINITION (benchmarks are MB-scale; the
  corpus is the 100 TB side). Its distinct n-gram hash set is built
  once and explicitly ``broadcast()``: flagging the corpus is then a
  broadcast join evaluated inside the corpus scan stage — the corpus
  NEVER shuffles, and document text never leaves its scan task.
- N-grams are collapsed to ``xxhash64`` before the join: the broadcast
  table is 8 bytes per distinct eval n-gram (a 100 MB benchmark suite
  at n=13 is a few million hashes — comfortably driver/executor sized),
  and corpus-side n-gram strings die inside the projection.
- Normalization (lowercase, non-alphanumeric folding) matches on both
  sides by construction (shared expression), so punctuation or casing
  deltas can't mask contamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataframes_spark.operators.dedup import _spread


def _norm_words(c: Column) -> Column:
    """Normalized word array: lowercase, non-alphanumeric runs folded to
    one space, split. Must be MATERIALIZED in its own projection before
    any per-position transform — a higher-order-function lambda
    re-evaluates captured outer expressions PER ELEMENT, so n-gramming
    this expression directly would rerun the regex once per position
    (measured ~10x the whole stage on real documents; same pitfall as
    dedup._shingles_of_norm)."""
    return F.split(F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")), " ")


def _ngrams_of_words(words: Column | str, n: int) -> Column:
    """Distinct space-joined n-grams of a word-array column. Documents
    shorter than ``n`` words yield an empty array (they cannot be
    contaminated at this n). Pass the NAME of a materialized column in
    operator pipelines (see :func:`_norm_words` for why)."""
    words = F.col(words) if isinstance(words, str) else words
    k = F.size(words) - F.lit(n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(F.slice(words, i, n), " "),
            )
        )
    )


def word_ngrams(c: Column, n: int) -> Column:
    """Single-expression convenience form of the normalize -> n-gram
    pipeline (the same two building blocks composed inline). Prefer the
    two-projection shape inside operators (see :func:`_norm_words`);
    this form re-evaluates the normalization per position and is only
    for ad-hoc column use."""
    return _ngrams_of_words(_norm_words(c), n)


def _ngram_hashes(df: DataFrame, text_col: str, id_col: str | None, n: int) -> DataFrame:
    """N-gram hash relation: ``(id, g)`` rows, or just ``(g)`` when
    ``id_col`` is None (the eval side needs only set membership — no id
    column is required of benchmark frames). Normalization materializes
    in its own projection (see :func:`_norm_words`); the input is
    spread across the cluster first when the file layout underfeeds the
    cores (dedup._spread)."""
    ids = [F.col(id_col).alias("id")] if id_col else []
    return (
        _spread(df)
        .select(*ids, _norm_words(F.col(text_col)).alias("__w"))
        .select(*(["id"] if id_col else []), F.explode(_ngrams_of_words("__w", n)).alias("__g"))
        .select(*(["id"] if id_col else []), F.xxhash64("__g").alias("g"))
    )


def contamination_report(
    corpus: DataFrame,
    evals: DataFrame,
    text_col: str,
    id_col: str,
    eval_text_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """``(id, n_hits)`` for every corpus document sharing >= 1 word-level
    n-gram with the eval set; ``n_hits`` counts its distinct overlapping
    n-grams (a triage signal: 1 hit is usually a stock phrase, hundreds
    is a verbatim inclusion). Clean documents are absent.

    One corpus scan, zero corpus shuffles before the (contaminated-only)
    aggregate: the eval n-gram hash set is explicitly broadcast. The
    eval frame needs only its text column (``eval_text_col``, default
    ``text_col``) — no id column is required of benchmark frames."""
    ev = _ngram_hashes(evals, eval_text_col or text_col, None, n).distinct()
    cg = _ngram_hashes(corpus, text_col, id_col, n)
    return (
        cg.join(F.broadcast(ev), "g")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    evals: DataFrame,
    text_col: str,
    id_col: str,
    eval_text_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """The corpus minus every document flagged by
    :func:`contamination_report` — same broadcast-flagging plan, then an
    anti-join pullback of the surviving full rows. The flagged-id
    relation is contamination-sized (tiny vs the corpus), so AQE plans
    the anti-join as a broadcast too; the corpus still never shuffles."""
    flagged = contamination_report(
        corpus, evals, text_col, id_col, eval_text_col, n
    ).select(F.col("id").alias(id_col))
    return corpus.join(flagged, id_col, "left_anti")


def semantic_contamination_report(
    corpus: DataFrame,
    evals: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    eval_vec_col: str | None = None,
    eval_id_col: str | None = None,
    num_planes: int = 0,
    seed: int = 42,
    plane_hash: str = "xxhash64",
) -> DataFrame:
    """SEMANTIC decontamination flags — corpus documents whose
    embedding cosine-matches any eval item at ``>= threshold``:
    ``(id, eval_id, cosine)`` with the CLOSEST eval item (cosine ties
    broken by larger eval id — deterministic for any orderable id). The n-gram rule misses
    paraphrased leakage; the embedding rule is the published remedy
    (e.g. the GPT-4/Llama-3 report practice of cosine screening eval
    sets against training data).

    Same asymmetry as the n-gram pass: the eval side is MB-scale by
    definition and is explicitly broadcast, so the corpus NEVER
    shuffles for candidate generation — with ``num_planes = 0`` (exact,
    the decontamination default: a missed match IS leakage) every
    corpus vector meets every eval vector inside its own scan task via
    a broadcast nested-loop join, and the per-corpus-row reduction
    happens map-side (only FLAGGED pairs reach the contamination-sized
    exchange). ``num_planes > 0`` prunes candidates to equal hyperplane
    buckets (`similarity.hyperplane_buckets`, recall < 1 — the
    screening mode for very large eval suites), a broadcast HASH join
    on the bucket key.

    ZERO NORMS never pass silently (a screen whose contract is "a
    missed match IS leakage" cannot quietly skip an unscreenable
    document): a zero-norm CORPUS vector — cosine undefined against
    everything — is emitted as a diagnostic flag row ``(id, eval_id =
    NULL, cosine = NULL)``, so `decontaminate_semantic`'s anti-join
    drops it (fail closed) and a report consumer sees exactly which
    documents could not be screened. A zero-norm EVAL vector
    invalidates the whole screen (nothing can ever match it) and
    RAISES at execution time. The zero-norm corpus pass is one extra
    vector-column scan with the ``norm = 0`` filter pushed down —
    negligible next to the screen's dot products."""
    from dataframes_spark.operators.similarity import (
        _dot,
        _norm,
        hyperplane_buckets,
    )

    eval_vec_col = eval_vec_col or vec_col
    eval_id_col = eval_id_col or id_col
    cd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    ed = F.transform(F.col(eval_vec_col), lambda v: v.cast("double"))

    # a zero-norm (or NULL) EVAL vector can never match anything —
    # the screen is structurally broken; raise at execution time,
    # inside the plan (no extra action), the moment it is touched
    _en = _norm(ed)
    _en_checked = F.when(_en > 0, _en).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "semantic_contamination_report: zero-norm or NULL "
                    f"eval embedding (id column {eval_id_col!r}, value "
                ),
                F.col(eval_id_col).cast("string"),
                F.lit(") — every eval vector must have positive norm"),
            )
        ).cast("double")
    )

    # zero-norm / NULL CORPUS vectors are unscreenable — emit them as
    # explicit diagnostic flags instead of letting the NULL cosine
    # silently drop them from the report (fail closed: the anti-join
    # in decontaminate_semantic removes them)
    _cn = _norm(cd)
    eval_id_type = evals.schema[eval_id_col].dataType
    unscreened = corpus.filter(_cn.isNull() | (_cn == 0)).select(
        F.col(id_col).alias("id"),
        F.lit(None).cast(eval_id_type).alias("eval_id"),
        F.lit(None).cast("double").alias("cosine"),
    )

    if num_planes > 0:
        cside = hyperplane_buckets(
            corpus.filter(_cn > 0), vec_col, id_col, num_planes, seed,
            plane_hash,
        ).select(
            F.col(id_col).alias("__sc_id"),
            "bucket",
            cd.alias("__sc_vec"),
            _norm(cd).alias("__sc_nrm"),
        )
        eside = hyperplane_buckets(
            evals, eval_vec_col, eval_id_col, num_planes, seed, plane_hash
        ).select(
            F.col(eval_id_col).alias("__sc_eid"),
            "bucket",
            ed.alias("__sc_evec"),
            _en_checked.alias("__sc_enrm"),
        )
        pairs = cside.join(F.broadcast(eside), "bucket")
    else:
        cside = corpus.filter(_cn > 0).select(
            F.col(id_col).alias("__sc_id"),
            cd.alias("__sc_vec"),
            _norm(cd).alias("__sc_nrm"),
        )
        eside = evals.select(
            F.col(eval_id_col).alias("__sc_eid"),
            ed.alias("__sc_evec"),
            _en_checked.alias("__sc_enrm"),
        )
        pairs = cside.crossJoin(F.broadcast(eside))

    cosine = _dot(F.col("__sc_vec"), F.col("__sc_evec")) / (
        F.col("__sc_nrm") * F.col("__sc_enrm")
    )
    flagged = pairs.select(
        "__sc_id", "__sc_eid", cosine.alias("__sc_cos")
    ).filter(F.col("__sc_cos") >= threshold)
    best = F.max(F.struct(F.col("__sc_cos"), F.col("__sc_eid"))).alias(
        "__sc_best"
    )
    return (
        flagged.groupBy("__sc_id")
        .agg(best)
        .select(
            F.col("__sc_id").alias("id"),
            F.col("__sc_best.__sc_eid").alias("eval_id"),
            F.col("__sc_best.__sc_cos").alias("cosine"),
        )
        .unionByName(unscreened)
    )


def decontaminate_semantic(
    corpus: DataFrame,
    evals: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    eval_vec_col: str | None = None,
    eval_id_col: str | None = None,
    num_planes: int = 0,
    seed: int = 42,
    plane_hash: str = "xxhash64",
) -> DataFrame:
    """The corpus minus every document flagged by
    :func:`semantic_contamination_report` — the flagged-id relation is
    contamination-sized, so AQE plans the anti-join as a broadcast;
    the corpus still never shuffles (the `decontaminate` contract).
    FAIL CLOSED: zero-norm/NULL-embedding corpus documents are
    unscreenable, appear in the report as diagnostic flags, and are
    therefore dropped here too — an unscreenable document is treated
    as potentially leaky, never silently kept."""
    flagged = semantic_contamination_report(
        corpus, evals, vec_col, id_col, threshold,
        eval_vec_col, eval_id_col, num_planes, seed, plane_hash,
    ).select(F.col("id").alias(id_col))
    return corpus.join(flagged, id_col, "left_anti")
