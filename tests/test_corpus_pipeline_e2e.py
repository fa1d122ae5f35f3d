"""End-to-end corpus preparation: every training-data operator composed
the way a real pipeline runs them, on the driver's synthetic documents.

read -> redact -> boilerplate line strip -> quality/repetition/LM
gate -> exact dedup -> near-dup clustering (keep one per cluster) ->
eval decontamination -> train/val/test split -> context-window packing
-> size-capped clustered write.

The point is integration: each stage consumes the previous stage's
frame, the whole chain stays lazy until the final write, and invariants
that matter to a corpus build (no duplicate survivors, no contaminated
train docs, split disjointness, pack budgets) hold on the output.
"""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dataframes_spark.functions.text import (
    redact,
    repetition_profile,
    quality_score,
    unigram_logprob,
)
from dataframes_spark.io.writers import write_parquet_sized
from dataframes_spark.operators.decontaminate import decontaminate
from dataframes_spark.operators.dedup import (
    exact_dedup,
    near_dup_pairs,
    strip_repeated_lines,
)
from dataframes_spark.operators.graph import dedup_representatives
from dataframes_spark.operators.pack import pack_by_cumsum
from dataframes_spark.operators.sample import assign_split
from dataframes_spark.session import load_table


def test_corpus_prep_pipeline(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. redact PII (no-op on the synthetic corpus, but stays in-plan),
    #    then strip cross-document boilerplate lines (8-word segments
    #    stand in for lines; the synthetic corpus has no newlines)
    clean = docs.withColumn("text", redact(F.col("text")))
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    seg = clean.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(1), F.ceil(F.size(words) / F.lit(8)).cast("int")),
                lambda i: F.concat_ws(
                    " ", F.slice(words, (i - F.lit(1)) * 8 + F.lit(1), F.lit(8))
                ),
            ),
        ),
    )
    stripped = strip_repeated_lines(seg, "text", "doc_id", min_docs=4)

    # 2. quality + repetition + corpus-LM gate
    rep = repetition_profile(stripped, "text", "doc_id").select(
        "doc_id", "top_word_frac"
    )
    lm = unigram_logprob(stripped, "text", "doc_id").select(
        "doc_id", "avg_logprob"
    )
    gated = (
        stripped.join(rep, "doc_id")
        .join(lm, "doc_id")
        .filter(quality_score(F.col("text")) >= 0.5)
        .filter(F.col("top_word_frac") < 0.5)
        .filter(F.col("avg_logprob") > -10.0)
        .drop("top_word_frac", "avg_logprob")
    )

    # 3. exact dedup, then near-dup clustering with keep-one pullback
    exact = exact_dedup(gated, "text", "doc_id")
    pairs = near_dup_pairs(
        exact, "text", "doc_id", min_jaccard=0.8, shingle_k=4, materialize=True
    )
    unique = dedup_representatives(exact, pairs, "doc_id")

    # 4. decontaminate against a fake eval set drawn from the corpus
    evals = (
        docs.orderBy("doc_id")
        .limit(3)
        .select(F.col("doc_id").alias("eval_id"), "text")
    )
    decon = decontaminate(unique, evals, "text", "doc_id", n=13)

    # 5. deterministic split
    split = assign_split(decon, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})

    # 6. pack the train split into 4096-char contexts
    train = split.filter(F.col("split") == "train")
    packed = pack_by_cumsum(
        train.select("doc_id", F.length("text").alias("n_chars")),
        "n_chars",
        4096,
        "doc_id",
    )

    # 7. size-capped write of the packed manifest
    out = str(tmp_path / "train_manifest")
    manifest = train.join(packed.select("doc_id", "pack_id"), "doc_id")
    write_parquet_sized(manifest, out, rows_per_file=200, cluster_by=["pack_id"])

    # ---- invariants ----
    back = spark.read.parquet(out)
    n_train = back.count()
    assert 0 < n_train < n_raw
    # no surviving exact or near duplicates anywhere in the deduped frame
    assert unique.groupBy("text").count().filter("count > 1").count() == 0
    losers = pairs.selectExpr("id_b as doc_id").distinct()
    assert unique.join(losers, "doc_id", "left_semi").count() < losers.count() + 1
    # decontamination removed the eval look-alikes from the corpus
    assert decon.join(
        docs.orderBy("doc_id").limit(3).select("doc_id"), "doc_id", "left_semi"
    ).count() == 0
    # split column is total and exclusive
    assert split.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    # pack budgets hold per the budget-crossing contract: a pack may
    # overflow only by its straddling (largest) document
    sizes = back.groupBy("pack_id").agg(
        F.sum(F.length("text")).alias("tot"),
        F.max(F.length("text")).alias("mx"),
    )
    assert sizes.filter(F.col("tot") - F.col("mx") >= 4096).count() == 0
    # file-size cap respected
    files = glob.glob(out + "/*.parquet")
    assert files and all(pq.ParquetFile(f).metadata.num_rows <= 200 for f in files)
