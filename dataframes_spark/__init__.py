"""dataframes_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of enso-org/dataframes (see SURVEY.md).

The reference (``/root/reference``) is a single-threaded, in-memory,
Arrow-backed dataframe library driven from the Luna language. This package
re-expresses its entire operator surface Spark-first:

- every operator is declared through the DataFrame/SQL API so Catalyst can
  push filters, prune columns, and fuse stages;
- group-aggregates, sorts and joins are distributed shuffle operators sized
  for cluster execution (AQE on, broadcast for small dims);
- the reference's JSON expression DSL ("LQuery",
  reference: native_libs/src/LQuery/AST.cpp:60-152) compiles to
  ``pyspark.sql.Column`` expressions — never row-at-a-time Python.

Layout:
    session      SparkSession bootstrap tuned for local[N] testing / cluster
    core.table   thin Table API mirroring the reference surface (src/Table.luna)
    functions.lquery   JSON DSL -> Column compiler
    functions.stats    describe / correlations / RSI / quantiles
    functions.text     language-ID, quality scoring, tokenization, fingerprints
    functions.classifier  hashed-n-gram quality classifier (train/score/store)
    functions.langid   trained multiclass langid (char-n-gram, fastText shape)
    functions.bpe      distributed BPE merge induction + word-type store
    functions.unigram  unigram-LM tokenizer training (SentencePiece family)
    functions.url      URL canonicalization + URL-level dedup (C4 stage 0)
    operators.*        aggregate, sort, nulls, window, reshape, dedup,
                       similarity, rollup (continuous aggregates), ewma
                       (EWMA + decayed sums), kll (rank-quantile sketch),
                       global_order (distributed rank/position lanes)
    io.*               readers (format sniffing, CSV inference) and writers
    streaming.*        Structured Streaming variants of the event operators
"""

from dataframes_spark.session import get_spark, load_table

__all__ = ["get_spark", "load_table", "Table", "read_auto", "plan_report", "assert_scalable"]
__version__ = "0.1.0"


def __getattr__(name):
    # Table / read_auto exported lazily: importing the package stays
    # cheap for callers that only want get_spark, while reference users
    # keep the one-line `from dataframes_spark import Table` entry point
    if name == "Table":
        from dataframes_spark.core.table import Table

        return Table
    if name == "read_auto":
        from dataframes_spark.io.readers import read_auto

        return read_auto
    if name in ("plan_report", "assert_scalable"):
        from dataframes_spark import plan

        return getattr(plan, name)
    if name == "quality":
        # importlib, not `from dataframes_spark import quality`: the
        # from-import re-enters this __getattr__ before the submodule
        # attribute exists and recurses
        import importlib

        return importlib.import_module("dataframes_spark.quality")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
