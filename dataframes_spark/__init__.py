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
    operators.*        aggregate, sort, nulls, window, reshape, dedup, similarity
    io.*               readers (format sniffing, CSV inference) and writers
    streaming.*        Structured Streaming variants of the event operators
"""

from dataframes_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
