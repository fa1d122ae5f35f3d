from dataframes_spark.functions.lquery import compile_predicate, compile_value

__all__ = ["compile_predicate", "compile_value"]
