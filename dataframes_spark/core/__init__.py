from dataframes_spark.core.table import Table

__all__ = ["Table"]
