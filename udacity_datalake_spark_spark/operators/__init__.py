from udacity_datalake_spark_spark.operators.joins import asof_join, left_join_or

__all__ = ["left_join_or", "asof_join"]
