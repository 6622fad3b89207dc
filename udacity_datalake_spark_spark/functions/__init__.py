from udacity_datalake_spark_spark.functions.numeric import dec, exact_avg, exact_sum
from udacity_datalake_spark_spark.functions.datetime import (
    epoch_ms_to_timestamp_compat,
    epoch_ms_to_timestamp_exact,
    time_parts,
    weekday_name,
)
from udacity_datalake_spark_spark.functions.arrays import cosine_similarity, dot_product, l2_norm

__all__ = [
    "dec",
    "exact_sum",
    "exact_avg",
    "epoch_ms_to_timestamp_compat",
    "epoch_ms_to_timestamp_exact",
    "time_parts",
    "weekday_name",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
