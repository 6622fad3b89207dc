from udacity_datalake_spark_spark.streaming.windows import (
    read_parquet_stream,
    run_available_now,
    session_window_agg,
    sliding_window_counts,
    stream_dedup,
    tumbling_window_agg,
)

__all__ = [
    "read_parquet_stream",
    "tumbling_window_agg",
    "sliding_window_counts",
    "session_window_agg",
    "stream_dedup",
    "run_available_now",
]
