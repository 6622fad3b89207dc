"""Structured Streaming surface: event-time windows, watermarks, stream
dedup, and an availableNow batch-replay harness.

The reference is batch-only (SURVEY.md §2.8); this module gives the engine
the streaming half.  Every aggregation here is written so the SAME
transformation runs in batch (for the DuckDB oracle) and as a stream —
the streaming tests replay the events table with ``availableNow`` and
assert equality with the batch result.

Watermark discipline for 100 TB streams: state for a window is dropped
once the watermark (max event time − delay) passes its end; late rows
beyond the delay are dropped, bounding state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_datalake_spark_spark.functions.numeric import dec


def read_parquet_stream(
    spark: SparkSession, path: str, schema: T.StructType, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a parquet directory (explicit schema —
    streaming sources never infer)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_window_agg(
    events: DataFrame, ts_col: str = "ts", width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-(window, event_type) count + exact decimal sum over tumbling
    event-time windows.  Works unchanged on a batch or streaming frame."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), width, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def session_window_agg(
    events: DataFrame, ts_col: str = "ts", gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (gap-based): a session closes after
    ``gap`` of silence; window end = last event + gap."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "2 hours") -> DataFrame:
    """Streaming dedup on business keys with bounded state: duplicates
    arriving within the watermark horizon are dropped; state for keys
    older than the watermark is reclaimed."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.dropDuplicatesWithinWatermark(keys) if events.isStreaming else src.dropDuplicates(keys)


def run_available_now(stream_df: DataFrame, query_name: str, output_mode: str = "complete") -> DataFrame:
    """Replay a bounded stream to completion (availableNow trigger) into a
    memory sink; returns the sink as a DataFrame for assertions.
    ``output_mode='complete'`` for aggregations, ``'append'`` for
    row-level streams (dedup, maps)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def run_available_now_checkpointed(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Like ``run_available_now`` but with a durable checkpoint: source
    offsets AND operator state (applyInPandasWithState state store,
    window/dedup state) persist in ``checkpoint_dir``, so a second call
    with the same checkpoint resumes exactly where the last run stopped
    — already-processed files are not replayed, and stateful operators
    continue from their stored state.  This is the production restart
    path.  The memory sink can't recover from a checkpoint, so emissions
    land in ``out_dir`` parquet via the epoch-keyed foreachBatch sink
    (sinks.epoch_keyed_batch_writer): each micro-batch overwrites its own
    ``epoch={id}`` subdirectory, so a crash between the parquet write and
    the checkpoint commit replays the epoch into the SAME directory
    instead of appending duplicates — exactly-once output, not just
    at-least-once.  Pass a fresh ``out_dir`` per run to read each run's
    emissions."""
    from udacity_datalake_spark_spark.streaming.sinks import (
        epoch_keyed_batch_writer,
        read_epoch_keyed,
    )

    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.foreachBatch(epoch_keyed_batch_writer(out_dir))
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_epoch_keyed(spark, out_dir)


def read_rate_stream(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 4
) -> DataFrame:
    """Synthetic load source (``rate`` format): monotone (timestamp, value)
    rows — the standard way to soak-test a streaming topology before
    pointing it at real ingestion.  Columns: timestamp, value."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: tuple[str, str] = ("user_id", "c_custkey"),
    enrich_col: str = "c_mktsegment",
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment: join each event to a static dimension
    row, then windowed counts per (window, dimension attribute).

    The canonical streaming-ETL shape Spark handles natively: the static
    side is (re)broadcast per micro-batch, so the stream never shuffles
    for the join — state exists only in the windowed aggregate, bounded
    by the watermark.  Works unchanged on a batch or streaming ``events``
    frame (the batch twin is the DuckDB-oracle-checked q104).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    left_key, right_key = on
    joined = src.join(
        F.broadcast(dim.select(F.col(right_key), F.col(enrich_col))),
        F.col(left_key) == F.col(right_key),
        "inner",
    )
    return (
        joined.groupBy(F.window(F.col(ts_col), width), enrich_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            enrich_col,
            "n",
            "sum_value",
        )
    )


def m4_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming twin of q372's M4 display downsampling: per tumbling
    event-time window, the (count, min, max, first, last) of purchase
    value in integer cents — first/last as min_by/max_by over the
    (event time, event_id) total order, all algebraic aggregates that
    stream with bounded per-window state.  Works unchanged on a batch
    frame, so the streaming test asserts exact equality with the batch
    result the DuckDB oracle family already verifies."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    purchases = src.where(F.col("event_type") == "purchase").select(
        F.col(ts_col),
        F.round(F.col("value").cast("decimal(18,2)") * 100, 0)
        .cast("long")
        .alias("v"),
        "event_id",
    )
    order_key = F.struct(F.unix_micros(F.col(ts_col)).alias("t"), F.col("event_id"))
    return (
        purchases.groupBy(F.window(F.col(ts_col), width))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
            F.min_by("v", order_key).alias("v_first"),
            F.max_by("v", order_key).alias("v_last"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_points",
            "v_min",
            "v_max",
            "v_first",
            "v_last",
        )
    )
