"""Event-time windowing query surface (batch mode of the streaming
operators — the same transformations run as streams, proven equivalent in
tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.streaming.windows import (
    session_window_agg,
    sliding_window_counts,
    tumbling_window_agg,
)


@query(
    "q52_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q52_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows: count + exact decimal sum.
    Identical code path runs as a Structured Streaming query with a
    watermark (streaming.windows.tumbling_window_agg)."""
    return tumbling_window_agg(read_table(spark, sf_dir, "events"))


@query(
    "q53_sliding_window",
    oracle="""
    WITH exploded AS (
        SELECT event_type,
               unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
                   AS window_start,
               ts
        FROM events
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n
    FROM exploded
    WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
    GROUP BY 1, 2, 3
    """,
)
def q53_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h width, 30 min slide): every event contributes
    to 2 windows; oracle expands membership explicitly."""
    return sliding_window_counts(read_table(spark, sf_dir, "events"))


@query(
    "q54_session_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 10 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           user_id,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q54_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (10 min): Spark's session_window vs. the
    classic gaps-and-islands SQL — same sessions, same bounds
    (end = last event + gap).

    The oracle's two window passes ORDER BY (ts, event_id) — a TOTAL
    order.  With duplicate timestamps per user (the sf1 fixture's keyed
    replication creates exact ts collisions) an ORDER BY ts alone lets
    the engine permute tied rows differently between the flag pass and
    the running-sum pass, splitting one session into two (seen at sf1:
    98528 vs 98522 sessions).  Spark's session_window is order-insensitive
    here; the tie-break makes the SQL twin deterministic too.
    """
    return session_window_agg(read_table(spark, sf_dir, "events"))


@query(
    "q55_stream_dedup",
    oracle="""
    SELECT user_id, event_type,
           min(ts) AS first_ts
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q55_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic first-occurrence dedup on (user_id, event_type) —
    the batch twin of streaming dropDuplicatesWithinWatermark (which keeps
    the first arrival; in event-time order that is min(ts))."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "event_type", F.col("ts").alias("first_ts"))
    )


@query(
    "q62_timeseries_rollup",
    oracle="""
    SELECT '1 hour' AS grain,
           date_trunc('hour', ts) AS bucket_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT '1 day' AS grain,
           date_trunc('day', ts) AS bucket_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 2, 3
    """,
)
def q62_timeseries_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: the hourly rollup is
    computed from raw events ONCE, and the daily grain re-aggregates the
    hourly result (decimal partials re-sum exactly) — at 100 TB each
    coarser grain reads the much smaller previous rollup, not the raw
    table.  The oracle computes both grains from raw, proving the cascade
    loses nothing."""
    e = read_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).alias("__sum_dec"),
        )
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", F.col("bucket_start")).alias("bucket_start"),
            "event_type",
        )
        .agg(F.sum("n").alias("n"), F.sum("__sum_dec").alias("__sum_dec"))
    )
    out_cols = [
        "grain",
        "bucket_start",
        "event_type",
        "n",
        F.col("__sum_dec").cast("double").alias("sum_value"),
    ]
    return (
        hourly.select(F.lit("1 hour").alias("grain"), *out_cols[1:])
        .unionByName(daily.select(F.lit("1 day").alias("grain"), *out_cols[1:]))
    )


@query(
    "q71_interval_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS error_id,
           a.user_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'error'
    """,
)
def q71_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→error correlation within 10 minutes per user — the
    stream-stream-join shape (operators.joins.interval_join).  The same
    builder runs as a watermarked streaming join, proven equivalent to
    this batch result in tests/test_streaming.py."""
    from udacity_datalake_spark_spark.operators.joins import interval_join

    e = read_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    errors = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
    )
    out = interval_join(
        clicks, errors, "c_user", "e_user", "click_ts", "error_ts", upper="10 minutes"
    )
    return out.select(
        "click_id",
        "error_id",
        F.col("c_user").alias("user_id"),
        (F.unix_micros("error_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


@query(
    "q104_stream_static_join",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           c_mktsegment,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2, 3
    """,
)
def q104_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (batch twin): events joined to the
    customer dimension on user_id, windowed counts + exact decimal sums
    per market segment.  The identical code path runs as a Structured
    Streaming query — the dimension broadcasts per micro-batch, join
    state never accumulates (streaming.windows.stream_static_enrich;
    stream ≡ batch proven in tests/test_streaming.py)."""
    from udacity_datalake_spark_spark.streaming.windows import stream_static_enrich

    return stream_static_enrich(
        read_table(spark, sf_dir, "events"),
        read_table(spark, sf_dir, "customer"),
    )
