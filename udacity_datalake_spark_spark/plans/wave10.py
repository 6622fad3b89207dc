"""Wave 10: bounded per-key retention and column profiling — the last
two everyday lake-operations shapes.

- latest-N retention is the generalized form of q112's latest-1
  snapshot: TTL-style "keep each key's most recent N records" that
  compaction jobs apply to append-only feeds;
- column profiling is the data-catalog crawl: per-column null rates and
  exact top value counts, computed for MANY columns in one pass over the
  fact via an unpivot (stack) — not one scan per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q197_latest_n_per_key",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           count(*) AS n_kept,
           min(ts) AS oldest_kept,
           max(ts) AS newest_kept
    FROM ranked WHERE rn <= 3
    GROUP BY user_id
    """,
)
def q197_latest_n_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded per-key retention: keep each user's latest 3 events (the
    TTL/compaction rule for append-only feeds — q112's current-snapshot
    materialization generalized from latest-1 to latest-N).

    One hash exchange on the key, per-partition sort, rank filter —
    state per key is the frame being ranked, and the window is keyed, so
    there is no global sort anywhere.  At 100 TB this runs
    per-date-partition and the retention output replaces the partition
    (the compaction write path of sources/writers.py)."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    kept = e.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= 3)
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("ts").alias("oldest_kept"),
        F.max("ts").alias("newest_kept"),
    )


@query(
    "q198_column_profile",
    oracle="""
    WITH unpivoted AS (
        SELECT 'event_type' AS col_name, event_type AS val FROM events
        UNION ALL
        SELECT 'lang', lang FROM documents
        UNION ALL
        SELECT 'source', source FROM documents
    ),
    counts AS (
        SELECT col_name, val, count(*) AS cnt
        FROM unpivoted WHERE val IS NOT NULL
        GROUP BY col_name, val
    ),
    ranked AS (
        SELECT col_name, val, cnt,
               row_number() OVER (PARTITION BY col_name
                                  ORDER BY cnt DESC, val) AS rn
        FROM counts
    )
    SELECT col_name, rn AS rank, val AS top_value, cnt AS n_rows
    FROM ranked WHERE rn <= 3
    """,
)
def q198_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-catalog crawl): exact top-3 values per
    profiled column with counts, across columns of DIFFERENT tables, in
    ONE logical shape — each table is scanned once and unpivoted to
    (col_name, value) rows, so profiling N columns costs one scan per
    table, not N.

    The per-column top-k window is keyed by col_name (no global sort)
    and its input is the distinct-value count frame, bounded by
    vocabulary not row count.  Exact counts, deterministic value
    tie-break — unlike ``freqItems``' engine-specific sketch."""
    e = read_table(spark, sf_dir, "events", columns=["event_type"]).select(
        F.lit("event_type").alias("col_name"), F.col("event_type").alias("val")
    )
    d = read_table(spark, sf_dir, "documents", columns=["lang", "source"])
    d_unpiv = d.selectExpr("stack(2, 'lang', lang, 'source', source) AS (col_name, val)")
    unpivoted = e.unionByName(d_unpiv)
    counts = (
        unpivoted.where(F.col("val").isNotNull())
        .groupBy("col_name", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("col_name").orderBy(F.col("cnt").desc(), F.col("val"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("col_name", "rank", F.col("val").alias("top_value"), F.col("cnt").alias("n_rows"))
    )
