"""Window-function surface: ranking, running aggregates, lag/lead,
range frames, global top-k.

The reference has no window functions (SURVEY.md §2.8); these complete the
engine's declared surface.  Every ordered window tie-breaks on a unique
key so results are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q13_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q13_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the scalable 'latest N per key'
    pattern (one hash exchange + in-partition sort; no global sort)."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
    )


@query(
    "q14_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spent
    FROM orders
    """,
)
def q14_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (running) aggregate with an explicit ROWS frame;
    decimal accumulation keeps the prefix sums exact."""
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spent"),
    )


@query(
    "q15_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(value)      OVER w AS prev_value,
           lead(event_type) OVER w AS next_type,
           date_diff('microsecond', lag(ts) OVER w, ts) AS gap_micros
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q15_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over event streams + exact inter-event gap in microseconds
    (integer math — no float time arithmetic)."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_micros"),
    )


@query(
    "q16_rank_dense",
    oracle="""
    SELECT c_nationkey, c_custkey,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_dense_rank
    FROM customer
    """,
)
def q16_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with ties (both engines agree on tie semantics;
    output keyed by c_custkey so the compare is order-insensitive)."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


@query(
    "q17_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
               AS orders_last_30d
    FROM orders
    """,
)
def q17_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per order, how many orders the same
    customer placed in the trailing 30 days (inclusive).  Ordered by epoch
    seconds so the frame bound is plain integer arithmetic."""
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("orders_last_30d"),
    )


@query(
    "q18_topn_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q18_topn_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition heaps + a driver merge, never a full global sort."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
