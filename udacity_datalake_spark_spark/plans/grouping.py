"""Multi-dimensional aggregation: ROLLUP, CUBE, GROUPING SETS, and the
approximate-distinct surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec, exact_sum
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q19_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q19_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with grouping() markers to distinguish
    subtotal rows from genuine NULL groups."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        exact_sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q20_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q20_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass (Spark expands then
    aggregates — one shuffle, not 4 separate queries)."""
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
    )


@query(
    "q21_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, count(*) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
)
def q21_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (segment totals + nation totals in one scan)."""
    c = read_table(spark, sf_dir, "customer")
    return c.groupingSets(
        [["c_mktsegment"], ["c_nationkey"]], "c_mktsegment", "c_nationkey"
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q22_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_5pct,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q22_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB substitute for
    exact COUNT(DISTINCT) when a ±2% answer is enough — no exact-distinct
    shuffle of every key.  Sketch values differ across engines, so the
    driver-checkable output asserts the estimate within a 5% band of the
    exact count (oracle expects TRUE); the raw estimate's error is also
    bounded in tests.  Production drops the exact branch — it exists
    here as the oracle's measuring stick."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.02).cast("double")
                - F.count_distinct("l_partkey")
            )
            <= 0.05 * F.count_distinct("l_partkey")
        ).alias("approx_within_5pct"),
        F.count(F.lit(1)).alias("n"),
    )
