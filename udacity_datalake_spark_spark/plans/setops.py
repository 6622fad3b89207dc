"""Set operations: UNION ALL / UNION / INTERSECT / EXCEPT (all absent from
the reference, SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q23_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q23_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (rows in both branches appear twice)."""
    o = read_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "o_totalprice")
    return a.unionByName(b)


@query(
    "q24_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q24_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION (dedup) = unionByName + distinct."""
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "q25_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q25_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q26_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q26_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics — nations with customers but no suppliers).
    ``subtract`` is EXCEPT DISTINCT; ``exceptAll`` would be multiset
    difference and leave surviving duplicates."""
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "q123_intersect_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0
    INTERSECT ALL
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
    """,
)
def q123_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (each row kept min(countA,
    countB) times, vs the dedup-then-intersect of q25).  Physically one
    hash exchange per side on the full row; Spark's replicate-rows
    rewrite keeps it a partial-aggregable shape, so the shuffle carries
    (row, count) pairs, not row multiplicity."""
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_orderpriority"])
    a = o.where(F.col("o_orderkey") % 3 == 0).select("o_orderstatus", "o_orderpriority")
    b = o.where(F.col("o_orderkey") % 2 == 0).select("o_orderstatus", "o_orderpriority")
    return a.intersectAll(b)


@query(
    "q124_except_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
    EXCEPT ALL
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0
    """,
)
def q124_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (each row kept max(0, countA −
    countB) times; the bag-semantics twin of q26).  The larger multiset
    is on the left so surviving multiplicities are nonzero — the oracle
    checks the exact surplus count per distinct row."""
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_orderpriority"])
    a = o.where(F.col("o_orderkey") % 2 == 0).select("o_orderstatus", "o_orderpriority")
    b = o.where(F.col("o_orderkey") % 3 == 0).select("o_orderstatus", "o_orderpriority")
    return a.exceptAll(b)
