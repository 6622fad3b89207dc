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
    """INTERSECT (set semantics): nations present among BOTH customers
    and suppliers — plans as a distinct-preserving left-semi aggregate,
    one hash exchange per side."""
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


@query(
    "q149_union_schema_evolution",
    oracle="""
    WITH u AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(NULL AS VARCHAR) AS o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, CAST(NULL AS VARCHAR), o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM u GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q149_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two feeds of the same table carrying
    DIFFERENT column subsets combine with
    ``unionByName(allowMissingColumns=True)`` — absent columns
    null-extend, by NAME not position (the positional-union silent-swap
    hazard).  The downstream aggregate groups over the union including
    the null-extended cells — the everyday shape when a v2 feed adds or
    drops columns mid-stream at 100 TB and both vintages must stay
    queryable together."""
    from udacity_datalake_spark_spark.functions.numeric import dec

    o = read_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    v1 = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("revenue"),
    )
