"""Pure-SQL query surface: the engine's catalog (catalog.py) makes every
table a named view, so users can run ANSI SQL directly — the reference
exposes only the DataFrame API; this closes the SQL half of the Spark
surface.  The statement below is written in the dialect-neutral subset
and executes VERBATIM on both Spark SQL and the DuckDB oracle — dialect
parity is part of what the query proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from udacity_datalake_spark_spark.catalog import sql
from udacity_datalake_spark_spark.plans.registry import query

# TPC-H Q3-shaped shipping-priority query (segment filter, 3-way join,
# revenue top-10).  Decimal casts written explicitly so Spark and DuckDB
# produce bit-identical sums; ORDER BY carries the unique group key so
# the LIMIT cut is deterministic.
_Q3_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@query("q58_sql_shipping_priority", oracle=_Q3_SQL)
def q58_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME SQL text the oracle runs, executed through spark.sql over
    the registered catalog — Catalyst plans the 3-way join with the
    customer dim broadcast and both filters pushed to the parquet scans."""
    return sql(spark, sf_dir, _Q3_SQL)


# Correlated scalar subquery — Catalyst de-correlates it into an aggregate
# + join (RewriteCorrelatedScalarSubquery); DuckDB does the equivalent
# flattening.  The remaining relational shape the surface hadn't covered.
_MAX_BAL_SQL = """
SELECT s_name, s_nationkey, s_acctbal
FROM supplier s
WHERE s_acctbal = (SELECT max(s2.s_acctbal)
                   FROM supplier s2
                   WHERE s2.s_nationkey = s.s_nationkey)
"""


@query("q63_correlated_subquery", oracle=_MAX_BAL_SQL)
def q63_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation best-balance suppliers via a correlated scalar subquery
    (TPC-H Q2's shape) — same SQL text on both engines."""
    return sql(spark, sf_dir, _MAX_BAL_SQL)


# TPC-H Q4 shape — correlated EXISTS: Catalyst rewrites the subquery to a
# left-semi join (RewritePredicateSubquery); DuckDB plans the same
# flattening.  Distinct decorrelation path from q63's scalar subquery.
_EXISTS_AGG_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


@query("q74_exists_agg", oracle=_EXISTS_AGG_SQL)
def q74_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS over the fact table feeding an aggregate (TPC-H
    Q4's shape) — planned as a left-semi join on both engines, so the
    lineitem side never widens the orders rows."""
    return sql(spark, sf_dir, _EXISTS_AGG_SQL)


# TPC-H Q16 shape — NOT IN subquery (null-aware anti join) + multi-key
# count-distinct aggregate.  NOT IN's three-valued-logic null semantics
# are the classic correctness trap; both engines must agree exactly.
_NOT_IN_SQL = """
SELECT p_type, p_size, count(DISTINCT s_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size IN (1, 14, 23, 45)
  AND s_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY p_type, p_size
"""


@query("q75_not_in_distinct", oracle=_NOT_IN_SQL)
def q75_not_in_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (null-aware anti join) filtering a 3-way join into a
    count-distinct aggregate (TPC-H Q16's shape)."""
    return sql(spark, sf_dir, _NOT_IN_SQL)


# The NOT IN null trap: one NULL in the subquery makes x NOT IN (...)
# UNKNOWN for every row (three-valued logic), so the NOT IN count is 0
# while the NOT EXISTS twin counts normally.  Engines that "optimize"
# NOT IN into an anti join without the null guard get this wrong; both
# Spark (NullAwareAntiJoin) and DuckDB answer it correctly — proven by
# running the same text on both.
_NOT_IN_NULL_SQL = """
WITH probe AS (
    SELECT nullif(c_custkey, 1) AS k FROM customer WHERE c_custkey <= 50
)
SELECT
    (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM probe))
        AS n_not_in,
    (SELECT count(*) FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM probe p WHERE p.k = o.o_custkey)) AS n_not_exists
"""


@query("q39_not_in_null_semantics", oracle=_NOT_IN_NULL_SQL)
def q39_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS under a NULL-bearing subquery — the classic
    three-valued-logic trap (NOT IN must yield zero rows; NOT EXISTS
    counts).  Spark plans the null-aware anti join (a broadcast with an
    any-null flag, not a nested loop); the count pair proves semantics
    match the oracle bit-for-bit."""
    return sql(spark, sf_dir, _NOT_IN_NULL_SQL)
