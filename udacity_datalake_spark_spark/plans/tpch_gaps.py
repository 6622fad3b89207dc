"""Last missing TPC-H query shapes: Q6, Q10, Q11 (adapted).

Completes the decision-support surface started in plans/tpch_extra.py —
after this module the engine covers all 22 TPC-H shapes (some adapted to
the testdata schema, which has no partsupp table and no
commit/receipt-date columns; adaptations noted per query).  The
reference itself has no analytic queries (reference etl.py:23-173 is two
ETL pipelines); these shapes are the generalization a complete engine
owes its users.

Scale notes (100 TB):
- Q6 is the pushdown litmus test: every predicate must reach the parquet
  scan so row-group min/max statistics skip most of the fact table.
- Q10 aggregates the fact side down to one row per customer *before*
  touching the customer dimension, so the dimension join moves the
  smallest possible frame.
- Q11's HAVING-over-global-total is computed in integer cents with a
  cross-multiplied comparison (sum*1000 > total) — no division, no
  floating point, bit-identical on any engine and any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change
# --------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@query("q97_forecast_revenue", oracle=_Q6_ORACLE)
def q97_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: conjunctive range predicates + ungrouped sum.

    The whole query is scan → filter → partial sum → single-row final sum;
    all four predicates push into the parquet scan (PushedFilters), so at
    100 TB row-group statistics skip everything outside the ship-date
    year.  No shuffle beyond the 1-row partial-aggregate exchange.
    """
    l = read_table(spark, sf_dir, "lineitem")
    revenue = (dec("l_extendedprice") * dec("l_discount")).cast("decimal(18,4)")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue)
# --------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q98_returned_items", oracle=_Q10_ORACLE)
def q98_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue.

    Plan order matters at scale: the R-flagged lineitems join the
    date-filtered orders (the only fact-fact shuffle), are aggregated to
    one row per customer key, and only then meet the customer and nation
    dimensions — so the dimension join moves |customers-with-returns|
    rows, not |lineitem| rows.  Revenue is decimal-exact; the top-20 sort
    tie-breaks on c_custkey for a deterministic result set.
    """
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    revenue = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    per_cust = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(revenue).alias("rev_dec"))
    )
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 — important stock (adapted: supplied value per part, no partsupp)
# --------------------------------------------------------------------------

# Adaptation: testdata has no partsupp, so "stock value" is the shipped
# value (sum of extended price) per part from suppliers in one nation —
# the same groupBy + HAVING-over-global-scalar-subquery shape.  Money is
# exact integer cents; the threshold comparison cross-multiplies
# (sum*1000 > total) so neither engine ever divides.

_Q11_ORACLE = """
WITH supplied AS (
    SELECT l_partkey,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
)
SELECT l_partkey AS p_partkey,
       CAST(sum(cents) AS DOUBLE) / 100 AS part_value
FROM supplied
GROUP BY l_partkey
HAVING sum(cents) * 1000 > (SELECT sum(cents) FROM supplied)
ORDER BY part_value DESC, p_partkey
"""


@query("q99_important_parts", oracle=_Q11_ORACLE)
def q99_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supplied value exceeds 0.1% of the
    national total — groupBy + HAVING against a global scalar subquery.

    The scalar total is NOT a second scan: the per-part aggregate is
    computed once, and the global total re-aggregates those (already
    tiny) part sums; the 1-row total then broadcasts into the filter.
    Exact integer-cent arithmetic makes the HAVING boundary bit-stable.
    """
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    cents = (dec("l_extendedprice") * 100).cast("bigint")
    per_part = (
        l.join(F.broadcast(nat_supp), l.l_suppkey == nat_supp.s_suppkey)
        .select(F.col("l_partkey"), cents.alias("cents"))
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("part_cents"))
    )
    total = per_part.agg(F.sum("part_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_cents") * 1000 > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("part_cents").cast("double") / 100).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("p_partkey"))
    )
