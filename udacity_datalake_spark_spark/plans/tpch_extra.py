"""Remaining TPC-H query shapes (Q7/Q8/Q9/Q12/Q14/Q15/Q17/Q18/Q20/Q21).

The reference's workload is two ETL pipelines (reference etl.py:23-173);
a complete engine also has to plan the classic decision-support shapes
well.  The surface already covers Q1/Q2/Q3/Q4/Q5/Q13/Q16/Q19/Q22 — this
module adds the rest, each adapted to the testdata schema (no partsupp
table, no commit/receipt dates; cost and lateness proxies noted per
query) and written DataFrame-first with the physical plan the shape
deserves at 100 TB:

- dimension tables (nation/region/part/supplier/customer at these
  cardinalities) join broadcast — zero shuffle on the build side;
- every money aggregate goes through DECIMAL (functions.numeric) so
  results are bit-stable under any partitioning and match DuckDB;
- ratio results do exact decimal sums first and ONE double divide;
- correlated subqueries are expressed as their decorrelated form
  (aggregate + equi-join) — the plan Catalyst would rewrite to anyway —
  so the shuffle structure is explicit and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.catalog import sql
from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


def _disc_price() -> F.Column:
    """Decimal-exact l_extendedprice * (1 - l_discount)."""
    return (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("decimal(18,4)")


_DISC_PRICE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"
)


# --------------------------------------------------------------------------
# Q7 — volume shipping between nation pairs
# --------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           {_DISC_PRICE_SQL} AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q84_volume_shipping", oracle=_Q7_ORACLE)
def q84_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation pairs.

    Physical plan at scale: the nation-filtered supplier and customer
    dims broadcast into the lineitem/orders sides, so the nation-pair
    predicate prunes BEFORE the one big fact-fact shuffle
    (lineitem ⋈ orders on orderkey).  Filters on the broadcast sides cut
    22/25 nations' rows at the scan.
    """
    nations = ["NATION_1", "NATION_2", "NATION_3"]
    n = read_table(spark, sf_dir, "nation")
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.where(F.col("n_name").isin(nations))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        read_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(n.where(F.col("n_name").isin(nations))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — national market share within a region
# --------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT o_year,
       CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM (
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           {_DISC_PRICE_SQL} AS volume,
           n2.n_name AS nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q85_market_share", oracle=_Q8_ORACLE)
def q85_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional volume per year.

    8-table join where everything except lineitem ⋈ orders broadcasts;
    the p_type filter lands on the part scan so the fact rows are pruned
    by the FIRST (broadcast) join.  Share = conditional decimal sum over
    total decimal sum, divided once in double.
    """
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    part = (
        read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    cust_region = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    # prune orders BEFORE the only shuffle join: date range + the
    # broadcast region semi-filter cut the shuffled rows ~10× — at 100 TB
    # this is the difference between shuffling the full orders table and
    # only the qualifying slice
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_orderdate")
    )
    li = read_table(spark, sf_dir, "lineitem")
    vol = _disc_price()
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_1", vol).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# --------------------------------------------------------------------------
# Adapted: the testdata has no partsupp.ps_supplycost, so cost is proxied
# by p_retailprice * l_quantity * 0.10 (a fixed unit-cost fraction) —
# same expression structure (revenue minus per-unit cost), same plan.

_Q9_ORACLE = """
SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM (
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
           - CAST(CAST(0.10 AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS amount
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q86_product_profit", oracle=_Q9_ORACLE)
def q86_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for parts
    matching a name pattern.

    The LIKE filter cannot push below the scan as a range, but the
    filtered part dim still broadcasts, so lineitem is pruned before its
    shuffle against orders — the join order a cost-based planner picks
    and that we fix structurally here.
    """
    part = (
        read_table(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp_nation = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(read_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    li = read_table(spark, sf_dir, "lineitem")
    amount = _disc_price() - (
        F.lit(0.10).cast("decimal(18,2)") * dec("p_retailprice") * dec("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("nation", "o_year")
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q12 — shipping-priority class counts
# --------------------------------------------------------------------------
# Adapted: no l_shipmode/commit/receipt dates; the grouped conditional
# counting over a fact-fact join (Q12's actual shape) groups by
# l_returnflag with the same urgent/non-urgent CASE split.

_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q87_priority_lines", oracle=_Q12_ORACLE)
def q87_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: urgent vs non-urgent line counts per class.

    One fact-fact equi-join with the date filter pushed to the lineitem
    scan, then a 3-group conditional count — partial aggregation makes
    the exchange carry 3 rows per task regardless of input size.
    """
    orders = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"]).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q14 — promotion revenue share
# --------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT CAST(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@query("q88_promo_revenue", oracle=_Q14_ORACLE)
def q88_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from promo parts.

    Broadcast part into the date-pruned lineitem scan, one global
    conditional aggregate — no shuffle at all once part broadcasts
    (the ungrouped agg reduces to a single-partition combine of 32
    partials).
    """
    part = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    vol = _disc_price()
    promo_vol = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo_vol).cast("double") / F.sum(vol).cast("double"))
            .cast("double")
            .alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue
# --------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q89_top_supplier", oracle=_Q15_ORACLE)
def q89_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the max quarterly revenue.

    The CTE-with-max-subquery becomes: revenue agg (one shuffle on
    l_suppkey), then a rank-free max via a single-row broadcast join —
    cheaper than a window over the whole agg because only the scalar max
    crosses stages.  Decimal sums make the max and the equality exact.
    """
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = read_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg threshold)
# --------------------------------------------------------------------------

_Q17_ORACLE = """
WITH qty AS (
    SELECT l_partkey AS t_partkey,
           0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / count(*)) AS threshold
    FROM lineitem
    GROUP BY l_partkey
)
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN qty  ON t_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND p_size < 15
  AND l_quantity < threshold
"""


@query("q90_small_qty_revenue", oracle=_Q17_ORACLE)
def q90_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of the part's
    average quantity — a correlated scalar subquery, written directly in
    its decorrelated form (per-part avg agg, then equi-join + residual).

    At scale the per-part agg shuffles lineitem once on l_partkey, and
    its output is dim-sized (one row per part) so it broadcasts back
    into the fact scan; the brand/size filter prunes via the broadcast
    part dim before either.
    """
    li = read_table(
        spark, sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )
    part = (
        read_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
        .where((F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    qty = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(qty), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers (group-HAVING IN subquery)
# --------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@query("q91_large_volume_customers", oracle=_Q18_ORACLE)
def q91_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders whose total quantity
    exceeds a threshold.

    Key rewrite vs the literal SQL: the outer SUM(l_quantity) per order
    is byte-identical to the HAVING aggregate (orders/customer join 1:1
    per orderkey), so lineitem is scanned and shuffled ONCE — the
    HAVING-filtered agg itself joins to orders, no fact re-join.  LIMIT
    is deterministic: o_totalprice DESC tie-broken on o_orderkey.
    """
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .where(F.col("q") > F.lit(200).cast("decimal(18,2)"))
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    return (
        orders.join(big_orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("q").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q20 — suppliers with excess shipped volume of a part class
# --------------------------------------------------------------------------
# Adapted: no partsupp.ps_availqty, so the inner threshold is a fixed
# shipped-quantity floor over the pattern-matched parts in one year —
# the same nested semi-join chain (supplier ← lineitem-agg ← part).

_Q20_ORACLE = """
SELECT s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 50
)
ORDER BY s_name
"""


@query("q92_excess_suppliers", oracle=_Q20_ORACLE)
def q92_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers who shipped
    more than a volume floor of pattern-matched parts in one year.

    Inner IN becomes a broadcast semi-join of lineitem against the
    filtered part keys; the HAVING agg shuffles only the surviving rows
    on l_suppkey; the outer IN is a second (broadcast) semi-join into
    the supplier dim.  No row ever widens — pure pruning all the way.
    """
    red_parts = (
        read_table(spark, sf_dir, "part", columns=["p_partkey", "p_name"])
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = read_table(
        spark, sf_dir, "lineitem", columns=["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"]
    ).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy_suppliers = (
        li.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .where(F.col("q") > F.lit(50).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    supp = read_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    return (
        supp.join(F.broadcast(heavy_suppliers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_nationkey")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept multi-supplier orders waiting
# --------------------------------------------------------------------------
# Adapted: no commit/receipt dates, so "kept waiting" = this supplier's
# line was strictly the latest-shipping line in a finished order that
# involved at least one other supplier.  Same correlated
# EXISTS + NOT EXISTS pair over the same fact table; run as the SAME SQL
# text on both engines (Catalyst decorrelates both subqueries into one
# shuffled join group on l_orderkey).

_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@query("q93_waiting_suppliers", oracle=_Q21_SQL)
def q93_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS against the same
    fact table, counting per supplier.  Same SQL text on both engines;
    Spark rewrites the pair into left-semi + null-aware left-anti joins
    co-partitioned on l_orderkey, so all three lineitem legs share one
    exchange under AQE."""
    return sql(spark, sf_dir, _Q21_SQL)
