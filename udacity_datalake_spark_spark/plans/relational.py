"""Core relational query surface: scans, projections, filters, distinct,
the full join family, and grouped aggregation.

These generalize the reference's operator inventory (SURVEY.md §2): P1-P5
projections/filters, A1 distinct, J1 inner equi-join, J2 OR-predicate left
join (via the decomposed rewrite in operators.joins), J3 left equi-join —
plus the join kinds the reference never used (semi/anti, multi-hop) that a
complete engine must expose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec, exact_avg, exact_sum
from udacity_datalake_spark_spark.operators.joins import left_join_or
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
                         * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6)))
                AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary over lineitem.

    The hot path the engine must get right at 100 TB: predicate pushed to
    the parquet scan, column pruning to 7 of 11 columns, partial (map-side)
    aggregation before one hash-partition exchange on a 6-value key.
    Money math is DECIMAL-exact (functions.numeric) so results are
    bit-stable under any partitioning.
    """
    l = read_table(spark, sf_dir, "lineitem")
    disc_price = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    charge = (disc_price * (F.lit(1) + dec("l_tax"))).cast("decimal(18,6)")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_quantity > 45
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P3: conjunctive range/comparison filter with a narrow projection —
    both must reach the parquet scan (PushedFilters + 5-column ReadSchema)."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


@query(
    "q03_project_rename",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name,
           c_acctbal AS account_balance, c_mktsegment AS segment
    FROM customer
    """,
)
def q03_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: aliasing projection (the reference's users/artists shape,
    reference etl.py:51-59,84-92)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_acctbal").alias("account_balance"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "q04_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def q04_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: full-row distinct — the reference's only aggregation
    (reference etl.py:42,58,91,169); partial+final hash aggregate."""
    return read_table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "q05_inner_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice, o.o_orderdate
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q05_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join, fact→dim on the dimension key (reference
    etl.py:140 joins fact→dim; same logical shape).  No broadcast hint:
    customer grows with SF, so strategy is left to Catalyst/AQE, which
    broadcasts the filtered side at runtime only when it actually fits."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice", "o_orderdate"
    )


@query(
    "q06_left_join_agg",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q06_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 analog: left outer equi-join preserving unmatched dimension rows,
    then grouped aggregation (count ignores nulls; sum of empty → NULL)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_spent"),
        )
    )


@query(
    "q07_or_join_decomposed",
    oracle="""
    SELECT c.c_custkey,
           count(s.s_suppkey) AS n_matches,
           min(s.s_suppkey) AS first_suppkey
    FROM customer c
    LEFT JOIN supplier s
      ON c.c_nationkey = s.s_nationkey OR c.c_acctbal = s.s_acctbal
    GROUP BY c.c_custkey
    """,
)
def q07_or_join_decomposed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: the reference's OR-predicate left join (etl.py:147-151), which
    Spark would execute as BroadcastNestedLoopJoin.  Implemented with the
    decomposed hash-join rewrite (operators.joins.left_join_or); the oracle
    runs the direct OR join — the correctness gate IS the equivalence
    proof SURVEY.md §4.3.2 calls for."""
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    joined = left_join_or(
        c,
        s,
        F.col("c_nationkey") == F.col("s_nationkey"),
        F.col("c_acctbal") == F.col("s_acctbal"),
    )
    return joined.groupBy("c_custkey").agg(
        F.count("s_suppkey").alias("n_matches"),
        F.min("s_suppkey").alias("first_suppkey"),
    )


@query(
    "q08_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): no right-side columns, no row multiplication."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q09_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P')
    """,
)
def q09_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no pending order."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q10_multi_hop_join",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def q10_multi_hop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped star join, built dims-first so the fact table is
    touched last: region('ASIA') ⋈ nation ⋈ customer collapses to a
    (c_custkey, n_name) map (nation/region broadcast — always tiny at any
    SF), that map reduces the date-filtered orders ~16× *before* the
    lineitem join, so the one unavoidable fact-side shuffle joins against
    the smallest possible build side.  No broadcast hint on customer or
    orders — at 100 TB neither fits; AQE converts to broadcast at runtime
    whenever the reduced side is actually small."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    o_red = o.join(dims, o.o_custkey == dims.c_custkey).select("o_orderkey", "n_name")
    revenue = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(o_red, l.l_orderkey == o_red.o_orderkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "q11_groupby_agg",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           count(DISTINCT c_nationkey) AS n_nations,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q11_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation family: count(*), count distinct, exact sum/avg,
    min/max — the surface the reference lacks entirely (SURVEY.md §2.4)."""
    c = read_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        exact_sum("c_acctbal").alias("sum_bal"),
        exact_avg("c_acctbal").alias("avg_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@query(
    "q12_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q12_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional aggregation): one output column per pivoted key.
    Values are listed explicitly — at scale an unlisted pivot costs an
    extra distinct-collect job over the fact table."""
    l = read_table(spark, sf_dir, "lineitem")
    pivoted = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")))
    )
    return pivoted.select(
        "l_returnflag",
        F.col("O").cast("double").alias("O"),
        F.col("F").cast("double").alias("F"),
    )
