"""Wave 33: assortment churn (revenue share of newly-introduced parts
per month) and supplier-concentration HHI trend — the marketplace-health
pair: is the catalog refreshing, and is supply consolidating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q273_catalog_churn",
    oracle="""
    WITH lm AS (
        SELECT l_partkey AS pk, date_trunc('month', o_orderdate) AS month,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    first_seen AS (SELECT pk, min(month) AS first_month FROM lm GROUP BY pk)
    SELECT month,
           count(*) AS n_parts,
           CAST(sum(CASE WHEN month = first_month THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new_parts,
           round(CAST(sum(CASE WHEN month = first_month THEN rev END)
                      AS DOUBLE), 2) AS new_part_revenue,
           round(CAST(coalesce(sum(CASE WHEN month = first_month THEN rev END), 0)
                      AS DOUBLE)
                 / CAST(sum(rev) AS DOUBLE), 6) AS new_revenue_share
    FROM lm JOIN first_seen USING (pk)
    GROUP BY month
    """,
)
def q273_catalog_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assortment churn: per month, how many of the parts sold are
    selling for the FIRST time and what share of revenue they carry —
    the merchandising view of catalog freshness (q165's new/returning
    accounting applied to items instead of users).

    The fact reduces once to (part, month) revenue; first-sale months
    are a part-dimension aggregate joined back at part grain; new/old
    classification is an exact month equality and revenue stays DECIMAL
    until the two rounded output doubles."""
    li = read_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_extendedprice", "l_discount"],
    )
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    lm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.sum(rev).alias("rev"))
    )
    first_seen = lm.groupBy("pk").agg(F.min("month").alias("first_month"))
    is_new = F.col("month") == F.col("first_month")
    return (
        lm.join(first_seen, "pk")
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.when(is_new, 1).otherwise(0)).alias("n_new_parts"),
            F.round(F.sum(F.when(is_new, F.col("rev"))).cast("double"), 2).alias(
                "new_part_revenue"
            ),
            F.round(
                F.coalesce(F.sum(F.when(is_new, F.col("rev"))), F.lit(0)).cast("double")
                / F.sum("rev").cast("double"),
                6,
            ).alias("new_revenue_share"),
        )
    )


@query(
    "q274_hhi_concentration",
    oracle="""
    WITH sm AS (
        SELECT date_trunc('month', o_orderdate) AS month, l_suppkey AS sk,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    )
    SELECT month,
           count(*) AS n_suppliers,
           round(CAST(sum(CAST(rev AS DECIMAL(24,4)) * CAST(rev AS DECIMAL(24,4)))
                      AS DOUBLE)
                 / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE))
                 * 10000, 6) AS hhi,
           round(CAST(max(rev) AS DOUBLE) / CAST(sum(rev) AS DOUBLE), 6)
               AS top_supplier_share
    FROM sm GROUP BY month
    """,
)
def q274_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration trend: monthly Herfindahl–Hirschman index
    (Σ share², ×10⁴ on the antitrust scale) and the top supplier's
    share — the marketplace-health series that flags quiet
    consolidation long before a single supplier dominates.

    HHI needs no per-supplier division: Σ(rᵢ/R)² = Σrᵢ²/R², so both
    numerator and denominator are DECIMAL-exact sums from one
    (month, supplier) aggregate and the index is one double per month
    row."""
    li = read_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    sm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.col("l_suppkey").alias("sk"),
        )
        .agg(F.sum(rev).alias("rev"))
    )
    # squares on DECIMAL(24,4): (38,4)x(38,4) would need width 76, which
    # DuckDB rejects outright and Spark clamps; width 24 also forces
    # DuckDB onto int128 storage (int64-backed width-18 products overflow
    # internally) — the (24,4) cast is EXACT
    # for per-(month,supplier) revenue (scale 4 preserved, no rounding)
    r = F.col("rev").cast("decimal(24,4)")
    return sm.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(
            F.sum(r * r).cast("double")
            / (F.sum(r).cast("double") * F.sum(r).cast("double"))
            * 10000,
            6,
        ).alias("hhi"),
        F.round(F.max(r).cast("double") / F.sum(r).cast("double"), 6).alias(
            "top_supplier_share"
        ),
    )
