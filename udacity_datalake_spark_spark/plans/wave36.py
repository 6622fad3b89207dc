"""Wave 36: supplier reliability ranking by confidence lower bound and
the dead-stock audit — closing the supply-side loop: who ships late
(with small-sample honesty) and what never sells at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.stats import wilson_bounds, wilson_sql
from udacity_datalake_spark_spark.operators.topk import ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table



@query(
    "q281_reliability_ranking",
    oracle=f"""
    WITH s AS (
        SELECT l_suppkey AS sk, count(*) AS n,
               CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                            CAST(l_shipdate AS DATE)) > 60
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey
    ),
    scored AS (
        SELECT sk, n, k,
               round({wilson_sql('k', 'n', '-')}, 6) AS late_rate_lo
        FROM s
    ),
    ranked AS (
        SELECT sk, n, k, late_rate_lo,
               row_number() OVER (ORDER BY late_rate_lo DESC, sk) AS rn
        FROM scored
    )
    SELECT sk AS suppkey, CAST(rn AS BIGINT) AS rn, n AS n_lines, k AS n_late,
           round(k / CAST(n AS DOUBLE), 6) AS late_rate, late_rate_lo
    FROM ranked WHERE rn <= 15
    """,
)
def q281_reliability_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-shipping suppliers ranked by the Wilson LOWER bound of
    their >60-day late-ship rate — the sort-by-confidence trick (used
    for review rankings) that keeps a supplier with 2 late lines out
    of 3 from "beating" one with 200 late lines out of 400.

    One orderkey join + supplier-grain exact counts; the Wilson lower
    bound evaluates once per supplier (q242's formula), ranking is
    ranked_topk over the supplier dimension with the ROUNDED score +
    suppkey as the total order (float ranking keys are only safe after
    rounding, the registry-wide rule)."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    s = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 60,
                    1,
                ).otherwise(0)
            ).alias("k"),
        )
    )
    n, k = F.col("n"), F.col("k")
    lo_raw, _hi = wilson_bounds(k, n)
    scored = s.withColumn("late_rate_lo", F.round(lo_raw, 6))
    top = ranked_topk(
        scored, [F.col("late_rate_lo").desc(), F.col("sk")], 15
    )
    return top.select(
        F.col("sk").alias("suppkey"),
        F.col("rn").cast("long").alias("rn"),
        F.col("n").alias("n_lines"),
        F.col("k").alias("n_late"),
        F.round(F.col("k") / F.col("n").cast("double"), 6).alias("late_rate"),
        "late_rate_lo",
    )


@query(
    "q282_dead_stock",
    oracle="""
    WITH sold AS (SELECT DISTINCT l_partkey AS pk FROM lineitem),
    dead AS (
        SELECT p_type, count(*) AS n_dead
        FROM part LEFT JOIN sold ON p_partkey = sold.pk
        WHERE sold.pk IS NULL
        GROUP BY p_type
    ),
    cat AS (SELECT p_type, count(*) AS n_parts FROM part GROUP BY p_type)
    SELECT cat.p_type, n_parts,
           CAST(coalesce(n_dead, 0) AS BIGINT) AS n_dead,
           round(coalesce(n_dead, 0) / CAST(n_parts AS DOUBLE), 6) AS dead_share
    FROM cat LEFT JOIN dead ON cat.p_type = dead.p_type
    """,
)
def q282_dead_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-stock audit: parts that never appear on any order line,
    counted per type — the assortment-pruning report (q273 tracks what
    is NEW; this tracks what never moved at all).

    The sold-part set reduces to distinct keys (part-dimension sized);
    dead parts are one anti-join of the part dimension against it, and
    the rollup is type-grain with exact counts."""
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    sold = (
        read_table(spark, sf_dir, "lineitem", columns=["l_partkey"])
        .select(F.col("l_partkey").alias("pk"))
        .distinct()
    )
    dead = (
        p.join(sold, p.p_partkey == sold.pk, "left_anti")
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n_dead"))
    )
    cat = p.groupBy("p_type").agg(F.count(F.lit(1)).alias("n_parts"))
    return cat.join(dead, "p_type", "left").select(
        "p_type",
        "n_parts",
        F.coalesce(F.col("n_dead"), F.lit(0)).alias("n_dead"),
        F.round(
            F.coalesce(F.col("n_dead"), F.lit(0)) / F.col("n_parts").cast("double"), 6
        ).alias("dead_share"),
    )
