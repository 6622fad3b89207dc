"""Wave 34: merchandise returns analysis (per-type rate with Wilson
CIs), price-integrity audit (unit-price dispersion per part),
duplicate-transaction detection, and customer value-segment migration —
four retail/fintech audit families on the order book.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.functions.stats import wilson_bounds, wilson_sql
from udacity_datalake_spark_spark.operators.topk import global_ntile, ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


#: Exact integer-cent realized unit price (price·100·100 div qty·100) —
#: the quantization q276 audits and q288's elasticity regresses on.
#: Spark and DuckDB spellings kept together so they can't drift.
UNIT_PRICE_CENTS_EXPR = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 100 "
    "div CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"
)
UNIT_PRICE_CENTS_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 100 "
    "// CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"
)


@query(
    "q275_return_rate_ci",
    oracle=f"""
    WITH c AS (
        SELECT p_type, count(*) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
    )
    SELECT p_type, n, k,
           round(k / CAST(n AS DOUBLE), 6) AS return_rate,
           round({wilson_sql('k', 'n', '-')}, 6) AS wilson_lo,
           round({wilson_sql('k', 'n', '+')}, 6) AS wilson_hi
    FROM c
    """,
)
def q275_return_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate per part type with 95% Wilson intervals — the
    merchandising quality report that says which categories get sent
    back, with uncertainty honest enough to compare a small category
    against a big one (q242's interval machinery applied per group).

    One broadcast dim join + grouped exact counts; the Wilson closed
    form evaluates once per type row, mirrored verbatim."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_returnflag"])
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    c = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("k"),
        )
    )
    n, k = F.col("n"), F.col("k")
    lo, hi = wilson_bounds(k, n)
    return c.select(
        "p_type",
        "n",
        "k",
        F.round(k / n.cast("double"), 6).alias("return_rate"),
        F.round(lo, 6).alias("wilson_lo"),
        F.round(hi, 6).alias("wilson_hi"),
    )


@query(
    "q276_price_dispersion",
    oracle=f"""
    WITH unit AS (
        SELECT l_partkey AS pk, {UNIT_PRICE_CENTS_SQL} AS up_c
        FROM lineitem
    ),
    s AS (
        SELECT pk, count(*) AS n_lines,
               CAST(min(up_c) AS BIGINT) AS min_c,
               CAST(max(up_c) AS BIGINT) AS max_c
        FROM unit GROUP BY pk HAVING count(*) >= 5
    ),
    ranked AS (
        SELECT pk, n_lines, min_c, max_c,
               row_number() OVER (
                   ORDER BY CAST(max_c AS DOUBLE) / min_c DESC, pk) AS rn
        FROM s
    )
    SELECT pk, CAST(rn AS BIGINT) AS rn, n_lines,
           round(min_c / 100.0, 2) AS min_unit_price,
           round(max_c / 100.0, 2) AS max_unit_price,
           round(CAST(max_c AS DOUBLE) / min_c, 6) AS dispersion_ratio
    FROM ranked WHERE rn <= 20
    """,
)
def q276_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-integrity audit: the 20 parts (≥5 lines) whose realized
    unit price varies the most across order lines (max/min ratio) —
    the pricing-error / discount-abuse detector.

    Unit prices are computed in integer cents (price·100·100 div
    qty·100 — one exact integer division per line, no float units);
    per-part min/max are exact ints, the ratio is one double, and the
    global top-20 is ranked_topk over the part-dimension frame with
    (ratio, pk) total order."""
    li = read_table(
        spark, sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_quantity"]
    )
    up_c = F.expr(UNIT_PRICE_CENTS_EXPR)
    s = (
        li.select(F.col("l_partkey").alias("pk"), up_c.alias("up_c"))
        .groupBy("pk")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min("up_c").alias("min_c"),
            F.max("up_c").alias("max_c"),
        )
        .where(F.col("n_lines") >= 5)
    )
    ratio = F.col("max_c").cast("double") / F.col("min_c")
    top = ranked_topk(
        s.withColumn("__r", ratio), [F.col("__r").desc(), F.col("pk")], 20
    )
    return top.select(
        "pk",
        F.col("rn").cast("long").alias("rn"),
        "n_lines",
        F.round(F.col("min_c") / F.lit(100.0), 2).alias("min_unit_price"),
        F.round(F.col("max_c") / F.lit(100.0), 2).alias("max_unit_price"),
        F.round(ratio, 6).alias("dispersion_ratio"),
    )


@query(
    "q277_duplicate_orders",
    oracle="""
    WITH d AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
               CAST(o_totalprice AS DECIMAL(18,2)) AS total,
               count(*) AS n_orders
        FROM orders
        GROUP BY 1, 2, 3
        HAVING count(*) > 1
    )
    SELECT o_custkey AS custkey, day,
           round(CAST(total AS DOUBLE), 2) AS total_price,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM d
    """,
)
def q277_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suspected duplicate transactions: the same customer placing
    multiple orders on the same day for the EXACT same total — the
    double-charge / double-submit audit every order pipeline runs
    nightly.

    One exact-grain aggregate (customer, day, DECIMAL total) with a
    HAVING filter — the fingerprint-dedup shape (q40) applied to the
    order book with a business key instead of a content hash."""
    o = read_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    return (
        o.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.to_date("o_orderdate").alias("day"),
            dec("o_totalprice").alias("__total"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") > 1)
        .select(
            "custkey",
            "day",
            F.round(F.col("__total").cast("double"), 2).alias("total_price"),
            "n_orders",
        )
    )


@query(
    "q278_segment_migration",
    oracle="""
    WITH y1 AS (
        SELECT o_custkey AS ck, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1
    ),
    y2 AS (
        SELECT o_custkey AS ck, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    ),
    s1 AS (SELECT ck, ntile(3) OVER (ORDER BY v DESC, ck) AS seg FROM y1),
    s2 AS (SELECT ck, ntile(3) OVER (ORDER BY v DESC, ck) AS seg FROM y2),
    j AS (
        SELECT coalesce(s1.seg, 0) AS seg_1995, coalesce(s2.seg, 0) AS seg_1996
        FROM s1 FULL JOIN s2 USING (ck)
    )
    SELECT seg_1995, seg_1996, count(*) AS n_customers
    FROM j GROUP BY 1, 2
    """,
)
def q278_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment migration matrix: spend terciles in 1995
    vs 1996 (segment 0 = not active that year) — the retention view
    that separates "we lost high-value customers" from "customers
    downgraded" (q207's RFM snapshot made longitudinal).

    Each year's terciles come from global_ntile over the active-
    customer frame (two-phase, customer dimension grows with SF); the
    migration matrix is a full outer join of two segment maps with
    inactive coded 0, then one ≤16-cell aggregate."""
    o = read_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def seg_year(y1: str, y2: str, out: str) -> DataFrame:
        v = (
            o.where(
                (F.col("o_orderdate") >= F.lit(y1).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y2).cast("timestamp"))
            )
            .groupBy(F.col("o_custkey").alias("ck"))
            .agg(F.sum(dec("o_totalprice")).alias("v"))
        )
        keyed = v.withColumn("__vd", F.col("v").cast("double"))
        return global_ntile(
            keyed, [F.col("v").desc(), F.col("ck")], "__vd", 3,
            out_col=out, descending=True,
        ).select("ck", out)

    s1 = seg_year("1995-01-01", "1996-01-01", "seg_1995")
    s2 = seg_year("1996-01-01", "1997-01-01", "seg_1996")
    j = s1.join(s2, "ck", "full_outer").select(
        F.coalesce(F.col("seg_1995"), F.lit(0)).alias("seg_1995"),
        F.coalesce(F.col("seg_1996"), F.lit(0)).alias("seg_1996"),
    )
    return j.groupBy("seg_1995", "seg_1996").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
