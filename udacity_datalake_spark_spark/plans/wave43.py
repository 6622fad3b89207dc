"""Wave 43: basket-depth distribution, weekend revenue share, and the
single-row corpus health scorecard — the capstone that lands the
registry at an even 300 queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.text import content_fingerprint
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q298_basket_depth",
    oracle="""
    WITH per AS (
        SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM per)
    SELECT n_lines, count(*) AS n_orders_at_depth,
           round(count(*) / CAST(n_orders AS DOUBLE), 6) AS share
    FROM per CROSS JOIN tot
    GROUP BY n_lines, n_orders
    """,
)
def q298_basket_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-depth distribution: how many orders carry 1, 2, … line
    items — the order-shape histogram behind packaging, picking, and
    free-shipping-threshold decisions (the fact's natural fan-out,
    bounded at TPC-H's 7 lines).

    One orderkey aggregate, one ≤7-row histogram with exact shares."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey"])
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    tot = per.agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        per.crossJoin(F.broadcast(tot))
        .groupBy("n_lines", "n_orders")
        .agg(F.count(F.lit(1)).alias("n_orders_at_depth"))
        .select(
            "n_lines",
            "n_orders_at_depth",
            F.round(
                F.col("n_orders_at_depth") / F.col("n_orders").cast("double"), 6
            ).alias("share"),
        )
    )


@query(
    "q299_weekend_share",
    oracle="""
    WITH d AS (
        SELECT date_trunc('month', ts) AS month,
               CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS is_weekend,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE event_type = 'purchase'
    )
    SELECT month,
           round(CAST(coalesce(sum(CASE WHEN is_weekend = 1 THEN v END), 0)
                      AS DOUBLE), 2) AS weekend_revenue,
           round(CAST(sum(v) AS DOUBLE), 2) AS total_revenue,
           round(CAST(coalesce(sum(CASE WHEN is_weekend = 1 THEN v END), 0)
                      AS DOUBLE) / CAST(sum(v) AS DOUBLE), 6)
               AS weekend_share
    FROM d GROUP BY month
    """,
)
def q299_weekend_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend revenue share per month — the leisure-vs-workday mix
    trend (a drifting share signals an audience change long before
    totals move; the 1-D summary of q263's full heatmap).

    One month-grain aggregate, DECIMAL-exact revenue, ISO weekend test
    (Sat=6, Sun=7), one rounded ratio per month."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    is_we = (F.weekday("ts") + 1) >= 6
    d = e.where(F.col("event_type") == "purchase").select(
        F.date_trunc("month", "ts").alias("month"),
        F.when(is_we, dec("value")).alias("wv"),
        dec("value").alias("v"),
    )
    z = F.lit(0)
    return d.groupBy("month").agg(
        F.round(F.coalesce(F.sum("wv"), z).cast("double"), 2).alias("weekend_revenue"),
        F.round(F.sum("v").cast("double"), 2).alias("total_revenue"),
        F.round(
            F.coalesce(F.sum("wv"), z).cast("double") / F.sum("v").cast("double"), 6
        ).alias("weekend_share"),
    )


@query(
    "q300_corpus_scorecard",
    oracle="""
    WITH doc_stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_en,
               count(DISTINCT source) AS n_sources
        FROM documents
    ),
    dup AS (
        SELECT CAST(sum(c - 1) AS BIGINT) AS n_exact_dups
        FROM (SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f,
                     count(*) AS c
              FROM documents GROUP BY f) g
        WHERE c > 1
    )
    SELECT n_docs, n_tokens, n_sources,
           round(n_en / CAST(n_docs AS DOUBLE), 6) AS en_share,
           CAST(coalesce(n_exact_dups, 0) AS BIGINT) AS n_exact_dups,
           round(coalesce(n_exact_dups, 0) / CAST(n_docs AS DOUBLE), 6)
               AS dup_rate,
           round(n_tokens / CAST(n_docs AS DOUBLE), 6) AS avg_tokens_per_doc
    FROM doc_stats CROSS JOIN dup
    """,
)
def q300_corpus_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus health scorecard: size (docs, tokens,
    sources), language mix, exact-duplicate burden (q40's normalized
    fingerprint), and density — the numbers a dataset card leads with,
    and the registry's 300th query.

    Two independent reductions (per-doc stats aggregate + fingerprint-
    group dup count) cross-joined at one row each; every metric derives
    from exact integers with one rounded double per ratio."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    doc_stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.countDistinct("source").alias("n_sources"),
    )
    dup = (
        d.select(content_fingerprint("text").alias("f"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.sum(F.col("c") - 1).alias("n_exact_dups"))
    )
    z = F.lit(0)
    return doc_stats.crossJoin(F.broadcast(dup)).select(
        "n_docs",
        "n_tokens",
        "n_sources",
        F.round(F.col("n_en") / F.col("n_docs").cast("double"), 6).alias("en_share"),
        F.coalesce(F.col("n_exact_dups"), z).alias("n_exact_dups"),
        F.round(
            F.coalesce(F.col("n_exact_dups"), z) / F.col("n_docs").cast("double"), 6
        ).alias("dup_rate"),
        F.round(F.col("n_tokens") / F.col("n_docs").cast("double"), 6).alias(
            "avg_tokens_per_doc"
        ),
    )
