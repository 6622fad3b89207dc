"""Wave 41: month-over-month top movers and DAU/MAU stickiness — the
last two dashboard staples: what changed most, and how habitual usage
is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.topk import ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q294_top_movers",
    oracle="""
    WITH tm AS (
        SELECT p_type, date_trunc('month', o_orderdate) AS month,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    d AS (
        SELECT p_type, month, rev,
               lag(rev) OVER (PARTITION BY p_type ORDER BY month) AS prev
        FROM tm
    ),
    moves AS (
        SELECT p_type, month,
               CAST(rev - prev AS DECIMAL(28,4)) AS delta
        FROM d WHERE prev IS NOT NULL
    ),
    ranked AS (
        SELECT p_type, month, delta,
               row_number() OVER (ORDER BY abs(delta) DESC, p_type, month) AS rn
        FROM moves
    )
    SELECT CAST(rn AS BIGINT) AS rn, p_type, month,
           round(CAST(delta AS DOUBLE), 4) AS mom_delta
    FROM ranked WHERE rn <= 15
    """,
)
def q294_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top movers: the 15 largest month-over-month revenue swings across
    (part type, month) cells — the "what changed" list every Monday
    metrics review starts from.

    Revenue deltas stay DECIMAL-exact through the per-type lag window
    (calendar-bounded per type); the global top-15 is ranked_topk with
    |delta| as the (exact decimal) sort key and (type, month) as the
    total-order tie-break."""
    li = read_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_extendedprice", "l_discount"],
    )
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    tm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.sum(rev).alias("rev"))
    )
    w = Window.partitionBy("p_type").orderBy("month")
    moves = (
        tm.withColumn("prev", F.lag("rev").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "p_type",
            "month",
            (F.col("rev") - F.col("prev")).cast("decimal(28,4)").alias("delta"),
        )
    )
    top = ranked_topk(
        moves, [F.abs(F.col("delta")).desc(), F.col("p_type"), F.col("month")], 15
    )
    return top.select(
        F.col("rn").cast("long").alias("rn"),
        "p_type",
        "month",
        F.round(F.col("delta").cast("double"), 4).alias("mom_delta"),
    )


@query(
    "q295_stickiness",
    oracle="""
    WITH dau AS (
        SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS d
        FROM events GROUP BY day
    ),
    mau AS (
        SELECT date_trunc('month', ts) AS month,
               count(DISTINCT user_id) AS m
        FROM events GROUP BY month
    ),
    davg AS (
        SELECT date_trunc('month', day) AS month,
               CAST(sum(d) AS BIGINT) AS d_sum, count(*) AS n_days
        FROM dau GROUP BY 1
    )
    SELECT davg.month,
           CAST(m AS BIGINT) AS mau,
           round(CAST(d_sum AS DOUBLE) / n_days, 6) AS avg_dau,
           round(CAST(d_sum AS DOUBLE) / n_days / m, 6) AS stickiness
    FROM davg JOIN mau ON davg.month = mau.month
    """,
)
def q295_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month: average daily distinct users over
    monthly distinct users — the engagement-habit ratio (1/30 = everyone
    shows up once; 1.0 = everyone comes every day).

    Two distinct-count aggregates at day and month grain (the only
    shuffles), joined at the calendar-bounded month frame; the ratio is
    exact counts with one double division chain mirrored in the
    oracle."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    dau = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("d")
    )
    mau = e.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").alias("m")
    )
    davg = dau.groupBy(F.date_trunc("month", "day").alias("month")).agg(
        F.sum("d").alias("d_sum"), F.count(F.lit(1)).alias("n_days")
    )
    avg_dau = F.col("d_sum").cast("double") / F.col("n_days")
    return davg.join(mau, "month").select(
        "month",
        F.col("m").alias("mau"),
        F.round(avg_dau, 6).alias("avg_dau"),
        F.round(avg_dau / F.col("m"), 6).alias("stickiness"),
    )
