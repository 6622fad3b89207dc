"""Wave 59: ranking stability over time (day-over-day leaderboard
churn) and a histogram-based join-cardinality estimate checked against
the actual join — the optimizer-style diagnostic that predicts a join's
output size from bounded per-side sketches before running it.

Reference parity note: the reference (etl.py, /root/reference) has no
analytics surface; these extend the ranking (q13/q294) and
join-diagnostics (q159) families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

TOP_K = 10


@query(
    "q342_leaderboard_churn",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, user_id,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT d, user_id,
               row_number() OVER (
                   PARTITION BY d ORDER BY cents DESC, user_id) AS rn
        FROM daily
    ),
    tops AS (SELECT d, user_id FROM ranked WHERE rn <= {TOP_K}),
    days AS (SELECT DISTINCT d FROM tops),
    pairs AS (
        SELECT d1.d AS prev_d, d2.d AS cur_d
        FROM days d1 JOIN days d2 ON d2.d = d1.d + INTERVAL 1 DAY
    )
    SELECT p.cur_d AS day,
           CAST(count(t2.user_id) AS BIGINT) AS n_top,
           CAST(count(t1.user_id) AS BIGINT) AS n_retained,
           CAST({TOP_K} - count(t1.user_id) AS BIGINT) AS n_new
    FROM pairs p
    JOIN tops t2 ON t2.d = p.cur_d
    LEFT JOIN tops t1 ON t1.d = p.prev_d AND t1.user_id = t2.user_id
    GROUP BY p.cur_d
    ORDER BY day
    """,
)
def q342_leaderboard_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard stability: how much of each day's top-10 revenue
    ranking carries over from the previous day — the ranking-churn
    monitor (a stable metric with daily top-10 turnover near 100% is
    noise, not signal; q310's RBO is the depth-weighted variant of the
    same question).

    Scale shape: the fact collapses to (day, user) cents first; per-day
    rankings are day-keyed windows over bounded partitions; the
    retained-count join operates on the K·days top frame only."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "user_id", "ts", "value"])
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"), "user_id")
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("d").orderBy(F.col("cents").desc(), "user_id")
    )
    tops = daily.withColumn("rn", rn).where(F.col("rn") <= TOP_K).select("d", "user_id")
    days = tops.select("d").distinct()
    pairs = (
        days.alias("a")
        .join(
            days.alias("b"),
            F.col("b.d") == F.date_add(F.col("a.d"), 1),
        )
        .select(F.col("a.d").alias("prev_d"), F.col("b.d").alias("cur_d"))
    )
    t2 = tops.select(F.col("d").alias("cur_d"), "user_id")
    t1 = tops.select(F.col("d").alias("p_d"), F.col("user_id").alias("prev_user"))
    return (
        pairs.join(t2, "cur_d")
        .join(
            t1,
            (F.col("p_d") == F.col("prev_d"))
            & (F.col("prev_user") == F.col("user_id")),
            "left",
        )
        .groupBy("cur_d")
        .agg(
            F.count("user_id").cast("long").alias("n_top"),
            F.count("prev_user").cast("long").alias("n_retained"),
            (F.lit(TOP_K) - F.count("prev_user")).cast("long").alias("n_new"),
        )
        .orderBy("cur_d")
        .select(F.col("cur_d").alias("day"), "n_top", "n_retained", "n_new")
    )


#: Join-estimate histogram width: 64 md5-prefix buckets per side.
EST_BUCKETS = 64


@query(
    "q343_join_cardinality_estimate",
    oracle="""
    WITH lh AS (
        SELECT (ascii(substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1)) * 47
                + ascii(substring(md5(CAST(l_orderkey AS VARCHAR)), 2, 1))) % 64
                   AS b,
               count(*) AS n
        FROM lineitem GROUP BY 1
    ),
    oh AS (
        SELECT (ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) * 47
                + ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))) % 64
                   AS b,
               count(*) AS n
        FROM orders GROUP BY 1
    ),
    keys AS (
        SELECT (ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) * 47
                + ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))) % 64
                   AS b,
               count(*) AS nd
        FROM orders GROUP BY 1
    ),
    est AS (
        SELECT CAST(sum(CAST(lh.n AS HUGEINT) * oh.n / k.nd) AS BIGINT) AS est_rows
        FROM lh JOIN oh ON oh.b = lh.b JOIN keys k ON k.b = lh.b
    ),
    act AS (
        SELECT CAST(count(*) AS BIGINT) AS actual_rows
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT e.est_rows, a.actual_rows,
           round(CAST(e.est_rows AS DOUBLE) / a.actual_rows, 6) AS est_over_actual,
           TRUE AS within_2x
    FROM est e CROSS JOIN act a
    """,
)
def q343_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based join-cardinality estimation, checked against the
    real join: both sides collapse to 64-bucket key histograms (md5
    buckets — engine-independent), the classic estimate
    Σ_b n_left(b)·n_right(b)/d_right(b) predicts the output size, and
    the query verifies the estimate lands within 2× of the actual
    (oracle-pinned TRUE) — the sanity check behind every join-order
    decision, runnable on sketch tables WITHOUT executing the join at
    100 TB (the actual-join branch here exists to price the estimate).

    Scale shape: two bucket-grain aggregates (64 rows each) + the
    bounded estimate join; the verification join is the only
    fact-scale work and is dropped in sketch-only production use."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey"])
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey"])

    def bucket(col):
        m = F.md5(col.cast("string"))
        # 47 is odd/coprime with 64, so BOTH hex chars contribute to the
        # bucket (a*256 mod 64 would vanish, leaving 16 effective buckets)
        return (
            F.ascii(F.substring(m, 1, 1)) * 47 + F.ascii(F.substring(m, 2, 1))
        ) % EST_BUCKETS

    lh = li.groupBy(bucket(F.col("l_orderkey")).alias("b")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    oh = o.groupBy(bucket(F.col("o_orderkey")).alias("b")).agg(
        F.count(F.lit(1)).alias("no"),
        F.count(F.lit(1)).alias("nd"),  # o_orderkey is unique: nd == no
    )
    est = (
        lh.join(oh, "b")
        .agg(
            F.sum(
                F.col("nl").cast("decimal(38,0)") * F.col("no") / F.col("nd")
            )
            .cast("long")
            .alias("est_rows")
        )
    )
    act = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).cast("long").alias("actual_rows")
    )
    return est.crossJoin(F.broadcast(act)).select(
        "est_rows",
        "actual_rows",
        F.round(F.col("est_rows").cast("double") / F.col("actual_rows"), 6).alias(
            "est_over_actual"
        ),
        (
            (F.col("est_rows") <= 2 * F.col("actual_rows"))
            & (2 * F.col("est_rows") >= F.col("actual_rows"))
        ).alias("within_2x"),
    )
