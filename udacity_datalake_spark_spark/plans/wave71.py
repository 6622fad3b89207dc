"""Wave 71: censoring-aware survival analysis — the Kaplan-Meier risk
table with right-censoring (q208's survival curve assumes a closed
observation window; real retention data always has users still alive
at the data boundary).

Reference parity note: the reference (/root/reference/etl.py) has no
survival surface; extends q208 (uncensored lifespans) and q150/q165
(churn snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

#: users whose last event is within this many days of the table's
#: high-water mark are right-CENSORED (still alive, lifespan unknown)
CENSOR_HORIZON_DAYS = 14
#: tenure bucket width for the risk table
KM_BUCKET_DAYS = 7


@query(
    "q389_km_risk_table",
    oracle=f"""
    WITH hw AS (SELECT CAST(max(ts) AS DATE) AS hwm FROM events),
    lifespans AS (
        SELECT user_id,
               date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
                   AS span_days,
               date_diff('day', CAST(max(ts) AS DATE), hwm)
                   < {CENSOR_HORIZON_DAYS} AS censored
        FROM events CROSS JOIN hw
        GROUP BY user_id, hwm
    ),
    bucketed AS (
        SELECT span_days // {KM_BUCKET_DAYS} AS bucket,
               CASE WHEN censored THEN 0 ELSE 1 END AS event
        FROM lifespans
    ),
    per_bucket AS (
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS n_exits,
               CAST(sum(event) AS BIGINT) AS n_deaths,
               CAST(count(*) - sum(event) AS BIGINT) AS n_censored
        FROM bucketed GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(n_exits) AS BIGINT) AS n FROM per_bucket)
    SELECT CAST(b.bucket AS BIGINT) AS tenure_bucket,
           b.n_deaths, b.n_censored,
           -- at risk entering the bucket: everyone who has not exited
           -- in an earlier bucket
           CAST(t.n - COALESCE(sum(b2.n_exits), 0) AS BIGINT) AS n_at_risk,
           round(CAST(b.n_deaths AS DOUBLE)
                 / (t.n - COALESCE(sum(b2.n_exits), 0)), 6) AS hazard
    FROM per_bucket b
    CROSS JOIN tot t
    LEFT JOIN per_bucket b2 ON b2.bucket < b.bucket
    GROUP BY b.bucket, b.n_deaths, b.n_censored, t.n
    """,
)
def q389_km_risk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier risk table WITH right-censoring: users whose last
    event falls within {CENSOR_HORIZON_DAYS} days of the table's
    high-water mark are censored (still alive — their lifespan is a
    lower bound, not a death), and the per-tenure-bucket hazard is
    deaths / at-risk where the risk set shrinks by ALL earlier exits
    (deaths AND censorings).  q208's curve treats every lifespan as
    complete, which biases late-cohort churn upward; this is the
    estimator retention teams actually report.  Hazards stay exact
    rationals rounded once; the cumulative product (the KM curve
    itself) is left to the consumer so no cross-engine float product
    ordering enters the oracle.

    Scale shape: one user-grain aggregate; the risk-table arithmetic
    runs on the bounded tenure-bucket frame (the triangular join is
    bucket² on ≲100 buckets — at finer grain the prefix-sum window
    replaces it)."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    hw = e.agg(F.max(F.col("ts").cast("date")).alias("hwm"))
    lifespans = (
        e.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("first_d"),
            F.max(F.col("ts").cast("date")).alias("last_d"),
        )
        .crossJoin(F.broadcast(hw))
        .select(
            F.datediff("last_d", "first_d").alias("span_days"),
            (F.datediff("hwm", "last_d") < CENSOR_HORIZON_DAYS).alias("censored"),
        )
    )
    bucketed = lifespans.select(
        (F.col("span_days") / KM_BUCKET_DAYS).cast("long").alias("bucket"),
        F.when(F.col("censored"), 0).otherwise(1).alias("event"),
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_exits"),
        F.sum("event").cast("long").alias("n_deaths"),
        (F.count(F.lit(1)) - F.sum("event")).cast("long").alias("n_censored"),
    )
    tot = per_bucket.agg(F.sum("n_exits").cast("long").alias("n"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        per_bucket.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_at_risk",
            (F.col("n") - F.coalesce(F.sum("n_exits").over(w), F.lit(0))).cast(
                "long"
            ),
        )
    )
    return risk.select(
        F.col("bucket").cast("long").alias("tenure_bucket"),
        "n_deaths",
        "n_censored",
        "n_at_risk",
        F.round(F.col("n_deaths").cast("double") / F.col("n_at_risk"), 6).alias(
            "hazard"
        ),
    )
