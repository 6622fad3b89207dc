"""Fourth analytics wave: rolling distinct actives, robust dispersion
(MAD), and first-order transition matrices.

- Rolling 7-day active users is the standard scalable rewrite of a
  sliding COUNT(DISTINCT): reduce to distinct (user, day), explode each
  activity day to the ≤7 window-days it contributes to, and count
  distinct per window day — the shuffle carries (user, day) pairs, never
  events, and no day ever needs the full user set in one task beyond its
  own distinct count.
- MAD (median absolute deviation) composes two exact medians; both
  aggregate per key with map-side reduction, and the broadcast of the
  per-key medians back onto the values is dimension-sized.
- The transition matrix is one lag() per user timeline plus a count —
  the Markov-chain summary of event flows, single hash exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q145_rolling_active_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    contrib AS (
        SELECT user_id, d + CAST(x AS INTEGER) AS window_day
        FROM ud, (SELECT unnest(range(0, 7)) AS x)
    ),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT window_day, count(DISTINCT user_id) AS mau_7d
    FROM contrib
    WHERE window_day IN (SELECT d FROM days)
    GROUP BY window_day
    """,
)
def q145_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct active users per (observed) day — the
    sliding COUNT(DISTINCT) no window frame can express.

    Rewrite: reduce events to distinct (user, day); each pair contributes
    to the 7 window-days it falls inside (generate + explode, codegen
    side); count distinct per window day, keeping only days that exist in
    the data.  The exchange carries user-day pairs ×7 — independent of
    raw event volume — and the per-day distinct is an ordinary
    two-phase aggregate.  (A bitmap/HLL variant — q96 — replaces the
    exact distinct when user cardinality per day outgrows a task.)
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    contrib = ud.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("x"), "d"
    ).select("user_id", F.date_add(F.col("d"), F.col("x")).alias("window_day"))
    days = ud.select("d").distinct()
    return (
        contrib.join(days, contrib["window_day"] == days["d"], "left_semi")
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("mau_7d"))
    )


@query(
    "q146_mad_robust_stats",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med_v
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(any_value(m.med_v), 6) AS median_value,
           round(quantile_cont(abs(e.value - m.med_v), 0.5), 6) AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
)
def q146_mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust dispersion
    measure an outlier-trimming stage prefers over stddev (one wild value
    moves stddev, not MAD).

    Two exact interpolating medians composed: per-key medians broadcast
    back onto the values (dimension-sized join), then the median of
    absolute deviations.  Both aggregates reduce map-side per key; the
    interpolating `percentile` matches DuckDB's ``quantile_cont`` exactly
    (q66 established the equivalence).
    """
    e = read_table(spark, sf_dir, "events", columns=["event_type", "value"])
    med = e.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med_v"))
    return (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med_v"), 6).alias("median_value"),
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med_v")), F.lit(0.5)), 6
            ).alias("mad"),
        )
    )


@query(
    "q147_transition_matrix",
    oracle="""
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q147_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event transition matrix (Markov counts): how often
    each event type follows each other type within a user's timeline —
    the input to funnel discovery and next-action models.

    One lag() over the user timeline (single hash exchange) and a
    25-group count; the transition pair is derived in the window stage,
    so no self-join on adjacent rows.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("event_type", F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q150_decayed_ltv",
    oracle="""
    WITH mx AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
    terms AS (
        SELECT user_id,
               CAST(round(value * pow(0.95, date_diff('day', CAST(ts AS DATE), ref_day)), 9)
                    AS DECIMAL(18,9)) AS term
        FROM events CROSS JOIN mx
        WHERE event_type = 'purchase'
    )
    SELECT user_id, CAST(round(CAST(sum(term) AS DOUBLE), 6) AS DOUBLE) AS ltv
    FROM terms GROUP BY user_id
    """,
)
def q150_decayed_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed lifetime value per user (half-life ≈ 13.5
    days at 0.95/day): each purchase contributes value·0.95^age relative
    to the corpus's latest day — the recency-weighted score a growth or
    curriculum-sampling stage ranks users by.

    The reference day is a single-row broadcast (no window needed); each
    row's decay term is one pow() evaluated map-side, rounded to
    DECIMAL(18,9) BEFORE the per-user sum so the aggregate is exact and
    order-independent — float pow feeds decimal sum, never float sum.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "value"])
    mx = e.agg(F.max(F.to_date("ts")).alias("ref_day"))
    term = F.round(
        F.col("value")
        * F.pow(F.lit(0.95), F.datediff(F.col("ref_day"), F.to_date("ts"))),
        9,
    ).cast("decimal(18,9)")
    return (
        e.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mx))
        .select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg(F.round(F.sum("term").cast("double"), 6).alias("ltv"))
    )
