"""Wave 38: seasonality-adjusted anomaly days, cohort payback period,
and the multiplicative KPI tree — the layered time-series/finance
reports that compose earlier primitives (weekday indices, cohort LTV
curves, exact revenue aggregates) into decision-grade artifacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave35 import COHORT_CELLS_SQL, cohort_cells
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q285_adjusted_anomalies",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
        FROM events WHERE event_type = 'purchase' GROUP BY day
    ),
    wd AS (
        SELECT isodow(day) AS dow, CAST(sum(rev_c) AS BIGINT) AS wd_sum,
               count(*) AS wd_n
        FROM daily GROUP BY 1
    ),
    adj AS (
        SELECT day, rev_c, wd_sum, wd_n,
               CAST(rev_c AS DOUBLE) * wd_n / wd_sum AS ratio
        FROM daily JOIN wd ON isodow(day) = wd.dow
    ),
    s AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(round(ratio, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sr,
               CAST(sum(CAST(round(ratio * ratio, 8) AS DECIMAL(28,8)))
                    AS DOUBLE) AS srr
        FROM adj
    )
    SELECT day, round(rev_c / 100.0, 2) AS revenue,
           round(ratio, 6) AS vs_weekday_avg,
           round((ratio - sr / n)
                 / sqrt((n * srr - sr * sr) / (n * (n - 1.0))), 6) AS z_score
    FROM adj CROSS JOIN s
    WHERE abs(ratio - sr / n)
          > 1.5 * sqrt((n * srr - sr * sr) / (n * (n - 1.0)))
    """,
)
def q285_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-ADJUSTED anomaly days: each day's revenue divided by
    its weekday's average (killing the weekly cycle q247 measures),
    then flagged when the adjusted ratio sits more than 1.5σ from its
    mean — the anomaly list that doesn't cry wolf every weekend.

    Weekday baselines are exact integer sums; each day's ratio rounds
    to DECIMAL(28,8) before the moment sums (q150), and the z-threshold
    compares the SAME mirrored double expressions on both sides so flag
    membership can't diverge."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg((F.sum(dec("value")) * 100).cast("long").alias("rev_c"))
    )
    dow = (F.weekday("day") + 1).alias("dow")
    wd = daily.groupBy(dow).agg(
        F.sum("rev_c").alias("wd_sum"), F.count(F.lit(1)).alias("wd_n")
    )
    adj = daily.join(
        F.broadcast(wd), (F.weekday("day") + 1) == F.col("dow")
    ).select(
        "day",
        "rev_c",
        (F.col("rev_c").cast("double") * F.col("wd_n") / F.col("wd_sum")).alias(
            "ratio"
        ),
    )
    s = adj.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("ratio", 8).cast("decimal(28,8)")).cast("double").alias("sr"),
        F.sum(F.round(F.col("ratio") * F.col("ratio"), 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("srr"),
    )
    n, sr, srr = F.col("n"), F.col("sr"), F.col("srr")
    sd = F.sqrt((n * srr - sr * sr) / (n * (n - F.lit(1.0))))
    return (
        adj.crossJoin(F.broadcast(s))
        .where(F.abs(F.col("ratio") - sr / n) > 1.5 * sd)
        .select(
            "day",
            F.round(F.col("rev_c") / F.lit(100.0), 2).alias("revenue"),
            F.round("ratio", 6).alias("vs_weekday_avg"),
            F.round((F.col("ratio") - sr / n) / sd, 6).alias("z_score"),
        )
    )


@query(
    "q286_payback_period",
    oracle=f"""
    WITH {COHORT_CELLS_SQL},
    cum AS (
        SELECT cell.cohort, age_months, cohort_users,
               CAST(sum(rev * 100) OVER (PARTITION BY cell.cohort
                                         ORDER BY age_months
                                         ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,0))
                   AS cum_c
        FROM cell JOIN sizes ON cell.cohort = sizes.cohort
    )
    SELECT cohort, CAST(max(cohort_users) AS BIGINT) AS cohort_users,
           CAST(min(CASE WHEN cum_c >= CAST(cohort_users AS DECIMAL(24,0))
                                       * 15000000 THEN age_months END)
                AS BIGINT) AS payback_age_months
    FROM cum GROUP BY cohort
    """,
)
def q286_payback_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort payback period against a fixed 150,000-per-customer
    acquisition cost: the first month of age at which each cohort's
    cumulative revenue covers CAC × cohort size — the single number
    finance reads off q279's LTV curves (NULL = not yet paid back).

    The break-even test is EXACT: cumulative revenue in integer cents
    (DECIMAL(38,0) prefix sums) against cohort_users · CAC-in-cents —
    no per-user division, no float LTV, so the reported month can't
    flip on rounding."""
    cell, sizes = cohort_cells(spark, sf_dir)
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cell.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "age_months",
        "cohort_users",
        F.sum((F.col("rev") * 100)).over(w).cast("decimal(38,0)").alias("cum_c"),
    )
    paid = F.col("cum_c") >= F.col("cohort_users").cast("decimal(24,0)") * 15000000
    return cum.groupBy("cohort").agg(
        F.max("cohort_users").alias("cohort_users"),
        F.min(F.when(paid, F.col("age_months"))).alias("payback_age_months"),
    )


@query(
    "q287_kpi_tree",
    oracle="""
    WITH base AS (
        SELECT date_trunc('month', o_orderdate) AS month, o_custkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS total
        FROM orders
    ),
    m AS (
        SELECT month,
               count(*) AS n_orders,
               count(DISTINCT o_custkey) AS n_active,
               sum(total) AS rev
        FROM base GROUP BY month
    ),
    pop AS (SELECT count(DISTINCT o_custkey) AS n_customers FROM base)
    SELECT month,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_orders AS BIGINT) AS n_orders,
           round(CAST(rev AS DOUBLE), 2) AS revenue,
           round(n_active / CAST(n_customers AS DOUBLE), 6) AS active_share,
           round(n_orders / CAST(n_active AS DOUBLE), 6) AS orders_per_active,
           round(CAST(rev AS DOUBLE) / n_orders, 6) AS avg_order_value,
           round(CAST(rev AS DOUBLE) / n_customers, 6) AS arpu
    FROM m CROSS JOIN pop
    """,
)
def q287_kpi_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative KPI tree per month: ARPU decomposed into
    active-share × orders-per-active × average order value (their
    product reconstructs ARPU exactly) — the metric tree every revenue
    review walks down to find WHICH factor moved.

    One month-grain aggregate (orders + distinct actives + DECIMAL
    revenue) against a broadcast customer-universe count; each factor
    is one rounded double from exact components."""
    o = read_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    base = o.select(
        F.date_trunc("month", "o_orderdate").alias("month"),
        "o_custkey",
        dec("o_totalprice").alias("total"),
    )
    m = base.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum("total").alias("rev"),
    )
    pop = base.agg(F.countDistinct("o_custkey").alias("n_customers"))
    return m.crossJoin(F.broadcast(pop)).select(
        "month",
        F.col("n_active"),
        F.col("n_orders"),
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(F.col("n_active") / F.col("n_customers").cast("double"), 6).alias(
            "active_share"
        ),
        F.round(F.col("n_orders") / F.col("n_active").cast("double"), 6).alias(
            "orders_per_active"
        ),
        F.round(F.col("rev").cast("double") / F.col("n_orders"), 6).alias(
            "avg_order_value"
        ),
        F.round(F.col("rev").cast("double") / F.col("n_customers"), 6).alias("arpu"),
    )
