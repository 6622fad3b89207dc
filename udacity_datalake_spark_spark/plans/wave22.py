"""Wave 22: forecasting backtest (seasonal-naive + error metrics),
fulfillment-latency SLA trend, and partial correlation — forecasting
evaluation and confounder-adjusted association, plus the ops-side
latency report the orders/lineitem pair supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q235_forecast_backtest",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(CAST(value AS DECIMAL(18,2))) AS rev
        FROM events WHERE event_type IN ('purchase', 'click', 'view')
        GROUP BY 1, 2
    ),
    j AS (
        SELECT a.event_type, a.rev AS actual_c, f.rev AS fcst_c,
               CAST(a.rev AS DOUBLE) AS actual, CAST(f.rev AS DOUBLE) AS fcst
        FROM daily a JOIN daily f
          ON a.event_type = f.event_type AND a.day = f.day + INTERVAL 7 DAY
    ),
    terms AS (
        SELECT event_type, actual_c, fcst_c,
               CAST(round(abs(actual - fcst) / actual, 6) AS DECIMAL(18,6))
                   AS ape,
               CAST(round(abs(actual - fcst) / ((actual + fcst) / 2), 6)
                    AS DECIMAL(18,6)) AS sape
        FROM j
    )
    SELECT event_type, count(*) AS n_days,
           round(CAST(sum(ape) AS DOUBLE) / count(*), 6) AS mape,
           round(CAST(sum(sape) AS DOUBLE) / count(*), 6) AS smape,
           round(CAST(sum(fcst_c) - sum(actual_c) AS DOUBLE)
                 / CAST(sum(actual_c) AS DOUBLE), 6) AS bias
    FROM terms GROUP BY event_type
    """,
)
def q235_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (same weekday last
    week) on daily revenue per event type: MAPE, sMAPE, and bias — the
    baseline every forecasting system must beat, with the error metrics
    a pipeline actually gates on.

    The fact reduces to (type, day) daily revenue once; forecast
    alignment is an equi-join on (type, day−7); each percentage-error
    term rounds to DECIMAL(18,6) BEFORE the per-type average, and bias
    divides DECIMAL-exact revenue sums once (q150's round-then-
    exact-sum — a double Σ of ratios or of inexact cent-doubles is
    partition-order dependent)."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    daily = (
        e.where(F.col("event_type").isin("purchase", "click", "view"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(dec("value")).alias("rev"))
    )
    a = daily.select(
        "event_type", "day", F.col("rev").alias("actual_c"),
        F.col("rev").cast("double").alias("actual"),
    )
    f = daily.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("rev").alias("fcst_c"),
        F.col("rev").cast("double").alias("fcst"),
    )
    j = a.join(f, ["event_type", "day"])
    ape = F.round(F.abs(F.col("actual") - F.col("fcst")) / F.col("actual"), 6).cast(
        "decimal(18,6)"
    )
    sape = F.round(
        F.abs(F.col("actual") - F.col("fcst"))
        / ((F.col("actual") + F.col("fcst")) / 2),
        6,
    ).cast("decimal(18,6)")
    return (
        j.select(
            "event_type", "actual_c", "fcst_c", ape.alias("ape"), sape.alias("sape")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.sum("ape").cast("double") / F.count(F.lit(1)), 6).alias("mape"),
            F.round(F.sum("sape").cast("double") / F.count(F.lit(1)), 6).alias("smape"),
            F.round(
                (F.sum("fcst_c") - F.sum("actual_c")).cast("double")
                / F.sum("actual_c").cast("double"),
                6,
            ).alias("bias"),
        )
    )


@query(
    "q236_ship_latency_trend",
    oracle="""
    WITH lat AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT month, count(*) AS n_lines,
           round(quantile_cont(days, 0.50), 6) AS p50_days,
           round(quantile_cont(days, 0.90), 6) AS p90_days,
           round(sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS on_time_30d_share
    FROM lat GROUP BY month
    """,
)
def q236_ship_latency_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly fulfillment-latency SLA trend: p50/p90 days from order to
    line shipment plus the ≤30-day on-time share — the operations
    dashboard for "are we getting slower".

    One orderkey join (the fact's natural key), one month-grain
    aggregate; percentiles are the q66-proven percentile ≡ quantile_cont
    pair over integer day counts, and the on-time share is exact
    integer counts with one rounded double."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("days"),
    )
    return lat.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.percentile("days", F.lit(0.50)), 6).alias("p50_days"),
        F.round(F.percentile("days", F.lit(0.90)), 6).alias("p90_days"),
        F.round(
            F.sum(F.when(F.col("days") <= 30, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("on_time_30d_share"),
    )


@query(
    "q237_partial_correlation",
    oracle="""
    WITH s AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sdd,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sqd,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sdp
        FROM lineitem
    ),
    r AS (
        SELECT n,
               (n * sqp - sq * sp) / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))
                   AS r_qp,
               (n * sqd - sq * sd) / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd))
                   AS r_qd,
               (n * sdp - sd * sp) / sqrt((n * sdd - sd * sd) * (n * spp - sp * sp))
                   AS r_dp
        FROM s
    )
    SELECT n,
           round(r_qp, 6) AS corr_qty_price,
           round(r_qd, 6) AS corr_qty_disc,
           round(r_dp, 6) AS corr_disc_price,
           round((r_qp - r_qd * r_dp)
                 / sqrt((1 - r_qd * r_qd) * (1 - r_dp * r_dp)), 6)
               AS partial_corr_qty_price
    FROM r
    """,
)
def q237_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of quantity and extended price CONTROLLING
    for discount — the confounder-adjusted association (raw corr can be
    an artifact of both variables tracking the discount policy).

    q128/q219's discipline one step further: nine DECIMAL-exact power
    sums in one aggregate, three Pearson correlations and the
    first-order partial-correlation formula evaluated once in double,
    expression tree mirrored in the oracle."""
    li = read_table(
        spark, sf_dir, "lineitem", columns=["l_quantity", "l_discount", "l_extendedprice"]
    )
    q, d, p = dec("l_quantity"), dec("l_discount"), dec("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(d).cast("double").alias("sd"),
        F.sum(p).cast("double").alias("sp"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(d * d).cast("double").alias("sdd"),
        F.sum(p * p).cast("double").alias("spp"),
        F.sum(q * d).cast("double").alias("sqd"),
        F.sum(q * p).cast("double").alias("sqp"),
        F.sum(d * p).cast("double").alias("sdp"),
    )
    n = F.col("n")
    sq, sd, sp = F.col("sq"), F.col("sd"), F.col("sp")
    sqq, sdd, spp = F.col("sqq"), F.col("sdd"), F.col("spp")
    sqd, sqp, sdp = F.col("sqd"), F.col("sqp"), F.col("sdp")
    r_qp = (n * sqp - sq * sp) / F.sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))
    r_qd = (n * sqd - sq * sd) / F.sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd))
    r_dp = (n * sdp - sd * sp) / F.sqrt((n * sdd - sd * sd) * (n * spp - sp * sp))
    return s.select(
        "n",
        F.round(r_qp, 6).alias("corr_qty_price"),
        F.round(r_qd, 6).alias("corr_qty_disc"),
        F.round(r_dp, 6).alias("corr_disc_price"),
        F.round(
            (r_qp - r_qd * r_dp) / F.sqrt((1 - r_qd * r_qd) * (1 - r_dp * r_dp)), 6
        ).alias("partial_corr_qty_price"),
    )
