"""Wave 24: experiment-design statistics (Wilson confidence intervals,
minimum detectable effect) and time-series structure detection
(Simpson's-paradox audit, CUSUM changepoint) — closing out the
statistics surface with the numbers that come BEFORE an experiment
(power) and the traps that come AFTER aggregation (confounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.functions.stats import wilson_bounds, wilson_sql
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

_Z95 = 1.959963984540054  # two-sided 95% normal quantile, fixed constant


@query(
    "q242_wilson_ci",
    oracle=f"""
    WITH s AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(converted) AS BIGINT) AS k
        FROM s
    )
    SELECT n, k,
           round(k / CAST(n AS DOUBLE), 6) AS p_hat,
           round({wilson_sql('k', 'n', '-')}, 6) AS wilson_lo,
           round({wilson_sql('k', 'n', '+')}, 6) AS wilson_hi
    FROM m
    """,
)
def q242_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Wilson score interval for the user conversion rate (share of
    users with ≥1 purchase) — the proportion CI that stays valid near 0
    and 1 where the naive normal interval breaks.

    One user-grain reduction (max-flag per user), one count aggregate,
    and the closed-form interval evaluated once in double from exact
    integer (n, k) with the z constant fixed — bit-identical across
    engines by expression mirroring."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type"])
    s = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    m = s.agg(F.count(F.lit(1)).alias("n"), F.sum("converted").alias("k"))
    n, k = F.col("n"), F.col("k")
    lo, hi = wilson_bounds(k, n)
    return m.select(
        "n",
        "k",
        F.round(k / n.cast("double"), 6).alias("p_hat"),
        F.round(lo, 6).alias("wilson_lo"),
        F.round(hi, 6).alias("wilson_hi"),
    )


@query(
    "q243_mde_power",
    oracle=f"""
    WITH v AS (
        SELECT CAST(value AS DECIMAL(18,2)) AS x
        FROM events WHERE event_type = 'purchase'
    ),
    s AS (
        SELECT count(*) AS n, CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(x * x) AS DOUBLE) AS sxx
        FROM v
    )
    SELECT n,
           round(sx / n, 6) AS mean_value,
           round(sqrt((n * sxx - sx * sx) / (n * (n - 1.0))), 6) AS stddev,
           round(({_Z95} + 0.8416212335729143)
                 * sqrt(2 * ((n * sxx - sx * sx) / (n * (n - 1.0))) / (n / 2.0)), 6)
               AS mde_absolute,
           round((({_Z95} + 0.8416212335729143)
                  * sqrt(2 * ((n * sxx - sx * sx) / (n * (n - 1.0))) / (n / 2.0)))
                 / (sx / n), 6) AS mde_relative
    FROM s
    """,
)
def q243_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect for an A/B test on per-purchase value:
    given the observed variance and a 50/50 split of the current sample
    (α = 0.05 two-sided, power = 0.80), the smallest absolute and
    relative lift the experiment could reliably detect — the
    experiment-DESIGN number q234's t-test assumes you already checked.

    Exact DECIMAL power sums; MDE = (z_α/2 + z_β)·√(2σ²/(n/2)) in one
    mirrored double expression (both z constants fixed literals)."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "value"])
    v = e.where(F.col("event_type") == "purchase").select(dec("value").alias("x"))
    s = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    var = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    z_sum = F.lit(_Z95) + F.lit(0.8416212335729143)  # z_0.975 + z_0.80
    mde = z_sum * F.sqrt(2 * var / (n / F.lit(2.0)))
    return s.select(
        "n",
        F.round(sx / n, 6).alias("mean_value"),
        F.round(F.sqrt(var), 6).alias("stddev"),
        F.round(mde, 6).alias("mde_absolute"),
        F.round(mde / (sx / n), 6).alias("mde_relative"),
    )


@query(
    "q244_simpson_audit",
    oracle="""
    WITH s AS (
        SELECT l_returnflag AS stratum, count(*) AS n,
               sum(CAST(l_discount AS DECIMAL(18,2))) AS sx,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sy,
               sum(CAST(l_discount AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(18,2))) AS sxx,
               sum(CAST(l_discount AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS sxy
        FROM lineitem GROUP BY l_returnflag
    ),
    strata AS (
        SELECT stratum, CAST(n AS BIGINT) AS n,
               round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS stratum_slope
        FROM s
    ),
    pooled AS (
        SELECT round((sum(n) * CAST(sum(sxy) AS DOUBLE)
                      - CAST(sum(sx) AS DOUBLE) * CAST(sum(sy) AS DOUBLE))
                     / (sum(n) * CAST(sum(sxx) AS DOUBLE)
                        - CAST(sum(sx) AS DOUBLE) * CAST(sum(sx) AS DOUBLE)), 6)
                   AS pooled_slope
        FROM s
    )
    SELECT stratum, n, stratum_slope, pooled_slope,
           CASE WHEN stratum_slope * pooled_slope < 0 THEN 1 ELSE 0 END
               AS sign_flip
    FROM strata CROSS JOIN pooled
    """,
)
def q244_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: OLS slope of quantity on discount per
    return-flag stratum vs the pooled slope, flagging sign flips — the
    aggregation trap where a relationship reverses once you condition
    on a confounder.

    One grouped aggregate produces every stratum's DECIMAL-exact power
    sums; the pooled sums are the SAME rows re-aggregated (algebraic
    merge, no second fact scan in the oracle and a broadcast single-row
    join in the plan); slopes evaluate once in double per row."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_discount", "l_quantity"])
    x, y = dec("l_discount"), dec("l_quantity")
    # power sums stay DECIMAL through BOTH aggregation levels — casting
    # per-stratum sums to double and re-summing would make the pooled
    # slope float-accumulation-order dependent
    s = li.groupBy(F.col("l_returnflag").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    ).transform(spersist)
    n = F.col("n")
    d = lambda c: c.cast("double")  # noqa: E731
    slope = (n * d(F.col("sxy")) - d(F.col("sx")) * d(F.col("sy"))) / (
        n * d(F.col("sxx")) - d(F.col("sx")) * d(F.col("sx"))
    )
    strata = s.select("stratum", "n", F.round(slope, 6).alias("stratum_slope"))
    pooled = s.agg(
        F.round(
            (F.sum("n") * d(F.sum("sxy")) - d(F.sum("sx")) * d(F.sum("sy")))
            / (F.sum("n") * d(F.sum("sxx")) - d(F.sum("sx")) * d(F.sum("sx"))),
            6,
        ).alias("pooled_slope")
    )
    return strata.crossJoin(F.broadcast(pooled)).select(
        "stratum",
        "n",
        "stratum_slope",
        "pooled_slope",
        F.when(F.col("stratum_slope") * F.col("pooled_slope") < 0, 1)
        .otherwise(0)
        .alias("sign_flip"),
    )


@query(
    "q245_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
        FROM events WHERE event_type = 'purchase' GROUP BY day
    ),
    tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c,
                   CAST(count(*) AS BIGINT) AS n_days FROM daily),
    cusum AS (
        SELECT day,
               CAST(sum(rev_c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) * n_days
               - total_c * CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                   AS dev_num
        FROM daily CROSS JOIN tot
    )
    SELECT day AS changepoint_day,
           CAST(abs(dev_num) AS BIGINT) AS abs_dev_num,
           round(CAST(abs(dev_num) AS DOUBLE)
                 / ((SELECT n_days FROM tot) * 100.0), 6) AS max_abs_cusum
    FROM cusum
    ORDER BY abs(dev_num) DESC, day
    LIMIT 1
    """,
)
def q245_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily purchase revenue: the day
    where the cumulative deviation from the overall daily mean peaks —
    the standard "when did the level shift" estimator (max |Σᵢ(xᵢ−x̄)|).

    Kept EXACT by clearing the mean's denominator: the deviation
    numerator n·Σprefix − total·i is pure int64 cents arithmetic over
    the day-bounded frame (q208's discipline), so the argmax is
    integer-deterministic; the single double appears only in the
    reported magnitude."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg((F.sum(dec("value")) * 100).cast("long").alias("rev_c"))
    )
    tot = daily.agg(
        F.sum("rev_c").alias("total_c"), F.count(F.lit(1)).alias("n_days")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wr = Window.orderBy("day")
    cusum = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n_days",
        (
            F.sum("rev_c").over(w) * F.col("n_days")
            - F.col("total_c") * F.row_number().over(wr).cast("long")
        ).alias("dev_num"),
    )
    return (
        cusum.orderBy(F.abs(F.col("dev_num")).desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.abs(F.col("dev_num")).alias("abs_dev_num"),
            F.round(
                F.abs(F.col("dev_num")).cast("double")
                / (F.col("n_days") * F.lit(100.0)),
                6,
            ).alias("max_abs_cusum"),
        )
    )
