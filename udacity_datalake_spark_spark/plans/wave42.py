"""Wave 42: Tukey-fence outlier shares and standardized effect size
(Cohen's d / Hedges' g) — the last two everyday statistics: how
heavy-tailed each metric is, and how LARGE the A/B difference is once
significance (q234) stops being the question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q296_tukey_outliers",
    oracle="""
    WITH th AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n,
           round(min(q1), 6) AS q1,
           round(min(q3), 6) AS q3,
           CAST(sum(CASE WHEN e.value < q1 - 1.5 * (q3 - q1)
                           OR e.value > q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(sum(CASE WHEN e.value < q1 - 1.5 * (q3 - q1)
                            OR e.value > q3 + 1.5 * (q3 - q1)
                          THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
               AS outlier_share
    FROM events e JOIN th USING (event_type)
    GROUP BY e.event_type
    """,
)
def q296_tukey_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (boxplot) outlier share per event type: values beyond
    Q1−1.5·IQR or Q3+1.5·IQR — the tail-heaviness gauge that decides
    whether a metric needs q223's winsorization before averaging.

    Two passes: per-type quartiles (the q66 percentile ≡ quantile_cont
    pair) broadcast back, then exact conditional counts; the fence
    comparisons evaluate on IDENTICAL doubles in both engines, so
    membership can't flip."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "value"])
    th = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        e.join(F.broadcast(th), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("q1"), 6).alias("q1"),
            F.round(F.min("q3"), 6).alias("q3"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
            F.round(
                F.sum(F.when(is_out, 1).otherwise(0)) / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("outlier_share"),
        )
    )


@query(
    "q297_effect_size",
    oracle="""
    WITH v AS (
        SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
                    THEN 'A' ELSE 'B' END AS grp,
               CAST(value AS DECIMAL(18,2)) AS x
        FROM events WHERE event_type = 'purchase'
    ),
    s AS (
        SELECT
            CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
            CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
            CAST(sum(CASE WHEN grp = 'A' THEN x END) AS DOUBLE) AS sa,
            CAST(sum(CASE WHEN grp = 'B' THEN x END) AS DOUBLE) AS sb,
            CAST(sum(CASE WHEN grp = 'A' THEN x * x END) AS DOUBLE) AS sqa,
            CAST(sum(CASE WHEN grp = 'B' THEN x * x END) AS DOUBLE) AS sqb
        FROM v
    )
    SELECT na, nb,
           round((sb / nb - sa / na)
                 / sqrt(((na - 1.0) * ((na * sqa - sa * sa) / (na * (na - 1.0)))
                         + (nb - 1.0) * ((nb * sqb - sb * sb) / (nb * (nb - 1.0))))
                        / (na + nb - 2)), 6) AS cohens_d,
           round(((sb / nb - sa / na)
                  / sqrt(((na - 1.0) * ((na * sqa - sa * sa) / (na * (na - 1.0)))
                          + (nb - 1.0) * ((nb * sqb - sb * sb) / (nb * (nb - 1.0))))
                         / (na + nb - 2)))
                 * (1 - 3.0 / (4 * (na + nb) - 9)), 6) AS hedges_g
    FROM s
    """,
)
def q297_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect size of the A/B value difference: Cohen's d
    (mean gap over pooled SD) and its small-sample-corrected Hedges' g
    — the magnitude report that q234's t-statistic (which inflates with
    n) cannot provide.

    Same one-aggregate power-sum shape as q234; pooled variance and
    both effect sizes evaluate once in mirrored double expressions."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "value"])
    h = F.substring(F.md5(F.col("user_id").cast("string")), 1, 2)
    v = e.where(F.col("event_type") == "purchase").select(
        F.when(h < "80", "A").otherwise("B").alias("grp"), dec("value").alias("x")
    )
    ga, gb = F.col("grp") == "A", F.col("grp") == "B"
    s = v.agg(
        F.sum(F.when(ga, 1).otherwise(0)).alias("na"),
        F.sum(F.when(gb, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(ga, F.col("x"))).cast("double").alias("sa"),
        F.sum(F.when(gb, F.col("x"))).cast("double").alias("sb"),
        F.sum(F.when(ga, F.col("x") * F.col("x"))).cast("double").alias("sqa"),
        F.sum(F.when(gb, F.col("x") * F.col("x"))).cast("double").alias("sqb"),
    )
    na, nb = F.col("na"), F.col("nb")
    sa, sb, sqa, sqb = F.col("sa"), F.col("sb"), F.col("sqa"), F.col("sqb")
    var_a = (na * sqa - sa * sa) / (na * (na - F.lit(1.0)))
    var_b = (nb * sqb - sb * sb) / (nb * (nb - F.lit(1.0)))
    pooled_sd = F.sqrt(
        ((na - F.lit(1.0)) * var_a + (nb - F.lit(1.0)) * var_b) / (na + nb - 2)
    )
    d = (sb / nb - sa / na) / pooled_sd
    return s.select(
        "na",
        "nb",
        F.round(d, 6).alias("cohens_d"),
        F.round(d * (1 - F.lit(3.0) / (4 * (na + nb) - 9)), 6).alias("hedges_g"),
    )
