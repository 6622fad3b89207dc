"""Wave 31: order-statistic confidence intervals, survival half-life,
the sample-ratio-mismatch guardrail, and recommender catalog coverage —
four small, high-frequency reports rounding out the experimentation,
survival, and rec-sys families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave20 import (
    COPURCHASE_RANKED_SQL,
    copurchase_ranked,
)
from udacity_datalake_spark_spark.sources.readers import read_table

_Z95 = 1.959963984540054


@query(
    "q267_median_ci",
    oracle=f"""
    WITH cells AS (
        SELECT event_type, round(value, 1) AS v, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM cells
        GROUP BY event_type
    ),
    ks AS (
        SELECT event_type, n,
               (n + 1) // 2 AS k_med,
               greatest(1, CAST(floor((n - {_Z95} * sqrt(n)) / 2) AS BIGINT))
                   AS k_lo,
               least(n, CAST(ceil((n + {_Z95} * sqrt(n)) / 2 + 1) AS BIGINT))
                   AS k_hi
        FROM s
    ),
    cum AS (
        SELECT event_type, v,
               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
        FROM cells
    )
    SELECT cum.event_type, max(n) AS n,
           min(CASE WHEN cc >= k_med THEN v END) AS median,
           min(CASE WHEN cc >= k_lo THEN v END) AS ci_lo,
           min(CASE WHEN cc >= k_hi THEN v END) AS ci_hi
    FROM cum JOIN ks USING (event_type)
    GROUP BY cum.event_type
    """,
)
def q267_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median of
    event value per type via the binomial order-statistic bound: the
    interval between the ⌊(n−z√n)/2⌋-th and ⌈(n+z√n)/2+1⌉-th order
    statistics — no normality assumption, no resampling.

    q210's bounded-bin discipline: values collapse to 0.1-granularity
    cells, the cumulative count window is PARTITIONED per type, and
    each order statistic is the first bin whose cumulative count
    reaches the (closed-form, identically-computed) integer rank — so
    the endpoints are exact bin values, immune to interpolation
    drift."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "value"])
    cells = e.groupBy("event_type", F.round("value", 1).alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    s = cells.groupBy("event_type").agg(F.sum("c").alias("n"))
    z = F.lit(_Z95)
    nn = F.col("n")
    ks = s.select(
        "event_type",
        "n",
        F.expr("(n + 1) div 2").alias("k_med"),
        F.greatest(
            F.lit(1).cast("long"),
            F.floor((nn - z * F.sqrt(nn)) / 2).cast("long"),
        ).alias("k_lo"),
        F.least(
            nn, F.ceil((nn + z * F.sqrt(nn)) / 2 + 1).cast("long")
        ).alias("k_hi"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select("event_type", "v", F.sum("c").over(w).alias("cc"))
    return (
        cum.join(F.broadcast(ks), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.min(F.when(F.col("cc") >= F.col("k_med"), F.col("v"))).alias("median"),
            F.min(F.when(F.col("cc") >= F.col("k_lo"), F.col("v"))).alias("ci_lo"),
            F.min(F.when(F.col("cc") >= F.col("k_hi"), F.col("v"))).alias("ci_hi"),
        )
    )


@query(
    "q268_median_lifetime",
    oracle="""
    WITH lifespans AS (
        SELECT user_id,
               date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
                   AS lifespan_days
        FROM events GROUP BY user_id
    ),
    counts AS (
        SELECT lifespan_days, count(*) AS n FROM lifespans GROUP BY lifespan_days
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
    surv AS (
        SELECT lifespan_days,
               CAST(sum(n) OVER (ORDER BY lifespan_days DESC
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_surv
        FROM counts
    )
    SELECT CAST(max(total) AS BIGINT) AS n_users,
           CAST(min(CASE WHEN n_surv * 2 <= total
                         THEN lifespan_days END) AS BIGINT) AS median_lifetime_days,
           CAST(min(CASE WHEN n_surv * 4 <= total
                         THEN lifespan_days END) AS BIGINT) AS p75_lifetime_days
    FROM surv CROSS JOIN tot
    """,
)
def q268_median_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (and 75th-percentile) user lifetime off q208's survival
    curve: the smallest lifespan at which the surviving share drops to
    ≤ 1/2 (resp. ≤ 1/4) — the one-number retention summaries product
    teams quote.

    Same value-bounded survival frame as q208; the half-life test is
    an exact integer cross-multiplication (n_surv·2 ≤ total), so the
    reported day can't flip on a float share."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    lifespans = e.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias(
            "lifespan_days"
        )
    )
    counts = lifespans.groupBy("lifespan_days").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    w = Window.orderBy(F.col("lifespan_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = counts.select(
        "lifespan_days", F.sum("n").over(w).alias("n_surv")
    )
    return surv.crossJoin(F.broadcast(tot)).agg(
        F.max("total").alias("n_users"),
        F.min(
            F.when(F.col("n_surv") * 2 <= F.col("total"), F.col("lifespan_days"))
        ).alias("median_lifetime_days"),
        F.min(
            F.when(F.col("n_surv") * 4 <= F.col("total"), F.col("lifespan_days"))
        ).alias("p75_lifetime_days"),
    )


@query(
    "q269_srm_check",
    oracle="""
    WITH u AS (
        SELECT DISTINCT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
                    THEN 'A' ELSE 'B' END AS grp
        FROM events
    ),
    c AS (
        SELECT CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
               CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb
        FROM u
    )
    SELECT na, nb,
           round((na - nb * 1.0) * (na - nb) / (na + nb), 6) AS chi_square,
           CASE WHEN (na - nb) * (na - nb) * 10000
                     > 108353 * (na + nb) THEN 1 ELSE 0 END AS srm_alarm
    FROM c
    """,
)
def q269_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the md5 A/B assignment: the
    1-df chi-square of observed group sizes against the intended 50/50
    (here 128/256 vs 128/256 hex buckets), alarming at p < 0.001
    (χ² > 10.8353) — the first thing every experimentation platform
    checks, because a biased split invalidates q233/q234/q264 wholesale.

    One distinct-user reduction, one two-cell count; χ² in the equal-
    split closed form (na−nb)²/n, and the alarm is an exact integer
    cross-multiplication against the critical value ×10⁴."""
    e = read_table(spark, sf_dir, "events", columns=["user_id"])
    h = F.substring(F.md5(F.col("user_id").cast("string")), 1, 2)
    u = e.select("user_id").distinct().select(
        F.when(h < "80", "A").otherwise("B").alias("grp")
    )
    c = u.agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("nb"),
    )
    na, nb = F.col("na"), F.col("nb")
    return c.select(
        "na",
        "nb",
        F.round((na - nb * F.lit(1.0)) * (na - nb) / (na + nb), 6).alias("chi_square"),
        F.when((na - nb) * (na - nb) * 10000 > 108353 * (na + nb), 1)
        .otherwise(0)
        .alias("srm_alarm"),
    )


@query(
    "q270_rec_coverage",
    oracle=f"""
    WITH {COPURCHASE_RANKED_SQL},
    shown AS (
        SELECT neighbor FROM ranked WHERE rank <= 5
    ),
    np AS (SELECT count(*) AS n_parts FROM part)
    SELECT CAST(count(*) AS BIGINT) AS n_slots,
           CAST(count(DISTINCT neighbor) AS BIGINT) AS n_distinct_items,
           round(count(DISTINCT neighbor) / CAST(n_parts AS DOUBLE), 6)
               AS catalog_coverage,
           round(count(DISTINCT neighbor) / CAST(count(*) AS DOUBLE), 6)
               AS slot_diversity
    FROM shown CROSS JOIN np
    GROUP BY n_parts
    """,
)
def q270_rec_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog coverage and slot diversity of the q229 recommender:
    how much of the part catalog ever appears in a top-5 list, and how
    repetitive the lists are — the popularity-bias metrics that q265's
    NDCG alone hides (a recommender can rank accurately while showing
    everyone the same five bestsellers).

    Reuses the q229 pipeline to the ranked slots, then two tiny
    aggregates (distinct shown items, catalog total)."""
    shown = (
        copurchase_ranked(spark, sf_dir)
        .where(F.col("rank") <= 5)
        .select("neighbor")
    )
    np_ = read_table(spark, sf_dir, "part", columns=["p_partkey"]).agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    return (
        shown.crossJoin(F.broadcast(np_))
        .groupBy("n_parts")
        .agg(
            F.count(F.lit(1)).alias("n_slots"),
            F.countDistinct("neighbor").alias("n_distinct_items"),
            F.round(
                F.countDistinct("neighbor") / F.col("n_parts").cast("double"), 6
            ).alias("catalog_coverage"),
            F.round(
                F.countDistinct("neighbor") / F.count(F.lit(1)).cast("double"), 6
            ).alias("slot_diversity"),
        )
        .drop("n_parts")
    )
