"""Wave 37: ranker agreement (Kendall tau between two neighbor
orderings) and hash-uniformity auditing — do two scoring functions
actually disagree enough to A/B test, and is the bucketing hash fair
enough to trust for assignment and salting.
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
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q283_ranker_agreement",
    oracle=f"""
    WITH {COPURCHASE_RANKED_SQL},
    top AS (
        SELECT pk, neighbor, rank AS r_cos,
               row_number() OVER (PARTITION BY pk
                                  ORDER BY c_ij DESC, neighbor) AS r_cnt
        FROM ranked
    ),
    lists AS (SELECT pk, neighbor, r_cos, r_cnt FROM top WHERE r_cos <= 10),
    pairs AS (
        SELECT a.pk,
               CASE WHEN (a.r_cos - b.r_cos) * (a.r_cnt - b.r_cnt) > 0
                    THEN 1 ELSE 0 END AS concordant
        FROM lists a JOIN lists b
          ON a.pk = b.pk AND a.neighbor < b.neighbor
        WHERE a.r_cnt <> b.r_cnt
    ),
    per AS (
        SELECT pk, count(*) AS n_pairs,
               CAST(sum(concordant) AS BIGINT) AS n_conc
        FROM pairs GROUP BY pk
    )
    SELECT count(*) AS n_anchors,
           CAST(sum(n_pairs) AS BIGINT) AS total_pairs,
           CAST(sum(n_conc) AS BIGINT) AS concordant_pairs,
           round((2.0 * sum(n_conc) - sum(n_pairs))
                 / CAST(sum(n_pairs) AS DOUBLE), 6) AS kendall_tau
    FROM per
    """,
)
def q283_ranker_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau between two neighbor rankers — cosine (q229's
    normalized score) vs raw co-purchase count — over each anchor's
    top-10 list: τ near 1 means normalization changes nothing and an
    A/B test of the two rankers is pointless; low τ means popularity
    bias is doing real work.

    Reuses the shared co-purchase pipeline; both rank columns come from
    per-anchor windows, pair comparisons are bounded by list² per
    anchor (≤45 pairs), concordance is exact sign arithmetic on integer
    ranks, and τ = (2C − N)/N evaluates once."""
    top = copurchase_ranked(spark, sf_dir).select(
        "pk",
        "neighbor",
        F.col("rank").alias("r_cos"),
        F.row_number()
        .over(
            Window.partitionBy("pk").orderBy(F.col("c_ij").desc(), F.col("neighbor"))
        )
        .alias("r_cnt"),
    )
    # persisted: both sides of the pair self-join would otherwise replay
    # the whole co-purchase pipeline (the round-3 plan audit counted 20
    # planned exchanges); the cached frame is ≤10 rows per anchor
    lists = top.where(F.col("r_cos") <= 10).transform(spersist)
    a = lists.select("pk", F.col("neighbor").alias("na"), F.col("r_cos").alias("ca"), F.col("r_cnt").alias("ka"))
    b = lists.select("pk", F.col("neighbor").alias("nb"), F.col("r_cos").alias("cb"), F.col("r_cnt").alias("kb"))
    pairs = (
        a.join(b, "pk")
        .where((F.col("na") < F.col("nb")) & (F.col("ka") != F.col("kb")))
        .select(
            "pk",
            F.when(
                (F.col("ca") - F.col("cb")) * (F.col("ka") - F.col("kb")) > 0, 1
            )
            .otherwise(0)
            .alias("concordant"),
        )
    )
    per = pairs.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("concordant").alias("n_conc")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.sum("n_pairs").alias("total_pairs"),
        F.sum("n_conc").alias("concordant_pairs"),
        F.round(
            (F.lit(2.0) * F.sum("n_conc") - F.sum("n_pairs"))
            / F.sum("n_pairs").cast("double"),
            6,
        ).alias("kendall_tau"),
    )


@query(
    "q284_hash_uniformity",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    b AS (
        SELECT substring(md5(CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
               count(*) AS c
        FROM u GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS nb FROM b)
    SELECT nb AS n_buckets_hit, n AS n_users,
           round(CAST(sum(CAST(round((c - n / 256.0) * (c - n / 256.0), 6)
                               AS DECIMAL(28,6))) AS DOUBLE) / (n / 256.0)
                 + (256 - nb) * (n / 256.0), 6) AS chi_square,
           CAST(max(c) AS BIGINT) AS max_bucket,
           CAST(min(c) AS BIGINT) AS min_bucket
    FROM b CROSS JOIN tot
    GROUP BY nb, n
    """,
)
def q284_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-uniformity audit of the md5 bucketing every split, sample,
    and salt in this engine rides on: the 256-bucket chi-square of
    distinct users against uniform (unhit buckets contribute their full
    expected mass) plus the max/min bucket occupancy — q269's SRM
    guardrail generalized from 2 cells to the whole hash range.

    One distinct-user reduction, one 256-row (bounded) bucket frame;
    the χ² sum runs over that bounded frame with the expected count as
    a shared scalar — deterministic because every term derives from the
    same exact integers in a mirrored expression."""
    e = read_table(spark, sf_dir, "events", columns=["user_id"])
    u = e.select("user_id").distinct()
    b = u.select(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 2).alias("bucket")
    ).groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    tot = b.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("nb"))
    exp = F.col("n") / 256.0
    return (
        b.crossJoin(F.broadcast(tot))
        .groupBy("nb", "n")
        .agg(
            F.round(
                F.sum(
                    F.round((F.col("c") - exp) * (F.col("c") - exp), 6).cast(
                        "decimal(28,6)"
                    )
                ).cast("double")
                / exp
                + (256 - F.col("nb")) * exp,
                6,
            ).alias("chi_square"),
            F.max("c").alias("max_bucket"),
            F.min("c").alias("min_bucket"),
        )
        .select(
            F.col("nb").alias("n_buckets_hit"),
            F.col("n").alias("n_users"),
            "chi_square",
            "max_bucket",
            "min_bucket",
        )
    )
