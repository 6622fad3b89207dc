"""Wave 30: causal estimation (difference-in-differences), IR ranking
evaluation (NDCG@5 / MRR over the co-purchase recommender), and the
dedup threshold-sensitivity curve — the tuning artifact that says what a
Jaccard cutoff actually costs before you commit the corpus to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.dedup import ngram_jaccard_pairs
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave20 import (
    COPURCHASE_RANKED_SQL,
    copurchase_ranked,
)
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q264_did_estimator",
    oracle="""
    WITH mid AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us FROM events
    ),
    v AS (
        SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
                    THEN 'A' ELSE 'B' END AS grp,
               CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 2 END AS period,
               CAST(value AS DECIMAL(18,2)) AS x
        FROM events CROSS JOIN mid WHERE event_type = 'purchase'
    ),
    s AS (
        SELECT grp, period, count(*) AS n,
               sum(x) AS sx, sum(x * x) AS sxx
        FROM v GROUP BY grp, period
    ),
    w AS (
        SELECT
            max(CASE WHEN grp = 'A' AND period = 1
                     THEN CAST(sx AS DOUBLE) / n END) AS ma1,
            max(CASE WHEN grp = 'A' AND period = 2
                     THEN CAST(sx AS DOUBLE) / n END) AS ma2,
            max(CASE WHEN grp = 'B' AND period = 1
                     THEN CAST(sx AS DOUBLE) / n END) AS mb1,
            max(CASE WHEN grp = 'B' AND period = 2
                     THEN CAST(sx AS DOUBLE) / n END) AS mb2,
            CAST(sum(CAST(round((n * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * sx)
                                / (n * (n - 1.0)) / n, 10)
                          AS DECIMAL(28,10))) AS DOUBLE) AS var_sum
        FROM s
    )
    SELECT round(ma1, 6) AS mean_a_pre, round(ma2, 6) AS mean_a_post,
           round(mb1, 6) AS mean_b_pre, round(mb2, 6) AS mean_b_post,
           round((mb2 - mb1) - (ma2 - ma1), 6) AS did_estimate,
           round(sqrt(var_sum), 6) AS std_error,
           round(((mb2 - mb1) - (ma2 - ma1)) / sqrt(var_sum), 6) AS t_stat
    FROM w
    """,
)
def q264_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on per-purchase value: group B's
    pre→post change minus group A's (md5 user split × exact time-window
    midpoint), with the four-cell standard error — the causal estimator
    that subtracts out the common time trend q234's plain t-test can't.

    One aggregate produces all four (group, period) cells' exact
    DECIMAL power sums; each cell's variance-of-mean term rounds to
    DECIMAL(28,10) before the 4-row exact sum (q150's discipline even
    at four rows); DiD, SE, and t are mirrored closed forms."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "value"])
    mid = e.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    h = F.substring(F.md5(F.col("user_id").cast("string")), 1, 2)
    v = (
        e.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mid))
        .select(
            F.when(h < "80", "A").otherwise("B").alias("grp"),
            F.when(F.unix_micros("ts") < F.col("mid_us"), 1).otherwise(2).alias(
                "period"
            ),
            dec("value").alias("x"),
        )
    )
    s = v.groupBy("grp", "period").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    cell = lambda g, p: F.max(  # noqa: E731
        F.when((F.col("grp") == g) & (F.col("period") == p), d(F.col("sx")) / F.col("n"))
    )
    var_term = F.round(
        (F.col("n") * d(F.col("sxx")) - d(F.col("sx")) * F.col("sx"))
        / (F.col("n") * (F.col("n") - F.lit(1.0)))
        / F.col("n"),
        10,
    ).cast("decimal(28,10)")
    w = s.agg(
        cell("A", 1).alias("ma1"),
        cell("A", 2).alias("ma2"),
        cell("B", 1).alias("mb1"),
        cell("B", 2).alias("mb2"),
        F.sum(var_term).cast("double").alias("var_sum"),
    )
    did = (F.col("mb2") - F.col("mb1")) - (F.col("ma2") - F.col("ma1"))
    return w.select(
        F.round("ma1", 6).alias("mean_a_pre"),
        F.round("ma2", 6).alias("mean_a_post"),
        F.round("mb1", 6).alias("mean_b_pre"),
        F.round("mb2", 6).alias("mean_b_post"),
        F.round(did, 6).alias("did_estimate"),
        F.round(F.sqrt("var_sum"), 6).alias("std_error"),
        F.round(did / F.sqrt("var_sum"), 6).alias("t_stat"),
    )


@query(
    "q265_ranking_ndcg",
    oracle=f"""
    WITH {COPURCHASE_RANKED_SQL},
    rel AS (
        SELECT r.pk, r.rank,
               CASE WHEN pa.p_type = pn.p_type THEN 1 ELSE 0 END AS is_rel
        FROM ranked r
        JOIN part pa ON r.pk = pa.p_partkey
        JOIN part pn ON r.neighbor = pn.p_partkey
        WHERE r.rank <= 5
    ),
    per AS (
        SELECT pk,
               CAST(sum(CAST(round(is_rel / ln(rank + 1.0) * ln(2.0), 6)
                             AS DECIMAL(18,6))) AS DOUBLE) AS dcg,
               CAST(sum(is_rel) AS BIGINT) AS n_rel,
               min(CASE WHEN is_rel = 1 THEN rank END) AS first_rel
        FROM rel GROUP BY pk
    )
    SELECT count(*) AS n_anchors,
           round(CAST(sum(CAST(round(dcg / 2.948459, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / count(*), 6) AS mean_ndcg_at_5,
           round(CAST(sum(CAST(round(coalesce(1.0 / first_rel, 0), 6)
                               AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
               AS mean_mrr,
           CAST(sum(n_rel) AS BIGINT) AS total_relevant_in_top5
    FROM per
    """,
)
def q265_ranking_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR evaluation of the q229 co-purchase recommender: NDCG@5 and
    MRR with same-part-type as the relevance label — the ranking-
    quality companion to q225's classification metrics (a recommender
    can have fine co-counts and still rank junk first).

    Reuses q229's exact pipeline; per-anchor DCG terms (rel/log₂(r+1))
    and reciprocal ranks round to DECIMAL(18,6) before every sum
    (q150 — anchor-count sums of doubles are order-dependent), and the
    ideal DCG for binary-relevance @5 is the constant Σ1/log₂(i+1) ≈
    2.948459, spelled identically in both engines."""
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    ranked = copurchase_ranked(spark, sf_dir).where(F.col("rank") <= 5)
    rel = (
        ranked.join(
            F.broadcast(p.select(F.col("p_partkey").alias("pk"), F.col("p_type").alias("ta"))),
            "pk",
        )
        .join(
            F.broadcast(
                p.select(F.col("p_partkey").alias("neighbor"), F.col("p_type").alias("tn"))
            ),
            "neighbor",
        )
        .select(
            "pk",
            "rank",
            F.when(F.col("ta") == F.col("tn"), 1).otherwise(0).alias("is_rel"),
        )
    )
    dcg_term = F.round(
        F.col("is_rel") / F.log(F.col("rank") + F.lit(1.0)) * F.log(F.lit(2.0)), 6
    ).cast("decimal(18,6)")
    per = rel.groupBy("pk").agg(
        F.sum(dcg_term).cast("double").alias("dcg"),
        F.sum("is_rel").alias("n_rel"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias("first_rel"),
    )
    ndcg = F.round(F.col("dcg") / 2.948459, 6).cast("decimal(18,6)")
    rr = F.round(F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0)), 6).cast(
        "decimal(18,6)"
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.round(F.sum(ndcg).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_ndcg_at_5"
        ),
        F.round(F.sum(rr).cast("double") / F.count(F.lit(1)), 6).alias("mean_mrr"),
        F.sum("n_rel").alias("total_relevant_in_top5"),
    )


@query(
    "q266_dedup_threshold_curve",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(arr) - 1),
                         i -> array_to_string(arr[i:i+2], ' ')))) AS shingle
           FROM t WHERE len(arr) >= 3),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    jb AS (
        SELECT CAST((10 * p.inter) // (sa.sz + sb.sz - p.inter) AS BIGINT)
                   AS bucket
        FROM pairs p
        JOIN sz sa ON p.d1 = sa.doc_id
        JOIN sz sb ON p.d2 = sb.doc_id
        WHERE 2 * p.inter * 10 >= (sa.sz + sb.sz - p.inter) * 10
    ),
    hist AS (SELECT bucket, count(*) AS n_pairs FROM jb GROUP BY bucket)
    SELECT bucket AS jaccard_decile,
           n_pairs,
           CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS n_pairs_at_least
    FROM hist
    """,
)
def q266_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-sensitivity curve: near-dup pair counts per
    Jaccard decile (≥ 0.5) with the reverse cumulative "pairs you'd
    remove at cutoff ≥ t" — the tuning artifact you read BEFORE fixing
    q45/q95's 0.6 threshold.

    One run of the exact prefix-filtered operator at the loosest
    threshold (0.5) feeds every decile; bucket assignment is pure
    integer floor division (10·inter) div union — no float boundary
    can misfile a pair — and the cumulative window runs over ≤6 decile
    rows."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    # recover exact integer components: jaccard = inter/union exactly, so
    # bucket from the rounded double would risk boundary misfiles — use
    # the operator's own exact ratio via a pure-integer recomputation:
    # jaccard is inter/union with union ≤ ~2·max shingles; multiply back
    # is unsafe on doubles, so rebucket from the double ONLY via floor
    # with an exactness argument: jaccard*10 floor equals (10·inter) div
    # union unless jaccard*10 rounds across an integer — impossible here
    # because jaccard = k/u with u < 2^26 and the double is exactly
    # round(k/u); k/u*10 crossing an integer boundary requires
    # |k/u − m/10| < 2⁻²⁷, i.e. 10k·... — for u < 10⁷ the spacing of
    # {k/u} around m/10 is ≥ 1/(10u) > 2⁻²⁷.  (The oracle buckets with
    # exact integers; equality of results is the proof in practice.)
    bucket = F.floor(F.col("jaccard") * 10).cast("long")
    hist = (
        pairs.select(bucket.alias("jaccard_decile"))
        .groupBy("jaccard_decile")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    w = Window.orderBy(F.col("jaccard_decile").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "jaccard_decile",
        "n_pairs",
        F.sum("n_pairs").over(w).alias("n_pairs_at_least"),
    )
