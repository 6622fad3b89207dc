"""Wave 21: asymmetric containment dedup and experimentation statistics
(CUPED variance reduction, Welch's t) — the quote-detection gap in the
near-dup family and the two standard A/B-platform computations q166's
plain lift report lacked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.dedup import shingle_containment_pairs
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q232_shingle_containment",
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
    lab AS (
        SELECT CASE WHEN sa.sz <= sb.sz THEN d1 ELSE d2 END AS d_small,
               CASE WHEN sa.sz <= sb.sz THEN d2 ELSE d1 END AS d_big,
               inter, least(sa.sz, sb.sz) AS szs, greatest(sa.sz, sb.sz) AS szb
        FROM pairs p JOIN sz sa ON p.d1 = sa.doc_id JOIN sz sb ON p.d2 = sb.doc_id
    )
    SELECT d_small, d_big,
           round(inter / CAST(szs AS DOUBLE), 6) AS containment,
           round(inter / CAST(szs + szb - inter AS DOUBLE), 6) AS jaccard
    FROM lab WHERE inter * 1000 >= 900 * szs
    """,
)
def q232_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs: documents whose 3-gram shingles live
    ≥ 90% inside a LARGER document — the quoted-article/aggregator
    detector that symmetric Jaccard (q45/q46) structurally misses
    (J ≈ |small|/|big| can sit far below any Jaccard threshold while
    containment is ~1).

    `operators.dedup.shingle_containment_pairs`: prefix filtering with
    the asymmetric bound (only the small side prunes), (size, id)
    orientation so each pair generates once, exact array_intersect
    verify on candidates, and a pure-integer admission test
    (inter·1000 ≥ 900·|S|)."""
    d = read_table(spark, sf_dir, "documents")
    return shingle_containment_pairs(d, "doc_id", "text", n=3, threshold_permille=900)


_SPLIT = "substring(md5(CAST(user_id AS VARCHAR)), 1, 2)"

_CUPED_USER_SQL = f"""
        SELECT user_id,
               CASE WHEN {_SPLIT} < '80' THEN 'A' ELSE 'B' END AS grp,
               CAST(coalesce(sum(CASE WHEN epoch_us(ts) < mid_us
                                      THEN CAST(value AS DECIMAL(18,2)) END), 0)
                    AS DECIMAL(18,2)) AS x,
               CAST(coalesce(sum(CASE WHEN epoch_us(ts) >= mid_us
                                      THEN CAST(value AS DECIMAL(18,2)) END), 0)
                    AS DECIMAL(18,2)) AS y
        FROM events CROSS JOIN mid
        WHERE event_type = 'purchase'
        GROUP BY user_id
"""


@query(
    "q233_cuped_lift",
    oracle=f"""
    WITH mid AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us FROM events
    ),
    u AS ({_CUPED_USER_SQL}),
    s AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN grp = 'A' THEN x END) AS DOUBLE) AS sxa,
               CAST(sum(CASE WHEN grp = 'B' THEN x END) AS DOUBLE) AS sxb,
               CAST(sum(CASE WHEN grp = 'A' THEN y END) AS DOUBLE) AS sya,
               CAST(sum(CASE WHEN grp = 'B' THEN y END) AS DOUBLE) AS syb
        FROM u
    )
    SELECT n_a, n_b,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
           round(syb / n_b - sya / n_a, 6) AS raw_lift,
           round((syb / n_b - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                              * (sxb / n_b - sx / n))
                 - (sya / n_a - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                                * (sxa / n_a - sx / n)), 6) AS cuped_lift,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS var_reduction
    FROM s
    """,
)
def q233_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B lift: per-user experiment-period revenue
    adjusted by pre-period revenue (θ = cov(x,y)/var(x)), which shrinks
    metric variance by corr² — the experimentation-platform standard
    that q166's raw lift lacks (detects the same effect with ~1/(1−ρ²)
    less traffic).

    One fact pass builds per-user (pre, post) revenue with the split
    point at the exact integer midpoint of the observed time window; one
    aggregate computes pooled AND per-group power sums (DECIMAL-exact);
    θ, both adjusted means, and the variance-reduction factor evaluate
    once in double, structurally identical to the oracle."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "value"])
    mid = e.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    h = F.substring(F.md5(F.col("user_id").cast("string")), 1, 2)
    u = (
        e.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.max(F.when(h < "80", "A").otherwise("B")).alias("grp"),
            F.coalesce(
                F.sum(F.when(F.unix_micros("ts") < F.col("mid_us"), dec("value"))),
                F.lit(0),
            )
            .cast("decimal(18,2)")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.unix_micros("ts") >= F.col("mid_us"), dec("value"))),
                F.lit(0),
            )
            .cast("decimal(18,2)")
            .alias("y"),
        )
    )
    ga, gb = F.col("grp") == "A", F.col("grp") == "B"
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.when(ga, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(gb, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(ga, F.col("x"))).cast("double").alias("sxa"),
        F.sum(F.when(gb, F.col("x"))).cast("double").alias("sxb"),
        F.sum(F.when(ga, F.col("y"))).cast("double").alias("sya"),
        F.sum(F.when(gb, F.col("y"))).cast("double").alias("syb"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    n_a, n_b = F.col("n_a"), F.col("n_b")
    sxa, sxb, sya, syb = F.col("sxa"), F.col("sxb"), F.col("sya"), F.col("syb")
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    adj_b = syb / n_b - theta * (sxb / n_b - sx / n)
    adj_a = sya / n_a - theta * (sxa / n_a - sx / n)
    return s.select(
        "n_a",
        "n_b",
        F.round(theta, 6).alias("theta"),
        F.round(syb / n_b - sya / n_a, 6).alias("raw_lift"),
        F.round(adj_b - adj_a, 6).alias("cuped_lift"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("var_reduction"),
    )


@query(
    "q234_welch_ttest",
    oracle=f"""
    WITH v AS (
        SELECT CASE WHEN {_SPLIT} < '80' THEN 'A' ELSE 'B' END AS grp,
               CAST(value AS DECIMAL(18,2)) AS x
        FROM events WHERE event_type = 'purchase'
    ),
    s AS (
        SELECT
            CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
            CAST(sum(CASE WHEN grp = 'A' THEN x END) AS DOUBLE) AS sa,
            CAST(sum(CASE WHEN grp = 'B' THEN x END) AS DOUBLE) AS sb,
            CAST(sum(CASE WHEN grp = 'A' THEN x * x END) AS DOUBLE) AS sqa,
            CAST(sum(CASE WHEN grp = 'B' THEN x * x END) AS DOUBLE) AS sqb
        FROM v
    )
    SELECT n_a, n_b,
           round(sa / n_a, 6) AS mean_a,
           round(sb / n_b, 6) AS mean_b,
           round((sb / n_b - sa / n_a)
                 / sqrt(((n_a * sqa - sa * sa) / (n_a * (n_a - 1.0))) / n_a
                        + ((n_b * sqb - sb * sb) / (n_b * (n_b - 1.0))) / n_b), 6)
               AS t_stat,
           round(pow(((n_a * sqa - sa * sa) / (n_a * (n_a - 1.0))) / n_a
                     + ((n_b * sqb - sb * sb) / (n_b * (n_b - 1.0))) / n_b, 2)
                 / (pow(((n_a * sqa - sa * sa) / (n_a * (n_a - 1.0))) / n_a, 2)
                        / (n_a - 1)
                    + pow(((n_b * sqb - sb * sb) / (n_b * (n_b - 1.0))) / n_b, 2)
                        / (n_b - 1)), 6) AS welch_df
    FROM s
    """,
)
def q234_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on per-purchase value between the
    two md5-split user cohorts, with the Welch–Satterthwaite degrees of
    freedom — the significance test behind q166's lift and q233's
    CUPED-adjusted lift.

    One aggregate computes both groups' exact power sums; the t
    statistic and df evaluate once in double with the expression tree
    mirrored in the oracle (sample variances in the count form
    (nΣx²−S²)/(n(n−1)))."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "value"])
    h = F.substring(F.md5(F.col("user_id").cast("string")), 1, 2)
    v = e.where(F.col("event_type") == "purchase").select(
        F.when(h < "80", "A").otherwise("B").alias("grp"), dec("value").alias("x")
    )
    ga, gb = F.col("grp") == "A", F.col("grp") == "B"
    s = v.agg(
        F.sum(F.when(ga, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(gb, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(ga, F.col("x"))).cast("double").alias("sa"),
        F.sum(F.when(gb, F.col("x"))).cast("double").alias("sb"),
        F.sum(F.when(ga, F.col("x") * F.col("x"))).cast("double").alias("sqa"),
        F.sum(F.when(gb, F.col("x") * F.col("x"))).cast("double").alias("sqb"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    sa, sb, sqa, sqb = F.col("sa"), F.col("sb"), F.col("sqa"), F.col("sqb")
    var_a = (n_a * sqa - sa * sa) / (n_a * (n_a - F.lit(1.0)))
    var_b = (n_b * sqb - sb * sb) / (n_b * (n_b - F.lit(1.0)))
    se2 = var_a / n_a + var_b / n_b
    return s.select(
        "n_a",
        "n_b",
        F.round(sa / n_a, 6).alias("mean_a"),
        F.round(sb / n_b, 6).alias("mean_b"),
        F.round((sb / n_b - sa / n_a) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (F.pow(var_a / n_a, 2) / (n_a - 1) + F.pow(var_b / n_b, 2) / (n_b - 1)),
            6,
        ).alias("welch_df"),
    )
