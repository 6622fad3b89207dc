"""Wave 61: bounded-window conversion attribution (view → purchase
within 24 h — the funnel variant with a deadline) and an embedding
covariance audit over a leading dimension block (the whitening /
feature-redundancy check).

Reference parity note: the reference (etl.py, /root/reference) has no
behavioral or vector surface; these extend q126 (strict funnel),
q34 (as-of), and q333/q338 (representation audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

CONVERT_HOURS = 24


@query(
    "q346_conversion_window",
    oracle=f"""
    WITH stream AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS kind
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    nxt AS (
        SELECT user_id, event_id, ts, kind,
               min(CASE WHEN kind = 1 THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_purchase_ts
        FROM stream
    )
    SELECT CAST(count(*) AS BIGINT) AS n_views,
           CAST(count(CASE WHEN next_purchase_ts IS NOT NULL
                       AND epoch_us(next_purchase_ts) - epoch_us(ts)
                           <= {CONVERT_HOURS * 3600 * 1_000_000} THEN 1 END) AS BIGINT)
               AS n_converted,
           CAST(count(DISTINCT CASE WHEN next_purchase_ts IS NOT NULL
                       AND epoch_us(next_purchase_ts) - epoch_us(ts)
                           <= {CONVERT_HOURS * 3600 * 1_000_000} THEN user_id END) AS BIGINT)
               AS n_converting_users,
           round(count(CASE WHEN next_purchase_ts IS NOT NULL
                       AND epoch_us(next_purchase_ts) - epoch_us(ts)
                           <= {CONVERT_HOURS * 3600 * 1_000_000} THEN 1 END)
                 / CAST(count(*) AS DOUBLE), 6) AS conversion_rate
    FROM nxt WHERE kind = 0
    """,
)
def q346_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline-bounded conversion: the share of views followed by a
    purchase from the same user within 24 hours — the funnel metric
    with an attribution WINDOW (q126's strict ordered funnel has no
    deadline; marketing attribution always does).  Computed with one
    merged view/purchase stream and a forward-looking min window — the
    forward as-of join, no view×purchase pair join.

    Scale shape: one user-keyed exchange carries the merged stream;
    the forward-min window is key-local with O(1) state per row; the
    deadline test is integer seconds."""
    e = read_table(
        spark, sf_dir, "events", columns=["event_id", "event_type", "user_id", "ts"]
    )
    stream = e.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = stream.withColumn(
        "next_purchase_ts",
        F.min(F.when(F.col("kind") == 1, F.col("ts"))).over(w),
    )
    converted = F.col("next_purchase_ts").isNotNull() & (
        F.unix_micros("next_purchase_ts") - F.unix_micros("ts")
        <= CONVERT_HOURS * 3600 * 1_000_000
    )
    return nxt.where(F.col("kind") == 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_views"),
        F.count(F.when(converted, 1)).cast("long").alias("n_converted"),
        F.count_distinct(F.when(converted, F.col("user_id"))).alias(
            "n_converting_users"
        ),
        F.round(
            F.count(F.when(converted, 1)) / F.count(F.lit(1)).cast("double"), 6
        ).alias("conversion_rate"),
    )


#: Covariance audit block: leading dimensions 1..COV_DIMS (pairs are
#: COV_DIMS² — bounded regardless of corpus size).
COV_DIMS = 8


@query(
    "q347_embedding_covariance",
    oracle=f"""
    WITH dims AS (
        SELECT vec_id, u.dim AS dim,
               CAST(floor(CAST(u.v AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS x
        FROM (
            SELECT vec_id,
                   unnest(list_transform(range(1, {COV_DIMS} + 1),
                       i -> struct_pack(dim := i, v := embedding[i]))) AS u
            FROM embeddings
        )
    ),
    pairs AS (
        SELECT a.dim AS di, b.dim AS dj,
               count(*) AS n,
               CAST(sum(a.x) AS HUGEINT) AS sx,
               CAST(sum(b.x) AS HUGEINT) AS sy,
               sum(CAST(a.x AS HUGEINT) * b.x) AS sxy
        FROM dims a JOIN dims b ON b.vec_id = a.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2
    )
    SELECT CAST(di AS BIGINT) AS dim_i, CAST(dj AS BIGINT) AS dim_j,
           round(CAST(n * sxy - sx * sy AS DOUBLE) / n / n / 1e18, 6) AS cov,
           di = dj AS is_variance
    FROM pairs
    ORDER BY dim_i, dim_j
    """,
)
def q347_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding covariance audit over the leading 8-dimension block —
    the whitening check: strong off-diagonal covariance means redundant
    features (PCA/whitening would shrink the index), a non-flat
    diagonal means unbalanced per-dim information (q313's quantizer
    then wastes codes).  Values quantize to integer nano-units before
    the power sums (exact, partition-order proof; products widen to
    DECIMAL(38)/HUGEINT), one closed-form double per pair.

    Scale shape: the corpus collapses to COV_DIMS² (36 upper-triangle)
    cells through one dim-pair self-join keyed on vec_id — per-vector
    fan-out is COV_DIMS², independent of corpus size."""
    e = read_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id",
        F.posexplode(F.slice("embedding", 1, COV_DIMS)).alias("d0", "vf"),
    ).select(
        "vec_id",
        (F.col("d0") + 1).alias("dim"),
        F.floor(F.col("vf").cast("double") * 1e9 + 0.5).cast("long").alias("x"),
    )
    a = dims.select("vec_id", F.col("dim").alias("di"), F.col("x").alias("xi"))
    b = dims.select("vec_id", F.col("dim").alias("dj"), F.col("x").alias("xj"))
    pairs = (
        a.join(b, "vec_id")
        .where(F.col("di") <= F.col("dj"))
        .groupBy("di", "dj")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xi").cast("decimal(38,0)").alias("sx"),
            F.sum("xj").cast("decimal(38,0)").alias("sy"),
            F.sum(F.col("xi").cast("decimal(38,0)") * F.col("xj")).alias("sxy"),
        )
    )
    return (
        pairs.select(
            F.col("di").cast("long").alias("dim_i"),
            F.col("dj").cast("long").alias("dim_j"),
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / F.col("n")
                / F.col("n")
                / 1e18,
                6,
            ).alias("cov"),
            (F.col("di") == F.col("dj")).alias("is_variance"),
        )
        .orderBy("dim_i", "dim_j")
    )
