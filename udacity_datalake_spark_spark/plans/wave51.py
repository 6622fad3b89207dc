"""Wave 51: retrieval-quality metrics (nDCG@10 / MRR / recall@10 over
exact-cosine rankings with same-label relevance) and a cross-modal
documents⋈embeddings profile — the eval harness and the joint-table
shape a multimodal training pipeline reports on.

Reference parity note: the reference (etl.py, /root/reference) has no
eval or vector surface; these extend the q238 (kNN label eval) and
q315 (mining kernel) families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

#: Eval query set: the first N_QUERIES vec_ids rank the whole corpus.
N_QUERIES = 20
AT_K = 10


@query(
    "q323_retrieval_metrics",
    oracle=f"""
    WITH dims AS (
        SELECT vec_id, label, u.dim AS dim, CAST(u.v AS DOUBLE) AS v
        FROM (
            SELECT vec_id, label,
                   unnest(list_transform(range(1, len(embedding) + 1),
                       i -> struct_pack(dim := i, v := embedding[i]))) AS u
            FROM embeddings
        )
    ),
    norms AS (
        SELECT vec_id,
               CAST(sum(CAST(floor(v * v * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
                   AS norm_sc
        FROM dims GROUP BY vec_id
    ),
    dots AS (
        SELECT a.vec_id AS qid, a.label AS qlabel,
               c.vec_id AS cid, c.label AS clabel,
               CAST(sum(CAST(floor(a.v * c.v * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
                   AS dot_sc
        FROM dims a
        JOIN dims c ON c.dim = a.dim AND c.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES}
        GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
        SELECT d.qid, d.qlabel,
               CASE WHEN d.clabel = d.qlabel THEN 1 ELSE 0 END AS rel,
               row_number() OVER (
                   PARTITION BY d.qid
                   ORDER BY d.dot_sc / sqrt(CAST(na.norm_sc AS DOUBLE) * nc.norm_sc)
                            DESC, d.cid) AS rn
        FROM dots d
        JOIN norms na ON na.vec_id = d.qid
        JOIN norms nc ON nc.vec_id = d.cid
    ),
    totals AS (
        SELECT qid, CAST(sum(rel) AS BIGINT) AS n_rel FROM ranked GROUP BY qid
    ),
    per_q AS (
        SELECT r.qid,
               CAST(sum(CASE WHEN r.rn <= {AT_K} THEN r.rel ELSE 0 END) AS BIGINT)
                   AS hits_at_k,
               t.n_rel,
               CAST(min(CASE WHEN r.rel = 1 THEN r.rn END) AS BIGINT) AS first_rel,
               CAST(sum(CASE WHEN r.rn <= {AT_K} AND r.rel = 1 THEN
                   CAST(floor(1e10 / ln(r.rn + 1) * 0.6931471805599453 + 0.5)
                        AS BIGINT) ELSE 0 END) AS BIGINT) AS dcg_sc,
               CAST(sum(CASE WHEN r.rn <= least({AT_K}, t.n_rel) THEN
                   CAST(floor(1e10 / ln(r.rn + 1) * 0.6931471805599453 + 0.5)
                        AS BIGINT) ELSE 0 END) AS BIGINT) AS idcg_sc
        FROM ranked r JOIN totals t ON t.qid = r.qid
        GROUP BY r.qid, t.n_rel
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           round(sum(CAST(floor(CAST(dcg_sc AS DOUBLE) / idcg_sc * 1e10 + 0.5)
                     AS BIGINT)) / 1e10 / count(*), 6) AS mean_ndcg_at_k,
           round(sum(CAST(floor(1e10 / first_rel + 0.5) AS BIGINT)) / 1e10
                 / count(*), 6) AS mrr,
           round(sum(CAST(floor(CAST(hits_at_k AS DOUBLE)
                     / least({AT_K}, n_rel) * 1e10 + 0.5) AS BIGINT)) / 1e10
                 / count(*), 6) AS mean_recall_at_k
    FROM per_q
    """,
)
def q323_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality harness: for each of the first 20 vectors used
    as queries, the whole corpus ranks by exact cosine (q315's
    BIGINT-scaled kernel) with same-label relevance, yielding macro
    nDCG@10 (binary gains, log2 discounts), MRR, and recall@10
    (capped at the query's relevant count) — the metric triple every
    embedding/ANN change is judged by; the LSH/IVF paths (q49/q60)
    report their recall against THIS exact ranking.

    Scale shape: the query set broadcasts; per-(query, candidate)
    scores collapse map-side off one dim-keyed join; rankings window
    per query (bounded partitions); every float term (discounts,
    reciprocal ranks, per-query ratios) is floor-scaled to BIGINT
    before any sum, so the macro means are partition-order proof and
    oracle-exact."""
    e = read_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("d0", "vf")
    ).select(
        "vec_id",
        "label",
        (F.col("d0") + 1).alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )
    norms = dims.groupBy("vec_id").agg(
        F.sum(F.floor(F.col("v") * F.col("v") * 1e12 + 0.5).cast("long")).alias(
            "norm_sc"
        )
    )
    qdims = dims.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("dim").alias("qdim"),
        F.col("v").alias("qv"),
    )
    dots = (
        dims.join(
            F.broadcast(qdims),
            (F.col("dim") == F.col("qdim")) & (F.col("vec_id") != F.col("qid")),
        )
        .groupBy(
            "qid", "qlabel", F.col("vec_id").alias("cid"), F.col("label").alias("clabel")
        )
        .agg(
            F.sum(F.floor(F.col("qv") * F.col("v") * 1e12 + 0.5).cast("long")).alias(
                "dot_sc"
            )
        )
    )
    cos = (
        dots.join(
            norms.select(F.col("vec_id").alias("qid"), F.col("norm_sc").alias("na")),
            "qid",
        )
        .join(
            norms.select(F.col("vec_id").alias("cid"), F.col("norm_sc").alias("nc")),
            "cid",
        )
        .select(
            "qid",
            (F.col("clabel") == F.col("qlabel")).cast("int").alias("rel"),
            (F.col("dot_sc") / F.sqrt(F.col("na").cast("double") * F.col("nc"))).alias(
                "cosine"
            ),
            "cid",
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "cid")
    )
    ranked = cos.withColumn("rn", rn)
    totals = ranked.groupBy("qid").agg(F.sum("rel").cast("long").alias("n_rel"))
    ln2 = 0.6931471805599453
    disc = F.floor(1e10 / F.log(F.col("rn") + 1) * ln2 + 0.5).cast("long")
    per_q = (
        ranked.join(totals, "qid")
        .groupBy("qid", "n_rel")
        .agg(
            F.sum(F.when(F.col("rn") <= AT_K, F.col("rel")).otherwise(0))
            .cast("long")
            .alias("hits_at_k"),
            F.min(F.when(F.col("rel") == 1, F.col("rn"))).cast("long").alias(
                "first_rel"
            ),
            F.sum(
                F.when((F.col("rn") <= AT_K) & (F.col("rel") == 1), disc).otherwise(0)
            )
            .cast("long")
            .alias("dcg_sc"),
            F.sum(
                F.when(F.col("rn") <= F.least(F.lit(AT_K), F.col("n_rel")), disc)
                .otherwise(0)
            )
            .cast("long")
            .alias("idcg_sc"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(
            F.sum(
                F.floor(
                    F.col("dcg_sc").cast("double") / F.col("idcg_sc") * 1e10 + 0.5
                ).cast("long")
            )
            / 1e10
            / F.count(F.lit(1)),
            6,
        ).alias("mean_ndcg_at_k"),
        F.round(
            F.sum(F.floor(1e10 / F.col("first_rel") + 0.5).cast("long"))
            / 1e10
            / F.count(F.lit(1)),
            6,
        ).alias("mrr"),
        F.round(
            F.sum(
                F.floor(
                    F.col("hits_at_k").cast("double")
                    / F.least(F.lit(AT_K), F.col("n_rel"))
                    * 1e10
                    + 0.5
                ).cast("long")
            )
            / 1e10
            / F.count(F.lit(1)),
            6,
        ).alias("mean_recall_at_k"),
    )


@query(
    "q324_crossmodal_profile",
    oracle="""
    WITH feats AS (
        SELECT vec_id, label,
               CAST(floor(list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) * 1e6 + 0.5) AS BIGINT) AS peak_u
        FROM embeddings
    ),
    joined AS (
        SELECT f.label, d.n_chars, f.peak_u
        FROM feats f JOIN documents d ON d.doc_id = f.vec_id
    )
    SELECT CAST(label AS BIGINT) AS label,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(CAST(sum(peak_u) AS DOUBLE) / 1e6 / count(*), 6) AS avg_peak,
           round((count(*) * sum(CAST(n_chars AS HUGEINT) * peak_u)
                  - sum(CAST(n_chars AS HUGEINT)) * sum(peak_u))
                 / NULLIF(sqrt(CAST(count(*) * sum(CAST(n_chars AS HUGEINT) * n_chars)
                        - sum(CAST(n_chars AS HUGEINT)) * sum(n_chars) AS DOUBLE)
                      * CAST(count(*) * sum(CAST(peak_u AS HUGEINT) * peak_u)
                        - sum(CAST(peak_u AS HUGEINT)) * sum(peak_u) AS DOUBLE)), 0), 6)
               AS corr_chars_peak
    FROM joined
    GROUP BY label
    """,
)
def q324_crossmodal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join profile: documents ⋈ embeddings on
    doc_id = vec_id, per label — corpus mass, mean peak component
    (max |xᵢ|, the concentration proxy that varies even on
    unit-normalized vectors — the L2 norm is constant 1 here by
    construction, so IT can't carry signal), and the Pearson
    correlation between text length and the peak (the sanity probe
    that catches an embedding pipeline leaking document LENGTH into
    the representation).

    Scale shape: the peak reduces the vector table to one row per
    vector (array-side max — no explode shuffle per dim); the join is
    key-aligned id=id; the correlation uses q128's exact power-sum
    discipline — peaks quantize to integer micro-units first, products
    widen to DECIMAL(38)/HUGEINT, one closed-form double per label
    with a NULLIF(denominator, 0) guard mirrored on both engines."""
    e = read_table(spark, sf_dir, "embeddings")
    feats = e.select(
        "vec_id",
        "label",
        F.floor(
            F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("peak_u"),
    )
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "n_chars"])
    joined = feats.join(
        d.select(F.col("doc_id").alias("vec_id"), "n_chars"), "vec_id"
    ).select("label", "n_chars", "peak_u")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("peak_u").cast("long").alias("s_peak"),
        F.sum(dec("n_chars") * F.col("peak_u")).alias("sxy"),
        F.sum(dec("n_chars") * F.col("n_chars")).alias("sxx"),
        F.sum(dec("peak_u") * F.col("peak_u")).alias("syy"),
        F.sum("n_chars").alias("sx"),
    )
    n, sx, sy = F.col("n"), F.col("sx").cast("decimal(38,0)"), F.col("s_peak").cast(
        "decimal(38,0)"
    )
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").alias("n_docs"),
        "total_chars",
        F.round(F.col("s_peak").cast("double") / 1e6 / F.col("n"), 6).alias("avg_peak"),
        F.round(
            (n * F.col("sxy") - sx * sy).cast("double")
            / F.nullif(
                F.sqrt(
                    (n * F.col("sxx") - sx * sx).cast("double")
                    * (n * F.col("syy") - sy * sy).cast("double")
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("corr_chars_peak"),
    )
