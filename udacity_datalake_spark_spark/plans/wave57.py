"""Wave 57: label confusability (pairwise centroid distances over the
embedding corpus — which classes an ANN index will mix up) and
naive-Bayes log-odds terms (the interpretable per-class keyword list —
which tokens drive a lang/label decision).

Reference parity note: the reference (etl.py, /root/reference) has no
vector or text-model surface; these extend q132 (label centroids) and
q130/q224 (LM scoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.topk import ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q338_label_confusability",
    oracle="""
    WITH dims AS (
        SELECT label, u.dim AS dim, CAST(u.v AS DOUBLE) AS v
        FROM (
            SELECT label,
                   unnest(list_transform(range(1, len(embedding) + 1),
                       i -> struct_pack(dim := i, v := embedding[i]))) AS u
            FROM embeddings
        )
    ),
    cent AS (
        -- scale each value to integer nano-units FIRST (the sum is then
        -- exact and partition-order proof), divide by n at the end
        SELECT label, dim,
               CAST(floor(sum(CAST(floor(v * 1e9 + 0.5) AS BIGINT))
                    / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS c_u
        FROM dims GROUP BY label, dim
    ),
    pair_d AS (
        SELECT a.label AS la, b.label AS lb,
               CAST(sum((a.c_u - b.c_u) * (a.c_u - b.c_u)) AS BIGINT) AS d2_sc
        FROM cent a JOIN cent b ON b.dim = a.dim AND a.label < b.label
        GROUP BY 1, 2
    )
    SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
           round(sqrt(CAST(d2_sc AS DOUBLE)) / 1e9, 6) AS centroid_dist
    FROM pair_d
    ORDER BY centroid_dist, label_a, label_b
    LIMIT 10
    """,
)
def q338_label_confusability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label confusability: the 10 CLOSEST label-centroid pairs by
    Euclidean distance — the classes an embedding index (q48/q60) will
    most often confuse, and the first thing to inspect when q323's
    retrieval metrics dip.  Centroids quantize to integer nano-units
    per (label, dim) BEFORE the pairwise distance, so the whole
    computation is exact integer arithmetic with one sqrt per pair.

    Scale shape: the corpus collapses to |labels|×|dims| centroid cells
    in one aggregate; the pair join is label²-bounded (tiny); output is
    a fixed top-10 (deterministic ties by label ids)."""
    e = read_table(spark, sf_dir, "embeddings")
    dims = e.select("label", F.posexplode("embedding").alias("d0", "vf")).select(
        "label", (F.col("d0") + 1).alias("dim"), F.col("vf").cast("double").alias("v")
    )
    cent = dims.groupBy("label", "dim").agg(
        # per-value nano-unit scaling BEFORE the sum: the aggregate is an
        # exact integer sum (partition-order proof); one rounded division
        F.floor(
            F.sum(F.floor(F.col("v") * 1e9 + 0.5).cast("long"))
            / F.count(F.lit(1)).cast("double")
            + 0.5
        )
        .cast("long")
        .alias("c_u")
    )
    a = cent.select(
        F.col("label").alias("la"), "dim", F.col("c_u").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("lb"), "dim", F.col("c_u").alias("cb")
    )
    pair_d = (
        a.join(b, "dim")
        .where(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
            .cast("long")
            .alias("d2_sc")
        )
    )
    scored = pair_d.select(
        F.col("la").cast("long").alias("label_a"),
        F.col("lb").cast("long").alias("label_b"),
        F.round(F.sqrt(F.col("d2_sc").cast("double")) / 1e9, 6).alias(
            "centroid_dist"
        ),
    )
    return ranked_topk(
        scored,
        [F.col("centroid_dist"), F.col("label_a"), F.col("label_b")],
        10,
        rank_col="__rn",
    ).drop("__rn")


@query(
    "q339_nb_logodds_terms",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    c AS (
        SELECT term,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ce,
               CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS co
        FROM tok GROUP BY term
    ),
    tot AS (
        SELECT CAST(sum(ce) AS BIGINT) AS ne, CAST(sum(co) AS BIGINT) AS no,
               count(*) AS v
        FROM c
    )
    SELECT term, ce AS n_en, co AS n_other,
           round(CAST(floor((ln((ce + 1) / CAST(t.ne + t.v AS DOUBLE))
                 - ln((co + 1) / CAST(t.no + t.v AS DOUBLE))) * 1e10 + 0.5)
                 AS BIGINT) / 1e10, 6) AS log_odds
    FROM c CROSS JOIN tot t
    ORDER BY log_odds DESC, term
    LIMIT 15
    """,
)
def q339_nb_logodds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes log-odds keywords: the 15 terms most indicative of
    lang='en' vs the rest under Laplace-smoothed class-conditional
    unigram models — the interpretable companion to q43's lang-ID
    heuristic (these ARE the features a linear classifier would weight
    highest), and the debugging lens for any q333-flagged feature.

    Scale shape: one token explode collapses map-side into the
    (term, class-counts) vocabulary frame; log-odds are one closed-form
    double per TERM, floor-scaled before the round so both engines agree
    bit-for-bit; top-15 plans as TakeOrderedAndProject."""
    tok = read_table(spark, sf_dir, "documents", columns=["lang", "text"]).select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    )
    c = tok.groupBy("term").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("ce"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).cast("long").alias("co"),
    )
    tot = c.agg(
        F.sum("ce").cast("long").alias("ne"),
        F.sum("co").cast("long").alias("no"),
        F.count(F.lit(1)).alias("v"),
    )
    log_odds = F.round(
        F.floor(
            (
                F.log((F.col("ce") + 1) / (F.col("ne") + F.col("v")).cast("double"))
                - F.log((F.col("co") + 1) / (F.col("no") + F.col("v")).cast("double"))
            )
            * 1e10
            + 0.5
        ).cast("long")
        / 1e10,
        6,
    )
    scored = c.crossJoin(F.broadcast(tot)).select(
        "term",
        F.col("ce").alias("n_en"),
        F.col("co").alias("n_other"),
        log_odds.alias("log_odds"),
    )
    return ranked_topk(
        scored, [F.col("log_odds").desc(), F.col("term")], 15, rank_col="__rn"
    ).drop("__rn")
