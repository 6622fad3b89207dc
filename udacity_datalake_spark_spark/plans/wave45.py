"""Wave 45: corpus-quality screens a training-data pipeline runs before
mixing — repetition burden, dominant-token degeneracy, and the hashing
trick's collision profile.

Reference parity note: the reference (etl.py) has no text analytics at
all; these extend the documents-table family (q77 quality metrics, q179
trigram novelty) with the three pre-training screens it still lacked:
(1) per-document n-gram repetition (the "compression ratio" proxy used
to drop looping/generated text), (2) dominant-token share (catches
keyword-stuffed or template docs that length/stopword filters miss),
(3) feature hashing (the fixed-width sparse featurizer) with its
collision audit.

Scale shapes: q303 is computed entirely array-side (zero explode — the
per-doc gram statistics never leave the row), q304 is the standard TF
explode with map-side combine, q305's exchange is bounded by
#buckets × #distinct-terms, not token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q303_repetition_flags",
    oracle="""
    WITH per_doc AS (
        SELECT doc_id, source,
               len(w) - 2 AS n_grams,
               len(list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS n_distinct
        FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    ),
    scored AS (
        SELECT source,
               CAST(round(1.0 - n_distinct / CAST(n_grams AS DOUBLE), 6)
                    AS DECIMAL(18,6)) AS rep,
               -- integer cross-multiply: repetition > 0.5  <=>
               -- 2*(n_grams - n_distinct) > n_grams
               CASE WHEN 2 * (n_grams - n_distinct) > n_grams
                    THEN 1 ELSE 0 END AS flagged
        FROM per_doc
    )
    SELECT source,
           count(*) AS n_docs,
           round(CAST(sum(rep) AS DOUBLE) / count(*), 6) AS avg_repetition,
           CAST(sum(flagged) AS BIGINT) AS n_flagged,
           round(sum(flagged) / CAST(count(*) AS DOUBLE), 6) AS flagged_share
    FROM scored
    GROUP BY source
    """,
)
def q303_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source repetition burden: for each document, 1 − (distinct
    word-trigrams / total word-trigrams) — the cheap stand-in for a
    compression-ratio screen that catches looping or generated text —
    rolled up to the share of documents a >0.5 repetition filter would
    drop per source.

    The per-document statistic is computed entirely array-side
    (``transform`` over an index ``sequence`` + ``array_distinct``), so
    no gram ever leaves its row: the only exchange is the per-source
    rollup.  The flag is a pure-integer cross-multiplication
    (2·dups > grams), so membership cannot flip between engines; the
    averaged ratio is rounded to DECIMAL per doc before the exact sum
    (round-then-exact-sum, q130/q150 discipline)."""
    d = (
        read_table(spark, sf_dir, "documents", columns=["doc_id", "text", "source"])
        .select("doc_id", "source", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 3)
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 3),
        lambda i: F.concat_ws(
            " ", F.element_at("w", i + 1), F.element_at("w", i + 2), F.element_at("w", i + 3)
        ),
    )
    per_doc = d.select(
        "source",
        (F.size("w") - 2).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct"),
    )
    scored = per_doc.select(
        "source",
        F.round(
            F.lit(1.0) - F.col("n_distinct") / F.col("n_grams").cast("double"), 6
        )
        .cast("decimal(18,6)")
        .alias("rep"),
        F.when(
            2 * (F.col("n_grams") - F.col("n_distinct")) > F.col("n_grams"), 1
        )
        .otherwise(0)
        .alias("flagged"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("rep").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_repetition"
        ),
        F.sum("flagged").alias("n_flagged"),
        F.round(
            F.sum("flagged") / F.count(F.lit(1)).cast("double"), 6
        ).alias("flagged_share"),
    )


@query(
    "q304_dominant_token_share",
    oracle="""
    WITH tf AS (
        SELECT doc_id, source, term, count(*) AS cnt
        FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY doc_id, source, term
    ),
    per_doc AS (
        SELECT doc_id, source,
               max(cnt) AS max_cnt,
               CAST(sum(cnt) AS BIGINT) AS n_tokens
        FROM tf GROUP BY doc_id, source
    )
    SELECT source,
           count(*) AS n_docs,
           round(CAST(sum(CAST(round(max_cnt / CAST(n_tokens AS DOUBLE), 6)
                                AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
               AS avg_max_share,
           -- integer cross-multiply: max_share > 0.1  <=>  10*max > total
           CAST(sum(CASE WHEN 10 * max_cnt > n_tokens THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged
    FROM per_doc
    GROUP BY source
    """,
)
def q304_dominant_token_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-token degeneracy screen: the share of each document's
    tokens taken by its single most-repeated term, rolled up per source
    with the count of documents a >10% filter would flag — the keyword-
    stuffing / template detector that length and stopword filters miss.

    Standard TF shape: one explode with map-side partial counting into
    the (doc, term) exchange, an algebraic per-doc max/sum, then the
    bounded per-source rollup.  The flag threshold is pure-integer
    (10·max > total); the averaged share is rounded to DECIMAL per doc
    before the exact sum."""
    toks = (
        read_table(spark, sf_dir, "documents", columns=["doc_id", "text", "source"])
        .select("doc_id", "source", F.explode(F.split("text", " ")).alias("term"))
    )
    tf = toks.groupBy("doc_id", "source", "term").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = tf.groupBy("doc_id", "source").agg(
        F.max("cnt").alias("max_cnt"), F.sum("cnt").alias("n_tokens")
    )
    share = F.round(
        F.col("max_cnt") / F.col("n_tokens").cast("double"), 6
    ).cast("decimal(18,6)")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum(share).cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_max_share"
        ),
        F.sum(
            F.when(10 * F.col("max_cnt") > F.col("n_tokens"), 1).otherwise(0)
        ).alias("n_flagged"),
    )


@query(
    "q305_feature_hashing",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    hashed AS (
        SELECT substring(md5(term), 1, 2) AS bucket, term, count(*) AS cnt
        FROM tok GROUP BY 1, 2
    )
    SELECT bucket,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           count(*) AS n_terms,
           CAST(count(*) - 1 AS BIGINT) AS n_collisions
    FROM hashed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q305_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick's collision audit: every token is hashed into a
    fixed 256-bucket feature space (md5 hex prefix — the engine's
    cross-engine hash idiom), and each bucket reports its token mass,
    how many distinct terms landed in it, and the collision count — the
    table you read before choosing a hashed-feature width.

    Two cascaded aggregations: map-side combine collapses tokens to
    (bucket, term) counts before the only token-keyed exchange, and the
    bucket rollup is bounded at 256 rows regardless of corpus size —
    the exchange volume scales with vocabulary, never with tokens."""
    toks = (
        read_table(spark, sf_dir, "documents", columns=["text"])
        .select(F.explode(F.split("text", " ")).alias("term"))
    )
    hashed = (
        toks.select(F.substring(F.md5("term"), 1, 2).alias("bucket"), "term")
        .groupBy("bucket", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_terms"),
            (F.count(F.lit(1)) - 1).alias("n_collisions"),
        )
        .orderBy("bucket")
    )
