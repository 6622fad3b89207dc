"""Statistical + IR scoring operators: decimal-exact correlation/OLS,
unigram language-model document scoring, per-label embedding centroids,
and BM25 ranked retrieval.

The reference computes no statistics at all (its only aggregate is
``distinct()``, reference etl.py:42,58,91,169); these are the model-side
scoring passes of a training-data pipeline.  Determinism design:

- correlation/regression reduce to the five classic power sums, each
  accumulated in DECIMAL (order-independent), with ONE double evaluation
  of the closed-form at the end — bit-stable under any partitioning and
  identical to the oracle because both engines evaluate the same IEEE
  expression over the same exact sums;
- LM scoring rounds each per-token log-probability to a 6-decimal
  DECIMAL *before* the per-document sum, so the float-order hazard of
  summing raw doubles never arises;
- BM25 rounds each per-term contribution to DECIMAL(18,9) before the
  per-document sum, and the top-k tie-breaks on ``doc_id`` after
  rounding — the cut is reproducible across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.topk import ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q128_corr_regression",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS corr_qty_price,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS ols_slope
    FROM s
    """,
)
def q128_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS slope of extendedprice on quantity per
    return flag, from decimal-exact power sums.

    Spark's built-in ``corr``/``covar`` accumulate in double and are
    order-dependent (different AQE partitioning → different last bits);
    instead the five power sums Σx Σy Σx² Σy² Σxy accumulate in DECIMAL
    — associative, so bit-stable — and the closed-form is evaluated once
    per group in double, structurally identical to the oracle's
    expression.  One map-side-combined aggregate over the fact; no
    second pass for the means.
    """
    li = read_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    q, p = dec("l_quantity", 18, 2), dec("l_extendedprice", 18, 2)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = n * sxy - sx * sy
    return s.select(
        "l_returnflag",
        "n",
        F.round(cov / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).alias(
            "corr_qty_price"
        ),
        F.round(cov / (n * sxx - sx * sx), 6).alias("ols_slope"),
    )


@query(
    "q130_unigram_lm_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dt AS (SELECT doc_id, term, count(*) AS c_dt FROM tok GROUP BY doc_id, term),
    vocab AS (SELECT term, count(*) AS c_t FROM tok GROUP BY term),
    tot AS (SELECT count(*) AS n_total FROM tok)
    SELECT doc_id,
           CAST(sum(c_dt) AS BIGINT) AS n_tokens,
           round(-(CAST(sum(c_dt * CAST(round(ln(c_t / n_total), 6)
                                        AS DECIMAL(18,6))) AS DOUBLE)
                   / sum(c_dt)), 6) AS avg_nll
    FROM dt JOIN vocab USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q130_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model perplexity proxy: average negative
    log-likelihood per token, with the LM trained on the corpus itself —
    the classic cheap quality signal for training-data filtering.

    Two token-keyed aggregates (per-doc term counts and the corpus
    vocabulary, both map-side combined), a vocabulary-sized equi-join,
    and a broadcast of the single-row token total.  Each term's log-prob
    is rounded to DECIMAL(18,6) *before* the per-document weighted sum,
    so the sum is exact and order-independent; only one double divide
    happens per document at the end.
    """
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dt = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c_dt"))
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c_t"))
    tot = tok.agg(F.count(F.lit(1)).alias("n_total"))
    lp = F.round(F.log(F.col("c_t") / F.col("n_total")), 6).cast("decimal(18,6)")
    return (
        dt.join(vocab, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dt").alias("n_tokens"),
            F.round(
                -(F.sum(F.col("c_dt") * lp).cast("double") / F.sum("c_dt")), 6
            ).alias("avg_nll"),
        )
    )


@query(
    "q132_label_centroids",
    oracle="""
    SELECT label, pos,
           CAST(sum(CAST(CAST(embedding[pos + 1] AS DOUBLE) AS DECIMAL(12,7)))
                AS DOUBLE) / count(*) AS mean_component
    FROM embeddings, (SELECT unnest(range(0, 64)) AS pos)
    WHERE pos < len(embedding)
    GROUP BY label, pos
    """,
)
def q132_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the supervised twin of q69's corpus
    stats): mean of every dimension within each label — the "class
    prototype" a nearest-centroid classifier or diversity sampler needs.

    posexplode runs inside codegen (no shuffle until the aggregate); the
    aggregate is keyed by (label, pos) — at most labels × 64 groups, so
    the reduce side is trivially small at any corpus scale.  Means
    accumulate in DECIMAL(12,7) for bit-stability, exactly like q69.
    """
    emb = read_table(spark, sf_dir, "embeddings", columns=["label", "embedding"])
    exploded = emb.select("label", F.posexplode("embedding").alias("pos", "component"))
    comp = F.col("component").cast("double")
    return exploded.groupBy("label", "pos").agg(
        (F.sum(comp.cast("decimal(12,7)")).cast("double") / F.count(F.lit(1))).alias(
            "mean_component"
        )
    )


@query(
    "q133_bm25_retrieval",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM doclen
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN ('spark', 'join') GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tok
        WHERE term IN ('spark', 'join') GROUP BY term
    ),
    scored AS (
        SELECT t.doc_id,
               CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                          * (tf * 2.2)
                          / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))), 9)
                    AS DECIMAL(18,9)) AS term_score
        FROM tf t JOIN df USING (term) JOIN doclen USING (doc_id)
        CROSS JOIN stats
    )
    SELECT doc_id, bm25 FROM (
        SELECT doc_id,
               round(CAST(sum(term_score) AS DOUBLE), 6) AS bm25,
               row_number() OVER (ORDER BY sum(term_score) DESC, doc_id) AS rn
        FROM scored GROUP BY doc_id
    ) WHERE rn <= 10
    """,
)
def q133_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-10 documents for the query
    {spark, join} — ranked retrieval over the corpus, the lookup side of
    a retrieval-augmented pipeline.

    The term filter is pushed into the token stream before any shuffle,
    so ``tf``/``df`` aggregate only matching postings; document length
    and the corpus stats are vocabulary/doc-keyed side frames, with the
    single-row stats broadcast.  Per-term contributions round to
    DECIMAL(18,9) before the per-doc sum (exact, order-independent), and
    the final top-k orders by the exact decimal score with a ``doc_id``
    tie-break.  The candidate set entering the global top-k window is
    already reduced to docs containing a query term; a web-scale variant
    would take per-partition top-k first.
    """
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    terms = ["spark", "join"]
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtok = tok.where(F.col("term").isin(terms))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs, dfc, tfc = F.col("n_docs"), F.col("df"), F.col("tf")
    idf = F.log(F.lit(1) + (n_docs - dfc + 0.5) / (dfc + 0.5))
    term_score = F.round(
        idf * (tfc * 2.2) / (tfc + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.col("avgdl")))),
        9,
    ).cast("decimal(18,9)")
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
    )
    ranked = scored.groupBy("doc_id").agg(F.sum("term_score").alias("ssum"))
    return ranked_topk(ranked, [F.col("ssum").desc(), F.col("doc_id")], 10).select(
        "doc_id", F.round(F.col("ssum").cast("double"), 6).alias("bm25")
    )
