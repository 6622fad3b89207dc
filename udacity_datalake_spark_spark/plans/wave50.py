"""Wave 50: held-out language-model evaluation (train-half bigram model
scored on the eval half), text normalization with a proven fixed point
(the canonicalization step every dedup/fingerprint pass assumes), and a
k-anonymity audit (the privacy gate before a data release).

Reference parity note: the reference (etl.py, /root/reference) has no
eval, normalization or governance surface; these extend q224 (bigram
LM), q78 (PII scrub) and the DQ-report family (q72/q157/q158).

Cross-engine gotchas priced in: DuckDB regexp_replace needs the 'g'
flag where Spark replaces globally by default; ln/exp evaluate on
identical doubles derived from exact integer ratios, with per-term
BIGINT scaling (floor(x·10^10 + 0.5)) making every float reduction
partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q320_heldout_perplexity",
    oracle="""
    WITH tok AS (
        SELECT doc_id, doc_id % 2 AS half, string_split(text, ' ') AS w
        FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    train_uni AS (
        SELECT t, count(*) AS c1
        FROM (SELECT unnest(w) AS t FROM tok WHERE half = 0)
        GROUP BY t
    ),
    train_tot AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1, count(*) AS v FROM train_uni
    ),
    train_bi AS (
        SELECT u.g AS g, count(*) AS c2
        FROM (
            SELECT unnest(list_transform(range(1, len(w)),
                       i -> w[i] || ' ' || w[i+1])) AS g
            FROM tok WHERE half = 0
        ) u
        GROUP BY 1
    ),
    eval_bi AS (
        SELECT u.w1 AS w1, u.w2 AS w2, count(*) AS n
        FROM (
            SELECT unnest(list_transform(range(1, len(w)),
                       i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS u
            FROM tok WHERE half = 1
        ) u
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT e.n,
               CASE WHEN u2.c1 IS NULL THEN e.n ELSE 0 END AS oov_n,
               CAST(floor(-ln(
                   0.7 * COALESCE(b.c2, 0) / CAST(COALESCE(u1.c1, 1) AS DOUBLE)
                       * (CASE WHEN u1.c1 IS NULL THEN 0 ELSE 1 END)
                   + 0.2 * COALESCE(u2.c1, 0) / CAST(t.n1 AS DOUBLE)
                   + 0.1 / (t.v + 1)
               ) * 1e10 + 0.5) AS BIGINT) * e.n AS nll_sc
        FROM eval_bi e
        CROSS JOIN train_tot t
        LEFT JOIN train_uni u1 ON u1.t = e.w1
        LEFT JOIN train_uni u2 ON u2.t = e.w2
        LEFT JOIN train_bi b ON b.g = e.w1 || ' ' || e.w2
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_eval_bigrams,
           CAST(sum(oov_n) AS BIGINT) AS n_oov,
           round(sum(nll_sc) / 1e10 / sum(n), 6) AS avg_nll,
           round(exp(sum(nll_sc) / 1e10 / sum(n)), 6) AS perplexity
    FROM scored
    """,
)
def q320_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out LM evaluation: an interpolated bigram model (0.7·bigram
    + 0.2·unigram + 0.1·uniform-over-V+1) trains on the even-doc half
    and scores the odd-doc half — the classic perplexity split q224's
    full-corpus NLL lacks, and the quality signal perplexity-based data
    filtering builds on.

    Scale shape: both halves collapse to vocabulary-/bigram-grain count
    frames before any join; the eval side joins the (broadcastable)
    model tables by gram key; each distinct eval bigram contributes ONE
    scaled-integer NLL term weighted by its count, so the reduction is
    exact and partition-order proof."""
    tok = (
        read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
        .select((F.col("doc_id") % 2).alias("half"), F.split("text", " ").alias("w"))
        .where(F.size("w") >= 2)
    )
    train = tok.where(F.col("half") == 0)
    train_uni = (
        train.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    train_tot = train_uni.agg(
        F.sum("c1").cast("long").alias("n1"), F.count(F.lit(1)).alias("v")
    )
    bigram = F.expr("transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))")
    train_bi = (
        train.select(F.explode(bigram).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    eval_bi = (
        tok.where(F.col("half") == 1)
        .select(F.explode(bigram).alias("g"))
        .select(
            F.split("g", " ").getItem(0).alias("w1"),
            F.split("g", " ").getItem(1).alias("w2"),
            F.col("g"),
        )
        .groupBy("w1", "w2", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u1 = train_uni.select(F.col("t").alias("w1"), F.col("c1").alias("c1_w1"))
    u2 = train_uni.select(F.col("t").alias("w2"), F.col("c1").alias("c1_w2"))
    p = (
        0.7
        * F.coalesce("c2", F.lit(0))
        / F.coalesce("c1_w1", F.lit(1)).cast("double")
        * F.when(F.col("c1_w1").isNull(), 0).otherwise(1)
        + 0.2 * F.coalesce("c1_w2", F.lit(0)) / F.col("n1").cast("double")
        + 0.1 / (F.col("v") + 1)
    )
    scored = (
        eval_bi.crossJoin(F.broadcast(train_tot))
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .join(train_bi, "g", "left")
        .select(
            "n",
            F.when(F.col("c1_w2").isNull(), F.col("n")).otherwise(0).alias("oov_n"),
            (F.floor(-F.log(p) * 1e10 + 0.5).cast("long") * F.col("n")).alias(
                "nll_sc"
            ),
        )
    )
    return scored.agg(
        F.sum("n").cast("long").alias("n_eval_bigrams"),
        F.sum("oov_n").cast("long").alias("n_oov"),
        F.round(F.sum("nll_sc") / 1e10 / F.sum("n"), 6).alias("avg_nll"),
        F.round(F.exp(F.sum("nll_sc") / 1e10 / F.sum("n")), 6).alias("perplexity"),
    )


@query(
    "q321_text_normalization",
    oracle="""
    WITH norm AS (
        SELECT doc_id, source, text,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS ntext
        FROM documents
    ),
    again AS (
        SELECT doc_id, source, text, ntext,
               trim(regexp_replace(regexp_replace(lower(ntext),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n2
        FROM norm
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN ntext <> text THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
           CAST(sum(length(text) - length(ntext)) AS BIGINT) AS chars_removed,
           bool_and(n2 = ntext) AS idempotent
    FROM again
    GROUP BY source
    """,
)
def q321_text_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase → non-alphanumeric → space
    → whitespace collapse → trim) with its FIXED-POINT contract proven
    in-query: normalizing twice must equal normalizing once
    (oracle-checked ``idempotent`` boolean) — the property that makes
    normalize-then-fingerprint dedup stable across re-runs.  Reports
    per-source how much the normalizer touches.

    Scale shape: pure per-row codegen string expressions (zero shuffle
    before the source-grain rollup).  Cross-engine note: DuckDB's
    regexp_replace is single-match without the 'g' flag, Spark's is
    global — the oracle spells 'g' explicitly; the character classes
    are RE2/Java-identical."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])

    def norm(col):
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " +", " "
            )
        )

    n = d.select(
        "source", "text", norm(F.col("text")).alias("ntext")
    ).withColumn("n2", norm(F.col("ntext")))
    return n.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("ntext") != F.col("text"), 1).otherwise(0))
        .cast("long")
        .alias("n_changed"),
        F.sum(F.length("text") - F.length("ntext")).cast("long").alias("chars_removed"),
        F.bool_and(F.col("n2") == F.col("ntext")).alias("idempotent"),
    )


ANON_K = 5


@query(
    "q322_k_anonymity_audit",
    oracle=f"""
    WITH classes AS (
        SELECT c_mktsegment, c_nationkey, count(*) AS sz
        FROM customer
        GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           count(*) AS n_classes,
           CAST(min(sz) AS BIGINT) AS min_class_size,
           CAST(sum(CASE WHEN sz < {ANON_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_classes,
           CAST(sum(CASE WHEN sz < {ANON_K} THEN sz ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk
    FROM classes
    GROUP BY c_mktsegment
    """,
)
def q322_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (segment, nation) quasi-identifier:
    equivalence classes smaller than k = 5 re-identify their members,
    so the release gate reports, per segment, how many classes violate
    and how many rows are at risk — the privacy screen a training-data
    release runs before shipping customer-derived features.

    Scale shape: one QI-grain aggregate (map-side combined), then a
    segment-grain rollup of the bounded class frame.  Generalization
    (coarsening QI columns until violations vanish) iterates this same
    query — each candidate hierarchy level is one cheap re-aggregation."""
    c = read_table(spark, sf_dir, "customer", columns=["c_mktsegment", "c_nationkey"])
    classes = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return classes.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("sz").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("sz") < ANON_K, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_classes"),
        F.sum(F.when(F.col("sz") < ANON_K, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
    )
