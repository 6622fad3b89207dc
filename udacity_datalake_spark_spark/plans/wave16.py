"""Wave 16: LLM-curation additions — cross-split n-gram decontamination,
two-pass Misra–Gries heavy hitters, readability scoring — plus the
clustering coefficient companion to wave 15's triangle count.

q215 is the wave's scale centerpiece: frequent-item detection WITHOUT a
full-vocabulary shuffle (per-partition Misra–Gries summaries → bounded
candidate set → exact recount of candidates only), the two-pass pattern
that makes "find the boilerplate n-grams" feasible when the vocabulary
itself is shuffle-hostile at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.sketches import mg_candidates
from udacity_datalake_spark_spark.plans.pipeline_ops import _md5_bucket
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import (
    COSUPPLY_DEG_SQL,
    COSUPPLY_EDGES_SQL,
    cosupply_degrees,
    cosupply_edges,
    triangles,
)
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q214_cross_split_contamination",
    oracle="""
    WITH labeled AS (
        SELECT doc_id, string_split(text, ' ') AS arr,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
        FROM documents
    ),
    g AS (
        SELECT doc_id, h,
               unnest(list_distinct(list_transform(range(1, len(arr) - 3),
                      i -> array_to_string(arr[i:i+4], ' ')))) AS gram
        FROM labeled WHERE len(arr) >= 5
    ),
    train AS (SELECT DISTINCT gram FROM g WHERE h < 'cd'),
    test_g AS (SELECT doc_id, gram FROM g WHERE h >= 'e6'),
    per AS (
        SELECT t.doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contaminated
        FROM test_g t LEFT JOIN train tr USING (gram)
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_grams, n_contaminated,
           round(n_contaminated / CAST(n_grams AS DOUBLE), 6)
               AS contamination_ratio
    FROM per WHERE n_contaminated > 0
    """,
)
def q214_cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination, GPT-3 style: for every test-split
    document (q64's md5 split rule), the share of its distinct word
    5-grams that also appear anywhere in the train split — the signal
    that a held-out doc leaks into training data and must be dropped.

    Unlike q79 (small benchmark side → broadcast), BOTH sides here are
    corpus-scale, so the overlap is a symmetric shuffle join keyed by
    the gram: per-doc gram construction and within-doc distinct stay
    array-side in codegen, grams are compressed to xxhash64 int64 before
    the exchange (bytes on the wire ∝ gram count, not gram text; a
    cross-split hash collision is the standard 2⁻⁶⁴-per-pair risk every
    hash-dedup path in this engine accepts), and the train side
    deduplicates to one row per gram before the join so the left join
    cannot fan out."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    labeled = d.select(
        "doc_id", F.split("text", " ").alias("arr"), _md5_bucket("doc_id").alias("h")
    ).where(F.size("arr") >= 5)
    grams = labeled.select(
        "doc_id",
        "h",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("arr") - 5),
                    lambda i: F.array_join(F.slice("arr", i + 1, 5), " "),
                )
            )
        ).alias("gram"),
    ).select("doc_id", "h", F.xxhash64("gram").alias("gh"))
    train = grams.where(F.col("h") < "cd").select("gh").distinct()
    test_g = grams.where(F.col("h") >= "e6").select("doc_id", "gh")
    hit = train.withColumn("__hit", F.lit(1))
    per = (
        test_g.join(hit, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated"),
        )
    )
    return per.where(F.col("n_contaminated") > 0).select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        F.round(
            F.col("n_contaminated") / F.col("n_grams").cast("double"), 6
        ).alias("contamination_ratio"),
    )


@query(
    "q215_heavy_hitter_bigrams",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS arr FROM documents),
    g AS (
        SELECT unnest(list_transform(range(1, len(arr)),
                      i -> array_to_string(arr[i:i+1], ' '))) AS bigram
        FROM t WHERE len(arr) >= 2
    ),
    tot AS (SELECT count(*) AS n FROM g),
    c AS (SELECT bigram, count(*) AS n_occurrences FROM g GROUP BY bigram)
    SELECT bigram, n_occurrences,
           round(n_occurrences / CAST(n AS DOUBLE), 6) AS token_share
    FROM c CROSS JOIN tot
    WHERE n_occurrences * 2500 > 2 * n
    """,
)
def q215_heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent word-bigram detection (share > 0.08%) via two-pass
    Misra–Gries: the boilerplate-phrase probe that, at corpus scale,
    must NOT shuffle the full bigram vocabulary.

    Pass 1 streams each partition through a width-2000 Misra–Gries
    summary inside mapInPandas (Arrow-batched value_counts, dict state
    across batches — one of the engine's declared pandas paths): any
    bigram with global share > 1/2000 survives in at least one
    partition's summary (weighted-average pigeonhole), so the union of
    per-partition candidates is a guaranteed superset of the > 0.08%
    target set at ≤ width·partitions rows.  Pass 2 exactly recounts
    ONLY the candidates via a broadcast semi-join — the shuffle carries
    candidate bigrams, never the vocabulary.  The final exact-count
    threshold filter makes the result independent of partitioning and
    row order, which is why a partition-layout-dependent sketch can
    still be oracle-checked bit-exactly."""
    d = read_table(spark, sf_dir, "documents", columns=["text"])
    arr = d.select(F.split("text", " ").alias("arr")).where(F.size("arr") >= 2)
    bigrams = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("arr") - 2),
                lambda i: F.array_join(F.slice("arr", i + 1, 2), " "),
            )
        ).alias("bigram")
    )
    total = arr.agg(F.sum(F.size("arr") - 1).alias("n"))

    candidates = mg_candidates(bigrams, "bigram", width=2000)
    exact = (
        bigrams.join(F.broadcast(candidates), "bigram")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") * 2500 > 2 * F.col("n"))
        .select(
            "bigram",
            "n_occurrences",
            F.round(
                F.col("n_occurrences") / F.col("n").cast("double"), 6
            ).alias("token_share"),
        )
    )


@query(
    "q216_readability",
    oracle="""
    WITH per_doc AS (
        SELECT source,
               len(string_split(text, ' ')) AS words,
               greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
        FROM documents
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(words) AS BIGINT) AS total_words,
           round(CAST(sum(words) AS DOUBLE) / sum(sentences), 6)
               AS words_per_sentence,
           round(CAST(sum(syllables) AS DOUBLE) / sum(words), 6)
               AS syllables_per_word,
           round(206.835 - 1.015 * (CAST(sum(words) AS DOUBLE) / sum(sentences))
                 - 84.6 * (CAST(sum(syllables) AS DOUBLE) / sum(words)), 6)
               AS flesch_score
    FROM per_doc GROUP BY source
    """,
)
def q216_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch reading-ease scoring from corpus-exact counts:
    whitespace words, sentence terminators ([.!?], floored at 1), and a
    vowel-group syllable proxy — the classic text-quality gate a
    pretraining pipeline runs before mixing sources.

    All three counts are integer regexp/split arithmetic evaluated
    per-document in codegen (no Python), summed exactly per source, and
    the Flesch formula is applied ONCE per source row from the exact
    sums — so the doubles are deterministic regardless of partitioning."""
    d = read_table(spark, sf_dir, "documents", columns=["source", "text"])
    per_doc = d.select(
        "source",
        F.size(F.split("text", " ")).alias("words"),
        F.greatest(
            F.lit(1), F.size(F.regexp_extract_all("text", F.lit("[.!?]"), 0))
        ).alias("sentences"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
        ).alias("syllables"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("total_words"),
        F.sum("sentences").alias("__s"),
        F.sum("syllables").alias("__y"),
    )
    wps = F.col("total_words").cast("double") / F.col("__s")
    spw = F.col("__y").cast("double") / F.col("total_words")
    return agg.select(
        "source",
        "n_docs",
        "total_words",
        F.round(wps, 6).alias("words_per_sentence"),
        F.round(spw, 6).alias("syllables_per_word"),
        F.round(F.lit(206.835) - 1.015 * wps - 84.6 * spw, 6).alias("flesch_score"),
    )


@query(
    "q217_clustering_coefficient",
    oracle=f"""
    WITH {COSUPPLY_EDGES_SQL},
    {COSUPPLY_DEG_SQL},
    wed AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM edges e1 JOIN edges e2 ON e2.u = e1.w
                      JOIN edges e3 ON e3.u = e1.u AND e3.w = e2.w
    )
    SELECT n_wedges, n_triangles,
           round(3 * n_triangles / CAST(n_wedges AS DOUBLE), 6)
               AS global_clustering
    FROM wed CROSS JOIN tri
    """,
)
def q217_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient of the supplier co-supply graph:
    3·triangles / wedges, where wedges = Σᵥ C(deg v, 2) — how much the
    co-supply network closes its open triads (q212's companion metric,
    over the identical scale-adaptive edge set).

    Degrees come from one count over the exploded endpoint list (graph-
    sized, not fact-sized), the wedge sum is exact int64, and the
    triangle side reuses q212's oriented wedge join."""
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    deg = cosupply_degrees(edges)
    wed = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias("n_wedges")
    )
    tri = triangles(edges)
    return wed.crossJoin(F.broadcast(tri)).select(
        "n_wedges",
        "n_triangles",
        F.round(
            3 * F.col("n_triangles") / F.col("n_wedges").cast("double"), 6
        ).alias("global_clustering"),
    )
