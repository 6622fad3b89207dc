"""Second wave of corpus-curation operators: TF-IDF distinctive terms,
quality-weighted sampling, per-source outlier trimming, and embedding
k-means clustering.

Like plans/corpus_ops.py, nothing here exists in the reference (its
workload is the two ETL pipelines at reference etl.py:23-173) — these
are the remaining table-stakes operations of an LLM training-data
pipeline, each designed for the 100 TB shape:

- TF-IDF keeps both aggregations term-keyed with map-side combine; the
  document-frequency side joins the term-frequency side on the term key
  (both already reduced to vocabulary size, orders of magnitude smaller
  than the token stream);
- weighted sampling decides keep/drop in pure int64 rational arithmetic
  (h·D < w·2^20) — the same no-float-boundary trick as q80, so
  membership is bit-identical across engines, partitionings and reruns;
- outlier trimming computes one exact per-source percentile (sketchable
  via approx_percentile at scale, q22 covers that path) and broadcasts
  the tiny threshold table back onto the corpus;
- clustering trains on a bounded seeded sample (constant cost at any
  corpus size) and assigns with one Arrow-batched matmul pass.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.similarity import ivf_centroids, kmeans_assign
from udacity_datalake_spark_spark.operators.topk import ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

# Same multiplicative-hash uniform as corpus_ops: u = h/2^20 with
# h = (doc_id * 2654435761) mod 2^20 — int64-exact on both engines.
_MULT = 2654435761
_UNIT = 1 << 20


@query(
    "q100_tfidf_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT lang, term, count(*) AS tf FROM tok GROUP BY lang, term
    ),
    df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT lang, term, tf, df,
               round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT lang, term, tf, df, tfidf
    FROM (
        SELECT lang, term, tf, df, tfidf,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY tfidf DESC, term) AS rn
        FROM scored
    )
    WHERE rn <= 5
    """,
)
def q100_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most distinctive terms per language by TF-IDF
    (idf = ln((N+1)/(df+1)) with corpus-level document frequency).

    Two aggregations over the exploded token stream — (lang, term)
    frequency and per-term document frequency — both with map-side
    combine, then a term-keyed equi-join of two vocabulary-sized frames
    (tiny next to the token stream they summarize).  Ranking rounds the
    score to 6 decimals and tie-breaks on the term string, so the top-k
    cut is deterministic on both engines.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = d.count()
    scored = tf.join(df, "term").select(
        "lang",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@query(
    "q101_quality_weighted_sample",
    oracle=f"""
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN (d.doc_id * {_MULT}) % {_UNIT} * 400
                         < least(n_chars, 400) * {_UNIT}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN (d.doc_id * {_MULT}) % {_UNIT} * 400
                         < least(n_chars, 400) * {_UNIT}
                    THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM documents d
    GROUP BY lang
    """,
)
def q101_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted Bernoulli sampling: keep each document with
    probability w = min(n_chars, 400)/400 (longer docs up to the cap are
    "higher quality" — stand-in for any per-doc weight column).

    The keep test u < w is evaluated as h·400 < min(n_chars,400)·2^20
    with h = (doc_id·2654435761) mod 2^20 — pure int64 rational
    arithmetic, no float at the boundary, no RNG state.  Membership is a
    pure function of doc_id, so reruns, engine swaps, and late-arriving
    shards all sample identically.  Map-side only; the single exchange
    is the final per-lang aggregate.
    """
    d = read_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * _MULT) % _UNIT
    keep = (h * 400 < F.least(F.col("n_chars"), F.lit(400)) * _UNIT).cast("long")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(keep).alias("n_kept"),
        F.sum(keep * F.col("n_chars")).alias("kept_chars"),
    )


@query(
    "q102_length_trim",
    oracle="""
    WITH thr AS (
        SELECT source,
               round(quantile_cont(CAST(n_chars AS DOUBLE), 0.99), 6) AS p99
        FROM documents GROUP BY source
    )
    SELECT d.source,
           count(*) AS n_kept,
           CAST(sum(d.n_chars) AS DOUBLE) / count(*) AS avg_chars,
           max(thr.p99) AS p99_chars
    FROM documents d
    JOIN thr ON d.source = thr.source
    WHERE CAST(d.n_chars AS DOUBLE) <= thr.p99
    GROUP BY d.source
    """,
)
def q102_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source outlier trimming: drop documents above the source's
    p99 length (truncation-style curation against extraction blowups).

    One exact per-source percentile (groupBy percentile — the threshold
    table is |sources| rows), broadcast back onto the corpus for the
    filter, then the per-source keep stats.  The threshold is rounded to
    6 decimals BEFORE the comparison on both engines, so boundary
    membership can't flip on a last-ulp interpolation difference.  At
    100 TB the percentile swaps to approx_percentile (t-digest) — the
    sketch path q22 exercises.
    """
    d = read_table(spark, sf_dir, "documents")
    thr = d.groupBy("source").agg(
        F.round(F.percentile(F.col("n_chars").cast("double"), F.lit(0.99)), 6).alias(
            "p99"
        )
    )
    return (
        d.join(F.broadcast(thr), "source")
        .where(F.col("n_chars").cast("double") <= F.col("p99"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
            F.max("p99").alias("p99_chars"),
        )
    )


@query(
    "q103_embedding_clusters",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           TRUE AS all_assigned_exactly_once,
           TRUE AS n_clusters_in_range,
           TRUE AS centroids_deterministic
    FROM embeddings
    """,
)
def q103_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded k-means clustering of the embedding corpus, reported as its
    oracle-checkable invariants (the q22/q96 pattern for operators whose
    raw output — cluster memberships — no SQL engine can derive):

    - ``n_vectors``: distinct vectors assigned, which the oracle pins to
      the embeddings row count — so a dropped or duplicated document
      surfaces as a value mismatch, not just a row-count drift;
    - ``all_assigned_exactly_once``: assignment rows == distinct vec_ids
      (the explode produced exactly one cluster per vector);
    - ``n_clusters_in_range``: 1 ≤ distinct cluster_id ≤ k;
    - ``centroids_deterministic``: two independent fixed-seed trainings
      produce bit-identical centroid matrices (the reproducibility
      contract the per-cluster output rests on).

    Centroids train on a bounded seeded sample (cost independent of
    corpus size); assignment is one Arrow-batched matmul pass; the only
    exchange is the final summary aggregate.  The per-cluster size/label
    frame itself remains available via ``similarity.kmeans_assign`` and
    is pinned by the twin-run determinism + completeness test in
    tests/test_llm_ops.py.
    """
    k = 8
    e = read_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(e, id_col="vec_id", n_cells=k, seed=42)
    # bounded driver-side work: two trainings over the same 2000-row
    # seeded sample — constant in corpus size, like the training itself
    c1 = ivf_centroids(e, "embedding", k, seed=42)
    c2 = ivf_centroids(e, "embedding", k, seed=42)
    det = bool(np.array_equal(c1, c2))
    return assigned.agg(
        F.count(F.lit(1)).alias("__n_assign"),
        F.count_distinct("vec_id").alias("__n_vec"),
        F.count_distinct("cluster_id").alias("__k_used"),
    ).select(
        F.col("__n_vec").alias("n_vectors"),
        (F.col("__n_assign") == F.col("__n_vec")).alias("all_assigned_exactly_once"),
        ((F.col("__k_used") >= 1) & (F.col("__k_used") <= k)).alias(
            "n_clusters_in_range"
        ),
        F.lit(det).alias("centroids_deterministic"),
    )


@query(
    "q110_sequence_packing",
    oracle="""
    WITH t AS (
        SELECT source, doc_id % 16 AS shard, doc_id,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), p AS (
        SELECT source, shard, doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        FROM t
    )
    SELECT source, shard, CAST(floor(start_off / 2048.0) AS BIGINT) AS bin_id,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM p
    GROUP BY 1, 2, 3
    """,
)
def q110_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: documents are laid out in a deterministic
    order and assigned to fixed token-budget bins (2048 here) by the bin
    their starting offset falls in — the offset-based variant of greedy
    context-window packing, expressible as one windowed prefix sum.

    Scale shape: packing order within a bin is arbitrary, so the corpus is
    sharded (doc_id mod 16 — at 100 TB use ~1 shard per executor-core) and
    each shard packs independently; the window partitions on
    (source, shard), so no global sort and no single-partition bottleneck.
    Returns per-bin occupancy for inspection; emitting (doc_id → bin) is
    the same plan minus the final aggregate.
    """
    from udacity_datalake_spark_spark.operators.text import token_count
    from udacity_datalake_spark_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    t = d.select(
        "source",
        F.pmod("doc_id", F.lit(16)).alias("shard"),
        "doc_id",
        token_count("text").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = t.withColumn("start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return p.groupBy(
        "source",
        "shard",
        F.floor(F.col("start_off") / F.lit(2048.0)).cast("long").alias("bin_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@query(
    "q167_weighted_sample_wor",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               CAST(round(pow((CAST((doc_id * 2654435761) % 1048576 AS DOUBLE) + 0.5)
                              / 1048576.0, 1.0 / n_chars), 9) AS DECIMAL(18,9)) AS k
        FROM documents
    )
    SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (ORDER BY k DESC, doc_id) AS rn
        FROM keyed
    ) WHERE rn <= 50
    """,
)
def q167_weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    each doc draws key u^(1/w) from a deterministic uniform u (the q80/q83
    multiplicative-hash rational, no RNG) with weight = document length;
    the top-50 keys are the sample.  Complements q101's weighted
    Bernoulli (with-replacement semantics) — WOR is what a fixed-budget
    curation pass needs.

    Keys compute map-side (one pow per row over exact int-derived
    operands), round to DECIMAL(18,9) so the top-k cut is bit-stable
    across engines, and tie-break on doc_id.  The global top-50 runs on
    the keyed frame; at 100 TB the same cut is per-partition top-k then
    merge (the associativity top-k always has).
    """
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    u = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1048576)).cast("double") + 0.5
    key = F.round(F.pow(u / F.lit(1048576.0), 1.0 / F.col("n_chars")), 9).cast("decimal(18,9)")
    keyed = d.select("doc_id", "lang", "n_chars", key.alias("k"))
    return ranked_topk(keyed, [F.col("k").desc(), F.col("doc_id")], 50).select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "q169_znorm_quality_rank",
    oracle="""
    WITH feats AS (
        SELECT doc_id, lang,
               CAST(n_chars AS BIGINT) AS f1,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS f2
        FROM documents
    ),
    stats AS (
        SELECT lang, count(*) AS n,
               CAST(sum(CAST(f1 AS DECIMAL(18,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(f1 AS DECIMAL(18,0)) * CAST(f1 AS DECIMAL(18,0))) AS DOUBLE) AS q1,
               CAST(sum(CAST(f2 AS DECIMAL(18,0))) AS DOUBLE) AS s2,
               CAST(sum(CAST(f2 AS DECIMAL(18,0)) * CAST(f2 AS DECIMAL(18,0))) AS DOUBLE) AS q2
        FROM feats GROUP BY lang
    ),
    scored AS (
        SELECT f.doc_id, f.lang,
               round((f.f1 - s1 / n) / sqrt((q1 - s1 * s1 / n) / (n - 1))
                     + (f.f2 - s2 / n) / sqrt((q2 - s2 * s2 / n) / (n - 1)), 6) AS zscore
        FROM feats f JOIN stats USING (lang)
        WHERE n > 1 AND (q1 - s1 * s1 / n) > 0 AND (q2 - s2 * s2 / n) > 0
    )
    SELECT doc_id, lang, zscore FROM (
        SELECT doc_id, lang, zscore,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY zscore DESC, doc_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
)
def q169_znorm_quality_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-normalized composite quality ranking: two features
    (char length, token count) standardized WITHIN each language and
    summed — cross-lingual comparable scoring, since raw lengths aren't
    comparable across languages — then top-5 per language.

    The per-language mean/std come from q128's decimal power-sum recipe
    (count, Σx, Σx² in DECIMAL; one double closed form per group), the
    stats frame broadcasts back onto the docs, and each row's z is a
    fixed IEEE expression over identical operands on both engines.
    Rounded scores + doc_id tie-break make the per-lang top-5 cut
    deterministic.
    """
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "lang", "text", "n_chars"])
    feats = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("f1"),
        F.size(F.split("text", " ")).cast("bigint").alias("f2"),
    )
    d1, d2 = F.col("f1").cast("decimal(18,0)"), F.col("f2").cast("decimal(18,0)")
    stats = feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d1).cast("double").alias("s1"),
        F.sum(d1 * d1).cast("double").alias("q1"),
        F.sum(d2).cast("double").alias("s2"),
        F.sum(d2 * d2).cast("double").alias("q2"),
    )
    n, s1, q1, s2, q2 = (F.col(c) for c in ["n", "s1", "q1", "s2", "q2"])
    var1, var2 = (q1 - s1 * s1 / n), (q2 - s2 * s2 / n)
    z = F.round(
        (F.col("f1") - s1 / n) / F.sqrt(var1 / (n - 1))
        + (F.col("f2") - s2 / n) / F.sqrt(var2 / (n - 1)),
        6,
    )
    scored = (
        feats.join(F.broadcast(stats), "lang")
        .where((n > 1) & (var1 > 0) & (var2 > 0))
        .select("doc_id", "lang", z.alias("zscore"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("zscore").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("doc_id", "lang", "zscore")
    )


@query(
    "q170_packing_efficiency",
    oracle="""
    WITH t AS (
        SELECT source, doc_id % 16 AS shard, doc_id,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), p AS (
        SELECT source, shard, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        FROM t
    ), bins AS (
        SELECT source, shard, CAST(floor(start_off / 2048.0) AS BIGINT) AS bin_id,
               sum(n_tokens) AS bin_tokens
        FROM p GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(CAST(ceil(CAST(sum(bin_tokens) AS DOUBLE) / 2048) AS BIGINT)
                AS BIGINT) AS lower_bound_bins,
           round(CAST(sum(bin_tokens) AS DOUBLE) / (count(*) * 2048.0), 6)
               AS fill_rate
    FROM bins GROUP BY source
    """,
)
def q170_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over q110's context-window packing: per
    source, bins used vs the ⌈total/capacity⌉ lower bound and the token
    fill rate — the metric that tells a training pipeline how much
    compute its packing strategy wastes (operators evaluating operators).

    Same single (source, shard) exchange as q110; the report is a
    two-level roll-up of the bin frame, with one double division per
    source at the end.
    """
    from udacity_datalake_spark_spark.operators.text import token_count
    from udacity_datalake_spark_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    t = d.select(
        "source",
        F.pmod("doc_id", F.lit(16)).alias("shard"),
        "doc_id",
        token_count("text").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = t.withColumn("start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    bins = p.groupBy(
        "source",
        "shard",
        F.floor(F.col("start_off") / F.lit(2048.0)).cast("long").alias("bin_id"),
    ).agg(F.sum("n_tokens").alias("bin_tokens"))
    return bins.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("bin_tokens").cast("bigint").alias("total_tokens"),
        F.ceil(F.sum("bin_tokens").cast("double") / 2048).cast("bigint").alias("lower_bound_bins"),
        F.round(
            F.sum("bin_tokens").cast("double") / (F.count(F.lit(1)) * 2048.0), 6
        ).alias("fill_rate"),
    )
