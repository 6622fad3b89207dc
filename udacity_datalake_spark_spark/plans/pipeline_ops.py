"""Training-data pipeline operators: deterministic splits/sampling,
sessionization, exact quantiles, denylist scrubbing, embedding
column statistics.

The reference (a star-schema ETL; SURVEY.md §2) has none of these — they
are the operations a large-scale LLM training-data pipeline needs on top
of the relational surface.  Every operator here is designed map-side-first
for 100 TB:

- splits/samples key on md5 of a stable id — pure map work, no shuffle
  beyond the final (tiny) aggregate, and the assignment is reproducible
  across runs, engines, partitionings, and scale factors (no RNG state);
- sessionization is ONE hash exchange on user_id, then in-partition
  window work (lag → flag → prefix-sum → grouped agg all inside the same
  partitioning — Catalyst reuses a single Exchange);
- quantiles use the exact interpolating percentile (Spark `percentile` ==
  DuckDB `quantile_cont` on DOUBLE); at 100 TB swap to
  `approx_percentile` with a documented error bound — q22 covers the
  sketch path;
- scrubbing is regexp work inside whole-stage codegen (JVM, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


def _md5_bucket(col: str) -> F.Column:
    """First two hex chars of md5(id) — a stable 256-bucket hash both
    engines compute identically (md5 of the decimal string form)."""
    return F.substring(F.md5(F.col(col).cast("string")), 1, 2)


@query(
    "q64_hash_split",
    oracle="""
    SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT CASE WHEN h < 'cd' THEN 'train'
                    WHEN h < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               n_chars
        FROM (SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h,
                     n_chars
              FROM documents)
    )
    GROUP BY split
    """,
)
def q64_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) by md5(doc_id) hex
    prefix: 'cd' = 205/256, 'e6' = 230/256.  Pure map-side assignment —
    no RNG, no shuffle, identical membership at any scale or partitioning;
    a new data drop lands in the same splits as the old rows."""
    d = read_table(spark, sf_dir, "documents")
    h = _md5_bucket("doc_id")
    split = (
        F.when(h < "cd", "train").when(h < "e6", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@query(
    "q65_sessionize",
    oracle="""
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(us) - min(us) AS duration_us
    FROM (
        SELECT user_id, ts, us,
               sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
        FROM (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
                     lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         AS prev_us
              FROM events)
    )
    GROUP BY user_id, session_seq
    """,
)
def q65_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with a 30-minute inactivity gap: lag → new-
    session flag → running sum (session number) → per-session aggregate.
    All four steps share the user_id hash partitioning, so Catalyst plans
    exactly ONE Exchange; time math is integer microseconds (no float
    drift).  Shared implementation: operators.sessions.with_session_seq
    (also behind q151 and q199).  Streaming twin: q54 (`session_window`)."""
    from udacity_datalake_spark_spark.operators.sessions import with_session_seq

    e = read_table(spark, sf_dir, "events")
    return (
        with_session_seq(e)
        .select("user_id", "ts", F.unix_micros("ts").alias("us"), "session_seq")
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.max("us") - F.min("us")).alias("duration_us"),
        )
    )


@query(
    "q66_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS p25,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.50), 6) AS p50,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS p75,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.99), 6) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q66_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating percentiles per group (Spark `percentile` and
    DuckDB `quantile_cont` share the (n-1)*p linear-interpolation
    definition).  Exact percentile materializes per-group value lists —
    correct here, memory-bound at 100 TB; the sketch path for scale is
    approx_percentile (t-digest), exercised by q22's HLL sibling."""
    li = read_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile(q, F.lit(p)), 6).alias(name)
            for p, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.99, "p99")]
        ]
    )


@query(
    "q67_custdist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q67_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-time residual filter, a
    per-key count that must preserve zero-order customers (count(col)
    skips the nulls the outer join manufactures), then a histogram of the
    counts.  First aggregate rides the join's o_custkey partitioning; the
    second groups ~100 distinct counts — negligible exchange."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q68_denylist_scrub",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\b(spark|secret)\b')) AS n_hits,
           length(regexp_replace(text, '\b(spark|secret)\b', '<redacted>', 'g'))
               AS scrubbed_len,
           substring(regexp_replace(text, '\b(spark|secret)\b', '<redacted>', 'g'),
                     1, 80) AS scrubbed_head
    FROM documents
    """,
)
def q68_denylist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist/PII-style scrubbing: count + redact term matches in one
    pass.  Pure JVM regexp inside whole-stage codegen (Spark
    regexp_replace is replace-ALL; the oracle needs DuckDB's 'g' flag for
    the same semantics) — embarrassingly parallel at any scale."""
    d = read_table(spark, sf_dir, "documents")
    pat = r"\b(spark|secret)\b"
    scrubbed = F.regexp_replace("text", pat, "<redacted>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0))).alias("n_hits"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.substring(scrubbed, 1, 80).alias("scrubbed_head"),
    )


@query(
    "q69_embedding_dim_stats",
    oracle="""
    SELECT pos,
           CAST(sum(CAST(CAST(embedding[pos + 1] AS DOUBLE) AS DECIMAL(12,7)))
                AS DOUBLE) / count(*) AS mean_component,
           round(min(CAST(embedding[pos + 1] AS DOUBLE)), 4) AS min_component,
           round(max(CAST(embedding[pos + 1] AS DOUBLE)), 4) AS max_component
    FROM embeddings, (SELECT unnest(range(0, 64)) AS pos)
    WHERE pos < len(embedding)
    GROUP BY pos
    """,
)
def q69_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column — the
    mean/min/max a whitening or normalization stage needs.  posexplode is
    a generator inside codegen (no shuffle until the 64-group aggregate);
    the mean accumulates in DECIMAL so the result is bit-stable under any
    partitioning, then surfaces as one double divide.  DuckDB 1.0 lacks
    UNNEST WITH ORDINALITY, so the oracle cross-joins a 0..63 range and
    1-indexes with [pos + 1]."""
    emb = read_table(spark, sf_dir, "embeddings")
    exploded = emb.select(F.posexplode("embedding").alias("pos", "component"))
    comp = F.col("component").cast("double")
    return exploded.groupBy("pos").agg(
        (F.sum(comp.cast("decimal(12,7)")).cast("double") / F.count(F.lit(1))).alias(
            "mean_component"
        ),
        F.round(F.min(comp), 4).alias("min_component"),
        F.round(F.max(comp), 4).alias("max_component"),
    )


@query(
    "q70_stratified_sample",
    oracle="""
    SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
)
def q70_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly 20 docs per language,
    chosen by md5 order — statistically uniform within each stratum yet
    fully reproducible (same rows every run/engine/partitioning, unlike
    `sampleBy`, whose per-partition RNG changes with the split layout).
    One hash exchange on lang; at 100 TB with few strata, pre-filter by a
    coarse md5-prefix band first so the per-stratum sort touches a sliver
    of the data."""
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
    )


@query(
    "q72_dq_report",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
                    THEN 0 ELSE 1 END) AS BIGINT) AS bad_quantity,
           CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
                    THEN 0 ELSE 1 END) AS BIGINT) AS bad_discount,
           CAST(sum(CASE WHEN l_tax >= 0 AND l_tax <= 0.08
                    THEN 0 ELSE 1 END) AS BIGINT) AS bad_tax,
           CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                    THEN 0 ELSE 1 END) AS BIGINT) AS bad_returnflag,
           CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate,
           count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dup_pk
    FROM lineitem
    """,
)
def q72_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators.quality.dq_report): six
    expectations — range, domain, null, and primary-key uniqueness —
    compiled into ONE aggregate pass over the fact table.  The report is
    the admission check a training-data ingest runs before a drop is
    merged; at 100 TB it costs a single scan regardless of rule count."""
    from udacity_datalake_spark_spark.operators.quality import (
        dq_report,
        is_null,
        not_between,
        not_in,
    )

    li = read_table(spark, sf_dir, "lineitem")
    return dq_report(
        li,
        rules={
            "bad_quantity": not_between("l_quantity", 1, 50),
            "bad_discount": not_between("l_discount", 0.0, 0.1),
            "bad_tax": not_between("l_tax", 0.0, 0.08),
            "bad_returnflag": not_in("l_returnflag", ["A", "N", "R"]),
            "null_shipdate": is_null("l_shipdate"),
        },
        unique_keys=["l_orderkey", "l_linenumber"],
    )


@query(
    "q73_dup_clusters",
    oracle="""
    WITH RECURSIVE
    t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(arr) - 1),
                         i -> array_to_string(arr[i:i+2], ' ')))) AS shingle
           FROM t WHERE len(arr) >= 3),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    near AS (SELECT p.d1, p.d2
             FROM pairs p
             JOIN sz sa ON p.d1 = sa.doc_id
             JOIN sz sb ON p.d2 = sb.doc_id
             WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= 0.6),
    edges AS (SELECT d1 AS node, d2 AS nbr FROM near
              UNION SELECT d2, d1 FROM near),
    cc(node, lbl) AS (
        SELECT DISTINCT node, node FROM edges
        UNION
        SELECT e.nbr, cc.lbl FROM cc JOIN edges e ON cc.node = e.node
    ),
    labels AS (SELECT node AS doc_id, min(lbl) AS component FROM cc GROUP BY node)
    SELECT doc_id, component,
           count(*) OVER (PARTITION BY component) AS cluster_size
    FROM labels
    """,
)
def q73_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: pairwise 3-gram Jaccard hits (the q45
    edge set) closed under transitivity by distributed connected
    components (operators.graph.connected_components), labeling each doc
    with its component's min doc_id — the canonical keeper a dedup pass
    retains.  The oracle reproduces the clustering with a recursive CTE;
    both sides agree exactly because the edge set is oracle-matched
    (q45/q46) and min-label CC is deterministic."""
    from udacity_datalake_spark_spark.operators.dedup import ngram_jaccard_pairs
    from udacity_datalake_spark_spark.operators.graph import connected_components

    d = read_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    labels = connected_components(edges, src="d1", dst="d2")
    w = Window.partitionBy("component")
    return labels.select(
        F.col("node").alias("doc_id"),
        "component",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


@query(
    "q76_chunk_documents",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    c AS (SELECT doc_id, arr,
                 unnest(range(0, CAST(ceil(len(arr) / 40.0) AS BIGINT)))
                     AS chunk_idx
          FROM t)
    SELECT doc_id, chunk_idx,
           array_to_string(arr[chunk_idx * 40 + 1 : chunk_idx * 40 + 40], ' ')
               AS chunk_text,
           least(40, len(arr) - chunk_idx * 40) AS n_tokens
    FROM c
    """,
)
def q76_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: each document split into consecutive
    40-token chunks (operators.chunking.chunk_documents) — split/
    sequence/explode/slice built-ins only, fully inside codegen; the
    Python-UDTF twin exists for tokenizers built-ins can't express and is
    proven row-identical in tests."""
    from udacity_datalake_spark_spark.operators.chunking import chunk_documents

    return chunk_documents(read_table(spark, sf_dir, "documents"))
