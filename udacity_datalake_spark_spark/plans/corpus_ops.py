"""Corpus-curation operators for LLM training data: repetition-based
quality rules, PII redaction, benchmark-contamination checks, temperature
source mixing, and the deterministic global shuffle.

The reference (a star-schema ETL; SURVEY.md §2) has none of these — they
are the curation stages a 100 TB text pipeline runs between raw crawl and
tokenizer.  Scale posture, per operator:

- repetition metrics (q77) compute the array-side statistics (word count,
  distinct-word fraction) entirely inside whole-stage codegen with zero
  shuffle; only the top-bigram mode needs an explode + two-level hash
  aggregate, which is map-combined and keyed by doc_id (no hot keys —
  each document is its own group);
- PII scrub (q78) is pure regexp map work in codegen; truth is synthesized
  in-query (one known email appended per doc) so redaction counts are
  exactly checkable;
- contamination (q79) joins corpus shingles against a *benchmark* shingle
  set — benchmark suites are small (thousands of documents) at any corpus
  scale, so the distinct benchmark-gram side is the canonical broadcast
  build side; the corpus side never shuffles;
- temperature mixing (q80) keeps per-source rate decisions in pure int64
  arithmetic (h²·n_s < n_min·2^40 ⟺ u² < n_min/n_s with u = h/2^20) so
  membership is bit-identical across engines, partitionings, and scale —
  no float pow() at the keep/drop boundary, no RNG state;
- the global shuffle (q83) orders by a multiplicative hash of the stable
  id: reproducible epoch ordering without materializing a permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

# Knuth's multiplicative hash constant; doc_id ≤ ~10^7 keeps the product
# far below 2^63, so both engines compute the same int64 value.
_MULT = 2654435761
_UNIT = 1 << 20  # hash resolution: u = h / 2^20 ∈ [0, 1)


@query(
    "q77_repetition_metrics",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    base AS (
        SELECT doc_id,
               len(words) AS n_words,
               round(1.0 - CAST(len(list_distinct(words)) AS DOUBLE)
                         / len(words), 6) AS dup_word_frac,
               list_transform(range(1, len(words)),
                              i -> words[i] || ' ' || words[i + 1]) AS bigrams
        FROM w
    ),
    top AS (
        SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_bigrams
        FROM (SELECT doc_id, bigram, count(*) AS cnt
              FROM (SELECT doc_id, unnest(bigrams) AS bigram FROM base)
              GROUP BY doc_id, bigram)
        GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_words, b.dup_word_frac,
           round(CAST(t.top_cnt AS DOUBLE) / t.n_bigrams, 6) AS top_bigram_frac
    FROM base b JOIN top t ON b.doc_id = t.doc_id
    """,
)
def q77_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality metrics per document: word count,
    duplicate-word fraction, and the fraction of all word-bigrams taken by
    the single most frequent bigram.

    All three metrics are per-document, so NOTHING here shuffles: the
    bigram mode is computed array-side as the longest run in the sorted
    bigram array (array_sort + one aggregate fold), replacing the naive
    explode → count → max → self-join plan that re-keys every bigram of
    the corpus through two exchanges.  At 100 TB this is the difference
    between a map-only scan and re-shuffling the entire tokenized corpus.
    """
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    base = d.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("words")).cast("double") / F.size("words"),
            6,
        ).alias("dup_word_frac"),
        F.expr(
            "transform(sequence(1, size(words) - 1),"
            " i -> concat(words[i - 1], ' ', words[i]))"
        ).alias("bigrams"),
    )
    # Mode count of the array = longest run in the sorted array: one
    # codegen fold, no explode, no exchange.
    top_cnt = F.expr(
        """
        aggregate(
          array_sort(bigrams),
          named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
          (acc, x) -> named_struct(
            'prev', x,
            'run',  IF(x <=> acc.prev, acc.run + 1, 1L),
            'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, 1L))),
          acc -> acc.best)
        """
    )
    return base.select(
        "doc_id",
        "n_words",
        "dup_word_frac",
        F.round(top_cnt.cast("double") / F.size("bigrams"), 6).alias("top_bigram_frac"),
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"


@query(
    "q78_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@example.com now', '{_EMAIL_RE}')) AS n_emails,
           length(regexp_replace(text || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@example.com now', '{_EMAIL_RE}', '<EMAIL>', 'g')) AS scrubbed_len
    FROM documents
    """,
)
def q78_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email-PII redaction over the documents table.  Ground truth is
    synthesized in-query (exactly one deterministic address appended per
    document), so the count of detections and the post-redaction length
    are exactly verifiable.  Pure regexp map work inside whole-stage
    codegen — no shuffle, no Python; at 100 TB this is the cheapest kind
    of full-corpus pass there is."""
    d = read_table(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com now"),
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(with_pii, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.length(F.regexp_replace(with_pii, _EMAIL_RE, "<EMAIL>")).alias(
            "scrubbed_len"
        ),
    )


@query(
    "q79_contamination",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
               i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2])) AS gram
        FROM w
    ),
    bench AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
    )
    SELECT g.doc_id,
           count(DISTINCT g.gram) AS n_overlap
    FROM grams g JOIN bench b ON g.gram = b.gram
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    """,
)
def q79_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: word-trigram overlap between each
    corpus document and a benchmark set (here: doc_id % 97 = 0 stands in
    for the eval suite).  The benchmark's distinct shingle set is small at
    any corpus scale — it is broadcast, so the 100 TB corpus side is
    scanned once with zero shuffle before the per-doc count aggregate."""
    grams = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("words"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(words) - 2),"
                    " i -> concat(words[i - 1], ' ', words[i], ' ', words[i + 1]))"
                )
            ).alias("gram"),
        )
    )
    bench = (
        grams.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    return (
        grams.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_overlap"))
    )


@query(
    "q80_temperature_sample",
    oracle=f"""
    WITH counts AS (
        SELECT source, count(*) AS n_s FROM documents GROUP BY source
    ),
    lo AS (SELECT min(n_s) AS n_min FROM counts),
    keep AS (
        SELECT d.source
        FROM documents d
        JOIN counts c ON d.source = c.source
        CROSS JOIN lo
        WHERE (d.doc_id * {_MULT}) % {_UNIT}
              * ((d.doc_id * {_MULT}) % {_UNIT}) * c.n_s
              < lo.n_min * {_UNIT}::BIGINT * {_UNIT}::BIGINT
    )
    SELECT c.source, c.n_s AS n_total, count(k.source) AS n_kept
    FROM counts c LEFT JOIN keep k ON c.source = k.source
    GROUP BY c.source, c.n_s
    """,
)
def q80_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (alpha = 0.5): downsample each
    source s at rate sqrt(n_min / n_s) so the kept mix follows
    n_s^alpha — the standard multilingual/multi-source rebalance.  The
    keep decision u < sqrt(n_min/n_s) is evaluated as
    h²·n_s < n_min·2^40 with h = (doc_id·2654435761) mod 2^20: pure int64
    arithmetic, so membership is bit-identical across engines and scales,
    and a rerun (or a late-arriving shard) keeps exactly the same rows.
    Per-source counts are one tiny aggregate broadcast back onto the
    corpus scan — the 100 TB side is never shuffled."""
    d = read_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n_min = counts.agg(F.min("n_s").alias("n_min"))
    h = (F.col("doc_id") * _MULT) % _UNIT
    kept = (
        d.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(n_min))
        .where(h * h * F.col("n_s") < F.col("n_min") * F.lit(_UNIT) * F.lit(_UNIT))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        counts.join(kept, "source", "left")
        .select(
            "source",
            F.col("n_s").alias("n_total"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


@query(
    "q81_disjunctive_join",
    oracle="""
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 35
            AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q81_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive-predicate join: an OR of three
    brand/size/quantity conjuncts over lineitem ⋈ part.  Because the
    equi-key l_partkey = p_partkey appears in every disjunct, this stays a
    single hash equi-join with the OR as a residual filter — never a
    nested-loop join (contrast the reference's J2, whose OR spans the join
    *keys* themselves; reference etl.py:147-151).  The disjunct-union
    bounds (brand ∈ {12,23,11}, quantity ∈ [1,30]) are strengthened into
    both scans explicitly so parquet row-group stats prune before the
    join."""
    li = read_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).where(F.col("l_quantity").between(1, 30))
    p = read_table(
        spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]
    ).where(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#11"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    revenue = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q82_anti_scalar_subquery",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q82_anti_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: customers with above-average positive balance and
    no urgent orders — a scalar aggregate subquery (one-row DataFrame
    broadcast as a cross join, the canonical Spark idiom for scalar
    subqueries) feeding a left anti join.  Both the 1-row broadcast and
    the anti join's build side stay small at any SF; the big sides stream
    through map-side."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]).where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


@query(
    "q83_global_shuffle",
    oracle=f"""
    SELECT doc_id,
           (doc_id * {_MULT}) % {_UNIT} % 64 AS shard,
           row_number() OVER (
               PARTITION BY (doc_id * {_MULT}) % {_UNIT} % 64
               ORDER BY (doc_id * {_MULT}) % {_UNIT}, doc_id) AS pos
    FROM documents
    """,
)
def q83_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data epoch ordering:
    every document gets a (shard, pos) from a multiplicative hash of its
    stable id — no RNG state, no materialized permutation, identical
    order on rerun or partial re-ingest.  Spark executes this as one hash
    exchange on shard + an in-partition sort; in production the shard
    count is sized to the writer parallelism (64 here) and each shard
    becomes one output file via partitionBy — readers then interleave
    shards for the epoch stream."""
    d = read_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * _MULT) % _UNIT
    shard = (h % 64).alias("shard")
    w = Window.partitionBy(h % 64).orderBy(h, "doc_id")
    return d.select(
        "doc_id", shard, F.row_number().over(w).alias("pos")
    )


@query(
    "q94_duplicate_ngrams",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, len(arr) - 3),
                        i -> array_to_string(arr[i:i+4], ' ')))) AS gram
          FROM t WHERE len(arr) >= 5)
    SELECT gram, count(*) AS df
    FROM g
    GROUP BY gram
    HAVING count(*) >= 2
    ORDER BY df DESC, gram
    LIMIT 100
    """,
)
def q94_duplicate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated 5-gram detection — the corpus-level signal
    behind exact-substring training-data dedup (boilerplate, licenses,
    templated spam all surface here).  Per-document work (gram
    construction + within-doc distinct) stays array-side in codegen; only
    distinct (doc, gram) pairs reach the ONE exchange, keyed by gram.
    Document frequency per gram is a map-combined count, so the shuffle
    carries at most one row per (task, gram) — at 100 TB the exchange
    volume is bounded by gram vocabulary, not corpus size.  Top-100 is
    deterministic: df DESC tie-broken on the gram text."""
    k = 5
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("words"))
        .where(F.size("words") >= k)
    )
    grams = d.select(
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(words) - {k - 1}),"
                    f" i -> array_join(slice(words, i, {k}), ' '))"
                )
            )
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
        .orderBy(F.col("df").desc(), F.col("gram"))
        .limit(100)
    )


@query(
    "q95_dedup_corpus",
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
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> component)
    """,
)
def q95_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy-dedup MATERIALIZATION: near-dup edge set →
    q73's connected components → keep one canonical document (min doc_id)
    per cluster, drop the rest via a left-anti join against the loser
    set.  This is the full pipeline a curation run executes — detect,
    cluster, and emit the deduplicated corpus — and the anti join is
    broadcast-sized because losers ≪ corpus (only near-dup cluster
    members, never the whole table).

    Edge source is MinHash-LSH (q46) by default — banded signature
    equi-join candidates + exact-Jaccard verify, the bucketed 100 TB
    path whose output equals the exact PPJoin prefix-filter edge set
    (q45, still available as ``ngram_jaccard_pairs``) whenever band
    recall is complete; equality on the corpus fixture is asserted by
    tests/test_llm_ops.py::test_minhash_lsh_equals_exact, which is what
    keeps this plan swap oracle-invariant."""
    from udacity_datalake_spark_spark.operators.dedup import minhash_lsh_pairs
    from udacity_datalake_spark_spark.operators.graph import connected_components

    d = read_table(spark, sf_dir, "documents")
    # Occupancy guard auto-gate (round-7 VERDICT #4): collapse_exact
    # runs in "auto" — one bounded gate action (count +
    # approx_count_distinct over the corpus) measures the identical-text
    # share and enables the star collapse at ≥5% (the 100 TB crawl
    # regime it was built for, where a 30%-identical corpus fans one
    # band bucket into (0.3n)² candidates).  On this 99.8%-distinct
    # fixture the gate skips the collapse, so the measured +15%
    # always-on overhead never applies; survivors are byte-identical
    # either way (star edges are component-invariant) — planted-test
    # pinned in tests/test_llm_ops.py::test_minhash_auto_collapse_gate.
    edges = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, threshold=0.6, collapse_exact="auto"
    )
    labels = connected_components(edges, src="d1", dst="d2")
    losers = labels.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("loser")
    )
    return d.join(
        F.broadcast(losers), F.col("doc_id") == F.col("loser"), "left_anti"
    ).select("doc_id", "source", "lang", "n_chars")


@query(
    "q96_hll_rollup",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           count(DISTINCT text) AS n_distinct_texts,
           TRUE AS est_within_5pct
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q96_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-(lang, source) HyperLogLog sketches of
    document text, then lang-level distinct estimates by UNIONING the
    sketches — never rescanning the data.  This is the 100 TB cardinality
    pattern: partial sketches are built map-side in one pass and are
    reusable for any coarser grouping (source → lang → corpus) at the
    cost of a few KB per group; re-aggregation is sketch-union, not a
    second corpus scan.

    Sketch BYTES are engine-specific, so the driver-checkable output is
    the exact columns plus a tolerance band: ``est_within_5pct`` asserts
    the sketch-merged estimate lands within 5% of the exact distinct
    count computed alongside (the oracle expects TRUE — a sketch
    regression flips the hash).  Exact merge≡direct determinism is
    separately asserted in tests/test_llm_ops.py.  In production the
    exact-distinct branch is dropped and only the sketch path runs —
    here it doubles as the oracle's measuring stick."""
    d = read_table(spark, sf_dir, "documents")
    per_source = d.groupBy("lang", "source").agg(
        F.hll_sketch_agg("text").alias("sk"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    rolled = per_source.groupBy("lang").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est"),
        F.sum("n_docs").alias("n_docs"),
    )
    exact = d.groupBy("lang").agg(F.count_distinct("text").alias("n_distinct_texts"))
    return (
        rolled.join(exact, "lang")
        .select(
            "lang",
            "n_docs",
            "n_distinct_texts",
            (
                F.abs(F.col("__est") - F.col("n_distinct_texts"))
                <= 0.05 * F.col("n_distinct_texts")
            ).alias("est_within_5pct"),
        )
        .orderBy("lang")
    )


@query(
    "q195_curation_pipeline",
    oracle="""
    WITH RECURSIVE
    kept AS (SELECT doc_id, text, n_chars FROM documents WHERE n_chars >= 200),
    t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM kept),
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
    labels AS (SELECT node AS doc_id, min(lbl) AS component FROM cc GROUP BY node),
    deduped AS (
        SELECT doc_id, n_chars FROM kept
        WHERE doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> component)
    )
    SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                     THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                     THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM deduped GROUP BY 1
    """,
)
def q195_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPSTONE — the full curation run as ONE composed plan: quality
    filter (length ≥ 200) → fuzzy dedup (MinHash-LSH candidates,
    exact-Jaccard verify, connected components, min-id survivor) →
    deterministic md5 train/val/test split → per-split volume report.
    Every stage is an existing operator; this query exists to prove they
    COMPOSE — filters push into the scan feeding the dedup, the dedup's
    loser set broadcasts into the anti-join, and the split is map-side —
    so the whole pipeline is (corpus scans + the bounded near-dup
    machinery of q95) with no materialization barriers between stages.

    At 100 TB this is the plan a nightly curation job submits; the
    oracle re-derives the identical report with a recursive-CTE CC."""
    from udacity_datalake_spark_spark.operators.dedup import minhash_lsh_pairs
    from udacity_datalake_spark_spark.operators.graph import connected_components
    from udacity_datalake_spark_spark.plans.pipeline_ops import _md5_bucket

    kept = read_table(spark, sf_dir, "documents", columns=["doc_id", "text", "n_chars"]).where(
        F.col("n_chars") >= 200
    )
    # collapse_exact auto-gated from the measured duplicate share — see
    # q95's rationale (round-7 VERDICT #4)
    edges = minhash_lsh_pairs(
        kept, "doc_id", "text", n=3, threshold=0.6, collapse_exact="auto"
    )
    labels = connected_components(edges, src="d1", dst="d2")
    losers = labels.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("loser")
    )
    deduped = kept.join(
        F.broadcast(losers), F.col("doc_id") == F.col("loser"), "left_anti"
    )
    h = _md5_bucket("doc_id")
    split = (
        F.when(h < "cd", "train").when(h < "e6", "val").otherwise("test")
    )
    return (
        deduped.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def _pagerank_oracle(iters: int = 10) -> str:
    """Generate the q196 oracle: the exact near-dup edge CTE (q45/q95's
    pairs) + ``iters`` unrolled integer fixed-point PageRank steps.
    Standard SQL forbids aggregation over the recursive reference in a
    recursive CTE, so the fixed iteration count is unrolled as chained
    CTEs — same integer arithmetic as the Spark loop, term for term."""
    head = """
    WITH
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
    und AS (SELECT d1 AS node, d2 AS nbr FROM near
            UNION SELECT d2, d1 FROM near),
    deg AS (SELECT node, count(*) AS d FROM und GROUP BY node),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT node, CAST(1000000000 // n AS BIGINT) AS r
           FROM deg CROSS JOIN nn)"""
    steps = []
    for k in range(iters):
        steps.append(
            f"""
    r{k + 1} AS (
        SELECT u.nbr AS node,
               CAST(15000000000 // (100 * any_value(n))
                    + 85 * sum(r // d) // 100 AS BIGINT) AS r
        FROM r{k}
        JOIN und u ON r{k}.node = u.node
        JOIN deg ON r{k}.node = deg.node
        CROSS JOIN nn
        GROUP BY u.nbr
    )"""
        )
    return (
        head
        + ","
        + ",".join(steps)
        + f"\n    SELECT node, r AS rank_ppb FROM r{iters}"
    )


@query("q196_pagerank", oracle=_pagerank_oracle(10))
def q196_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the exact near-dup document graph —
    iterative graph analytics with a BIT-EXACT oracle, which float
    PageRank can never have (partition-order double sums).  All
    arithmetic is int64 parts-per-billion with integer division
    (operators.graph.pagerank_fixed_point); the oracle unrolls the same
    ten integer steps as chained CTEs.

    Scale shape: the static mirrored edge list partitions once and
    persists; each round shuffles only the (node, rank) frame and cuts
    lineage with localCheckpoint — the connected_components posture
    applied to a value-propagating (not label-collapsing) recursion.
    Edges come from the EXACT prefix-filtered Jaccard path so the edge
    set itself is oracle-identical by construction."""
    from udacity_datalake_spark_spark.operators.dedup import ngram_jaccard_pairs
    from udacity_datalake_spark_spark.operators.graph import pagerank_fixed_point

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    edges = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    return pagerank_fixed_point(edges, src="d1", dst="d2", iters=10)
