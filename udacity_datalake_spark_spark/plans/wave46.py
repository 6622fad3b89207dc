"""Wave 46: evaluation & probabilistic-screening operators a training-
data pipeline runs alongside curation — reference-vs-candidate n-gram
overlap scoring (the BLEU/ROUGE primitive), per-domain corpus caps (the
C4-style domain balancer), a count-min sketch with its point-query
guarantee, Bloom-filter decontamination (the scale path q79's exact
broadcast overlap approximates), and rank-biased overlap between two
term rankings (the ranking-drift monitor).

Reference parity note: the reference (etl.py, /root/reference) has no
eval or screening surface at all; these extend the documents-table
family with the standard corpus-QA toolkit.

Scale shapes: every operator reduces the corpus to gram- or
vocabulary-keyed frames before its exchange; the Bloom bit set and CM
table are bounded structures (broadcast-size) by construction, so the
probe side stays map-side; rankings/depth tables are vocabulary- or
constant-bounded before any unpartitioned window (the q208/q210
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

#: Candidate/reference pairing for the overlap eval: doc i is scored
#: against doc i + PAIR_OFFSET (both exist at every SF ≥ 0.01).
PAIR_OFFSET = 200


@query(
    "q306_ngram_overlap_eval",
    oracle=f"""
    WITH cand AS (
        SELECT doc_id AS pair_id, string_split(text, ' ') AS w
        FROM documents WHERE doc_id < {PAIR_OFFSET} AND len(string_split(text, ' ')) >= 2
    ),
    ref AS (
        SELECT doc_id - {PAIR_OFFSET} AS pair_id, string_split(text, ' ') AS w
        FROM documents
        WHERE doc_id >= {PAIR_OFFSET} AND doc_id < {2 * PAIR_OFFSET}
          AND len(string_split(text, ' ')) >= 2
    ),
    c1 AS (SELECT pair_id, unnest(w) AS g FROM cand),
    r1 AS (SELECT pair_id, unnest(w) AS g FROM ref),
    c1c AS (SELECT pair_id, g, count(*) AS c FROM c1 GROUP BY 1, 2),
    r1c AS (SELECT pair_id, g, count(*) AS c FROM r1 GROUP BY 1, 2),
    m1 AS (
        SELECT c.pair_id, CAST(sum(least(c.c, r.c)) AS BIGINT) AS match1
        FROM c1c c JOIN r1c r ON c.pair_id = r.pair_id AND c.g = r.g
        GROUP BY 1
    ),
    c2 AS (
        SELECT pair_id,
               unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
        FROM cand
    ),
    r2 AS (
        SELECT pair_id,
               unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
        FROM ref
    ),
    c2c AS (SELECT pair_id, g, count(*) AS c FROM c2 GROUP BY 1, 2),
    r2c AS (SELECT pair_id, g, count(*) AS c FROM r2 GROUP BY 1, 2),
    m2 AS (
        SELECT c.pair_id, CAST(sum(least(c.c, r.c)) AS BIGINT) AS match2
        FROM c2c c JOIN r2c r ON c.pair_id = r.pair_id AND c.g = r.g
        GROUP BY 1
    ),
    sizes AS (
        SELECT cand.pair_id, len(cand.w) AS n_cand_tok, len(ref.w) AS n_ref_tok
        FROM cand JOIN ref ON cand.pair_id = ref.pair_id
    )
    SELECT s.pair_id,
           CAST(s.n_cand_tok AS BIGINT) AS n_cand_tok,
           CAST(s.n_ref_tok AS BIGINT) AS n_ref_tok,
           COALESCE(m1.match1, 0) AS match1,
           COALESCE(m2.match2, 0) AS match2,
           round(COALESCE(m1.match1, 0) / CAST(s.n_cand_tok AS DOUBLE), 6) AS p1,
           round(COALESCE(m2.match2, 0) / CAST(s.n_cand_tok - 1 AS DOUBLE), 6) AS p2,
           round(sqrt((COALESCE(m1.match1, 0) * COALESCE(m2.match2, 0))
                 / CAST(s.n_cand_tok * (s.n_cand_tok - 1) AS DOUBLE)), 6) AS bleu2_core,
           CASE WHEN s.n_cand_tok < s.n_ref_tok THEN 1 ELSE 0 END AS brevity_penalized
    FROM sizes s
    LEFT JOIN m1 ON m1.pair_id = s.pair_id
    LEFT JOIN m2 ON m2.pair_id = s.pair_id
    """,
)
def q306_ngram_overlap_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-vs-candidate n-gram overlap scoring — the clipped-count
    precision core of BLEU/ROUGE, as a relational plan: candidate docs
    (doc_id < 200) are scored against deterministic reference partners
    (doc_id + 200) on clipped unigram and bigram matches, with the
    geometric-mean core and the integer brevity-penalty flag.

    Scale shape: grams explode once per side and collapse map-side into
    (pair, gram) counts before the one gram-keyed join; "clipping" IS
    ``least(c_cand, c_ref)`` on those counts, so no per-pair state ever
    exceeds the pair's vocabulary.  The float precisions derive from
    integer match counts in one closed-form expression (round-6,
    mirrored), per the engine's exact-integer-core discipline."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    w = F.split("text", " ")
    cand = (
        d.where(F.col("doc_id") < PAIR_OFFSET)
        .select(F.col("doc_id").alias("pair_id"), w.alias("w"))
        .where(F.size("w") >= 2)
    )
    ref = (
        d.where(
            (F.col("doc_id") >= PAIR_OFFSET) & (F.col("doc_id") < 2 * PAIR_OFFSET)
        )
        .select((F.col("doc_id") - PAIR_OFFSET).alias("pair_id"), w.alias("w"))
        .where(F.size("w") >= 2)
    )

    bigrams = F.expr("transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))")

    def gram_counts(side: DataFrame, gram_expr) -> DataFrame:
        return (
            side.select("pair_id", F.explode(gram_expr).alias("g"))
            .groupBy("pair_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def clipped(candc: DataFrame, refc: DataFrame, out: str) -> DataFrame:
        return (
            candc.alias("c")
            .join(refc.alias("r"), ["pair_id", "g"])
            .groupBy("pair_id")
            .agg(F.sum(F.least(F.col("c.c"), F.col("r.c"))).alias(out))
        )

    m1 = clipped(gram_counts(cand, F.col("w")), gram_counts(ref, F.col("w")), "match1")
    m2 = clipped(gram_counts(cand, bigrams), gram_counts(ref, bigrams), "match2")
    sizes = cand.select("pair_id", F.size("w").alias("n_cand_tok")).join(
        ref.select("pair_id", F.size("w").alias("n_ref_tok")), "pair_id"
    )
    j = (
        sizes.join(m1, "pair_id", "left")
        .join(m2, "pair_id", "left")
        .select(
            "pair_id",
            F.col("n_cand_tok").cast("long").alias("n_cand_tok"),
            F.col("n_ref_tok").cast("long").alias("n_ref_tok"),
            F.coalesce("match1", F.lit(0)).cast("long").alias("match1"),
            F.coalesce("match2", F.lit(0)).cast("long").alias("match2"),
        )
    )
    return j.select(
        "*",
        F.round(F.col("match1") / F.col("n_cand_tok").cast("double"), 6).alias("p1"),
        F.round(
            F.col("match2") / (F.col("n_cand_tok") - 1).cast("double"), 6
        ).alias("p2"),
        F.round(
            F.sqrt(
                (F.col("match1") * F.col("match2"))
                / (F.col("n_cand_tok") * (F.col("n_cand_tok") - 1)).cast("double")
            ),
            6,
        ).alias("bleu2_core"),
        F.when(F.col("n_cand_tok") < F.col("n_ref_tok"), 1)
        .otherwise(0)
        .alias("brevity_penalized"),
    )


DOMAIN_CAP = 50


@query(
    "q307_domain_caps",
    oracle=f"""
    WITH ranked AS (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rn > {DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN doc_id ELSE 0 END) AS BIGINT)
               AS kept_docid_sum
    FROM ranked
    GROUP BY source
    """,
)
def q307_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus caps (the C4/web-crawl balancer): each source
    keeps at most DOMAIN_CAP documents, selected by deterministic md5
    order (reproducible across runs and partitionings, unlike a sampled
    cap), and reports kept/dropped counts plus the kept-set doc_id sum —
    the checksum that pins WHICH documents survived, not just how many.

    Scale shape: one row_number window PARTITIONED BY the domain key —
    per-domain state is a single counter, the exchange is the same
    source-keyed shuffle the rollup needs anyway, and no global order
    forms.  At 100 TB with billions of domains this is exactly the
    hash-partitioned shape you want; a single mega-domain falls out of
    AQE skew handling."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source"])
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        d.withColumn("rn", rn)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("rn") <= DOMAIN_CAP, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("rn") > DOMAIN_CAP, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.sum(F.when(F.col("rn") <= DOMAIN_CAP, F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("kept_docid_sum"),
        )
    )


#: Count-min geometry: CM_ROWS independent hash rows × 256 buckets
#: (2-hex-char md5 prefix — the engine's cross-engine hash idiom).
CM_ROWS = 4


@query(
    "q308_countmin_sketch",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
    total AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM tf),
    cells AS (
        SELECT r.r, substring(md5('r' || r.r || ':' || tf.term), 1, 2) AS bucket,
               CAST(sum(tf.cnt) AS BIGINT) AS mass
        FROM tf CROSS JOIN (SELECT unnest(range({CM_ROWS})) AS r) r
        GROUP BY 1, 2
    ),
    top AS (
        SELECT term, cnt FROM tf ORDER BY cnt DESC, term LIMIT 20
    ),
    est AS (
        SELECT t.term, t.cnt,
               min(c.mass) AS est_cnt
        FROM top t
        CROSS JOIN (SELECT unnest(range({CM_ROWS})) AS r) r
        JOIN cells c
          ON c.r = r.r
         AND c.bucket = substring(md5('r' || r.r || ':' || t.term), 1, 2)
        GROUP BY 1, 2
    )
    SELECT e.term, CAST(e.cnt AS BIGINT) AS exact_cnt, e.est_cnt,
           TRUE AS never_underestimates,
           TRUE AS within_bound
    FROM est e CROSS JOIN total
    ORDER BY exact_cnt DESC, term
    """,
)
def q308_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream with its point-query
    guarantee checked for real: 4 hash rows × 256 buckets accumulate
    token mass; the top-20 exact terms are then estimated from the
    sketch (min over rows of the term's bucket mass) and the output
    asserts the CM contract — estimates never underestimate, and the
    min-over-rows excess stays within 8·N/256 (integer cross-multiplied;
    the oracle expects both TRUE, q22's tolerance-band pattern).

    Scale shape: tokens collapse to the vocabulary frame FIRST (one
    map-side-combined exchange); the 4-row explode and the 1024-cell
    sketch live on vocabulary- and constant-bounded frames.  CM cells
    are mergeable integer sums — the 100 TB rollup is a second tiny
    aggregate, no rescan (q96's HLL posture)."""
    toks = read_table(spark, sf_dir, "documents", columns=["text"]).select(
        F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    rows = spark.range(CM_ROWS).select(F.col("id").alias("r"))
    bucket = lambda term_col, r_col: F.substring(  # noqa: E731
        F.md5(F.concat(F.lit("r"), r_col.cast("string"), F.lit(":"), term_col)), 1, 2
    )
    cells = (
        tf.crossJoin(F.broadcast(rows))
        .groupBy(F.col("r"), bucket(F.col("term"), F.col("r")).alias("bucket"))
        .agg(F.sum("cnt").cast("long").alias("mass"))
    )
    total = tf.agg(F.sum("cnt").cast("long").alias("n"))
    top = tf.orderBy(F.col("cnt").desc(), "term").limit(20)
    est = (
        top.crossJoin(F.broadcast(rows))
        .withColumn("bucket", bucket(F.col("term"), F.col("r")))
        .join(cells, ["r", "bucket"])
        .groupBy("term", "cnt")
        .agg(F.min("mass").alias("est_cnt"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "term",
            F.col("cnt").cast("long").alias("exact_cnt"),
            "est_cnt",
            (F.col("est_cnt") >= F.col("cnt")).alias("never_underestimates"),
            ((F.col("est_cnt") - F.col("cnt")) * 256 <= 8 * F.col("n")).alias(
                "within_bound"
            ),
        )
        .orderBy(F.col("exact_cnt").desc(), "term")
    )


#: Bloom geometry: 3 hash functions into 16^4 = 65536 positions
#: (4-hex-char md5 prefixes).  Benchmark set: every 97th document.
BLOOM_K = 3


@query(
    "q309_bloom_decontamination",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, source, doc_id % 97 = 0 AS is_bench,
               unnest(list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2]))) AS g
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    bench_grams AS (SELECT DISTINCT g FROM grams WHERE is_bench),
    bits AS (
        SELECT DISTINCT substring(md5('b' || k.k || ':' || g), 1, 4) AS pos
        FROM bench_grams CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS k) k
    ),
    corpus_grams AS (SELECT DISTINCT g FROM grams WHERE NOT is_bench),
    gram_hits AS (
        SELECT cg.g,
               count(b.pos) = {BLOOM_K} AS bloom_hit,
               max(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) = 1 AS true_hit
        FROM corpus_grams cg
        CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS k) k
        LEFT JOIN bits b ON b.pos = substring(md5('b' || k.k || ':' || cg.g), 1, 4)
        LEFT JOIN bench_grams bg ON bg.g = cg.g
        GROUP BY cg.g
    ),
    docs AS (
        SELECT gr.doc_id, gr.source,
               max(CASE WHEN gh.bloom_hit THEN 1 ELSE 0 END) AS flagged,
               max(CASE WHEN gh.true_hit THEN 1 ELSE 0 END) AS contaminated
        FROM grams gr JOIN gram_hits gh ON gh.g = gr.g
        WHERE NOT gr.is_bench
        GROUP BY 1, 2
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(flagged) AS BIGINT) AS n_flagged,
           CAST(sum(contaminated) AS BIGINT) AS n_contaminated,
           TRUE AS no_false_negatives
    FROM docs
    GROUP BY source
    """,
)
def q309_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the 100 TB scale path for q79/q214:
    the benchmark set (every 97th doc) compiles to a Bloom bit set
    (3 md5-derived positions per distinct trigram, 65536-position space)
    that is BROADCAST-SIZE regardless of corpus size; corpus documents
    are flagged when any trigram probes all 3 positions hot.  The output
    reports per source the flagged vs exactly-contaminated counts (the
    false-positive overhead the bit-array size buys) and asserts the
    Bloom contract — no false negatives — as an oracle-checked TRUE.

    Scale shape: trigram sets are deduplicated per doc map-side; the
    probe joins DISTINCT corpus grams (vocabulary-scale, not
    token-scale) against the broadcast bit set; only gram-level verdicts
    join back to documents.  The exact-overlap branch exists solely to
    price the FP rate — production runs the Bloom probe alone."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    grams = (
        # materialize the token array BEFORE the transform: inlining
        # split() inside the lambda re-splits the whole text per gram
        # element — O(tokens²) per doc (benched 4.8s → 1.4s at sf0.1)
        d.select(
            "doc_id", "source", F.split("text", " ").alias("w")
        )
        .where(F.size("w") >= 3)
        .select(
            "doc_id",
            "source",
            (F.col("doc_id") % 97 == 0).alias("is_bench"),
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(w) - 3),"
                        " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
                    )
                )
            ).alias("g"),
        )
        # three consumers (bench set, probe set, doc verdict join) —
        # token-scale cache beats re-exploding the corpus thrice
        .transform(spersist)
    )
    ks = spark.range(BLOOM_K).select(F.col("id").alias("k"))
    pos = lambda g_col, k_col: F.substring(  # noqa: E731
        F.md5(F.concat(F.lit("b"), k_col.cast("string"), F.lit(":"), g_col)), 1, 4
    )
    bench_grams = grams.where("is_bench").select("g").distinct()
    bits = (
        bench_grams.crossJoin(F.broadcast(ks))
        .select(pos(F.col("g"), F.col("k")).alias("pos"))
        .distinct()
    )
    corpus_grams = grams.where(~F.col("is_bench")).select("g").distinct()
    gram_hits = (
        corpus_grams.crossJoin(F.broadcast(ks))
        .join(
            F.broadcast(bits),
            pos(F.col("g"), F.col("k")) == F.col("pos"),
            "left",
        )
        .groupBy("g")
        .agg(
            (F.count("pos") == BLOOM_K).alias("bloom_hit"),
        )
        .join(bench_grams.withColumn("true_hit", F.lit(True)), "g", "left")
        .select("g", "bloom_hit", F.coalesce("true_hit", F.lit(False)).alias("true_hit"))
    )
    docs = (
        grams.where(~F.col("is_bench"))
        .join(gram_hits, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.max(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias("flagged"),
            F.max(F.when(F.col("true_hit"), 1).otherwise(0)).alias("contaminated"),
        )
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("flagged").cast("long").alias("n_flagged"),
        F.sum("contaminated").cast("long").alias("n_contaminated"),
        (F.sum(F.when(F.col("contaminated") > F.col("flagged"), 1).otherwise(0)) == 0)
        .alias("no_false_negatives"),
    )


RBO_DEPTH = 20
RBO_P_PERMILLE = 900  # p = 0.9


@query(
    "q310_rank_biased_overlap",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    stats AS (
        SELECT term,
               count(DISTINCT doc_id) AS df,
               count(*) AS tf
        FROM tok GROUP BY term
    ),
    ra AS (SELECT term, row_number() OVER (ORDER BY df DESC, term) AS r FROM stats),
    rb AS (SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS r FROM stats),
    joined AS (
        SELECT ra.term, ra.r AS r_a, rb.r AS r_b
        FROM ra JOIN rb ON ra.term = rb.term
        WHERE ra.r <= {RBO_DEPTH} OR rb.r <= {RBO_DEPTH}
    ),
    depths AS (SELECT unnest(range(1, {RBO_DEPTH} + 1)) AS d),
    ovl AS (
        SELECT d.d,
               CAST(count(CASE WHEN j.r_a <= d.d AND j.r_b <= d.d THEN 1 END)
                    AS BIGINT) AS x_d
        FROM depths d LEFT JOIN joined j ON TRUE
        GROUP BY d.d
    ),
    terms AS (
        SELECT d, x_d,
               CAST(round(power({RBO_P_PERMILLE} / 1000.0, d - 1) * x_d / d, 10)
                    AS DECIMAL(28,10)) AS contrib
        FROM ovl
    )
    SELECT CAST({RBO_DEPTH} AS BIGINT) AS depth,
           CAST(max(CASE WHEN d = {RBO_DEPTH} THEN x_d END) AS BIGINT)
               AS overlap_at_depth,
           round(CAST(sum(contrib) AS DOUBLE) * (1 - {RBO_P_PERMILLE} / 1000.0), 6)
               AS rbo_truncated
    FROM terms
    """,
)
def q310_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al.) between two term rankings —
    document frequency vs raw term count — truncated at depth 20 with
    p = 0.9: the standard monitor for "did the vocabulary ranking drift"
    between corpus snapshots or scoring variants.

    Scale shape: the corpus reduces to the vocabulary stats frame in one
    exchange; both rankings are vocabulary-bounded windows; the depth ×
    ranking join is constant-bounded (≤ 2·depth surviving terms × 20
    depths).  Per the round-then-exact-sum discipline, each depth's
    p^(d-1)·X_d/d contribution rounds to DECIMAL(28,10) BEFORE the sum,
    so the 20-term total is partition-order independent and mirrors the
    oracle bit-exactly."""
    tok = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"]).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    stats = tok.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df"), F.count(F.lit(1)).alias("tf")
    )
    # vocabulary-bounded unpartitioned windows (q120 discipline applies
    # to fact-scale frames; this one is |vocab| rows)
    ra = stats.select(
        "term", F.row_number().over(Window.orderBy(F.col("df").desc(), "term")).alias("r_a")
    )
    rb = stats.select(
        "term", F.row_number().over(Window.orderBy(F.col("tf").desc(), "term")).alias("r_b")
    )
    joined = (
        ra.join(rb, "term")
        .where((F.col("r_a") <= RBO_DEPTH) | (F.col("r_b") <= RBO_DEPTH))
    )
    depths = spark.range(1, RBO_DEPTH + 1).select(F.col("id").alias("d"))
    p = RBO_P_PERMILLE / 1000.0
    overlaps = (
        F.broadcast(depths)
        .join(joined, F.expr("TRUE"), "left")
        .groupBy("d")
        .agg(
            F.count(
                F.when((F.col("r_a") <= F.col("d")) & (F.col("r_b") <= F.col("d")), 1)
            )
            .cast("long")
            .alias("x_d")
        )
    )
    contrib = F.round(
        F.pow(F.lit(p), F.col("d") - 1) * F.col("x_d") / F.col("d"), 10
    ).cast("decimal(28,10)")
    return overlaps.select("d", "x_d", contrib.alias("contrib")).agg(
        F.lit(RBO_DEPTH).cast("long").alias("depth"),
        F.max(F.when(F.col("d") == RBO_DEPTH, F.col("x_d"))).cast("long").alias(
            "overlap_at_depth"
        ),
        F.round(F.sum("contrib").cast("double") * (1 - p), 6).alias("rbo_truncated"),
    )
