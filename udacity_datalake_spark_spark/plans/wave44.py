"""Wave 44: linear-output sparse-cosine retrieval — the scale-safe
product shape for lexical similarity (round-2 `weak` item #2).

q155 emits every qualifying pair, which on a shared-vocabulary corpus is
output-quadratic by definition — no plan fixes an output that big.  The
production shape is per-document top-k ADMISSION: each document keeps
only its k most similar neighbors, so the output is O(n·k) regardless of
how dense the similarity graph is.  q301 is that query, and (unlike
q155) it belongs in the bench headline set.  q302 retires the
compressed-format decode boundary with a real stdlib PNG codec pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q301_sparse_cosine_topk",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
        SELECT doc_id, term,
               CAST(round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS DECIMAL(18,6)) AS w
        FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    topw AS (
        SELECT doc_id, term, w FROM (
            SELECT doc_id, term, w,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY w DESC, term) AS rn
            FROM w
        ) WHERE rn <= 10
    ),
    norms AS (
        SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS nrm FROM topw GROUP BY doc_id
    ),
    pruned AS (
        SELECT doc_id, term, w FROM (
            SELECT doc_id, term, w,
                   row_number() OVER (PARTITION BY term
                                      ORDER BY w DESC, doc_id) AS pr
            FROM topw
        ) WHERE pr <= 200
    ),
    dots AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(sum(a.w * b.w) AS DOUBLE) AS dot
        FROM pruned a JOIN pruned b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sims AS (
        SELECT d1 AS qid, d2 AS nid, dot / (na.nrm * nb.nrm) AS cosine
        FROM dots JOIN norms na ON d1 = na.doc_id
                  JOIN norms nb ON d2 = nb.doc_id
        UNION ALL
        SELECT d2, d1, dot / (na.nrm * nb.nrm)
        FROM dots JOIN norms na ON d1 = na.doc_id
                  JOIN norms nb ON d2 = nb.doc_id
    )
    SELECT qid, nid, CAST(rnk AS INT) AS rank, round(cosine, 6) AS cosine
    FROM (
        SELECT qid, nid, cosine,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, nid) AS rnk
        FROM sims
    ) WHERE rnk <= 3
    """,
)
def q301_sparse_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 lexical neighbors by sparse TF-IDF cosine over
    each doc's 10 most distinctive terms — q155's retrieval twin with
    LINEAR output: every document reports exactly its k best matches,
    so the result is O(n·k) no matter how dense the similarity graph.

    Scale shape: docs reduce to 10 decimal-weighted postings before any
    pairing; each term's posting list is impact-pruned to its top-200
    weights (Anh & Moffat) so the candidate join is bounded by
    Σ_t min(|postings(t)|, 200)² — never docs², even on a
    shared-vocabulary corpus; dot products accumulate in exact DECIMAL
    and convert to double once.  The admission ranking is a
    PER-DOCUMENT window — partitioned by qid, embarrassingly parallel,
    nothing like q13's global-top-k problem — ordered by the
    bit-deterministic cosine (exact-decimal dot ÷ product of IEEE sqrt
    norms is identical on any engine) with nid as tiebreak, so the
    oracle twin picks the identical neighbor set."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency FROM tf, not from a second tokenize pass: tf has
    # exactly one row per (doc, term), so count(*) per term IS
    # count(DISTINCT doc_id) — and the tf subtree now appears on both
    # paths, so its exchange is computed once (ReuseExchange) instead of
    # the corpus being exploded and distinct-aggregated twice
    # (round 11, guide §2.3/§2.4: one tokenize pass, no countDistinct
    # double exchange)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            )
            .cast("decimal(18,6)")
            .alias("w"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("w").desc(), "term")
    )
    # persisted: the weighted-postings frame feeds the norms, both sides
    # of the candidate join, and (via them) both union branches — without
    # the cache the tokenize→tf→idf chain replicates ~8× in the plan
    topw = (
        w.withColumn("rn", rn)
        .where(F.col("rn") <= 10)
        .select("doc_id", "term", "w")
        .transform(spersist)
    )
    # per-doc norm as a WINDOW over topw (partitioned by doc_id — the
    # partitioning topw's own admission window just established, so no
    # exchange) and CARRIED THROUGH the postings into the pair join:
    # the norm then rides the candidate rows and re-attaches to each
    # (d1, d2) pair via first() inside the dot-product aggregation,
    # replacing the two pair-grain norm joins of the previous plan
    # (round 11, guide §2.3 "shuffle keys and metadata instead of
    # payloads" / §2.4 — at 100 TB the pair frame is the biggest frame
    # in this query and it no longer re-shuffles twice to pick up
    # norms).  sum(w*w) is an exact DECIMAL sum, so window-vs-groupBy
    # evaluation order cannot change a bit of the double it casts to.
    nrm = F.sqrt(
        F.sum(F.col("w") * F.col("w"))
        .over(Window.partitionBy("doc_id"))
        .cast("double")
    )
    topn = topw.withColumn("nrm", nrm)
    # Impact-ordered posting pruning (Anh & Moffat): each term's posting
    # list keeps only its 200 highest-weight docs, so the candidate join
    # is bounded by Σ_t min(|postings(t)|, 200)² — the knob that makes
    # lexical top-k retrieval scale past a shared-vocabulary corpus
    # where raw postings² is quadratic.  Deterministic (w desc, doc_id)
    # cut, mirrored term-for-term in the oracle.
    pr = F.row_number().over(
        Window.partitionBy("term").orderBy(F.col("w").desc(), "doc_id")
    )
    pruned = (
        topn.withColumn("pr", pr)
        .where(F.col("pr") <= 200)
        .select("doc_id", "term", "w", "nrm")
    )
    a = pruned.select(
        F.col("doc_id").alias("d1"), "term", F.col("w").alias("wa"),
        F.col("nrm").alias("na"),
    )
    b = pruned.select(
        F.col("doc_id").alias("d2"), "term", F.col("w").alias("wb"),
        F.col("nrm").alias("nb"),
    )
    # na/nb are constant within a (d1, d2) group (one doc, one norm), so
    # first() re-attaches them with zero extra joins
    dots = (
        a.join(b, "term")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).cast("double").alias("dot"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    cos = dots.select(
        "d1", "d2", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine")
    )
    # mirror both directions with ONE pass over the pair frame (inline of
    # a 2-element struct array) instead of union+persist — the pair frame
    # is consumed once, so the cache and its second scan go away
    sims = cos.select(
        F.inline(
            F.array(
                F.struct(
                    F.col("d1").alias("qid"), F.col("d2").alias("nid"), F.col("cosine")
                ),
                F.struct(
                    F.col("d2").alias("qid"), F.col("d1").alias("nid"), F.col("cosine")
                ),
            )
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "nid")
    )
    return (
        sims.withColumn("rank", rnk)
        .where(F.col("rank") <= 3)
        .select("qid", "nid", F.col("rank").cast("int").alias("rank"),
                F.round("cosine", 6).alias("cosine"))
    )


@query(
    "q302_png_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(16 + doc_id % 8 AS INT) AS width,
               CAST(8 + doc_id % 5 AS INT) AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           CAST(list_sum(list_transform(range(width * height),
                p -> (doc_id * 31 + (p * 3 + 0) * 97) % 256)) AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(range(width * height),
                p -> (doc_id * 31 + (p * 3 + 1) * 97) % 256)) AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(range(width * height),
                p -> (doc_id * 31 + (p * 3 + 2) * 97) % 256)) AS BIGINT) AS sum_b
    FROM dims
    """,
)
def q302_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED image decode end-to-end: one real PNG per document
    (stdlib-built: zlib-deflated IDAT, chunk CRCs, per-scanline
    None/Sub/Up filters actually applied at encode time) → full
    stdlib-only decode (signature + CRC verification, inflate, 5-type
    unfiltering) → per-channel integer sums, oracle-checked against the
    same closed-form pixel formula as q194.  This retires the round-2
    NotImplementedError boundary for compressed formats: the only
    still-stubbed codecs are ones whose decoders genuinely aren't in
    this container (jpeg/mp3/h264).

    Same no-media-on-the-exchange shape as q193/q194: payload bytes are
    born and die inside two mapInPandas stages on one partitioning."""
    from udacity_datalake_spark_spark.operators.multimodal import (
        decode_media,
        synthesize_png_payload,
    )

    d = read_table(spark, sf_dir, "documents", columns=["doc_id"])
    return decode_media(synthesize_png_payload(d), "png")
