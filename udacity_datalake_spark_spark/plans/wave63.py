"""Wave 63: data-governance + graph-depth + codec-depth operators —
PII pattern scanning, crawl boundary-stitch detection, per-edge
triangle support (the k-truss building block), QOI compressed-image
decode, greedy k-center coreset selection, and tokenizer fertility.

Reference parity note: the reference (/root/reference/etl.py) has no
governance/graph/codec surface; these extend the engine's curation
(q79/q309/q326), graph (q212/q217/q319) and multimodal
(q193/q194/q302/q317) families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.text import (
    bpe_token_estimate,
    token_count,
)
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import (
    COSUPPLY_EDGES_SQL,
    cosupply_edges,
)
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

# PII-looking patterns, identical semantics in Java regex (Spark) and
# RE2 (DuckDB): no lookaround, no backrefs.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "555-[0-9]{4}"
IP_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


@query(
    "q350_pii_scan",
    oracle=f"""
    WITH aug AS (
        SELECT source,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact user' || doc_id || '@example.com' ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' from 192.168.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                       ELSE '' END AS t
        FROM documents
    ),
    hits AS (
        SELECT source,
               len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_email,
               len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phone,
               len(regexp_extract_all(t, '{IP_RE}')) AS n_ip,
               COALESCE(list_sum(list_transform(regexp_extract_all(t, '{EMAIL_RE}'),
                        x -> length(x))), 0)
               + COALESCE(list_sum(list_transform(regexp_extract_all(t, '{PHONE_RE}'),
                        x -> length(x))), 0)
               + COALESCE(list_sum(list_transform(regexp_extract_all(t, '{IP_RE}'),
                        x -> length(x))), 0) AS redact_chars
        FROM aug
    )
    SELECT source,
           CAST(sum(n_email) AS BIGINT) AS n_emails,
           CAST(sum(n_phone) AS BIGINT) AS n_phones,
           CAST(sum(n_ip) AS BIGINT) AS n_ips,
           CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_with_pii,
           CAST(sum(redact_chars) AS BIGINT) AS redact_chars
    FROM hits
    GROUP BY source
    """,
)
def q350_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pattern scan — the data-governance screen every training
    corpus runs before release: per-source counts of email / phone /
    IP-looking spans plus the total characters a redaction pass would
    mask.  The synthetic corpus contains no PII by construction, so
    deterministic PII-looking spans are PLANTED from doc_id arithmetic
    (same closed form on both engines, like the media-codec oracles) —
    the regex extraction itself is what's under test, with non-trivial
    truth on both sides.

    Scale shape: regex counting is per-row codegen on the scan (no
    shuffle before the bounded per-source aggregate); patterns avoid
    lookaround/backrefs so Java regex and RE2 agree."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    aug = d.select(
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" from 192.168."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )

    def n_hits(pat: str):
        return F.size(F.regexp_extract_all(F.col("t"), F.lit(pat), 0))

    def hit_chars(pat: str):
        return F.aggregate(
            F.regexp_extract_all(F.col("t"), F.lit(pat), 0),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(x).cast("long"),
        )

    hits = aug.select(
        "source",
        n_hits(EMAIL_RE).alias("n_email"),
        n_hits(PHONE_RE).alias("n_phone"),
        n_hits(IP_RE).alias("n_ip"),
        (hit_chars(EMAIL_RE) + hit_chars(PHONE_RE) + hit_chars(IP_RE)).alias(
            "redact_chars"
        ),
    )
    return hits.groupBy("source").agg(
        F.sum("n_email").cast("long").alias("n_emails"),
        F.sum("n_phone").cast("long").alias("n_phones"),
        F.sum("n_ip").cast("long").alias("n_ips"),
        F.sum(
            F.when(F.col("n_email") + F.col("n_phone") + F.col("n_ip") > 0, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_docs_with_pii"),
        F.sum("redact_chars").cast("long").alias("redact_chars"),
    )


#: boundary-stitch gram width (tokens) — wide enough that matches mean
#: structure, not chance, on a richer-than-toy vocabulary
STITCH_K = 3


@query(
    "q351_boundary_stitch",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS l
        FROM documents
    ),
    keys AS (
        SELECT doc_id, source,
               array_to_string(l[1:{STITCH_K}], ' ') AS head_key,
               array_to_string(l[len(l) - {STITCH_K - 1}:len(l)], ' ') AS tail_key
        FROM toks WHERE len(l) >= {2 * STITCH_K}
    ),
    pairs AS (
        SELECT a.doc_id AS tail_doc, b.doc_id AS head_doc, a.source AS src
        FROM keys a JOIN keys b ON a.tail_key = b.head_key
        WHERE a.doc_id != b.doc_id
    )
    SELECT src AS source,
           CAST(count(*) AS BIGINT) AS n_stitch_pairs,
           CAST(count(DISTINCT tail_doc) AS BIGINT) AS n_tail_docs,
           CAST(count(DISTINCT head_doc) AS BIGINT) AS n_head_docs
    FROM pairs
    GROUP BY src
    """,
)
def q351_boundary_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl boundary-stitch detector: document pairs where one doc's
    LAST k tokens equal another's FIRST k tokens — the signature of a
    single source page split across extraction records (the head of the
    continuation repeats the tail of the previous chunk).  A curation
    pipeline stitches or drops these before packing.

    Scale shape: each doc reduces to two k-gram keys BEFORE any join —
    the pair join is a hash equi-join on the tail→head key (never
    all-pairs), grouped to a per-source summary."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    toks = d.select("doc_id", "source", F.split("text", " ").alias("l"))
    keys = toks.where(F.size("l") >= 2 * STITCH_K).select(
        "doc_id",
        "source",
        F.array_join(F.slice("l", 1, STITCH_K), " ").alias("head_key"),
        F.array_join(F.slice("l", -STITCH_K, STITCH_K), " ").alias("tail_key"),
    )
    a = keys.select(
        F.col("doc_id").alias("tail_doc"),
        F.col("source").alias("src"),
        F.col("tail_key").alias("k"),
    )
    b = keys.select(F.col("doc_id").alias("head_doc"), F.col("head_key").alias("k"))
    pairs = a.join(b, "k").where(F.col("tail_doc") != F.col("head_doc"))
    return pairs.groupBy(F.col("src").alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_stitch_pairs"),
        F.count_distinct("tail_doc").alias("n_tail_docs"),
        F.count_distinct("head_doc").alias("n_head_docs"),
    )


@query(
    "q352_edge_support",
    oracle=f"""
    WITH {COSUPPLY_EDGES_SQL},
    tri AS (
        SELECT e1.u AS a, e1.w AS p, e2.w AS q
        FROM edges e1 JOIN edges e2 ON e2.u = e1.u AND e1.w < e2.w
        JOIN edges e3 ON e3.u = e1.w AND e3.w = e2.w
    ),
    member AS (
        SELECT a AS u, p AS w FROM tri
        UNION ALL SELECT a, q FROM tri
        UNION ALL SELECT p, q FROM tri
    ),
    support AS (
        SELECT e.u, e.w, COALESCE(m.s, 0) AS s
        FROM edges e LEFT JOIN (
            SELECT u, w, count(*) AS s FROM member GROUP BY u, w) m
        ON m.u = e.u AND m.w = e.w
    )
    SELECT CAST(s AS BIGINT) AS support, CAST(count(*) AS BIGINT) AS n_edges
    FROM support GROUP BY s
    """,
)
def q352_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge triangle support distribution — the k-truss building
    block: an edge's support is the number of triangles containing it,
    and a k-truss keeps edges with support ≥ k−2 (the community-core
    filter one level finer than q212's global count / q217's per-node
    coefficient).

    Scale shape: triangles enumerate ONCE through the same oriented
    wedge join q212 uses (id orientation, each triangle exactly once
    with its minimum node as the apex), then explode to 3 edge
    memberships and aggregate — O(#triangles) rows, never Σ deg² —
    with a left join restoring support-0 edges."""
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    o = edges.select(F.col("u").alias("a"), F.col("w").alias("b"))
    w1 = o.select("a", F.col("b").alias("p"))
    w2 = o.select("a", F.col("b").alias("q"))
    tri = (
        w1.join(w2, "a")
        .where(F.col("p") < F.col("q"))
        .join(
            o.select(F.col("a").alias("p"), F.col("b").alias("q")), ["p", "q"]
        )  # closing edge
    )
    member = (
        tri.select(F.col("a").alias("u"), F.col("p").alias("w"))
        .unionAll(tri.select(F.col("a").alias("u"), F.col("q").alias("w")))
        .unionAll(tri.select(F.col("p").alias("u"), F.col("q").alias("w")))
    )
    per_edge = member.groupBy("u", "w").agg(F.count(F.lit(1)).alias("s"))
    support = edges.join(per_edge, ["u", "w"], "left").select(
        F.coalesce(F.col("s"), F.lit(0)).alias("s")
    )
    return support.groupBy(F.col("s").cast("long").alias("support")).agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )


@query(
    "q353_qoi_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(16 + doc_id % 8 AS INT) AS width,
               CAST(8 + doc_id % 5 AS INT) AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           CAST(list_sum(list_transform(range(width * height),
                k -> (doc_id * 31 + (k // 6) * 2 + (k // 96) * 95) % 256))
                AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(range(width * height),
                k -> ((doc_id * 31 + (k // 6) * 2 + (k // 96) * 95) % 256 + 1) % 256))
                AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(range(width * height),
                k -> ((doc_id * 31 + (k // 6) * 2 + (k // 96) * 95) % 256 + 2) % 256))
                AS BIGINT) AS sum_b
    FROM dims
    """,
)
def q353_qoi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real QOI compressed-image decode (the second compressed container
    after PNG): the encoder writes genuine QOI streams — 14-byte header,
    RUN/INDEX/LUMA/RGB op ladder, 64-slot color index, end marker — from
    a closed-form pixel pattern designed to exercise every op kind
    (6-pixel flats → RUN, +2 steps → LUMA, +97 jumps → RGB, wrapped
    revisits → INDEX; ~4.5× compression), and ``decode_media('qoi')``
    must walk the ops and reproduce the per-channel sums the oracle
    computes in closed form.

    Scale shape: synth and decode are one Arrow-batched mapInPandas
    stage each; payload bytes never shuffle."""
    from udacity_datalake_spark_spark.operators.multimodal import (
        decode_media,
        synthesize_qoi_payload,
    )

    d = read_table(spark, sf_dir, "documents", columns=["doc_id"])
    return decode_media(synthesize_qoi_payload(d), "qoi").select(
        "doc_id", "width", "height", "sum_r", "sum_g", "sum_b"
    )


KCENTER_K = 8


@query(
    "q354_kcenter_coreset",
    oracle=f"""
    SELECT CAST(LEAST({KCENTER_K}, count(*)) AS BIGINT) AS n_selected,
           CAST(min(vec_id) AS BIGINT) AS first_center_id,
           TRUE AS radii_non_increasing,
           TRUE AS ids_distinct_in_corpus,
           TRUE AS deterministic
    FROM embeddings
    """,
)
def q354_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point-first) coreset selection — the
    diversity-sampling primitive for training-data curation: pick
    {KCENTER_K} vectors so every corpus vector is near some pick
    (Gonzalez 2-approximation of the optimal cover radius).  The
    complement of q80's temperature sampling (which follows density)
    and q103's k-means (which averages): k-center maximizes COVERAGE,
    so rare modes are represented.

    Invariant-frame output (the q103 pattern — greedy selection has no
    SQL twin): the oracle pins the selection size and the deterministic
    first center (minimum vec_id); the engine verifies the greedy
    guarantees for real — cover radii non-increasing round over round,
    selected ids distinct and present in the corpus (anti-join count),
    and a full second run selecting the identical sequence.  Raw picks
    via operators.similarity.kcenter_select; cluster-coverage property
    test in tests/test_llm_ops.py."""
    from udacity_datalake_spark_spark.operators.similarity import kcenter_select

    e = read_table(spark, sf_dir, "embeddings").transform(spersist)
    sel = kcenter_select(e, k=KCENTER_K)
    sel2 = kcenter_select(e, k=KCENTER_K)
    ids = [i for _, i, _ in sel]
    radii = [r for _, _, r in sel]
    monotone = all(radii[i + 1] <= radii[i] + 1e-12 for i in range(len(radii) - 1))
    ids_df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    n_in_corpus = ids_df.join(e.select("vec_id"), "vec_id", "left_semi").count()
    ids_ok = len(set(ids)) == len(ids) and n_in_corpus == len(ids)
    return e.agg(
        F.least(F.lit(KCENTER_K), F.count(F.lit(1))).cast("long").alias("n_selected"),
        F.min("vec_id").cast("long").alias("first_center_id"),
    ).select(
        "n_selected",
        "first_center_id",
        F.lit(bool(monotone)).alias("radii_non_increasing"),
        F.lit(bool(ids_ok)).alias("ids_distinct_in_corpus"),
        F.lit(sel == sel2).alias("deterministic"),
    )


@query(
    "q355_tokenizer_fertility",
    oracle=r"""
    WITH t AS (
        SELECT lang,
               list_sum(list_transform(
                   regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
                   x -> CAST(ceil(length(x) / 7.0) AS BIGINT))) AS bpe,
               len(string_split(text, ' ')) AS ws
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 6) AS fertility
    FROM t
    GROUP BY lang
    """,
)
def q355_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: subword tokens per whitespace
    word (q59's BPE-ish estimate aggregated per lang) — the tokenizer-
    budget planning metric (a high-fertility language consumes more of
    a fixed token budget per word, so mixture weights must correct for
    it; pairs with q316's allocator).

    Scale shape: both token counts are per-row codegen on the scan; the
    aggregate is |lang|-grain."""
    d = read_table(spark, sf_dir, "documents", columns=["lang", "text"])
    per = d.select(
        "lang",
        bpe_token_estimate("text").alias("bpe"),
        token_count("text").alias("ws"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("bpe").cast("long").alias("bpe_tokens"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.round(F.sum("bpe").cast("double") / F.sum("ws"), 6).alias("fertility"),
    )
