"""Wave 65: governance + corpus-statistics + vector-ops depth —
l-diversity audit, Heaps-law vocabulary growth, Matryoshka embedding
truncation agreement, per-step deadline funnel, functional-dependency
discovery.

Reference parity note: the reference (/root/reference/etl.py) has no
governance/profiling surface; these extend k-anonymity (q322), vocab
statistics (q120/q254), ANN (q48/q364 pairs with q313's quantizer
audit), the funnel family (q126/q346), and the DQ family (q72/q157).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

L_DIVERSITY = 3


@query(
    "q362_l_diversity_audit",
    oracle=f"""
    WITH sens AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT) AS bal_band
        FROM customer
    ),
    cells AS (
        SELECT c_nationkey AS nation, c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS k_size,
               CAST(count(DISTINCT bal_band) AS BIGINT) AS l_distinct
        FROM sens GROUP BY 1, 2
    )
    SELECT nation, segment, k_size, l_distinct,
           l_distinct >= {L_DIVERSITY} AS meets_l
    FROM cells
    """,
)
def q362_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the privacy check one level past q322's
    k-anonymity: each quasi-identifier cell (nation × segment) must
    contain at least l={L_DIVERSITY} DISTINCT sensitive values (account
    balance band), otherwise membership in the cell reveals the
    sensitive attribute even when the cell is k-anonymous.

    Scale shape: one cell-grain aggregate (bounded: |nations| ×
    |segments|) with a distinct count inside; the sensitive banding is
    per-row codegen."""
    c = read_table(
        spark, sf_dir, "customer", columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    sens = c.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal").cast("double") / 1000).cast("long").alias("bal_band"),
    )
    return sens.groupBy("nation", "segment").agg(
        F.count(F.lit(1)).cast("long").alias("k_size"),
        F.count_distinct("bal_band").alias("l_distinct"),
    ).select(
        "nation",
        "segment",
        "k_size",
        "l_distinct",
        (F.col("l_distinct") >= L_DIVERSITY).alias("meets_l"),
    )


@query(
    "q363_heaps_law",
    oracle="""
    WITH ranked_docs AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) AS drank,
               count(*) OVER () AS nd
        FROM documents
    ),
    firsts AS (
        SELECT t.token, min(r.drank) AS first_rank
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ) t JOIN ranked_docs r ON r.doc_id = t.doc_id
        GROUP BY t.token
    ),
    deciles AS (
        SELECT f.token,
               CAST(ceil(f.first_rank * 10.0 / r.nd) AS BIGINT) AS decile
        FROM firsts f CROSS JOIN (SELECT max(nd) AS nd FROM ranked_docs) r
    ),
    per_decile AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS new_tokens
        FROM deciles GROUP BY decile
    ),
    grid AS (SELECT unnest(range(1, 11)) AS decile)
    SELECT CAST(g.decile AS BIGINT) AS decile,
           CAST(sum(COALESCE(p.new_tokens, 0)) OVER (
               ORDER BY g.decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS vocab_cum,
           CAST(COALESCE(p.new_tokens, 0) AS BIGINT) AS new_tokens
    FROM grid g LEFT JOIN per_decile p ON p.decile = g.decile
    """,
)
def q363_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative distinct-token count as
    the corpus grows doc by doc (in doc_id order), reported at corpus
    deciles — the curve that tells a tokenizer team how fast vocabulary
    saturates (V ≈ K·nᵝ) and whether more data still buys new types
    (pairs with q120's vocab build and q254's token entropy).

    Scale shape: each token reduces to its FIRST-occurrence doc rank
    (one min aggregate over the exploded stream — no per-prefix rescan);
    the decile bucketing and running sum act on ≤10 rows.  Doc ranks
    come from the two-phase global_row_number (no single-partition
    corpus sort)."""
    from udacity_datalake_spark_spark.operators.topk import global_row_number

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    ranked = global_row_number(
        d.select("doc_id"), [F.col("doc_id")], "doc_id", out_col="drank"
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    firsts = (
        toks.join(ranked, "doc_id")
        .groupBy("token")
        .agg(F.min("drank").alias("first_rank"))
    )
    deciles = (
        firsts.crossJoin(F.broadcast(nd))
        .select(
            F.ceil(F.col("first_rank") * 10.0 / F.col("nd")).cast("long").alias("decile")
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("long").alias("new_tokens"))
    )
    grid = spark.range(1, 11).select(F.col("id").alias("decile"))
    joined = grid.join(deciles, "decile", "left").select(
        "decile", F.coalesce("new_tokens", F.lit(0)).alias("new_tokens")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        F.col("decile").cast("long").alias("decile"),
        F.sum("new_tokens").over(w).cast("long").alias("vocab_cum"),
        F.col("new_tokens").cast("long").alias("new_tokens"),
    )


MRL_DIM = 16
MRL_TOPK = 10

# full-dim vs truncated-dim cosine rankings share this SQL skeleton
_MRL_RANK_SQL = """
        SELECT q.qid, e.vec_id AS nid,
               round(
                 list_sum(list_transform(range(1, {d} + 1),
                          i -> CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1, {d} + 1),
                          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, {d} + 1),
                          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
               , 6) AS sim
        FROM embeddings e
        CROSS JOIN (SELECT vec_id AS qid, embedding AS qv
                    FROM embeddings WHERE vec_id < 5) q
        WHERE e.vec_id != q.qid
"""


@query(
    "q364_matryoshka_agreement",
    oracle=f"""
    WITH full_scored AS ({_MRL_RANK_SQL.format(d=64)}),
    trunc_scored AS ({_MRL_RANK_SQL.format(d=MRL_DIM)}),
    full_top AS (
        SELECT qid, nid FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS r
            FROM full_scored) WHERE r <= {MRL_TOPK}
    ),
    trunc_top AS (
        SELECT qid, nid FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS r
            FROM trunc_scored) WHERE r <= {MRL_TOPK}
    )
    SELECT f.qid,
           CAST(count(t.nid) AS BIGINT) AS n_overlap,
           round(CAST(count(t.nid) AS DOUBLE)
                 / (2 * {MRL_TOPK} - count(t.nid)), 6) AS jaccard
    FROM full_top f LEFT JOIN trunc_top t
      ON t.qid = f.qid AND t.nid = f.nid
    GROUP BY f.qid
    """,
)
def q364_matryoshka_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: top-{MRL_TOPK} neighbor agreement
    between the full 64-dim cosine ranking and the ranking from only
    the leading {MRL_DIM} dims — the go/no-go measurement for using
    truncated embeddings as a cheap first-stage filter (MRL-style
    two-stage retrieval: search at {MRL_DIM}d, re-rank survivors at
    64d).  Low overlap means the leading blocks don't carry the
    similarity structure and truncation would silently change results
    (complements q313's int8 quantization audit and q347's covariance
    block).

    Scale shape: two brute-force rankings over the broadcast 5-query
    set (one corpus scan each, codegen cosine on the sliced array),
    per-query top-k windows, one overlap join on (qid, nid)."""
    from udacity_datalake_spark_spark.operators.similarity import cosine_topk

    emb = read_table(spark, sf_dir, "embeddings").transform(spersist)
    queries = emb.where(F.col("vec_id") < 5)
    full_top = cosine_topk(emb, queries, k=MRL_TOPK).select("qid", "nid")
    trunc = emb.select("vec_id", F.slice("embedding", 1, MRL_DIM).alias("embedding"))
    trunc_top = cosine_topk(
        trunc, trunc.where(F.col("vec_id") < 5), k=MRL_TOPK
    ).select(F.col("qid").alias("tqid"), F.col("nid").alias("tnid"))
    overlap = full_top.join(
        trunc_top,
        (F.col("qid") == F.col("tqid")) & (F.col("nid") == F.col("tnid")),
        "left",
    )
    return overlap.groupBy("qid").agg(
        F.count("tnid").cast("long").alias("n_overlap"),
        F.round(
            F.count("tnid").cast("double") / (2 * MRL_TOPK - F.count("tnid")), 6
        ).alias("jaccard"),
    )


STEP_WINDOW_HOURS = 24


@query(
    "q365_deadline_funnel",
    oracle=f"""
    WITH stream AS (
        SELECT user_id, event_id, ts,
               CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
                    ELSE 2 END AS kind
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    annotated AS (
        SELECT user_id, ts, kind,
               min(CASE WHEN kind = 1 THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_click_ts,
               min(CASE WHEN kind = 2 THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_purchase_ts
        FROM stream
    ),
    clicks AS (
        SELECT user_id, ts AS cts, next_purchase_ts
        FROM annotated WHERE kind = 1
    ),
    step2 AS (
        SELECT user_id, ts AS vts, next_click_ts
        FROM annotated
        WHERE kind = 0
          AND next_click_ts IS NOT NULL
          AND epoch_us(next_click_ts) - epoch_us(ts)
              <= {STEP_WINDOW_HOURS * 3600 * 1_000_000}
    ),
    step3 AS (
        SELECT s.user_id
        FROM step2 s JOIN clicks c
          ON c.user_id = s.user_id AND c.cts = s.next_click_ts
        WHERE c.next_purchase_ts IS NOT NULL
          AND epoch_us(c.next_purchase_ts) - epoch_us(c.cts)
              <= {STEP_WINDOW_HOURS * 3600 * 1_000_000}
    )
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM annotated WHERE kind = 0) AS n_views,
        (SELECT CAST(count(*) AS BIGINT) FROM step2) AS n_reached_click,
        (SELECT CAST(count(*) AS BIGINT) FROM step3) AS n_reached_purchase,
        (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM step3)
            AS n_converting_users
    """,
)
def q365_deadline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step deadline funnel: view → click within 24 h → purchase
    within 24 h OF THE CLICK — the funnel variant where every step has
    its own attribution window (q126 is strict-order with no deadline;
    q346 is one deadline end-to-end).  Each step advances to the FIRST
    qualifying next event, the standard product-analytics semantics.

    Scale shape: two forward-min windows on ONE user-keyed exchange of
    the merged stream (O(1) state per row — no view×click×purchase
    triple join); step 3 is an equi-join of step-2 survivors back to
    the click rows on (user, ts)."""
    e = read_table(
        spark, sf_dir, "events", columns=["event_id", "event_type", "user_id", "ts"]
    )
    stream = e.where(F.col("event_type").isin("view", "click", "purchase")).select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "view", 0)
        .when(F.col("event_type") == "click", 1)
        .otherwise(2)
        .alias("kind"),
    )
    wfwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    annotated = stream.select(
        "user_id",
        "ts",
        "kind",
        F.min(F.when(F.col("kind") == 1, F.col("ts"))).over(wfwd).alias("next_click_ts"),
        F.min(F.when(F.col("kind") == 2, F.col("ts")))
        .over(wfwd)
        .alias("next_purchase_ts"),
    ).transform(spersist)
    us = STEP_WINDOW_HOURS * 3600 * 1_000_000
    step2 = annotated.where(
        (F.col("kind") == 0)
        & F.col("next_click_ts").isNotNull()
        & (F.unix_micros("next_click_ts") - F.unix_micros("ts") <= us)
    ).select("user_id", F.col("next_click_ts").alias("cts"))
    clicks = annotated.where(F.col("kind") == 1).select(
        "user_id", F.col("ts").alias("cts"), "next_purchase_ts"
    )
    step3 = step2.join(clicks, ["user_id", "cts"]).where(
        F.col("next_purchase_ts").isNotNull()
        & (F.unix_micros("next_purchase_ts") - F.unix_micros("cts") <= us)
    )
    n_views = annotated.where(F.col("kind") == 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_views")
    )
    n_step2 = step2.agg(F.count(F.lit(1)).cast("long").alias("n_reached_click"))
    n_step3 = step3.agg(
        F.count(F.lit(1)).cast("long").alias("n_reached_purchase"),
        F.count_distinct("user_id").alias("n_converting_users"),
    )
    return (
        n_views.crossJoin(F.broadcast(n_step2)).crossJoin(F.broadcast(n_step3))
    )


#: candidate functional dependencies (determinant → dependent), chosen
#: so the audit exercises both true FDs and a genuinely violated one
FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),  # key → attribute: holds
    ("part", "p_partkey", "p_brand"),  # key → attribute: holds
    ("orders", "o_custkey", "o_orderpriority"),  # repeat buyers: violated
    ("customer", "c_nationkey", "c_mktsegment"),  # demographic: violated
)


@query(
    "q366_fd_discovery",
    oracle="""
    WITH checks AS (
        SELECT 'orders.o_orderkey->o_custkey' AS fd,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating
        FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS nd
              FROM orders GROUP BY 1)
        UNION ALL
        SELECT 'part.p_partkey->p_brand',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM (SELECT p_partkey, count(DISTINCT p_brand) AS nd
              FROM part GROUP BY 1)
        UNION ALL
        SELECT 'orders.o_custkey->o_orderpriority',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
              FROM orders GROUP BY 1)
        UNION ALL
        SELECT 'customer.c_nationkey->c_mktsegment',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS nd
              FROM customer GROUP BY 1)
    )
    SELECT fd, n_groups, n_violating, n_violating = 0 AS holds
    FROM checks
    """,
)
def q366_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs —
    the data-profiling op (Metanome-style) that finds which columns
    determine which: for each candidate A→B, count determinant groups
    whose dependent has >1 distinct value.  Key→attribute FDs must
    hold (a violation means corrupted ingestion — the q157/q158 DQ
    family's structural cousin); demographic candidates are expected
    to fail, pinning that the audit actually discriminates.

    Scale shape: one (determinant)-grain distinct-count aggregate per
    candidate (map-side combined), unioned into a bounded report — the
    fact is never joined, only scanned."""
    frames = []
    for table, det, dep in FD_CANDIDATES:
        t = read_table(spark, sf_dir, table, columns=[det, dep])
        per = t.groupBy(det).agg(F.count_distinct(dep).alias("nd"))
        frames.append(
            per.agg(
                F.lit(f"{table}.{det}->{dep}").alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.select(
        "fd", "n_groups", "n_violating", (F.col("n_violating") == 0).alias("holds")
    )
