"""Wave 75 — the q400 milestone: dedup chaining-risk audit, vector
index staleness recall, split-conformal interval calibration,
leave-one-source-out data valuation, and the corpus REFRESH-readiness
capstone composing the round-5 governance surface.

Reference parity note: the reference (/root/reference/etl.py) has no
QA/valuation surface; these extend dedup clustering (q73/q95),
ANN (q48/q364), forecasting (q250/q260), the corpus scorecard (q300),
and the governance family (q350/q351).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

#: a cluster whose weakest internal pair falls below this Jaccard is a
#: chaining suspect (transitivity glued dissimilar docs together)
CHAIN_MIN_J = 0.3

# q73's exact near-dup clusters (recursive-CTE CC), reused as the head
_CLUSTER_HEAD_SQL = """
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
    labels AS (SELECT node AS doc_id, min(lbl) AS component FROM cc
               GROUP BY node)
"""


@query(
    "q396_cluster_chaining_audit",
    oracle=_CLUSTER_HEAD_SQL
    + f""",
    cpairs AS (
        SELECT m1.component, m1.doc_id AS d1, m2.doc_id AS d2
        FROM labels m1 JOIN labels m2
          ON m2.component = m1.component AND m1.doc_id < m2.doc_id
    ),
    withj AS (
        SELECT c.component,
               round(CAST(COALESCE(p.inter, 0) AS DOUBLE)
                     / (sa.sz + sb.sz - COALESCE(p.inter, 0)), 6) AS j
        FROM cpairs c
        LEFT JOIN pairs p ON p.d1 = c.d1 AND p.d2 = c.d2
        JOIN sz sa ON sa.doc_id = c.d1
        JOIN sz sb ON sb.doc_id = c.d2
    )
    SELECT component,
           CAST(count(*) AS BIGINT) AS n_pairs,
           min(j) AS min_pair_jaccard,
           min(j) < {CHAIN_MIN_J} AS chaining_suspect
    FROM withj
    GROUP BY component
    """,
)
def q396_cluster_chaining_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup chaining-risk audit: within each near-dup cluster (q73's
    transitive closure of J ≥ 0.6 edges), the MINIMUM pairwise Jaccard
    over ALL member pairs — transitivity can glue A~B~C where A and C
    share almost nothing, and dropping C as "a duplicate of A" then
    destroys data.  Clusters whose weakest internal pair falls below
    {CHAIN_MIN_J} are flagged for canonical-selection review (the QA
    step between q73's clustering and q95's drop).

    Scale shape: clusters are small (bounded by the dup-family size),
    so the within-cluster all-pairs join is cluster-size² on member
    rows, never corpus²; exact Jaccard comes from the persisted shingle
    arrays via codegen array_intersect — no second exploded shuffle."""
    from udacity_datalake_spark_spark.operators.dedup import ngram_jaccard_pairs
    from udacity_datalake_spark_spark.operators.graph import connected_components
    from udacity_datalake_spark_spark.operators.text import shingles, tokens

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    near = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    labels = connected_components(near, "d1", "d2").select(
        F.col("node").alias("doc_id"), F.col("component")
    )
    arrs = (
        d.where(F.size(tokens("text")) >= 3)
        .select("doc_id", shingles("text", 3).alias("arr"))
        .transform(spersist)
    )
    m1 = labels.select("component", F.col("doc_id").alias("d1"))
    m2 = labels.select("component", F.col("doc_id").alias("d2"))
    cpairs = m1.join(m2, "component").where(F.col("d1") < F.col("d2"))
    withj = (
        cpairs.join(arrs.select(F.col("doc_id").alias("d1"), F.col("arr").alias("a1")), "d1")
        .join(arrs.select(F.col("doc_id").alias("d2"), F.col("arr").alias("a2")), "d2")
        .select(
            "component",
            F.round(
                F.size(F.array_intersect("a1", "a2")).cast("double")
                / (
                    F.size("a1")
                    + F.size("a2")
                    - F.size(F.array_intersect("a1", "a2"))
                ),
                6,
            ).alias("j"),
        )
    )
    return withj.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("j").alias("min_pair_jaccard"),
        (F.min("j") < CHAIN_MIN_J).alias("chaining_suspect"),
    )


STALE_FRACTION_PCT = 80  # the index covers the oldest 80% of vectors
STALE_TOPK = 10

_STALE_RANK_SQL = """
        SELECT q.qid, e.vec_id AS nid,
               round(
                 list_sum(list_transform(range(1, len(q.qv) + 1),
                          i -> CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
               , 6) AS sim
        FROM embeddings e
        CROSS JOIN (SELECT vec_id AS qid, embedding AS qv
                    FROM embeddings WHERE vec_id < 5) q
        WHERE e.vec_id != q.qid {extra}
"""


@query(
    "q397_index_staleness_recall",
    oracle=f"""
    WITH mx AS (SELECT max(vec_id) AS m FROM embeddings),
    full_top AS (
        SELECT qid, nid FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS r
            FROM ({_STALE_RANK_SQL.format(extra="")})) WHERE r <= {STALE_TOPK}
    ),
    stale_top AS (
        SELECT qid, nid FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS r
            FROM ({_STALE_RANK_SQL.format(
                extra=f"AND e.vec_id * 100 <= (SELECT m FROM mx) * {STALE_FRACTION_PCT}")})
            ) WHERE r <= {STALE_TOPK}
    )
    SELECT f.qid,
           CAST(count(s.nid) AS BIGINT) AS n_still_found,
           CAST({STALE_TOPK} - count(s.nid) AS BIGINT) AS n_missed,
           round(CAST(count(s.nid) AS DOUBLE) / {STALE_TOPK}, 6)
               AS stale_recall
    FROM full_top f LEFT JOIN stale_top s
      ON s.qid = f.qid AND s.nid = f.nid
    GROUP BY f.qid
    """,
)
def q397_index_staleness_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-index staleness cost: when the ANN index lags the corpus
    (rebuilt nightly while documents keep arriving), how much of the
    TRUE top-{STALE_TOPK} does a stale index still find?  The stale
    index covers the oldest {STALE_FRACTION_PCT}% of vectors (by id —
    the arrival proxy); recall against the full-corpus ranking is the
    SLO a vector-store SRE alarms on, and sizes the refresh cadence
    (pairs with q325's incremental LSH probe, which is the cheap
    between-rebuild mitigation).

    Scale shape: two brute-force rankings (broadcast 5-query set, one
    corpus scan each — the id filter prunes the stale scan), one
    overlap join at (query × k) grain."""
    from udacity_datalake_spark_spark.operators.similarity import cosine_topk

    emb = read_table(spark, sf_dir, "embeddings").transform(spersist)
    queries = emb.where(F.col("vec_id") < 5)
    mx = emb.agg(F.max("vec_id").alias("m"))
    stale_corpus = emb.crossJoin(F.broadcast(mx)).where(
        F.col("vec_id") * 100 <= F.col("m") * STALE_FRACTION_PCT
    ).select("vec_id", "embedding", "label")
    full_top = cosine_topk(emb, queries, k=STALE_TOPK).select("qid", "nid")
    stale_top = cosine_topk(stale_corpus, queries, k=STALE_TOPK).select(
        F.col("qid").alias("sqid"), F.col("nid").alias("snid")
    )
    overlap = full_top.join(
        stale_top,
        (F.col("qid") == F.col("sqid")) & (F.col("nid") == F.col("snid")),
        "left",
    )
    return overlap.groupBy("qid").agg(
        F.count("snid").cast("long").alias("n_still_found"),
        (F.lit(STALE_TOPK) - F.count("snid")).cast("long").alias("n_missed"),
        F.round(F.count("snid").cast("double") / STALE_TOPK, 6).alias(
            "stale_recall"
        ),
    )


CONFORMAL_ALPHA_PCT = 10  # 90% target coverage
CAL_SPLIT_PCT = 70


@query(
    "q398_conformal_calibration",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(sum(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0)
                        AS BIGINT)) AS BIGINT) AS rev
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    pred AS (
        SELECT d, rev,
               lag(rev, 7) OVER (ORDER BY d) AS yhat,
               row_number() OVER (ORDER BY d) AS rn,
               count(*) OVER () AS n
        FROM daily
    ),
    scored AS (
        SELECT d, abs(rev - yhat) AS resid, rn, n,
               rn * 100 <= n * {CAL_SPLIT_PCT} AS is_cal
        FROM pred WHERE yhat IS NOT NULL
    ),
    cal AS (
        SELECT resid, row_number() OVER (ORDER BY resid, d) AS rr,
               count(*) OVER () AS nc
        FROM scored WHERE is_cal
    ),
    qhat AS (
        -- split-conformal: the ceil((n+1)(1-alpha))-th smallest residual
        SELECT resid AS q FROM cal
        WHERE rr = LEAST(CAST(ceil((nc + 1) * (100 - {CONFORMAL_ALPHA_PCT}) / 100.0)
                              AS BIGINT), nc)
    )
    SELECT (SELECT CAST(max(nc) AS BIGINT) FROM cal) AS n_calibration,
           CAST((SELECT count(*) FROM scored WHERE NOT is_cal) AS BIGINT)
               AS n_test,
           (SELECT CAST(q AS BIGINT) FROM qhat) AS qhat_cents,
           round((SELECT CAST(count(*) FILTER (resid <= (SELECT q FROM qhat))
                         AS DOUBLE) / count(*)
                  FROM scored WHERE NOT is_cal), 6) AS test_coverage
    """,
)
def q398_conformal_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction-interval calibration for the
    seasonal-naive forecaster (ŷ_t = rev_{t−7}): the distribution-free
    interval machinery modern forecasting SLAs use — q̂ is the
    ⌈(n+1)(1−α)⌉-th smallest calibration-window |residual| (first
    {CAL_SPLIT_PCT}% of days), and the held-out coverage (share of test
    days with |error| ≤ q̂) empirically validates the 90% target
    without ANY distributional assumption (q260's backtest scores point
    accuracy; this calibrates the interval around it).  Residuals and
    q̂ stay exact integer cents; the order statistic is a rank lookup.

    Scale shape: fact → day grain; one lag window, one rank window over
    the bounded calibration series, one filtered aggregate for
    coverage."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long")
            )
            .cast("long")
            .alias("rev")
        )
    )
    wd = Window.orderBy("d")
    pred = daily.select(
        "d",
        "rev",
        F.lag("rev", 7).over(wd).alias("yhat"),
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    scored = pred.where(F.col("yhat").isNotNull()).select(
        "d",
        F.abs(F.col("rev") - F.col("yhat")).alias("resid"),
        (F.col("rn") * 100 <= F.col("n") * CAL_SPLIT_PCT).alias("is_cal"),
    ).transform(spersist)
    cal = scored.where("is_cal").select(
        "resid",
        F.row_number().over(Window.orderBy("resid", "d")).alias("rr"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nc"),
    )
    qhat = cal.where(
        F.col("rr")
        == F.least(
            F.ceil((F.col("nc") + 1) * (100 - CONFORMAL_ALPHA_PCT) / 100.0).cast(
                "long"
            ),
            F.col("nc"),
        )
    ).agg(F.min("resid").cast("long").alias("q"), F.max("nc").cast("long").alias("nc"))
    test = scored.where(~F.col("is_cal"))
    cov = test.crossJoin(F.broadcast(qhat)).agg(
        F.max("nc").alias("n_calibration"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.max("q").alias("qhat_cents"),
        F.round(
            F.sum(F.when(F.col("resid") <= F.col("q"), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("test_coverage"),
    )
    return cov.select("n_calibration", "n_test", "qhat_cents", "test_coverage")


@query(
    "q399_source_ablation_value",
    oracle="""
    WITH q AS (
        SELECT source,
               CAST(len(list_distinct(string_split(text, ' '))) * 1000000
                    // len(string_split(text, ' ')) AS BIGINT) AS quality
        FROM documents
    ),
    per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(quality) AS BIGINT) AS s
        FROM q GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(s) AS BIGINT) AS st
        FROM per_src
    )
    SELECT source, n AS n_docs,
           round(CAST(st AS DOUBLE) / nt, 4) AS corpus_mean,
           round(CAST(st - s AS DOUBLE) / (nt - n), 4) AS loso_mean,
           round(CAST(st AS DOUBLE) / nt
                 - CAST(st - s AS DOUBLE) / (nt - n), 4) AS marginal_value,
           s * (nt - n) > (st - s) * n AS above_average
    FROM per_src CROSS JOIN tot
    WHERE nt > n
    """,
)
def q399_source_ablation_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out data valuation (Shapley-lite): each
    source's marginal contribution to the corpus-level quality metric
    (here lexical density: distinct-token ratio in integer ppm) =
    corpus mean − mean WITHOUT the source, computed exactly from totals
    (the q359 leave-out arithmetic at source grain).  The
    above-average verdict is integer cross-multiplied.  This is the
    curation budget allocator: sources with negative marginal value are
    dilution, whatever their size.

    Scale shape: one per-doc codegen quality score, one source-grain
    aggregate, closed-form leave-out arithmetic on the bounded source
    frame."""
    d = read_table(spark, sf_dir, "documents", columns=["source", "text"])
    toks = F.split("text", " ")
    quality = F.expr(
        "CAST((size(array_distinct(split(text, ' '))) * 1000000) "
        "DIV size(split(text, ' ')) AS BIGINT)"
    )
    per_src = d.select("source", quality.alias("quality")).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("quality").cast("long").alias("s"),
    )
    tot = per_src.agg(
        F.sum("n").cast("long").alias("nt"), F.sum("s").cast("long").alias("st")
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .where(F.col("nt") > F.col("n"))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round(F.col("st").cast("double") / F.col("nt"), 4).alias("corpus_mean"),
            F.round(
                (F.col("st") - F.col("s")).cast("double") / (F.col("nt") - F.col("n")),
                4,
            ).alias("loso_mean"),
            F.round(
                F.col("st").cast("double") / F.col("nt")
                - (F.col("st") - F.col("s")).cast("double")
                / (F.col("nt") - F.col("n")),
                4,
            ).alias("marginal_value"),
            (
                F.col("s") * (F.col("nt") - F.col("n"))
                > (F.col("st") - F.col("s")) * F.col("n")
            ).alias("above_average"),
        )
    )


PACK_CAPACITY = 2048


@query(
    "q400_refresh_readiness",
    oracle=f"""
    WITH docs AS (SELECT * FROM documents),
    pii AS (
        SELECT CAST(sum(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))) AS BIGINT)
               AS n_pii
        FROM docs
    ),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM docs
    ),
    stitch AS (
        SELECT CAST(count(*) AS BIGINT) AS n_stitch
        FROM (SELECT doc_id,
                     array_to_string(l[1:3], ' ') AS hk,
                     array_to_string(l[len(l) - 2:len(l)], ' ') AS tk
              FROM toks WHERE len(l) >= 6) a
        JOIN (SELECT doc_id,
                     array_to_string(l[1:3], ' ') AS hk
              FROM toks WHERE len(l) >= 6) b
          ON a.tk = b.hk AND a.doc_id != b.doc_id
    ),
    dup AS (
        SELECT CAST(sum(c - 1) AS BIGINT) AS n_exact_dups
        FROM (SELECT md5(text) AS h, count(*) AS c FROM docs GROUP BY 1)
    ),
    tok_tot AS (
        SELECT CAST(sum(len(l)) AS BIGINT) AS total_tokens FROM toks
    ),
    voc AS (
        SELECT CAST(count(DISTINCT u.t) AS BIGINT) AS vocab
        FROM toks, unnest(l) AS u(t)
    ),
    langs AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS n_langs FROM docs)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM docs) AS n_docs,
           (SELECT n_pii FROM pii) AS n_pii_spans,
           (SELECT n_stitch FROM stitch) AS n_stitch_pairs,
           (SELECT n_exact_dups FROM dup) AS n_exact_dups,
           (SELECT total_tokens FROM tok_tot) AS total_tokens,
           (SELECT vocab FROM voc) AS vocab,
           (SELECT n_langs FROM langs) AS n_langs,
           CAST(ceil((SELECT total_tokens FROM tok_tot) / {PACK_CAPACITY}.0)
                AS BIGINT) AS min_pack_bins,
           (SELECT n_pii FROM pii) = 0
               AND (SELECT n_exact_dups FROM dup) * 10
                   <= (SELECT count(*) FROM docs) AS ready
    """,
)
def q400_refresh_readiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus REFRESH-readiness capstone (the round-5 twin of q300's
    dataset card): one row a data-release gate reads before shipping a
    new corpus snapshot — raw PII spans (q350's scanner, unplanted:
    zero on clean synthetic data and a hard blocker when not), boundary
    stitches (q351), exact-dup burden, token/vocab totals with the
    minimum packing-bin count at {PACK_CAPACITY} tokens (q110's
    capacity), language coverage, and the release verdict (no PII and
    exact-dup burden ≤ 10%).

    Scale shape: four independent single-scan aggregates (regex counts,
    key hashes, token sizes) plus the stitch key equi-join — every
    metric map-side except the bounded joins; no corpus-sized state."""
    d = read_table(spark, sf_dir, "documents").transform(spersist)
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    pii = d.agg(
        F.sum(
            F.size(
                F.regexp_extract_all(
                    F.col("text"),
                    F.lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
                    0,
                )
            )
        )
        .cast("long")
        .alias("n_pii_spans")
    )
    toks = d.select("doc_id", F.split("text", " ").alias("l")).transform(spersist)
    keys = toks.where(F.size("l") >= 6).select(
        "doc_id",
        F.array_join(F.slice("l", 1, 3), " ").alias("hk"),
        F.array_join(F.slice("l", -3, 3), " ").alias("tk"),
    )
    stitch = (
        keys.select(F.col("doc_id").alias("a"), F.col("tk").alias("k"))
        .join(keys.select(F.col("doc_id").alias("b"), F.col("hk").alias("k")), "k")
        .where(F.col("a") != F.col("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_stitch_pairs"))
    )
    dup = (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") - 1).cast("long").alias("n_exact_dups"))
    )
    tok_tot = toks.select(F.explode("l").alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("total_tokens"),
        F.count_distinct("t").alias("vocab"),
    )
    langs = d.agg(F.count_distinct("lang").alias("n_langs"))
    return (
        n_docs.crossJoin(F.broadcast(pii))
        .crossJoin(F.broadcast(stitch))
        .crossJoin(F.broadcast(dup))
        .crossJoin(F.broadcast(tok_tot))
        .crossJoin(F.broadcast(langs))
        .select(
            "n_docs",
            "n_pii_spans",
            "n_stitch_pairs",
            "n_exact_dups",
            "total_tokens",
            "vocab",
            "n_langs",
            F.ceil(F.col("total_tokens") / float(PACK_CAPACITY))
            .cast("long")
            .alias("min_pack_bins"),
            (
                (F.col("n_pii_spans") == 0)
                & (F.col("n_exact_dups") * 10 <= F.col("n_docs"))
            ).alias("ready"),
        )
    )
