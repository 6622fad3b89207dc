"""Wave 64: ML-feature + experimentation depth — time-decay
attribution, cluster-bootstrap ratio CI, empirical-Bayes shrinkage,
leakage-free K-fold target encoding, cross-source quantile
normalization, reciprocal-rank fusion.

Reference parity note: the reference (/root/reference/etl.py) has no
feature-engineering or experimentation surface; these extend the
attribution family (q160/q163/q184), the deterministic-bootstrap
family (q331/q332), and the retrieval family (q133/q324).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

#: time-decay attribution: credit halves every HALF_LIFE_DAYS; weights
#: are the dyadic integers 1024 >> (days // HALF_LIFE_DAYS), so credit
#: stays pure int64 (no float exp()) and both engines agree bit-exactly
HALF_LIFE_DAYS = 7
ATTR_WINDOW_DAYS = 30
W_SCALE = 1024


@query(
    "q356_time_decay_attribution",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
                   AS rev_cents
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT event_type AS channel, user_id, ts AS tts
        FROM events WHERE event_type IN ('view', 'click')
    ),
    credited AS (
        SELECT t.channel, p.pid, p.rev_cents,
               ({W_SCALE} // CAST(power(2,
                    (epoch_us(p.pts) - epoch_us(t.tts))
                        // {HALF_LIFE_DAYS * 86400 * 1_000_000}) AS BIGINT))
                   AS w
        FROM purchases p
        JOIN touches t
          ON t.user_id = p.user_id
         AND t.tts < p.pts
         AND epoch_us(p.pts) - epoch_us(t.tts)
             <= {ATTR_WINDOW_DAYS * 86400 * 1_000_000}
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases_touched,
           CAST(sum(rev_cents * w) AS BIGINT) AS credit_scaled
    FROM credited
    GROUP BY channel
    """,
)
def q356_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay marketing attribution — the third standard model next
    to last-touch (q160/q184) and linear (q163): every view/click in
    the 30 days before a purchase earns credit that HALVES per 7-day
    half-life.  Weights are dyadic integers (1024 >> (days // 7)), so
    the per-channel credit is an exact int64 sum — no float exp(), no
    normalization division, bit-identical across engines and partition
    orders.

    Scale shape: the touch→purchase pair join is a user-keyed equi-join
    with a time-band predicate (the q35/q71 banded shape — purchases
    and touches co-partition on user_id, never a cross join); decay and
    credit are per-row codegen; the aggregate is |channels|-grain."""
    e = read_table(
        spark, sf_dir, "events", columns=["event_id", "event_type", "user_id", "ts", "value"]
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.round(F.col("value").cast("decimal(18,2)") * 100, 0)
        .cast("long")
        .alias("rev_cents"),
    )
    touches = e.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_type").alias("channel"), "user_id", F.col("ts").alias("tts")
    )
    dt_us = F.unix_micros("pts") - F.unix_micros("tts")
    half_lives = (dt_us / (HALF_LIFE_DAYS * 86400 * 1_000_000)).cast("long")
    credited = (
        purchases.join(touches, "user_id")
        .where(
            (F.col("tts") < F.col("pts"))
            & (dt_us <= ATTR_WINDOW_DAYS * 86400 * 1_000_000)
        )
        .select(
            "channel",
            "pid",
            "rev_cents",
            (F.lit(W_SCALE) / F.pow(F.lit(2.0), half_lives)).cast("long").alias("w"),
        )
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        F.count_distinct("pid").alias("n_purchases_touched"),
        F.sum(F.col("rev_cents") * F.col("w")).cast("long").alias("credit_scaled"),
    )


N_RATIO_REPS = 50


@query(
    "q357_ratio_bootstrap_ci",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
                   ELSE 0 END), 0) AS BIGINT) AS rev_cents,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_views
        FROM events GROUP BY user_id
    ),
    reps AS (SELECT unnest(range({N_RATIO_REPS})) AS r),
    weighted AS (
        SELECT r.r,
               CASE WHEN (user_id % 1048576) * 2654435761 * (r.r + 29) % 1000 < 368 THEN 0
                    WHEN (user_id % 1048576) * 2654435761 * (r.r + 29) % 1000 < 736 THEN 1
                    WHEN (user_id % 1048576) * 2654435761 * (r.r + 29) % 1000 < 920 THEN 2
                    WHEN (user_id % 1048576) * 2654435761 * (r.r + 29) % 1000 < 981 THEN 3
                    WHEN (user_id % 1048576) * 2654435761 * (r.r + 29) % 1000 < 997 THEN 4
                    ELSE 5 END AS w,
               rev_cents, n_views
        FROM per_user CROSS JOIN reps r
    ),
    ratios AS (
        SELECT r,
               CAST(sum(w * rev_cents) AS BIGINT) AS rev,
               CAST(sum(w * n_views) AS BIGINT) AS views
        FROM weighted GROUP BY r
    ),
    scored AS (
        SELECT r, round(CAST(rev AS DOUBLE) / views, 6) AS ratio,
               row_number() OVER (ORDER BY round(CAST(rev AS DOUBLE) / views, 6), r)
                   AS rk,
               count(*) OVER () AS n
        FROM ratios WHERE views > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_replicates,
           min(ratio) AS ratio_min,
           max(CASE WHEN rk = CAST(ceil(n * 0.05) AS BIGINT)
                    THEN ratio END) AS ci_lo,
           max(CASE WHEN rk = CAST(ceil(n * 0.95) AS BIGINT)
                    THEN ratio END) AS ci_hi,
           max(ratio) AS ratio_max
    FROM scored
    """,
)
def q357_ratio_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-bootstrap CI for a RATIO metric (revenue per view): the
    resampling unit is the USER, not the event — the statistically
    correct bootstrap when events within a user are correlated (the
    per-event bootstrap q332 uses would understate the variance).
    Deterministic Poisson(1) weights from (user, replicate) hash
    arithmetic (q332's idiom, salt 29); per-replicate numerator and
    denominator stay exact int64, the ratio rounds once before the
    rank-based 90% percentile interval.

    Scale shape: the fact collapses to per-user sums FIRST (one
    user-grain aggregate), so the ×50 replicate expansion runs on the
    small per-user frame, map-side combined into 50 rows."""
    e = read_table(
        spark, sf_dir, "events", columns=["event_type", "user_id", "value"]
    )
    per_user = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast(
                        "long"
                    ),
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("rev_cents"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("n_views"),
    )
    reps = spark.range(N_RATIO_REPS).select(F.col("id").alias("r"))
    h = ((F.col("user_id") % 1048576) * 2654435761 * (F.col("r") + 29)) % 1000
    w = (
        F.when(h < 368, 0)
        .when(h < 736, 1)
        .when(h < 920, 2)
        .when(h < 981, 3)
        .when(h < 997, 4)
        .otherwise(5)
    )
    ratios = (
        per_user.crossJoin(F.broadcast(reps))
        .select("r", w.alias("w"), "rev_cents", "n_views")
        .groupBy("r")
        .agg(
            F.sum(F.col("w") * F.col("rev_cents")).cast("long").alias("rev"),
            F.sum(F.col("w") * F.col("n_views")).cast("long").alias("views"),
        )
        .where(F.col("views") > 0)
        .select("r", F.round(F.col("rev").cast("double") / F.col("views"), 6).alias("ratio"))
    )
    wn = Window.orderBy("ratio", "r")
    scored = ratios.select(
        "ratio", F.row_number().over(wn).alias("rk")
    ).crossJoin(F.broadcast(ratios.agg(F.count(F.lit(1)).alias("n"))))
    return scored.agg(
        F.max("n").cast("long").alias("n_replicates"),
        F.min("ratio").alias("ratio_min"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.05).cast("long"), F.col("ratio"))
        ).alias("ci_lo"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.95).cast("long"), F.col("ratio"))
        ).alias("ci_hi"),
        F.max("ratio").alias("ratio_max"),
    )


#: empirical-Bayes pseudo-count: the prior weighs like SHRINK_K
#: observations of the global rate
SHRINK_K = 50


@query(
    "q358_bayes_shrunk_rates",
    oracle=f"""
    WITH per_brand AS (
        SELECT p.p_brand AS brand,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returned
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    ),
    tot AS (
        SELECT CAST(sum(n_lines) AS BIGINT) AS nt,
               CAST(sum(n_returned) AS BIGINT) AS rt
        FROM per_brand
    )
    SELECT brand, n_lines, n_returned,
           round(CAST(n_returned AS DOUBLE) / n_lines, 6) AS raw_rate,
           round(CAST(n_returned * nt + {SHRINK_K} * rt AS DOUBLE)
                 / (CAST(n_lines + {SHRINK_K} AS DOUBLE) * nt), 6)
               AS shrunk_rate
    FROM per_brand CROSS JOIN tot
    """,
)
def q358_bayes_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-brand return rates — the
    cold-start feature every recommender/ranking pipeline needs: a
    brand with 3 observations shrinks hard toward the global rate, one
    with 10k keeps its own.  shrunk = (returns + K·global_rate) /
    (n + K), computed as ONE exact integer expression
    (returns·N_total + K·R_total) / ((n + K)·N_total) before a single
    rounded division.

    Scale shape: fact → brand-grain aggregate (one shuffle, map-side
    combined); the global totals broadcast back as a single row."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_returnflag"])
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand"])
    per_brand = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
        )
    )
    tot = per_brand.agg(
        F.sum("n_lines").cast("long").alias("nt"),
        F.sum("n_returned").cast("long").alias("rt"),
    )
    return per_brand.crossJoin(F.broadcast(tot)).select(
        "brand",
        "n_lines",
        "n_returned",
        F.round(F.col("n_returned").cast("double") / F.col("n_lines"), 6).alias(
            "raw_rate"
        ),
        F.round(
            (F.col("n_returned") * F.col("nt") + SHRINK_K * F.col("rt")).cast("double")
            / ((F.col("n_lines") + SHRINK_K).cast("double") * F.col("nt")),
            6,
        ).alias("shrunk_rate"),
    )


N_FOLDS = 5


@query(
    "q359_target_encoding",
    oracle=f"""
    WITH joined AS (
        SELECT c.c_mktsegment AS seg,
               o.o_custkey % {N_FOLDS} AS fold,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    per_cell AS (
        SELECT seg, fold,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(price) AS DECIMAL(38,2)) AS s
        FROM joined GROUP BY seg, fold
    ),
    per_seg AS (
        SELECT seg,
               CAST(sum(n) AS BIGINT) AS n_seg,
               CAST(sum(s) AS DECIMAL(38,2)) AS s_seg
        FROM per_cell GROUP BY seg
    )
    SELECT c.seg, CAST(c.fold AS BIGINT) AS fold, c.n AS n_in_fold,
           round(CAST(g.s_seg - c.s AS DOUBLE) / (g.n_seg - c.n), 4)
               AS encoding
    FROM per_cell c JOIN per_seg g ON g.seg = c.seg
    WHERE g.n_seg > c.n
    """,
)
def q359_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free K-fold target encoding — the classic ML categorical
    feature: a row in fold f gets its segment's mean order value
    computed from the OTHER folds only ((Σ_seg − Σ_fold)/(n_seg −
    n_fold)), so the feature never sees its own row's target.  Fold
    assignment is the deterministic customer-key hash the split family
    (q64) uses.

    Scale shape: one (seg, fold)-grain aggregate (bounded: segments ×
    K cells) with exact DECIMAL sums; the leave-fold-out arithmetic is
    pure subtraction on the tiny cell frame — the fact is scanned
    once."""
    o = read_table(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("o_custkey") % N_FOLDS).alias("fold"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    per_cell = joined.groupBy("seg", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("price").cast("decimal(38,2)").alias("s"),
    )
    per_seg = per_cell.groupBy("seg").agg(
        F.sum("n").cast("long").alias("n_seg"),
        F.sum("s").cast("decimal(38,2)").alias("s_seg"),
    )
    return (
        per_cell.join(F.broadcast(per_seg), "seg")
        .where(F.col("n_seg") > F.col("n"))
        .select(
            "seg",
            F.col("fold").cast("long").alias("fold"),
            F.col("n").alias("n_in_fold"),
            F.round(
                (F.col("s_seg") - F.col("s")).cast("double")
                / (F.col("n_seg") - F.col("n")),
                4,
            ).alias("encoding"),
        )
    )


@query(
    "q360_quantile_normalization",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id) AS r,
               count(*) OVER (PARTITION BY source) AS n_src
        FROM documents
    ),
    pooled AS (
        SELECT n_chars AS pooled_val,
               row_number() OVER (ORDER BY n_chars, doc_id) AS idx
        FROM documents
    ),
    pool_n AS (SELECT CAST(count(*) AS BIGINT) AS np FROM documents),
    mapped AS (
        SELECT k.source, k.n_chars, p.pooled_val
        FROM (
            SELECT source, n_chars,
                   ((2 * r - 1) * np + 2 * n_src - 1) // (2 * n_src) AS idx
            FROM ranked CROSS JOIN pool_n
        ) k JOIN pooled p ON p.idx = k.idx
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS raw_sum,
           CAST(sum(pooled_val) AS BIGINT) AS normalized_sum,
           CAST(min(pooled_val) AS BIGINT) AS normalized_min,
           CAST(max(pooled_val) AS BIGINT) AS normalized_max
    FROM mapped
    GROUP BY source
    """,
)
def q360_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization — the score-calibration op
    for merging heterogeneous quality signals: each doc's length maps
    to the POOLED distribution's value at its within-source quantile
    (rank r of n → pooled order statistic at ⌈(2r−1)·N/(2n)⌉, exact
    integer index arithmetic).  After normalization every source has
    the same marginal distribution, so cross-source thresholds mean the
    same thing (q184's z-norm equalizes two moments; this equalizes
    the whole distribution).

    Scale shape: the within-source rank is a key-partitioned window;
    the POOLED rank uses the two-phase bucketed ranking
    (operators.topk.global_row_number — no single-partition sort over
    the corpus; at even larger scale the pooled order statistics come
    from a mergeable quantile sketch, q348's shape); the index mapping
    is pure integer arithmetic and one equi-join back."""
    from udacity_datalake_spark_spark.operators.topk import global_row_number

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n_src"),
    )
    pooled = global_row_number(
        d, [F.col("n_chars"), F.col("doc_id")], "n_chars", out_col="idx"
    ).select(F.col("n_chars").alias("pooled_val"), "idx")
    pool_n = d.agg(F.count(F.lit(1)).cast("long").alias("np"))
    keyed = ranked.crossJoin(F.broadcast(pool_n)).select(
        "source",
        "n_chars",
        F.expr("((2 * r - 1) * np + 2 * n_src - 1) DIV (2 * n_src)").alias("idx"),
    )
    mapped = keyed.join(pooled, "idx")
    return mapped.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("raw_sum"),
        F.sum("pooled_val").cast("long").alias("normalized_sum"),
        F.min("pooled_val").cast("long").alias("normalized_min"),
        F.max("pooled_val").cast("long").alias("normalized_max"),
    )


RRF_K = 60
RRF_TOPN = 20


@query(
    "q361_reciprocal_rank_fusion",
    oracle=f"""
    WITH run_a AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS ra
        FROM documents
    ),
    run_b AS (
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY len(list_distinct(string_split(text, ' '))) DESC,
                            doc_id) AS rb
        FROM documents
    ),
    fused AS (
        SELECT a.doc_id, a.ra, b.rb,
               round(1.0 / ({RRF_K} + a.ra) + 1.0 / ({RRF_K} + b.rb), 6)
                   AS rrf_score
        FROM run_a a JOIN run_b b ON b.doc_id = a.doc_id
    )
    SELECT doc_id, ra AS rank_a, rb AS rank_b, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
               AS fused_rank
    FROM fused
    QUALIFY fused_rank <= {RRF_TOPN}
    """,
)
def q361_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval runs — the standard
    zero-tuning ensemble for hybrid search (lexical + vector):
    RRF(d) = Σᵢ 1/(k + rankᵢ(d)), k=60.  Runs here are two independent
    document scorers (length rank and distinct-vocabulary rank); in a
    hybrid deployment run A is BM25 (q133) and run B is ANN (q48) —
    the fusion shape is identical.

    Scale shape: each run ranks via the two-phase bucketed ranking
    (operators.topk.global_row_number — no single-partition sort over
    the corpus); fusion is one equi-join on doc_id and the final top-20
    plans as TakeOrderedAndProject (operators.topk.ranked_topk).
    Per-run ranks round into the score BEFORE the fused ordering with
    a doc_id tie-break — deterministic across engines."""
    from udacity_datalake_spark_spark.operators.topk import (
        global_row_number,
        ranked_topk,
    )

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    run_a = global_row_number(
        d.select("doc_id", "n_chars"),
        [F.col("n_chars").desc(), F.col("doc_id")],
        "n_chars",
        out_col="ra",
        descending=True,
    ).select("doc_id", "ra")
    vocab = F.size(F.array_distinct(F.split("text", " ")))
    run_b = global_row_number(
        d.select("doc_id", vocab.alias("nv")),
        [F.col("nv").desc(), F.col("doc_id")],
        "nv",
        out_col="rb",
        descending=True,
    ).select("doc_id", "rb")
    fused = run_a.join(run_b, "doc_id").select(
        "doc_id",
        F.col("ra").alias("rank_a"),
        F.col("rb").alias("rank_b"),
        F.round(
            1.0 / (RRF_K + F.col("ra")) + 1.0 / (RRF_K + F.col("rb")), 6
        ).alias("rrf_score"),
    )
    return ranked_topk(
        fused,
        [F.col("rrf_score").desc(), F.col("doc_id")],
        RRF_TOPN,
        rank_col="fused_rank",
    ).withColumn("fused_rank", F.col("fused_rank").cast("int"))
