"""Wave 19: model-evaluation and pipeline-operations analytics —
classifier confusion/F1, precision-recall curve, token-budget corpus
selection, and a data-freshness audit.

The eval queries close a loop the engine only had halves of: q43
produces language predictions and documents carry gold labels, but
nothing computed the standard eval metrics a curation pipeline gates on.
The PR curve reuses the q210/q208 discipline — scores collapse to their
(bounded) distinct values before the one cumulative window — and the
budget selection is the first corpus-scale consumer of
``operators.topk.global_running_sum``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.text import stopword_hits, EN_STOPWORDS
from udacity_datalake_spark_spark.operators.topk import global_running_sum
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

_SW = ", ".join("'" + w + "'" for w in EN_STOPWORDS)

_EN_HITS_SQL = f"""
        SELECT doc_id, source, lang,
               len(list_filter(string_split(text, ' '), x -> x IN ({_SW})))
                   AS en_hits
        FROM documents
"""


@query(
    "q225_classifier_eval",
    oracle=f"""
    WITH t AS ({_EN_HITS_SQL}),
    m AS (
        SELECT
            CAST(sum(CASE WHEN en_hits >= 2 AND lang = 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS tp,
            CAST(sum(CASE WHEN en_hits >= 2 AND lang <> 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
            CAST(sum(CASE WHEN en_hits < 2 AND lang = 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS fn,
            CAST(sum(CASE WHEN en_hits < 2 AND lang <> 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS tn
        FROM t
    )
    SELECT tp, fp, fn, tn,
           round((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS accuracy,
           round(tp / CAST(tp + fp AS DOUBLE), 6) AS precision_en,
           round(tp / CAST(tp + fn AS DOUBLE), 6) AS recall_en,
           round(2 * tp / CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1_en
    FROM m
    """,
)
def q225_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix and accuracy / precision / recall / F1 of the
    q43 language detector (en_hits ≥ 2 ⇒ 'en') against the gold lang
    label — the eval report a curation pipeline gates a classifier on
    before letting it route corpus traffic.

    One exact integer aggregate over the corpus (the predictor and the
    four confusion cells all evaluate in codegen); every metric derives
    from the four counts in the count form (F1 = 2TP/(2TP+FP+FN)), so
    there is no intermediate ratio to drift."""
    d = read_table(spark, sf_dir, "documents", columns=["lang", "text"])
    pred_en = stopword_hits("text") >= 2
    is_en = F.col("lang") == "en"
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    m = d.agg(
        one(pred_en & is_en).alias("tp"),
        one(pred_en & ~is_en).alias("fp"),
        one(~pred_en & is_en).alias("fn"),
        one(~pred_en & ~is_en).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round((tp + tn) / (tp + fp + fn + tn).cast("double"), 6).alias("accuracy"),
        F.round(tp / (tp + fp).cast("double"), 6).alias("precision_en"),
        F.round(tp / (tp + fn).cast("double"), 6).alias("recall_en"),
        F.round(2 * tp / (2 * tp + fp + fn).cast("double"), 6).alias("f1_en"),
    )


@query(
    "q226_pr_curve",
    oracle=f"""
    WITH t AS ({_EN_HITS_SQL}),
    cells AS (
        SELECT en_hits AS s,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
               sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS neg
        FROM t GROUP BY en_hits
    ),
    np AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos FROM cells),
    cum AS (
        SELECT s,
               CAST(sum(pos) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS tp,
               CAST(sum(neg) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS fp
        FROM cells
    )
    SELECT s AS threshold, tp, fp,
           round(tp / CAST(tp + fp AS DOUBLE), 6) AS precision,
           round(tp / CAST(n_pos AS DOUBLE), 6) AS recall,
           round(2 * tp / CAST(tp + fp + n_pos AS DOUBLE), 6) AS f1
    FROM cum CROSS JOIN np
    """,
)
def q226_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve of the stopword-score language detector:
    one operating point per distinct score threshold ("predict 'en'
    when en_hits ≥ t") — the artifact you read before PICKING q225's
    fixed threshold.

    q210's discipline: the corpus collapses to per-score counts first
    (scores are small integers, so the frame is score-range-bounded at
    any corpus size), the cumulative TP/FP window runs over that bounded
    frame, and each curve point is exact-integer arithmetic with one
    rounded double per metric (F1 in count form 2TP/(TP+FP+n_pos))."""
    d = read_table(spark, sf_dir, "documents", columns=["lang", "text"])
    cells = (
        d.select(stopword_hits("text").alias("s"), F.col("lang"))
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos"),
            F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("neg"),
        )
    )
    np_ = cells.agg(F.sum("pos").alias("n_pos"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "s", F.sum("pos").over(w).alias("tp"), F.sum("neg").over(w).alias("fp")
    )
    tp, fp = F.col("tp"), F.col("fp")
    return cum.crossJoin(F.broadcast(np_)).select(
        F.col("s").alias("threshold"),
        "tp",
        "fp",
        F.round(tp / (tp + fp).cast("double"), 6).alias("precision"),
        F.round(tp / F.col("n_pos").cast("double"), 6).alias("recall"),
        F.round(2 * tp / (tp + fp + F.col("n_pos")).cast("double"), 6).alias("f1"),
    )


@query(
    "q227_token_budget_selection",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS tk,
               (1000 * len(list_distinct(string_split(text, ' '))))
                   // len(string_split(text, ' ')) AS score
        FROM documents
    ),
    tot AS (SELECT CAST(sum(tk) AS BIGINT) AS total_tk FROM scored),
    run AS (
        SELECT doc_id, source, tk, score,
               CAST(sum(tk) OVER (ORDER BY score DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        FROM scored
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN running * 2 <= total_tk THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           CAST(sum(CASE WHEN running * 2 <= total_tk THEN tk ELSE 0 END)
                AS BIGINT) AS selected_tokens,
           round(sum(CASE WHEN running * 2 <= total_tk THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS selected_frac
    FROM run CROSS JOIN tot
    GROUP BY source
    """,
)
def q227_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained corpus selection: rank documents by lexical
    diversity (distinct-token per-mille — an exact integer score) and
    greedily keep the best until half the corpus's token budget is
    spent; report per-source how much survives — the "which sources win
    under the data mix" view of token-budget curation.

    The greedy prefix IS a global running sum over the document
    dimension — corpus-sized, so it runs through
    ``global_running_sum``'s two-phase bucketed prefix machinery (no
    single-partition sort), and the budget cut compares exact integers
    (running·2 ≤ total).  Per-source rollup is one aggregate after the
    cut."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    arr = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "source",
        F.size(arr).alias("tk"),
        F.expr(
            "CAST(1000 * size(array_distinct(split(text, ' '))) div "
            "size(split(text, ' ')) AS BIGINT)"
        ).alias("score"),
    )
    # persist: global_running_sum's quantile/count/window passes would
    # otherwise re-tokenize the corpus 3×
    scored = scored.transform(spersist)
    tot = scored.agg(F.sum("tk").alias("total_tk"))
    keyed = scored.withColumn("__sd", F.col("score").cast("double"))
    run = global_running_sum(
        keyed,
        [F.col("score").desc(), F.col("doc_id")],
        "__sd",
        "tk",
        out_col="running",
        descending=True,
    ).drop("__sd")
    sel = F.col("running") * 2 <= F.col("total_tk")
    return (
        run.crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(sel, 1).otherwise(0)).alias("n_selected"),
            F.sum(F.when(sel, F.col("tk")).otherwise(0)).alias("selected_tokens"),
            F.round(
                F.sum(F.when(sel, 1).otherwise(0)) / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("selected_frac"),
        )
    )


@query(
    "q228_freshness_audit",
    oracle="""
    WITH mx AS (SELECT max(ts) AS global_last FROM events),
    gaps AS (
        SELECT event_type, ts,
               epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type
                                                     ORDER BY ts, event_id))
                   AS gap_us
        FROM events
    )
    SELECT event_type,
           max(ts) AS last_event_ts,
           CAST((epoch_us((SELECT global_last FROM mx)) - epoch_us(max(ts)))
                // 60000000 AS BIGINT) AS staleness_minutes,
           count(*) AS n_events,
           round(quantile_cont(gap_us, 0.95) / 1000000, 6) AS p95_gap_seconds,
           round(sum(CASE WHEN ts >= (SELECT global_last FROM mx)
                                     - INTERVAL 1 DAY THEN 1 ELSE 0 END)
                 / CAST(sum(CASE WHEN ts < (SELECT global_last FROM mx)
                                           - INTERVAL 1 DAY
                                      AND ts >= (SELECT global_last FROM mx)
                                                - INTERVAL 2 DAY
                                 THEN 1 ELSE 0 END) AS DOUBLE), 6)
               AS last_vs_prior_day_ratio
    FROM gaps GROUP BY event_type
    """,
)
def q228_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness / liveness audit: staleness vs the global
    watermark, p95 inter-arrival gap, and last-day-vs-prior-day volume
    ratio — the pipeline-health dashboard that catches a silently dead
    or throttled event source before downstream aggregates go stale.

    Inter-arrival gaps come from one lag window PER event_type (hash-
    partitioned — never single-partition), the global watermark is a
    single-row broadcast, and the day-over-day ratio is exact integer
    counts with one rounded double.  The p95 is the q66-proven
    percentile ≡ quantile_cont pair; at 100 TB the documented swap is
    approx_percentile on the same gap column."""
    e = read_table(spark, sf_dir, "events", columns=["event_id", "event_type", "ts"])
    mx = e.agg(F.max("ts").alias("global_last"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        "ts",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )
    day1 = F.col("global_last") - F.expr("INTERVAL 1 DAY")
    day2 = F.col("global_last") - F.expr("INTERVAL 2 DAY")
    return (
        gaps.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.max("ts").alias("last_event_ts"),
            F.floor(
                (F.unix_micros(F.max("global_last")) - F.unix_micros(F.max("ts")))
                / F.lit(60000000)
            )
            .cast("long")
            .alias("staleness_minutes"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.percentile("gap_us", F.lit(0.95)) / 1000000, 6).alias(
                "p95_gap_seconds"
            ),
            F.round(
                F.sum(F.when(F.col("ts") >= day1, 1).otherwise(0))
                / F.sum(
                    F.when((F.col("ts") < day1) & (F.col("ts") >= day2), 1).otherwise(0)
                ).cast("double"),
                6,
            ).alias("last_vs_prior_day_ratio"),
        )
    )
