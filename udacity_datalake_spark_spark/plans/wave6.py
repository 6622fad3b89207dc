"""Wave 6: cross-source corpus comparison, incremental (batch-vs-base)
dedup, overlapping RAG chunking, marketing attribution, behavioral
transition matrices, and year-over-year trend reporting.

Not in the reference (its workload is the two Sparkify ETL pipelines,
reference etl.py:23-173); these continue the §2.8 extension surface.
Scale notes per query are in the docstrings; the shared rules:
integer/decimal-exact aggregation, group-keyed single exchanges, windows
only over reduced frames or with bounded range frames, broadcast for
dimension-sized sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q181_vocab_overlap",
    oracle="""
    WITH vocab AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    sizes AS (SELECT source, count(*) AS sz FROM vocab GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
        FROM vocab a JOIN vocab b ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           round(CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared), 6)
               AS vocab_jaccard
    FROM inter
    JOIN sizes sa ON source_a = sa.source
    JOIN sizes sb ON source_b = sb.source
    """,
)
def q181_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-mixing
    diagnostic for "how much do these two crawls overlap lexically"
    (near-identical sources waste mixing budget; disjoint ones broaden
    coverage).

    The corpus collapses to distinct (source, token) BEFORE any join —
    the self-join runs on the vocabulary frame, keyed by token, and the
    per-pair aggregate is source-pair-keyed (quadratic only in the
    source COUNT, which is a dimension).  The sizes side is
    sources-sized and broadcast."""
    d = read_table(spark, sf_dir, "documents", columns=["source", "text"])
    vocab = d.select("source", F.explode(F.split("text", " ")).alias("token")).distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a = vocab.select(F.col("source").alias("source_a"), "token")
    b = vocab.select(F.col("source").alias("source_b"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (F.col("__sa") + F.col("__sb") - F.col("n_shared"))
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("sz").alias("__sa"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("sz").alias("__sb"))),
            "source_b",
        )
        .select("source_a", "source_b", "n_shared", F.round(jac, 6).alias("vocab_jaccard"))
    )


@query(
    "q182_incremental_dedup",
    oracle="""
    WITH tagged AS (
        SELECT doc_id, text,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
               doc_id % 5 = 4 AS is_new
        FROM documents
    ),
    batch AS (
        SELECT doc_id, fp FROM tagged WHERE is_new
        UNION ALL
        SELECT doc_id + 10000000, fp FROM tagged
        WHERE NOT is_new AND doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 20000000, fp FROM tagged
        WHERE is_new AND doc_id % 11 = 0
    ),
    base_fps AS (SELECT DISTINCT fp FROM tagged WHERE NOT is_new),
    probed AS (
        SELECT b.doc_id, b.fp,
               b.fp IN (SELECT fp FROM base_fps) AS in_base,
               row_number() OVER (PARTITION BY b.fp ORDER BY b.doc_id) AS rn
        FROM batch b
    )
    SELECT CASE WHEN in_base THEN 'dup_of_base'
                WHEN rn > 1 THEN 'dup_within_batch'
                ELSE 'new_unique' END AS verdict,
           count(*) AS n_docs
    FROM probed GROUP BY 1
    """,
)
def q182_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: classify an arriving batch against the
    already-ingested base — ``dup_of_base`` (content already in the
    lake), ``dup_within_batch`` (repeated inside the delta itself), or
    ``new_unique``.  This is the daily-append form of q40's full-corpus
    dedup: the base is NEVER re-deduplicated, only probed.

    The corpus has no natural exact dups, so the batch is synthesized
    deterministically in-query (q78's PII pattern): today's crawl is the
    doc_id%5=4 slice plus re-crawled copies of base docs (%7=0, id
    shifted +10M) and double-submitted batch docs (%11=0, +20M) — all
    three verdicts are populated and exactly checkable.

    Both sides reduce to content fingerprints (md5 of normalized text,
    operators.text.content_fingerprint) before any join, so the
    left-outer probe and the within-batch first-occurrence window both
    run on fingerprint-keyed frames; at 100 TB the base side is a
    bucketed fingerprint index, making the probe a zero-exchange
    bucket join."""
    from udacity_datalake_spark_spark.operators.text import content_fingerprint

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tagged = d.select(
        "doc_id",
        content_fingerprint("text").alias("fp"),
        (F.pmod("doc_id", F.lit(5)) == 4).alias("is_new"),
    )
    batch = (
        tagged.where(F.col("is_new")).select("doc_id", "fp")
        .unionByName(
            tagged.where(~F.col("is_new") & (F.pmod("doc_id", F.lit(7)) == 0))
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "fp")
        )
        .unionByName(
            tagged.where(F.col("is_new") & (F.pmod("doc_id", F.lit(11)) == 0))
            .select((F.col("doc_id") + 20_000_000).alias("doc_id"), "fp")
        )
    )
    base_fps = tagged.where(~F.col("is_new")).select("fp").distinct()
    probed = batch.join(
        base_fps.withColumn("__in_base", F.lit(True)), "fp", "left"
    ).select("doc_id", "fp", F.coalesce("__in_base", F.lit(False)).alias("in_base"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    verdict = (
        F.when(F.col("in_base"), "dup_of_base")
        .when(F.row_number().over(w) > 1, "dup_within_batch")
        .otherwise("new_unique")
    )
    return (
        probed.withColumn("verdict", verdict)
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "q183_sliding_chunks",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, source, n_tokens,
               CASE WHEN n_tokens <= 40 THEN 1
                    ELSE (n_tokens - 40 + 23) // 24 + 1 END AS n_chunks
        FROM t
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
           CAST(sum(n_chunks * 40 - CASE WHEN n_tokens <= 40 THEN 40 - n_tokens
                    ELSE (40 - (n_tokens - (n_chunks - 1) * 24)) END) AS BIGINT)
               AS total_chunk_tokens
    FROM per_doc GROUP BY source
    """,
)
def q183_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunk accounting for RAG indexing:
    windows of 40 tokens at stride 24 (16-token overlap — the standard
    context-preserving split, vs q76's disjoint chunks).  Reports chunk
    and token volume per source — the index-capacity planning numbers.

    Chunk counts come from closed-form integer arithmetic on the token
    count ((n−40+23) div 24 + 1), not from materializing windows: the
    accounting pass is map-only + one group-count exchange.  The
    materializing variant is the same ``sequence``/``slice`` explode as
    q76 with stride 24 starts; only the final chunk is ragged, and its
    length is n − (n_chunks−1)·24."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    size, stride = 40, 24
    n = F.size(F.split("text", " "))
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.expr(
            f"(size(split(text, ' ')) - {size} + {stride - 1}) div {stride}"
        ) + 1
    )
    last_len = F.when(n <= size, n).otherwise(n - (n_chunks - 1) * stride)
    chunk_tokens = n_chunks * size - (size - last_len)
    per_doc = d.select(
        "source", n.alias("n_tokens"), n_chunks.alias("n_chunks"), chunk_tokens.alias("ct")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").alias("total_chunks"),
        F.sum("ct").alias("total_chunk_tokens"),
    )


@query(
    "q184_last_touch_attribution",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, ts, epoch_us(ts) AS us FROM events
    ),
    marked AS (
        SELECT user_id, event_type, ts,
               max(CASE WHEN event_type = 'click' THEN us END) OVER (
                   PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
               ) AS last_click_us
        FROM e
    )
    SELECT CAST(ts AS DATE) AS day,
           count(*) AS n_purchases,
           CAST(sum(CASE WHEN last_click_us IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_attributed
    FROM marked
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q184_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, was there a click by
    the same user within the preceding 7 days?  Reported as attributed
    purchase counts per day — the conversion-credit shape of marketing
    analytics.

    One window, partitioned by user with a BOUNDED range frame over
    integer microseconds (7 days), so state per user is the frame's
    rows, not the full history; the conditional max finds the latest
    click without a self-join (the naive purchase×click interval join is
    quadratic in active users' events).  One user-keyed exchange plus
    the final day-keyed aggregate of the purchase subset."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts"])
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, Window.currentRow)
    )
    last_click = F.max(F.when(F.col("event_type") == "click", us)).over(w)
    marked = e.select(
        "event_type", F.to_date("ts").alias("day"), last_click.alias("last_click_us")
    )
    return (
        marked.where(F.col("event_type") == "purchase")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(
                F.when(F.col("last_click_us").isNotNull(), 1).otherwise(0)
            ).alias("n_attributed"),
        )
    )


@query(
    "q185_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q185_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: counts of consecutive
    (prev event → next event) pairs per user timeline — the Markov-chain
    input for session modeling and anomaly baselines.

    One user-keyed exchange for the lag window (event_id tie-break makes
    the sequence total-ordered and both engines agree on it), then a
    map-combined count keyed by the type pair — at most |types|² groups
    regardless of event volume."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q186_yoy_revenue",
    oracle="""
    WITH monthly AS (
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2
    )
    SELECT y, m,
           CAST(rev AS DOUBLE) AS revenue,
           round(CASE WHEN prev IS NOT NULL AND prev <> 0
                      THEN (CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE))
                           / CAST(prev AS DOUBLE) * 100 END, 6) AS yoy_pct
    FROM (
        SELECT y, m, rev,
               lag(rev) OVER (PARTITION BY m ORDER BY y) AS prev
        FROM monthly
    )
    """,
)
def q186_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth: decimal-exact monthly
    totals, then each month compares to the SAME month one year earlier
    via a lag window partitioned by month-of-year (so lag 1 in the year
    order IS the YoY neighbor — no 12-row offset bookkeeping, no
    calendar join).

    The fact collapses to ≤ years×12 rows in one map-combined exchange
    before any window; everything after runs on the month dimension.
    The growth ratio is the only float, computed once from two exact
    decimals and rounded."""
    o = read_table(spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    monthly = o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    w = Window.partitionBy("m").orderBy("y")
    prev = F.lag("rev").over(w)
    yoy = F.when(
        prev.isNotNull() & (prev != 0),
        (F.col("rev").cast("double") - prev.cast("double")) / prev.cast("double") * 100,
    )
    return monthly.select(
        "y",
        "m",
        F.col("rev").cast("double").alias("revenue"),
        F.round(yoy, 6).alias("yoy_pct"),
    )
