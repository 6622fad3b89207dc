"""Wave 28: lexical-contrast scoring (Monroe's "fightin' words"
log-odds with informative prior), price-ending audit, rolling median
smoothing, and the cross-source duplication matrix — which sources copy
from which, the provenance view of near-dup detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.dedup import ngram_jaccard_pairs
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q257_fightin_words",
    oracle="""
    WITH tok AS (
        SELECT CASE WHEN lang = 'en' THEN 'A' ELSE 'B' END AS grp,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    c AS (
        SELECT term,
               sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS ya,
               sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS yb
        FROM tok GROUP BY term
    ),
    tot AS (
        SELECT CAST(sum(ya) AS BIGINT) AS na, CAST(sum(yb) AS BIGINT) AS nb,
               CAST(sum(ya + yb) AS BIGINT) AS n0
        FROM c
    ),
    scored AS (
        SELECT term, ya, yb,
               ln((ya + (ya + yb) * 10.0 / n0)
                  / (na + 10 - ya - (ya + yb) * 10.0 / n0))
               - ln((yb + (ya + yb) * 10.0 / n0)
                    / (nb + 10 - yb - (ya + yb) * 10.0 / n0)) AS delta,
               1.0 / (ya + (ya + yb) * 10.0 / n0)
               + 1.0 / (yb + (ya + yb) * 10.0 / n0) AS var_d
        FROM c CROSS JOIN tot
    )
    SELECT term, CAST(ya AS BIGINT) AS count_en, CAST(yb AS BIGINT) AS count_other,
           round(delta, 6) AS log_odds_delta,
           round(delta / sqrt(var_d), 6) AS z_score
    FROM scored
    """,
)
def q257_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical contrast between English and non-English documents via
    Monroe et al.'s log-odds ratio with an informative Dirichlet prior
    (total mass 10 allocated by pooled frequency) and its z-score — the
    principled "which words characterize this slice" ranking that raw
    frequency ratios get wrong for rare terms.

    One token-keyed aggregate produces both groups' counts; the prior,
    delta, and z evaluate once per vocabulary row in mirrored double
    expressions from exact integer counts (vocabulary-sized frame)."""
    d = read_table(spark, sf_dir, "documents", columns=["lang", "text"])
    tok = d.select(
        F.when(F.col("lang") == "en", "A").otherwise("B").alias("grp"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    c = tok.groupBy("term").agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("ya"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("yb"),
    )
    tot = c.agg(
        F.sum("ya").alias("na"),
        F.sum("yb").alias("nb"),
        F.sum(F.col("ya") + F.col("yb")).alias("n0"),
    )
    ya, yb, na, nb, n0 = (
        F.col("ya"), F.col("yb"), F.col("na"), F.col("nb"), F.col("n0"),
    )
    prior = (ya + yb) * F.lit(10.0) / n0
    delta = F.log((ya + prior) / (na + 10 - ya - prior)) - F.log(
        (yb + prior) / (nb + 10 - yb - prior)
    )
    var_d = F.lit(1.0) / (ya + prior) + F.lit(1.0) / (yb + prior)
    return c.crossJoin(F.broadcast(tot)).select(
        "term",
        ya.alias("count_en"),
        yb.alias("count_other"),
        F.round(delta, 6).alias("log_odds_delta"),
        F.round(delta / F.sqrt(var_d), 6).alias("z_score"),
    )


@query(
    "q258_price_endings",
    oracle="""
    WITH e AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) % 100
                   AS ending
        FROM lineitem
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
    SELECT ending, count(*) AS n_lines,
           round(count(*) / CAST(n AS DOUBLE), 6) AS share,
           CASE WHEN count(*) * 100 > n * 2 THEN 1 ELSE 0 END AS over_2x_uniform
    FROM e CROSS JOIN tot
    GROUP BY ending, n
    """,
)
def q258_price_endings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-ending (cents-digit) distribution of extended prices with a
    flag for endings above twice the uniform 1% share — the retail
    psychological-pricing / data-fabrication audit that complements
    q203's Benford first-digit test from the other end of the number.

    Endings come from exact cent arithmetic (DECIMAL→int64 mod 100, a
    value-bounded 100-row frame); shares and the 2× flag are exact
    integer counts with one rounded double per row."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_extendedprice"])
    e = li.select(
        ((dec("l_extendedprice") * 100).cast("long") % 100).alias("ending")
    )
    tot = e.agg(F.count(F.lit(1)).alias("n"))
    return (
        e.crossJoin(F.broadcast(tot))
        .groupBy("ending", "n")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.count(F.lit(1)) / F.col("n").cast("double"), 6).alias("share"),
            F.when(F.count(F.lit(1)) * 100 > F.col("n") * 2, 1)
            .otherwise(0)
            .alias("over_2x_uniform"),
        )
        .select("ending", "n_lines", "share", "over_2x_uniform")
    )


@query(
    "q259_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
        FROM events WHERE event_type = 'purchase' GROUP BY day
    ),
    r AS (
        SELECT day, rev_c,
               quantile_cont(rev_c, 0.5) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med_c,
               count(*) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS w
        FROM daily
    )
    SELECT day, round(rev_c / 100.0, 2) AS revenue,
           round(med_c / 100, 6) AS rolling_median_7d
    FROM r WHERE w = 7
    """,
)
def q259_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of daily purchase revenue — the
    robust smoother that (unlike q204's EWMA or q247's moving average)
    ignores single-day spikes entirely; the line ops teams actually
    plot over noisy revenue.

    The median is an exact percentile over a 7-row window frame of
    int64 cents (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` as
    window aggregates — the q66 pair in window position); partial
    leading frames are excluded by the window count, and the day frame
    is time-bounded."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg((F.sum(dec("value")) * 100).cast("long").alias("rev_c"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    r = daily.select(
        "day",
        "rev_c",
        F.percentile("rev_c", F.lit(0.5)).over(w).alias("med_c"),
        F.count(F.lit(1)).over(w).alias("w"),
    )
    return r.where(F.col("w") == 7).select(
        "day",
        F.round(F.col("rev_c") / F.lit(100.0), 2).alias("revenue"),
        F.round(F.col("med_c") / 100, 6).alias("rolling_median_7d"),
    )


@query(
    "q260_cross_source_dup_matrix",
    oracle="""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS arr
               FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(arr) - 1),
                         i -> array_to_string(arr[i:i+2], ' ')))) AS shingle
           FROM t WHERE len(arr) >= 3),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    near AS (
        SELECT p.d1, p.d2,
               CAST(round(CAST(p.inter AS DOUBLE)
                          / (sa.sz + sb.sz - p.inter), 6) AS DECIMAL(18,6)) AS j
        FROM pairs p
        JOIN sz sa ON p.d1 = sa.doc_id
        JOIN sz sb ON p.d2 = sb.doc_id
        WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= 0.6
    )
    SELECT least(ta.source, tb.source) AS source_a,
           greatest(ta.source, tb.source) AS source_b,
           count(*) AS n_dup_pairs,
           round(CAST(sum(j) AS DOUBLE) / count(*), 6) AS avg_jaccard
    FROM near
    JOIN t ta ON near.d1 = ta.doc_id
    JOIN t tb ON near.d2 = tb.doc_id
    GROUP BY 1, 2
    """,
)
def q260_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pair counts (3-gram
    Jaccard ≥ 0.6, q45's exact prefix-filtered operator) rolled up to
    unordered source pairs — the provenance view that tells a curation
    team WHICH feeds are scraping which (diagonal = internal
    re-posting, off-diagonal = cross-feed copying).

    Pair generation is the established not-all-pairs path; the rollup
    joins two broadcast-sized (doc → source) maps and aggregates at
    source-pair grain; per-pair Jaccards round to DECIMAL(18,6) before
    the exact per-cell average."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    near = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6).select(
        "d1", "d2", F.round("jaccard", 6).cast("decimal(18,6)").alias("j")
    )
    src = d.select("doc_id", "source")
    labeled = near.join(
        src.select(F.col("doc_id").alias("d1"), F.col("source").alias("sa")), "d1"
    ).join(src.select(F.col("doc_id").alias("d2"), F.col("source").alias("sb")), "d2")
    return (
        labeled.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "j",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_dup_pairs"),
            F.round(F.sum("j").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_jaccard"
            ),
        )
    )
