"""Wave 26: time-series structure (peak detection, burstiness) and
distribution monitoring (per-source token entropy, population stability
index) — the metrics a production pipeline watches to catch traffic
anomalies and feature drift between training and serving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q249_peak_detection",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
        FROM events WHERE event_type = 'purchase' GROUP BY h
    ),
    nb AS (
        SELECT h, rev_c,
               lag(rev_c, 1) OVER (ORDER BY h) AS p1,
               lag(rev_c, 2) OVER (ORDER BY h) AS p2,
               lead(rev_c, 1) OVER (ORDER BY h) AS f1,
               lead(rev_c, 2) OVER (ORDER BY h) AS f2
        FROM hourly
    )
    SELECT h AS peak_hour, round(rev_c / 100.0, 2) AS revenue
    FROM nb
    WHERE p1 IS NOT NULL AND p2 IS NOT NULL
      AND f1 IS NOT NULL AND f2 IS NOT NULL
      AND rev_c > greatest(p1, p2, f1, f2)
      AND rev_c * 2 > p1 + f1 + greatest(p1, f1)
    """,
)
def q249_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local peaks in hourly purchase revenue: hours strictly above all
    four ±2 neighbors with an integer prominence guard (2·peak exceeds
    the adjacent pair plus their max) — the spike detector feeding
    alerting and campaign attribution.

    The fact reduces to the hour-bounded series first; neighbor
    comparisons are lag/lead over one bounded window; every test is
    exact int64 cents, so peak membership is bit-deterministic."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    hourly = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg((F.sum(dec("value")) * 100).cast("long").alias("rev_c"))
    )
    w = Window.orderBy("h")
    nb = hourly.select(
        "h",
        "rev_c",
        F.lag("rev_c", 1).over(w).alias("p1"),
        F.lag("rev_c", 2).over(w).alias("p2"),
        F.lead("rev_c", 1).over(w).alias("f1"),
        F.lead("rev_c", 2).over(w).alias("f2"),
    )
    full = (
        F.col("p1").isNotNull()
        & F.col("p2").isNotNull()
        & F.col("f1").isNotNull()
        & F.col("f2").isNotNull()
    )
    is_peak = F.col("rev_c") > F.greatest("p1", "p2", "f1", "f2")
    prominent = F.col("rev_c") * 2 > F.col("p1") + F.col("f1") + F.greatest("p1", "f1")
    return nb.where(full & is_peak & prominent).select(
        F.col("h").alias("peak_hour"),
        F.round(F.col("rev_c") / F.lit(100.0), 2).alias("revenue"),
    )


@query(
    "q250_token_entropy",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    c AS (SELECT source, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
    terms AS (
        SELECT source, cnt,
               CAST(round(ln(cnt), 6) AS DECIMAL(18,6)) AS lnc
        FROM c
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           count(*) AS vocab_size,
           round(ln(sum(cnt)) - CAST(sum(cnt * lnc) AS DOUBLE) / sum(cnt), 6)
               AS entropy_nats,
           round((ln(sum(cnt)) - CAST(sum(cnt * lnc) AS DOUBLE) / sum(cnt))
                 / ln(count(*)), 6) AS normalized_entropy
    FROM terms GROUP BY source
    """,
)
def q250_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution entropy (nats) and its normalized
    form H/ln(V) — the repetitiveness/compressibility proxy: a source
    whose entropy collapses is boilerplate or spam, not language.

    H = ln(n) − Σc·ln(c)/n from exact counts; each ln(c) rounds to
    DECIMAL(18,6) before the exact Σc·ln(c) accumulation (q130's
    discipline), so only two deterministic double evaluations remain
    per source row."""
    d = read_table(spark, sf_dir, "documents", columns=["source", "text"])
    tok = d.select("source", F.explode(F.split("text", " ")).alias("term"))
    c = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("cnt"))
    terms = c.select(
        "source",
        "cnt",
        F.round(F.log("cnt"), 6).cast("decimal(18,6)").alias("lnc"),
    )
    n = F.sum("cnt")
    h = F.log(n) - F.sum(F.col("cnt") * F.col("lnc")).cast("double") / n
    return terms.groupBy("source").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.round(h, 6).alias("entropy_nats"),
        F.round(h / F.log(F.count(F.lit(1))), 6).alias("normalized_entropy"),
    )


@query(
    "q251_dispersion_index",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, count(*) AS nh,
               sum(c) AS sc,
               sum(c * c) AS scc
        FROM hourly GROUP BY event_type
    )
    SELECT event_type, CAST(nh AS BIGINT) AS n_hours,
           round(sc / CAST(nh AS DOUBLE), 6) AS mean_per_hour,
           round(CAST(nh * scc - sc * sc AS DOUBLE) / (CAST(nh AS DOUBLE) * sc), 6)
               AS dispersion_index,
           CASE WHEN nh * scc - sc * sc > nh * sc THEN 'bursty'
                WHEN (nh * scc - sc * sc) * 10 < nh * sc * 9 THEN 'regular'
                ELSE 'poisson-like' END AS regime
    FROM s
    """,
)
def q251_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (Fano factor) of hourly event counts per
    type: variance-to-mean ratio over the hour grid — > 1 means bursty
    arrivals (batch jobs, campaigns), ≈ 1 Poisson, < 1 regular.  The
    one-number traffic-shape diagnostic behind q228's freshness audit.

    Hourly counts are exact; D = (H·Σc² − S²)/(H·S) evaluates once in
    double, and the regime classification compares exact INTEGER cross
    products (with a 0.9 band spelled ·10 vs ·9), so labels can't flip
    on float noise."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts"])
    hourly = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # power sums in DECIMAL(38,0): sc² and nh·Σc² outgrow int64 once an
    # event type passes ~3e9 rows (the oracle's HUGEINT does this
    # implicitly; Spark would wrap silently)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(d38(F.col("c"))).alias("sc"),
        F.sum(d38(F.col("c")) * F.col("c")).alias("scc"),
    )
    nh, sc, scc = F.col("nh"), F.col("sc"), F.col("scc")
    var_num = nh * scc - sc * sc
    return s.select(
        "event_type",
        nh.alias("n_hours"),
        F.round(sc / nh.cast("double"), 6).alias("mean_per_hour"),
        F.round(var_num.cast("double") / (nh.cast("double") * sc), 6).alias(
            "dispersion_index"
        ),
        F.when(var_num > nh * sc, "bursty")
        .when(var_num * 10 < nh * sc * 9, "regular")
        .otherwise("poisson-like")
        .alias("regime"),
    )


@query(
    "q252_psi_drift",
    oracle="""
    WITH mid AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us FROM events
    ),
    binned AS (
        SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
               CASE WHEN epoch_us(ts) < mid_us THEN 'e' ELSE 'a' END AS half
        FROM events CROSS JOIN mid
        WHERE event_type = 'purchase'
    ),
    counts AS (
        SELECT bin,
               sum(CASE WHEN half = 'e' THEN 1 ELSE 0 END) AS ce,
               sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS ca
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(ce) AS BIGINT) AS ne, CAST(sum(ca) AS BIGINT) AS na,
                   count(*) AS nb FROM counts),
    terms AS (
        SELECT bin,
               CAST(round(
                   ((ca + 1) / CAST(na + nb AS DOUBLE)
                    - (ce + 1) / CAST(ne + nb AS DOUBLE))
                   * ln(((ca + 1) / CAST(na + nb AS DOUBLE))
                        / ((ce + 1) / CAST(ne + nb AS DOUBLE))), 8)
                   AS DECIMAL(18,8)) AS term
        FROM counts CROSS JOIN tot
    )
    SELECT (SELECT nb FROM tot) AS n_bins,
           round(CAST(sum(term) AS DOUBLE), 6) AS psi,
           CASE WHEN round(CAST(sum(term) AS DOUBLE), 6) > 0.2 THEN 1 ELSE 0 END
               AS drift_flag
    FROM terms
    """,
)
def q252_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the purchase-value distribution,
    first half of the window (expected) vs second half (actual), with
    Laplace-smoothed bin shares — THE production drift metric for
    scores and features (PSI > 0.2 = investigate).

    Value bins are range-bounded (width-50 grid); the expected/actual
    split reuses q233's exact integer midpoint; each bin's PSI term
    rounds to DECIMAL(18,8) before the exact sum, and the 0.2 flag
    compares the ROUNDED psi so the verdict is engine-stable."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    mid = e.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    binned = (
        e.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mid))
        .select(
            F.floor(F.col("value") / 50).cast("long").alias("bin"),
            F.when(F.unix_micros("ts") < F.col("mid_us"), "e").otherwise("a").alias(
                "half"
            ),
        )
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == "e", 1).otherwise(0)).alias("ce"),
        F.sum(F.when(F.col("half") == "a", 1).otherwise(0)).alias("ca"),
    )
    tot = counts.agg(
        F.sum("ce").alias("ne"), F.sum("ca").alias("na"), F.count(F.lit(1)).alias("nb")
    )
    pa = (F.col("ca") + 1) / (F.col("na") + F.col("nb")).cast("double")
    pe = (F.col("ce") + 1) / (F.col("ne") + F.col("nb")).cast("double")
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "nb",
        F.round((pa - pe) * F.log(pa / pe), 8).cast("decimal(18,8)").alias("term"),
    )
    psi = F.round(F.sum("term").cast("double"), 6)
    return terms.groupBy("nb").agg(
        psi.alias("psi"),
        F.when(psi > 0.2, 1).otherwise(0).alias("drift_flag"),
    ).select(F.col("nb").alias("n_bins"), "psi", "drift_flag")
