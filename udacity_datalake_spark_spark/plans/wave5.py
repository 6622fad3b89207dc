"""Wave 5: the remaining aggregate-family gaps (regression, mode,
bit/bool aggregates, integer-exact histograms, higher moments, discrete
median) plus three more training-pipeline primitives (largest-remainder
quota allocation, trigram novelty scoring, ASCII quality profiling).

None of these exist in the reference (its workload is the two Sparkify
ETL pipelines, reference etl.py:23-173); they extend the engine's
"absent in reference" surface (SURVEY.md §2.8) with the same design
rules as every other wave:

- every float that reaches the output is computed ONCE from exact
  integer/decimal sums and rounded — the aggregation itself never adds
  doubles in data-dependent order, so results are bit-identical across
  engines and partitionings;
- group-keyed single exchanges everywhere; the only windows run over
  already-reduced frames (per-source distributions, source-level quota
  tables);
- histogram buckets come from integer arithmetic on cents, not float
  division, so boundary values can never flip buckets between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q171_regression_slope",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
               CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                    AS BIGINT) AS sxx,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               sum(CAST(l_quantity AS BIGINT) * CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6) AS slope,
           round((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)) * sx) / n, 6)
               AS intercept
    FROM s ORDER BY l_returnflag
    """,
)
def q171_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit of extended price on quantity — the
    ``regr_slope``/``regr_intercept`` family, rebuilt from exact sums
    instead of the built-in float aggregates.

    Spark's ``regr_*`` accumulate doubles in partition order
    (non-deterministic last bits under re-partitioning); here the five
    sufficient statistics (n, Σx, Σx², Σy, Σxy) are integer/decimal
    aggregates — order-independent and exact — and the slope/intercept
    formulas evaluate once per group in double.  Map-side combine on all
    five, one exchange, group count rows out."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    x = F.col("l_quantity").cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(dec("l_extendedprice")).alias("sy"),
        F.sum(x * dec("l_extendedprice")).alias("sxy"),
    )
    nn, sx = F.col("n"), F.col("sx")
    sxd, syd = sx.cast("double"), F.col("sy").cast("double")
    sxyd, sxxd = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nn * sxyd - sxd * syd) / (nn * sxxd - sxd * sxd)
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((syd - slope * sxd) / nn, 6).alias("intercept"),
    ).orderBy("l_returnflag")


@query(
    "q172_mode_per_group",
    oracle="""
    SELECT l_returnflag, mode_qty, n_at_mode FROM (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS mode_qty,
               count(*) AS n_at_mode,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY count(*) DESC, CAST(l_quantity AS BIGINT))
                   AS rn
        FROM lineitem GROUP BY 1, 2
    ) WHERE rn = 1
    """,
)
def q172_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a deterministic tie-break
    (smallest value wins) — the ``mode()`` aggregate, which Spark and
    DuckDB both have but with UNDEFINED tie order, rebuilt as something
    reproducible.

    Count per (group, value), then one struct-max per group:
    ``max(struct(cnt, -value))`` picks highest count then smallest value
    without any window — two map-combined exchanges, no sort.  The
    struct-max IS the per-partition pre-aggregation pattern: partial
    maxima merge associatively, so no single-partition step exists."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    counts = (
        li.groupBy("l_returnflag", F.col("l_quantity").cast("bigint").alias("mode_qty"))
        .agg(F.count(F.lit(1)).alias("n_at_mode"))
    )
    best = counts.groupBy("l_returnflag").agg(
        F.max(F.struct(F.col("n_at_mode"), (-F.col("mode_qty")).alias("neg"))).alias("__b")
    )
    return best.select(
        "l_returnflag",
        (-F.col("__b.neg")).alias("mode_qty"),
        F.col("__b.n_at_mode").alias("n_at_mode"),
    )


@query(
    "q173_bit_rollup",
    oracle="""
    SELECT event_type,
           bit_and(CAST(user_id % 256 AS BIGINT)) AS mask_and,
           bit_or(CAST(user_id % 256 AS BIGINT)) AS mask_or,
           bit_xor(CAST(user_id % 256 AS BIGINT)) AS mask_xor,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q173_bit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (AND/OR/XOR) over a per-row flag mask —
    the feature-flag / permission-audit shape ("which bits are set on
    every row / any row / an odd number of rows").

    All three are associative-commutative and combine map-side, so the
    exchange carries one 8-byte mask per (task, group) no matter how
    many rows fed it — the cheapest aggregate family there is."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "user_id"])
    mask = F.pmod(F.col("user_id"), F.lit(256)).cast("bigint")
    return e.groupBy("event_type").agg(
        F.bit_and(mask).alias("mask_and"),
        F.bit_or(mask).alias("mask_or"),
        F.bit_xor(mask).alias("mask_xor"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q174_bool_quality_gates",
    oracle="""
    SELECT source,
           bool_and(n_chars > 0) AS all_nonempty,
           bool_or(n_chars >= 900) AS any_long,
           bool_and(lang IS NOT NULL) AS all_lang_tagged,
           CAST(sum(CASE WHEN n_chars >= 900 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
           count(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def q174_bool_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate gates per source — the data-contract assertion
    shape ("every doc non-empty, any doc over the length cap") that a
    pipeline evaluates before promoting a partition.

    ``bool_and``/``bool_or`` combine map-side to one bit per group; the
    companion count makes the gate's magnitude visible.  A 100 TB
    contract check is therefore one scan + a group-count-row exchange."""
    d = read_table(spark, sf_dir, "documents", columns=["source", "lang", "n_chars"])
    return d.groupBy("source").agg(
        F.bool_and(F.col("n_chars") > 0).alias("all_nonempty"),
        F.bool_or(F.col("n_chars") >= 900).alias("any_long"),
        F.bool_and(F.col("lang").isNotNull()).alias("all_lang_tagged"),
        F.sum(F.when(F.col("n_chars") >= 900, 1).otherwise(0)).alias("n_long"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "q175_price_histogram",
    oracle="""
    SELECT bucket,
           count(*) AS n_orders,
           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM (
        SELECT o_totalprice,
               CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 24
                    // 60000000 AS INT) + 1 AS bucket
        FROM orders
    )
    GROUP BY bucket
    """,
)
def q175_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 24-bucket histogram of order totals on [0, 600k) — the
    ``width_bucket`` shape, with the bucket computed in integer CENTS
    (cents·24 div 60_000_000) instead of float division, so a price
    sitting exactly on a boundary can never flip buckets between
    engines or hardware.

    Map-side bucket assignment, one group-count exchange of ≤24 rows —
    the histogram of a 100 TB fact costs exactly one scan."""
    o = read_table(spark, sf_dir, "orders", columns=["o_totalprice"])
    cents = (dec("o_totalprice") * 100).cast("bigint")
    bucket = (
        F.expr("CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 24"
               " div 60000000 AS INT)") + 1
    )
    return (
        o.select(dec("o_totalprice").alias("__p"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("__p").cast("double").alias("min_price"),
            F.max("__p").cast("double").alias("max_price"),
        )
    )


@query(
    "q176_higher_moments",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(l_quantity AS BIGINT)**2) AS BIGINT) AS s2,
               CAST(sum(CAST(l_quantity AS BIGINT)**3) AS BIGINT) AS s3,
               CAST(sum(CAST(l_quantity AS BIGINT)**4) AS BIGINT) AS s4
        FROM lineitem GROUP BY l_returnflag
    ), m AS (
        SELECT l_returnflag, n,
               CAST(s1 AS DOUBLE) / n AS mu,
               CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)**2 AS m2,
               CAST(s3 AS DOUBLE) / n
                 - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                 + 2 * (CAST(s1 AS DOUBLE) / n)**3 AS m3,
               CAST(s4 AS DOUBLE) / n
                 - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                 + 6 * (CAST(s1 AS DOUBLE) / n)**2 * (CAST(s2 AS DOUBLE) / n)
                 - 3 * (CAST(s1 AS DOUBLE) / n)**4 AS m4
        FROM s
    )
    SELECT l_returnflag, n,
           round(mu, 6) AS mean_qty,
           round(m3 / m2**1.5, 6) AS skewness,
           round(m4 / m2**2 - 3, 6) AS excess_kurtosis
    FROM m ORDER BY l_returnflag
    """,
)
def q176_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per group from exact
    integer power sums — the ``skewness()``/``kurtosis()`` aggregates
    rebuilt deterministic (the built-ins accumulate doubles in partition
    order; these sums are int64-exact: quantity ≤ 50 ⇒ q⁴ ≤ 6.25e6, far
    under overflow at any row count that fits a cluster).

    Four extra multiply-adds per row map-side, one exchange, and every
    double is derived once per group from the same exact sums on both
    engines."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    x = F.col("l_quantity").cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    nn = F.col("n")
    mu = F.col("s1").cast("double") / nn
    m2 = F.col("s2").cast("double") / nn - mu * mu
    m3 = F.col("s3").cast("double") / nn - 3 * mu * (F.col("s2").cast("double") / nn) + 2 * mu * mu * mu
    m4 = (
        F.col("s4").cast("double") / nn
        - 4 * mu * (F.col("s3").cast("double") / nn)
        + 6 * mu * mu * (F.col("s2").cast("double") / nn)
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round(mu, 6).alias("mean_qty"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")


@query(
    "q177_median_disc",
    oracle="""
    WITH counts AS (
        SELECT source, n_chars, count(*) AS cnt
        FROM documents GROUP BY source, n_chars
    ), cum AS (
        SELECT source, n_chars,
               sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
                              ROWS UNBOUNDED PRECEDING) AS cum_cnt,
               sum(cnt) OVER (PARTITION BY source) AS total
        FROM counts
    )
    SELECT source, CAST(min(n_chars) AS BIGINT) AS median_chars
    FROM cum
    WHERE cum_cnt * 2 >= total
    GROUP BY source
    """,
)
def q177_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (lower) median per group — ``percentile_disc(0.5)`` —
    computed scalably: collapse to distinct (group, value) counts first,
    cumulate over the DISTINCT-VALUE frame, and take the first value
    whose cumulative count reaches half the total.

    The window input is bounded by value cardinality per group, not row
    count (same pre-aggregation as the weighted-median query q137); the
    half-total test is integer (cum·2 ≥ total), so no float boundary.
    This generalizes to any percentile_disc(p) by replacing 2 with
    ⌈1/p⌉-scaled integer comparison."""
    d = read_table(spark, sf_dir, "documents", columns=["source", "n_chars"])
    counts = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("source")
    cum = counts.select(
        "source",
        "n_chars",
        F.sum("cnt").over(w_cum).alias("cum_cnt"),
        F.sum("cnt").over(w_tot).alias("total"),
    )
    return (
        cum.where(F.col("cum_cnt") * 2 >= F.col("total"))
        .groupBy("source")
        .agg(F.min("n_chars").alias("median_chars"))
    )


@query(
    "q178_quota_allocation",
    oracle="""
    WITH counts AS (
        SELECT source, count(*) AS cnt FROM documents GROUP BY source
    ), tot AS (
        SELECT sum(cnt) AS total FROM counts
    ), base AS (
        SELECT source, cnt,
               CAST(1000 * cnt // total AS BIGINT) AS base_quota,
               CAST(1000 * cnt % total AS BIGINT) AS remainder
        FROM counts CROSS JOIN tot
    ), shortfall AS (
        SELECT CAST(1000 - sum(base_quota) AS BIGINT) AS k FROM base
    )
    SELECT source, cnt, base_quota + extra AS quota FROM (
        SELECT source, cnt, base_quota,
               CASE WHEN row_number() OVER (ORDER BY remainder DESC, source) <= k
                    THEN 1 ELSE 0 END AS extra
        FROM base CROSS JOIN shortfall
    )
    """,
)
def q178_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) quota allocation: split a sampling
    budget of 1000 across sources proportionally to document counts,
    with the fractional remainders deciding who gets the leftover units
    — the deterministic mixing-ratio step of a corpus-blend config
    (quota sums EXACTLY to the budget, unlike independent rounding).

    All arithmetic is integer (budget·cnt div/mod total); the only
    window runs over the source dimension — group-count rows, never the
    corpus.  At 100 TB the counts frame is a handful of rows regardless
    of fact size."""
    d = read_table(spark, sf_dir, "documents", columns=["source"])
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(F.sum("cnt").alias("total"))
    base = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "cnt",
        F.expr("1000 * cnt div total").alias("base_quota"),
        F.pmod(F.lit(1000) * F.col("cnt"), F.col("total")).alias("remainder"),
    )
    shortfall = base.agg((F.lit(1000) - F.sum("base_quota")).alias("k"))
    w = Window.orderBy(F.col("remainder").desc(), "source")
    return (
        base.crossJoin(F.broadcast(shortfall))
        .withColumn("__rn", F.row_number().over(w))
        .select(
            "source",
            "cnt",
            (
                F.col("base_quota")
                + F.when(F.col("__rn") <= F.col("k"), 1).otherwise(0)
            ).alias("quota"),
        )
    )


@query(
    "q179_trigram_novelty",
    oracle="""
    WITH grams AS (
        SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
            WHERE len(w) >= 3
        )
    ), firsts AS (
        SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS novelty
    FROM grams g JOIN firsts f ON g.gram = f.gram
    GROUP BY g.doc_id
    """,
)
def q179_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty score: the fraction of a document's distinct
    word-trigrams that appear for the FIRST time in the corpus's
    deterministic ingestion order (min doc_id) — the dedup-adjacent
    signal for "how much of this document is new text" used to
    down-weight boilerplate at mixing time.

    Distinct (doc, gram) pairs are built array-side before the one
    gram-keyed exchange; first-occurrence is min(doc_id) over a
    gram-partitioned WINDOW, so the novelty tag rides the same exchange
    that groups the grams (round 7: replaced the min() groupBy +
    join-back pair, which re-shuffled the full distinct-pair set a
    second time — the window form halves gram exchange volume); the
    per-doc rollup is the second and final exchange.  Exchange volume
    is bounded by distinct (doc, gram) pairs, not corpus size."""
    k = 3
    d = (
        read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
        .select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= k)
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(w) - {k - 1}),"
                    f" i -> concat(w[i - 1], ' ', w[i], ' ', w[i + 1]))"
                )
            )
        ).alias("gram"),
    )
    first_doc = F.min("doc_id").over(Window.partitionBy("gram"))
    tagged = grams.select(
        "doc_id", F.when(first_doc == F.col("doc_id"), 1).otherwise(0).alias("novel")
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("novel").alias("n_novel"),
            F.round(
                F.sum("novel").cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
    )


@query(
    "q180_ascii_quality",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_raw,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                AS BIGINT) AS n_digits,
           CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                AS BIGINT) AS n_upper,
           CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g'))
                AS BIGINT) AS n_spaces,
           round(CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
                      AS DOUBLE) / length(text), 6) AS alpha_frac
    FROM documents WHERE length(text) > 0
    """,
)
def q180_ascii_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class quality profile per document (digit / uppercase /
    whitespace counts, alphabetic fraction) — the cheap lexical layer of
    a quality classifier, computed as length deltas of class-stripped
    regexp_replace.

    Pure map work inside whole-stage codegen: zero shuffles, zero UDFs —
    the profile of a 100 TB corpus is one scan.  Only ASCII classes are
    used so both engines' regex dialects agree exactly."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])

    def stripped(cls: str) -> F.Column:
        return F.length("text") - F.length(F.regexp_replace("text", cls, ""))

    return d.where(F.length("text") > 0).select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        stripped("[0-9]").cast("bigint").alias("n_digits"),
        stripped("[A-Z]").cast("bigint").alias("n_upper"),
        stripped("[ ]").cast("bigint").alias("n_spaces"),
        F.round(stripped("[a-zA-Z]").cast("double") / F.length("text"), 6).alias(
            "alpha_frac"
        ),
    )
