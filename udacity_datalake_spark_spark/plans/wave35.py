"""Wave 35: acquisition-cohort LTV curves and cross-source style
similarity — the longitudinal revenue view (what a cohort is worth at
age k) and the stylometric mirror-site detector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.text import EN_STOPWORDS
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


#: Shared CTE chain: monthly-cohort revenue cube — (cohort, age, rev)
#: cells plus cohort sizes.  Used by q279's LTV curves and wave38's
#: q286 payback so both read the SAME cohorting.
COHORT_CELLS_SQL = """
    pm AS (
        SELECT o_custkey AS ck, date_trunc('month', o_orderdate) AS month,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2
    ),
    fs AS (SELECT ck, min(month) AS cohort FROM pm GROUP BY ck),
    sizes AS (SELECT cohort, count(*) AS cohort_users FROM fs GROUP BY cohort),
    cell AS (
        SELECT fs.cohort, date_diff('month', fs.cohort, pm.month) AS age_months,
               sum(rev) AS rev
        FROM pm JOIN fs USING (ck) GROUP BY 1, 2
    )
"""


def cohort_cells(spark: SparkSession, sf_dir: str):
    """(cells, sizes): the Spark twin of COHORT_CELLS_SQL — cells at
    (cohort, age_months, rev DECIMAL) grain, sizes at cohort grain."""
    o = read_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    pm = o.groupBy(
        F.col("o_custkey").alias("ck"),
        F.date_trunc("month", "o_orderdate").alias("month"),
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    fs = pm.groupBy("ck").agg(F.min("month").alias("cohort"))
    sizes = fs.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_users"))
    cells = (
        pm.join(fs, "ck")
        .groupBy(
            "cohort",
            (
                (F.year("month") - F.year("cohort")) * 12
                + (F.month("month") - F.month("cohort"))
            ).cast("long").alias("age_months"),
        )
        .agg(F.sum("rev").alias("rev"))
    )
    return cells, sizes


@query(
    "q279_cohort_ltv_curve",
    oracle=f"""
    WITH {COHORT_CELLS_SQL}
    SELECT cell.cohort, CAST(age_months AS BIGINT) AS age_months,
           CAST(cohort_users AS BIGINT) AS cohort_users,
           round(CAST(sum(rev) OVER (PARTITION BY cell.cohort ORDER BY age_months
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / cohort_users, 6) AS cum_ltv_per_user
    FROM cell JOIN sizes ON cell.cohort = sizes.cohort
    """,
)
def q279_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort LTV curves: for each first-purchase-month
    cohort, cumulative revenue per cohort member at every month of age
    — the triangle chart behind payback-period and LTV/CAC decisions
    (q127 counts WHO comes back; this prices WHAT they're worth).

    Orders reduce once to (customer, month) revenue; cohorts are a
    customer-dimension min; the cumulative window is PARTITIONED per
    cohort over the age axis (calendar-bounded ≤ #months rows) with
    DECIMAL-exact revenue and one double division per cell."""
    cell, sizes = cohort_cells(spark, sf_dir)
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cell.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age_months",
            "cohort_users",
            F.round(
                F.sum("rev").over(w).cast("double") / F.col("cohort_users"), 6
            ).alias("cum_ltv_per_user"),
        )
    )


_SW_COLS = ", ".join(
    f"""CAST(round(len(list_filter(string_split(text, ' '), x -> x = '{w}'))
         * 1000000.0 / len(string_split(text, ' ')), 0) AS BIGINT) AS f{i}"""
    for i, w in enumerate(EN_STOPWORDS)
)


@query(
    "q280_source_style_similarity",
    oracle=f"""
    WITH feats AS (
        SELECT source, {_SW_COLS}
        FROM documents
    ),
    prof AS (
        SELECT source,
               {", ".join(f"CAST(sum(f{i}) AS BIGINT) AS s{i}" for i in range(len(EN_STOPWORDS)))}
        FROM feats GROUP BY source
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               round(({" + ".join(f"CAST(a.s{i} AS DOUBLE) * b.s{i}" for i in range(len(EN_STOPWORDS)))})
                     / (sqrt({" + ".join(f"CAST(a.s{i} AS DOUBLE) * a.s{i}" for i in range(len(EN_STOPWORDS)))})
                        * sqrt({" + ".join(f"CAST(b.s{i} AS DOUBLE) * b.s{i}" for i in range(len(EN_STOPWORDS)))})), 6)
                   AS style_cosine
        FROM prof a JOIN prof b ON a.source < b.source
    )
    SELECT source_a, source_b, style_cosine
    FROM pairs WHERE style_cosine >= 0.999
    """,
)
def q280_source_style_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stylometric mirror-site detection: each source's stopword-usage
    profile (per-million rates of the tracked function words, summed
    over its documents) compared pairwise by cosine; pairs above 0.999
    are near-identical writing styles — the provenance complement to
    q260's content-level duplication matrix (mirrors can paraphrase
    content but rarely change function-word habits).

    Per-document rates quantize to exact integer parts-per-million
    before the per-source sums (round-then-exact-sum in integer form),
    the profile frame is source-dimension sized, and the pair join is
    dimension² with one rounded double per pair."""
    d = read_table(spark, sf_dir, "documents", columns=["source", "text"])
    toks = F.split("text", " ")

    def match(word):
        # NB: a two-parameter lambda (even with a default) makes F.filter
        # pass the element INDEX as the second argument — close over the
        # word with a factory instead
        return lambda x: x == F.lit(word)

    feats = d.select(
        "source",
        *[
            F.round(
                F.size(F.filter(toks, match(w)))
                * F.lit(1000000.0)
                / F.size(toks),
                0,
            )
            .cast("long")
            .alias(f"f{i}")
            for i, w in enumerate(EN_STOPWORDS)
        ],
    )
    prof = feats.groupBy("source").agg(
        *[F.sum(f"f{i}").alias(f"s{i}") for i in range(len(EN_STOPWORDS))]
    )
    a = prof.select(F.col("source").alias("source_a"), *[F.col(f"s{i}").alias(f"a{i}") for i in range(len(EN_STOPWORDS))])
    b = prof.select(F.col("source").alias("source_b"), *[F.col(f"s{i}").alias(f"b{i}") for i in range(len(EN_STOPWORDS))])
    dot = sum(
        (F.col(f"a{i}").cast("double") * F.col(f"b{i}") for i in range(len(EN_STOPWORDS))),
        F.lit(0.0),
    )
    na = sum(
        (F.col(f"a{i}").cast("double") * F.col(f"a{i}") for i in range(len(EN_STOPWORDS))),
        F.lit(0.0),
    )
    nb = sum(
        (F.col(f"b{i}").cast("double") * F.col(f"b{i}") for i in range(len(EN_STOPWORDS))),
        F.lit(0.0),
    )
    return (
        a.join(b, F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.round(dot / (F.sqrt(na) * F.sqrt(nb)), 6).alias("style_cosine"),
        )
        .where(F.col("style_cosine") >= 0.999)
    )
