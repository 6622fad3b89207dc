"""Wave 12: statistical diagnostics — categorical association tests and
digit-distribution forensics.

The corpus/warehouse health checks an analyst actually runs: "are lang
and source independent?" (chi-square, mutual information — if not, the
mixing weights confound language balance) and "do these money amounts
look organic?" (Benford first-digit audit — synthetic or fabricated
numerics drift from the log-uniform law).  Same determinism recipe as
every statistical query here: all counts exact int64, each final
statistic evaluated ONCE per group from those counts and rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


def _lang_source_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared lang × source contingency frame for q201/q202: exact cell
    counts with row/column margins broadcast back and the grand total —
    one construction, two statistics."""
    d = read_table(spark, sf_dir, "documents", columns=["lang", "source"])
    obs = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    margins = obs.groupBy("lang").agg(F.sum("o").alias("row_n"))
    cols = obs.groupBy("source").agg(F.sum("o").alias("col_n"))
    tot = obs.agg(F.sum("o").alias("n"))
    return (
        obs.join(F.broadcast(margins), "lang")
        .join(F.broadcast(cols), "source")
        .crossJoin(F.broadcast(tot))
    )


@query(
    "q201_chi_square_independence",
    oracle="""
    WITH obs AS (
        SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
    ),
    margins AS (
        SELECT lang, sum(o) AS row_n FROM obs GROUP BY lang
    ),
    cols AS (
        SELECT source, sum(o) AS col_n FROM obs GROUP BY source
    ),
    tot AS (SELECT sum(o) AS n FROM obs)
    SELECT CAST(sum(o) AS BIGINT) AS n_docs,
           count(*) AS n_cells,
           round(sum(
               (o - CAST(row_n AS DOUBLE) * col_n / n)
               * (o - CAST(row_n AS DOUBLE) * col_n / n)
               / (CAST(row_n AS DOUBLE) * col_n / n)
           ), 6) AS chi_square
    FROM obs JOIN margins USING (lang) JOIN cols USING (source) CROSS JOIN tot
    """,
)
def q201_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for lang × source independence — the
    contingency-table association test behind "is my language mix
    confounded by source?".

    One exchange builds the contingency table (bounded by |lang|·|source|
    — a dimension product, not data); margins are re-aggregations of
    that tiny frame and broadcast back.  Observed counts are exact
    int64; each cell's (O−E)²/E evaluates once in double from exact
    operands and the rounded sum is the only float output.  Per-term
    float addition order is fixed by the oracle-matching rounded total
    over ≤cells values — identical in both engines at this magnitude."""
    cells = _lang_source_contingency(spark, sf_dir)
    e_cell = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    term = (F.col("o") - e_cell) * (F.col("o") - e_cell) / e_cell
    return (
        cells.agg(
            F.sum("o").alias("n_docs"),
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum(term), 6).alias("chi_square"),
        )
    )


@query(
    "q202_mutual_information",
    oracle="""
    WITH obs AS (
        SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
    ),
    margins AS (SELECT lang, sum(o) AS row_n FROM obs GROUP BY lang),
    cols AS (SELECT source, sum(o) AS col_n FROM obs GROUP BY source),
    tot AS (SELECT sum(o) AS n FROM obs)
    SELECT round(sum(
               CAST(o AS DOUBLE) / n
               * ln(CAST(o AS DOUBLE) * n / (CAST(row_n AS DOUBLE) * col_n))
           ), 6) AS mutual_info_nats,
           round(sum(CAST(o AS DOUBLE) / n * ln(CAST(n AS DOUBLE) / o)), 6)
               AS joint_entropy_nats
    FROM obs JOIN margins USING (lang) JOIN cols USING (source) CROSS JOIN tot
    """,
)
def q202_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and joint entropy) of lang × source in nats —
    the information-theoretic companion to q201: MI ≈ 0 means knowing
    the source tells you nothing about language; high MI means the
    corpus's language balance is hostage to its source mix.

    Identical scale shape to q201 (contingency table + broadcast
    margins); every log term evaluates from exact integer counts."""
    cells = _lang_source_contingency(spark, sf_dir)
    od, nd = F.col("o").cast("double"), F.col("n").cast("double")
    mi_term = od / nd * F.log(od * nd / (F.col("row_n").cast("double") * F.col("col_n")))
    h_term = od / nd * F.log(nd / od)
    return (
        cells.agg(
            F.round(F.sum(mi_term), 6).alias("mutual_info_nats"),
            F.round(F.sum(h_term), 6).alias("joint_entropy_nats"),
        )
    )


@query(
    "q203_benford_digits",
    oracle="""
    WITH digits AS (
        SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                    AS INT) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (SELECT d, count(*) AS observed FROM digits GROUP BY d),
    tot AS (SELECT sum(observed) AS n FROM counts)
    SELECT d,
           observed,
           round(CAST(observed AS DOUBLE) / n, 6) AS observed_freq,
           round(ln(1.0 + 1.0 / d) / ln(10.0), 6) AS benford_freq
    FROM counts CROSS JOIN tot
    """,
)
def q203_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the forensic
    data-quality check: organically generated money amounts follow
    P(d) = log10(1 + 1/d); synthetic or truncated data visibly drifts
    (TPC-H's uniform pricing does, which is exactly what the report
    shows).

    The first digit comes from the DECIMAL's canonical string form —
    identical on both engines, no float formatting — and the digit
    histogram is ≤9 rows after one map-combined exchange."""
    o = read_table(spark, sf_dir, "orders", columns=["o_totalprice"]).where(
        F.col("o_totalprice") >= 1
    )
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    counts = o.select(digit.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("observed")
    )
    tot = counts.agg(F.sum("observed").alias("n"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "d",
        "observed",
        F.round(F.col("observed").cast("double") / F.col("n"), 6).alias("observed_freq"),
        F.round(F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0)), 6).alias(
            "benford_freq"
        ),
    )
