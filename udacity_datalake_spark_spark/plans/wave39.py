"""Wave 39: log-log price elasticity per category, nation market-overlap
matrix, and quantile-quantile drift — econometrics and distribution-
shift measures in VALUE units (the companion to q252's probability-unit
PSI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave34 import (
    UNIT_PRICE_CENTS_EXPR,
    UNIT_PRICE_CENTS_SQL,
)
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q288_price_elasticity",
    oracle=f"""
    WITH li AS (
        SELECT p_type,
               CAST(round(ln(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                                  AS BIGINT)), 6) AS DECIMAL(18,6)) AS lq,
               CAST(round(ln({UNIT_PRICE_CENTS_SQL}), 6)
                    AS DECIMAL(18,6)) AS lp
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    s AS (
        SELECT p_type, count(*) AS n,
               CAST(sum(lp) AS DOUBLE) AS sx, CAST(sum(lq) AS DOUBLE) AS sy,
               CAST(sum(lp * lp) AS DOUBLE) AS sxx,
               CAST(sum(lp * lq) AS DOUBLE) AS sxy
        FROM li GROUP BY p_type
    )
    SELECT p_type, CAST(n AS BIGINT) AS n_lines,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity
    FROM s
    """,
)
def q288_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per part type: the OLS slope
    of ln(quantity) on ln(realized unit price) across order lines — the
    textbook elasticity estimate (slope ≈ −1 means revenue-neutral
    pricing; |slope| > 1 means price cuts pay for themselves).

    Unit prices come from q276's exact integer-cent division; both log
    coordinates round to DECIMAL(18,6) BEFORE the per-type power sums
    (q231's discipline), so the regression inputs are exact and the
    slope is one mirrored double per category."""
    li = read_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    qty_c = F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)")
    up_c = F.expr(UNIT_PRICE_CENTS_EXPR)
    rows = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type",
        F.round(F.log(qty_c), 6).cast("decimal(18,6)").alias("lq"),
        F.round(F.log(up_c), 6).cast("decimal(18,6)").alias("lp"),
    )
    s = rows.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lp").cast("double").alias("sx"),
        F.sum("lq").cast("double").alias("sy"),
        F.sum(F.col("lp") * F.col("lp")).cast("double").alias("sxx"),
        F.sum(F.col("lp") * F.col("lq")).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (
        F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"), F.col("sxy"),
    )
    return s.select(
        "p_type",
        n.alias("n_lines"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias("elasticity"),
    )


@query(
    "q289_market_overlap",
    oracle="""
    WITH np AS (
        SELECT DISTINCT n.n_name AS nation, l.l_partkey AS pk
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    sz AS (SELECT nation, count(*) AS sz FROM np GROUP BY nation),
    inter AS (
        SELECT a.nation AS nation_a, b.nation AS nation_b, count(*) AS i
        FROM np a JOIN np b ON a.pk = b.pk AND a.nation < b.nation
        GROUP BY 1, 2
    )
    SELECT nation_a, nation_b, CAST(i AS BIGINT) AS n_shared_parts,
           round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sz sa ON nation_a = sa.nation
    JOIN sz sb ON nation_b = sb.nation
    WHERE i * 10 >= (sa.sz + sb.sz - i) * 6
    """,
)
def q289_market_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-overlap matrix: nation pairs whose purchased part sets
    overlap at Jaccard ≥ 0.6 — the assortment-similarity view that says
    which markets can share inventory planning (q260's dup-matrix shape
    with nations as the documents and part sets as the shingles).

    The fact reduces to DISTINCT (nation, part) — dimension×dimension
    sized — so the pair join blows up only within a part's nation list;
    admission is exact integer cross-multiplication (i·10 ≥ union·6)."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    n = read_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    np_ = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    sz = np_.groupBy("nation").agg(F.count(F.lit(1)).alias("sz"))
    a = np_.select(F.col("nation").alias("nation_a"), "pk")
    b = np_.select(F.col("nation").alias("nation_b"), "pk")
    inter = (
        a.join(b, "pk")
        .where(F.col("nation_a") < F.col("nation_b"))
        .groupBy("nation_a", "nation_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    joined = inter.join(
        F.broadcast(sz.select(F.col("nation").alias("nation_a"), F.col("sz").alias("sa"))),
        "nation_a",
    ).join(
        F.broadcast(sz.select(F.col("nation").alias("nation_b"), F.col("sz").alias("sb"))),
        "nation_b",
    )
    union = F.col("sa") + F.col("sb") - F.col("i")
    return (
        joined.where(F.col("i") * 10 >= union * 6)
        .select(
            "nation_a",
            "nation_b",
            F.col("i").alias("n_shared_parts"),
            F.round(F.col("i") / union.cast("double"), 6).alias("jaccard"),
        )
    )


@query(
    "q290_qq_drift",
    oracle="""
    WITH mid AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us FROM events
    ),
    halves AS (
        SELECT CASE WHEN epoch_us(ts) < mid_us THEN 'e' ELSE 'a' END AS half,
               value
        FROM events CROSS JOIN mid WHERE event_type = 'purchase'
    ),
    q AS (
        SELECT half,
               quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                     0.6, 0.7, 0.8, 0.9]) AS qs
        FROM halves GROUP BY half
    ),
    grid AS (
        SELECT e.qs AS eq, a.qs AS aq
        FROM q e, q a WHERE e.half = 'e' AND a.half = 'a'
    ),
    pts AS (
        SELECT i AS decile,
               round(eq[i], 6) AS q_expected,
               round(aq[i], 6) AS q_actual,
               CAST(round(abs(aq[i] - eq[i]), 6) AS DECIMAL(18,6)) AS gap
        FROM grid, (SELECT unnest(range(1, 10)) AS i)
    )
    SELECT CAST(decile AS BIGINT) AS decile, q_expected, q_actual,
           round(CAST(gap AS DOUBLE), 6) AS abs_gap
    FROM pts
    """,
)
def q290_qq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile drift between the first and second half of the
    observation window: the 9-point decile grid of purchase value in
    both periods, with per-decile absolute gaps — distribution shift in
    VALUE units (q252's PSI says "how much probability moved"; this
    says "by how many dollars").

    Both periods' deciles come from one grouped array-percentile
    aggregate (Spark ``percentile(col, array)`` ≡ DuckDB
    ``quantile_cont(col, list)``, the q66 pair vectorized), the split
    is q233's exact integer midpoint, and the grid unnests to a fixed
    9-row frame."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    mid = e.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    halves = (
        e.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mid))
        .select(
            F.when(F.unix_micros("ts") < F.col("mid_us"), "e").otherwise("a").alias(
                "half"
            ),
            "value",
        )
    )
    probs = F.lit([i / 10.0 for i in range(1, 10)])
    q = halves.groupBy("half").agg(F.percentile("value", probs).alias("qs"))
    eq = q.where(F.col("half") == "e").select(F.col("qs").alias("eqs"))
    aq = q.where(F.col("half") == "a").select(F.col("qs").alias("aqs"))
    grid = eq.crossJoin(aq).select(
        F.posexplode(F.arrays_zip("eqs", "aqs")).alias("pos", "pair")
    )
    return grid.select(
        (F.col("pos") + 1).cast("long").alias("decile"),
        F.round(F.col("pair.eqs"), 6).alias("q_expected"),
        F.round(F.col("pair.aqs"), 6).alias("q_actual"),
        F.round(
            F.abs(F.col("pair.aqs") - F.col("pair.eqs")), 6
        ).alias("abs_gap"),
    )
