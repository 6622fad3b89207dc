"""Wave 20: co-purchase recommender neighbors and graph degree-structure
analytics (degree CCDF + power-law tail fit) — the last two families on
the round-2 roadmap: item-item similarity for "customers also bought",
and the degree diagnostics that decide whether a graph needs skew
treatment (a heavy-tailed co-occurrence graph is exactly where the
degree-oriented triangle join and salted aggregations earn their keep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.topk import ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import (
    COSUPPLY_DEG_SQL,
    COSUPPLY_EDGES_SQL,
    cosupply_degrees,
    cosupply_edges,
)
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


#: Shared CTE chain: the co-purchase recommender pipeline up to the
#: per-anchor neighbor ranking.  Used by q229 and the eval queries
#: q265/q270 so every metric scores the SAME recommender.
COPURCHASE_RANKED_SQL = """
    b AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem),
    pop AS (SELECT pk, count(*) AS c FROM b GROUP BY pk),
    top20 AS (
        SELECT pk, c FROM pop ORDER BY c DESC, pk LIMIT 20
    ),
    co AS (
        SELECT a.pk AS pk, x.pk AS neighbor, count(*) AS c_ij
        FROM b a JOIN b x ON a.okey = x.okey AND a.pk <> x.pk
        WHERE a.pk IN (SELECT pk FROM top20)
        GROUP BY 1, 2
    ),
    sims AS (
        SELECT co.pk, neighbor, c_ij,
               round(c_ij / sqrt(t.c * CAST(p.c AS DOUBLE)), 6) AS cosine
        FROM co
        JOIN top20 t ON co.pk = t.pk
        JOIN pop p ON co.neighbor = p.pk
    ),
    ranked AS (
        SELECT pk, neighbor, c_ij, cosine,
               row_number() OVER (PARTITION BY pk
                                  ORDER BY cosine DESC, neighbor) AS rank
        FROM sims
    )
"""


def copurchase_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked co-purchase neighbors (pk, neighbor, c_ij, cosine, rank)
    for the 20 most-ordered anchor parts — the Spark twin of
    COPURCHASE_RANKED_SQL.  Scale shape per q229's docstring: basket-
    bounded pair join, ranked_topk-bounded anchors, per-anchor ranking
    windows."""
    # hash-repartition on okey FIRST (round 12, guide §2.4 — the same
    # shared-exchange keying cosupply_edges adopted in round 4): the
    # (okey, pk) dedup only needs same-okey colocation
    # (HashPartitioning(okey) satisfies ClusteredDistribution(okey, pk)),
    # the anchor semi-join is broadcast (partitioning preserved), and the
    # co-count join is keyed on okey — so dedup and the basket pair join
    # share ONE fact-sized exchange instead of dedup-by-(okey,pk) plus
    # TWO okey re-shuffles at the join.  Paired A/B min-of-6 at sf0.1:
    # 1.289 s → 1.056 s (1.22×), exceptAll = 0 both ways.
    b = (
        read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk"))
        .repartition("okey")
        .dropDuplicates(["okey", "pk"])
    )
    pop = b.groupBy("pk").agg(F.count(F.lit(1)).alias("c"))
    top20 = ranked_topk(pop, [F.col("c").desc(), F.col("pk")], 20).drop("rn")
    anchors = b.join(F.broadcast(top20.select("pk")), "pk", "left_semi")
    co = (
        anchors.join(b.select("okey", F.col("pk").alias("neighbor")), "okey")
        .where(F.col("pk") != F.col("neighbor"))
        .groupBy("pk", "neighbor")
        .agg(F.count(F.lit(1)).alias("c_ij"))
    )
    sims = (
        co.join(F.broadcast(top20.select("pk", F.col("c").alias("c_a"))), "pk")
        .join(pop.select(F.col("pk").alias("neighbor"), F.col("c").alias("c_n")), "neighbor")
        .select(
            "pk",
            "neighbor",
            "c_ij",
            F.round(
                F.col("c_ij") / F.sqrt(F.col("c_a") * F.col("c_n").cast("double")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("pk").orderBy(F.col("cosine").desc(), F.col("neighbor"))
    return sims.withColumn("rank", F.row_number().over(w))


@query(
    "q229_item_neighbors",
    oracle=f"""
    WITH {COPURCHASE_RANKED_SQL}
    SELECT pk, CAST(rank AS BIGINT) AS rank, neighbor,
           CAST(c_ij AS BIGINT) AS n_co_orders, cosine
    FROM ranked WHERE rank <= 5
    """,
)
def q229_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for the 20 most-ordered parts,
    their top-5 co-purchase neighbors by cosine over order baskets
    (c_ij/√(c_i·c_j)) — the "customers also bought" table.

    Scale shape: baskets reduce to DISTINCT (order, part) first, so the
    pair join blows up only within an order's basket (never parts²);
    the anchor set is a ranked_topk-bounded 20 parts, restricting pair
    generation with a semi-join BEFORE the co-count aggregate; neighbor
    ranking windows are PARTITIONED by anchor part (≤ candidate
    neighbors per anchor, never global).  Cosines are identical doubles
    on both engines (IEEE sqrt of exact counts) rounded once, with the
    neighbor id as total-order tie-break."""
    return (
        copurchase_ranked(spark, sf_dir)
        .where(F.col("rank") <= 5)
        .select("pk", F.col("rank").cast("long").alias("rank"), "neighbor",
                F.col("c_ij").alias("n_co_orders"), "cosine")
    )


@query(
    "q230_degree_ccdf",
    oracle=f"""
    WITH {COSUPPLY_EDGES_SQL},
    {COSUPPLY_DEG_SQL},
    hist AS (SELECT d AS degree, count(*) AS n_nodes FROM deg GROUP BY d),
    tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n FROM hist)
    SELECT degree, n_nodes,
           CAST(sum(n_nodes) OVER (ORDER BY degree DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS n_at_least,
           round(CAST(sum(n_nodes) OVER (ORDER BY degree DESC
                                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / n, 6) AS ccdf
    FROM hist CROSS JOIN tot
    """,
)
def q230_degree_ccdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-supply graph as a CCDF (share of
    nodes with degree ≥ d) — the diagnostic plot that says whether the
    graph is skew-hostile before you pay for salting or degree
    orientation.

    Degrees come from one count over the exploded endpoint list
    (graph-sized), the histogram is degree-bounded, and the reverse
    cumulative window runs over that bounded frame (q208's survival-
    curve shape applied to graph structure)."""
    # persist per cosupply_edges' contract: deg's two endpoint branches
    # would otherwise recompute the dominant pair-generation join
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    deg = cosupply_degrees(edges)
    hist = deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    tot = hist.agg(F.sum("n_nodes").alias("n"))
    w = Window.orderBy(F.col("degree").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "degree",
        "n_nodes",
        F.sum("n_nodes").over(w).alias("n_at_least"),
        F.round(F.sum("n_nodes").over(w).cast("double") / F.col("n"), 6).alias("ccdf"),
    )


@query(
    "q231_powerlaw_tail_fit",
    oracle=f"""
    WITH {COSUPPLY_EDGES_SQL},
    {COSUPPLY_DEG_SQL},
    hist AS (SELECT d AS degree, count(*) AS n_nodes FROM deg GROUP BY d),
    pts AS (
        SELECT CAST(round(ln(degree), 6) AS DECIMAL(18,6)) AS lx,
               CAST(round(ln(n_nodes), 6) AS DECIMAL(18,6)) AS ly
        FROM hist WHERE degree >= 2
    ),
    s AS (
        SELECT count(*) AS n, CAST(sum(lx) AS DOUBLE) AS sx,
               CAST(sum(ly) AS DOUBLE) AS sy,
               CAST(sum(lx * lx) AS DOUBLE) AS sxx,
               CAST(sum(lx * ly) AS DOUBLE) AS sxy
        FROM pts
    )
    SELECT n AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS loglog_slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
               AS loglog_intercept
    FROM s
    """,
)
def q231_powerlaw_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log OLS fit of the degree histogram (degree ≥ 2): the slope
    estimates the power-law exponent −α of the co-supply graph — the
    single number that calibrates skew mitigation (α ≲ 2 means hub
    degrees grow linearly with the graph: salt, orient, or bound
    everything).

    q150/q130's discipline for the only non-exact inputs: each log
    coordinate rounds to DECIMAL(18,6) BEFORE the power sums, which
    then accumulate exactly; the OLS closed form evaluates once in
    double, structurally identical to the oracle."""
    # persist per cosupply_edges' contract: deg's two endpoint branches
    # would otherwise recompute the dominant pair-generation join
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    deg = cosupply_degrees(edges)
    hist = deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    pts = hist.where(F.col("degree") >= 2).select(
        F.round(F.log("degree"), 6).cast("decimal(18,6)").alias("lx"),
        F.round(F.log("n_nodes"), 6).cast("decimal(18,6)").alias("ly"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").cast("double").alias("sx"),
        F.sum("ly").cast("double").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast("double").alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.alias("n_points"),
        F.round(slope, 6).alias("loglog_slope"),
        F.round((sy - slope * sx) / n, 6).alias("loglog_intercept"),
    )
