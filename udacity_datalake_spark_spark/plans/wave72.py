"""Wave 72: eigenvector centrality — the power-iteration influence
score with a BIT-EXACT unrolled oracle (q196's integer fixed-point
pattern on the co-supply graph).

Reference parity note: the reference (/root/reference/etl.py) has no
graph surface; extends q196 (PageRank), q241 (assortativity) and
q381 (modularity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import (
    COSUPPLY_EDGES_SQL,
    cosupply_edges,
)
from udacity_datalake_spark_spark.scratch import spersist

EC_ITERS = 4
EC_SCALE = 1_000_000_000
EC_TOPK = 10


def _eigencentrality_oracle(iters: int) -> str:
    """Unrolled integer power iteration (q196's idiom): each round sums
    neighbor scores and renormalizes to Σ = SCALE parts-per-billion with
    integer division — bit-exact on any engine, any partition order."""
    head = f"""
    WITH {COSUPPLY_EDGES_SQL},
    und AS MATERIALIZED (SELECT u AS node, w AS nbr FROM edges
            UNION ALL SELECT w, u FROM edges),
    nodes AS (SELECT DISTINCT node FROM und),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST({EC_SCALE} // n AS BIGINT) AS r
           FROM nodes CROSS JOIN nn)"""
    steps = []
    for k in range(iters):
        steps.append(
            f"""
    s{k + 1} AS MATERIALIZED (
        SELECT u.nbr AS node, CAST(sum(r{k}.r) AS HUGEINT) AS s
        FROM r{k} JOIN und u ON u.node = r{k}.node
        GROUP BY u.nbr
    ),
    t{k + 1} AS MATERIALIZED (
        SELECT CAST(sum(s) AS HUGEINT) AS tot FROM s{k + 1}),
    r{k + 1} AS MATERIALIZED (
        SELECT node, CAST(s * {EC_SCALE} // tot AS BIGINT) AS r
        FROM s{k + 1} CROSS JOIN t{k + 1}
    )"""
        )
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT node AS supplier, r AS score_ppb,
           CAST(row_number() OVER (ORDER BY r DESC, node) AS INT) AS rnk
    FROM r{iters}
    QUALIFY rnk <= {EC_TOPK}"""
    )


@query("q390_eigenvector_centrality", oracle=_eigencentrality_oracle(EC_ITERS))
def q390_eigenvector_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality of the supplier co-supply graph by
    {EC_ITERS} integer power-iteration rounds: a supplier is central
    when its co-suppliers are central (degree counts neighbors;
    eigenvector centrality weighs WHO they are — the influence metric
    complementing q196's random-surfer PageRank).  Each round sums
    neighbor scores (HUGEINT/DECIMAL-widened) and renormalizes to
    parts-per-billion with integer division, so the scores — not just
    the ranking — are bit-exact across engines and partition orders;
    the oracle unrolls the identical rounds as chained CTEs.

    Scale shape: each round is ONE adjacency join + node-grain
    aggregate (the Pregel step); the normalizing total broadcasts;
    {EC_ITERS} fixed rounds keep the lineage bounded (checkpointing
    applies past ~10 rounds, as in operators.graph)."""
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    und = edges.select(F.col("u").alias("node"), F.col("w").alias("nbr")).unionAll(
        edges.select(F.col("w").alias("node"), F.col("u").alias("nbr"))
    ).localCheckpoint(eager=True)
    nodes = und.select("node").distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.floor(EC_SCALE / F.col("n")).cast("long").alias("r")
    )
    for _ in range(EC_ITERS):
        # localCheckpoint truncates lineage each round (operators.graph's
        # idiom): s feeds BOTH the normalizing total and the next round,
        # and without truncation the LOGICAL plan doubles per round —
        # Catalyst analysis cost explodes even when execution hits caches
        s = (
            r.join(und, "node")
            .groupBy(F.col("nbr").alias("node"))
            .agg(F.sum(F.col("r").cast("decimal(38,0)")).alias("s"))
            .localCheckpoint(eager=True)
        )
        tot = s.agg(F.sum("s").alias("tot"))
        # integral division via DIV — decimal "/" rounds at result
        # scale before floor and can disagree with DuckDB's // by 1 ulp
        r = s.crossJoin(F.broadcast(tot)).select(
            "node",
            F.expr(f"CAST((s * {EC_SCALE}) DIV tot AS BIGINT)").alias("r"),
        )
    from udacity_datalake_spark_spark.operators.topk import ranked_topk

    return ranked_topk(
        r.select(F.col("node").alias("supplier"), F.col("r").alias("score_ppb")),
        [F.col("score_ppb").desc(), F.col("supplier")],
        EC_TOPK,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("int"))
