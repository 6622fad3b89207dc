"""Wave 58: dedup planning reports — cluster-size distribution with the
token savings a keep-one policy buys (the "should we run dedup" capacity
forecast), and the near-dup threshold sweep (pair volume vs Jaccard
cutoff — the curve you read before picking 0.6).

Reference parity note: the reference (etl.py, /root/reference) has no
dedup surface; these are the planning companions to q95/q195/q327.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.dedup import (
    ngram_jaccard_components,
    ngram_jaccard_pairs,
)
from udacity_datalake_spark_spark.operators.graph import connected_components
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave52 import _NEARDUP_EDGES_SQL
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q340_dedup_savings_forecast",
    oracle=f"""
    WITH RECURSIVE {_NEARDUP_EDGES_SQL},
    und AS (SELECT d1 AS a, d2 AS b FROM nd_edges
            UNION ALL SELECT d2, d1 FROM nd_edges),
    nodes AS (SELECT DISTINCT a AS n FROM und),
    reach(node, label) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.node
    ),
    comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
    sizes AS (
        SELECT c.component, count(*) AS sz,
               CAST(sum(d.n_chars) AS BIGINT) AS cluster_chars,
               CAST(max(d.n_chars) AS BIGINT) AS kept_chars
        FROM comp c JOIN documents d ON d.doc_id = c.node
        GROUP BY c.component
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           count(*) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(sum(cluster_chars - kept_chars) AS BIGINT) AS chars_saved
    FROM sizes
    GROUP BY sz
    ORDER BY sz
    """,
)
def q340_dedup_savings_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup capacity forecast: the near-dup cluster-size histogram with
    the characters a keep-longest policy would CUT per size class — the
    number that decides whether a dedup pass pays for itself before
    anyone runs it.  (chars_saved assumes q327's keep-longest canonical;
    summing the column gives the corpus-wide savings.)

    Scale shape: q45's prefix-filtered exact pairs → CC (union-find at
    this edge count, MR-CC above) → two bounded aggregates
    (cluster-grain, then size-class-grain).  The recursive-CTE oracle
    re-derives the same components in plain SQL (q327's pattern)."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    comp = connected_components(pairs, src="d1", dst="d2")
    sizes = (
        comp.join(d.select(F.col("doc_id").alias("node"), "n_chars"), "node")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.sum("n_chars").cast("long").alias("cluster_chars"),
            F.max("n_chars").cast("long").alias("kept_chars"),
        )
    )
    return (
        sizes.groupBy("sz")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(F.col("cluster_chars") - F.col("kept_chars"))
            .cast("long")
            .alias("chars_saved"),
        )
        .orderBy("sz")
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            "n_clusters",
            "n_docs",
            "chars_saved",
        )
    )


#: Sweep cutoffs in per-mille (0.50, 0.55, … 0.90).
SWEEP_PERMILLE = (500, 550, 600, 650, 700, 750, 800, 850, 900)


@query(
    "q341_threshold_sweep",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(arr) - 1),
                         i -> array_to_string(arr[i:i+2], ' ')))) AS shingle
           FROM t WHERE len(arr) >= 3),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
    jac AS (
        SELECT p.d1, p.d2, p.inter, sa.sz AS s1, sb.sz AS s2
        FROM pr p
        JOIN sz sa ON p.d1 = sa.doc_id
        JOIN sz sb ON p.d2 = sb.doc_id
    ),
    cuts AS (SELECT unnest(ARRAY{list(SWEEP_PERMILLE)}) AS cut)
    SELECT CAST(c.cut AS BIGINT) AS cut_permille,
           CAST(count(CASE WHEN j.inter * 1000 >= c.cut * (j.s1 + j.s2 - j.inter)
                           THEN 1 END) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT CASE
                WHEN j.inter * 1000 >= c.cut * (j.s1 + j.s2 - j.inter)
                THEN j.d1 END) AS BIGINT) AS n_docs_d1
    FROM cuts c LEFT JOIN jac j ON TRUE
    GROUP BY c.cut
    ORDER BY cut_permille
    """,
)
def q341_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold selection curve: candidate-pair volume at nine
    Jaccard cutoffs (0.50–0.90) from ONE pass over the shared-shingle
    pair frame — the elbow in this curve is how the 0.6 production
    threshold was (and should be) chosen.  Admission is integer
    cross-multiplication per the engine's threshold discipline
    (inter·1000 ≥ cut·union), so no float boundary can disagree
    between engines.

    Scale shape: ONE prefix-filtered candidate pass at the lowest
    cutoff serves all nine cuts (PPJoin completeness at 0.5 covers
    every higher threshold; sub-0.5 pairs fail every cut, so the
    oracle's naive quadratic self-join never materializes engine-side);
    the 9-row cut spine broadcasts; counts collapse map-side per cut."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    # prefix-filtered candidates at the LOWEST cutoff (0.5): every pair
    # any sweep cut could admit is in this frame (PPJoin completeness),
    # and pairs below 0.5 fail every cut — so the naive quadratic
    # shingle self-join the oracle uses never materializes here
    jac = ngram_jaccard_components(d, "doc_id", "text", n=3, threshold=0.5).select(
        "d1",
        "d2",
        F.col("__inter").alias("inter"),
        F.col("__sz1").alias("s1"),
        F.col("__sz2").alias("s2"),
    )
    cuts = spark.createDataFrame([(c,) for c in SWEEP_PERMILLE], "cut long")
    admitted = F.col("inter") * 1000 >= F.col("cut") * (
        F.col("s1") + F.col("s2") - F.col("inter")
    )
    return (
        F.broadcast(cuts)
        .join(jac, F.expr("TRUE"), "left")
        .groupBy("cut")
        .agg(
            F.count(F.when(admitted, 1)).cast("long").alias("n_pairs"),
            F.count_distinct(F.when(admitted, F.col("d1"))).alias("n_docs_d1"),
        )
        .orderBy("cut")
        .select(F.col("cut").cast("long").alias("cut_permille"), "n_pairs", "n_docs_d1")
    )
