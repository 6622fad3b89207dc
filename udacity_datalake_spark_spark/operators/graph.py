"""Connected components over an edge list — the clustering step that
turns pairwise near-duplicate hits (MinHash/SimHash/Jaccard pairs) into
duplicate GROUPS, so a dedup pass can keep one canonical document per
component instead of per pair.

Algorithm: iterative min-label propagation (each node repeatedly takes
the minimum label among itself and its neighbors) with an early-exit
convergence check.  Rounds needed = graph diameter; near-dup graphs are
unions of small dense cliques (diameter ≲ 3), so this converges in a
handful of shuffles.  For adversarial long-chain graphs at 100 TB, swap
the propagation step for the alternating large-star/small-star rounds of
Kiveris et al. (MR-CC) — O(log n) rounds — behind the same signature;
the driver-side loop here only ever moves per-round change COUNTS, never
row data.

Each round persists its label frame and truncates lineage via
localCheckpoint, so the plan doesn't grow exponentially with iterations
(the classic iterative-DataFrame trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph with the minimum node id
    of its component.  Returns (node, component) — one row per distinct
    node appearing in ``edges``.
    """
    und = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .persist()
    )
    labels = und.select("node").distinct().withColumn("component", F.col("node"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # candidate label for each node: its own + every neighbor's label
        # (rename before joining — und and labels share lineage)
        by_nbr = labels.select(F.col("node").alias("__nbr"), "component")
        nbr_labels = und.join(by_nbr, und.nbr == F.col("__nbr"), "inner").select(
            "node", "component"
        )
        new_labels = (
            labels.select("node", "component")
            .union(nbr_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    und.unpersist()
    return labels
