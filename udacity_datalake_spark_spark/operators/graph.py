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
from pyspark.sql import types as T


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Label every node of the undirected graph with the minimum node id
    of its component.  Returns (node, component) — one row per distinct
    node appearing in ``edges``.

    Contract notes: edge endpoints must be non-null (null endpoints are
    dropped up front — an edge to nothing connects nothing), and the
    call is EAGER — it counts (and below ``small_graph_threshold``
    collects) the materialized edge list at call time rather than
    returning a lazy plan, since iterative label propagation has no
    single-plan form anyway.
    """
    edges = edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
    # materialize the edge list ONCE before mirroring it: the union below
    # references `edges` twice, and without this an expensive upstream
    # (e.g. a Jaccard shingle self-join) would execute per branch
    ed = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr")).localCheckpoint(
        eager=True
    )
    # Small-graph fast path: each distributed min-propagation round costs
    # seconds of scheduling + checkpoint latency regardless of data size,
    # so below ~10^5 edges (near-dup edge sets are tiny relative to their
    # corpus) an exact driver-side union-find is strictly faster and
    # yields the identical min-label result.  Large graphs take the
    # distributed loop below unchanged.
    # (tests pass small_graph_threshold=0 to exercise the distributed loop)
    n_edges = ed.count()
    if n_edges <= small_graph_threshold:
        pairs = [(r[0], r[1]) for r in ed.collect()]
        parent: dict = {}

        def _find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in pairs:
            parent.setdefault(u, u)
            parent.setdefault(v, v)
        for u, v in pairs:
            ru, rv = _find(u), _find(v)
            if ru != rv:
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                # smaller id stays root → the final root IS the min label
                parent[hi] = lo
        node_t = ed.schema["node"].dataType
        out_schema = T.StructType(
            [T.StructField("node", node_t), T.StructField("component", node_t)]
        )
        rows = [(v, _find(v)) for v in parent]
        return ed.sparkSession.createDataFrame(rows, schema=out_schema)

    und = (
        ed.union(ed.select(F.col("nbr").alias("node"), F.col("node").alias("nbr")))
        .distinct()
        # partition the (big, static) edge list on the per-round join key
        # ONCE — every propagation round then shuffles only the label
        # frame (one small row per node), never the edges
        .repartition("nbr")
        .persist()
    )
    labels = und.select("node").distinct().withColumn("component", F.col("node"))
    labels = labels.localCheckpoint(eager=True)

    # labels only ever decrease (min-propagation), so the label sum
    # strictly decreases while anything changes: convergence is "sum
    # unchanged", one aggregate action per round — no new-vs-old join.
    # decimal(38,0) so a 1e9-node graph of int64 ids can't overflow.
    def _sig(frame: DataFrame):
        return frame.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]

    prev_sig = _sig(labels)
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
        labels = new_labels
        cur_sig = _sig(labels)
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig

    und.unpersist()
    return labels


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over the UNDIRECTED graph, in int64
    fixed-point (parts-per-``scale``) — returns (node, rank_ppb).

    Float PageRank sums contributions in partition order, so two runs
    (or two engines) disagree in the last bits and no exact oracle can
    exist.  Every operation here is integer — r₀ = scale div n, each
    round r' = (15·scale) div (100·n) + (85·Σ contrib) div 100 with
    contrib = r div degree — so the trajectory is BIT-IDENTICAL on any
    engine, partitioning, or iteration schedule; the truncation the
    integer divisions introduce is part of the (deterministic) spec.

    Scale shape mirrors connected_components: edges are mirrored,
    partitioned once on the join key and persisted; each round shuffles
    only the (node, rank) frame, with lineage cut per round via
    localCheckpoint.  Fixed iteration count — no convergence check, so
    no extra action per round.
    """
    # materialize the filtered edge list ONCE before mirroring — the
    # union references it twice, and q196 feeds this an expensive
    # Jaccard candidate join (same guard as connected_components)
    ed = edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull()).select(
        F.col(src).alias("node"), F.col(dst).alias("nbr")
    ).localCheckpoint(eager=True)
    und = (
        ed.union(ed.select(F.col("nbr").alias("node"), F.col("node").alias("nbr")))
        .distinct()
        .repartition("node")
        .persist()
    )
    # deg is referenced twice per round (divisor join + teleport node
    # set) and once for n — checkpoint so the aggregation runs once
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("__deg")).localCheckpoint(
        eager=True
    )
    n = deg.count()
    if n == 0:
        und.unpersist()
        node_t = ed.schema["node"].dataType
        schema = T.StructType(
            [
                T.StructField("node", node_t),
                T.StructField("rank_ppb", T.LongType()),
            ]
        )
        return edges.sparkSession.createDataFrame([], schema)
    base = (15 * scale) // (100 * n)
    ranks = deg.select("node", F.lit(scale // n).cast("long").alias("rank_ppb"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            und.join(ranks, "node")
            .join(deg, "node")
            .select(
                F.col("nbr").alias("node"),
                F.expr("rank_ppb div __deg").alias("__c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        # right-join onto the node set so isolated-from-this-round nodes
        # (none in an undirected graph, but keep the algebra total) still
        # get the teleport term
        ranks = deg.select("node").join(summed, "node", "left").select(
            "node",
            (
                F.lit(base) + F.expr("85 * coalesce(__s, 0L) div 100")
            ).cast("long").alias("rank_ppb"),
        )
        ranks = ranks.localCheckpoint(eager=True)
    und.unpersist()
    return ranks
