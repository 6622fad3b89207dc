"""Connected components over an edge list — the clustering step that
turns pairwise near-duplicate hits (MinHash/SimHash/Jaccard pairs) into
duplicate GROUPS, so a dedup pass can keep one canonical document per
component instead of per pair.

Algorithm: alternating large-star/small-star rounds (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — MR-CC).
Both rules re-point edges at per-node minima, so the edge set converges
to a star forest rooted at each component's minimum id in O(log n)
rounds REGARDLESS of diameter — a path-shaped near-dup chain (doc A ~ B
~ C ~ … ~ Z) that would take O(n) min-label-propagation rounds finishes
in a dozen.  The driver-side loop only ever moves per-round signature
scalars, never row data.

Each round truncates lineage via localCheckpoint, so the plan doesn't
grow exponentially with iterations (the classic iterative-DataFrame
trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from udacity_datalake_spark_spark.scratch import spersist

#: Rounds the last distributed connected_components call took to reach
#: its fixed point — observability hook for the O(log n) property test.
last_cc_rounds: int = 0


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
    global last_cc_rounds
    last_cc_rounds = 0  # set by the distributed loop; 0 on the union-find path
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
    # ONE action decides the gate AND fetches the edges (round 11): take
    # threshold+1 rows — if the take returns <= threshold rows it
    # necessarily returned EVERY edge (take only truncates past its
    # limit), so the union-find path already has its input and the
    # separate count()+collect() pair collapses to a single driver
    # round-trip; if it returns threshold+1 rows the graph is large and
    # the distributed loop never needed the exact count anyway.
    head = ed.take(small_graph_threshold + 1)
    if len(head) <= small_graph_threshold:
        pairs = [(r[0], r[1]) for r in head]
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

    # ---- distributed path: alternating large-star / small-star --------
    # Edges live canonically as (a, b) with a > b; both rules only ever
    # re-point an endpoint at a per-node MINIMUM, so the set shrinks
    # toward the star forest rooted at each component's min id in
    # O(log n) rounds (Kiveris et al., MR-CC) — the refinement min-label
    # propagation (O(diameter) rounds) only had on paper until round 3.
    e = (
        ed.where(F.col("node") != F.col("nbr"))
        .select(
            F.greatest("node", "nbr").alias("a"), F.least("node", "nbr").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    # Fixed-point signature: both rules are endpoint-non-increasing, so
    # the (count, Σa, Σb, Σ xxhash64(a,b)) quadruple is stationary iff
    # the edge set is — one tiny aggregate action per round, no
    # new-vs-old join.  The per-edge hash term makes a coincidental
    # (count, Σa, Σb) collision between DIFFERENT edge sets (possible in
    # principle: monotone re-pointing preserving both endpoint sums)
    # astronomically unlikely rather than merely improbable.
    # decimal(38,0) so a 1e9-node graph of int64 ids can't overflow.
    def _sig(frame: DataFrame):
        row = frame.agg(
            F.count(F.lit(1)),
            F.sum(F.col("a").cast("decimal(38,0)")),
            F.sum(F.col("b").cast("decimal(38,0)")),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
        ).first()
        return tuple(row)

    prev_sig = _sig(e)
    rounds = 0
    for _ in range(max_iter):
        # large-star: at every node u, link each STRICTLY LARGER
        # neighbor v to m = min(N(u) ∪ {u}).  Always v > m, so output
        # is already canonical.
        und = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = und.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        ls = (
            und.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: at every node a, link its ≤-neighbors (all of b,
        # since edges are canonical) AND a itself to mv = min of them.
        mins2 = ls.groupBy("a").agg(F.min("b").alias("m"))
        ss_members = (
            ls.join(mins2, "a")
            .where(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        ss_self = mins2.select(F.col("a"), F.col("m").alias("b"))
        e = ss_members.union(ss_self).distinct().localCheckpoint(eager=True)
        rounds += 1
        cur_sig = _sig(e)
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig
    last_cc_rounds = rounds

    # star forest → labels: every big endpoint points at its root, roots
    # label themselves; the min() is a no-op at the fixed point but keeps
    # the output well-defined if max_iter cut convergence short.
    return (
        e.select(F.col("a").alias("node"), F.col("b").alias("component"))
        .union(e.select(F.col("b").alias("node"), F.col("b").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


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
        .transform(spersist)
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
