"""Wave 66: sketch algebra + graph traversal + infra-ops —
HLL set-algebra estimates with tolerance invariants, k-hop BFS reach,
consistent-hash shard rebalance audit, A/A experiment calibration,
decile-matched cohort comparison.

Reference parity note: the reference (/root/reference/etl.py) has no
sketch/graph/experimentation surface; these extend q22/q96 (HLL),
q212/q319 (graph), q64 (hash splits), and q166/q248 (experiment QA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import (
    COSUPPLY_EDGES_SQL,
    cosupply_edges,
)
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

#: q22's tolerance: default-precision HLL is ±2.3% rsd; 5% is ~2 sigma
HLL_TOL = 0.05


@query(
    "q367_sketch_set_algebra",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM a) AS exact_buyers,
        (SELECT CAST(count(*) AS BIGINT) FROM b) AS exact_clickers,
        (SELECT CAST(count(*) AS BIGINT)
         FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS exact_union,
        (SELECT CAST(count(*) AS BIGINT)
         FROM a JOIN b ON b.user_id = a.user_id) AS exact_intersection,
        TRUE AS union_within_tol,
        TRUE AS intersection_within_tol
    """,
)
def q367_sketch_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set algebra — the sketch-union/intersection workflow a 100 TB
    audience-overlap job runs: |A∪B| comes from one merged sketch over
    the unioned stream (HLL unions are lossless), |A∩B| by
    inclusion-exclusion (|A|+|B|−|A∪B| — the error compounds, which is
    exactly what the tolerance column pins).  The q22 invariant
    pattern: exact counts are oracle-pinned values, the sketch
    estimates are verified in-frame against them with a ±5% band
    (union; the intersection inherits the summed error so it gets the
    absolute-error-of-union bound instead).

    Scale shape: two distinct-stream scans collapse into four
    single-row aggregates; nothing driver-side but the scalar
    attaches."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "user_id"])
    buyers = e.where(F.col("event_type") == "purchase").select("user_id")
    clickers = e.where(F.col("event_type") == "click").select("user_id")
    both = buyers.unionAll(clickers)
    # rsd=0.02 (q22's setting): the default 0.05 rsd breached the 5%
    # band at sf0.1 — caught by the volume spot-run, kept as the lesson
    est = (
        buyers.agg(F.approx_count_distinct("user_id", rsd=0.02).alias("est_a"))
        .crossJoin(
            F.broadcast(
                clickers.agg(
                    F.approx_count_distinct("user_id", rsd=0.02).alias("est_b")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                both.agg(F.approx_count_distinct("user_id", rsd=0.02).alias("est_u"))
            )
        )
    )
    exact = (
        buyers.agg(F.count_distinct("user_id").alias("exact_buyers"))
        .crossJoin(
            F.broadcast(
                clickers.agg(F.count_distinct("user_id").alias("exact_clickers"))
            )
        )
        .crossJoin(
            F.broadcast(
                both.distinct().agg(F.count(F.lit(1)).alias("exact_union"))
            )
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_buyers",
        "exact_clickers",
        "exact_union",
        (F.col("exact_buyers") + F.col("exact_clickers") - F.col("exact_union")).alias(
            "exact_intersection"
        ),
        (
            F.abs(F.col("est_u") - F.col("exact_union"))
            <= HLL_TOL * F.col("exact_union")
        ).alias("union_within_tol"),
        # inclusion-exclusion stacks three sketch errors; bound by the
        # union's ABSOLUTE tolerance (the dominant term), not 5% of the
        # (possibly small) intersection
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_u"))
                - (F.col("exact_buyers") + F.col("exact_clickers") - F.col("exact_union"))
            )
            <= 3 * HLL_TOL * F.col("exact_union")
        ).alias("intersection_within_tol"),
    )


BFS_HOPS = 3


@query(
    "q368_khop_reach",
    oracle=f"""
    WITH {COSUPPLY_EDGES_SQL},
    -- MATERIALIZED hop frontiers (round 8): without the hint DuckDB
    -- INLINES each CTE per reference, so h3 re-expands h2 which
    -- re-expands h1 which re-expands the edge self-join — plus every
    -- NOT IN re-expansion — and the exploded join tree spilled >80 GB
    -- at sf0.1 (the full-volume oracle run died on disk).  Materialized
    -- once each, the same query answers in ~1 s.
    und AS MATERIALIZED (
        SELECT u AS a, w AS b FROM edges UNION ALL SELECT w, u FROM edges),
    seed AS MATERIALIZED (SELECT min(u) AS s FROM edges),
    h1 AS MATERIALIZED (
        SELECT DISTINCT n.b AS x FROM und n JOIN seed ON n.a = seed.s),
    h2 AS MATERIALIZED (
        SELECT DISTINCT n.b AS x FROM und n JOIN h1 ON n.a = h1.x
        WHERE n.b NOT IN (SELECT x FROM h1)
          AND n.b != (SELECT s FROM seed)
    ),
    h3 AS MATERIALIZED (
        SELECT DISTINCT n.b AS x FROM und n JOIN h2 ON n.a = h2.x
        WHERE n.b NOT IN (SELECT x FROM h1)
          AND n.b NOT IN (SELECT x FROM h2)
          AND n.b != (SELECT s FROM seed)
    )
    SELECT * FROM (
        SELECT 1 AS hop, CAST(count(*) AS BIGINT) AS n_new FROM h1
        UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM h2
        UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM h3
    ) ORDER BY hop
    """,
)
def q368_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS reach from a seed supplier over the co-supply graph —
    the frontier-expansion primitive (Pregel's inner loop) behind
    blast-radius and influence queries: how many NEW nodes become
    reachable at each hop.  {BFS_HOPS} exact rounds: each hop joins the
    current frontier to the adjacency list and anti-joins everything
    already visited, so a node counts once at its SHORTEST distance.

    Scale shape: per hop, one frontier⋈edges hash join plus one
    left-anti against the (persisted, node-sized) visited set — the
    standard distributed BFS; no multi-hop self-join blowup (a 3-way
    edge join would enumerate paths, not nodes)."""
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    und = edges.select(F.col("u").alias("a"), F.col("w").alias("b")).unionAll(
        edges.select(F.col("w").alias("a"), F.col("u").alias("b"))
    )
    seed = edges.agg(F.min("u").alias("x"))
    visited = seed.select("x").transform(spersist)
    frontier = visited
    rows = []
    for hop in range(1, BFS_HOPS + 1):
        nxt = (
            und.join(frontier.withColumnRenamed("x", "a"), "a")
            .select(F.col("b").alias("x"))
            .distinct()
            .join(visited, "x", "left_anti")
            .transform(spersist)
        )
        rows.append(
            nxt.agg(
                F.lit(hop).cast("long").alias("hop"),
                F.count(F.lit(1)).cast("long").alias("n_new"),
            )
        )
        visited = visited.unionAll(nxt).transform(spersist)
        frontier = nxt
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("hop")


N_SHARDS_OLD = 16
N_SHARDS_NEW = 17
N_VNODES = 8  # virtual nodes per shard on the hash ring


def _ring_sql(n_shards: int, alias: str) -> str:
    """DuckDB ring-position table: (shard, md5-hex vnode position) —
    md5 is the cross-engine hash (identical bytes in Spark and DuckDB),
    and ring order is the hex string's lexicographic order."""
    return f"""
        {alias} AS (
            SELECT s.s AS shard,
                   md5(CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)) AS pos
            FROM (SELECT unnest(range({n_shards})) AS s) s
            CROSS JOIN (SELECT unnest(range({N_VNODES})) AS v) v
        )
    """


@query(
    "q369_shard_rebalance_audit",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT user_id AS k FROM events),
    {_ring_sql(N_SHARDS_OLD, "ring_old")},
    {_ring_sql(N_SHARDS_NEW, "ring_new")},
    old_assign AS (
        SELECT k, arg_min(shard, CASE WHEN pos >= kh THEN '0' || pos
                                      ELSE '1' || pos END) AS shard
        FROM (SELECT k, md5(CAST(k AS VARCHAR)) AS kh FROM keys)
        CROSS JOIN ring_old GROUP BY k
    ),
    new_assign AS (
        SELECT k, arg_min(shard, CASE WHEN pos >= kh THEN '0' || pos
                                      ELSE '1' || pos END) AS shard
        FROM (SELECT k, md5(CAST(k AS VARCHAR)) AS kh FROM keys)
        CROSS JOIN ring_new GROUP BY k
    ),
    mod_moved AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM keys
        WHERE k % {N_SHARDS_OLD} != k % {N_SHARDS_NEW}
    )
    SELECT CAST((SELECT count(*) FROM keys) AS BIGINT) AS n_keys,
           (SELECT n FROM mod_moved) AS mod_moved,
           CAST((SELECT count(*) FROM old_assign o JOIN new_assign n
                 ON n.k = o.k WHERE n.shard != o.shard) AS BIGINT) AS ring_moved,
           (SELECT count(*) FROM old_assign o JOIN new_assign n
            ON n.k = o.k WHERE n.shard != o.shard)
               * {N_SHARDS_OLD + 1} < (SELECT n FROM mod_moved) * 3
               AS ring_beats_mod
    """,
)
def q369_shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing rebalance audit: adding one shard
    ({N_SHARDS_OLD} → {N_SHARDS_NEW}), how many keys MOVE under naive
    modulo placement vs a consistent-hash ring ({N_VNODES} vnodes per
    shard)?  Modulo moves ~{N_SHARDS_OLD}/{N_SHARDS_NEW} of all keys
    (every key whose two residues differ); the ring moves only keys
    whose arc lands on the new shard's vnodes (~1/{N_SHARDS_NEW}) —
    the audit a storage/router migration runs before committing.  Both
    engines use xxhash64-class integer hashes halved into the same
    non-negative domain; the oracle pins the exact counts and the
    "ring beats mod by ≥3×" verdict via integer cross-multiplication.
    Ring positions are md5 hex strings (byte-identical across engines)
    ordered lexicographically; the clockwise successor is the first
    vnode at-or-after the key's position, wrapping to the ring minimum
    ("0"/"1"-prefixed keys make one min_by express the wrap).

    Scale shape: assignment is one broadcast join of the (shards ×
    vnodes) ring table against the key stream with a min_by over the
    clockwise distance — per-key work is |ring| codegen comparisons,
    no shuffle until the two bounded counts."""
    e = read_table(spark, sf_dir, "events", columns=["user_id"])
    keys = e.select(F.col("user_id").alias("k")).distinct().transform(spersist)

    def ring(n_shards: int) -> DataFrame:
        shards = spark.range(n_shards).select(F.col("id").alias("shard"))
        vnodes = spark.range(N_VNODES).select(F.col("id").alias("v"))
        return shards.crossJoin(vnodes).select(
            "shard",
            F.md5(
                F.concat(
                    F.col("shard").cast("string"),
                    F.lit(":"),
                    F.col("v").cast("string"),
                )
            ).alias("pos"),
        )

    kh = keys.select("k", F.md5(F.col("k").cast("string")).alias("kh"))

    def assign(ring_df: DataFrame, out: str) -> DataFrame:
        dist = F.when(
            F.col("pos") >= F.col("kh"), F.concat(F.lit("0"), F.col("pos"))
        ).otherwise(F.concat(F.lit("1"), F.col("pos")))
        return (
            kh.crossJoin(F.broadcast(ring_df))
            .groupBy("k")
            .agg(F.min_by("shard", dist).alias(out))
        )

    old_a = assign(ring(N_SHARDS_OLD), "old_shard")
    new_a = assign(ring(N_SHARDS_NEW), "new_shard")
    moved = old_a.join(new_a, "k").where(F.col("old_shard") != F.col("new_shard"))
    n_keys = keys.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    mod_moved = keys.where(
        F.col("k") % N_SHARDS_OLD != F.col("k") % N_SHARDS_NEW
    ).agg(F.count(F.lit(1)).cast("long").alias("mod_moved"))
    ring_moved = moved.agg(F.count(F.lit(1)).cast("long").alias("ring_moved"))
    return (
        n_keys.crossJoin(F.broadcast(mod_moved))
        .crossJoin(F.broadcast(ring_moved))
        .select(
            "n_keys",
            "mod_moved",
            "ring_moved",
            (
                F.col("ring_moved") * (N_SHARDS_OLD + 1) * 3
                < F.col("mod_moved") * (N_SHARDS_OLD + 1)
            ).alias("ring_beats_mod"),
        )
    )


N_AA_SPLITS = 20
AA_THRESHOLD_PCT = 5  # |arm diff| > 5% of the pooled mean counts as a "hit"


@query(
    "q370_aa_calibration",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS rev
        FROM events GROUP BY user_id
    ),
    splits AS (SELECT unnest(range({N_AA_SPLITS})) AS s),
    armed AS (
        SELECT s.s,
               CASE WHEN (user_id % 1048576) * 2654435761 * (s.s + 41) % 1000 < 500
                    THEN 0 ELSE 1 END AS arm,
               rev
        FROM per_user CROSS JOIN splits s
    ),
    arm_sums AS (
        SELECT s, arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(rev) AS BIGINT) AS r
        FROM armed GROUP BY s, arm
    ),
    diffs AS (
        SELECT a.s,
               -- |mean0 - mean1| > 5% of pooled mean, cross-multiplied to
               -- stay in exact integers: |r0*n1 - r1*n0| * (n0+n1) * 100
               --   > 5 * (r0+r1) * n0 * n1
               (abs(a.r * b.n - b.r * a.n) * (a.n + b.n) * 100
                > {AA_THRESHOLD_PCT} * (a.r + b.r) * a.n * b.n) AS hit
        FROM arm_sums a JOIN arm_sums b ON b.s = a.s AND a.arm = 0 AND b.arm = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_splits,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_false_hits,
           sum(CASE WHEN hit THEN 1 ELSE 0 END) * 5 <= count(*)
               AS calibration_ok
    FROM diffs
    """,
)
def q370_aa_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A calibration of the experiment machinery: {N_AA_SPLITS}
    independent hash splits of the SAME population into two arms — any
    |mean revenue difference| above 5% of the pooled mean is a false
    hit, and more than 20% of splits hitting means the splitter or the
    metric is mis-calibrated (the pre-flight every experimentation
    platform runs; complements q248's single-split SRM check).  The
    hit test is integer cross-multiplication — no float means compared
    across engines.

    Scale shape: the fact collapses to per-user revenue first; the ×20
    split expansion runs on the user-grain frame and map-side combines
    into 40 (split, arm) cells."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "user_id", "value"])
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("rev")
    )
    splits = spark.range(N_AA_SPLITS).select(F.col("id").alias("s"))
    arm = (
        F.when(
            ((F.col("user_id") % 1048576) * 2654435761 * (F.col("s") + 41)) % 1000
            < 500,
            0,
        ).otherwise(1)
    ).alias("arm")
    arm_sums = (
        per_user.crossJoin(F.broadcast(splits))
        .select("s", arm, "rev")
        .groupBy("s", "arm")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("rev").cast("long").alias("r"))
    )
    a = arm_sums.where(F.col("arm") == 0).select("s", F.col("n").alias("n0"), F.col("r").alias("r0"))
    b = arm_sums.where(F.col("arm") == 1).select("s", F.col("n").alias("n1"), F.col("r").alias("r1"))
    hit = (
        F.abs(F.col("r0") * F.col("n1") - F.col("r1") * F.col("n0"))
        * (F.col("n0") + F.col("n1"))
        * 100
        > AA_THRESHOLD_PCT
        * (F.col("r0") + F.col("r1"))
        * F.col("n0")
        * F.col("n1")
    )
    diffs = a.join(b, "s").select(hit.alias("hit"))
    return diffs.agg(
        F.count(F.lit(1)).cast("long").alias("n_splits"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long").alias("n_false_hits"),
        (
            F.sum(F.when(F.col("hit"), 1).otherwise(0)) * 5 <= F.count(F.lit(1))
        ).alias("calibration_ok"),
    )


N_MATCH_DECILES = 10


@query(
    "q371_matched_cohort_lift",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS activity,
               CAST(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS rev,
               user_id % 2 AS cohort
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT *, ntile({N_MATCH_DECILES}) OVER (ORDER BY activity, user_id)
                   AS stratum
        FROM per_user
    ),
    cells AS (
        SELECT stratum, cohort,
               CAST(count(*) AS BIGINT) AS n, CAST(sum(rev) AS BIGINT) AS r
        FROM ranked GROUP BY stratum, cohort
    )
    SELECT CAST(a.stratum AS BIGINT) AS stratum,
           a.n AS n_cohort0, b.n AS n_cohort1,
           round(CAST(a.r AS DOUBLE) / a.n, 4) AS mean_rev0,
           round(CAST(b.r AS DOUBLE) / b.n, 4) AS mean_rev1,
           b.r * a.n > a.r * b.n AS cohort1_higher
    FROM cells a JOIN cells b ON b.stratum = a.stratum
    WHERE a.cohort = 0 AND b.cohort = 1
    ORDER BY stratum
    """,
)
def q371_matched_cohort_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-matched cohort comparison — stratified (propensity-
    bucket-style) lift: users split into activity deciles FIRST, then
    revenue compared between cohorts WITHIN each stratum, so an
    activity imbalance between cohorts cannot masquerade as a revenue
    effect (the observational-data version of q166's CUPED).  The
    higher/lower verdict per stratum is integer cross-multiplied.

    Scale shape: per-user aggregate → decile assignment (user-grain
    ntile; at fact scale the two-phase global_ntile applies) → bounded
    (stratum × cohort) cells."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "user_id", "value"])
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("activity"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("rev"),
    ).withColumn("cohort", F.col("user_id") % 2)
    from udacity_datalake_spark_spark.operators.topk import global_ntile

    ranked = global_ntile(
        per_user,
        [F.col("activity"), F.col("user_id")],
        "activity",
        N_MATCH_DECILES,
        out_col="stratum",
    )
    cells = ranked.groupBy("stratum", "cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("r"),
    )
    a = cells.where(F.col("cohort") == 0).select(
        "stratum", F.col("n").alias("n_cohort0"), F.col("r").alias("r0")
    )
    b = cells.where(F.col("cohort") == 1).select(
        "stratum", F.col("n").alias("n_cohort1"), F.col("r").alias("r1")
    )
    return (
        a.join(b, "stratum")
        .select(
            F.col("stratum").cast("long").alias("stratum"),
            "n_cohort0",
            "n_cohort1",
            F.round(F.col("r0").cast("double") / F.col("n_cohort0"), 4).alias(
                "mean_rev0"
            ),
            F.round(F.col("r1").cast("double") / F.col("n_cohort1"), 4).alias(
                "mean_rev1"
            ),
            (F.col("r1") * F.col("n_cohort0") > F.col("r0") * F.col("n_cohort1")).alias(
                "cohort1_higher"
            ),
        )
        .orderBy("stratum")
    )
