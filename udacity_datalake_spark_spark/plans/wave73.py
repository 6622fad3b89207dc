"""Wave 73: sampling-theory + OLAP-theory + warehouse-theory —
Duffield-Lund-Thorup priority sampling with a Horvitz-Thompson
estimate, 2-D prefix-sum range counting (Ho et al. 1997 datacube
prefix sums), and a bitemporal as-of reconstruction.

Reference parity note: the reference (/root/reference/etl.py) has no
sampling/OLAP-theory surface; these extend the sampling family
(q167/q246/q332), the cube family (q19-q21/q375), and SCD2/CDC
(q111/q112/q344).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

PRIORITY_K = 200


@query(
    "q391_priority_sampling",
    oracle=f"""
    WITH w AS (
        SELECT o_orderkey AS k,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0)
                    AS BIGINT) AS wt,
               -- uniform in (0, 1e6]: md5-ascii mix (the cross-engine
               -- deterministic RNG), never 0
               1 + (ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                    * 1000003
                    + ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 3, 1))
                    * 4799
                    + ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 5, 1)))
                   % 1000000 AS u
        FROM orders
    ),
    pri AS (
        -- priority q = w / u, compared without division via exact
        -- integer cross-multiplication encoded in the ORDER BY; the
        -- rank window orders by (w * 1e6 / u) descending — computed as
        -- an exact DECIMAL product
        SELECT k, wt, u,
               CAST(wt AS HUGEINT) * 1000000 / u AS q_scaled,
               row_number() OVER (
                   ORDER BY CAST(wt AS HUGEINT) * 1000000 // u DESC, k) AS r
        FROM w
    ),
    thresh AS (
        SELECT CAST(wt AS HUGEINT) * 1000000 // u AS tau
        FROM pri WHERE r = {PRIORITY_K} + 1
    ),
    sample AS (SELECT k, wt FROM pri WHERE r <= {PRIORITY_K}),
    est AS (
        SELECT CAST(sum(GREATEST(CAST(wt AS HUGEINT),
                                 (SELECT tau FROM thresh) // 1000000))
                    AS BIGINT) AS ht_estimate
        FROM sample
    ),
    tot AS (SELECT CAST(sum(wt) AS BIGINT) AS true_total FROM w)
    SELECT CAST({PRIORITY_K} AS BIGINT) AS k,
           (SELECT true_total FROM tot) AS true_total_cents,
           (SELECT ht_estimate FROM est) AS ht_estimate_cents,
           abs((SELECT ht_estimate FROM est) - (SELECT true_total FROM tot))
               * 10 <= (SELECT true_total FROM tot) * 2 AS within_20pct
    """,
)
def q391_priority_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): the
    weighted-sampling scheme with near-optimal variance for subset-sum
    estimation — each order gets priority w/u for a deterministic
    uniform u (md5-ascii mix, the cross-engine RNG), the top-k
    priorities form the sample, and the Horvitz-Thompson estimator
    Σ max(w, τ) (τ = the (k+1)-th priority) estimates the TRUE total.
    The oracle pins the exact sample arithmetic AND a 20% accuracy band
    via integer cross-multiplication — both engines compute identical
    priorities, so the estimate itself is deterministic.

    Scale shape: priorities are per-row codegen; the top-k and the
    (k+1)-th threshold ride one rank pass (TakeOrderedAndProject-class
    at k+1); the estimator is one bounded aggregate over k rows."""
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    h = F.md5(F.col("o_orderkey").cast("string"))
    u = (
        1
        + (
            F.ascii(F.substring(h, 1, 1)) * 1000003
            + F.ascii(F.substring(h, 3, 1)) * 4799
            + F.ascii(F.substring(h, 5, 1))
        )
        % 1000000
    )
    w = o.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0)
        .cast("long")
        .alias("wt"),
        u.alias("u"),
    )
    q_scaled = F.expr("CAST((CAST(wt AS DECIMAL(38,0)) * 1000000) DIV u AS DECIMAL(38,0))")
    pri = w.select("k", "wt", q_scaled.alias("q"))
    # top-(k+1) in one ordered-limit pass; the window only ranks k+1 rows
    topk1 = (
        pri.orderBy(F.col("q").desc(), "k")
        .limit(PRIORITY_K + 1)
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy(F.lit(0)).orderBy(F.col("q").desc(), "k")
            ),
        )
    )
    tau = topk1.where(F.col("r") == PRIORITY_K + 1).agg(
        F.min(F.expr("CAST(q DIV 1000000 AS BIGINT)")).alias("tau_w")
    )
    sample = topk1.where(F.col("r") <= PRIORITY_K)
    est = sample.crossJoin(F.broadcast(tau)).agg(
        F.sum(F.greatest(F.col("wt"), F.col("tau_w"))).cast("long").alias(
            "ht_estimate_cents"
        )
    )
    tot = w.agg(F.sum("wt").cast("long").alias("true_total_cents"))
    return tot.crossJoin(F.broadcast(est)).select(
        F.lit(PRIORITY_K).cast("long").alias("k"),
        "true_total_cents",
        "ht_estimate_cents",
        (
            F.abs(F.col("ht_estimate_cents") - F.col("true_total_cents")) * 10
            <= F.col("true_total_cents") * 2
        ).alias("within_20pct"),
    )


GRID_N = 16  # GRID_N x GRID_N prefix-sum grid


@query(
    "q392_prefix_sum_range_count",
    oracle=f"""
    WITH pts AS (
        SELECT LEAST(CAST(round(CAST(c_acctbal AS DECIMAL(18,2)) * 100, 0)
                          AS BIGINT) * {GRID_N} // 1000100,
                     {GRID_N} - 1) AS gx,
               c_nationkey % {GRID_N} AS gy
        FROM customer WHERE c_acctbal >= 0
    ),
    cells AS (
        SELECT gx, gy, CAST(count(*) AS BIGINT) AS n
        FROM pts GROUP BY gx, gy
    ),
    grid AS (
        SELECT x.x AS gx, y.y AS gy, COALESCE(c.n, 0) AS n
        FROM (SELECT unnest(range({GRID_N})) AS x) x
        CROSS JOIN (SELECT unnest(range({GRID_N})) AS y) y
        LEFT JOIN cells c ON c.gx = x.x AND c.gy = y.y
    ),
    prefix AS (
        SELECT gx, gy,
               sum(n) OVER (ORDER BY gx, gy
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dummy,
               sum(n) OVER (PARTITION BY gy ORDER BY gx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS row_pre
        FROM grid
    ),
    pre2 AS (
        SELECT gx, gy,
               CAST(sum(row_pre) OVER (PARTITION BY gx ORDER BY gy
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS p
        FROM prefix
    ),
    -- three planted rectangle queries [x1..x2] x [y1..y2], answered by
    -- the 4-corner inclusion-exclusion on the prefix grid
    queries AS (
        SELECT * FROM (VALUES (0, 7, 0, 7), (4, 11, 2, 9), (8, 15, 8, 15))
            t(x1, x2, y1, y2)
    )
    SELECT q.x1, q.x2, q.y1, q.y2,
           CAST(pbr.p
                - COALESCE(pl.p, 0) - COALESCE(pb.p, 0)
                + COALESCE(ptl.p, 0) AS BIGINT) AS n_points
    FROM queries q
    JOIN pre2 pbr ON pbr.gx = q.x2 AND pbr.gy = q.y2
    LEFT JOIN pre2 pl ON pl.gx = q.x1 - 1 AND pl.gy = q.y2
    LEFT JOIN pre2 pb ON pb.gx = q.x2 AND pb.gy = q.y1 - 1
    LEFT JOIN pre2 ptl ON ptl.gx = q.x1 - 1 AND ptl.gy = q.y1 - 1
    """,
)
def q392_prefix_sum_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orthogonal range counting via 2-D prefix sums (Ho, Agrawal,
    Megiddo & Srikant, SIGMOD 1997 — the datacube prefix-sum method):
    bucket points onto a {GRID_N}×{GRID_N} grid, build the 2-D
    cumulative grid with two cascaded cumulative windows, and answer
    ANY axis-aligned rectangle count with 4 lookups
    (P[x2,y2] − P[x1−1,y2] − P[x2,y1−1] + P[x1−1,y1−1]) — O(1) per
    query after one O(grid) precomputation, the serving structure
    behind heatmap zoom/pan endpoints.

    Scale shape: the fact collapses to grid cells (bounded {GRID_N}²)
    before any window; the two cumulative passes and the 4-corner joins
    act on the tiny grid."""
    c = read_table(spark, sf_dir, "customer", columns=["c_acctbal", "c_nationkey"])
    cents = F.round(F.col("c_acctbal").cast("decimal(18,2)") * 100, 0).cast("long")
    pts = c.where(F.col("c_acctbal") >= 0).select(
        F.least(
            F.expr(
                f"CAST((CAST(round(CAST(c_acctbal AS DECIMAL(18,2)) * 100, 0) "
                f"AS BIGINT) * {GRID_N}) DIV 1000100 AS BIGINT)"
            ),
            F.lit(GRID_N - 1),
        ).alias("gx"),
        (F.col("c_nationkey") % GRID_N).alias("gy"),
    )
    cells = pts.groupBy("gx", "gy").agg(F.count(F.lit(1)).cast("long").alias("n"))
    xs = spark.range(GRID_N).select(F.col("id").alias("gx"))
    ys = spark.range(GRID_N).select(F.col("id").alias("gy"))
    grid = (
        xs.crossJoin(ys)
        .join(cells, ["gx", "gy"], "left")
        .select("gx", "gy", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w_row = Window.partitionBy("gy").orderBy("gx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_col = Window.partitionBy("gx").orderBy("gy").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pre2 = grid.withColumn("row_pre", F.sum("n").over(w_row)).withColumn(
        "p", F.sum("row_pre").over(w_col).cast("long")
    )
    rects = spark.createDataFrame(
        [(0, 7, 0, 7), (4, 11, 2, 9), (8, 15, 8, 15)],
        "x1 int, x2 int, y1 int, y2 int",
    )
    p = pre2.select("gx", "gy", "p")

    def corner(alias: str, gx_col, gy_col):
        return (
            p.select(
                F.col("gx").alias(f"__{alias}x"),
                F.col("gy").alias(f"__{alias}y"),
                F.col("p").alias(alias),
            ),
            gx_col,
            gy_col,
        )

    out = rects
    for alias, gx_expr, gy_expr in [
        ("pbr", F.col("x2"), F.col("y2")),
        ("pl", F.col("x1") - 1, F.col("y2")),
        ("pb", F.col("x2"), F.col("y1") - 1),
        ("ptl", F.col("x1") - 1, F.col("y1") - 1),
    ]:
        cframe, gxe, gye = corner(alias, gx_expr, gy_expr)
        out = out.join(
            F.broadcast(cframe),
            (F.col(f"__{alias}x") == gxe) & (F.col(f"__{alias}y") == gye),
            "left",
        ).drop(f"__{alias}x", f"__{alias}y")
    return out.select(
        "x1",
        "x2",
        "y1",
        "y2",
        (
            F.col("pbr")
            - F.coalesce("pl", F.lit(0))
            - F.coalesce("pb", F.lit(0))
            + F.coalesce("ptl", F.lit(0))
        )
        .cast("long")
        .alias("n_points"),
    )


#: bitemporal reconstruction: "what did we BELIEVE on audit date A about
#: the value valid on V?"  The synthetic bitemporal table derives from
#: orders — each order's price has a v0 row known at the order date and
#: a restated v1 row known RESTATE_LAG days later (md5-selected subset)
RESTATE_LAG_DAYS = 10
AUDIT_OFFSET_DAYS = 5


@query(
    "q393_bitemporal_asof",
    oracle=f"""
    WITH versions AS (
        SELECT o_orderkey AS k, o_orderdate AS valid_d,
               o_orderdate AS known_d,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0)
                    AS BIGINT) AS cents,
               0 AS ver
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_orderdate,
               o_orderdate + INTERVAL {RESTATE_LAG_DAYS} DAY,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0)
                    AS BIGINT) + 500,
               1
        FROM orders
        WHERE (ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))) % 4 = 0
    ),
    audit AS (
        SELECT k, valid_d, known_d, cents, ver,
               valid_d + INTERVAL {AUDIT_OFFSET_DAYS} DAY AS audit_d
        FROM versions
    ),
    belief AS (
        SELECT k,
               max_by(cents, ver) FILTER (WHERE known_d <= audit_d)
                   AS believed_cents,
               max(ver) FILTER (WHERE known_d <= audit_d) AS believed_ver,
               max_by(cents, ver) AS final_cents
        FROM audit GROUP BY k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(believed_cents) AS BIGINT) AS believed_total_cents,
           CAST(sum(final_cents) AS BIGINT) AS final_total_cents,
           CAST(sum(CASE WHEN believed_cents != final_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_later_restated
    FROM belief
    """,
)
def q393_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of reconstruction — the two-clock warehouse query
    (valid time × transaction time): "what did we BELIEVE on the audit
    date about each order's value, and how does it differ from the
    final truth?"  A deterministic restatement stream (md5-selected 25%
    of orders restate +5.00 ten days later) builds the bitemporal
    version table; the as-of pick is the max-version row KNOWN by the
    audit date (q111's SCD2 tracks one clock; q344 measures restatement
    volume; this reconstructs belief at an arbitrary second clock).

    Scale shape: the version stream is a union of two projections of
    one scan; the as-of pick is one keyed max_by aggregate — no
    windows, no self-join."""
    o = read_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )
    cents = (
        F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0).cast("long")
    )
    v0 = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("valid_d"),
        F.col("o_orderdate").alias("known_d"),
        cents.alias("cents"),
        F.lit(0).alias("ver"),
    )
    restated = o.where(
        F.ascii(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)) % 4 == 0
    )
    v1 = restated.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("valid_d"),
        F.date_add("o_orderdate", RESTATE_LAG_DAYS).alias("known_d"),
        (cents + 500).alias("cents"),
        F.lit(1).alias("ver"),
    )
    audit = v0.unionByName(v1).withColumn(
        "audit_d", F.date_add("valid_d", AUDIT_OFFSET_DAYS)
    )
    known = F.col("known_d") <= F.col("audit_d")
    asof = audit.groupBy("k").agg(
        F.max_by(F.when(known, F.col("cents")), F.when(known, F.col("ver"))).alias(
            "believed_cents"
        ),
        F.max_by("cents", "ver").alias("final_cents"),
    )
    return asof.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("believed_cents").cast("long").alias("believed_total_cents"),
        F.sum("final_cents").cast("long").alias("final_total_cents"),
        F.sum(
            F.when(F.col("believed_cents") != F.col("final_cents"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_later_restated"),
    )
