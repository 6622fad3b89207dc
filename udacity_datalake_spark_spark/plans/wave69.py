"""Wave 69: graph quality + fair allocation + seasonality strength +
decayed frequency — Newman modularity of a labeled partition, max-min
fair share (water-filling), seasonal-strength variance ratio, and
exponentially-decayed heavy hitters.

Reference parity note: the reference (/root/reference/etl.py) has no
graph/allocation surface; these extend the graph family
(q212/q217/q241 assortativity), quota allocation (q178), seasonality
(q252/q330) and heavy hitters (q215).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import (
    COSUPPLY_EDGES_SQL,
    cosupply_edges,
)
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q381_partition_modularity",
    oracle=f"""
    WITH {COSUPPLY_EDGES_SQL},
    lbl AS (SELECT s_suppkey AS x, s_nationkey AS c FROM supplier),
    m AS (SELECT count(*) AS m FROM edges),
    intra AS (
        SELECT lu.c, count(*) AS e_c
        FROM edges e
        JOIN lbl lu ON lu.x = e.u
        JOIN lbl lw ON lw.x = e.w
        WHERE lu.c = lw.c
        GROUP BY lu.c
    ),
    deg AS (
        SELECT l.c, count(*) AS d_c
        FROM (SELECT u AS x FROM edges UNION ALL SELECT w FROM edges) ep
        JOIN lbl l ON l.x = ep.x
        GROUP BY l.c
    ),
    terms AS (
        SELECT d.c,
               COALESCE(i.e_c, 0) AS e_c,
               d.d_c,
               -- exact scaled term: (4*m*e_c - d_c^2) / (4*m^2), kept as
               -- an integer numerator over the common denominator
               4 * m.m * COALESCE(i.e_c, 0) - d.d_c * d.d_c AS num
        FROM deg d CROSS JOIN m LEFT JOIN intra i ON i.c = d.c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_communities,
           CAST(max(m.m) AS BIGINT) AS n_edges,
           CAST(sum(e_c) AS BIGINT) AS intra_edges,
           round(CAST(sum(num) AS DOUBLE) / (4.0 * max(m.m) * max(m.m)), 6)
               AS modularity
    FROM terms CROSS JOIN m
    """,
)
def q381_partition_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the NATION partition over the supplier
    co-supply graph — does geography explain who co-supplies?
    Q = Σ_c [e_c/m − (d_c/2m)²], computed as one exact integer
    numerator Σ_c (4·m·e_c − d_c²) over 4m² with a single rounded
    division (the community-quality score label-propagation /
    Louvain-style pipelines optimize; here it grades a GIVEN labeling,
    the standard first question before running community detection).

    Scale shape: two label joins on the edge list (intra-edge count)
    plus one endpoint-grain degree aggregate — all graph-sized; the
    community frame is |nations|."""
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    s = read_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    lbl = s.select(F.col("s_suppkey").alias("x"), F.col("s_nationkey").alias("c"))
    m = edges.agg(F.count(F.lit(1)).alias("m"))
    intra = (
        edges.join(F.broadcast(lbl.select(F.col("x").alias("u"), F.col("c").alias("cu"))), "u")
        .join(F.broadcast(lbl.select(F.col("x").alias("w"), F.col("c").alias("cw"))), "w")
        .where(F.col("cu") == F.col("cw"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("w").alias("x")))
        .join(F.broadcast(lbl), "x")
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("d_c"))
    )
    terms = (
        deg.join(intra, "c", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "c",
            F.coalesce("e_c", F.lit(0)).alias("e_c"),
            "d_c",
            (
                4 * F.col("m") * F.coalesce("e_c", F.lit(0))
                - F.col("d_c") * F.col("d_c")
            ).alias("num"),
            "m",
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.max("m").cast("long").alias("n_edges"),
        F.sum("e_c").cast("long").alias("intra_edges"),
        F.round(
            F.sum("num").cast("double") / (4.0 * F.max("m") * F.max("m")), 6
        ).alias("modularity"),
    )


#: total capacity the fair-share allocator distributes (events/user cap
#: budget — the water-filling demo keeps it scale-free as a fraction)
FAIR_CAPACITY_PCT = 50  # capacity = 50% of total demand


@query(
    "q382_maxmin_fair_share",
    oracle=f"""
    WITH demand AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS d
        FROM events GROUP BY user_id
    ),
    cap AS (SELECT CAST(sum(d) * {FAIR_CAPACITY_PCT} / 100 AS BIGINT) AS c
            FROM demand),
    ranked AS (
        SELECT user_id, d,
               row_number() OVER (ORDER BY d, user_id) AS r,
               count(*) OVER () AS n,
               COALESCE(sum(d) OVER (ORDER BY d, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prefix
        FROM demand
    ),
    -- water level: the first rank r where satisfying all demands below
    -- r and splitting the rest evenly stops covering demand d_r; the
    -- integer water level is floor((C - prefix) / remaining_users)
    levels AS (
        SELECT r, d, prefix, n,
               (c.c - prefix) / (n - r + 1) AS level
        FROM ranked CROSS JOIN cap c
    ),
    sat AS (SELECT max(r) AS r_sat FROM levels WHERE d <= level),
    alloc AS (
        SELECT l.r, l.d,
               CASE WHEN s.r_sat IS NOT NULL AND l.r <= s.r_sat THEN l.d
                    ELSE (SELECT CAST((c.c - x.prefix) // (x.n - x.r + 1)
                                      AS BIGINT)
                          FROM levels x CROSS JOIN cap c
                          WHERE x.r = COALESCE(s.r_sat, 0) + 1)
               END AS a
        FROM levels l CROSS JOIN sat s
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(max((SELECT c FROM cap)) AS BIGINT) AS capacity,
           CAST(sum(CASE WHEN a >= d THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fully_satisfied,
           CAST(min(CASE WHEN a < d THEN a END) AS BIGINT) AS fair_share,
           CAST(sum(LEAST(a, d)) AS BIGINT) AS total_allocated
    FROM alloc
    """,
)
def q382_maxmin_fair_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair allocation (progressive water-filling) of a request
    budget across users — the scheduler/rate-limiter algorithm: sort
    demands ascending; every demand below the water level is fully
    satisfied; everyone else gets the same integer fair share
    ⌊remaining/|unsatisfied|⌋.  The water level falls out of ONE sorted
    prefix-sum pass (no iteration): the satisfied prefix is the maximal
    r where d_r ≤ (C − prefix_r)/(n − r + 1).

    Scale shape: demand is one user-grain aggregate; the ranking is a
    sorted window over the (user-grain) demand frame — at fact scale
    the two-phase global_row_number applies; the allocation rule is
    closed-form integer arithmetic."""
    e = read_table(spark, sf_dir, "events", columns=["user_id"])
    demand = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("d"))
    cap = demand.agg(
        (F.sum("d") * FAIR_CAPACITY_PCT / 100).cast("long").alias("c")
    )
    w = Window.orderBy("d", "user_id")
    ranked = demand.select(
        "user_id",
        "d",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.coalesce(
            F.sum("d").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).alias("prefix"),
    )
    levels = ranked.crossJoin(F.broadcast(cap)).select(
        "r",
        "d",
        "prefix",
        "n",
        "c",
        ((F.col("c") - F.col("prefix")) / (F.col("n") - F.col("r") + 1)).alias(
            "level"
        ),
    ).transform(spersist)
    sat = levels.where(F.col("d") <= F.col("level")).agg(
        F.max("r").alias("r_sat")
    )
    # aggregate (not filter-project): when every demand is satisfied
    # r_sat = n and no r_sat+1 row exists — the agg still yields ONE row
    # with a NULL share, which the satisfied branch below never reads
    share_row = (
        levels.crossJoin(F.broadcast(sat))
        .where(F.col("r") == F.coalesce(F.col("r_sat"), F.lit(0)) + 1)
        .agg(
            F.min(
                F.floor(
                    (F.col("c") - F.col("prefix")) / (F.col("n") - F.col("r") + 1)
                ).cast("long")
            ).alias("share")
        )
    )
    alloc = (
        levels.crossJoin(F.broadcast(sat))
        .crossJoin(F.broadcast(share_row))
        .select(
            "d",
            F.when(
                F.col("r_sat").isNotNull() & (F.col("r") <= F.col("r_sat")),
                F.col("d"),
            )
            .otherwise(F.col("share"))
            .alias("a"),
        )
    )
    return alloc.crossJoin(F.broadcast(cap)).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.max("c").cast("long").alias("capacity"),
        F.sum(F.when(F.col("a") >= F.col("d"), 1).otherwise(0))
        .cast("long")
        .alias("n_fully_satisfied"),
        F.min(F.when(F.col("a") < F.col("d"), F.col("a")))
        .cast("long")
        .alias("fair_share"),
        F.sum(F.least("a", "d")).cast("long").alias("total_allocated"),
    )


@query(
    "q383_seasonal_strength",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, isodow(CAST(ts AS DATE)) AS dow,
               CAST(sum(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0)
                        AS BIGINT)) AS BIGINT) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    dows AS (
        SELECT dow, CAST(count(*) AS BIGINT) AS n_d,
               CAST(sum(rev) AS BIGINT) AS s_d
        FROM daily GROUP BY dow
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rev) AS BIGINT) AS s,
               CAST(sum(CAST(rev AS HUGEINT) * rev) AS HUGEINT) AS ss
        FROM daily
    ),
    between_var AS (
        -- n * Σ_d n_d*(mean_d - mean)² expressed exactly:
        -- Σ_d (n*s_d - n_d*s)² / (n_d * n²)... keep double, round late
        SELECT sum(
            (CAST(t.n AS DOUBLE) * s_d / n_d - CAST(t.s AS DOUBLE))
            * (CAST(t.n AS DOUBLE) * s_d / n_d - CAST(t.s AS DOUBLE))
            * n_d / t.n / t.n) AS bv
        FROM dows CROSS JOIN tot t
    ),
    total_var AS (
        SELECT (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS tv, n
        FROM tot
    )
    SELECT CAST(total_var.n AS BIGINT) AS n_days,
           round(between_var.bv / total_var.tv, 6) AS seasonal_strength
    FROM between_var CROSS JOIN total_var
    """,
)
def q383_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal strength of daily revenue: the share of total
    variance explained by the day-of-week means (the ANOVA
    between-group over total sum of squares) — the one number that says
    whether a seasonal model is worth fitting at all (q330 reports the
    per-weekday indices; this grades how much they matter).  Sums stay
    exact integers until two late double divisions, rounded once.

    Scale shape: fact → day grain → 7-row weekday grain; the variance
    decomposition is closed-form on scalars."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(
            F.col("ts").cast("date").alias("d"),
            (((F.dayofweek(F.col("ts").cast("date")) + 5) % 7) + 1).alias("dow"),
        )
        .agg(
            F.sum(
                F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long")
            )
            .cast("long")
            .alias("rev")
        )
    )
    dows = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum("rev").cast("long").alias("s_d"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("s"),
        F.sum(F.col("rev").cast("decimal(38,0)") * F.col("rev")).alias("ss"),
    )
    dev = (
        F.col("n").cast("double") * F.col("s_d") / F.col("n_d")
        - F.col("s").cast("double")
    )
    bv = (
        dows.crossJoin(F.broadcast(tot))
        .select((dev * dev * F.col("n_d") / F.col("n") / F.col("n")).alias("term"))
        .agg(F.sum("term").alias("bv"))
    )
    tv = tot.select(
        "n",
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        ).alias("tv"),
    )
    return bv.crossJoin(F.broadcast(tv)).select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("bv") / F.col("tv"), 6).alias("seasonal_strength"),
    )


#: decayed heavy hitters: weight halves every DECAY_HALF_LIFE_DAYS
#: behind the high-water mark; dyadic integer weights (q356's idiom)
DECAY_HALF_LIFE_DAYS = 30
DECAY_SCALE = 1024
DECAY_TOPK = 15


@query(
    "q384_decayed_heavy_hitters",
    oracle=f"""
    WITH hw AS (SELECT max(ts) AS hwm FROM events),
    weighted AS (
        SELECT user_id,
               {DECAY_SCALE} // CAST(power(2,
                   (epoch_us(hwm) - epoch_us(ts))
                       // {DECAY_HALF_LIFE_DAYS * 86400 * 1_000_000})
                   AS BIGINT) AS w
        FROM events CROSS JOIN hw
    ),
    scored AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(w) AS BIGINT) AS decayed_weight
        FROM weighted GROUP BY user_id
    )
    SELECT user_id, n_events, decayed_weight,
           CAST(row_number() OVER (
               ORDER BY decayed_weight DESC, user_id) AS INT) AS rnk
    FROM scored
    QUALIFY rnk <= {DECAY_TOPK}
    """,
)
def q384_decayed_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed heavy hitters: the top users by
    RECENCY-WEIGHTED activity (weight halves every 30 days behind the
    table's high-water mark) — the trending-now ranking, where q215's
    undecayed counts surface all-time heavyweights instead.  Dyadic
    integer weights (1024 >> (age_days // 30), q356's idiom) keep the
    scores exact int64 sums.

    Scale shape: the high-water mark broadcasts; weighting is per-row
    codegen; one user-grain aggregate and a TakeOrderedAndProject
    top-{DECAY_TOPK}."""
    from udacity_datalake_spark_spark.operators.topk import ranked_topk

    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    hw = e.agg(F.max("ts").alias("hwm"))
    age_hl = (
        (F.unix_micros("hwm") - F.unix_micros("ts"))
        / (DECAY_HALF_LIFE_DAYS * 86400 * 1_000_000)
    ).cast("long")
    scored = (
        e.crossJoin(F.broadcast(hw))
        .select(
            "user_id",
            (F.lit(DECAY_SCALE) / F.pow(F.lit(2.0), age_hl)).cast("long").alias("w"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("w").cast("long").alias("decayed_weight"),
        )
    )
    return ranked_topk(
        scored,
        [F.col("decayed_weight").desc(), F.col("user_id")],
        DECAY_TOPK,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("int"))
