"""Wave 14: decile lift/gains table and RFM segmentation — the two
classic marketing-analytics reports, both built on the two-phase
ranking operator so no user-dimension sort ever single-partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.topk import global_ntile
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q206_decile_lift",
    oracle="""
    WITH ltv AS (
        SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    tiled AS (
        SELECT user_id, v,
               ntile(10) OVER (ORDER BY v DESC, user_id) AS decile
        FROM ltv
    ),
    per_decile AS (
        SELECT decile, count(*) AS n_users, sum(v) AS decile_value
        FROM tiled GROUP BY decile
    ),
    tot AS (SELECT sum(decile_value) AS total_v FROM per_decile)
    SELECT decile, n_users,
           CAST(decile_value AS DOUBLE) AS decile_value,
           round(CAST(sum(decile_value) OVER (ORDER BY decile
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(total_v AS DOUBLE) * 100, 6) AS cum_value_pct
    FROM per_decile CROSS JOIN tot
    """,
)
def q206_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table: rank purchasers into value deciles and report
    what share of total value each cumulative decile captures — the
    "top 10% of customers hold X% of revenue" chart.

    Deciles come from global_ntile (two-phase, no single-partition
    window over users); value stays DECIMAL-exact through the per-decile
    sums, and the cumulative window runs over the 10-row decile frame.
    The only floats are the final per-row conversions."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "value"])
    ltv = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(dec("value")).alias("v"))
    )
    keyed = ltv.withColumn("__vd", F.col("v").cast("double"))
    tiled = global_ntile(
        keyed, [F.col("v").desc(), F.col("user_id")], "__vd", 10,
        out_col="decile", descending=True,
    ).drop("__vd")
    per_decile = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("v").alias("__dv")
    )
    tot = per_decile.agg(F.sum("__dv").alias("__tv"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_decile.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_users",
        F.col("__dv").cast("double").alias("decile_value"),
        F.round(
            F.sum("__dv").over(w).cast("double") / F.col("__tv").cast("double") * 100, 6
        ).alias("cum_value_pct"),
    )


@query(
    "q207_rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT max(ts) AS ref FROM events),
    rfm AS (
        SELECT user_id,
               CAST(date_diff('day', CAST(max(ts) AS DATE),
                              CAST((SELECT ref FROM mx) AS DATE)) AS BIGINT)
                   AS recency_days,
               count(*) AS frequency,
               sum(CAST(value AS DECIMAL(18,2))) AS monetary
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    scored AS (
        SELECT user_id,
               ntile(5) OVER (ORDER BY recency_days, user_id) AS r_score,
               ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
               ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_score
        FROM rfm
    )
    SELECT r_score, f_score, m_score, count(*) AS n_users
    FROM scored GROUP BY 1, 2, 3
    """,
)
def q207_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile scores for recency (days since last
    purchase — lower is better), frequency, and monetary value, reported
    as segment population counts — the classic customer-base snapshot.

    Each quintile is a global_ntile over the per-user aggregate (one row
    per purchaser) with a deterministic (metric, user_id) order; the
    three rankings chain on the same frame, and the monetary metric is
    DECIMAL-exact until its double bucket key.  Per-user reduction
    happens first, so all ranking work is user-dimension-sized."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "value"])
    mx = e.agg(F.max(F.to_date("ts")).alias("ref"))
    per_user = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(dec("value")).alias("monetary"),
        )
    )
    # ref joins AFTER the per-user reduction (one row per purchaser, not
    # per event); persist: three chained eager global_ntile passes below
    # would otherwise re-run the events scan + aggregation ~7 times
    rfm = (
        per_user.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff("ref", "__last").cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    keyed = rfm.withColumn("__r", F.col("recency_days").cast("double")).withColumn(
        "__f", F.col("frequency").cast("double")
    ).withColumn("__m", F.col("monetary").cast("double")).transform(spersist)
    # The three quintiles run INDEPENDENTLY off the persisted per-user
    # frame and join on user_id (round 12): global_ntile is fully lazy
    # now (in-plan boundary sketch) and references its input from four
    # subtrees, so CHAINING the calls — each level ranking the previous
    # level's output — repeated the base lineage ~4³ times in the static
    # plan; the measured cost was planning/codegen, not data (4.1 s →
    # 13.8 s at sf0.1 when chained unchecked).  The scores never read
    # each other — each is a function of (metric, user_id) alone — so
    # unchaining is output-identical (exceptAll-verified both ways);
    # each ntile's plan stays one level deep over the cached frame and
    # the user_id joins are user-dimension-sized.  Measured 2.66 s vs
    # the eager-probe r11 form's 2.78 s and the naive chain's 13.8 s.
    nr = global_ntile(
        keyed, [F.col("recency_days"), F.col("user_id")], "__r", 5, out_col="r_score"
    ).select("user_id", "r_score")
    nf = global_ntile(
        keyed, [F.col("frequency").desc(), F.col("user_id")], "__f", 5,
        out_col="f_score", descending=True,
    ).select("user_id", "f_score")
    nm = global_ntile(
        keyed, [F.col("monetary").desc(), F.col("user_id")], "__m", 5,
        out_col="m_score", descending=True,
    ).select("user_id", "m_score")
    return (
        nr.join(nf, "user_id")
        .join(nm, "user_id")
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q208_lifespan_survival",
    oracle="""
    WITH lifespans AS (
        SELECT user_id,
               date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
                   AS lifespan_days
        FROM events GROUP BY user_id
    ),
    counts AS (
        SELECT lifespan_days, count(*) AS n FROM lifespans GROUP BY lifespan_days
    ),
    tot AS (SELECT sum(n) AS total FROM counts)
    SELECT lifespan_days,
           CAST(sum(n) OVER (ORDER BY lifespan_days DESC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_surviving,
           round(CAST(sum(n) OVER (ORDER BY lifespan_days DESC
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / total, 6) AS survival_frac
    FROM counts CROSS JOIN tot
    """,
)
def q208_lifespan_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve over user lifespans: for each observed lifespan d
    (days between a user's first and last event), how many users — and
    what fraction — survived AT LEAST d days.  The Kaplan-Meier-style
    retention view (no censoring — the fixture window is closed).

    The fact reduces to one lifespan per user (one user-keyed exchange),
    then collapses to distinct-lifespan counts, so the reverse
    cumulative window runs over a VALUE-BOUNDED frame (≤ observation
    window in days — q137/q177's pre-aggregation discipline); counts are
    exact int64, the fraction is one rounded double per row."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    lifespans = e.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias("lifespan_days")
    )
    counts = lifespans.groupBy("lifespan_days").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    w = (
        Window.orderBy(F.col("lifespan_days").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "lifespan_days",
        F.sum("n").over(w).alias("n_surviving"),
        F.round(
            F.sum("n").over(w).cast("double") / F.col("total"), 6
        ).alias("survival_frac"),
    )


@query(
    "q209_market_basket_lift",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_type AS t
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n_orders AS (SELECT count(DISTINCT okey) AS n FROM items),
    singles AS (SELECT t, count(*) AS n_t FROM items GROUP BY t),
    pairs AS (
        SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_ab
        FROM items a JOIN items b ON a.okey = b.okey AND a.t < b.t
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_ab,
           round(CAST(n_ab AS DOUBLE) * n / (sa.n_t * CAST(sb.n_t AS DOUBLE)), 6)
               AS lift
    FROM pairs
    JOIN singles sa ON type_a = sa.t
    JOIN singles sb ON type_b = sb.t
    CROSS JOIN n_orders
    WHERE n_ab >= 5
    """,
)
def q209_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: lift of part-type pairs co-occurring in
    the same order (lift > 1 ⇒ bought together more than chance) — the
    retail cross-sell signal, the classic Apriori first step.

    The basket fact reduces to DISTINCT (order, type) via a broadcast
    part-dimension join BEFORE any pair work, so the self-join blows up
    only within an order's handful of types (never items²), and the pair
    aggregate is bounded by the type-dimension square.  Marginals are
    type-dimension frames broadcast back; lift is one rounded double per
    surviving pair from exact counts."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    items = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_type").alias("t"))
        .distinct()
    )
    n_orders = items.agg(F.countDistinct("okey").alias("n"))
    singles = items.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    a = items.select("okey", F.col("t").alias("type_a"))
    b = items.select("okey", F.col("t").alias("type_b"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n")
        / (F.col("__na") * F.col("__nb").cast("double"))
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("t").alias("type_a"), F.col("n_t").alias("__na"))),
            "type_a",
        )
        .join(
            F.broadcast(singles.select(F.col("t").alias("type_b"), F.col("n_t").alias("__nb"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select("type_a", "type_b", "n_ab", F.round(lift, 6).alias("lift"))
    )
