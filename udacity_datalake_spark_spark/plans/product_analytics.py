"""Product-analytics composites: sessionized funnels, concentration
(Gini), and decile analysis — each composing operators the surface
already proves (sessionization q65, funnel q126, window ranks q122,
decayed LTV q150) into the reports a product team actually ships.

Scale posture: every query reduces on its natural key FIRST (session,
group, user) and runs ranking windows over the reduced frame; the only
global windows operate on aggregates, never raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.topk import global_ntile
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q151_session_funnel",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, session_seq,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
           CAST(sum(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
           CAST(sum(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                         AND first_purchase > first_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM per_session
    """,
)
def q151_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session conversion funnel: sessionize (30-minute gap, q65's
    integer-microsecond rewrite), then test view → click → purchase
    ordering INSIDE each session — per-session conversion, the metric a
    growth team tracks, where q126's funnel is per-user lifetime.

    The whole query holds ONE user_id hash partitioning: both windows
    and the per-session aggregate cluster on it (session_seq refines the
    key), then a single global roll-up of four counters.  NULL
    comparisons do the stage gating (``first_click > first_view`` is
    NULL-false when either is missing) identically on both engines.
    """
    from udacity_datalake_spark_spark.operators.sessions import with_session_seq

    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    sess = with_session_seq(e).select("user_id", "ts", "event_type", "session_seq")
    per_session = sess.groupBy("user_id", "session_seq").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    full = clicked & (F.col("first_purchase") > F.col("first_click"))
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(viewed, 1).otherwise(0)).alias("n_viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).alias("n_clicked_after_view"),
        F.sum(F.when(full, 1).otherwise(0)).alias("n_full_funnel"),
    )


@query(
    "q152_gini_concentration",
    oracle="""
    WITH ranked AS (
        SELECT o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) AS v,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice, o_orderkey) AS i,
               count(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM orders
    )
    SELECT o_orderstatus, n,
           round((2.0 * CAST(sum(i * v) AS DOUBLE)) / (n * CAST(sum(v) AS DOUBLE))
                 - (n + 1.0) / n, 6) AS gini
    FROM ranked GROUP BY o_orderstatus, n
    """,
)
def q152_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per status — revenue-concentration
    (inequality) analysis: G = 2·Σ(i·vᵢ)/(n·Σvᵢ) − (n+1)/n over values
    sorted ascending.

    Ranks come from one per-group window (ties broken by order key, so
    both engines rank identically — Σ i·vᵢ is then well-defined), the
    two sums accumulate in DECIMAL, and the closed form evaluates once
    per group in double.  One hash exchange on the group key.
    """
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderstatus",
        dec("o_totalprice", 18, 2).alias("v"),
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    n = F.col("n")
    return ranked.groupBy("o_orderstatus", "n").agg(
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("v")).cast("double"))
            / (n * F.sum("v").cast("double"))
            - (n + 1.0) / n,
            6,
        ).alias("gini")
    )


@query(
    "q153_ltv_deciles",
    oracle="""
    WITH mx AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
    terms AS (
        SELECT user_id,
               CAST(round(value * pow(0.95, date_diff('day', CAST(ts AS DATE), ref_day)), 9)
                    AS DECIMAL(18,9)) AS term
        FROM events CROSS JOIN mx
        WHERE event_type = 'purchase'
    ),
    ltv AS (
        SELECT user_id, sum(term) AS ltv_dec FROM terms GROUP BY user_id
    ),
    tiled AS (
        SELECT user_id, ltv_dec,
               ntile(10) OVER (ORDER BY ltv_dec DESC, user_id) AS decile
        FROM ltv
    )
    SELECT decile,
           count(*) AS n_users,
           CAST(round(CAST(sum(ltv_dec) AS DOUBLE), 6) AS DOUBLE) AS decile_ltv
    FROM tiled GROUP BY decile
    """,
)
def q153_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile analysis over decayed LTV (q150's score): rank users into
    10 tiles by score and report each tile's user count and total value
    — the "top 10% of users hold X% of value" report.

    The ntile runs over the per-user AGGREGATE (one row per user, never
    raw events) with a deterministic (score, user_id) order on the exact
    decimal score, via operators.topk.global_ntile — quantile-bucketed
    two-phase ranking, so no single-partition window even when the user
    dimension itself is large; the decile totals stay decimal until the
    final per-tile cast.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "value"])
    mx = e.agg(F.max(F.to_date("ts")).alias("ref_day"))
    term = F.round(
        F.col("value") * F.pow(F.lit(0.95), F.datediff(F.col("ref_day"), F.to_date("ts"))),
        9,
    ).cast("decimal(18,9)")
    ltv = (
        e.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mx))
        .select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg(F.sum("term").alias("ltv_dec"))
    )
    keyed = ltv.withColumn("__ltv_d", F.col("ltv_dec").cast("double"))
    tiled = global_ntile(
        keyed,
        [F.col("ltv_dec").desc(), F.col("user_id")],
        "__ltv_d",
        10,
        out_col="decile",
        descending=True,
    ).drop("__ltv_d")
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum("ltv_dec").cast("double"), 6).alias("decile_ltv"),
    )


@query(
    "q156_pareto_share",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               sum(n_chars) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n_chars) OVER (PARTITION BY source) AS total
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN 5 * (cum - n_chars) < 4 * total THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_for_80pct
    FROM ranked GROUP BY source
    """,
)
def q156_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 concentration report: per source, how many of the largest
    documents it takes to cover 80% of the source's characters — the
    "which sources are head-heavy" signal a mixing stage reads before
    re-weighting.

    One (source) exchange serves both windows and the final aggregate; a
    doc counts while the cumulative total BEFORE it is still under the
    threshold (strictly-less on ``5·prev_cum < 4·total`` — pure int64,
    no float boundary), so ties and exact-80% edges resolve identically
    on both engines.
    """
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    ranked = d.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(w_cum).alias("cum"),
        F.sum("n_chars").over(w_all).alias("total"),
    )
    counted = F.when(5 * (F.col("cum") - F.col("n_chars")) < 4 * F.col("total"), 1).otherwise(0)
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(counted).alias("docs_for_80pct"),
    )


@query(
    "q160_last_touch_attribution",
    oracle="""
    WITH touches AS (
        SELECT user_id, ts AS touch_ts, event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ),
    purchases AS (
        SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    attributed AS (
        SELECT p.event_id, p.v, t.channel,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY t.touch_ts DESC, t.channel DESC) AS rn
        FROM purchases p
        JOIN touches t ON p.user_id = t.user_id AND t.touch_ts <= p.ts
    )
    SELECT channel,
           count(*) AS n_purchases,
           CAST(sum(v) AS DOUBLE) AS attributed_revenue
    FROM attributed WHERE rn = 1 GROUP BY channel
    """,
)
def q160_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase's value goes to the
    user's most recent preceding view/click — the marketing report built
    on the same as-of machinery as q154, but attributing VALUE instead
    of state.

    Engine path: one as-of join (union + user_id window, single
    exchange) carries the last-seen channel onto each purchase; ties at
    the same instant resolve to the max channel name on both sides.
    The oracle's join + row_number form is the quadratic shape the
    as-of rewrite avoids.
    """
    from udacity_datalake_spark_spark.operators.joins import asof_join

    e = read_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    touches = (
        e.where(F.col("event_type").isin("view", "click"))
        .select("user_id", F.col("ts").alias("touch_ts"), F.col("event_type").alias("channel"))
        # same-instant touches collapse deterministically (max channel),
        # mirroring the oracle's (touch_ts DESC, channel DESC) tie-break
        .groupBy("user_id", "touch_ts")
        .agg(F.max("channel").alias("channel"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", dec("value", 18, 2).alias("v")
    )
    attributed = asof_join(purchases, touches, on=["user_id"], left_ts="ts", right_ts="touch_ts")
    return (
        attributed.where(F.col("channel").isNotNull())
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("v").cast("double").alias("attributed_revenue"),
        )
    )


@query(
    "q161_time_to_convert",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(floor((epoch_us(first_purchase) - epoch_us(first_view))
                      / 86400000000.0) AS BIGINT) AS days_to_convert,
           count(*) AS n_users
    FROM per_user
    WHERE first_view IS NOT NULL AND first_purchase > first_view
    GROUP BY days_to_convert
    """,
)
def q161_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: whole days between a user's first
    view and first purchase, bucketed — the activation-latency histogram
    next to q126's funnel counts.

    One conditional aggregate per user (single exchange), integer
    microsecond arithmetic for the latency (identical floor semantics on
    both engines), and a tiny bucket-count roll-up.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_type"])
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    days = F.floor(
        (F.unix_micros(F.col("first_purchase")) - F.unix_micros(F.col("first_view")))
        / 86_400_000_000.0
    ).cast("bigint")
    return (
        per_user.where(
            F.col("first_view").isNotNull() & (F.col("first_purchase") > F.col("first_view"))
        )
        .groupBy(days.alias("days_to_convert"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q162_linear_attribution",
    oracle="""
    WITH touches AS (
        SELECT user_id, ts AS touch_ts, event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    joined AS (
        SELECT p.event_id, p.value, t.channel,
               count(*) OVER (PARTITION BY p.event_id) AS n_touches
        FROM purchases p
        JOIN touches t ON p.user_id = t.user_id AND t.touch_ts <= p.ts
    )
    SELECT channel,
           count(*) AS n_shares,
           round(CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          * 10000 // n_touches) AS DOUBLE) / 1000000.0, 6)
               AS attributed_revenue
    FROM joined GROUP BY channel
    """,
)
def q162_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (multi-touch) attribution: each purchase's value splits
    EQUALLY across every preceding touch — q160's last-touch twin, the
    other standard marketing model.

    The purchase↔touch join stays user-keyed (per-user touch × purchase
    products, bounded by per-user activity, never a global blow-up); the
    per-purchase touch count comes from one window over the joined frame
    on the same key; each share is allocated in integer MICRO-UNITS
    (cents·10⁴ div n_touches) so the channel sum is int64-exact and
    order-independent.  (The earlier DECIMAL(18,6) form rounded a DOUBLE
    share first, and round-half semantics on binary doubles differ
    between engines — ~30 boundary hits at sf0.1 drifted the totals by
    3e-5; integer division has no boundary to disagree on.)
    """
    e = read_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    touches = e.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("touch_ts"), F.col("event_type").alias("channel")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = (
        purchases.join(touches, "user_id")
        .where(F.col("touch_ts") <= F.col("ts"))
        .select(
            "event_id",
            "value",
            "channel",
            F.count(F.lit(1)).over(Window.partitionBy("event_id")).alias("n_touches"),
        )
    )
    share_micro = F.expr(
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000 div n_touches"
    )
    return joined.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_shares"),
        F.round(F.sum(share_micro).cast("double") / 1_000_000.0, 6).alias(
            "attributed_revenue"
        ),
    )


@query(
    "q163_repurchase_intervals",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               CAST(floor((epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 86400000000.0)
                    AS BIGINT) AS gap_days
        FROM events
        WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT count(*) AS n_intervals,
           round(quantile_cont(gap_days, 0.5), 6) AS median_gap_days,
           round(quantile_cont(gap_days, 0.9), 6) AS p90_gap_days,
           min(gap_days) AS min_gap_days,
           max(gap_days) AS max_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    """,
)
def q163_repurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: whole-day gaps between a user's
    consecutive purchases, summarized as median/p90/min/max — the
    replenishment-cycle metric behind churn prediction windows.

    One lag() over each user's purchase timeline (single exchange, the
    event-type filter pushed into the scan), integer-microsecond gap
    math, then a global exact-percentile roll-up over the small interval
    frame (one row per repeat purchase, not per event).
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.floor(
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) / 86_400_000_000.0
    ).cast("bigint")
    gaps = (
        e.where(F.col("event_type") == "purchase")
        .select(gap.alias("gap_days"))
        .where(F.col("gap_days").isNotNull())
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.percentile("gap_days", F.lit(0.5)), 6).alias("median_gap_days"),
        F.round(F.percentile("gap_days", F.lit(0.9)), 6).alias("p90_gap_days"),
        F.min("gap_days").alias("min_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


@query(
    "q166_ab_test_lift",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN CAST(md5(CAST(user_id AS VARCHAR)) AS VARCHAR) < '8'
                    THEN 'A' ELSE 'B' END AS variant,
               max(CASE WHEN event_type = 'purchase' AND value > 280 THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT variant, count(*) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted,
               CAST(sum(converted) AS DOUBLE) / count(*) AS rate
        FROM assigned GROUP BY variant
    )
    SELECT a.n_users AS n_a, a.n_converted AS conv_a, round(a.rate, 6) AS rate_a,
           b.n_users AS n_b, b.n_converted AS conv_b, round(b.rate, 6) AS rate_b,
           round(b.rate - a.rate, 6) AS abs_lift,
           round((b.rate - a.rate)
                 / nullif(sqrt((CAST(a.n_converted + b.n_converted AS DOUBLE) / (a.n_users + b.n_users))
                        * (1 - CAST(a.n_converted + b.n_converted AS DOUBLE) / (a.n_users + b.n_users))
                        * (1.0 / a.n_users + 1.0 / b.n_users)), 0.0), 6) AS z_stat
    FROM (SELECT * FROM arms WHERE variant = 'A') a
    CROSS JOIN (SELECT * FROM arms WHERE variant = 'B') b
    """,
)
def q166_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B readout: users split deterministically by the
    first md5 nibble of their id (reproducible arms, no RNG — the same
    hash-assignment discipline as q64's splits), purchase conversion per
    arm, absolute lift, and the pooled two-proportion z-statistic.

    One per-user aggregate (conversion is max-of-flag, map-side
    combined), a two-row arm frame, and the closed-form z evaluated once
    over exact integer counts — the experimentation readout is a
    constant-size result at any traffic volume.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "value"])
    assigned = e.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 280), 1).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(F.md5(F.col("user_id").cast("string")) < "8", "A").otherwise("B").alias("variant"),
        "converted",
    )
    arms = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias("rate"),
    )
    a = arms.where(F.col("variant") == "A").select(
        F.col("n_users").alias("n_a"), F.col("n_converted").alias("conv_a"), F.col("rate").alias("rate_a")
    )
    b = arms.where(F.col("variant") == "B").select(
        F.col("n_users").alias("n_b"), F.col("n_converted").alias("conv_b"), F.col("rate").alias("rate_b")
    )
    j = a.crossJoin(b)
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    z = (F.col("rate_b") - F.col("rate_a")) / F.nullif(
        F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))), F.lit(0.0)
    )
    return j.select(
        "n_a", "conv_a", F.round("rate_a", 6).alias("rate_a"),
        "n_b", "conv_b", F.round("rate_b", 6).alias("rate_b"),
        F.round(F.col("rate_b") - F.col("rate_a"), 6).alias("abs_lift"),
        F.round(z, 6).alias("z_stat"),
    )
