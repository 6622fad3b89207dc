"""Wave 68: finance/ops time-series + recommender-eval + lifecycle —
maximum drawdown, business-day SLA latency, leave-last-out hit-rate,
storage tiering planner, time-weighted average value.

Reference parity note: the reference (/root/reference/etl.py) has no
finance/rec-eval surface; these extend the time-series family
(q250 ship-latency, q264 payback, q268 peak detection), the
recommender family (q229/q272), and the freshness/lifecycle family
(q228/q345).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q376_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(sum(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0)
                        AS BIGINT)) AS BIGINT) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    curve AS (
        SELECT d, sum(rev) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS equity
        FROM daily
    ),
    peaked AS (
        SELECT d, equity,
               max(equity) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS peak
        FROM curve
    ),
    dd AS (SELECT d, equity, peak, peak - equity AS drawdown FROM peaked)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(drawdown) AS BIGINT) AS max_drawdown_cents,
           min(CASE WHEN drawdown = (SELECT max(drawdown) FROM dd)
                    THEN d END) AS trough_date,
           CAST(max(peak) AS BIGINT) AS final_peak_cents
    FROM dd
    """,
)
def q376_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily revenue curve — the
    risk metric for any cumulative KPI (how far below its running peak
    did the curve fall, and when): drawdown(t) = peak(t) − equity(t)
    over the running-sum equity curve, all in exact integer cents.
    The trough date is the FIRST day attaining the maximum drawdown.

    Scale shape: the fact collapses to day grain first (bounded series);
    the running sum, running max and argmin act on the small daily
    frame — at a larger grain the two-phase global_running_sum
    machinery applies unchanged."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long")
            )
            .cast("long")
            .alias("rev")
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    curve = daily.select(
        "d",
        F.sum("rev").over(w).alias("equity"),
    ).select("d", "equity", F.max("equity").over(w).alias("peak"))
    dd = curve.select("d", "equity", "peak", (F.col("peak") - F.col("equity")).alias("drawdown"))
    mx = dd.agg(F.max("drawdown").alias("mdd"))
    return (
        dd.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("drawdown").cast("long").alias("max_drawdown_cents"),
            F.min(F.when(F.col("drawdown") == F.col("mdd"), F.col("d"))).alias(
                "trough_date"
            ),
            F.max("peak").cast("long").alias("final_peak_cents"),
        )
    )


SLA_BUSINESS_DAYS = 20


@query(
    "q377_business_day_sla",
    oracle=f"""
    WITH lat AS (
        SELECT o.o_orderpriority AS priority,
               -- exact business days: 5 per full week + a 7x7 lookup of
               -- weekdays among the partial-week days following the
               -- order's ISO weekday (table row = isodow, col = rem)
               -- the synthetic fixture ships ~5% of lines BEFORE the
               -- order date; clamp those to 0 latency (both engines)
               (greatest(datediff('day', o.o_orderdate, l.l_shipdate), 0) // 7) * 5
               + CAST(substring('0123444012333401222340111234000123400123450123455',
                     CAST((isodow(o.o_orderdate) - 1) * 7
                          + greatest(datediff('day', o.o_orderdate,
                                     l.l_shipdate), 0) % 7
                          + 1 AS INT), 1) AS BIGINT) AS bd
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(bd) AS BIGINT) AS total_business_days,
           CAST(sum(CASE WHEN bd > {SLA_BUSINESS_DAYS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sla_breach
    FROM lat
    GROUP BY priority
    """,
)
def q377_business_day_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency in BUSINESS days (weekends excluded) with an
    SLA breach count per priority — the fulfilment-ops twin of q250's
    calendar-day latency (a 2-calendar-day weekend order is 0 business
    days late; SLA contracts are written in business days).  The
    business-day count is closed-form integer arithmetic on
    (day-diff // 7 weeks, partial-week weekday walk) — no calendar
    table, no per-day explode, identical on both engines.

    Scale shape: per-row codegen date arithmetic on the fact join, one
    bounded priority-grain aggregate."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    o = read_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.greatest(F.datediff("l_shipdate", "o_orderdate"), F.lit(0)).alias("dd"),
        # ISO weekday Mon=1..Sun=7 (Spark dayofweek is Sun=1..Sat=7)
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("dow"),
    )
    idx = ((F.col("dow") - 1) * 7 + F.col("dd") % 7 + 1).cast("int")
    partial = F.substring(F.lit("0123444012333401222340111234000123400123450123455"), idx, 1).cast("long")
    bd = (F.floor(F.col("dd") / 7) * 5 + partial).alias("bd")
    lat = j.select("priority", bd)
    return lat.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("bd").cast("long").alias("total_business_days"),
        F.sum(F.when(F.col("bd") > SLA_BUSINESS_DAYS, 1).otherwise(0))
        .cast("long")
        .alias("n_sla_breach"),
    )


HITRATE_K = 10


@query(
    "q378_leave_last_out_hitrate",
    oracle=f"""
    WITH purchases AS (
        SELECT o.o_custkey AS u, l.l_partkey AS item, o.o_orderdate AS d,
               o.o_orderkey AS ok, l.l_linenumber AS ln
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    lastp AS (
        SELECT u, item FROM (
            SELECT u, item,
                   row_number() OVER (
                       PARTITION BY u
                       ORDER BY d DESC, ok DESC, ln DESC, item DESC) AS r
            FROM purchases) WHERE r = 1
    ),
    train AS (
        SELECT p.u, p.item FROM purchases p
        JOIN (SELECT u, max(d) AS maxd FROM purchases GROUP BY u) m
          ON m.u = p.u
        WHERE p.d < m.maxd
    ),
    pop AS (
        SELECT item FROM (
            SELECT item, count(*) AS c,
                   row_number() OVER (ORDER BY count(*) DESC, item) AS r
            FROM train GROUP BY item) WHERE r <= {HITRATE_K}
    ),
    eligible AS (
        SELECT l.u, l.item FROM lastp l
        WHERE EXISTS (SELECT 1 FROM train t WHERE t.u = l.u)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users_eval,
           CAST(sum(CASE WHEN item IN (SELECT item FROM pop)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           round(CAST(sum(CASE WHEN item IN (SELECT item FROM pop)
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
               AS hitrate_at_k
    FROM eligible
    """,
)
def q378_leave_last_out_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-last-out hit-rate@{HITRATE_K} for the popularity
    recommender — THE standard offline recommender-eval protocol: per
    user, hold out the LAST purchased item (strict event order,
    deterministic tie-break); train = everything strictly before the
    user's last day; recommend the top-{HITRATE_K} most-purchased train
    items; score the fraction of held-out items hit.  q272 measures
    catalog coverage; this measures accuracy under temporal splitting
    (no leakage — the popularity list never sees held-out days).

    Scale shape: one user-keyed window isolates the held-out item; the
    popularity list is a bounded top-k (broadcast back for the hit
    test); no per-user candidate join."""
    li = read_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_linenumber"]
    )
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    purchases = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("u"),
        F.col("l_partkey").alias("item"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    ).transform(spersist)
    # (ok, ln) is NOT unique in the synthetic lineitem (duplicate line
    # numbers) — item closes the tie so the held-out pick is total-ordered
    w = Window.partitionBy("u").orderBy(
        F.col("d").desc(), F.col("ok").desc(), F.col("ln").desc(), F.col("item").desc()
    )
    lastp = (
        purchases.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("u", "item")
    )
    maxd = purchases.groupBy("u").agg(F.max("d").alias("maxd"))
    train = purchases.join(maxd, "u").where(F.col("d") < F.col("maxd")).select("u", "item")
    from udacity_datalake_spark_spark.operators.topk import ranked_topk

    pop = ranked_topk(
        train.groupBy("item").agg(F.count(F.lit(1)).alias("c")),
        [F.col("c").desc(), F.col("item")],
        HITRATE_K,
    ).select("item")
    eligible = lastp.join(train.select("u").distinct(), "u", "left_semi")
    hits = eligible.join(F.broadcast(pop), "item", "left_semi")
    n_eval = eligible.agg(F.count(F.lit(1)).cast("long").alias("n_users_eval"))
    n_hits = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return n_eval.crossJoin(F.broadcast(n_hits)).select(
        "n_users_eval",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / F.col("n_users_eval"), 6).alias(
            "hitrate_at_k"
        ),
    )


#: tier boundaries in days behind the table's high-water mark
TIER_HOT_DAYS = 7
TIER_WARM_DAYS = 30


@query(
    "q379_storage_tiering",
    oracle=f"""
    WITH hw AS (SELECT max(ts) AS hwm FROM events),
    tiered AS (
        SELECT CASE
                 WHEN ts > hwm - INTERVAL {TIER_HOT_DAYS} DAY THEN 'hot'
                 WHEN ts > hwm - INTERVAL {TIER_WARM_DAYS} DAY THEN 'warm'
                 ELSE 'cold'
               END AS tier,
               octet_length(encode(COALESCE(event_type, '')))
               + 8 + 8 + 8 + 8 AS row_bytes
        FROM events CROSS JOIN hw
    )
    SELECT tier,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(row_bytes) AS BIGINT) AS est_bytes
    FROM tiered
    GROUP BY tier
    """,
)
def q379_storage_tiering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-tiering planner: rows bucketed into hot (≤{TIER_HOT_DAYS}d
    behind the high-water mark), warm (≤{TIER_WARM_DAYS}d) and cold
    tiers with an estimated byte footprint per tier — the lifecycle
    policy input (hot on NVMe, warm on standard, cold to object/archive
    storage) every table-maintenance planner computes before moving
    partitions.  Row bytes estimate = payload string bytes + fixed-width
    column widths, identical arithmetic on both engines.

    Scale shape: the high-water mark broadcasts; tier assignment is
    per-row codegen; the aggregate is 3 rows.  On a date-partitioned
    table the same predicate prunes to partition moves instead of row
    scans."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts"])
    hw = e.agg(F.max("ts").alias("hwm"))
    tier = (
        F.when(
            F.col("ts") > F.col("hwm") - F.expr(f"INTERVAL {TIER_HOT_DAYS} DAY"),
            "hot",
        )
        .when(
            F.col("ts") > F.col("hwm") - F.expr(f"INTERVAL {TIER_WARM_DAYS} DAY"),
            "warm",
        )
        .otherwise("cold")
    )
    row_bytes = (
        F.octet_length(F.coalesce(F.col("event_type"), F.lit(""))) + 8 + 8 + 8 + 8
    )
    return (
        e.crossJoin(F.broadcast(hw))
        .select(tier.alias("tier"), row_bytes.alias("row_bytes"))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("row_bytes").cast("long").alias("est_bytes"),
        )
    )


@query(
    "q380_time_weighted_average",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT) AS v,
               epoch_us(ts) AS t,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS t_next
        FROM events WHERE event_type = 'purchase'
    ),
    held AS (
        SELECT user_id, v, t_next - t AS dur_us
        FROM seq WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dur_us) AS BIGINT) AS total_us,
           round(CAST(sum(v * dur_us) AS DOUBLE) / sum(dur_us), 4) AS twap_cents
    FROM held
    GROUP BY user_id
    HAVING count(*) >= 2
    """,
)
def q380_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average purchase value per user (TWAP): each value
    is weighted by how long it was the user's LATEST observation (the
    lead-timestamp holding duration) — the correct average for
    irregularly-sampled series, where the naive mean over-weights bursts
    (finance TWAP, sensor time-weighted means, billing proration all
    share this shape).  Weights are exact integer microseconds; one
    rounded division at the end.

    Scale shape: one user-keyed lead window (O(1) state per row), one
    user-grain aggregate with exact int64 products."""
    e = read_table(
        spark, sf_dir, "events", columns=["event_id", "event_type", "user_id", "ts", "value"]
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long").alias("v"),
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    )
    held = seq.where(F.col("t_next").isNotNull()).select(
        "user_id", "v", (F.col("t_next") - F.col("t")).alias("dur_us")
    )
    return (
        held.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("dur_us").cast("long").alias("total_us"),
            F.round(
                F.sum(F.col("v") * F.col("dur_us")).cast("double") / F.sum("dur_us"),
                4,
            ).alias("twap_cents"),
        )
        .where(F.col("n_intervals") >= 2)
    )
