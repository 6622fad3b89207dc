"""Behavioral / reconciliation analytics: funnel, retention cohorts,
running-distinct windows, and snapshot diffing.

None of these exist in the reference (its workload is the two ETL
pipelines, reference etl.py:23-173); they are the event-analytics and
data-reconciliation operations a production lake runs daily, each written
for the 100 TB shape:

- the funnel's three stages all aggregate and join on ``user_id``, so the
  whole query reuses ONE hash partitioning; each stage's frame shrinks
  (users → users-who-clicked → users-who-purchased), and AQE demotes the
  later joins to broadcast as the per-user frames fall under threshold;
- retention reduces the event fact to distinct ``(user, day)`` BEFORE the
  cohort join — the join input is bounded by users × active-days, not by
  raw event volume;
- the running-distinct query is the standard rewrite of COUNT(DISTINCT)
  OVER — which neither Spark nor DuckDB supports — into first-occurrence
  flags plus a running sum;
- snapshot diff is a co-partitioned full-outer join that classifies rows
  key-aligned: the scalable form of "what changed between two loads"
  (reconciliation / anti-entropy).  At 100 TB both sides bucket or
  partition on the key, so the join plans with no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.topk import ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q126_event_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS first_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS first_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.first_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS users_viewed,
           (SELECT count(*) FROM c) AS users_clicked_after_view,
           (SELECT count(*) FROM p) AS users_purchased_after_click
    """,
)
def q126_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): users who
    clicked strictly after their first view, then purchased strictly
    after that first qualifying click.

    Every stage aggregates and joins on ``user_id`` — one hash
    partitioning carried through the whole plan.  The event scan is
    filtered per stage (``event_type`` predicate pushed into the parquet
    scan), and each stage's user frame is a strict subset of the
    previous, so the later joins broadcast under AQE.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts"])
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("users_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("users_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("users_purchased_after_click")))
    )


@query(
    "q127_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_day FROM events
    )
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day, a.activity_day) AS day_offset,
           count(*) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, day_offset
    """,
)
def q127_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each later day they were active.

    The raw event stream is reduced twice on the same ``user_id``
    partitioning — first-activity per user, and distinct (user, day) —
    before any join, so the join input is users × active-days, orders of
    magnitude smaller than the fact.  (user, day) is unique per row after
    the distinct, and day↔offset is a bijection given the cohort, so the
    final count needs no DISTINCT.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    firsts = e.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("cohort_day"))
    activity = e.select("user_id", F.to_date("ts").alias("activity_day")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("activity_day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q129_running_distinct",
    oracle="""
    SELECT event_id, user_id, n_types_seen FROM (
        SELECT event_id, user_id,
               CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
        FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                                ORDER BY ts, event_id) = 1
                        THEN 1 ELSE 0 END AS first_seen
            FROM events
        )
    )
    """,
)
def q129_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user — a window neither
    engine supports directly — via the standard rewrite: flag each
    (user, type)'s first occurrence with ``row_number() = 1``, then take
    a running sum of the flags over the user's timeline.

    Two window passes, both keyed under ``user_id`` (the first adds
    ``event_type`` to the partition key); state per window is one counter,
    so memory is flat regardless of history length — unlike a naive
    "collect the set so far" formulation whose state grows with
    cardinality.
    """
    e = read_table(spark, sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_seen = F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    return e.select(
        "event_id", "user_id", "ts", first_seen.alias("first_seen")
    ).select("event_id", "user_id", F.sum("first_seen").over(w_run).alias("n_types_seen"))


@query(
    "q131_snapshot_diff",
    oracle="""
    WITH old_snap AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 3
    ),
    new_snap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 4
    )
    SELECT change_type, count(*) AS n FROM (
        SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_totalprice <> n.o_totalprice THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM old_snap o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
    ) GROUP BY change_type
    """,
)
def q131_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: classify every key as added / removed /
    changed / unchanged between two table versions (both derived
    deterministically from ``orders`` so the oracle sees identical
    inputs).

    The scalable shape is a single full-outer equi-join on the primary
    key — when both snapshots are bucketed or partitioned on that key the
    join plans with zero extra exchange — followed by a row-level
    compare.  Here the compare is on the one mutable column; a production
    diff hashes the non-key columns (xxhash64 over canonical binary) to
    one comparison per row regardless of width.
    """
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    old_snap = o.where(F.col("o_orderkey") % 10 != 3)
    new_snap = o.where(F.col("o_orderkey") % 10 != 4).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    joined = old_snap.alias("o").join(
        new_snap.alias("n"),
        F.col("o.o_orderkey") == F.col("n.o_orderkey"),
        "full_outer",
    )
    change_type = (
        F.when(F.col("o.o_orderkey").isNull(), "added")
        .when(F.col("n.o_orderkey").isNull(), "removed")
        .when(F.col("o.o_totalprice") != F.col("n.o_totalprice"), "changed")
        .otherwise("unchanged")
    )
    return joined.select(change_type.alias("change_type")).groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q157_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS relation,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    """,
)
def q157_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    for each FK relation (lineitem→orders, orders→customer,
    customer→nation) — the cross-table constraint check q72's value-level
    DQ report doesn't cover.

    Each relation is one LEFT ANTI join + count: the fact side streams,
    the key side reduces to join keys only (column pruning to one
    column), and the small parents broadcast.  N relations audit in one
    job; nothing is collected beyond N counter rows.
    """
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey"])
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    n = read_table(spark, sf_dir, "nation", columns=["n_nationkey"])

    def orphans(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str):
        return (
            child.join(
                parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("relation"), "n_orphans")
        )

    return (
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(orphans(o.select("o_custkey"), "o_custkey", c, "c_custkey", "orders->customer"))
        .unionByName(orphans(c.select("c_nationkey"), "c_nationkey", n, "n_nationkey", "customer->nation"))
    )


@query(
    "q158_uniqueness_audit",
    oracle="""
    SELECT 'orders.o_orderkey' AS key_name,
           count(*) AS n_violating_keys,
           COALESCE(CAST(sum(cnt - 1) AS BIGINT), 0) AS n_excess_rows
    FROM (SELECT o_orderkey, count(*) AS cnt FROM orders
          GROUP BY o_orderkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber)',
           count(*),
           COALESCE(CAST(sum(cnt - 1) AS BIGINT), 0)
    FROM (SELECT l_orderkey, l_linenumber, count(*) AS cnt FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
    UNION ALL
    SELECT 'events.event_id',
           count(*),
           COALESCE(CAST(sum(cnt - 1) AS BIGINT), 0)
    FROM (SELECT event_id, count(*) AS cnt FROM events
          GROUP BY event_id HAVING count(*) > 1)
    """,
)
def q158_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: for each declared key, how many key
    values are duplicated and how many excess rows they carry — the
    load-time sanity check before any MERGE/SCD stage trusts the key.

    One map-side-combined aggregate per key (the HAVING filter runs
    reduce-side, so only violating keys survive the exchange), then a
    counter roll-up; auditing K keys is K aggregates over pruned
    single/double-column scans, no full-width reads.
    """

    def audit(df: DataFrame, keys: list[str], name: str):
        viol = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt")).where(F.col("cnt") > 1)
        return viol.agg(
            F.count(F.lit(1)).alias("n_violating_keys"),
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).cast("bigint").alias("n_excess_rows"),
        ).select(F.lit(name).alias("key_name"), "n_violating_keys", "n_excess_rows")

    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey"])
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    e = read_table(spark, sf_dir, "events", columns=["event_id"])
    return (
        audit(o, ["o_orderkey"], "orders.o_orderkey")
        .unionByName(audit(li, ["l_orderkey", "l_linenumber"], "lineitem.(l_orderkey,l_linenumber)"))
        .unionByName(audit(e, ["event_id"], "events.event_id"))
    )


@query(
    "q159_skew_profile",
    oracle="""
    WITH per_key AS (
        SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
    ),
    stats AS (
        SELECT count(*) AS n_keys, CAST(sum(cnt) AS DOUBLE) / count(*) AS mean_cnt,
               max(cnt) AS max_cnt
        FROM per_key
    )
    SELECT l_orderkey, cnt,
           round(cnt / mean_cnt, 6) AS skew_ratio,
           n_keys, max_cnt
    FROM (
        SELECT l_orderkey, cnt,
               row_number() OVER (ORDER BY cnt DESC, l_orderkey) AS rn
        FROM per_key
    ) CROSS JOIN stats
    WHERE rn <= 10
    """,
)
def q159_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: the 10 heaviest l_orderkey values with
    their multiplicity and ratio to the mean key weight — the
    observability report that decides whether a join needs q38's full
    salting, q109's hot-key-only salting, or nothing.

    One map-side-combined count per key, a single-row stats frame
    (broadcast), and a top-k window over the already-reduced key frame
    with a deterministic (count, key) order.  This is exactly the
    sampled detection step inside hot_key_salted_join, exposed as a
    standalone audit.
    """
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey"])
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("mean_cnt"),
        F.max("cnt").alias("max_cnt"),
    )
    return (
        ranked_topk(per_key, [F.col("cnt").desc(), F.col("l_orderkey")], 10)
        .crossJoin(F.broadcast(stats))
        .select(
            "l_orderkey",
            "cnt",
            F.round(F.col("cnt") / F.col("mean_cnt"), 6).alias("skew_ratio"),
            "n_keys",
            "max_cnt",
        )
    )


@query(
    "q164_churn_snapshot",
    oracle="""
    WITH mx AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
    last_seen AS (
        SELECT user_id, max(CAST(ts AS DATE)) AS last_day FROM events GROUP BY user_id
    )
    SELECT CASE WHEN date_diff('day', last_day, ref_day) <= 7 THEN 'active_7d'
                WHEN date_diff('day', last_day, ref_day) <= 14 THEN 'cooling_8_14d'
                WHEN date_diff('day', last_day, ref_day) <= 28 THEN 'at_risk_15_28d'
                ELSE 'churned_29d_plus' END AS segment,
           count(*) AS n_users
    FROM last_seen CROSS JOIN mx
    GROUP BY segment
    """,
)
def q164_churn_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency segmentation (churn snapshot): users bucketed by days
    since last activity relative to the corpus's latest day — the
    active / cooling / at-risk / churned split a retention team tracks
    daily.

    One per-user max (map-side combined), a single-row reference-day
    broadcast, and integer day arithmetic into four CASE buckets — the
    entire fact collapses to one row per user before any further work.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    mx = e.agg(F.max(F.to_date("ts")).alias("ref_day"))
    last_seen = e.groupBy("user_id").agg(F.max(F.to_date("ts")).alias("last_day"))
    inactive = F.datediff(F.col("ref_day"), F.col("last_day"))
    segment = (
        F.when(inactive <= 7, "active_7d")
        .when(inactive <= 14, "cooling_8_14d")
        .when(inactive <= 28, "at_risk_15_28d")
        .otherwise("churned_29d_plus")
    )
    return (
        last_seen.crossJoin(F.broadcast(mx))
        .groupBy(segment.alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q165_growth_accounting",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT a.day,
           CAST(sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN a.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY a.day
    """,
)
def q165_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, how many active users are brand-new
    versus returning — the daily companion to q127's cohort triangle.

    Same scale shape as retention: the fact reduces to distinct
    (user, day) and a per-user first-day frame on ONE user_id
    partitioning before the join; the final aggregate is day-keyed over
    the already-reduced frame.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    activity = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)).alias("n_new"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)).alias("n_returning"),
        )
    )
