"""Wave 77: warehouse-ops pitfalls + layout/feature advisors —
day-boundary timezone sensitivity, encoding-codec advisor, feature-
cross cardinality audit, sessionization gap-parameter sweep.

Reference parity note: the reference (/root/reference/etl.py) has no
ops-audit surface; these extend the datetime family (q33/q139), the
column-profile family (q138/q159), and the sessionize family
(q65/q329).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

TZ_SHIFT_HOURS = 8


@query(
    "q405_day_boundary_sensitivity",
    oracle=f"""
    WITH base AS (
        SELECT CAST(ts AS DATE) AS d_utc,
               CAST(ts + INTERVAL {TZ_SHIFT_HOURS} HOUR AS DATE) AS d_shift,
               CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
                   AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    utc_days AS (
        SELECT d_utc AS d, CAST(sum(cents) AS BIGINT) AS rev
        FROM base GROUP BY 1
    ),
    shift_days AS (
        SELECT d_shift AS d, CAST(sum(cents) AS BIGINT) AS rev
        FROM base GROUP BY 1
    ),
    moved AS (
        SELECT CAST(sum(cents) AS BIGINT) AS moved_cents,
               CAST(count(*) AS BIGINT) AS moved_rows
        FROM base WHERE d_utc != d_shift
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM utc_days) AS n_days_utc,
           (SELECT CAST(count(*) AS BIGINT) FROM shift_days) AS n_days_shifted,
           (SELECT moved_rows FROM moved) AS rows_crossing_boundary,
           (SELECT moved_cents FROM moved) AS cents_crossing_boundary,
           CAST((SELECT sum(abs(COALESCE(u.rev, 0) - COALESCE(s.rev, 0)))
                 FROM utc_days u FULL OUTER JOIN shift_days s ON s.d = u.d)
                AS BIGINT) AS total_daily_reallocation_cents
    """,
)
def q405_day_boundary_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-boundary timezone sensitivity — the classic daily-metric
    pitfall: how much revenue MOVES between calendar days when the day
    boundary shifts by {TZ_SHIFT_HOURS} hours (a report consumed in
    UTC+{TZ_SHIFT_HOURS} vs the UTC warehouse day)?  Reports the rows
    and cents that cross a boundary plus the total |per-day delta| a
    dashboard reader would see — the audit that decides whether daily
    tables need a timezone dimension (q139's calendar enrich) or one
    canonical day is defensible.

    Scale shape: one fact scan computes both day keys per row; two
    day-grain aggregates and a bounded full-outer day reconciliation."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    base = e.where(F.col("event_type") == "purchase").select(
        F.col("ts").cast("date").alias("d_utc"),
        (F.col("ts") + F.expr(f"INTERVAL {TZ_SHIFT_HOURS} HOUR"))
        .cast("date")
        .alias("d_shift"),
        F.round(F.col("value").cast("decimal(18,2)") * 100, 0)
        .cast("long")
        .alias("cents"),
    ).transform(spersist)
    utc_days = base.groupBy(F.col("d_utc").alias("d")).agg(
        F.sum("cents").cast("long").alias("rev_u")
    )
    shift_days = base.groupBy(F.col("d_shift").alias("d")).agg(
        F.sum("cents").cast("long").alias("rev_s")
    )
    moved = base.where(F.col("d_utc") != F.col("d_shift")).agg(
        F.sum("cents").cast("long").alias("cents_crossing_boundary"),
        F.count(F.lit(1)).cast("long").alias("rows_crossing_boundary"),
    )
    recon = (
        utc_days.join(shift_days, "d", "full_outer")
        .agg(
            F.sum(
                F.abs(
                    F.coalesce("rev_u", F.lit(0)) - F.coalesce("rev_s", F.lit(0))
                )
            )
            .cast("long")
            .alias("total_daily_reallocation_cents")
        )
    )
    nu = utc_days.agg(F.count(F.lit(1)).cast("long").alias("n_days_utc"))
    ns = shift_days.agg(F.count(F.lit(1)).cast("long").alias("n_days_shifted"))
    return (
        nu.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(moved))
        .crossJoin(F.broadcast(recon))
        .select(
            "n_days_utc",
            "n_days_shifted",
            "rows_crossing_boundary",
            "cents_crossing_boundary",
            "total_daily_reallocation_cents",
        )
    )


#: dictionary encoding pays off below this distinct-ratio (per mille)
DICT_MAX_RATIO_PM = 100


@query(
    "q406_codec_advisor",
    oracle=f"""
    WITH stats AS (
        SELECT 'o_orderstatus' AS col,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd,
               CAST(sum(octet_length(encode(o_orderstatus))) AS BIGINT)
                   AS bytes
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(DISTINCT o_orderpriority),
               CAST(sum(octet_length(encode(o_orderpriority))) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*), count(DISTINCT o_custkey),
               8 * count(*)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(DISTINCT o_totalprice),
               8 * count(*)
        FROM orders
    )
    SELECT col, n, nd,
           CAST(nd * 1000 // n AS BIGINT) AS distinct_ratio_pm,
           bytes AS raw_bytes,
           CASE WHEN nd * 1000 <= n * {DICT_MAX_RATIO_PM} THEN 'dictionary'
                ELSE 'plain' END AS recommended_codec,
           CASE WHEN nd * 1000 <= n * {DICT_MAX_RATIO_PM}
                THEN CAST(n * CAST(ceil(ln(nd + 1) / ln(2) / 8) AS BIGINT)
                          + nd * (bytes // n) AS BIGINT)
                ELSE bytes END AS est_encoded_bytes
    FROM stats
    """,
)
def q406_codec_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column encoding-codec advisor — the layout decision every
    columnar writer makes: per candidate column, the distinct-value
    ratio decides dictionary vs plain encoding, with an estimated
    encoded size (n·⌈log₂ nd⌉ bits of codes + the dictionary itself)
    against the raw bytes.  Low-cardinality strings (status, priority)
    should dictionary-encode; keys and prices should not — the advisor
    makes the parquet/ORC writer's implicit choice auditable before a
    100 TB rewrite (pairs with writers.write_clustered_parquet, which
    optimizes ordering; this optimizes representation).

    Scale shape: one aggregate per candidate column over a shared scan
    pattern, unioned into a bounded report."""
    o = read_table(
        spark,
        sf_dir,
        "orders",
        columns=["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"],
    ).transform(spersist)
    frames = []
    for col, bytes_expr in [
        ("o_orderstatus", F.sum(F.octet_length("o_orderstatus"))),
        ("o_orderpriority", F.sum(F.octet_length("o_orderpriority"))),
        ("o_custkey", F.count(F.lit(1)) * 8),
        ("o_totalprice", F.count(F.lit(1)) * 8),
    ]:
        frames.append(
            o.agg(
                F.lit(col).alias("col"),
                F.count(F.lit(1)).cast("long").alias("n"),
                F.count_distinct(col).alias("nd"),
                bytes_expr.cast("long").alias("bytes"),
            )
        )
    stats = frames[0]
    for f in frames[1:]:
        stats = stats.unionAll(f)
    dict_ok = F.col("nd") * 1000 <= F.col("n") * DICT_MAX_RATIO_PM
    code_bytes = F.ceil(F.log(2.0, F.col("nd") + 1) / 8).cast("long")
    return stats.select(
        "col",
        "n",
        "nd",
        F.expr("CAST((nd * 1000) DIV n AS BIGINT)").alias("distinct_ratio_pm"),
        F.col("bytes").alias("raw_bytes"),
        F.when(dict_ok, "dictionary").otherwise("plain").alias("recommended_codec"),
        F.when(
            dict_ok,
            (
                F.col("n") * code_bytes
                + F.col("nd") * F.expr("bytes DIV n")
            ).cast("long"),
        )
        .otherwise(F.col("bytes"))
        .alias("est_encoded_bytes"),
    )


@query(
    "q407_feature_cross_cardinality",
    oracle="""
    WITH crosses AS (
        SELECT 'nation_x_segment' AS cross_name,
               CAST(count(DISTINCT c_nationkey) AS BIGINT) AS card_a,
               CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS card_b,
               CAST(count(DISTINCT (c_nationkey, c_mktsegment)) AS BIGINT)
                   AS card_cross,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM customer
        UNION ALL
        SELECT 'priority_x_status',
               count(DISTINCT o_orderpriority), count(DISTINCT o_orderstatus),
               count(DISTINCT (o_orderpriority, o_orderstatus)), count(*)
        FROM orders
        UNION ALL
        SELECT 'brand_x_size',
               count(DISTINCT p_brand), count(DISTINCT p_size),
               count(DISTINCT (p_brand, p_size)), count(*)
        FROM part
    )
    SELECT cross_name, card_a, card_b, card_cross,
           CAST(card_a * card_b AS BIGINT) AS card_product,
           round(CAST(card_cross AS DOUBLE) / (card_a * card_b), 6)
               AS fill_ratio,
           card_cross * 20 <= n_rows AS cross_is_learnable
    FROM crosses
    """,
)
def q407_feature_cross_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-cross cardinality audit — the pre-check before crossing
    two categoricals into one feature: the observed joint cardinality
    vs the full product (fill ratio: sparse crosses overfit) and
    whether each cross cell would average ≥20 training rows (integer
    cross-multiplied learnability floor).  The feature-engineering
    sibling of q366's FD discovery (an FD means the cross adds nothing;
    a sparse fill means it adds noise).

    Scale shape: one distinct-count aggregate per candidate pair over
    its table scan, unioned into a bounded report."""
    c = read_table(spark, sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])
    o = read_table(spark, sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus"])
    p = read_table(spark, sf_dir, "part", columns=["p_brand", "p_size"])
    frames = [
        c.agg(
            F.lit("nation_x_segment").alias("cross_name"),
            F.count_distinct("c_nationkey").alias("card_a"),
            F.count_distinct("c_mktsegment").alias("card_b"),
            F.count_distinct("c_nationkey", "c_mktsegment").alias("card_cross"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        ),
        o.agg(
            F.lit("priority_x_status").alias("cross_name"),
            F.count_distinct("o_orderpriority").alias("card_a"),
            F.count_distinct("o_orderstatus").alias("card_b"),
            F.count_distinct("o_orderpriority", "o_orderstatus").alias("card_cross"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        ),
        p.agg(
            F.lit("brand_x_size").alias("cross_name"),
            F.count_distinct("p_brand").alias("card_a"),
            F.count_distinct("p_size").alias("card_b"),
            F.count_distinct("p_brand", "p_size").alias("card_cross"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        ),
    ]
    stats = frames[0]
    for f in frames[1:]:
        stats = stats.unionAll(f)
    return stats.select(
        "cross_name",
        "card_a",
        "card_b",
        "card_cross",
        (F.col("card_a") * F.col("card_b")).cast("long").alias("card_product"),
        F.round(
            F.col("card_cross").cast("double") / (F.col("card_a") * F.col("card_b")),
            6,
        ).alias("fill_ratio"),
        (F.col("card_cross") * 20 <= F.col("n_rows")).alias("cross_is_learnable"),
    )


SESSION_GAPS_MIN = (5, 15, 30, 60)


@query(
    "q408_session_gap_sensitivity",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    users AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM gaps)
    SELECT t.g AS gap_minutes,
           -- sessions = users (first events) + boundary-crossing gaps
           CAST((SELECT nu FROM users)
                + sum(CASE WHEN gap_us > CAST(t.g AS BIGINT) * 60000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions
    FROM gaps CROSS JOIN (SELECT unnest(ARRAY{list(SESSION_GAPS_MIN)}) AS g) t
    WHERE gap_us IS NOT NULL
    GROUP BY t.g
    ORDER BY t.g
    """,
)
def q408_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization gap-parameter sensitivity: the total session
    count under every candidate inactivity threshold, from ONE window
    pass — each user contributes one session plus one more per gap
    exceeding the threshold, so the whole sweep is a conditional sum
    over the same lag stream (q341's sweep discipline applied to q65's
    parameter).  A flat region in this curve is where the session
    definition is robust; a steep one means downstream metrics are
    artifacts of the chosen constant.

    Scale shape: one user-keyed lag window; the ×|thresholds| expansion
    happens at the aggregate over integer microsecond gaps (map-side
    combined into |thresholds| rows)."""
    e = read_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).transform(spersist)
    nu = gaps.agg(F.count_distinct("user_id").alias("nu"))
    thresholds = spark.createDataFrame(
        [(g,) for g in SESSION_GAPS_MIN], "g int"
    )
    return (
        gaps.where(F.col("gap_us").isNotNull())
        .crossJoin(F.broadcast(thresholds))
        .groupBy("g")
        .agg(
            F.sum(
                F.when(
                    F.col("gap_us") > F.col("g").cast("long") * 60_000_000, 1
                ).otherwise(0)
            ).alias("crossings")
        )
        .crossJoin(F.broadcast(nu))
        .select(
            F.col("g").cast("long").alias("gap_minutes"),
            (F.col("nu") + F.col("crossings")).cast("long").alias("n_sessions"),
        )
        .orderBy("gap_minutes")
    )
