"""Warehouse shapes: generated date dimension + broadcast enrichment,
null-safe joins, schema'd JSON parsing, and zero-preserving histograms.

The reference joins only on natural columns and never generates data
(reference etl.py:140-155); these are the surrounding shapes every
warehouse workload needs.  Scale notes:

- the date dimension is GENERATED (sequence → explode), a few thousand
  rows for decades of days — always broadcast, so calendar enrichment
  never shuffles the fact;
- null-safe equality (``<=>`` / IS NOT DISTINCT FROM) is still hash-join
  compatible in Spark (null keys co-locate like any value) — unlike an
  OR-of-IS-NULL rewrite, which would fall to nested-loop;
- ``from_json`` with an explicit schema parses once into a struct (one
  parse per row regardless of field count), versus per-path re-parsing
  with ``get_json_object`` (q31's shape);
- the histogram bins map-side (every row decides its bucket in the scan
  stage) and only the bucket counts — not rows — meet the generated
  spine that restores empty bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q139_date_dim_enrich",
    oracle="""
    WITH dim AS (
        SELECT CAST(d AS DATE) AS d,
               year(CAST(d AS DATE)) AS d_year,
               quarter(CAST(d AS DATE)) AS d_quarter,
               CASE WHEN dayofweek(CAST(d AS DATE)) IN (0, 6) THEN 1 ELSE 0 END
                   AS is_weekend
        FROM (SELECT unnest(generate_series(DATE '1992-01-01', DATE '2001-12-31',
                                            INTERVAL 1 DAY)) AS d)
    )
    SELECT d_year, d_quarter,
           count(*) AS n_orders,
           CAST(sum(is_weekend) AS BIGINT) AS weekend_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN dim ON CAST(o_orderdate AS DATE) = dim.d
    GROUP BY d_year, d_quarter
    """,
)
def q139_date_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension (1992–2001, covering the fact's full
    order-date range, with fiscal and weekend
    attributes) broadcast-joined onto orders, aggregated to quarters.

    The dimension is built by ``sequence``/``explode`` — ~3.7k rows for
    ten years, generated in-plan with no source table and explicitly
    broadcast, so the fact side never shuffles for the enrichment; the
    only exchange is the final 28-group aggregate.  This is the pattern
    for EVERY calendar/fiscal attribute at 100 TB: derive once, broadcast
    always.
    """
    dim = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1992-01-01").cast("date"),
                    F.lit("2001-12-31").cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("d")
        )
        .select(
            "d",
            F.year("d").alias("d_year"),
            F.quarter("d").alias("d_quarter"),
            F.dayofweek("d").isin(1, 7).cast("int").alias("is_weekend"),
        )
    )
    o = read_table(spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    return (
        o.select(F.to_date("o_orderdate").alias("d"), "o_totalprice")
        .join(F.broadcast(dim), "d")
        .groupBy("d_year", "d_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("is_weekend").alias("weekend_orders"),
            F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("revenue"),
        )
    )


@query(
    "q140_null_safe_join",
    oracle="""
    SELECT n_nationkey, r_name
    FROM (SELECT n_nationkey, nullif(n_regionkey, 2) AS nk FROM nation) a
    JOIN (SELECT r_name, nullif(r_regionkey, 2) AS rk FROM region) b
      ON a.nk IS NOT DISTINCT FROM b.rk
    """,
)
def q140_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): region key 2
    is nulled on BOTH sides, so those rows match through null=null —
    semantics a plain equi-join silently drops.

    Spark's ``eqNullSafe`` stays a hash join (null hashes like any key
    value and co-locates), so the null-safe form costs the same as the
    plain join — the rewrite to ``(a = b OR (a IS NULL AND b IS NULL))``
    would instead defeat the hash-join planner.
    """
    n = read_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    r = read_table(spark, sf_dir, "region")
    a = n.select("n_nationkey", F.nullif(F.col("n_regionkey"), F.lit(2)).alias("nk"))
    b = r.select("r_name", F.nullif(F.col("r_regionkey"), F.lit(2)).alias("rk"))
    return a.join(F.broadcast(b), a["nk"].eqNullSafe(b["rk"])).select(
        "n_nationkey", "r_name"
    )


@query(
    "q141_json_schema_parse",
    oracle="""
    SELECT event_type,
           count(*) AS n_div7,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k7
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 = 0
    GROUP BY event_type
    """,
)
def q141_json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd JSON parsing: ``from_json`` with an explicit struct
    schema parses the payload ONCE per row into typed fields — the scale
    path when several fields are consumed, versus ``get_json_object``
    re-parsing per path (q31's shape).  Parse + filter + aggregate all
    inside one codegen stage before the 5-group exchange.
    """
    e = read_table(spark, sf_dir, "events", columns=["event_type", "props"])
    parsed = e.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    return (
        parsed.where(F.col("k") % 7 == 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_div7"), F.sum("k").alias("sum_k7"))
    )


@query(
    "q142_histogram_bins",
    oracle="""
    WITH counts AS (
        SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin, count(*) AS n
        FROM orders GROUP BY 1
    ),
    spine AS (
        SELECT unnest(generate_series(0, (SELECT max(bin) FROM counts))) AS bin
    )
    SELECT spine.bin * 50000 AS bin_lo, COALESCE(counts.n, 0) AS n
    FROM spine LEFT JOIN counts ON spine.bin = counts.bin
    """,
)
def q142_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value with empty bins preserved.

    Every row computes its bucket map-side (the only fact exchange
    carries bucket ids, already combined), and the generated bin spine —
    derived from the observed max, so no hard-coded domain — left-joins
    the bucket COUNTS, not the rows, to restore zero bins.  The spine
    join touches max-bin rows: broadcast at any fact scale.
    """
    o = read_table(spark, sf_dir, "orders", columns=["o_totalprice"])
    counts = (
        o.select(F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = counts.agg(F.max("bin").alias("mx")).select(
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("mx"))).alias("bin")
    )
    return (
        spine.join(counts, "bin", "left")
        .select((F.col("bin") * 50000).alias("bin_lo"), F.coalesce("n", F.lit(0)).alias("n"))
    )

@query(
    "q154_point_in_time_join",
    oracle="""
    WITH dedup AS (
        SELECT user_id, ts, event_type FROM (
            SELECT user_id, ts, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_type) AS prev
            FROM events WHERE event_type <> 'purchase'
        ) WHERE prev IS NULL OR event_type <> prev
    ),
    dim AS (
        SELECT user_id, ts AS valid_from, max(event_type) AS state
        FROM dedup GROUP BY user_id, ts
    ),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    j AS (
        SELECT p.event_id, d.state,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY d.valid_from DESC) AS rn
        FROM p JOIN dim d ON p.user_id = d.user_id AND d.valid_from <= p.ts
    )
    SELECT state, count(*) AS n_purchases
    FROM j WHERE rn = 1 GROUP BY state
    """,
)
def q154_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension join: each purchase picks up
    the SCD2 state (q111's dimension, built from the non-purchase
    changelog) that was valid AT its event time — the dimensional-
    modeling join that makes history-preserving dims queryable.

    The engine path is the as-of operator (operators.joins.asof_join):
    union + one (user_id) window carrying the last-seen state forward —
    one exchange, no interval cross join (the oracle's join+row_number
    is exactly that quadratic shape).  Same-instant state changes
    collapse deterministically (max state wins) on both sides before
    the as-of, so ties cannot differ.
    """
    from udacity_datalake_spark_spark.operators.joins import asof_join
    from udacity_datalake_spark_spark.operators.scd import scd2

    e = read_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    changes = e.where(F.col("event_type") != "purchase").select("user_id", "ts", "event_type")
    hist = scd2(changes, key="user_id", ts="ts", attrs=["event_type"])
    dim = (
        hist.select("user_id", "valid_from", F.col("event_type").alias("state"))
        .groupBy("user_id", "valid_from")
        .agg(F.max("state").alias("state"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_join(purchases, dim, on=["user_id"], left_ts="ts", right_ts="valid_from")
    return (
        joined.where(F.col("state").isNotNull())
        .groupBy("state")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
