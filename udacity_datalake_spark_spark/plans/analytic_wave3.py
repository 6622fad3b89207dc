"""Third analytics wave: skyline/Pareto frontier, time-range trailing
windows, windowed event dedup, weighted median, and column profiling.

All absent from the reference (whose only aggregate is ``distinct()``,
reference etl.py:42,58,91,169).  Scale design per operator:

- the Pareto frontier aggregates to one row per distinct price BEFORE the
  global window, so the unpartitioned sort runs on the distinct-key frame
  (≪ rows); frontier-of-frontiers is associative, so a 100 TB variant
  computes per-partition frontiers first and merges — the same algebra
  grouped here by price level;
- the trailing 1-hour window orders by integer microseconds (RANGE frame
  needs a numeric key) and accumulates in DECIMAL — Spark's incremental
  sliding-frame state equals DuckDB's segment-tree result exactly;
- windowed dedup is one lag() per (user, type) timeline — a single hash
  exchange, the batch twin of watermarked streaming dropDuplicates;
- weighted median pre-aggregates weight per (group, value) — the window
  then walks distinct values, not raw rows;
- the column profiler folds N per-column aggregates into one unpivoted
  pass (stack → groupBy) instead of N table scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q134_pareto_frontier",
    oracle="""
    SELECT a.p_partkey, a.p_retailprice, a.p_size FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
)
def q134_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts not dominated on (minimize retail price,
    maximize size).  A part is dominated if some other part is
    cheaper-or-equal AND bigger-or-equal with at least one strict.

    The oracle's NOT EXISTS self-join is O(n²); the engine rewrite is the
    sort-scan skyline: collapse to one row per distinct price with the
    max size at that price (map-side-combined aggregate), take the
    running max of sizes over STRICTLY cheaper prices, and keep rows
    whose size equals their price-level max and beats every cheaper
    level.  The only unpartitioned window runs on the distinct-price
    frame; at real scale the associativity of skylines (frontier of a
    union = frontier of the frontiers) gives the partition-then-merge
    plan this query's algebra already demonstrates.
    """
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_retailprice", "p_size"])
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("__mx"))
    w_lt = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    levels = per_price.select(
        "p_retailprice", "__mx", F.max("__mx").over(w_lt).alias("__mx_lt")
    )
    return (
        p.join(levels, "p_retailprice")
        .where(
            (F.col("p_size") == F.col("__mx"))
            & (F.col("__mx_lt").isNull() | (F.col("__mx_lt") < F.col("p_size")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


@query(
    "q135_trailing_hour_window",
    oracle="""
    SELECT event_id, user_id, n_1h,
           CAST(sum_1h_dec AS DOUBLE) AS sum_1h
    FROM (
        SELECT event_id, user_id,
               count(*) OVER w AS n_1h,
               sum(CAST(value AS DECIMAL(18,4))) OVER w AS sum_1h_dec
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    )
    """,
)
def q135_trailing_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour event-time window per user (count + exact sum):
    the time-based RANGE frame, complementing q119's row-based frame.

    The frame key is integer microseconds (RANGE frames require a
    numeric order key; integer time also means no float drift at the
    frame boundary), the sum accumulates in DECIMAL, and rows sharing a
    timestamp are frame *peers* — included together in both engines, so
    the result is well-defined without a tie-break column.  One hash
    exchange on user_id.
    """
    e = read_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(dec("value", 18, 4)).over(w).cast("double").alias("sum_1h"),
    )


@query(
    "q136_windowed_dedup",
    oracle="""
    SELECT event_id, user_id, event_type FROM (
        SELECT event_id, user_id, event_type,
               lag(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts,
               ts
        FROM events
    )
    WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL 10 MINUTE
    """,
)
def q136_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed dedup: keep an event only if the previous
    event of the same (user, type) is more than 10 minutes older — the
    batch twin of streaming ``dropDuplicatesWithinWatermark``.

    One lag() over the (user, type) timeline — a single hash exchange,
    no self-join; state per key is one timestamp, the same bound the
    streaming variant's watermark state carries.
    """
    e = read_table(spark, sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select("event_id", "user_id", "event_type", "ts", F.lag("ts").over(w).alias("prev_ts"))
        .where(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 10 MINUTES"))
        )
        .select("event_id", "user_id", "event_type")
    )


@query(
    "q137_weighted_median",
    oracle="""
    WITH per_q AS (
        SELECT l_returnflag, l_quantity,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS w
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    cum AS (
        SELECT l_returnflag, l_quantity, w,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM per_q
    )
    SELECT l_returnflag, min(l_quantity) AS weighted_median_qty
    FROM cum WHERE 2 * cw >= tw GROUP BY l_returnflag
    """,
)
def q137_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median of quantity (weights = extended price) per return
    flag: the smallest quantity whose cumulative weight reaches half the
    group total.

    Weights pre-aggregate per (group, value) — the cumulative window then
    walks the distinct-value frame, not raw rows — and stay DECIMAL end
    to end, so the half-total comparison is exact (``2·cw ≥ tw`` in
    integer-scaled arithmetic, no float boundary).  One exchange on the
    group key covers aggregate and windows.
    """
    li = read_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    per_q = li.groupBy("l_returnflag", "l_quantity").agg(
        F.sum(dec("l_extendedprice", 18, 2)).alias("w")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = per_q.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("weighted_median_qty"))
    )


@query(
    "q138_column_profile",
    oracle="""
    SELECT 'o_orderstatus' AS column_name,
           count(*) - count(o_orderstatus) AS n_null,
           count(DISTINCT o_orderstatus) AS n_distinct,
           min(o_orderstatus) AS min_value, max(o_orderstatus) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus_priority',
           count(*) - count(o_orderstatus || '|' || o_orderpriority),
           count(DISTINCT o_orderstatus || '|' || o_orderpriority),
           min(o_orderstatus || '|' || o_orderpriority),
           max(o_orderstatus || '|' || o_orderpriority)
    FROM orders
    """,
)
def q138_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler — null count, distinct count, min/max per profiled
    column (here the two status dimensions plus their concatenation):
    the data-quality summary a catalog publishes per table load.

    Instead of one scan per column, ``stack`` unpivots the profiled
    columns into (name, value) rows inside codegen and ONE aggregate
    computes every profile — the fact is scanned once regardless of how
    many columns are profiled.  (The oracle's UNION ALL form is the
    naive N-scan shape; DuckDB reuses the scan, Spark never makes one.)
    """
    o = read_table(spark, sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
    unpivoted = o.select(
        F.expr(
            "stack(3, 'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'o_orderstatus_priority', o_orderstatus || '|' || o_orderpriority) "
            "AS (column_name, value)"
        )
    )
    return unpivoted.groupBy("column_name").agg(
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null"),
        F.countDistinct("value").alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
