"""Relational-surface gap fills: unpivot/melt, ordered string aggregation,
explicit higher-order array lambdas, and LATERAL (correlated table
subquery) joins.

None of these appear in the reference (its only aggregation is
``distinct()``, SURVEY.md §2.4); they complete the declared M2 surface so
a user of any mainstream warehouse dialect finds the equivalent here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q105_unpivot",
    oracle="""
    SELECT metric,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
        SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY 1
    """,
)
def q105_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (UNPIVOT / melt) then per-metric totals.

    ``DataFrame.unpivot`` is a zero-shuffle row-local explode — the 3×
    row multiplication happens inside the scan stage and partial (map-
    side) aggregation collapses it to 3 groups before the one exchange,
    so at 100 TB the shuffle carries 3 rows per task, not 3× the table.
    """
    li = read_table(spark, sf_dir, "lineitem", columns=["l_quantity", "l_discount", "l_tax"])
    long = li.unpivot([], ["l_quantity", "l_discount", "l_tax"], "metric", "value")
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )


@query(
    "q106_ordered_string_agg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY 1
    """,
)
def q106_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered set aggregation (LISTAGG/STRING_AGG ... ORDER BY).

    ``collect_set`` alone is nondeterministic in element order — sorting
    the array before joining makes the result bit-stable under any
    partitioning, which is the rule every oracle-checked aggregate here
    follows.  ``collect_set`` partial-aggregates map-side, so the
    exchange carries one small set per (group × task).
    """
    o = read_table(spark, sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus"])
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
        F.count_distinct("o_orderstatus").alias("n_statuses"),
    )


@query(
    "q107_higher_order_funcs",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 6) AS l1,
           round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vmax,
           len(embedding) AS dim
    FROM embeddings
    """,
)
def q107_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (filter / transform / aggregate) on the
    embedding column — the JVM-side way to compute per-vector stats.

    Everything stays in whole-stage codegen: no UDF, no explode-shuffle
    (contrast q69, which posexplodes because it aggregates ACROSS rows
    per dimension; here each row folds its own array).  The fold order of
    ``F.aggregate`` is left-to-right, same as DuckDB's list_sum, so the
    double sums are bit-identical.
    """
    e = read_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 6
        ).alias("l1"),
        F.round(F.array_max(as_double), 6).alias("vmax"),
        F.size("embedding").alias("dim"),
    )


@query(
    "q108_lateral_topk",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (
             SELECT o_orderkey, o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2
         ) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q108_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 orders per customer).

    Spark plans a correlated LATERAL ... LIMIT as a DomainJoin; the
    scale-honest physical shape is the window rewrite — one hash
    partition on the correlation key, rank, filter — which is exactly
    what the engine emits here (identical semantics, tie-broken on
    o_orderkey so the top-2 is total-ordered and engine-independent).
    """
    from pyspark.sql.window import Window

    c = read_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    # semi-filter orders by the qualifying customers BEFORE the window's
    # hash partition — top-2-per-customer is unaffected, and the exchange
    # carries only the segment's share of the fact table
    o = read_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    ).join(F.broadcast(c.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    top2 = (
        o.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 2)
        .drop("__rn")
    )
    return c.join(top2, F.col("c_custkey") == F.col("o_custkey")).select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@query(
    "q111_scd2_dimension",
    oracle="""
    WITH dedup AS (
        SELECT user_id, ts, event_type
        FROM (
            SELECT user_id, ts, event_type,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev
            FROM events
        )
        WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) IS NULL AS is_current
    FROM dedup
    """,
)
def q111_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from the event changelog
    (operators.scd.scd2): per-user validity intervals for the observed
    state, consecutive no-op records collapsed, open-ended current row.
    One hash exchange on the key + in-partition window pass — the
    history-preserving alternative to the reference's overwrite-the-
    dimension-every-run (etl.py:46,62,95)."""
    from udacity_datalake_spark_spark.operators.scd import scd2

    events = read_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return scd2(events, key="user_id", ts="ts", attrs=["event_type"])


@query(
    "q112_changelog_apply",
    oracle="""
    WITH ranked AS (
        SELECT user_id, ts, event_type, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, ts AS last_ts, event_type AS last_event,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q112_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog application: materialize the CURRENT snapshot from an
    append-only change feed — latest record per key wins, keys whose
    latest record is a tombstone ('error' here) drop out entirely.

    The MERGE-INTO-equivalent for engines without ACID tables: one hash
    exchange on the key, per-partition sort, row_number = 1.  At 100 TB
    the feed is typically date-partitioned, so partition pruning bounds
    the scan to the days since the last snapshot; combining with the
    previous snapshot is the same plan over (snapshot ∪ delta).  Ties
    break on event_id so replays are bit-identical.
    """
    from pyspark.sql.window import Window

    e = read_table(
        spark, sf_dir, "events", columns=["user_id", "ts", "event_type", "value", "event_id"]
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event"),
            dec("value").cast("double").alias("last_value"),
        )
    )
