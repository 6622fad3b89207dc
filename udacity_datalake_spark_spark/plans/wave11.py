"""Wave 11: behavior-path mining and conversion-delay quantiles — the
sequence-analytics closers.

Path mining is where naive Spark code silently breaks determinism:
``collect_list`` over a groupBy has NO ordering guarantee, so "the
user's event sequence" differs run to run.  The engine's rule: collect
structs, ``sort_array`` (total order inside codegen), THEN project —
order becomes part of the data, not an accident of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.sessions import with_session_seq
from udacity_datalake_spark_spark.operators.topk import global_row_number, ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q199_behavior_paths",
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
        SELECT user_id, ts, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_seq,
               array_to_string(list(event_type ORDER BY ts, event_id), '>') AS path
        FROM sess GROUP BY user_id, session_seq
    ),
    counts AS (SELECT path, count(*) AS n_sessions FROM paths GROUP BY path)
    SELECT path, n_sessions FROM (
        SELECT path, n_sessions,
               row_number() OVER (ORDER BY n_sessions DESC, path) AS rn
        FROM counts
    ) WHERE rn <= 10
    """,
)
def q199_behavior_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session behavior paths: sessionize (30-min gaps, q65's
    rewrite), express each session as its ordered event-type sequence,
    count path frequencies — the "how do users actually move through the
    product" report.

    The path string is built DETERMINISTICALLY: collect structs keyed by
    (ts, event_id), ``sort_array`` inside codegen, then project the type
    — never a bare ``collect_list``, whose order is an accident of
    partitioning.  Sessionize + collect share one user_id exchange; the
    path count is vocabulary-keyed; the final cut is ranked_topk
    (TakeOrderedAndProject), so nothing global ever single-partitions."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    sess = with_session_seq(e)
    paths = (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    return ranked_topk(counts, [F.col("n_sessions").desc(), F.col("path")], 10).select(
        "path", "n_sessions"
    )


@query(
    "q200_conversion_delay_quantiles",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS first_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
        SELECT e.user_id,
               CAST(min(epoch_us(e.ts)) - epoch_us(v.first_view) AS BIGINT) AS delay_us
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.first_view
        GROUP BY e.user_id, v.first_view
    ),
    counts AS (SELECT delay_us, count(*) AS cnt FROM conv GROUP BY delay_us),
    cum AS (
        SELECT delay_us,
               sum(cnt) OVER (ORDER BY delay_us ROWS UNBOUNDED PRECEDING) AS c,
               sum(cnt) OVER () AS total
        FROM counts
    )
    SELECT CAST((SELECT count(*) FROM conv) AS BIGINT) AS n_converted,
           (SELECT min(delay_us) FROM cum WHERE c * 2 >= total) AS p50_us,
           (SELECT min(delay_us) FROM cum WHERE c * 10 >= 9 * total) AS p90_us,
           (SELECT min(delay_us) FROM conv) AS min_us,
           (SELECT max(delay_us) FROM conv) AS max_us
    """,
)
def q200_conversion_delay_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, microseconds from first
    view to first subsequent purchase; report exact discrete p50/p90 and
    the range — the latency summary of q126's funnel.

    Delays are exact int64 micros (no float anywhere).  Unlike q177 —
    whose cumulative window runs over a VALUE-BOUNDED frame — delay
    cardinality grows with users, so the percentiles come from the
    two-phase ranking operator instead (global_row_number: quantile
    buckets + exact offsets, no single-partition window):
    percentile_disc(p) is simply the value at rank ⌈p·n⌉ of the total
    (delay, user) order.  The delay computation itself is two user-keyed
    aggregates on one partitioning."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts"])
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    conv = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(
            (F.min(F.unix_micros("ts")) - F.unix_micros(F.min("first_view"))).alias(
                "delay_us"
            )
        )
        .select("user_id", F.col("delay_us").cast("long").alias("delay_us"))
    )
    conv = conv.transform(spersist)  # feeds count, ranking (2 jobs), and summary
    n = conv.count()
    ranked = global_row_number(
        conv, [F.col("delay_us"), F.col("user_id")], "delay_us", out_col="__rn"
    )
    p50_rank, p90_rank = (n + 1) // 2, (9 * n + 9) // 10
    # single pass over the (≤2-row) rank hits; agg over an empty frame
    # still yields one NULL row, so the n=0 case matches the oracle's
    # always-one-row scalar-subquery shape
    pcts = ranked.where(F.col("__rn").isin(p50_rank, p90_rank)).agg(
        F.min(F.when(F.col("__rn") == p50_rank, F.col("delay_us"))).alias("p50_us"),
        F.min(F.when(F.col("__rn") == p90_rank, F.col("delay_us"))).alias("p90_us"),
    )
    summary = conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("delay_us").alias("min_us"),
        F.max("delay_us").alias("max_us"),
    )
    return summary.crossJoin(F.broadcast(pcts)).select(
        "n_converted", "p50_us", "p90_us", "min_us", "max_us"
    )
