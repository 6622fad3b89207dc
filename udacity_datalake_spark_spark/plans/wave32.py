"""Wave 32: event-time lateness audit (the watermark-tuning report,
built on the new two-phase prefix-max operator) and Oaxaca-style
mix/rate decomposition of a KPI change — the "did the metric move
because segments changed or because the mix changed" question every
metrics review asks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.topk import global_running_max
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q271_late_event_rate",
    oracle="""
    WITH arr AS (
        SELECT event_type, ts,
               max(epoch_us(ts)) OVER (
                   ORDER BY CAST(ts AS DATE),
                            md5(CAST(event_id AS VARCHAR)), event_id
                   ROWS UNBOUNDED PRECEDING) AS wm_us
        FROM events
    ),
    late AS (
        SELECT event_type, wm_us - epoch_us(ts) AS lateness_us FROM arr
    )
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CASE WHEN lateness_us > 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1h,
           round(sum(CASE WHEN lateness_us > 3600000000 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS late_1h_share,
           CAST(max(lateness_us) // 60000000 AS BIGINT) AS max_lateness_minutes
    FROM late GROUP BY event_type
    """,
)
def q271_late_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lateness audit under a daily-batch replay: events
    arrive day by day but hash-shuffled WITHIN each day (the md5
    ordering — how a parallel batch ingest actually lands), and each
    event's lateness is its gap behind the running event-time
    high-water mark — the report that TELLS you what watermark the
    streaming queries (q52-q55, q71) need instead of guessing.

    The running watermark is a corpus-sized prefix MAX over arrival
    order, so it runs through the new ``topk.global_running_max``
    (two-phase bucketed — no single-partition window over the fact;
    the day number is the bucket key, the md5 shuffle orders within);
    lateness is exact integer microseconds, shares are exact counts."""
    e = read_table(spark, sf_dir, "events", columns=["event_id", "event_type", "ts"])
    keyed = e.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_date(F.to_date("ts")).cast("double").alias("__ord"),
        F.unix_date(F.to_date("ts")).alias("__day"),
        F.md5(F.col("event_id").cast("string")).alias("__h"),
        "event_id",
    )
    arr = global_running_max(
        keyed,
        [F.col("__day"), F.col("__h"), F.col("event_id")],
        "__ord",
        "ts_us",
        out_col="wm_us",
    ).drop("__ord", "__day", "__h")
    late = arr.select(
        "event_type", (F.col("wm_us") - F.col("ts_us")).alias("lateness_us")
    )
    is_late = F.col("lateness_us") > 3600 * 1000000
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(is_late, 1).otherwise(0)).alias("n_late_1h"),
        F.round(
            F.sum(F.when(is_late, 1).otherwise(0)) / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("late_1h_share"),
        F.floor(F.max("lateness_us") / 60000000).cast("long").alias(
            "max_lateness_minutes"
        ),
    )


@query(
    "q272_mix_rate_decomposition",
    oracle="""
    WITH o AS (
        SELECT n.n_name AS nation,
               CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' THEN 2 ELSE 1 END
                   AS period,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
        FROM orders
        JOIN customer c ON o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
    ),
    cell AS (
        SELECT nation, period, count(*) AS n, CAST(sum(hit) AS BIGINT) AS k
        FROM o GROUP BY 1, 2
    ),
    tot AS (
        SELECT period, CAST(sum(n) AS BIGINT) AS np FROM cell GROUP BY period
    ),
    j AS (
        SELECT c1.nation,
               c1.n AS n1, c1.k AS k1, c2.n AS n2, c2.k AS k2,
               t1.np AS np1, t2.np AS np2
        FROM cell c1 JOIN cell c2 ON c1.nation = c2.nation
             AND c1.period = 1 AND c2.period = 2
        CROSS JOIN (SELECT np FROM tot WHERE period = 1) t1
        CROSS JOIN (SELECT np FROM tot WHERE period = 2) t2
    ),
    terms AS (
        SELECT nation,
               CAST(round((n2 * 1.0 / np2 - n1 * 1.0 / np1)
                          * (k1 * 1.0 / n1), 10) AS DECIMAL(28,10)) AS mix_term,
               CAST(round((n2 * 1.0 / np2)
                          * (k2 * 1.0 / n2 - k1 * 1.0 / n1), 10)
                    AS DECIMAL(28,10)) AS rate_term,
               k1, n1, k2, n2, np1, np2
        FROM j
    )
    SELECT round(CAST(sum(k1) AS DOUBLE) / max(np1), 6) AS rate_period1,
           round(CAST(sum(k2) AS DOUBLE) / max(np2), 6) AS rate_period2,
           round(CAST(sum(mix_term) AS DOUBLE), 6) AS mix_effect,
           round(CAST(sum(rate_term) AS DOUBLE), 6) AS rate_effect
    FROM terms
    """,
)
def q272_mix_rate_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-style decomposition of the change in the 'F'-status order
    rate from 1995 to 1996: how much came from the NATION MIX shifting
    (Σ Δweight·rate₁) vs nations actually changing their rates
    (Σ weight₂·Δrate) — the standard "metric moved, was it mix or
    behavior" answer, with the identity Δrate = mix + rate holding for
    nations present in both periods.

    One fact aggregate to (nation, period) cells (customer/nation
    broadcast); per-nation decomposition terms round to DECIMAL(28,10)
    before the exact nation sum (q150); headline rates divide exact
    integers once."""
    o = read_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderstatus"])
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    n = read_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    base = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.when(
                F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"), 2
            )
            .otherwise(1)
            .alias("period"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("hit"),
        )
    )
    cell = base.groupBy("nation", "period").agg(
        F.count(F.lit(1)).alias("n"), F.sum("hit").alias("k")
    )
    tot = cell.groupBy("period").agg(F.sum("n").alias("np"))
    c1 = cell.where(F.col("period") == 1).select(
        "nation", F.col("n").alias("n1"), F.col("k").alias("k1")
    )
    c2 = cell.where(F.col("period") == 2).select(
        "nation", F.col("n").alias("n2"), F.col("k").alias("k2")
    )
    t1 = tot.where(F.col("period") == 1).select(F.col("np").alias("np1"))
    t2 = tot.where(F.col("period") == 2).select(F.col("np").alias("np2"))
    j = (
        c1.join(c2, "nation")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
    )
    n1, k1, n2, k2 = F.col("n1"), F.col("k1"), F.col("n2"), F.col("k2")
    np1, np2 = F.col("np1"), F.col("np2")
    mix_term = F.round(
        (n2 * F.lit(1.0) / np2 - n1 * F.lit(1.0) / np1) * (k1 * F.lit(1.0) / n1), 10
    ).cast("decimal(28,10)")
    rate_term = F.round(
        (n2 * F.lit(1.0) / np2) * (k2 * F.lit(1.0) / n2 - k1 * F.lit(1.0) / n1), 10
    ).cast("decimal(28,10)")
    terms = j.select(
        "nation", mix_term.alias("mix_term"), rate_term.alias("rate_term"),
        "k1", "n1", "k2", "n2", "np1", "np2",
    )
    return terms.agg(
        F.round(F.sum("k1").cast("double") / F.max("np1"), 6).alias("rate_period1"),
        F.round(F.sum("k2").cast("double") / F.max("np2"), 6).alias("rate_period2"),
        F.round(F.sum("mix_term").cast("double"), 6).alias("mix_effect"),
        F.round(F.sum("rate_term").cast("double"), 6).alias("rate_effect"),
    )
