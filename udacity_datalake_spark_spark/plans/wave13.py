"""Wave 13: EWMA trend smoothing and the eventually-follows matrix —
time-series smoothing and process mining.

EWMA is defined recursively (s_t = αx_t + (1−α)s_{t−1}) which SQL can't
express directly; the closed form s_t = α·Σ_k (1−α)^k x_{t−k} (plus the
(1−α)^t seed term) IS a window aggregate, and over a month-dimension
frame it is dimension-sized work.  The eventually-follows matrix is the
process-mining primitive ("A is eventually followed by B in a user's
history") — unlike q185's ADJACENT transitions, it captures long-range
ordering, and it reduces to per-(user, type) min/max timestamps before
any pair work, so the pair join is |types|²-bounded per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q204_ewma_trend",
    oracle="""
    WITH monthly AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mnum,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM orders GROUP BY 1
    ),
    base AS (SELECT min(mnum) AS m0 FROM monthly)
    SELECT a.mnum // 12 AS y, a.mnum % 12 + 1 AS m,
           round(a.rev, 2) AS revenue,
           round(0.3 * sum(b.rev * pow(0.7, a.mnum - b.mnum))
                 + pow(0.7, a.mnum - m0 + 1)
                   * (SELECT rev FROM monthly, base WHERE mnum = m0), 2) AS ewma
    FROM monthly a
    JOIN monthly b ON b.mnum <= a.mnum
    CROSS JOIN base
    GROUP BY a.mnum, a.rev, m0
    """,
)
def q204_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of monthly revenue
    (α = 0.3, seeded at the first month) — the smoothing every revenue
    dashboard overlays, via the closed form
    s_t = α·Σ_{k≤t} (1−α)^{t−k} x_k + (1−α)^{t−seed+1}·x_seed.

    The fact collapses to ≤ years×12 decimal-exact rows in one
    map-combined exchange; the weighted combination is then a
    month-dimension self-join (≤80×80 rows — like q134's level frame,
    dimension-sized by construction), evaluating term-for-term the SAME
    expression as the oracle.  Output rounds to cents: double-addition
    order across ~80 terms of ~10⁶ magnitude can differ between engines
    by ~1e-8, far inside a 1e-2 grid but not always inside 1e-6 — the
    rounding grid is chosen to dominate the summation noise, the same
    reasoning as every float output here."""
    o = read_table(spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    monthly = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("mnum")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("rev"))
    m0 = monthly.agg(F.min("mnum").alias("m0"))
    first = monthly.join(F.broadcast(m0), monthly.mnum == m0.m0).select(
        F.col("rev").alias("rev0"), F.col("m0").alias("__m0")
    )
    a = monthly.select(F.col("mnum").alias("amn"), F.col("rev").alias("arev"))
    b = monthly.select(F.col("mnum").alias("bmn"), F.col("rev").alias("brev"))
    hist = (
        a.join(F.broadcast(b), F.col("bmn") <= F.col("amn"))
        .groupBy("amn", "arev")
        .agg(F.sum(F.col("brev") * F.pow(0.7, F.col("amn") - F.col("bmn"))).alias("__w"))
    )
    ewma = 0.3 * F.col("__w") + F.pow(
        0.7, F.col("amn") - F.col("__m0") + 1
    ) * F.col("rev0")
    return hist.crossJoin(F.broadcast(first)).select(
        F.expr("amn div 12").alias("y"),
        (F.col("amn") % 12 + 1).cast("long").alias("m"),
        F.round("arev", 2).alias("revenue"),
        F.round(ewma, 2).alias("ewma"),
    )


@query(
    "q205_eventually_follows",
    oracle="""
    WITH spans AS (
        SELECT user_id, event_type,
               min(ts) AS first_ts, max(ts) AS last_ts
        FROM events GROUP BY user_id, event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
    FROM spans a JOIN spans b
      ON a.user_id = b.user_id AND a.event_type <> b.event_type
    WHERE a.first_ts < b.last_ts
    GROUP BY 1, 2
    """,
)
def q205_eventually_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eventually-follows matrix (process mining): for every ordered
    type pair (A, B), how many users have SOME A occurring before SOME
    B — A's first occurrence precedes B's last.  q185 counts ADJACENT
    transitions; this captures long-range ordering, the input to
    directly-follows/eventually-follows process graphs.

    The event fact reduces to per-(user, type) first/last timestamps on
    one user-keyed exchange; the pair self-join then works on ≤|types|
    rows per user (bounded by the type dimension, never event volume),
    and the final count is |types|²-keyed."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts"])
    spans = e.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    a = spans.select(
        "user_id", F.col("event_type").alias("type_a"), F.col("first_ts").alias("__fa")
    )
    b = spans.select(
        "user_id", F.col("event_type").alias("type_b"), F.col("last_ts").alias("__lb")
    )
    return (
        a.join(b, "user_id")
        .where((F.col("type_a") != F.col("type_b")) & (F.col("__fa") < F.col("__lb")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
