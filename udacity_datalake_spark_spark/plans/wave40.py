"""Wave 40: order-priority SLA equity, directed basket attach rates,
and Markov path entropy — service fairness, cross-sell direction, and
behavioral predictability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q291_priority_equity",
    oracle="""
    WITH lat AS (
        SELECT o_orderpriority AS priority,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    per AS (
        SELECT priority, count(*) AS n,
               CAST(sum(days) AS BIGINT) AS sd,
               round(quantile_cont(days, 0.9), 6) AS p90_days
        FROM lat GROUP BY priority
    ),
    base AS (SELECT max(CAST(sd AS DOUBLE) / n) AS worst_mean FROM per)
    SELECT priority, n AS n_lines,
           round(CAST(sd AS DOUBLE) / n, 6) AS mean_days,
           p90_days,
           round(CAST(sd AS DOUBLE) / n - worst_mean, 6) AS mean_vs_worst
    FROM per CROSS JOIN base
    """,
)
def q291_priority_equity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority SLA equity: mean and p90 ship latency per
    priority class, each mean shown against the WORST class — the audit
    that checks whether 1-URGENT actually ships faster than 5-LOW or
    the priority field is theater.

    One orderkey join, one priority-grain aggregate (exact day sums;
    p90 via the q66 percentile pair); the worst-class baseline is a
    single-row broadcast."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("days"),
    )
    per = lat.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("days").alias("sd"),
        F.round(F.percentile("days", F.lit(0.9)), 6).alias("p90_days"),
    )
    base = per.agg(
        F.max(F.col("sd").cast("double") / F.col("n")).alias("worst_mean")
    )
    mean = F.col("sd").cast("double") / F.col("n")
    return per.crossJoin(F.broadcast(base)).select(
        "priority",
        F.col("n").alias("n_lines"),
        F.round(mean, 6).alias("mean_days"),
        "p90_days",
        F.round(mean - F.col("worst_mean"), 6).alias("mean_vs_worst"),
    )


@query(
    "q292_attach_rates",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_type AS t
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    singles AS (SELECT t, count(*) AS n_t FROM items GROUP BY t),
    pairs AS (
        SELECT a.t AS anchor, b.t AS attached, count(*) AS n_both
        FROM items a JOIN items b ON a.okey = b.okey AND a.t <> b.t
        GROUP BY 1, 2
    )
    SELECT anchor, attached, CAST(n_both AS BIGINT) AS n_both,
           round(n_both / CAST(s.n_t AS DOUBLE), 6) AS attach_rate
    FROM pairs JOIN singles s ON anchor = s.t
    WHERE n_both * 2 > s.n_t
    """,
)
def q292_attach_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed basket attach rates: P(type B also in the order | type A
    in the order), keeping attachments above 50% — the cross-sell
    playbook view q209's symmetric lift can't give (lift says the pair
    co-occurs; attach rate says WHICH side drives the bundle).

    q209's basket reduction (DISTINCT (order, type) via broadcast dim
    join) with a DIRECTED pair aggregate; rates are exact counts over
    the broadcast anchor marginal, admission is integer
    cross-multiplication."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    items = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_type").alias("t"))
        .distinct()
    )
    singles = items.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    a = items.select("okey", F.col("t").alias("anchor"))
    b = items.select("okey", F.col("t").alias("attached"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("anchor") != F.col("attached"))
        .groupBy("anchor", "attached")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    joined = pairs.join(
        F.broadcast(singles.select(F.col("t").alias("anchor"), "n_t")), "anchor"
    )
    return joined.where(F.col("n_both") * 2 > F.col("n_t")).select(
        "anchor",
        "attached",
        "n_both",
        F.round(F.col("n_both") / F.col("n_t").cast("double"), 6).alias("attach_rate"),
    )


@query(
    "q293_markov_entropy",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    tr AS (
        SELECT event_type AS cur, nxt, count(*) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    marg AS (SELECT cur, CAST(sum(c) AS BIGINT) AS nc FROM tr GROUP BY cur),
    terms AS (
        SELECT tr.cur, nc,
               CAST(round(c * ln(CAST(nc AS DOUBLE) / c), 8) AS DECIMAL(28,8))
                   AS term
        FROM tr JOIN marg ON tr.cur = marg.cur
    )
    SELECT cur AS state, nc AS n_transitions,
           round(CAST(sum(term) AS DOUBLE) / nc, 6) AS next_entropy_nats,
           round(CAST(sum(term) AS DOUBLE) / nc / ln(5.0), 6)
               AS normalized_entropy
    FROM terms GROUP BY cur, nc
    """,
)
def q293_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral predictability: the conditional entropy of the NEXT
    event type given the current one, per state (plus its /ln(5)
    normalization) — low entropy means the q147 transition matrix is
    nearly deterministic and next-action prediction is easy; uniform
     1.0 means user paths are noise.

    Per-user sequencing is one partitioned lag window (q147's shape);
    transitions collapse to a 25-cell frame; each c·ln(n/c) term
    rounds to DECIMAL(28,8) before the exact per-state sum (q130's
    log discipline)."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    )
    tr = (
        seq.where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    marg = tr.groupBy("cur").agg(F.sum("c").alias("nc"))
    terms = tr.join(F.broadcast(marg), "cur").select(
        "cur",
        "nc",
        F.round(
            F.col("c") * F.log(F.col("nc").cast("double") / F.col("c")), 8
        )
        .cast("decimal(28,8)")
        .alias("term"),
    )
    h = F.sum("term").cast("double") / F.col("nc")
    return terms.groupBy("cur", "nc").agg(
        F.round(h, 6).alias("next_entropy_nats"),
        F.round(h / F.log(F.lit(5.0)), 6).alias("normalized_entropy"),
    ).select(
        F.col("cur").alias("state"),
        F.col("nc").alias("n_transitions"),
        "next_entropy_nats",
        "normalized_entropy",
    )
