"""Wave 62: mergeable fixed-bin quantiles with their PROVEN error bound
(the rollup-friendly percentile the t-digest approximates, with the
bound a fixed-width histogram actually guarantees) and time-banded
duplicate-payment detection (the fintech double-charge screen).

Reference parity note: the reference (etl.py, /root/reference) has no
statistics or fraud surface; these extend q66/q102 (percentiles) and
q277 (duplicate orders — the exact-key variant of q349's time-banded
rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

#: Histogram geometry: value domain [0, 512) in 64 fixed bins (width 8)
#: — the estimate's error is bounded by half a bin width by
#: construction; values past the domain clamp into the last bin, which
#: is exempted from the distance bound (flagged by p95_bin = 63).
N_BINS = 64
DOMAIN = 512.0


@query(
    "q348_mergeable_quantiles",
    oracle=f"""
    WITH vals AS (
        SELECT event_type, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL
    ),
    binned AS (
        SELECT event_type,
               least({N_BINS} - 1,
                     CAST(floor(v / ({DOMAIN} / {N_BINS})) AS BIGINT)) AS b,
               count(*) AS n
        FROM vals GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, b, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY b) AS c,
               sum(n) OVER (PARTITION BY event_type) AS tot
        FROM binned
    ),
    est AS (
        SELECT event_type,
               CAST(min(CASE WHEN c * 20 >= tot * 19 THEN b END) AS BIGINT)
                   AS p95_bin,
               CAST(min(tot) AS BIGINT) AS n
        FROM cum GROUP BY event_type
    ),
    vcum AS (
        SELECT event_type, v,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS c,
               sum(cnt) OVER (PARTITION BY event_type) AS tot
        FROM (SELECT event_type, v, count(*) AS cnt FROM vals GROUP BY 1, 2)
    ),
    exact AS (
        SELECT event_type, min(CASE WHEN c * 20 >= tot * 19 THEN v END)
                   AS p95_disc
        FROM vcum GROUP BY event_type
    )
    SELECT e.event_type, e.n, e.p95_bin,
           round((e.p95_bin + 0.5) * ({DOMAIN} / {N_BINS}), 6) AS p95_est,
           TRUE AS bin_contains_exact,
           TRUE AS within_half_bin
    FROM est e JOIN exact x ON x.event_type = e.event_type
    ORDER BY e.event_type
    """,
)
def q348_mergeable_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles from a fixed 64-bin histogram, with the error
    CONTRACT checked for real: the bin-midpoint p95 estimate must land
    within HALF a bin of the discrete (rank-rule) p95, and the exact
    discrete p95 must sit in the chosen bin (both oracle-pinned TRUE —
    the first VALUE crossing the rank threshold is provably inside the
    first BIN crossing it, so these are structural guarantees, not
    empirical luck; and unlike a
    t-digest its per-partition summaries merge by plain integer
    addition, so the 100 TB rollup is a second tiny aggregate with the
    SAME bound).  q66 is the exact path, q22/q102 the sketch paths;
    this is the provable-bound middle ground.

    Scale shape: the fact collapses to (type, bin) integer cells;
    cumulative windows run over the 64-row-per-type frame; the exact
    branch exists to price the bound and drops in production."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "value"])
    vals = e.where(F.col("value").isNotNull()).select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    width = DOMAIN / N_BINS
    binned = vals.groupBy(
        "event_type",
        F.least(
            F.lit(N_BINS - 1), F.floor(F.col("v") / width).cast("long")
        ).alias("b"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wc = Window.partitionBy("event_type").orderBy("b")
    wt = Window.partitionBy("event_type")
    cum = binned.select(
        "event_type",
        "b",
        F.sum("n").over(wc).alias("c"),
        F.sum("n").over(wt).alias("tot"),
    )
    est = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("c") * 20 >= F.col("tot") * 19, F.col("b")))
        .cast("long")
        .alias("p95_bin"),
        F.min("tot").cast("long").alias("n"),
    )
    # exact DISCRETE p95 by the same integer rank rule (first value with
    # cum·20 ≥ tot·19) — value-level cum over the distinct-value frame
    vgrp = vals.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("cnt"))
    vc = Window.partitionBy("event_type").orderBy("v")
    vt = Window.partitionBy("event_type")
    vcum = vgrp.select(
        "event_type",
        "v",
        F.sum("cnt").over(vc).alias("c"),
        F.sum("cnt").over(vt).alias("tot"),
    )
    exact = vcum.groupBy("event_type").agg(
        F.min(F.when(F.col("c") * 20 >= F.col("tot") * 19, F.col("v"))).alias(
            "p95_disc"
        )
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n",
            "p95_bin",
            F.round((F.col("p95_bin") + 0.5) * width, 6).alias("p95_est"),
            # STRUCTURAL guarantees, computed for real (oracle pins TRUE):
            # the first value crossing the rank threshold must sit in the
            # first bin crossing it, hence within half a bin of the mid
            (
                F.least(
                    F.lit(N_BINS - 1),
                    F.floor(F.col("p95_disc") / width).cast("long"),
                )
                == F.col("p95_bin")
            ).alias("bin_contains_exact"),
            # the clamped tail bin (values ≥ DOMAIN) carries no distance
            # bound — exempt it, as any histogram sketch must
            F.when(
                F.col("p95_bin") == N_BINS - 1, F.lit(True)
            )
            .otherwise(
                F.abs((F.col("p95_bin") + 0.5) * width - F.col("p95_disc"))
                <= F.lit(width / 2) + F.lit(1e-9)
            )
            .alias("within_half_bin"),
        )
        .orderBy("event_type")
    )


DUP_WINDOW_MIN = 5


@query(
    "q349_duplicate_payments",
    oracle=f"""
    WITH pay AS (
        SELECT user_id,
               CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
                   AS cents,
               ts, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    lagged AS (
        SELECT user_id, cents, ts, event_id,
               lag(ts) OVER (
                   PARTITION BY user_id, cents ORDER BY ts, event_id) AS prev_ts
        FROM pay
    ),
    flagged AS (
        SELECT user_id, cents,
               CASE WHEN prev_ts IS NOT NULL
                         AND epoch_us(ts) - epoch_us(prev_ts)
                             <= {DUP_WINDOW_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_dup
        FROM lagged
    )
    SELECT CAST(count(*) AS BIGINT) AS n_payments,
           CAST(sum(is_dup) AS BIGINT) AS n_suspect,
           CAST(count(DISTINCT CASE WHEN is_dup = 1 THEN user_id END) AS BIGINT)
               AS n_users_flagged,
           CAST(sum(CASE WHEN is_dup = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS suspect_cents
    FROM flagged
    """,
)
def q349_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-charge screen: purchases with the SAME user and SAME amount
    within 5 minutes of the previous one — the classic retry/double-
    submit fraud-ops rule (q277 catches exact duplicate order KEYS;
    this catches duplicate money movements with distinct ids).

    Scale shape: one (user, cents)-keyed window (the lag is O(1) state
    per row — no time-band self-join) on the same user partitioning the
    behavioral family reuses; amounts compare as exact integer cents."""
    e = read_table(
        spark, sf_dir, "events", columns=["event_id", "event_type", "user_id", "ts", "value"]
    )
    pay = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.round(F.col("value").cast("decimal(18,2)") * 100, 0)
        .cast("long")
        .alias("cents"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id", "cents").orderBy("ts", "event_id")
    lagged = pay.withColumn("prev_ts", F.lag("ts").over(w))
    # Exact microsecond arithmetic (unix_micros / epoch_us) — second-floor
    # unix_timestamp diverges from the oracle's fractional epoch() on gaps
    # that straddle the window boundary by sub-second amounts.
    is_dup = F.when(
        F.col("prev_ts").isNotNull()
        & (
            F.unix_micros("ts") - F.unix_micros("prev_ts")
            <= DUP_WINDOW_MIN * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    flagged = lagged.select("user_id", "cents", is_dup.alias("is_dup"))
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_payments"),
        F.sum("is_dup").cast("long").alias("n_suspect"),
        F.count_distinct(F.when(F.col("is_dup") == 1, F.col("user_id"))).alias(
            "n_users_flagged"
        ),
        F.sum(F.when(F.col("is_dup") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("suspect_cents"),
    )
