"""Wave 70: statistical estimation depth — capture-recapture population
estimate, Spearman rank correlation per group, Brier score (Murphy)
decomposition, and queueing (M/M/1-lite) utilization from the event
stream.

Reference parity note: the reference (/root/reference/etl.py) has no
statistical surface; these extend the sketch family (q367), the
correlation family (q128/q238 partial correlation), classifier eval
(q226/q270), and the ops-metrics family (q271/q345).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q385_capture_recapture",
    oracle="""
    WITH bounds AS (SELECT min(ts) AS t0, max(ts) AS t1 FROM events),
    a AS (
        SELECT DISTINCT user_id FROM events CROSS JOIN bounds
        WHERE epoch_us(ts) < epoch_us(t0)
              + (epoch_us(t1) - epoch_us(t0)) / 2
    ),
    b AS (
        SELECT DISTINCT user_id FROM events CROSS JOIN bounds
        WHERE epoch_us(ts) >= epoch_us(t0)
              + (epoch_us(t1) - epoch_us(t0)) / 2
    ),
    counts AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS na,
               (SELECT CAST(count(*) AS BIGINT) FROM b) AS nb,
               (SELECT CAST(count(*) AS BIGINT)
                FROM a JOIN b ON b.user_id = a.user_id) AS nboth,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
                   AS n_true
    )
    SELECT na AS n_first_window, nb AS n_second_window,
           nboth AS n_recaptured, n_true AS n_observed_total,
           CAST(na * nb // nboth AS BIGINT) AS lincoln_petersen_estimate,
           na * nb // nboth >= n_true AS estimate_at_least_observed
    FROM counts
    """,
)
def q385_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Lincoln-Petersen) population estimate: split
    the observation span in half, treat each half's distinct users as a
    capture sample, and estimate the TOTAL population as |A|·|B|/|A∩B|
    — the ecology/epidemiology estimator a telemetry team uses to size
    the users its sampling MISSES (the estimate exceeding the observed
    distinct count measures unseen mass; under-coverage of rare users
    is exactly what q22's sketches can't tell you).  Integer floor
    division keeps the estimate exact on both engines.

    Scale shape: two distinct sets from one scan each (half-span
    predicates), one overlap join, all collapsing to a single row."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    bounds = e.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    mid = F.unix_micros("t0") + (F.unix_micros("t1") - F.unix_micros("t0")) / 2
    eb = e.crossJoin(F.broadcast(bounds))
    a = eb.where(F.unix_micros("ts") < mid).select("user_id").distinct()
    b = eb.where(F.unix_micros("ts") >= mid).select("user_id").distinct()
    counts = (
        a.agg(F.count(F.lit(1)).cast("long").alias("na"))
        .crossJoin(F.broadcast(b.agg(F.count(F.lit(1)).cast("long").alias("nb"))))
        .crossJoin(
            F.broadcast(
                a.join(b, "user_id").agg(
                    F.count(F.lit(1)).cast("long").alias("nboth")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                e.agg(F.count_distinct("user_id").cast("long").alias("n_true"))
            )
        )
    )
    est = F.floor(F.col("na") * F.col("nb") / F.col("nboth")).cast("long")
    return counts.select(
        F.col("na").alias("n_first_window"),
        F.col("nb").alias("n_second_window"),
        F.col("nboth").alias("n_recaptured"),
        F.col("n_true").alias("n_observed_total"),
        est.alias("lincoln_petersen_estimate"),
        (est >= F.col("n_true")).alias("estimate_at_least_observed"),
    )


@query(
    "q386_spearman_correlation",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag AS grp,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY CAST(l_quantity AS DOUBLE), l_orderkey,
                            l_linenumber, l_partkey) AS rx,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY CAST(l_extendedprice AS DOUBLE), l_orderkey,
                            l_linenumber, l_partkey) AS ry
        FROM lineitem
    ),
    sums AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               sum(CAST(rx AS HUGEINT) * ry) AS sxy,
               sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
               sum(CAST(rx AS HUGEINT) * rx) AS sxx,
               sum(CAST(ry AS HUGEINT) * ry) AS syy
        FROM ranked GROUP BY grp
    )
    SELECT grp, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
               AS spearman_rho
    FROM sums
    """,
)
def q386_spearman_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price per
    return flag — the monotone-association measure robust to outliers
    and nonlinearity (q128's Pearson sees only linear association):
    Pearson over the two within-group rank sequences, with a
    total-order tie-break so both engines rank identically.  Rank power
    sums widen to DECIMAL(38)/HUGEINT; one closed-form double per
    group.

    Scale shape: two key-partitioned rank windows on one group
    exchange, then the q128 power-sum recipe at group grain."""
    li = read_table(
        spark,
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
        ],
    )
    tie = [F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_partkey")]
    wx = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").cast("double"), *tie
    )
    wy = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").cast("double"), *tie
    )
    ranked = li.select(
        F.col("l_returnflag").alias("grp"),
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")
    sums = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d38("rx") * F.col("ry")).alias("sxy"),
        F.sum(d38("rx")).alias("sx"),
        F.sum(d38("ry")).alias("sy"),
        F.sum(d38("rx") * F.col("rx")).alias("sxx"),
        F.sum(d38("ry") * F.col("ry")).alias("syy"),
    )
    return sums.select(
        "grp",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            6,
        ).alias("spearman_rho"),
    )


N_BRIER_BINS = 10


@query(
    "q387_brier_decomposition",
    oracle=f"""
    WITH scored AS (
        -- deterministic pseudo-classifier: hashed score in [0,1),
        -- outcome = did the customer place >3 orders (base-rate label)
        SELECT c.c_custkey,
               (ascii(substring(md5(CAST(c.c_custkey AS VARCHAR)), 1, 1)) * 47
                + ascii(substring(md5(CAST(c.c_custkey AS VARCHAR)), 2, 1)))
                   % 100 AS score_pct,
               CASE WHEN COALESCE(o.n, 0) > 3 THEN 1 ELSE 0 END AS y
        FROM customer c
        LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
          ON o.o_custkey = c.c_custkey
    ),
    binned AS (
        SELECT LEAST(score_pct * {N_BRIER_BINS} // 100, {N_BRIER_BINS} - 1)
                   AS bin,
               score_pct, y
        FROM scored
    ),
    per_bin AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
               CAST(sum(score_pct) AS BIGINT) AS sp,
               CAST(sum(y) AS BIGINT) AS sy
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT CAST(sum(n_k) AS BIGINT) AS n, CAST(sum(sy) AS BIGINT) AS y_tot
        FROM per_bin
    )
    SELECT CAST(b.bin AS BIGINT) AS bin, b.n_k,
           round(CAST(b.sp AS DOUBLE) / b.n_k / 100, 6) AS mean_score,
           round(CAST(b.sy AS DOUBLE) / b.n_k, 6) AS event_rate,
           -- reliability term n_k*(mean_score - rate)^2 and resolution
           -- term n_k*(rate - base_rate)^2, both per bin
           round(b.n_k * (CAST(b.sp AS DOUBLE) / b.n_k / 100
                          - CAST(b.sy AS DOUBLE) / b.n_k)
                       * (CAST(b.sp AS DOUBLE) / b.n_k / 100
                          - CAST(b.sy AS DOUBLE) / b.n_k) / t.n, 6)
               AS reliability_term,
           round(b.n_k * (CAST(b.sy AS DOUBLE) / b.n_k
                          - CAST(t.y_tot AS DOUBLE) / t.n)
                       * (CAST(b.sy AS DOUBLE) / b.n_k
                          - CAST(t.y_tot AS DOUBLE) / t.n) / t.n, 6)
               AS resolution_term
    FROM per_bin b CROSS JOIN tot t
    """,
)
def q387_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (reliability −
    resolution + uncertainty) for a deterministic pseudo-classifier —
    the calibration diagnostic past q270's PR curve: per score decile,
    how far the mean predicted probability sits from the observed event
    rate (reliability: lower is better) and how far the bin's event
    rate departs from the base rate (resolution: higher is better).
    The score is the md5-ascii hash in [0,1) (the cross-engine
    deterministic stand-in for a model output); the outcome is a real
    label (customer placed >3 orders).

    Scale shape: one bounded bin-grain aggregate over the
    customer⋈order-count join; the decomposition terms are closed-form
    per bin."""
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey"])
    o = read_table(spark, sf_dir, "orders", columns=["o_custkey"])
    ocnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    h = F.md5(F.col("c_custkey").cast("string"))
    score_pct = (
        F.ascii(F.substring(h, 1, 1)) * 47 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    scored = (
        c.join(F.broadcast(ocnt), c.c_custkey == ocnt.o_custkey, "left")
        .select(
            score_pct.alias("score_pct"),
            F.when(F.coalesce(F.col("n"), F.lit(0)) > 3, 1).otherwise(0).alias("y"),
        )
    )
    binned = scored.select(
        F.least(
            (F.col("score_pct") * N_BRIER_BINS / 100).cast("long"),
            F.lit(N_BRIER_BINS - 1),
        ).alias("bin"),
        "score_pct",
        "y",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum("score_pct").cast("long").alias("sp"),
        F.sum("y").cast("long").alias("sy"),
    )
    tot = per_bin.agg(
        F.sum("n_k").cast("long").alias("n"), F.sum("sy").cast("long").alias("y_tot")
    )
    mean_score = F.col("sp").cast("double") / F.col("n_k") / 100
    rate = F.col("sy").cast("double") / F.col("n_k")
    base = F.col("y_tot").cast("double") / F.col("n")
    return per_bin.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        "n_k",
        F.round(mean_score, 6).alias("mean_score"),
        F.round(rate, 6).alias("event_rate"),
        F.round(
            F.col("n_k") * (mean_score - rate) * (mean_score - rate) / F.col("n"), 6
        ).alias("reliability_term"),
        F.round(
            F.col("n_k") * (rate - base) * (rate - base) / F.col("n"), 6
        ).alias("resolution_term"),
    )


@query(
    "q388_queueing_utilization",
    oracle="""
    WITH arr AS (
        SELECT event_type,
               epoch_us(ts) AS t,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS t_prev
        FROM events
    ),
    gaps AS (
        SELECT event_type, t - t_prev AS gap_us
        FROM arr WHERE t_prev IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(gap_us) AS BIGINT) AS span_us,
           round(count(*) * 1000000.0 / sum(gap_us), 6) AS arrivals_per_sec,
           -- M/M/1 with a fixed 100ms service time: rho = lambda * s
           round(count(*) * 100000.0 / sum(gap_us), 6) AS utilization,
           count(*) * 100000 < sum(gap_us) AS stable,
           -- squared coefficient of variation of inter-arrival gaps:
           -- >1 = burstier than Poisson (the Kingman-correction input)
           round((CAST(count(*) AS DOUBLE)
                  * sum(CAST(gap_us AS HUGEINT) * gap_us)
                  / sum(gap_us) / sum(gap_us)) - 1, 6) AS cv2_minus_warn
    FROM gaps
    GROUP BY event_type
    """,
)
def q388_queueing_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queueing-theory capacity check from the raw event stream: per
    event type, the arrival rate λ, the M/M/1 utilization ρ = λ·s for a
    fixed 100 ms service budget, a stability verdict (ρ < 1 as exact
    integer cross-multiplication), and the squared coefficient of
    variation of inter-arrival gaps (CV² > 1 = burstier than Poisson —
    the input to Kingman's waiting-time correction).  The capacity-
    planning pre-check before any latency SLO is promised.

    Scale shape: one type-keyed lag window (O(1) state per row), exact
    integer microsecond gaps, HUGEINT/DECIMAL(38) squared sums, bounded
    type-grain output."""
    e = read_table(spark, sf_dir, "events", columns=["event_id", "event_type", "ts"])
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "event_type",
            F.unix_micros("ts").alias("t"),
            F.lag(F.unix_micros("ts")).over(w).alias("t_prev"),
        )
        .where(F.col("t_prev").isNotNull())
        .select("event_type", (F.col("t") - F.col("t_prev")).alias("gap_us"))
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("span_us"),
        F.round(F.count(F.lit(1)) * 1000000.0 / F.sum("gap_us"), 6).alias(
            "arrivals_per_sec"
        ),
        F.round(F.count(F.lit(1)) * 100000.0 / F.sum("gap_us"), 6).alias(
            "utilization"
        ),
        (F.count(F.lit(1)) * 100000 < F.sum("gap_us")).alias("stable"),
        F.round(
            (
                F.count(F.lit(1)).cast("double")
                * F.sum(F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us")).cast(
                    "double"
                )
                / F.sum("gap_us")
                / F.sum("gap_us")
            )
            - 1,
            6,
        ).alias("cv2_minus_warn"),
    )
