"""Wave 25: audit-grade monetary-unit sampling, classical seasonal
indices (ratio-to-moving-average), and the Lorenz concentration curve —
three report families built entirely from the engine's deterministic
primitives (integer hash sampling, bounded-frame windows, two-phase
ntile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.topk import global_ntile
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

_MULT, _UNIT = 2654435761, 1 << 20  # q80's cross-engine uniform-hash idiom
_MUS_TARGET = 500  # expected sample size


@query(
    "q246_monetary_unit_sampling",
    oracle=f"""
    WITH li AS (
        SELECT l_orderkey * 8 + l_linenumber AS lid, l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS val_c,
               CAST((CAST(l_orderkey * 8 + l_linenumber AS HUGEINT) * {_MULT})
                    % {_UNIT} AS BIGINT) AS h
        FROM lineitem
    ),
    tot AS (SELECT CAST(sum(val_c) AS BIGINT) AS total_c FROM li),
    kept AS (
        SELECT l.* FROM li l CROSS JOIN tot
        WHERE CAST(h AS HUGEINT) * total_c
              < CAST({_MUS_TARGET} AS HUGEINT) * val_c * {_UNIT}
    )
    SELECT l_returnflag, count(*) AS n_sampled,
           round(CAST(sum(val_c) AS DOUBLE) / 100, 2) AS sampled_value,
           round(CAST(sum(val_c) AS DOUBLE)
                 / (SELECT total_c FROM tot), 6) AS value_share
    FROM kept GROUP BY l_returnflag
    """,
)
def q246_monetary_unit_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-unit (dollar-unit) sampling of lineitems: each line is
    selected with probability proportional to its value (target ≈ 500
    lines) — the audit-sampling standard that guarantees every
    high-value item is near-certain to be examined.

    q80's deterministic idiom at value weighting: keep iff
    h·total < target·value·2²⁰ with h a multiplicative hash of the
    unique line id — pure integer arithmetic (HUGEINT/DECIMAL(38) on
    the hash multiply AND the cross product, so no overflow at any
    SF), so the SAME lines are
    selected on rerun, on any partitioning, and in the oracle.  The
    only shuffle is the final per-flag rollup."""
    li = read_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"],
    )
    lid = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    # (lid·_MULT) mod 2²⁰ in PURE int64 (round 12, guide §1.2 per-task
    # work; VERDICT r11 #8): mod is multiplicative and lid ≥ 0, so
    # (lid % 2²⁰)·_MULT ≡ lid·_MULT (mod 2²⁰) with the product bounded
    # by 2²⁰·2.66e9 ≈ 2.8e15 < 2⁶³ — bit-identical to the former
    # DECIMAL(38,0) widening at EVERY SF (the widening only existed
    # because lid·_MULT itself wraps int64 at SF ≳ 70), without the
    # per-row decimal multiply+mod on the fact scan.
    rows = li.select(
        "l_returnflag",
        (dec("l_extendedprice") * 100).cast("long").alias("val_c"),
        ((lid % _UNIT) * _MULT % _UNIT).alias("h"),
    )
    tot = rows.agg(F.sum("val_c").alias("total_c"))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # filter sides (round 12): h·total_c MUST stay DECIMAL(38) — total_c
    # is an unbounded corpus sum (≈6e18 already at SF 1e5, × 2²⁰ wraps
    # int64).  The target side is provably int64: TPC-H extendedprice
    # ≤ 50·max(p_retailprice) < 105 000 at any SF, so val_c ≤ 1.05e7 and
    # _MUS_TARGET·_UNIT·val_c ≤ 5.3e8 · 1.05e7 ≈ 5.5e15 < 2⁶³ — one long
    # multiply per row plus a widening cast at the compare, instead of
    # two per-row decimal multiplies.
    kept = rows.crossJoin(F.broadcast(tot)).where(
        d38(F.col("h")) * F.col("total_c")
        < F.lit(_MUS_TARGET * _UNIT) * F.col("val_c")
    )
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("val_c").cast("double") / 100, 2).alias("sampled_value"),
        F.round(
            F.sum("val_c").cast("double") / F.max("total_c"), 6
        ).alias("value_share"),
    )


@query(
    "q247_seasonal_indices",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
        FROM events WHERE event_type = 'purchase' GROUP BY day
    ),
    ma AS (
        SELECT day, rev_c,
               CAST(sum(rev_c) OVER (ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS ma_c,
               count(*) OVER (ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
        FROM daily
    ),
    ratios AS (
        SELECT isodow(day) AS weekday_iso,
               CAST(round(7.0 * rev_c / ma_c, 6) AS DECIMAL(18,6)) AS ratio
        FROM ma WHERE w = 7
    )
    SELECT weekday_iso, count(*) AS n_days,
           round(CAST(sum(ratio) AS DOUBLE) / count(*), 6) AS seasonal_index
    FROM ratios GROUP BY weekday_iso
    """,
)
def q247_seasonal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ratio-to-moving-average weekday seasonality: each day's
    revenue divided by its centered 7-day moving average, averaged per
    ISO weekday — the decomposition-method seasonal index (q204's EWMA
    smooths; this EXTRACTS the weekly shape).

    Daily cents are exact int64; the centered MA is a 7-row window over
    the day-bounded frame with edges excluded by the window count; each
    ratio is one double division (7·rev/ma from exact ints) rounded to
    DECIMAL before the exact per-weekday average."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg((F.sum(dec("value")) * 100).cast("long").alias("rev_c"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "rev_c",
        F.sum("rev_c").over(w).alias("ma_c"),
        F.count(F.lit(1)).over(w).alias("w"),
    )
    ratios = ma.where(F.col("w") == 7).select(
        (F.weekday("day") + 1).cast("long").alias("weekday_iso"),
        F.round(F.lit(7.0) * F.col("rev_c") / F.col("ma_c"), 6)
        .cast("decimal(18,6)")
        .alias("ratio"),
    )
    return ratios.groupBy("weekday_iso").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.sum("ratio").cast("double") / F.count(F.lit(1)), 6).alias(
            "seasonal_index"
        ),
    )


@query(
    "q248_lorenz_curve",
    oracle="""
    WITH ltv AS (
        SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    tiled AS (
        SELECT v, ntile(10) OVER (ORDER BY v, user_id) AS decile FROM ltv
    ),
    per AS (
        SELECT decile, count(*) AS n_users, sum(v) AS dv FROM tiled GROUP BY decile
    ),
    tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS tn, sum(dv) AS tv FROM per)
    SELECT decile,
           round(CAST(sum(n_users) OVER (ORDER BY decile
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / tn, 6)
               AS cum_pop_share,
           round(CAST(sum(dv) OVER (ORDER BY decile
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(tv AS DOUBLE), 6) AS cum_value_share
    FROM per CROSS JOIN tot
    """,
)
def q248_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of purchaser value concentration: cumulative
    population share vs cumulative value share at each ascending-value
    decile — the curve whose area gap IS q152's Gini, as a plottable
    10-point artifact (q206 reads the same data top-down as a gains
    table).

    Deciles come from global_ntile (two-phase, no single-partition
    user-dimension sort); the cumulative window then runs over the
    10-row decile frame with DECIMAL-exact value sums."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "event_type", "value"])
    ltv = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(dec("value")).alias("v"))
    )
    keyed = ltv.withColumn("__vd", F.col("v").cast("double"))
    tiled = global_ntile(
        keyed, [F.col("v"), F.col("user_id")], "__vd", 10, out_col="decile"
    ).drop("__vd")
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("v").alias("dv")
    )
    tot = per.agg(F.sum("n_users").alias("tn"), F.sum("dv").alias("tv"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per.crossJoin(F.broadcast(tot)).select(
        "decile",
        F.round(F.sum("n_users").over(w).cast("double") / F.col("tn"), 6).alias(
            "cum_pop_share"
        ),
        F.round(
            F.sum("dv").over(w).cast("double") / F.col("tv").cast("double"), 6
        ).alias("cum_value_share"),
    )
