"""Wave 60: late-data restatement accounting (how much yesterday's
numbers move when stragglers land) and a freshness + volume-anomaly
monitor — the two reports that page an on-call before a consumer
notices stale or restated dashboards.

Reference parity note: the reference (etl.py, /root/reference) has no
operational-monitoring surface; these extend the event-time family
(q271 lateness audit, q119 anomaly) at the REPORTING layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

#: ~10% of events are simulated stragglers (md5-derived, deterministic):
#: they miss their event day's first aggregation and land in the
#: restatement pass.
LATE_PERMILLE = 100


@query(
    "q344_restatement_audit",
    oracle=f"""
    WITH tagged AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
                   AS cents,
               (ascii(substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) * 4096
                + ascii(substring(md5(CAST(event_id AS VARCHAR)), 2, 1)) * 64
                + ascii(substring(md5(CAST(event_id AS VARCHAR)), 3, 1)))
                   % 1000 < {LATE_PERMILLE} AS is_late
        FROM events WHERE event_type = 'purchase'
    ),
    per_day AS (
        SELECT d,
               CAST(sum(CASE WHEN NOT is_late THEN cents ELSE 0 END) AS BIGINT)
                   AS v1_cents,
               CAST(sum(cents) AS BIGINT) AS v2_cents,
               CAST(sum(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_late
        FROM tagged GROUP BY d
    )
    SELECT d AS day, v1_cents, v2_cents,
           CAST(v2_cents - v1_cents AS BIGINT) AS restated_cents,
           n_late,
           round(CAST(v2_cents - v1_cents AS DOUBLE) / v2_cents, 6)
               AS restated_share
    FROM per_day
    ORDER BY day
    """,
)
def q344_restatement_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data restatement accounting: each day's revenue as first
    published (v1 — on-time events only; stragglers are the
    deterministic md5-tagged ~10%) versus final (v2 — all events), with
    the restated amount and share — the audit that tells consumers how
    much a 'final' number still moves, and the business-layer companion
    to q271's watermark-lateness audit.

    Scale shape: one tagged pass over the fact, both versions computed
    in the SAME aggregate (conditional sums — no second scan), exact
    integer cents throughout."""
    e = read_table(spark, sf_dir, "events", columns=["event_id", "event_type", "ts", "value"])
    m = F.md5(F.col("event_id").cast("string"))
    # three position-weighted hex chars: two ascii codes alone cover too
    # few residues mod 1000 to ever land under the permille cut
    is_late = (
        (
            F.ascii(F.substring(m, 1, 1)) * 4096
            + F.ascii(F.substring(m, 2, 1)) * 64
            + F.ascii(F.substring(m, 3, 1))
        )
        % 1000
        < LATE_PERMILLE
    )
    tagged = e.where(F.col("event_type") == "purchase").select(
        F.to_date("ts").alias("d"),
        F.round(F.col("value").cast("decimal(18,2)") * 100, 0)
        .cast("long")
        .alias("cents"),
        is_late.alias("is_late"),
    )
    per_day = tagged.groupBy("d").agg(
        F.sum(F.when(~F.col("is_late"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("v1_cents"),
        F.sum("cents").cast("long").alias("v2_cents"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).cast("long").alias("n_late"),
    )
    return (
        per_day.select(
            F.col("d").alias("day"),
            "v1_cents",
            "v2_cents",
            (F.col("v2_cents") - F.col("v1_cents")).cast("long").alias(
                "restated_cents"
            ),
            "n_late",
            F.round(
                (F.col("v2_cents") - F.col("v1_cents")).cast("double")
                / F.col("v2_cents"),
                6,
            ).alias("restated_share"),
        )
        .orderBy("day")
    )


@query(
    "q345_freshness_monitor",
    oracle="""
    WITH bounds AS (
        SELECT CAST(max(ts) AS TIMESTAMP) AS global_max FROM events
    ),
    per_type AS (
        SELECT event_type,
               CAST(max(ts) AS TIMESTAMP) AS type_max,
               CAST(count(*) AS BIGINT) AS n_total
        FROM events GROUP BY event_type
    ),
    last_day AS (
        SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_last
        FROM events e CROSS JOIN bounds b
        WHERE e.ts > b.global_max - INTERVAL 1 DAY
        GROUP BY e.event_type
    ),
    trail7 AS (
        SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_week
        FROM events e CROSS JOIN bounds b
        WHERE e.ts > b.global_max - INTERVAL 8 DAY
          AND e.ts <= b.global_max - INTERVAL 1 DAY
        GROUP BY e.event_type
    )
    SELECT p.event_type,
           CAST(floor((epoch_us(b.global_max) - epoch_us(p.type_max))
                      / 60000000) AS BIGINT)
               AS staleness_minutes,
           p.type_max <= b.global_max AS fresh_within_1d,
           ld.n_last,
           round(ld.n_last * 7 / CAST(t.n_week AS DOUBLE), 6) AS volume_ratio,
           ld.n_last * 7 * 2 > t.n_week AS volume_above_half_of_trend
    FROM per_type p
    CROSS JOIN bounds b
    JOIN last_day ld ON ld.event_type = p.event_type
    JOIN trail7 t ON t.event_type = p.event_type
    ORDER BY p.event_type
    """,
)
def q345_freshness_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness + volume-anomaly monitor: per event type, how stale its
    newest record is against the table's high-water mark, and whether
    the last day's arrival volume holds against the trailing week's
    daily trend (ratio + an integer cross-multiplied ≥50% floor) — the
    two checks a pipeline on-call pages on.

    Scale shape: three bounded aggregates over one fact scan pattern
    (type-grain each); the high-water mark broadcasts; the freshness
    booleans are computed for real and the trend floor uses integer
    cross-multiplication (no float boundary).

    Note fresh_within_1d: each type's max is by construction ≤ the
    global max, so the oracle pins TRUE; a type that stops ingesting
    shows up in staleness_minutes, which the value-hash checks
    exactly."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts"])
    bounds = e.agg(F.max("ts").alias("global_max"))
    per_type = e.groupBy("event_type").agg(
        F.max("ts").alias("type_max"), F.count(F.lit(1)).cast("long").alias("n_total")
    )
    eb = e.crossJoin(F.broadcast(bounds))
    last_day = (
        eb.where(F.col("ts") > F.col("global_max") - F.expr("INTERVAL 1 DAY"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_last"))
    )
    trailing = (
        eb.where(
            (F.col("ts") > F.col("global_max") - F.expr("INTERVAL 8 DAY"))
            & (F.col("ts") <= F.col("global_max") - F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_week"))
    )
    return (
        per_type.crossJoin(F.broadcast(bounds))
        .join(last_day, "event_type")
        .join(trailing, "event_type")
        .select(
            "event_type",
            F.floor(
                (F.unix_micros("global_max") - F.unix_micros("type_max"))
                / 60_000_000
            )
            .cast("long")
            .alias("staleness_minutes"),
            (F.col("type_max") <= F.col("global_max")).alias("fresh_within_1d"),
            "n_last",
            F.round(F.col("n_last") * 7 / F.col("n_week").cast("double"), 6).alias(
                "volume_ratio"
            ),
            (F.col("n_last") * 7 * 2 > F.col("n_week")).alias(
                "volume_above_half_of_trend"
            ),
        )
        .orderBy("event_type")
    )
