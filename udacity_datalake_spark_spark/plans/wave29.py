"""Wave 29: multimodal frame/tile feature extraction (audio
voice-activity frames, image quadrant luminance) and the weekday×hour
revenue heatmap — widening the media pipeline beyond whole-file stats
to the windowed/tiled features real speech and vision curation uses.

Both media queries keep the engine's multimodal contract: payload bytes
are born and die inside Arrow-batched mapInPandas stages, the oracle
recomputes the integer statistics from the closed-form synthetic sample
and pixel formulas, so the full encode→decode→feature path hash-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.multimodal import (
    audio_frame_energy,
    image_quadrant_stats,
    synthesize_ppm_payload,
    synthesize_wav_payload,
)
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q261_audio_frame_energy",
    oracle="""
    WITH fr AS (
        SELECT doc_id,
               list_transform(range(8), f ->
                   list_sum(list_transform(range(32), i ->
                       abs((doc_id * 7919 + (f * 32 + i) * 104729) % 65536
                           - 32768)))) AS sums
        FROM documents
    )
    SELECT doc_id,
           8 AS n_frames,
           CAST(len(list_filter(sums, s -> s > 32 * 18000)) AS INT) AS n_voiced,
           CAST(list_max(sums) AS BIGINT) AS peak_frame_energy
    FROM fr
    """,
)
def q261_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity framing over real WAV audio: each document's
    256-sample PCM stream splits into 32-sample frames; report voiced
    frames (Σ|sample| above threshold) and the loudest frame — the
    pre-transcription VAD pass of a speech-data pipeline.

    `operators.multimodal.audio_frame_energy`: RIFF parse + one numpy
    reshape per file inside Arrow-batched mapInPandas; the oracle
    recomputes every frame sum from the closed-form sample formula, so
    framing arithmetic is hash-checked end-to-end."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id"])
    return audio_frame_energy(synthesize_wav_payload(d))


@query(
    "q262_image_quadrants",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(16 + doc_id % 8 AS INT) AS width,
               CAST(8 + doc_id % 5 AS INT) AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           CAST(list_sum(list_transform(range(width * height), p ->
               CASE WHEN (p % width) < width // 2 AND (p // width) < height // 2
                    THEN (doc_id * 31 + (p * 3 + 0) * 97) % 256
                         + (doc_id * 31 + (p * 3 + 1) * 97) % 256
                         + (doc_id * 31 + (p * 3 + 2) * 97) % 256
                    ELSE 0 END)) AS BIGINT) AS luma_tl,
           CAST(list_sum(list_transform(range(width * height), p ->
               CASE WHEN (p % width) >= width // 2 AND (p // width) < height // 2
                    THEN (doc_id * 31 + (p * 3 + 0) * 97) % 256
                         + (doc_id * 31 + (p * 3 + 1) * 97) % 256
                         + (doc_id * 31 + (p * 3 + 2) * 97) % 256
                    ELSE 0 END)) AS BIGINT) AS luma_tr,
           CAST(list_sum(list_transform(range(width * height), p ->
               CASE WHEN (p % width) < width // 2 AND (p // width) >= height // 2
                    THEN (doc_id * 31 + (p * 3 + 0) * 97) % 256
                         + (doc_id * 31 + (p * 3 + 1) * 97) % 256
                         + (doc_id * 31 + (p * 3 + 2) * 97) % 256
                    ELSE 0 END)) AS BIGINT) AS luma_bl,
           CAST(list_sum(list_transform(range(width * height), p ->
               CASE WHEN (p % width) >= width // 2 AND (p // width) >= height // 2
                    THEN (doc_id * 31 + (p * 3 + 0) * 97) % 256
                         + (doc_id * 31 + (p * 3 + 1) * 97) % 256
                         + (doc_id * 31 + (p * 3 + 2) * 97) % 256
                    ELSE 0 END)) AS BIGINT) AS luma_br
    FROM dims
    """,
)
def q262_image_quadrants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrant luminance map of real P6 PPM images: Σ(r+g+b) for each
    of the four width//2 × height//2 tiles — the tiled brightness
    feature behind letterbox/watermark detection and thumbnail scoring.

    `operators.multimodal.image_quadrant_stats`: P6 parse + numpy slice
    sums per file in one Arrow-batched stage; the oracle recomputes the
    tile sums from the closed-form pixel formula with integer
    position arithmetic (p % width, p // width), so tiling geometry is
    hash-checked, not just totals."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id"])
    return image_quadrant_stats(synthesize_ppm_payload(d))


@query(
    "q263_weekday_hour_heatmap",
    oracle="""
    WITH cell AS (
        SELECT isodow(ts) AS weekday_iso, CAST(hour(ts) AS INT) AS hour_of_day,
               count(*) AS n_events,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2)) END) AS rev
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT sum(rev) AS tr FROM cell)
    SELECT weekday_iso, hour_of_day, n_events,
           round(CAST(coalesce(rev, 0) AS DOUBLE), 2) AS revenue,
           round(CAST(coalesce(rev, 0) AS DOUBLE) / CAST(tr AS DOUBLE), 6)
               AS revenue_share
    FROM cell CROSS JOIN tot
    """,
)
def q263_weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap: event counts and purchase
    revenue share per (ISO weekday, hour) cell — the 7×24 calendar
    matrix every traffic dashboard leads with (and the 2-D companion to
    q247's weekday indices).

    One calendar-bounded aggregate (≤168 cells at any scale), DECIMAL-
    exact revenue, broadcast total for the share column."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    cell = e.groupBy(
        (F.weekday("ts") + 1).cast("long").alias("weekday_iso"),
        F.hour("ts").alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", dec("value"))).alias("rev"),
    )
    tot = cell.agg(F.sum("rev").alias("tr"))
    z = F.lit(0)
    return cell.crossJoin(F.broadcast(tot)).select(
        "weekday_iso",
        "hour_of_day",
        "n_events",
        F.round(F.coalesce(F.col("rev"), z).cast("double"), 2).alias("revenue"),
        F.round(
            F.coalesce(F.col("rev"), z).cast("double") / F.col("tr").cast("double"), 6
        ).alias("revenue_share"),
    )
