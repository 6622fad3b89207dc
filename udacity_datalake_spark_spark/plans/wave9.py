"""Wave 9: real multimodal decode — WAV audio and PPM image payloads
synthesized deterministically, decoded by genuine format parsers
(stdlib ``wave`` for RIFF/PCM, header+frombuffer for P6 PPM), with the
decoded statistics oracle-checked against closed-form integer math.

This closes the one previously-stubbed capability: the decode step is no
longer a NotImplementedError for every codec — only for formats that
genuinely require external codec libraries.  The payload bytes live only
inside the mapInPandas stage; the relational plan sees typed stats."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q193_wav_decode",
    oracle="""
    SELECT doc_id,
           8000 AS sample_rate,
           1 AS n_channels,
           CAST(256 AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(range(256),
                i -> abs((doc_id * 7919 + i * 104729) % 65536 - 32768)))
                AS BIGINT) AS sum_abs,
           CAST(list_max(list_transform(range(256),
                i -> abs((doc_id * 7919 + i * 104729) % 65536 - 32768)))
                AS INT) AS peak
    FROM documents
    """,
)
def q193_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode end-to-end: one real RIFF/WAV file per document
    (mono 16-bit PCM, written by the stdlib ``wave`` module) → real
    parse of the container and frames → integer amplitude statistics.
    The oracle recomputes the same stats from the closed-form sample
    formula, so the ENTIRE encode→decode→stats path is hash-checked.

    Scale shape: payload bytes are born and die inside two mapInPandas
    stages on the same partitioning — no shuffle ever carries media;
    only the (id, stats) rows reach the plan."""
    from udacity_datalake_spark_spark.operators.multimodal import (
        decode_media,
        synthesize_wav_payload,
    )

    d = read_table(spark, sf_dir, "documents", columns=["doc_id"])
    return decode_media(synthesize_wav_payload(d), "wav")


@query(
    "q194_ppm_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(16 + doc_id % 8 AS INT) AS width,
               CAST(8 + doc_id % 5 AS INT) AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           CAST(list_sum(list_transform(range(width * height),
                p -> (doc_id * 31 + (p * 3 + 0) * 97) % 256)) AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(range(width * height),
                p -> (doc_id * 31 + (p * 3 + 1) * 97) % 256)) AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(range(width * height),
                p -> (doc_id * 31 + (p * 3 + 2) * 97) % 256)) AS BIGINT) AS sum_b
    FROM dims
    """,
)
def q194_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode end-to-end: one real P6 PPM per document (binary
    header + raw RGB plane) → header parse, numpy frombuffer/reshape →
    per-channel integer sums, oracle-checked against the closed-form
    pixel formula.  Same no-media-on-the-exchange shape as q193."""
    from udacity_datalake_spark_spark.operators.multimodal import (
        decode_media,
        synthesize_ppm_payload,
    )

    d = read_table(spark, sf_dir, "documents", columns=["doc_id"])
    return decode_media(synthesize_ppm_payload(d), "ppm")
