"""Wave 49: BMP container decode (third image format cross-checking the
PPM/PNG pixel formula), ingest admission caps (per-user-per-day quota
enforcement), and common-neighbor link prediction over the co-supply
graph (the classic candidate-scoring primitive for graph-based
recommendation / near-dup edge completion).

Reference parity note: the reference (etl.py, /root/reference) has none
of these; they extend the multimodal (q193/q194/q302), event-time
(q135/q136), and graph (q212/q217/q229) families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.topk import ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import COSUPPLY_EDGES_SQL, cosupply_edges
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q317_bmp_decode",
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
def q317_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BMP container decode over synthesized 24-bit BI_RGB payloads
    (cites /root/reference/etl.py — no multimodal surface to mirror; this
    extends q193/q194/q302's codec family): the encoder writes genuine
    BMP files (file + info headers, bottom-up BGR rows, 4-byte stride
    padding) from q194's pixel formula, and ``decode_media('bmp')``
    must undo the row reversal, channel swap and padding to reproduce
    the SAME closed-form per-channel sums the PPM and PNG paths are
    oracle-checked against — three independent containers, one pixel
    truth.

    Scale shape: synth and decode are one Arrow-batched mapInPandas
    stage each (payload bytes never shuffle); the oracle is closed-form
    per doc, so the whole pipeline is value-checked end-to-end."""
    from udacity_datalake_spark_spark.operators.multimodal import (
        decode_media,
        synthesize_bmp_payload,
    )

    d = read_table(spark, sf_dir, "documents", columns=["doc_id"])
    return decode_media(synthesize_bmp_payload(d), "bmp").select(
        "doc_id", "width", "height", "sum_r", "sum_g", "sum_b"
    )


ADMIT_CAP = 5


@query(
    "q318_admission_caps",
    oracle=f"""
    WITH ranked AS (
        SELECT event_type, user_id,
               row_number() OVER (
                   PARTITION BY user_id, date_trunc('day', ts)
                   ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN rn <= {ADMIT_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_admitted,
           CAST(sum(CASE WHEN rn > {ADMIT_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           CAST(count(DISTINCT CASE WHEN rn > {ADMIT_CAP} THEN user_id END)
                AS BIGINT) AS n_throttled_users
    FROM ranked
    GROUP BY event_type
    """,
)
def q318_admission_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest admission control: each user admits at most {CAP} events
    per calendar day (fixed-window quota — the deterministic batch twin of
    an ingest-edge rate limiter), ordered by (ts, event_id) so admission
    is reproducible; the report prices the policy per event type —
    dropped volume and how many users ever hit the throttle.

    Scale shape: ONE (user, day)-keyed window (per-key state is a
    single counter) on the same exchange the per-user analytics family
    (q65/q129/q135) reuses; the rollup is event-type-grain.  A hot user
    is bounded by construction — that is the point of the operator."""
    e = read_table(
        spark, sf_dir, "events", columns=["event_id", "event_type", "user_id", "ts"]
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", F.date_trunc("day", "ts")).orderBy(
            "ts", "event_id"
        )
    )
    return (
        e.withColumn("rn", rn)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("rn") <= ADMIT_CAP, 1).otherwise(0))
            .cast("long")
            .alias("n_admitted"),
            F.sum(F.when(F.col("rn") > ADMIT_CAP, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.count_distinct(
                F.when(F.col("rn") > ADMIT_CAP, F.col("user_id"))
            ).alias("n_throttled_users"),
        )
    )


@query(
    "q319_link_prediction",
    oracle=f"""
    WITH {COSUPPLY_EDGES_SQL},
    und AS (
        SELECT u, w FROM edges UNION ALL SELECT w, u FROM edges
    ),
    cand AS (
        SELECT a.u AS x, b.w AS y, count(*) AS n_common
        FROM und a JOIN und b ON b.u = a.w
        WHERE a.u < b.w
        GROUP BY 1, 2
    ),
    non_edges AS (
        SELECT c.x, c.y, c.n_common
        FROM cand c LEFT JOIN edges e ON e.u = c.x AND e.w = c.y
        WHERE e.u IS NULL
    ),
    top AS (
        SELECT x, y, CAST(n_common AS BIGINT) AS n_common,
               row_number() OVER (ORDER BY n_common DESC, x, y) AS rn
        FROM non_edges
    )
    SELECT x, y, n_common, CAST(rn AS INT) AS rn
    FROM top WHERE rn <= 20
    """,
)
def q319_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the supplier co-supply graph:
    the top-20 NON-adjacent supplier pairs ranked by shared-neighbor
    count — the classic candidate generator for graph completion (and
    the same score q229's item recommender thresholds).

    Scale shape: the wedge self-join's fan-out is Σ deg² (the q212
    analysis; degree orientation is the documented refinement for
    power-law graphs), candidates collapse map-side into (x, y) counts
    before one pair-keyed exchange, the existing-edge anti-join is
    edge-sized, and the top-20 plans as TakeOrderedAndProject via
    ranked_topk — no global sort."""
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    und = edges.select("u", "w").unionAll(
        edges.select(F.col("w").alias("u"), F.col("u").alias("w"))
    )
    # wedge join keyed on the CENTER node from both sides: a wedge
    # x–m–y is two und rows (m, x) and (m, y) sharing first column m,
    # so both join inputs are the SAME projection of und keyed the same
    # way and Catalyst's ReuseExchange ships und through ONE shuffle
    # instead of two (the previous b.u == a.w form keyed one side by w
    # and the other by u — two full exchanges of the mirrored edge
    # list; round 11, guide §2.4 "two operations keyed the same way can
    # share one exchange").  Row-for-row identical candidates: (m, x),
    # (m, y) with x < y ⟺ the old (x, m), (m, y) with x < y.
    a = und.select(F.col("u").alias("m"), F.col("w").alias("x"))
    b = und.select(F.col("u").alias("m"), F.col("w").alias("y"))
    cand = (
        a.join(b, "m")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    non_edges = cand.join(
        edges.select(F.col("u").alias("x"), F.col("w").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    return ranked_topk(
        non_edges.select(
            "x", "y", F.col("n_common").cast("long").alias("n_common")
        ),
        [F.col("n_common").desc(), F.col("x"), F.col("y")],
        20,
        rank_col="rn",
    )
