"""Wave 7: null-safe join semantics, scalable sequence-gap auditing, and
curriculum phase assignment — three more §2.8 extension shapes.

The gap audit is the interesting one at scale: "lead() over the whole id
space" is a single-partition sort, so the engine version buckets the id
space, finds within-bucket gaps with a bucket-partitioned window, and
stitches bucket boundaries through a bucket-summary frame that is
thousands of rows at any data size.  The oracle states the naive global
formulation; both produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q187_null_safe_join",
    oracle="""
    WITH keyed AS (
        SELECT CASE WHEN user_id % 10 = 0 THEN NULL
                    ELSE user_id % 100 END AS k,
               value
        FROM events
    ),
    agg AS (
        SELECT k, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_value
        FROM keyed GROUP BY k
    )
    SELECT a.k AS key, a.n AS n_left, b.n AS n_right
    FROM agg a JOIN agg b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q187_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantics a
    dimension with an explicit "unknown" bucket needs (a plain ``=``
    join makes unknown-keyed facts vanish without an error).

    Nulls are injected deterministically (every 10th user) so the NULL
    row is exercised on both sides.  Spark plans ``<=>`` as an ordinary
    hash equi-join — null-safe equality is still hashable — so the scale
    shape is identical to any key join; the aggregate-first shape keeps
    the join input at group cardinality."""
    e = read_table(spark, sf_dir, "events", columns=["user_id", "value"])
    from udacity_datalake_spark_spark.functions.numeric import dec

    k = F.when(F.pmod("user_id", F.lit(10)) == 0, F.lit(None)).otherwise(
        F.pmod("user_id", F.lit(100))
    )
    agg = (
        e.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )
    a = agg.select(F.col("k").alias("__ka"), F.col("n").alias("n_left"))
    b = agg.select(F.col("k").alias("__kb"), F.col("n").alias("n_right"))
    return a.join(b, F.col("__ka").eqNullSafe(F.col("__kb"))).select(
        F.col("__ka").alias("key"), "n_left", "n_right"
    )


@query(
    "q188_id_gap_audit",
    oracle="""
    WITH present AS (
        SELECT DISTINCT event_id AS id FROM events WHERE event_id % 97 <> 13
    ),
    nxt AS (
        SELECT id, lead(id) OVER (ORDER BY id) AS next_id FROM present
    )
    SELECT id AS gap_after, next_id AS resume_at,
           next_id - id - 1 AS n_missing
    FROM nxt WHERE next_id - id > 1
    """,
)
def q188_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit: find every hole in an id sequence (dropped
    messages, lost files, failed ingest tasks) as (last id before the
    gap, first id after, count missing).  Holes are punched
    deterministically (id % 97 = 13) since the fixture ids are dense.

    The oracle states the naive form — ``lead() OVER (ORDER BY id)`` —
    which is a single-partition sort of every id.  The engine buckets
    the id space (id div 4096): within-bucket neighbors come from a
    bucket-partitioned lead (one hash exchange, parallel sort of 4096-id
    slices), and the only cross-bucket candidates are each bucket's max
    stitched to the NEXT NON-EMPTY bucket's min — a window over the
    bucket-summary frame, which has one row per ~4k ids and is
    dimension-sized at any scale.  Union of both candidate sets, filter
    diff > 1: identical rows to the naive plan, no global sort
    (operators.sequences.sequence_gaps; property-tested against the
    naive window on random id sets with adversarial bucket widths)."""
    from udacity_datalake_spark_spark.operators.sequences import sequence_gaps

    present = (
        read_table(spark, sf_dir, "events", columns=["event_id"])
        .where(F.pmod("event_id", F.lit(97)) != 13)
        .select(F.col("event_id").alias("id"))
    )
    return sequence_gaps(present, "id", bucket_width=4096)


@query(
    "q189_curriculum_phases",
    oracle="""
    WITH scored AS (
        SELECT doc_id, n_chars,
               ntile(4) OVER (ORDER BY n_chars, doc_id) AS phase
        FROM documents
    )
    SELECT phase,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM scored GROUP BY phase
    """,
)
def q189_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase assignment: order the corpus by a difficulty
    proxy (document length here — swap in any score column) and split it
    into 4 equal training phases, reporting each phase's volume — the
    easy-to-hard scheduling step of curriculum training.

    Uses operators.topk.global_ntile (two-phase quantile-bucketed
    ranking), so the phase cut never funnels the corpus through one
    partition — this query is the oracle-checked exercise of that
    operator at corpus grain (q153 covers it at user grain)."""
    from udacity_datalake_spark_spark.operators.topk import global_ntile

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "n_chars"])
    phased = global_ntile(
        d, [F.col("n_chars"), F.col("doc_id")], "n_chars", 4, out_col="phase"
    )
    return phased.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"),
    )
