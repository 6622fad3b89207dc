"""Sequence auditing over id spaces — gap detection without a global
sort.

``lead() OVER (ORDER BY id)`` is the natural gap finder and a
single-partition sort.  ``sequence_gaps`` buckets the id space instead:
within-bucket neighbors come from a bucket-partitioned lead (one hash
exchange, parallel sorts of bucket-width slices), and the only
cross-bucket candidates are each bucket's max stitched to the next
non-empty bucket's min — a window over the bucket-summary frame, which
has one row per bucket-width ids (dimension-sized at any scale).  The
union of both candidate sets filtered to diff > 1 is row-identical to
the naive global formulation (property-tested against it, including
adversarial bucket widths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_gaps(df: DataFrame, id_col: str = "id", bucket_width: int = 4096) -> DataFrame:
    """(gap_after, resume_at, n_missing) for every hole in the distinct
    id sequence of ``df[id_col]`` (non-null ids)."""
    present = (
        df.select(F.col(id_col).alias("id"))
        .where(F.col("id").isNotNull())
        .distinct()
        .withColumn("__b", F.floor(F.col("id") / F.lit(bucket_width)))
    )
    w_in = Window.partitionBy("__b").orderBy("id")
    within = present.select("id", F.lead("id").over(w_in).alias("next_id")).where(
        F.col("next_id").isNotNull()
    )
    summary = present.groupBy("__b").agg(F.min("id").alias("__lo"), F.max("id").alias("__hi"))
    w_b = Window.orderBy("__b")  # bucket-summary frame: one row per bucket
    across = summary.select(
        F.col("__hi").alias("id"), F.lead("__lo").over(w_b).alias("next_id")
    ).where(F.col("next_id").isNotNull())
    gaps = within.unionByName(across).where(F.col("next_id") - F.col("id") > 1)
    return gaps.select(
        F.col("id").alias("gap_after"),
        F.col("next_id").alias("resume_at"),
        (F.col("next_id") - F.col("id") - 1).alias("n_missing"),
    )
