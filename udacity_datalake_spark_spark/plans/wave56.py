"""Wave 56: preference-pair generation (the DPO/RLHF data-prep shape)
and importance reweighting to match a target length distribution (the
curation step that fixes a skewed corpus without dropping data).

Reference parity note: the reference (etl.py, /root/reference) has no
training-data surface; these extend q314 (contrastive triplets) and
the sampling family (q80/q101/q246).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q336_preference_pairs",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id) AS r_best,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars ASC, doc_id) AS r_worst,
               count(*) OVER (PARTITION BY source) AS n_src
        FROM documents
    ),
    best AS (SELECT source, r_best AS i, doc_id, n_chars FROM scored),
    worst AS (SELECT source, r_worst AS i, doc_id, n_chars FROM scored)
    SELECT b.source, b.i AS pair_rank,
           b.doc_id AS chosen_id, w.doc_id AS rejected_id,
           CAST(b.n_chars - w.n_chars AS BIGINT) AS quality_gap
    FROM best b
    JOIN worst w ON w.source = b.source AND w.i = b.i
    JOIN (SELECT source, min(n_src) AS n_src FROM scored GROUP BY source) s
      ON s.source = b.source
    WHERE b.i * 2 <= s.n_src AND b.doc_id <> w.doc_id
    """,
)
def q336_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair generation (the DPO/RLHF dataset shape): within
    each source, the i-th BEST document (by the quality proxy, here
    n_chars) pairs with the i-th WORST — deterministic rank-matched
    chosen/rejected pairs with their quality gap, no RNG, every doc in
    at most one pair per side (i ≤ n/2 and self-pairs excluded).

    Scale shape: two opposite-order row_number windows share ONE
    source-keyed exchange; the pairing is a source+rank equi-join of
    two frames of the same partitioning — AQE keeps it co-located.
    Substituting a model-scored quality column changes nothing
    structural."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    wsrc = Window.partitionBy("source")
    scored = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(wsrc.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("r_best"),
        F.row_number()
        .over(wsrc.orderBy(F.col("n_chars").asc(), "doc_id"))
        .alias("r_worst"),
        F.count(F.lit(1)).over(wsrc).alias("n_src"),
    )
    best = scored.select(
        "source",
        F.col("r_best").alias("i"),
        F.col("doc_id").alias("chosen_id"),
        F.col("n_chars").alias("c_best"),
        "n_src",
    )
    worst = scored.select(
        "source",
        F.col("r_worst").alias("i"),
        F.col("doc_id").alias("rejected_id"),
        F.col("n_chars").alias("c_worst"),
    )
    return (
        best.join(worst, ["source", "i"])
        .where(
            (F.col("i") * 2 <= F.col("n_src"))
            & (F.col("chosen_id") != F.col("rejected_id"))
        )
        .select(
            "source",
            F.col("i").alias("pair_rank"),
            "chosen_id",
            "rejected_id",
            (F.col("c_best") - F.col("c_worst")).cast("long").alias("quality_gap"),
        )
    )


BIN_CHARS = 200
#: Reweighting is capped so a nearly-empty bin can't get unbounded
#: weight (the standard importance-weight clip).
MAX_WEIGHT = 10.0


@query(
    "q337_importance_reweighting",
    oracle=f"""
    WITH binned AS (
        SELECT n_chars // {BIN_CHARS} AS bin, count(*) AS n
        FROM documents GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_total, count(*) AS n_bins FROM binned
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n AS BIGINT) AS n,
           round(least(CAST(t.n_total AS DOUBLE) / t.n_bins / n, {MAX_WEIGHT}), 6)
               AS weight,
           CASE WHEN CAST(t.n_total AS DOUBLE) / t.n_bins / n <= {MAX_WEIGHT}
                THEN abs(round(least(CAST(t.n_total AS DOUBLE) / t.n_bins / n,
                                     {MAX_WEIGHT}), 6) * n
                         - CAST(t.n_total AS DOUBLE) / t.n_bins)
                     <= 0.001 * t.n_total / t.n_bins
                ELSE TRUE END AS mass_matches_target
    FROM binned CROSS JOIN tot t
    ORDER BY bin
    """,
)
def q337_importance_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance reweighting to a UNIFORM length-bin target: each
    200-char bin gets weight target/actual (clipped at 10× — the
    standard importance clip), so sampling by these weights reproduces
    the target distribution without discarding documents.  The
    ``mass_matches_target`` column verifies in-query that every
    unclipped bin's reweighted mass lands within 0.1% of the target
    (oracle expects TRUE) — the q22 tolerance-band pattern applied to a
    distribution-matching contract.

    Scale shape: one fact aggregate to the bounded bin frame; weights
    are closed-form per bin; the verification is arithmetic on the same
    frame.  Matching a non-uniform target distribution only changes the
    broadcast target column."""
    d = read_table(spark, sf_dir, "documents", columns=["n_chars"])
    binned = d.groupBy(
        F.floor(F.col("n_chars") / BIN_CHARS).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = binned.agg(
        F.sum("n").cast("long").alias("n_total"), F.count(F.lit(1)).alias("n_bins")
    )
    target = F.col("n_total").cast("double") / F.col("n_bins")
    raw_w = target / F.col("n")
    weight = F.round(F.least(raw_w, F.lit(MAX_WEIGHT)), 6)
    return (
        binned.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("n"),
            weight.alias("weight"),
            F.when(
                raw_w <= MAX_WEIGHT,
                F.abs(weight * F.col("n") - target) <= 0.001 * target,
            )
            .otherwise(F.lit(True))
            .alias("mass_matches_target"),
        )
        .orderBy("bin")
    )
