"""Wave 48: representation-learning data prep — deterministic
contrastive (anchor, positive, negative) triplet generation, exact
hard-negative mining for a bounded anchor set, and the α-weighted
training-mixture allocator (the LLaMA-style source re-weighting step).

Reference parity note: the reference (etl.py, /root/reference) has no
vector or mixture surface; these extend the embeddings-table family
(q48/q56/q132) and the sampling family (q80/q227).

Cross-engine float discipline: cosine cores and mixture weights build
on BIGINT-scaled per-term products (floor(x·10^k + 0.5)) so every
reduction is an exact integer sum; doubles appear only in final
closed-form expressions mirrored verbatim in the oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q314_contrastive_triplets",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, md5(CAST(vec_id AS VARCHAR)) AS h FROM embeddings
    ),
    pos AS (
        SELECT vec_id, label, h,
               COALESCE(
                   lead(vec_id) OVER (PARTITION BY label ORDER BY h, vec_id),
                   first_value(vec_id) OVER (
                       PARTITION BY label ORDER BY h, vec_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               ) AS positive_id,
               count(*) OVER (PARTITION BY label) AS label_n
        FROM v
    ),
    label_heads AS (
        -- min by (h, vec_id): md5 is fixed 32-hex, so concat with a
        -- zero-padded id is the same lexicographic order as the tuple
        SELECT label, min_by(vec_id, h || lpad(CAST(vec_id AS VARCHAR), 12, '0'))
            AS head_id
        FROM v GROUP BY label
    ),
    labels AS (
        SELECT label, head_id,
               row_number() OVER (ORDER BY label) AS li,
               count(*) OVER () AS nl
        FROM label_heads
    ),
    neg AS (
        SELECT a.label, b.head_id AS negative_id
        FROM labels a JOIN labels b ON b.li = a.li % a.nl + 1
    )
    SELECT p.vec_id AS anchor_id, p.label AS anchor_label,
           p.positive_id, n.negative_id
    FROM pos p JOIN neg n ON n.label = p.label
    WHERE p.label_n >= 2
    """,
)
def q314_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive triplet generation: every vector is an
    anchor; its POSITIVE is the next same-label vector in md5-ring
    order (wrapping — so every anchor gets a distinct-from-self
    positive whenever its label has ≥2 members), and its NEGATIVE is
    the md5-minimal head of the next label in label order.  No RNG:
    triplets are reproducible across runs, partitionings and engines.

    Scale shape: the positive assignment is ONE label-keyed window
    (lead + first_value over the md5 ring) — linear, no same-label
    self-join; negatives come from a label-grain (bounded) frame
    joined back by label.  At 100 TB this is the exact shape you want:
    the corpus shuffles once by label, label-grain metadata broadcasts."""
    v = read_table(spark, sf_dir, "embeddings", columns=["vec_id", "label"]).select(
        "vec_id", "label", F.md5(F.col("vec_id").cast("string")).alias("h")
    )
    ring = Window.partitionBy("label").orderBy("h", "vec_id")
    whole = ring.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pos = v.select(
        "vec_id",
        "label",
        F.coalesce(
            F.lead("vec_id").over(ring), F.first("vec_id").over(whole)
        ).alias("positive_id"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).alias("label_n"),
    )
    heads = v.groupBy("label").agg(
        F.min_by("vec_id", F.struct("h", "vec_id")).alias("head_id")
    )
    lw = Window.orderBy("label")
    labels = heads.select(
        "label",
        "head_id",
        F.row_number().over(lw).alias("li"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(0))).alias("nl"),
    )
    neg = (
        labels.alias("a")
        .join(
            labels.alias("b"),
            F.col("b.li") == F.col("a.li") % F.col("a.nl") + 1,
        )
        .select(F.col("a.label").alias("label"), F.col("b.head_id").alias("negative_id"))
    )
    return (
        pos.where(F.col("label_n") >= 2)
        .join(F.broadcast(neg), "label")
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            "positive_id",
            "negative_id",
        )
    )


#: Hard-negative mining anchor set: the first N_ANCHORS vec_ids — the
#: bounded exact path (LSH-prefiltered mining at corpus scale is q49/q56).
N_ANCHORS = 20


@query(
    "q315_hard_negative_mining",
    oracle=f"""
    WITH dims AS (
        SELECT vec_id, label, u.dim AS dim, CAST(u.v AS DOUBLE) AS v
        FROM (
            SELECT vec_id, label,
                   unnest(list_transform(range(1, len(embedding) + 1),
                       i -> struct_pack(dim := i, v := embedding[i]))) AS u
            FROM embeddings
        )
    ),
    scaled AS (
        SELECT vec_id, label, dim, v,
               CAST(floor(v * v * 1e12 + 0.5) AS BIGINT) AS sq
        FROM dims
    ),
    norms AS (
        SELECT vec_id, CAST(sum(sq) AS BIGINT) AS norm_sc
        FROM scaled GROUP BY vec_id
    ),
    dots AS (
        SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
               c.vec_id AS cand_id,
               CAST(sum(CAST(floor(a.v * c.v * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
                   AS dot_sc
        FROM dims a
        JOIN dims c ON c.dim = a.dim AND c.label <> a.label
        WHERE a.vec_id < {N_ANCHORS}
        GROUP BY 1, 2, 3
    ),
    cos AS (
        SELECT d.anchor_id, d.anchor_label, d.cand_id,
               d.dot_sc / sqrt(CAST(na.norm_sc AS DOUBLE) * nc.norm_sc) AS cosine
        FROM dots d
        JOIN norms na ON na.vec_id = d.anchor_id
        JOIN norms nc ON nc.vec_id = d.cand_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY anchor_id ORDER BY cosine DESC, cand_id) AS rn
        FROM cos
    )
    SELECT anchor_id, anchor_label, cand_id AS hard_negative_id,
           round(cosine, 6) AS cosine
    FROM ranked WHERE rn = 1
    """,
)
def q315_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hard-negative mining: for each anchor (the bounded set
    vec_id < 20), the single most-cosine-similar vector of a DIFFERENT
    label — the highest-value negative for contrastive training.  Dot
    products and norms accumulate as BIGINT-scaled per-dimension
    products (floor(x·y·10^12 + 0.5)), so the cosine core is an exact
    integer ratio and the argmax ordering is engine-independent.

    Scale shape: the anchor set broadcasts (its 64-dim explode is
    N_ANCHORS·64 rows); candidate dims join it dim-keyed and collapse
    map-side into per-(anchor, cand) sums — one bounded-fan-out
    exchange.  This is the exact bounded-anchor path; mining over ALL
    anchors at 100 TB goes through the LSH/IVF prefilters (q49/q60)
    with this same verify kernel."""
    e = read_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("d0", "vf")
    ).select(
        "vec_id", "label", (F.col("d0") + 1).alias("dim"), F.col("vf").cast("double").alias("v")
    )
    norms = dims.groupBy("vec_id").agg(
        F.sum(F.floor(F.col("v") * F.col("v") * 1e12 + 0.5).cast("long")).alias(
            "norm_sc"
        )
    )
    anchors = dims.where(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("dim").alias("adim"),
        F.col("v").alias("av"),
    )
    dots = (
        dims.join(
            F.broadcast(anchors),
            (F.col("dim") == F.col("adim"))
            & (F.col("label") != F.col("anchor_label")),
        )
        .groupBy("anchor_id", "anchor_label", F.col("vec_id").alias("cand_id"))
        .agg(
            F.sum(
                F.floor(F.col("av") * F.col("v") * 1e12 + 0.5).cast("long")
            ).alias("dot_sc")
        )
    )
    cos = (
        dots.join(
            norms.select(F.col("vec_id").alias("anchor_id"), F.col("norm_sc").alias("na")),
            "anchor_id",
        )
        .join(
            norms.select(F.col("vec_id").alias("cand_id"), F.col("norm_sc").alias("nc")),
            "cand_id",
        )
        .select(
            "anchor_id",
            "anchor_label",
            "cand_id",
            (
                F.col("dot_sc")
                / F.sqrt(F.col("na").cast("double") * F.col("nc"))
            ).alias("cosine"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("anchor_id").orderBy(F.col("cosine").desc(), "cand_id")
    )
    return (
        cos.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "anchor_id",
            "anchor_label",
            F.col("cand_id").alias("hard_negative_id"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


#: Mixture allocator: α-exponent sampling weights, half-corpus budget.
MIX_ALPHA_PERMILLE = 700  # α = 0.7


@query(
    "q316_mixture_allocator",
    oracle=f"""
    WITH src AS (
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               count(*) AS n_docs
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_tokens, n_docs,
               CAST(floor(power(n_tokens, {MIX_ALPHA_PERMILLE} / 1000.0) * 1e6 + 0.5)
                    AS BIGINT) AS w_sc
        FROM src
    ),
    tot AS (
        SELECT CAST(sum(w_sc) AS BIGINT) AS w_tot,
               CAST(sum(n_tokens) AS BIGINT) AS t_tot
        FROM w
    )
    SELECT w.source, w.n_tokens, CAST(w.n_docs AS BIGINT) AS n_docs,
           round(w.w_sc / CAST(t.w_tot AS DOUBLE), 6) AS mix_weight,
           CAST(floor((t.t_tot / 2.0) * w.w_sc / t.w_tot + 0.5) AS BIGINT)
               AS alloc_tokens,
           round(floor((t.t_tot / 2.0) * w.w_sc / t.w_tot + 0.5) /
                 CAST(w.n_tokens AS DOUBLE), 6) AS epochs
    FROM w CROSS JOIN tot t
    """,
)
def q316_mixture_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α-weighted training-mixture allocation (the LLaMA-style source
    re-balancing step): each source's sampling weight ∝ (its token
    count)^0.7, normalized; a half-corpus token budget is then split by
    weight, and the implied per-source epoch count (>1 means the source
    is over-sampled / repeated) falls out.  The flattening exponent is
    what keeps a 100×-bigger crawl source from drowning curated
    sources.

    Scale shape: one fact aggregate to source grain; weights sum as
    BIGINT-scaled integers (floor(T^α·10^6 + 0.5)); every output value
    is a closed form over that bounded frame."""
    src = (
        read_table(spark, sf_dir, "documents", columns=["source", "text"])
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    alpha = MIX_ALPHA_PERMILLE / 1000.0
    w = src.select(
        "source",
        "n_tokens",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.floor(F.pow(F.col("n_tokens"), F.lit(alpha)) * 1e6 + 0.5)
        .cast("long")
        .alias("w_sc"),
    )
    tot = w.agg(
        F.sum("w_sc").cast("long").alias("w_tot"),
        F.sum("n_tokens").cast("long").alias("t_tot"),
    )
    alloc = F.floor(
        (F.col("t_tot") / 2.0) * F.col("w_sc") / F.col("w_tot") + 0.5
    ).cast("long")
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "n_docs",
        F.round(F.col("w_sc") / F.col("w_tot").cast("double"), 6).alias("mix_weight"),
        alloc.alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens").cast("double"), 6).alias("epochs"),
    )
