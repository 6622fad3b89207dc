"""Wave 54: resampling statistics without randomness — jackknife folds
whose complement statistics come from TOTALS-minus-fold algebra (no
k-fold rescan), a deterministic pseudo-Poisson bootstrap (hash-derived
replicate weights), and per-dimension mutual information between
embedding sign features and labels (the feature-selection screen).

Reference parity note: the reference (etl.py, /root/reference) has no
statistics surface; these extend the split/sampling family (q64/q70/
q246) and the experiment-stats waves (21-23).

All three follow the engine's exact-reduction discipline: counts and
DECIMAL sums aggregate exactly; ln()/ratio terms floor-scale to BIGINT
(q221 idiom) before any sum; hash decisions are pure int64 arithmetic
kept overflow-safe by pre-modding the key before the multiply (decimal
modulo arithmetic benched ~10x slower than int64 in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

N_FOLDS = 5


@query(
    "q331_jackknife_folds",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey,
               (o_orderkey % 1048576) * 2654435761 % {N_FOLDS} AS fold,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders
    ),
    per_fold AS (
        SELECT fold, count(*) AS n_in,
               CAST(sum(price) AS DECIMAL(28,2)) AS sum_in
        FROM base GROUP BY fold
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(price) AS DECIMAL(28,2)) AS sum_all
        FROM base
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(n_in AS BIGINT) AS n_in,
           CAST(t.n_all - n_in AS BIGINT) AS n_out,
           CAST((t.sum_all - sum_in) * 100 AS BIGINT) AS sum_out_cents,
           round(CAST(t.sum_all - sum_in AS DOUBLE) / (t.n_all - n_in), 6)
               AS mean_out
    FROM per_fold CROSS JOIN tot t
    ORDER BY fold
    """,
)
def q331_jackknife_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jackknife (leave-one-fold-out) statistics with complement algebra:
    orders hash into 5 deterministic folds, and each fold's LEAVE-OUT
    mean comes from (total − fold) arithmetic on one pass of exact
    DECIMAL partials — never k re-scans of the fact.  This is the
    distributive-aggregate identity every cheap cross-validation /
    influence estimate rests on.

    Scale shape: ONE fact aggregate to the 5-row fold frame plus a
    1-row total; the hash fold decision is pure int64 arithmetic kept
    overflow-safe by a pre-mod (q332's discipline)."""
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    base = o.select(
        # pre-mod int64 hash (q332's discipline): overflow-safe at any
        # scale without DECIMAL(38) arithmetic in the hot expression
        (((F.col("o_orderkey") % 1048576) * 2654435761) % N_FOLDS).alias("fold"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    per_fold = base.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum("price").cast("decimal(28,2)").alias("sum_in"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("price").cast("decimal(28,2)").alias("sum_all"),
    )
    return (
        per_fold.crossJoin(F.broadcast(tot))
        .select(
            F.col("fold").cast("long").alias("fold"),
            F.col("n_in").cast("long").alias("n_in"),
            (F.col("n_all") - F.col("n_in")).cast("long").alias("n_out"),
            ((F.col("sum_all") - F.col("sum_in")) * 100)
            .cast("long")
            .alias("sum_out_cents"),
            F.round(
                (F.col("sum_all") - F.col("sum_in")).cast("double")
                / (F.col("n_all") - F.col("n_in")),
                6,
            ).alias("mean_out"),
        )
        .orderBy("fold")
    )


N_REPLICATES = 20
#: Pseudo-Poisson(1) pmf as permille cut points: P(w=0)=.368, P(1)=.368,
#: P(2)=.184, P(3)=.061, P(4)=.016, P(5)=.003 — cumulative ranges over
#: a 1000-bucket hash.
POISSON_CUTS = (368, 736, 920, 981, 997, 1000)


def _poisson_weight_sql(h: str) -> str:
    return (
        f"CASE WHEN {h} < 368 THEN 0 WHEN {h} < 736 THEN 1 WHEN {h} < 920 THEN 2 "
        f"WHEN {h} < 981 THEN 3 WHEN {h} < 997 THEN 4 ELSE 5 END"
    )


@query(
    "q332_deterministic_bootstrap",
    oracle=f"""
    WITH reps AS (SELECT unnest(range({N_REPLICATES})) AS r),
    weighted AS (
        SELECT r.r,
               {_poisson_weight_sql("(o.o_orderkey % 1048576) * 2654435761 * (r.r + 17) % 1000")}
                   AS w,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders o CROSS JOIN reps r
    )
    SELECT CAST(r AS BIGINT) AS replicate,
           CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(sum(w * price) * 100 AS BIGINT) AS total_rev_cents
    FROM weighted
    GROUP BY r
    ORDER BY r
    """,
)
def q332_deterministic_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap: 20 replicates re-weight every
    order with a pseudo-Poisson(1) count derived from a (replicate,
    order) hash — the classic streaming-bootstrap trick (each row
    decides its own replicate multiplicities map-side, no resample
    shuffle), made fully deterministic so replicate totals are
    reproducible across runs, partitionings and engines.  The spread of
    the 20 DECIMAL totals is the bootstrap CI of total revenue.

    Scale shape: the fact × 20 expansion happens AT the aggregation
    (map-side combine eats it); weights are pure integer hash
    arithmetic widened against overflow; totals are exact DECIMAL."""
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    reps = spark.range(N_REPLICATES).select(F.col("id").alias("r"))
    # pre-mod keeps the product ≤ (2^20)·2654435761·36 < 2^63 in PURE
    # int64 at ANY scale — no DECIMAL(38) widening needed, and decimal
    # modulo arithmetic benched ~10× slower than int64 here (17.7s →
    # 1.8s at sf0.1).  Cost: orderkeys congruent mod 2^20 share weight
    # sequences — irrelevant below 1M orders per replicate-window and an
    # accepted bootstrap approximation above it.
    h = ((F.col("o_orderkey") % 1048576) * 2654435761 * (F.col("r") + 17)) % 1000
    w = (
        F.when(h < POISSON_CUTS[0], 0)
        .when(h < POISSON_CUTS[1], 1)
        .when(h < POISSON_CUTS[2], 2)
        .when(h < POISSON_CUTS[3], 3)
        .when(h < POISSON_CUTS[4], 4)
        .otherwise(5)
    )
    weighted = o.crossJoin(F.broadcast(reps)).select(
        "r",
        w.alias("w"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    return (
        weighted.groupBy("r")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            (F.sum(F.col("w") * F.col("price")) * 100).cast("long").alias("total_rev_cents"),
        )
        .orderBy("r")
        .select(F.col("r").cast("long").alias("replicate"), "n_eff", "total_rev_cents")
    )


@query(
    "q333_feature_mutual_information",
    oracle="""
    WITH cells AS (
        SELECT u.dim AS dim,
               CASE WHEN CAST(u.v AS DOUBLE) > 0 THEN 1 ELSE 0 END AS f,
               label,
               count(*) AS n
        FROM (
            SELECT label,
                   unnest(list_transform(range(1, len(embedding) + 1),
                       i -> struct_pack(dim := i, v := embedding[i]))) AS u
            FROM embeddings
        )
        GROUP BY 1, 2, 3
    ),
    margins AS (
        SELECT dim, CAST(sum(n) AS BIGINT) AS n_total FROM cells GROUP BY dim
    ),
    fm AS (SELECT dim, f, CAST(sum(n) AS BIGINT) AS nf FROM cells GROUP BY 1, 2),
    lm AS (SELECT dim, label, CAST(sum(n) AS BIGINT) AS nl FROM cells GROUP BY 1, 2),
    terms AS (
        SELECT c.dim,
               CAST(floor(CAST(c.n AS DOUBLE) / m.n_total
                    * ln(CAST(c.n AS DOUBLE) * m.n_total
                         / (CAST(fm.nf AS DOUBLE) * lm.nl)) * 1e10 + 0.5)
                    AS BIGINT) AS mi_sc
        FROM cells c
        JOIN margins m ON m.dim = c.dim
        JOIN fm ON fm.dim = c.dim AND fm.f = c.f
        JOIN lm ON lm.dim = c.dim AND lm.label = c.label
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           round(sum(mi_sc) / 1e10, 6) AS mi_nats
    FROM terms
    GROUP BY dim
    ORDER BY dim
    """,
)
def q333_feature_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mutual information between the embedding's SIGN
    feature and the class label — the feature-selection screen that
    ranks which dimensions carry label signal (a near-zero MI column is
    dead weight in a quantized index; compare q313's width audit).

    Scale shape: the corpus collapses to (dim, sign, label) contingency
    cells — 64 × 2 × |labels| rows — in one exploded aggregate; margins
    derive from the cells (no rescan); each cell contributes ONE
    floor-scaled p·ln(p/(pq)) term, so the MI reduction is exact."""
    e = read_table(spark, sf_dir, "embeddings")
    cells = (
        e.select("label", F.posexplode("embedding").alias("d0", "vf"))
        .select(
            (F.col("d0") + 1).alias("dim"),
            (F.col("vf").cast("double") > 0).cast("int").alias("f"),
            "label",
        )
        .groupBy("dim", "f", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(spersist)  # feeds margins + the term join
    )
    margins = cells.groupBy("dim").agg(F.sum("n").cast("long").alias("n_total"))
    fm = cells.groupBy("dim", "f").agg(F.sum("n").cast("long").alias("nf"))
    lm = cells.groupBy("dim", "label").agg(F.sum("n").cast("long").alias("nl"))
    terms = (
        cells.join(margins, "dim")
        .join(fm, ["dim", "f"])
        .join(lm, ["dim", "label"])
        .select(
            "dim",
            F.floor(
                F.col("n").cast("double")
                / F.col("n_total")
                * F.log(
                    F.col("n").cast("double")
                    * F.col("n_total")
                    / (F.col("nf").cast("double") * F.col("nl"))
                )
                * 1e10
                + 0.5
            )
            .cast("long")
            .alias("mi_sc"),
        )
    )
    return (
        terms.groupBy("dim")
        .agg(F.round(F.sum("mi_sc") / 1e10, 6).alias("mi_nats"))
        .orderBy("dim")
        .select(F.col("dim").cast("long").alias("dim"), "mi_nats")
    )
