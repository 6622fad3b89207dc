"""Wave 76: ML-QA + graph depth — target-encoding fold stability,
F1-optimal threshold selection, normalization dedup gain, and the
rich-club coefficient.

Reference parity note: the reference (/root/reference/etl.py) has no
eval/graph surface; these extend q359 (target encoding), q226/q270
(classifier eval), q321/q40 (normalization + exact dedup), and the
graph family (q230 degree CCDF, q241 assortativity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import (
    COSUPPLY_EDGES_SQL,
    cosupply_edges,
)
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

N_FOLDS = 5  # mirrors q359


@query(
    "q401_encoding_fold_stability",
    oracle=f"""
    WITH joined AS (
        SELECT c.c_mktsegment AS seg,
               o.o_custkey % {N_FOLDS} AS fold,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    per_cell AS (
        SELECT seg, fold, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(price) AS DECIMAL(38,2)) AS s
        FROM joined GROUP BY seg, fold
    ),
    per_seg AS (
        SELECT seg, CAST(sum(n) AS BIGINT) AS n_seg,
               CAST(sum(s) AS DECIMAL(38,2)) AS s_seg
        FROM per_cell GROUP BY seg
    ),
    enc AS (
        SELECT c.seg, c.fold,
               round(CAST(g.s_seg - c.s AS DOUBLE) / (g.n_seg - c.n), 4) AS e
        FROM per_cell c JOIN per_seg g ON g.seg = c.seg
        WHERE g.n_seg > c.n
    )
    SELECT seg,
           CAST(count(*) AS BIGINT) AS n_folds,
           min(e) AS enc_min, max(e) AS enc_max,
           round(max(e) - min(e), 4) AS spread,
           round((max(e) - min(e)) / ((max(e) + min(e)) / 2) * 100, 4)
               AS spread_pct_of_mid
    FROM enc GROUP BY seg
    """,
)
def q401_encoding_fold_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-encoding fold-stability audit — the QA step on top of
    q359: per category, the max-min SPREAD of the K leave-fold-out
    encodings.  A wide spread means the encoding is dominated by a few
    rows (high-variance feature → the model memorizes fold noise); ML
    platforms gate encoded features on exactly this number before
    training.

    Scale shape: reuses q359's bounded (segment, fold) cell frame; the
    stability stats are one aggregate over K rows per category."""
    o = read_table(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("o_custkey") % N_FOLDS).alias("fold"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    per_cell = joined.groupBy("seg", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("price").cast("decimal(38,2)").alias("s"),
    )
    per_seg = per_cell.groupBy("seg").agg(
        F.sum("n").cast("long").alias("n_seg"),
        F.sum("s").cast("decimal(38,2)").alias("s_seg"),
    )
    enc = (
        per_cell.join(F.broadcast(per_seg), "seg")
        .where(F.col("n_seg") > F.col("n"))
        .select(
            "seg",
            F.round(
                (F.col("s_seg") - F.col("s")).cast("double")
                / (F.col("n_seg") - F.col("n")),
                4,
            ).alias("e"),
        )
    )
    return enc.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_folds"),
        F.min("e").alias("enc_min"),
        F.max("e").alias("enc_max"),
        F.round(F.max("e") - F.min("e"), 4).alias("spread"),
        F.round(
            (F.max("e") - F.min("e")) / ((F.max("e") + F.min("e")) / 2) * 100, 4
        ).alias("spread_pct_of_mid"),
    )


@query(
    "q402_f1_optimal_threshold",
    oracle="""
    WITH scored AS (
        SELECT (ascii(substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) * 47
                + ascii(substring(md5(CAST(c_custkey AS VARCHAR)), 2, 1)))
                   % 100 AS score,
               CASE WHEN COALESCE(o.n, 0) > 3 THEN 1 ELSE 0 END AS y
        FROM customer c
        LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
          ON o.o_custkey = c.c_custkey
    ),
    grid AS (SELECT unnest(range(0, 100, 5)) AS thr),
    conf AS (
        SELECT g.thr,
               CAST(sum(CASE WHEN s.score >= g.thr AND s.y = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN s.score >= g.thr AND s.y = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN s.score < g.thr AND s.y = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM grid g CROSS JOIN scored s
        GROUP BY g.thr
    ),
    f1s AS (
        SELECT thr, tp, fp, fn,
               -- F1 = 2tp / (2tp + fp + fn), exact rational compared by
               -- cross-multiplication in the best-pick rank
               round(2.0 * tp / (2 * tp + fp + fn), 6) AS f1,
               row_number() OVER (
                   ORDER BY CAST(2 * tp AS HUGEINT) * 1000000
                            // (2 * tp + fp + fn) DESC, thr) AS rk
        FROM conf WHERE 2 * tp + fp + fn > 0
    )
    SELECT CAST(thr AS BIGINT) AS best_threshold, tp, fp, fn, f1
    FROM f1s WHERE rk = 1
    """,
)
def q402_f1_optimal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-optimal decision threshold for the deterministic
    pseudo-classifier (q387's score/label pair): sweep 20 thresholds,
    compute the confusion counts per threshold in ONE pass (grid ×
    scores with map-side combine — q341's sweep discipline applied to
    classification), and pick the argmax-F1 threshold by
    integer-scaled cross-multiplied ranking (no float comparison
    decides the winner).  The operating-point selection every deployed
    classifier needs after q270's threshold-free PR curve.

    Scale shape: one scored scan fanned across the bounded threshold
    grid (20×), collapsing to 20 confusion rows; the argmax is a rank
    over 20 rows."""
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey"])
    o = read_table(spark, sf_dir, "orders", columns=["o_custkey"])
    ocnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    h = F.md5(F.col("c_custkey").cast("string"))
    score = (
        F.ascii(F.substring(h, 1, 1)) * 47 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    scored = c.join(F.broadcast(ocnt), c.c_custkey == ocnt.o_custkey, "left").select(
        score.alias("score"),
        F.when(F.coalesce(F.col("n"), F.lit(0)) > 3, 1).otherwise(0).alias("y"),
    )
    grid = spark.range(0, 100, 5).select(F.col("id").alias("thr"))
    conf = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("thr")
        .agg(
            F.sum(
                F.when((F.col("score") >= F.col("thr")) & (F.col("y") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when((F.col("score") >= F.col("thr")) & (F.col("y") == 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum(
                F.when((F.col("score") < F.col("thr")) & (F.col("y") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("fn"),
        )
        .where(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0)
    )
    ranked = conf.select(
        "thr",
        "tp",
        "fp",
        "fn",
        F.round(2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6).alias(
            "f1"
        ),
        F.expr(
            "CAST((CAST(2 * tp AS DECIMAL(38,0)) * 1000000) "
            "DIV (2 * tp + fp + fn) AS BIGINT)"
        ).alias("f1_scaled"),
    )
    from udacity_datalake_spark_spark.operators.topk import ranked_topk

    return (
        ranked_topk(ranked, [F.col("f1_scaled").desc(), F.col("thr")], 1)
        .select(
            F.col("thr").cast("long").alias("best_threshold"), "tp", "fp", "fn", "f1"
        )
    )


@query(
    "q403_normalization_dedup_gain",
    oracle="""
    WITH raw_groups AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_raw_distinct
        FROM documents
    ),
    norm_groups AS (
        SELECT CAST(count(DISTINCT md5(
                   trim(regexp_replace(lower(text), ' +', ' ', 'g'))))
               AS BIGINT) AS n_norm_distinct
        FROM documents
    )
    SELECT r.n_docs, r.n_raw_distinct, n.n_norm_distinct,
           CAST(r.n_raw_distinct - n.n_norm_distinct AS BIGINT)
               AS extra_dups_found,
           r.n_docs - r.n_raw_distinct AS raw_dup_burden,
           r.n_docs - n.n_norm_distinct AS norm_dup_burden
    FROM raw_groups r CROSS JOIN norm_groups n
    """,
)
def q403_normalization_dedup_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization dedup gain: how many extra duplicate documents does
    canonical normalization (lowercase, collapse whitespace runs, trim
    — q321's fixed-point form) surface beyond byte-exact hashing?  The
    go/no-go measurement for adding a normalization pass before exact
    dedup (q40) — zero gain means the corpus is already
    case/spacing-canonical and the pass is wasted compute.

    Scale shape: two distinct-count aggregates over one scan each
    (hash-grain map-side combine); no pair joins."""
    d = read_table(spark, sf_dir, "documents", columns=["text"])
    raw = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct(F.md5("text")).alias("n_raw_distinct"),
    )
    norm_key = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    )
    norm = d.agg(F.count_distinct(norm_key).alias("n_norm_distinct"))
    return raw.crossJoin(F.broadcast(norm)).select(
        "n_docs",
        "n_raw_distinct",
        "n_norm_distinct",
        (F.col("n_raw_distinct") - F.col("n_norm_distinct")).alias(
            "extra_dups_found"
        ),
        (F.col("n_docs") - F.col("n_raw_distinct")).alias("raw_dup_burden"),
        (F.col("n_docs") - F.col("n_norm_distinct")).alias("norm_dup_burden"),
    )


RICH_CLUB_KS = (2, 4, 8, 16)


@query(
    "q404_rich_club_coefficient",
    oracle=f"""
    WITH {COSUPPLY_EDGES_SQL},
    deg AS (
        SELECT x, count(*) AS d
        FROM (SELECT u AS x FROM edges UNION ALL SELECT w FROM edges)
        GROUP BY x
    ),
    ks AS (SELECT unnest(ARRAY{list(RICH_CLUB_KS)}) AS k),
    club AS (
        SELECT k.k, CAST(count(*) AS BIGINT) AS n_k
        FROM ks k JOIN deg ON deg.d > k.k GROUP BY k.k
    ),
    club_edges AS (
        SELECT k.k, CAST(count(*) AS BIGINT) AS e_k
        FROM ks k
        JOIN edges e ON TRUE
        JOIN deg du ON du.x = e.u AND du.d > k.k
        JOIN deg dw ON dw.x = e.w AND dw.d > k.k
        GROUP BY k.k
    )
    SELECT CAST(c.k AS BIGINT) AS k, c.n_k AS n_rich_nodes,
           COALESCE(ce.e_k, 0) AS n_rich_edges,
           round(CAST(2 * COALESCE(ce.e_k, 0) AS DOUBLE)
                 / (c.n_k * (c.n_k - 1)), 6) AS phi
    FROM club c LEFT JOIN club_edges ce ON ce.k = c.k
    WHERE c.n_k >= 2
    """,
)
def q404_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the co-supply graph: the edge
    density among nodes of degree > k, for an escalating k ladder — a
    rising φ(k) means hubs preferentially interconnect (the rich club),
    which degree distribution (q230) and assortativity (q241) cannot
    distinguish from hub-to-leaf mixing.  Density is exact 2E/(n(n−1))
    with one rounded division per k.

    Scale shape: degrees are one endpoint-grain aggregate; per k the
    club subgraph comes from two degree-filter joins on the edge list
    (broadcast degree frame) — |ks| bounded passes over graph-sized
    data."""
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("w").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
        .transform(spersist)
    )
    ks = spark.createDataFrame([(k,) for k in RICH_CLUB_KS], "k int")
    club = (
        deg.join(F.broadcast(ks), deg.d > ks.k)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dw = deg.select(F.col("x").alias("w"), F.col("d").alias("dw"))
    annotated = edges.join(F.broadcast(du), "u").join(F.broadcast(dw), "w")
    club_edges = (
        annotated.crossJoin(F.broadcast(ks))
        .where((F.col("du") > F.col("k")) & (F.col("dw") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
    )
    return (
        club.join(club_edges, "k", "left")
        .where(F.col("n_k") >= 2)
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n_k").alias("n_rich_nodes"),
            F.coalesce("e_k", F.lit(0)).alias("n_rich_edges"),
            F.round(
                2.0
                * F.coalesce("e_k", F.lit(0))
                / (F.col("n_k") * (F.col("n_k") - 1)),
                6,
            ).alias("phi"),
        )
    )
