"""Wave 27: sketch-accuracy auditing (t-digest percentiles within band),
contingency anomaly cells, embedding class separability (one-way ANOVA
F), and a curation fairness check (disparate-impact ratio on the
token-budget selection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q253_tdigest_audit",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 6) AS p50_exact,
           round(quantile_cont(value, 0.95), 6) AS p95_exact,
           TRUE AS approx_within_rank_band
    FROM events GROUP BY event_type
    """,
)
def q253_tdigest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: exact p50/p95 of event value per type next
    to a CLAIM that Spark's approx_percentile (GK sketch) lands inside
    the exact ±2-percentile RANK band — the check you run before
    trusting the sketch path at a scale where exact percentiles stop
    being affordable.

    The claim is rank-based, not value-based, because that is what the
    sketch guarantees: accuracy=10000 bounds RANK error at n/10000,
    while a value-relative band breaks on small samples where adjacent
    order statistics sit further apart than any percentage of the value
    (a real sf0.001 failure in round 2).  q96's tolerance-band
    contract: the oracle checks the exact columns and expects the
    claim literally TRUE; the engine computes it for real
    (p48 ≤ approx50 ≤ p52, p93 ≤ approx95 ≤ p97)."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "value"])
    s = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.50)).alias("__p50"),
        F.percentile("value", F.lit(0.95)).alias("__p95"),
        F.percentile("value", F.lit(0.48)).alias("__lo50"),
        F.percentile("value", F.lit(0.52)).alias("__hi50"),
        F.percentile("value", F.lit(0.93)).alias("__lo95"),
        F.percentile("value", F.lit(0.97)).alias("__hi95"),
        F.percentile_approx("value", F.lit(0.50), F.lit(10000)).alias("__a50"),
        F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("__a95"),
    )
    in_band_50 = (F.col("__a50") >= F.col("__lo50")) & (F.col("__a50") <= F.col("__hi50"))
    in_band_95 = (F.col("__a95") >= F.col("__lo95")) & (F.col("__a95") <= F.col("__hi95"))
    return s.select(
        "event_type",
        F.round("__p50", 6).alias("p50_exact"),
        F.round("__p95", 6).alias("p95_exact"),
        (in_band_50 & in_band_95).alias("approx_within_rank_band"),
    )


@query(
    "q254_rare_cells",
    oracle="""
    WITH obs AS (
        SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
    ),
    margins AS (SELECT lang, CAST(sum(o) AS BIGINT) AS row_n FROM obs GROUP BY lang),
    cols AS (SELECT source, CAST(sum(o) AS BIGINT) AS col_n FROM obs GROUP BY source),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
    grid AS (
        SELECT lang, source, row_n, col_n,
               CAST(coalesce(o, 0) AS BIGINT) AS o
        FROM margins CROSS JOIN cols
        LEFT JOIN obs USING (lang, source)
    )
    SELECT lang, source, o AS observed,
           round(row_n * CAST(col_n AS DOUBLE) / n, 6) AS expected,
           round(o * CAST(n AS DOUBLE) / (row_n * CAST(col_n AS DOUBLE)), 6)
               AS obs_over_exp
    FROM grid CROSS JOIN tot
    WHERE o * 3 * n < row_n * col_n AND row_n * col_n >= 3 * n
    """,
)
def q254_rare_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalously EMPTY contingency cells: (lang, source) combinations
    observed at under 1/3 of their independence expectation (with
    expected ≥ 3 so trivially small expectations don't alarm) — the
    cell-level drill-down behind q201's aggregate chi-square ("which
    source is missing which language").

    The probe runs over the FULL margins × cols grid (a never-observed
    combination is the most anomalous cell of all and is invisible to
    an observed-cells-only scan), left-joined to the observed counts;
    the grid is dimension × dimension sized, never fact sized.  Both
    the rarity flag and the validity floor are exact integer
    cross-multiplications, so cell membership can't flip on float
    division."""
    d = read_table(spark, sf_dir, "documents", columns=["lang", "source"])
    obs = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    margins = obs.groupBy("lang").agg(F.sum("o").alias("row_n"))
    cols = obs.groupBy("source").agg(F.sum("o").alias("col_n"))
    tot = obs.agg(F.sum("o").alias("n"))
    grid = margins.crossJoin(cols).join(obs, ["lang", "source"], "left")
    cells = (
        grid.withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    o, rn, cn, n = F.col("o"), F.col("row_n"), F.col("col_n"), F.col("n")
    return cells.where((o * 3 * n < rn * cn) & (rn * cn >= 3 * n)).select(
        "lang",
        "source",
        o.alias("observed"),
        F.round(rn * cn.cast("double") / n, 6).alias("expected"),
        F.round(o * n.cast("double") / (rn * cn.cast("double")), 6).alias(
            "obs_over_exp"
        ),
    )


@query(
    "q255_class_separability",
    oracle="""
    WITH comp AS (
        SELECT label, pos,
               CAST(CAST(embedding[pos + 1] AS DOUBLE) AS DECIMAL(12,7)) AS x
        FROM embeddings, (SELECT unnest(range(0, 64)) AS pos)
        WHERE pos < len(embedding)
    ),
    per AS (
        SELECT label, pos, count(*) AS nl,
               sum(x) AS s, sum(x * x) AS sq
        FROM comp GROUP BY label, pos
    ),
    gl AS (
        SELECT pos, CAST(sum(nl) AS BIGINT) AS n, sum(s) AS gs
        FROM per GROUP BY pos
    ),
    terms AS (
        SELECT p.label, p.pos,
               CAST(round(CAST(p.sq AS DOUBLE)
                          - CAST(p.s AS DOUBLE) * CAST(p.s AS DOUBLE) / p.nl, 10)
                    AS DECIMAL(28,10)) AS within_term,
               CAST(round(p.nl * pow(CAST(p.s AS DOUBLE) / p.nl
                                     - CAST(g.gs AS DOUBLE) / g.n, 2), 10)
                    AS DECIMAL(28,10)) AS between_term
        FROM per p JOIN gl g USING (pos)
    ),
    k AS (SELECT count(DISTINCT label) AS n_classes FROM comp),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_obs FROM comp)
    SELECT n_classes, n_obs,
           round(CAST(sum(between_term) AS DOUBLE), 6) AS between_ss,
           round(CAST(sum(within_term) AS DOUBLE), 6) AS within_ss,
           round((CAST(sum(between_term) AS DOUBLE) / (n_classes - 1))
                 / (CAST(sum(within_term) AS DOUBLE) / (n_obs - n_classes)), 6)
               AS f_ratio
    FROM terms CROSS JOIN k CROSS JOIN nn
    GROUP BY n_classes, n_obs
    """,
)
def q255_class_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA class separability of the embedding space: between-
    class vs within-class sum of squares pooled over all 64 dimensions,
    and the F ratio — the single score for "do these labels occupy
    distinct regions" (the statistical cousin of q238's kNN accuracy).

    Components round to DECIMAL(12,7) at ingestion (q132's idiom) so
    per-(label, dim) power sums are exact; each of the ≤ classes×dims
    SS terms rounds to DECIMAL(28,10) before the exact total (q150 —
    a double Σ over 640 terms is order-dependent); the F ratio is one
    mirrored double expression."""
    emb = read_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos", "__raw")
    ).select(
        "label", "pos", F.col("__raw").cast("double").cast("decimal(12,7)").alias("x")
    )
    per = comp.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("nl"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("sq"),
    )
    glob = per.groupBy("pos").agg(F.sum("nl").alias("n"), F.sum("s").alias("gs"))
    d = lambda c: c.cast("double")  # noqa: E731
    terms = per.join(glob, "pos").select(
        "label",
        "pos",
        F.round(d(F.col("sq")) - d(F.col("s")) * d(F.col("s")) / F.col("nl"), 10)
        .cast("decimal(28,10)")
        .alias("within_term"),
        F.round(
            F.col("nl")
            * F.pow(d(F.col("s")) / F.col("nl") - d(F.col("gs")) / F.col("n"), 2),
            10,
        )
        .cast("decimal(28,10)")
        .alias("between_term"),
    )
    k = comp.agg(F.countDistinct("label").alias("n_classes"))
    nn = comp.agg(F.count(F.lit(1)).alias("n_obs"))
    bss = F.sum("between_term").cast("double")
    wss = F.sum("within_term").cast("double")
    return (
        terms.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(nn))
        .groupBy("n_classes", "n_obs")
        .agg(
            F.round(bss, 6).alias("between_ss"),
            F.round(wss, 6).alias("within_ss"),
            F.round(
                (bss / (F.col("n_classes") - 1))
                / (wss / (F.col("n_obs") - F.col("n_classes"))),
                6,
            ).alias("f_ratio"),
        )
    )


@query(
    "q256_disparate_impact",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS tk,
               (1000 * len(list_distinct(string_split(text, ' '))))
                   // len(string_split(text, ' ')) AS score
        FROM documents
    ),
    tot AS (SELECT CAST(sum(tk) AS BIGINT) AS total_tk FROM scored),
    run AS (
        SELECT doc_id, source, tk,
               CAST(sum(tk) OVER (ORDER BY score DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        FROM scored
    ),
    rates AS (
        SELECT source,
               sum(CASE WHEN running * 2 <= total_tk THEN 1 ELSE 0 END) AS sel,
               count(*) AS n
        FROM run CROSS JOIN tot GROUP BY source
    ),
    mm AS (
        SELECT min(sel / CAST(n AS DOUBLE)) AS min_rate,
               max(sel / CAST(n AS DOUBLE)) AS max_rate
        FROM rates
    )
    SELECT round(min_rate, 6) AS min_rate, round(max_rate, 6) AS max_rate,
           round(min_rate / max_rate, 6) AS di_ratio,
           CASE WHEN min_rate * 5 < max_rate * 4 THEN 1 ELSE 0 END
               AS fails_80pct_rule
    FROM mm
    """,
)
def q256_disparate_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disparate-impact audit of q227's token-budget curation: the
    ratio of the least- to most-selected source's selection rate, with
    the classic 80%-rule flag — the governance check that a quality-
    ranked data mix isn't silently starving a source.

    Same selection rule as q227 (two-phase prefix sum + exact integer
    budget cut); the audit adds one tiny aggregate over the per-source
    rates, with the 80% flag as an exact cross-multiplication on the
    UNROUNDED rates (min·5 < max·4)."""
    from udacity_datalake_spark_spark.operators.topk import global_running_sum

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("tk"),
        F.expr(
            "CAST(1000 * size(array_distinct(split(text, ' '))) div "
            "size(split(text, ' ')) AS BIGINT)"
        ).alias("score"),
    )
    # persist: global_running_sum's quantile/count/window passes would
    # otherwise re-tokenize the corpus 3×
    scored = scored.transform(spersist)
    tot = scored.agg(F.sum("tk").alias("total_tk"))
    keyed = scored.withColumn("__sd", F.col("score").cast("double"))
    run = global_running_sum(
        keyed,
        [F.col("score").desc(), F.col("doc_id")],
        "__sd",
        "tk",
        out_col="running",
        descending=True,
    ).drop("__sd")
    sel = F.col("running") * 2 <= F.col("total_tk")
    rates = (
        run.crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum(F.when(sel, 1).otherwise(0)).alias("sel"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    rate = F.col("sel") / F.col("n").cast("double")
    mm = rates.select(rate.alias("r")).agg(
        F.min("r").alias("min_rate"), F.max("r").alias("max_rate")
    )
    return mm.select(
        F.round("min_rate", 6).alias("min_rate"),
        F.round("max_rate", 6).alias("max_rate"),
        F.round(F.col("min_rate") / F.col("max_rate"), 6).alias("di_ratio"),
        F.when(F.col("min_rate") * 5 < F.col("max_rate") * 4, 1)
        .otherwise(0)
        .alias("fails_80pct_rule"),
    )
