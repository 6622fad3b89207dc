"""Wave 74: LLM-data scaling-law estimation + supply-chain planning —
a data-scaling-law fit (held-out unigram NLL vs training-prefix size,
log-log OLS slope) and a service-level safety-stock planner.

Reference parity note: the reference (/root/reference/etl.py) has no
modeling surface; these extend the LM-eval family (q130/q224/q320),
the Heaps-growth curve (q363), and the inventory family
(q222/q258 dead stock).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

N_PREFIXES = 9  # train prefixes = deciles 1..9; decile 10 is held out


@query(
    "q394_scaling_law_fit",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, text,
               row_number() OVER (ORDER BY doc_id) AS drank,
               count(*) OVER () AS nd
        FROM documents
    ),
    toks AS (
        SELECT CAST(ceil(drank * 10.0 / nd) AS BIGINT) AS dec,
               unnest(string_split(text, ' ')) AS tok
        FROM ranked
    ),
    vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM toks),
    train_counts AS (
        SELECT tok, dec, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE dec <= {N_PREFIXES} GROUP BY tok, dec
    ),
    grid AS (SELECT unnest(range(1, {N_PREFIXES} + 1)) AS d),
    cum AS (
        SELECT g.d, t.tok, CAST(sum(t.c) AS BIGINT) AS c_d
        FROM grid g JOIN train_counts t ON t.dec <= g.d
        GROUP BY g.d, t.tok
    ),
    t_d AS (SELECT d, CAST(sum(c_d) AS BIGINT) AS t FROM cum GROUP BY d),
    held AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS h
        FROM toks WHERE dec = 10 GROUP BY tok
    ),
    h_tot AS (SELECT CAST(sum(h) AS BIGINT) AS ht FROM held),
    nll AS (
        SELECT g.d,
               CAST(sum(held.h * CAST(round(
                   ln((COALESCE(c.c_d, 0) + 1.0)
                      / (t_d.t + vocab.v)), 6) AS DECIMAL(18,6)))
                   AS DECIMAL(38,6)) AS s
        FROM grid g
        CROSS JOIN held
        LEFT JOIN cum c ON c.d = g.d AND c.tok = held.tok
        JOIN t_d ON t_d.d = g.d
        CROSS JOIN vocab
        GROUP BY g.d
    ),
    pts AS (
        SELECT nll.d AS decile, t_d.t AS train_tokens,
               CAST(round(-CAST(nll.s AS DOUBLE) / h_tot.ht, 6)
                    AS DECIMAL(18,6)) AS avg_nll,
               CAST(round(ln(CAST(t_d.t AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
               CAST(round(ln(-CAST(nll.s AS DOUBLE) / h_tot.ht), 6)
                    AS DECIMAL(18,6)) AS y
        FROM nll JOIN t_d ON t_d.d = nll.d CROSS JOIN h_tot
    ),
    fit AS (
        SELECT round(CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
                     / CAST(count(*) * sum(x * x) - sum(x) * sum(x)
                            AS DOUBLE), 6) AS slope
        FROM pts
    )
    SELECT CAST(p.decile AS BIGINT) AS decile, p.train_tokens,
           CAST(p.avg_nll AS DOUBLE) AS avg_nll,
           f.slope AS loglog_slope
    FROM pts p CROSS JOIN fit f
    ORDER BY decile
    """,
)
def q394_scaling_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data scaling-law estimation — the LLM-data question ("does more
    data still help, and at what exponent?") answered with the
    deterministic stand-in for model loss: held-out add-1-smoothed
    unigram NLL under models trained on growing corpus prefixes
    (deciles 1..9 train, decile 10 held out), plus the log-log OLS
    slope b of NLL ≈ a·Tᵇ (a negative b near 0 = diminishing returns —
    the Chinchilla-style curve fit, computable exactly at any scale).
    Per-token log-probs round to 6 decimals BEFORE the DECIMAL sums
    (the q130 idiom), so the curve and the fitted slope are
    reproducible across engines.

    Scale shape: one token explode with two-phase doc ranks; prefix
    models come from ONE (token, decile)-grain aggregate joined to the
    9-row decile grid (no per-prefix rescan of the corpus); the NLL
    join is (held-out vocab × 9); the fit is closed-form over 9
    points."""
    from udacity_datalake_spark_spark.operators.topk import global_row_number

    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    ranked = global_row_number(
        d, [F.col("doc_id")], "doc_id", out_col="drank"
    ).select("doc_id", "text", "drank")
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    toks = (
        ranked.crossJoin(F.broadcast(nd))
        .select(
            F.ceil(F.col("drank") * 10.0 / F.col("nd")).cast("long").alias("dec"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .transform(spersist)
    )
    vocab = toks.agg(F.count_distinct("tok").alias("v"))
    train_counts = (
        toks.where(F.col("dec") <= N_PREFIXES)
        .groupBy("tok", "dec")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = spark.range(1, N_PREFIXES + 1).select(F.col("id").alias("d"))
    cum = (
        grid.join(train_counts, train_counts.dec <= grid.d)
        .groupBy("d", "tok")
        .agg(F.sum("c").cast("long").alias("c_d"))
        .transform(spersist)
    )
    t_d = cum.groupBy("d").agg(F.sum("c_d").cast("long").alias("t"))
    held = toks.where(F.col("dec") == 10).groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("h")
    )
    h_tot = held.agg(F.sum("h").cast("long").alias("ht"))
    lp = F.round(
        F.log(
            (F.coalesce(F.col("c_d"), F.lit(0)) + 1.0) / (F.col("t") + F.col("v"))
        ),
        6,
    ).cast("decimal(18,6)")
    nll = (
        grid.crossJoin(held)
        .join(cum, ["d", "tok"], "left")
        .join(t_d, "d")
        .crossJoin(F.broadcast(vocab))
        .groupBy("d")
        .agg(F.sum(F.col("h") * lp).cast("decimal(38,6)").alias("s"))
    )
    pts = (
        nll.join(t_d, "d")
        .crossJoin(F.broadcast(h_tot))
        .select(
            F.col("d").alias("decile"),
            F.col("t").alias("train_tokens"),
            F.round(-F.col("s").cast("double") / F.col("ht"), 6)
            .cast("decimal(18,6)")
            .alias("avg_nll"),
            F.round(F.log(F.col("t").cast("double")), 6)
            .cast("decimal(18,6)")
            .alias("x"),
            F.round(F.log(-F.col("s").cast("double") / F.col("ht")), 6)
            .cast("decimal(18,6)")
            .alias("y"),
        )
        .transform(spersist)
    )
    fit = pts.agg(
        F.round(
            (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
                - F.sum("x") * F.sum("y")
            ).cast("double")
            / (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            ).cast("double"),
            6,
        ).alias("slope")
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "train_tokens",
            F.col("avg_nll").cast("double").alias("avg_nll"),
            F.col("slope").alias("loglog_slope"),
        )
        .orderBy("decile")
    )


#: z-score for a ~95% cycle service level, scaled by 100 (z = 1.65)
SAFETY_Z_X100 = 165
LEAD_TIME_DAYS = 7


@query(
    "q395_safety_stock",
    oracle=f"""
    WITH daily AS (
        SELECT p.p_brand AS brand, l.l_shipdate AS d,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(q) AS BIGINT) AS sq,
               CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sqq
        FROM daily GROUP BY brand
    )
    SELECT brand, n_days,
           round(CAST(sq AS DOUBLE) / n_days, 4) AS mean_daily_demand,
           round(sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n_days)
                      / (n_days - 1)), 4) AS sd_daily_demand,
           CAST(ceil({SAFETY_Z_X100}
                * sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n_days)
                       / (n_days - 1))
                * sqrt({LEAD_TIME_DAYS}) / 100) AS BIGINT) AS safety_stock,
           CAST(ceil(CAST(sq AS DOUBLE) / n_days * {LEAD_TIME_DAYS}
                + {SAFETY_Z_X100}
                  * sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n_days)
                         / (n_days - 1))
                  * sqrt({LEAD_TIME_DAYS}) / 100) AS BIGINT) AS reorder_point
    FROM stats
    WHERE n_days >= 2
    """,
)
def q395_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service-level safety stock per brand — the inventory-planning
    formula every replenishment system runs: SS = z·σ_daily·√L for a
    95% cycle service level (z = 1.65) over a {LEAD_TIME_DAYS}-day lead
    time, and reorder point = mean·L + SS.  Demand variance comes from
    exact integer power sums (the q128 recipe); the only doubles are
    the final sqrt/ceil, rounded/ceiled identically on both engines.

    Scale shape: fact → (brand, day) grain → brand-grain power sums;
    closed-form per brand."""
    li = read_table(
        spark, sf_dir, "lineitem", columns=["l_partkey", "l_shipdate", "l_quantity"]
    )
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand"])
    daily = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_shipdate").alias("d"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )
    stats = daily.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sqq"),
    )
    var = (
        F.col("sqq").cast("double")
        - F.col("sq").cast("double") * F.col("sq") / F.col("n_days")
    ) / (F.col("n_days") - 1)
    sd = F.sqrt(var)
    ss = SAFETY_Z_X100 * sd * F.sqrt(F.lit(float(LEAD_TIME_DAYS))) / 100
    return (
        stats.where(F.col("n_days") >= 2)
        .select(
            "brand",
            "n_days",
            F.round(F.col("sq").cast("double") / F.col("n_days"), 4).alias(
                "mean_daily_demand"
            ),
            F.round(sd, 4).alias("sd_daily_demand"),
            F.ceil(ss).cast("long").alias("safety_stock"),
            F.ceil(
                F.col("sq").cast("double") / F.col("n_days") * LEAD_TIME_DAYS + ss
            )
            .cast("long")
            .alias("reorder_point"),
        )
    )
