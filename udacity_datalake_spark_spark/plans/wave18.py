"""Wave 18: merchandising / economics analytics — price-volume bridge,
ABC/XYZ inventory classification, winsorized robust means, and an
interpolated bigram language model.

q222 introduces `operators.topk.global_running_sum`: the cumulative-
revenue-share cutoffs need a full-frame prefix sum over the part
dimension, which GROWS with TPC-H scale factor — so the running total
uses the same two-phase bucketed machinery as global_row_number instead
of a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.topk import global_running_sum
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


def _nation_part_year(spark: SparkSession, sf_dir: str, y1: str, y2: str) -> DataFrame:
    """Per (customer-nation, part) revenue and quantity for one year
    window — the grain of the price-volume bridge."""
    li = read_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_extendedprice", "l_discount", "l_quantity"],
    )
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    n = read_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    o = o.where(
        (F.col("o_orderdate") >= F.lit(y1).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(y2).cast("timestamp"))
    )
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("l_partkey").alias("pk"))
        .agg(F.sum(rev).alias("r"), F.sum(dec("l_quantity")).alias("q"))
    )


_BRIDGE_YEAR_SQL = """
        SELECT n.n_name AS nation, l.l_partkey AS pk,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '{y1}'
          AND o.o_orderdate < TIMESTAMP '{y2}'
        GROUP BY 1, 2
"""


@query(
    "q221_price_volume_bridge",
    oracle=f"""
    WITH y1 AS ({_BRIDGE_YEAR_SQL.format(y1="1995-01-01", y2="1996-01-01")}),
    y2 AS ({_BRIDGE_YEAR_SQL.format(y1="1996-01-01", y2="1997-01-01")}),
    j AS (
        SELECT nation, y1.r AS r1, y1.q AS q1, y2.r AS r2, y2.q AS q2,
               CASE WHEN y1.r IS NOT NULL AND y2.r IS NOT NULL THEN
                   CAST(floor(CAST(y2.q AS DOUBLE) * CAST(y1.r AS DOUBLE)
                              / CAST(y1.q AS DOUBLE) * 10000 + 0.5) AS BIGINT)
               END AS cross_i
        FROM y1 FULL JOIN y2 USING (nation, pk)
    )
    SELECT nation,
           round(CAST(coalesce(sum(r1), 0) AS DOUBLE), 6) AS rev_y1,
           round(CAST(coalesce(sum(r2), 0) AS DOUBLE), 6) AS rev_y2,
           round(CAST(coalesce(sum(cross_i), 0) AS DOUBLE) / 10000
                 - CAST(coalesce(sum(CASE WHEN cross_i IS NOT NULL
                                          THEN r1 END), 0) AS DOUBLE), 6)
               AS volume_effect,
           round(CAST(coalesce(sum(CASE WHEN cross_i IS NOT NULL
                                        THEN r2 END), 0) AS DOUBLE)
                 - CAST(coalesce(sum(cross_i), 0) AS DOUBLE) / 10000, 6)
               AS price_effect,
           round(CAST(coalesce(sum(CASE WHEN r1 IS NULL THEN r2 END), 0)
                      AS DOUBLE), 6) AS new_parts_rev,
           round(CAST(coalesce(sum(CASE WHEN r2 IS NULL THEN r1 END), 0)
                      AS DOUBLE), 6) AS discontinued_rev
    FROM j GROUP BY nation
    """,
)
def q221_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge 1995→1996 per customer nation, decomposed into
    volume effect (quantity change at old prices), price effect
    (realized-price change at new volumes), and new/discontinued part
    revenue — the finance "why did revenue move" waterfall, with the
    identity Δrev = volume + price + new − discontinued holding exactly.

    Scale shape: each year is one fact aggregate to the (nation, part)
    grain (customer/nation broadcast; one orders-keyed shuffle), the two
    year frames full-outer-join at part-dimension size, and the single
    non-exact term — old unit price × new quantity — is rounded to
    integer ten-thousandths per part BEFORE the nation sum (q150's
    round-then-exact-sum discipline, with the rounding spelled as
    floor(x·10⁴ + 0.5) because engine-native double round differs by an
    ulp between Spark's exact-BigDecimal and DuckDB's scaled-std::round
    on boundary values), so every output is partition-order
    independent."""
    y1 = _nation_part_year(spark, sf_dir, "1995-01-01", "1996-01-01").select(
        "nation", "pk", F.col("r").alias("r1"), F.col("q").alias("q1")
    )
    y2 = _nation_part_year(spark, sf_dir, "1996-01-01", "1997-01-01").select(
        "nation", "pk", F.col("r").alias("r2"), F.col("q").alias("q2")
    )
    j = y1.join(y2, ["nation", "pk"], "full_outer").withColumn(
        "cross_i",
        F.when(
            F.col("r1").isNotNull() & F.col("r2").isNotNull(),
            F.floor(
                F.col("q2").cast("double")
                * F.col("r1").cast("double")
                / F.col("q1").cast("double")
                * 10000
                + 0.5
            ),
        ),
    )
    matched = F.col("cross_i").isNotNull()
    z = F.lit(0)
    return j.groupBy("nation").agg(
        F.round(F.coalesce(F.sum("r1"), z).cast("double"), 6).alias("rev_y1"),
        F.round(F.coalesce(F.sum("r2"), z).cast("double"), 6).alias("rev_y2"),
        F.round(
            F.coalesce(F.sum("cross_i"), z).cast("double") / 10000
            - F.coalesce(F.sum(F.when(matched, F.col("r1"))), z).cast("double"),
            6,
        ).alias("volume_effect"),
        F.round(
            F.coalesce(F.sum(F.when(matched, F.col("r2"))), z).cast("double")
            - F.coalesce(F.sum("cross_i"), z).cast("double") / 10000,
            6,
        ).alias("price_effect"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("r1").isNull(), F.col("r2"))), z).cast("double"),
            6,
        ).alias("new_parts_rev"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("r2").isNull(), F.col("r1"))), z).cast("double"),
            6,
        ).alias("discontinued_rev"),
    )


@query(
    "q222_abc_xyz_classification",
    oracle="""
    WITH pr AS (
        SELECT l_partkey AS pk,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(r) AS tr FROM pr),
    abc AS (
        SELECT pk, r,
               CASE WHEN sum(r) OVER (ORDER BY r DESC, pk
                                      ROWS UNBOUNDED PRECEDING) * 100 <= tr * 80
                    THEN 'A'
                    WHEN sum(r) OVER (ORDER BY r DESC, pk
                                      ROWS UNBOUNDED PRECEDING) * 100 <= tr * 95
                    THEN 'B' ELSE 'C' END AS abc_class
        FROM pr CROSS JOIN tot
    ),
    m AS (
        SELECT l_partkey AS pk, date_trunc('month', o_orderdate) AS mo,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qc
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    x AS (
        SELECT pk, count(*) AS n, CAST(sum(qc) AS BIGINT) AS s,
               CAST(sum(qc * qc) AS BIGINT) AS sqq
        FROM m GROUP BY pk
    ),
    xyz AS (
        SELECT pk,
               CASE WHEN 4 * (n * sqq - s * s) <= s * s THEN 'X'
                    WHEN n * sqq - s * s <= s * s THEN 'Y'
                    ELSE 'Z' END AS xyz_class
        FROM x
    )
    SELECT abc_class, xyz_class, count(*) AS n_parts,
           round(CAST(sum(r) AS DOUBLE), 2) AS class_revenue
    FROM abc JOIN xyz USING (pk)
    GROUP BY 1, 2
    """,
)
def q222_abc_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ inventory matrix: parts classed A/B/C by cumulative
    revenue share (80% / 95% cutoffs) and X/Y/Z by demand variability
    (monthly-quantity CV ≤ 0.5 / ≤ 1 / above) — the planner's view of
    which SKUs are high-value-stable vs low-value-erratic.

    The cumulative share runs through ``global_running_sum`` (two-phase
    bucketed prefix sum — the part dimension grows with SF, so no
    single-partition window), cutoffs compare exact DECIMAL cross-
    products (run·100 ≤ total·80), and the CV bands compare exact int64
    cross-products of quantity-cent power sums (4·(n·Σq²−S²) ≤ S²) — no
    float thresholds anywhere."""
    li = read_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_extendedprice", "l_discount", "l_quantity"],
    )
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(F.sum(rev).alias("r"))
    tot = pr.agg(F.sum("r").alias("tr"))
    keyed = pr.withColumn("__rd", F.col("r").cast("double"))
    run = global_running_sum(
        keyed, [F.col("r").desc(), F.col("pk")], "__rd", "r",
        out_col="__run", descending=True,
    ).drop("__rd")
    abc = run.crossJoin(F.broadcast(tot)).select(
        "pk",
        "r",
        F.when(F.col("__run") * 100 <= F.col("tr") * 80, "A")
        .when(F.col("__run") * 100 <= F.col("tr") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.date_trunc("month", "o_orderdate").alias("mo"),
        )
        .agg((F.sum(dec("l_quantity")) * 100).cast("long").alias("qc"))
    )
    x = m.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qc").alias("s"),
        F.sum(F.col("qc") * F.col("qc")).alias("sqq"),
    )
    var_num = F.col("n") * F.col("sqq") - F.col("s") * F.col("s")
    xyz = x.select(
        "pk",
        F.when(4 * var_num <= F.col("s") * F.col("s"), "X")
        .when(var_num <= F.col("s") * F.col("s"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "pk")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("r").cast("double"), 2).alias("class_revenue"),
        )
    )


@query(
    "q223_winsorized_stats",
    oracle="""
    WITH th AS (
        SELECT event_type, quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type
    ),
    w AS (
        SELECT e.event_type, lo, hi,
               CAST(round(least(greatest(e.value, lo), hi), 6)
                    AS DECIMAL(18,6)) AS wv,
               CAST(round(e.value, 6) AS DECIMAL(18,6)) AS rv
        FROM events e JOIN th USING (event_type)
    )
    SELECT event_type, count(*) AS n,
           round(min(lo), 6) AS p05, round(max(hi), 6) AS p95,
           round(CAST(sum(wv) AS DOUBLE) / count(*), 6) AS winsorized_mean,
           round(CAST(sum(rv) AS DOUBLE) / count(*), 6) AS raw_mean
    FROM w GROUP BY event_type
    """,
)
def q223_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clamp values to the exact
    [p05, p95] band, then average — the robust-mean companion to q146's
    MAD that keeps units interpretable (heavy-tailed revenue metrics
    report this, not the raw mean).

    Two passes over the fact: percentile thresholds per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, the q66-proven pair),
    broadcast back, then clamp + round-to-DECIMAL(18,6) per row before
    the exact sum — so the means are partition-order independent even
    though the thresholds are interpolated doubles.  At 100 TB the
    threshold pass swaps to approx_percentile (documented sketch path);
    the winsorize pass is unchanged."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "value"])
    th = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    w = e.join(F.broadcast(th), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.round(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 6)
        .cast("decimal(18,6)")
        .alias("wv"),
        F.round("value", 6).cast("decimal(18,6)").alias("rv"),
    )
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("lo"), 6).alias("p05"),
        F.round(F.max("hi"), 6).alias("p95"),
        F.round(F.sum("wv").cast("double") / F.count(F.lit(1)), 6).alias(
            "winsorized_mean"
        ),
        F.round(F.sum("rv").cast("double") / F.count(F.lit(1)), 6).alias("raw_mean"),
    )


@query(
    "q224_bigram_lm_score",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(arr)),
                      i -> array_to_string(arr[i:i+1], ' '))) AS gram
        FROM t WHERE len(arr) >= 2
    ),
    db AS (
        SELECT doc_id, split_part(gram, ' ', 1) AS p, split_part(gram, ' ', 2) AS nx,
               count(*) AS c_db
        FROM bg GROUP BY 1, 2, 3
    ),
    big AS (SELECT p, nx, CAST(sum(c_db) AS BIGINT) AS c_b FROM db GROUP BY 1, 2),
    uni AS (
        SELECT unnest(arr) AS term FROM t
    ),
    uc AS (SELECT term, count(*) AS c_u FROM uni GROUP BY term),
    tot AS (SELECT count(*) AS n FROM uni),
    probs AS (
        SELECT p, nx,
               CAST(round(ln(0.7 * c_b / up.c_u
                             + 0.3 * un.c_u / CAST(n AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS lp
        FROM big
        JOIN uc up ON big.p = up.term
        JOIN uc un ON big.nx = un.term
        CROSS JOIN tot
    )
    SELECT doc_id, CAST(sum(c_db) AS BIGINT) AS n_bigrams,
           round(-(CAST(sum(c_db * lp) AS DOUBLE) / sum(c_db)), 6) AS avg_nll
    FROM db JOIN probs USING (p, nx)
    GROUP BY doc_id
    """,
)
def q224_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram language-model scoring: every document's
    average negative log-likelihood under P(next|prefix) =
    0.7·MLE_bigram + 0.3·MLE_unigram, trained on the corpus itself —
    q130's quality signal upgraded to second-order structure (catches
    shuffled-word spam a unigram model scores as fluent).

    The probability table lives at bigram-VOCABULARY grain (two
    vocabulary-keyed joins + one broadcast total), never at corpus
    grain; each log-prob rounds to DECIMAL(18,6) before the per-doc
    weighted sum (q130's discipline) so doc scores are exact.  Doc↔prob
    matching is one bigram-keyed shuffle join."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    t = d.select("doc_id", F.split("text", " ").alias("arr"))
    pairs = t.where(F.size("arr") >= 2).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("arr") - 1)).alias("i"),
        "arr",
    ).select(
        "doc_id",
        F.element_at("arr", F.col("i")).alias("p"),
        F.element_at("arr", F.col("i") + 1).alias("nx"),
    )
    db = pairs.groupBy("doc_id", "p", "nx").agg(F.count(F.lit(1)).alias("c_db"))
    big = db.groupBy("p", "nx").agg(F.sum("c_db").alias("c_b"))
    uni = t.select(F.explode("arr").alias("term"))
    uc = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c_u"))
    tot = uni.agg(F.count(F.lit(1)).alias("n"))
    probs = (
        big.join(uc.select(F.col("term").alias("p"), F.col("c_u").alias("cu_p")), "p")
        .join(uc.select(F.col("term").alias("nx"), F.col("c_u").alias("cu_n")), "nx")
        .crossJoin(F.broadcast(tot))
        .select(
            "p",
            "nx",
            F.round(
                F.log(
                    0.7 * F.col("c_b") / F.col("cu_p")
                    + 0.3 * F.col("cu_n") / F.col("n").cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    return (
        db.join(probs, ["p", "nx"])
        .groupBy("doc_id")
        .agg(
            F.sum("c_db").alias("n_bigrams"),
            F.round(
                -(F.sum(F.col("c_db") * F.col("lp")).cast("double") / F.sum("c_db")), 6
            ).alias("avg_nll"),
        )
    )
