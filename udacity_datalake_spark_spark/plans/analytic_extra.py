"""Analytics-surface additions beyond the reference and the first 112
queries: exact quantile binning, semi-join reduction (bloom-style
prefilter), incremental aggregate maintenance, gaps-and-islands interval
merging, blocked fuzzy string matching, time-series gap filling, and
frame-windowed anomaly detection.

None of these exist in the reference (its surface is five star-schema
pipelines, SURVEY.md §2); they are the standard next ring of warehouse /
feature-pipeline operations a user would expect from a complete engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.topk import global_row_number
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q113_quantile_binning",
    oracle="""
    WITH b AS (
        SELECT quantile_cont(o_totalprice,
                             [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bnds
        FROM orders
    )
    SELECT len(list_filter(b.bnds, x -> o.o_totalprice > x)) AS bin,
           count(*) AS n,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders o, b
    GROUP BY 1
    """,
)
def q113_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature discretization: bin a numeric column into deciles by EXACT
    quantile boundaries, then aggregate per bin.

    Two-pass shape, not a global sort: pass 1 computes the 9 boundaries
    (one reduce to a single row), pass 2 broadcasts that row and assigns
    bins with a codegen-side array fold — so the fact table is scanned
    twice but never range-shuffled, unlike the NTILE formulation whose
    single total-order exchange is the classic 100 TB anti-pattern.  At
    scale pass 1 swaps to approx_percentile (the q22 sketch path) without
    touching pass 2.  Exact interpolating percentile matches DuckDB's
    quantile_cont bit-for-bit (proven by q66).
    """
    o = read_table(spark, sf_dir, "orders", columns=["o_totalprice"])
    taus = [i / 10 for i in range(1, 10)]
    bounds = o.agg(
        F.expr(f"percentile(o_totalprice, array({','.join(map(str, taus))}))").alias("bnds")
    )
    binned = o.join(F.broadcast(bounds)).select(
        F.aggregate(
            "bnds",
            F.lit(0),
            lambda acc, x: acc + F.when(F.col("o_totalprice") > x, 1).otherwise(0),
        ).alias("bin"),
        "o_totalprice",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
    )


@query(
    "q114_semijoin_reduction",
    oracle="""
    SELECT date_trunc('month', o.o_orderdate) AS order_month,
           count(*) AS n_lines,
           CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def q114_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-dim join executed with explicit semi-join reduction
    (a bloom-filter-style prefilter built from the dim side).

    The urgent-orders key set is compressed to its distinct hash-bucket
    values (key-domain >> 2^16 buckets) and broadcast; the fact side
    drops non-matching rows in the scan stage via a broadcast semi join
    on the bucket — an approximate-membership filter with zero false
    negatives, so the exact equi-join afterwards restores precise
    semantics.  This is what `runtime.bloomFilter` does adaptively; doing
    it declaratively guarantees the reduction even where the optimizer's
    size estimates miss, and at 100 TB it cuts the fact-side shuffle to
    ~the selectivity of the dim predicate (here ~20%) before any
    exchange.  Aggregation happens on the already-reduced rows.
    """
    o = read_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).where(F.col("o_orderpriority") == "1-URGENT")
    li = read_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    # bucketized key domain: tiny, broadcastable regardless of dim cardinality
    buckets = o.select(
        (F.xxhash64("o_orderkey").bitwiseAND(F.lit(0xFFFF))).alias("__bucket")
    ).distinct()
    li_reduced = li.withColumn(
        "__bucket", F.xxhash64("l_orderkey").bitwiseAND(F.lit(0xFFFF))
    ).join(F.broadcast(buckets), "__bucket", "left_semi")

    revenue = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    return (
        li_reduced.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


@query(
    "q115_incremental_agg_merge",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q115_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: per-DAY partial
    aggregate states merged up to the per-MONTH result, proven equal to
    the direct monthly aggregate (the oracle).

    The state {count, decimal-sum, min, max} is algebraic — merge is
    (+, +, min, max) — so a 100 TB pipeline maintains the daily partials
    as its landing aggregate and answers any coarser grain by merging a
    few thousand tiny state rows instead of rescanning the fact table.
    Decimal sums make the merge order irrelevant (bit-stable); the same
    two-level shape extends to avg (sum/count) and HLL distinct (q96).
    """
    o = read_table(spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("order_day")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("o_totalprice")).alias("s"),
        F.min(dec("o_totalprice")).alias("mn"),
        F.max(dec("o_totalprice")).alias("mx"),
    )
    return daily.groupBy(F.date_trunc("month", "order_day").alias("order_month")).agg(
        F.sum("cnt").alias("n_orders"),
        F.sum("s").cast("double").alias("total"),
        F.min("mn").cast("double").alias("lo"),
        F.max("mx").cast("double").alias("hi"),
    )


@query(
    "q116_interval_islands",
    oracle="""
    WITH iv AS (
        SELECT l_suppkey,
               l_shipdate AS s,
               l_shipdate + to_days(CAST(l_quantity AS INT)) AS e,
               l_orderkey, l_linenumber
        FROM lineitem
        WHERE l_returnflag = 'R'
    ), marked AS (
        SELECT l_suppkey, s, e, l_orderkey, l_linenumber,
               CASE WHEN s > max(e) OVER (
                   PARTITION BY l_suppkey ORDER BY s, e, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), islands AS (
        SELECT l_suppkey, s, e,
               sum(new_island) OVER (
                   PARTITION BY l_suppkey ORDER BY s, e, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
        FROM marked
    ), merged AS (
        SELECT l_suppkey, island_id, min(s) AS island_start, max(e) AS island_end,
               count(*) AS n_intervals
        FROM islands GROUP BY 1, 2
    )
    SELECT l_suppkey,
           count(*) AS n_islands,
           max(n_intervals) AS max_overlap_run,
           CAST(sum(date_diff('day', island_start, island_end)) AS BIGINT)
               AS covered_days
    FROM merged GROUP BY 1
    """,
)
def q116_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: merge each supplier's overlapping shipment
    intervals [shipdate, shipdate + quantity days] and measure coverage.

    The classic linear-scan algorithm expressed as two window passes over
    ONE hash exchange on the key: an interval opens a new island iff its
    start exceeds the running max end of every earlier interval, then a
    prefix sum of those flags labels islands.  No self-join — the naive
    overlap-join formulation is O(n²) per key and unrunnable at 100 TB,
    while this is O(n log n) (the in-partition sort) with no extra
    shuffle.  Window frames and the island aggregate reuse the same
    partitioning, so Catalyst plans a single Exchange.

    Both oracle window passes ORDER BY the full (s, e, l_orderkey,
    l_linenumber) total order: with duplicate (s, e) pairs per supplier
    (common in the sf1 fixture's keyed replication) an ORDER BY s, e
    alone lets the engine permute tied rows differently between the
    flag pass and the prefix-sum pass, re-assigning tied rows across
    island boundaries (seen at sf1: 876 covered_days mismatches).  The
    Spark side already uses the total order in both windows.
    """
    iv = (
        read_table(
            spark,
            sf_dir,
            "lineitem",
            columns=[
                "l_suppkey",
                "l_shipdate",
                "l_quantity",
                "l_returnflag",
                "l_orderkey",
                "l_linenumber",
            ],
        )
        .where(F.col("l_returnflag") == "R")
        .select(
            "l_suppkey",
            F.col("l_shipdate").alias("s"),
            F.timestamp_add("DAY", F.col("l_quantity").cast("int"), F.col("l_shipdate")).alias(
                "e"
            ),
            "l_orderkey",
            "l_linenumber",
        )
    )
    order = [F.col("s"), F.col("e"), F.col("l_orderkey"), F.col("l_linenumber")]
    w_prev = (
        Window.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        iv.withColumn(
            "new_island",
            F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0),
        )
        .withColumn("island_id", F.sum("new_island").over(w_run))
        .groupBy("l_suppkey", "island_id")
        .agg(
            F.min("s").alias("island_start"),
            F.max("e").alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )
    return islands.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("n_intervals").alias("max_overlap_run"),
        F.sum(F.datediff(F.col("island_end"), F.col("island_start"))).alias("covered_days"),
    )


@query(
    "q117_fuzzy_string_join",
    oracle="""
    SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a
    JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND abs(len(a.p_name) - len(b.p_name)) <= 2
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def q117_fuzzy_string_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy string matching: near-identical part names within a
    brand at Levenshtein distance ≤ 2 (typo-level entity resolution).

    The quadratic comparison is confined to brand blocks: the join's
    equi-component (p_brand) keeps it a HASH join — each block lands in
    one task and only in-block pairs are enumerated, never the global
    cross product.  The length-difference band is a free pre-filter
    (|len a − len b| > k ⇒ edit distance > k), and the kernel is the
    THRESHOLDED levenshtein (returns −1 past the bound): Ukkonen's
    banded algorithm, O(k·len) per pair instead of O(len²) — the
    dominant cost since almost every candidate pair is a non-match.
    All JVM codegen.  At 100 TB one re-blocks on (brand, length-band)
    or a q46-style MinHash prefilter to bound the worst block;
    semantics are unchanged.
    """
    cols = ["p_partkey", "p_name", "p_brand"]
    a = read_table(spark, sf_dir, "part", columns=cols).toDF("pk_a", "name_a", "brand")
    b = read_table(spark, sf_dir, "part", columns=cols).toDF("pk_b", "name_b", "brand")
    pairs = a.join(
        b,
        (a["brand"] == b["brand"])
        & (F.col("pk_a") < F.col("pk_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= 2
        ),
    )
    return (
        pairs.withColumn("dist", F.levenshtein("name_a", "name_b", 2))
        .where(F.col("dist") >= 0)
        .select("pk_a", "pk_b", "name_a", "name_b", "dist")
    )


@query(
    "q118_gap_fill_forward",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        FROM events
        WHERE user_id <= 20
        GROUP BY 1, 2
    ), spine AS (
        SELECT user_id, unnest(generate_series(min(day), max(day),
                                               INTERVAL 1 DAY)) AS day
        FROM daily GROUP BY user_id
    )
    SELECT s.user_id, s.day,
           d.day_value IS NOT NULL AS observed,
           last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def q118_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: build each user's full daily date
    spine and forward-fill (LOCF) days with no events.

    The spine is generated distributively — sequence() per user inside
    the day-aggregate's existing partitioning, then explode — so no
    driver-side calendar and no cross join against a date dimension.
    The fill is last_value(... ignore nulls) over the same user_id
    partitioning the aggregate already produced: Catalyst reuses one
    Exchange for agg + spine join + window.  Output cardinality is
    bounded by users × active-range days, independent of event volume.
    """
    daily = (
        read_table(spark, sf_dir, "events", columns=["user_id", "ts", "value"])
        .where(F.col("user_id") <= 20)
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(dec("value")).cast("double").alias("day_value"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("day_value").isNotNull().alias("observed"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@query(
    "q119_rolling_anomaly",
    oracle="""
    WITH d AS (
        SELECT user_id, ts, event_id,
               CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS v,
               CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS s,
               CAST(sum(CAST(value AS DECIMAL(18,4))
                        * CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sq,
               count(*) OVER w AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, ts, event_id, v,
           round((v - s / n) / sqrt((sq - s * s / n) / (n - 1)), 4) AS z
    FROM d
    WHERE n >= 10
      AND (sq - s * s / n) / (n - 1) > 0
      AND abs(round((v - s / n) / sqrt((sq - s * s / n) / (n - 1)), 4)) > 2.5
    """,
)
def q119_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-windowed anomaly detection: flag events whose value deviates
    > 2.5σ from the trailing-20-event distribution of the same user (the
    current row excluded from its own baseline — no self-leakage).

    One hash exchange on user_id; the trailing sums are decimal inside
    the frame, so Spark's incremental sliding-frame accumulation and
    DuckDB's segment tree produce the SAME exact state regardless of
    evaluation order, and the variance/z math is then a fixed IEEE
    expression over identical inputs — bit-stable across engines.  This
    is the batch twin of the q54/applyInPandasWithState streaming shape
    and runs unchanged as a Structured Streaming window-less stateful op.
    """
    e = read_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    v4 = dec("value", 18, 4)
    d = e.select(
        "user_id",
        "ts",
        "event_id",
        v4.cast("double").alias("v"),
        F.sum(v4).over(w).cast("double").alias("s"),
        F.sum(v4 * v4).over(w).cast("double").alias("sq"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    z = F.round((F.col("v") - F.col("s") / F.col("n")) / F.sqrt(var), 4)
    return (
        d.where((F.col("n") >= 10) & (var > 0) & (F.abs(z) > 2.5))
        .select("user_id", "ts", "event_id", "v", z.alias("z"))
    )


@query(
    "q120_vocab_build",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
        FROM documents
    ), counts AS (
        SELECT token, count(*) AS cnt
        FROM tok WHERE token <> ''
        GROUP BY 1 HAVING count(*) >= 5
    )
    SELECT token, cnt,
           row_number() OVER (ORDER BY cnt DESC, token) - 1 AS token_id
    FROM counts
    """,
)
def q120_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary construction: corpus token counts, min-count
    pruning, contiguous deterministic ID assignment (count-desc, then
    lexicographic — the standard training-pipeline vocab order).

    Token counting is the scalable part: explode happens inside the scan
    stage and partial aggregation collapses to distinct tokens before the
    one token-keyed exchange.  ID assignment is a global row_number
    over the PRUNED VOCABULARY, and even that is two-phase
    (operators.topk.global_row_number: quantile buckets + per-bucket
    row_number + exact count offsets), so no single-partition sort
    anywhere — a 10⁶-row vocabulary ranks across the cluster, not on
    one core.  monotonically_increasing_id
    is rejected deliberately: its values depend on partitioning and are
    neither contiguous nor stable across runs.
    """
    docs = read_table(spark, sf_dir, "documents", columns=["text"])
    counts = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 5)
    )
    return global_row_number(
        counts, [F.col("cnt").desc(), F.col("token")], "cnt", descending=True
    ).select("token", "cnt", (F.col("rn") - 1).alias("token_id"))


@query(
    "q121_argmax_per_group",
    oracle="""
    SELECT o_orderpriority,
           CAST((max({'p': CAST(o_totalprice AS DECIMAL(18,2)), 'k': o_orderkey})).p
                AS DOUBLE) AS top_price,
           (max({'p': CAST(o_totalprice AS DECIMAL(18,2)), 'k': o_orderkey})).k
               AS top_orderkey,
           CAST((min({'p': CAST(o_totalprice AS DECIMAL(18,2)), 'k': o_orderkey})).p
                AS DOUBLE) AS bottom_price,
           (min({'p': CAST(o_totalprice AS DECIMAL(18,2)), 'k': o_orderkey})).k
               AS bottom_orderkey
    FROM orders
    GROUP BY 1
    """,
)
def q121_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG_MAX / MAX_BY surface: the row identifier attaining each
    group's extreme value, via lexicographic struct-max.

    max(struct(value, key)) is the deterministic form of max_by — ties
    on value resolve by key, so the answer is unique under any
    partitioning (bare max_by keeps an arbitrary winner on ties, which
    would flunk the bit-stability rule).  It is a plain algebraic
    aggregate: map-side partials carry ONE struct per group, vs the
    window-rank formulation (q13) that shuffles every row.  Use this
    shape when only the argmax row is needed; the window when the top-k
    for k>1 is.
    """
    o = read_table(spark, sf_dir, "orders", columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    pk = F.struct(dec("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return o.groupBy("o_orderpriority").agg(
        F.max(pk).getField("p").cast("double").alias("top_price"),
        F.max(pk).getField("k").alias("top_orderkey"),
        F.min(pk).getField("p").cast("double").alias("bottom_price"),
        F.min(pk).getField("k").alias("bottom_orderkey"),
    )


@query(
    "q122_distribution_ranks",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def q122_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing analytics: quartile bucket, percent_rank and
    cume_dist of every order within its priority class.

    The ordering key (o_totalprice, o_orderkey) is unique, so peer
    groups are singletons and all three functions are total-order
    deterministic; the ratios are exact small-integer divisions, IEEE-
    identical across engines.  Per-priority partitioning keeps this a
    hash exchange + in-partition sort; a GLOBAL ntile would be a single-
    partition sort — for that shape use q113's boundary-broadcast
    two-pass instead.
    """
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q125_percent_of_total",
    oracle="""
    WITH nat AS (
        SELECT n.n_regionkey, n.n_name,
               CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                             AS DECIMAL(18,4))) AS DOUBLE) AS nation_rev
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT r.r_name, nat.n_name, nat.nation_rev,
           round(nat.nation_rev / sum(nat.nation_rev) OVER (PARTITION BY nat.n_regionkey), 6)
               AS region_share
    FROM nat JOIN region r ON nat.n_regionkey = r.r_regionkey
    """,
)
def q125_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis (RATIO_TO_REPORT): each nation's share of
    its region's supplier revenue.

    The fact table is reduced FIRST — decimal-exact revenue per nation
    (tiny) — and only then does the window-sum share computation run,
    over ~25 rows; the dims broadcast onto the fact scan.  Putting the
    percent-of-total window before aggregation would shuffle the fact
    table twice at 100 TB for the same answer.  The share divides two
    doubles derived from the same decimal sums, so it is engine-exact
    before rounding.
    """
    li = read_table(spark, sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])
    s = read_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n = read_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_regionkey", "n_name"])
    r = read_table(spark, sf_dir, "region", columns=["r_regionkey", "r_name"])
    vol = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    nat = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(vol).cast("double").alias("nation_rev"))
    )
    w = Window.partitionBy("n_regionkey")
    return (
        nat.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "r_name",
            "n_name",
            "nation_rev",
            F.round(F.col("nation_rev") / F.sum("nation_rev").over(w), 6).alias("region_share"),
        )
    )
