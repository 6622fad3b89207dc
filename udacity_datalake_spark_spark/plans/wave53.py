"""Wave 53: semi-structured VARIANT ingestion (Spark 4's variant type
over JSON event envelopes), sequential pattern mining (top action
trigrams within sessions), and weekday seasonality via
ratio-to-moving-average — three more families a production analytics
stack carries.

Reference parity note: the reference (etl.py, /root/reference) reads
JSON with a fixed schema only; q328 adds the schema-flexible VARIANT
path.  q329/q330 extend the q185/q205 (transitions) and q213 (seasonal
autocorrelation) families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.topk import ranked_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q328_variant_ingestion",
    oracle="""
    WITH env AS (
        SELECT json_object('type', event_type, 'user', user_id,
                           'val', CAST(round(CAST(value AS DECIMAL(18,2)), 2)
                                       AS VARCHAR)) AS doc
        FROM events
    )
    SELECT CAST(json_extract_string(doc, '$.type') AS VARCHAR) AS event_type,
           count(*) AS n,
           CAST(count(DISTINCT CAST(json_extract_string(doc, '$.user') AS BIGINT))
                AS BIGINT) AS n_users,
           CAST(sum(CAST(json_extract_string(doc, '$.val') AS DECIMAL(18,2))) * 100
                AS BIGINT) AS total_val_cents
    FROM env
    GROUP BY 1
    """,
)
def q328_variant_ingestion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-flexible semi-structured ingestion: events round-trip
    through a JSON envelope into Spark 4's VARIANT type (``parse_json``
    → ``variant_get`` path extraction) and aggregate from the extracted
    fields — the landing-zone shape for payloads whose schema evolves
    faster than the warehouse (the reference pins a fixed JSON schema;
    VARIANT is the escape hatch its logs pipeline would need).

    Scale shape: parse + extraction are per-row codegen over the
    variant encoding (no Python), and the aggregate is the standard
    map-side-combined shuffle; money stays DECIMAL end-to-end (the
    value is rounded to cents BEFORE envelope encoding on both engines,
    so the string round-trip is exact)."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "user_id", "value"])
    env = e.select(
        F.parse_json(
            F.to_json(
                F.struct(
                    F.col("event_type").alias("type"),
                    F.col("user_id").alias("user"),
                    F.round(F.col("value").cast("decimal(18,2)"), 2)
                    .cast("string")
                    .alias("val"),
                )
            )
        ).alias("v")
    )
    return (
        env.select(
            F.variant_get("v", "$.type", "string").alias("event_type"),
            F.variant_get("v", "$.user", "bigint").alias("user"),
            F.variant_get("v", "$.val", "string")
            .cast("decimal(18,2)")
            .alias("val"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user").alias("n_users"),
            (F.sum("val") * 100).cast("long").alias("total_val_cents"),
        )
    )


SESSION_GAP_MIN = 30


@query(
    "q329_session_trigrams",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN * 60 * 1_000_000}
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, ts, event_id,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered
    ),
    tri AS (
        SELECT event_type AS a,
               lead(event_type, 1) OVER w2 AS b,
               lead(event_type, 2) OVER w2 AS c,
               sid,
               lead(sid, 2) OVER w2 AS sid2
        FROM sess
        WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
    ),
    counts AS (
        SELECT a, b, c, count(*) AS n
        FROM tri WHERE c IS NOT NULL AND sid2 = sid
        GROUP BY 1, 2, 3
    )
    SELECT a, b, c, CAST(n AS BIGINT) AS n,
           CAST(row_number() OVER (ORDER BY n DESC, a, b, c) AS INT) AS rn
    FROM counts
    QUALIFY rn <= 20
    """,
)
def q329_session_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining: the top-20 three-step action sequences
    occurring INSIDE a session (30-minute inactivity gap, q65's rule) —
    the funnel-discovery primitive that finds the paths worth
    instrumenting (q185/q205 stop at two steps).

    Scale shape: sessionization and the double-lead are key-local
    windows on ONE (user_id) exchange; trigram counts map-side combine
    on the bounded event-type³ key space; the top-20 plans as
    TakeOrderedAndProject."""
    e = read_table(
        spark, sf_dir, "events", columns=["event_id", "event_type", "user_id", "ts"]
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > SESSION_GAP_MIN * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    sess = e.withColumn(
        "sid",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    tri = sess.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w2).alias("b"),
        F.lead("event_type", 2).over(w2).alias("c"),
    )
    counts = (
        tri.where(F.col("c").isNotNull())
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return ranked_topk(
        counts, [F.col("n").desc(), F.col("a"), F.col("b"), F.col("c")], 20, rank_col="rn"
    )


@query(
    "q330_weekday_seasonality",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    ma AS (
        SELECT d, rev,
               count(*) OVER w AS n_win,
               CAST(avg(CAST(rev AS DOUBLE)) OVER w AS DOUBLE) AS ma7
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    ratios AS (
        SELECT dayofweek(d) AS dow, rev,
               CAST(floor(CAST(rev AS DOUBLE) / ma7 * 1e10 + 0.5) AS BIGINT)
                   AS ratio_sc
        FROM ma WHERE n_win = 7
    )
    SELECT CAST(dow AS INT) AS dow,
           count(*) AS n_days,
           round(sum(ratio_sc) / 1e10 / count(*), 6) AS seasonal_index,
           CAST(sum(rev) * 100 AS BIGINT) AS total_rev_cents
    FROM ratios
    GROUP BY dow
    ORDER BY dow
    """,
)
def q330_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal indices by ratio-to-moving-average (the classical
    decomposition step): daily purchase revenue over a centered 7-day
    MA, averaged per day-of-week — an index above 1 marks a
    systematically strong weekday, feeding q97-style forecasts and the
    q119 anomaly baseline.

    Scale shape: the fact collapses to the daily frame (calendar-
    bounded) before the only windows; edge days without a full 7-day
    neighborhood are excluded on both engines (n_win = 7); per-day
    ratios floor-scale to BIGINT before the per-dow mean, keeping the
    float reduction exact.  Cross-engine: Spark's dayofweek == DuckDB's
    dayofweek + 1 (Sun=1 vs Sun=0), aligned explicitly."""
    e = read_table(spark, sf_dir, "events", columns=["event_type", "ts", "value"])
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(28,2)").alias("rev"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "rev",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.avg(F.col("rev").cast("double")).over(w).alias("ma7"),
    )
    ratios = ma.where(F.col("n_win") == 7).select(
        (F.dayofweek("d") - 1).alias("dow"),
        "rev",
        F.floor(F.col("rev").cast("double") / F.col("ma7") * 1e10 + 0.5)
        .cast("long")
        .alias("ratio_sc"),
    )
    return (
        ratios.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.sum("ratio_sc") / 1e10 / F.count(F.lit(1)), 6).alias(
                "seasonal_index"
            ),
            (F.sum("rev") * 100).cast("long").alias("total_rev_cents"),
        )
        .orderBy("dow")
        .select(
            F.col("dow").cast("int").alias("dow"),
            "n_days",
            "seasonal_index",
            "total_rev_cents",
        )
    )
