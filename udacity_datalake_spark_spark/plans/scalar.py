"""Scalar-function surface: conditional, string, regex, date/time, JSON,
math — all JVM-side built-ins (the reference's only scalar UDF, weekday
naming, is replaced by ``date_format(_, 'EEEE')``; SURVEY.md §2.6-U1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.datetime import time_parts
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q27_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           count(*) AS n,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label
    FROM orders
    GROUP BY 1, 3
    """,
)
def q27_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / NULLIF / COALESCE conditional family."""
    o = read_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    status_label = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open"))
    return (
        o.select(bucket.alias("bucket"), status_label.alias("status_label"))
        .groupBy("bucket", "status_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q28_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           length(p_name) AS name_len,
           substring(p_name, 1, 8) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_slug,
           trim(p_name) AS trimmed,
           CASE WHEN p_type LIKE '%STANDARD%' THEN 1 ELSE 0 END AS is_standard
    FROM part
    """,
)
def q28_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case mapping, length, substring, concat, replace,
    trim, LIKE."""
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.trim("p_name").alias("trimmed"),
        F.when(F.col("p_type").like("%STANDARD%"), 1).otherwise(0).alias("is_standard"),
    )


@query(
    "q29_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           CASE WHEN regexp_matches(p_brand, '^Brand#[0-9]+$') THEN 1 ELSE 0 END AS brand_ok
    FROM part
    WHERE regexp_matches(p_type, '(ECONOMY|PROMO)')
    """,
)
def q29_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract, global replace, rlike filter.  (DuckDB
    regexp_replace needs the 'g' flag to match Spark's replace-all.)"""
    p = read_table(spark, sf_dir, "part")
    return p.where(F.col("p_type").rlike("(ECONOMY|PROMO)")).select(
        "p_partkey",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.when(F.col("p_brand").rlike("^Brand#[0-9]+$"), 1).otherwise(0).alias("brand_ok"),
    )


@query(
    "q30_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           dayname(o_orderdate) AS weekday,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INTEGER)
               AS days_to_y2k
    FROM orders
    """,
)
def q30_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part family (the reference's F4 surface, etl.py:116-120) plus
    weekday naming via built-in date_format — no Python UDF (U1)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.date_format("o_orderdate", "EEEE").alias("weekday"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
    )


@query(
    "q31_json_funcs",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q31_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events.props payload column (integer
    aggregation — exact)."""
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q32_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           sqrt(l_extendedprice) AS price_sqrt,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_floor7,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_kceil,
           l_quantity * l_quantity AS qty_sq,
           l_orderkey % 7 AS key_mod7
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q32_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family over IEEE-deterministic operations (abs/sqrt/floor/ceil/
    multiply/mod) — identical bits on identical inputs in any engine."""
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.floor(F.col("l_quantity") / 7).alias("qty_floor7"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_kceil"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "q33_time_dimension",
    oracle="""
    SELECT event_id,
           date_trunc('second', ts) AS start_time,
           CAST(hour(ts) AS INTEGER) AS hour,
           CAST(day(ts) AS INTEGER) AS day,
           CAST(weekofyear(ts) AS INTEGER) AS week,
           CAST(month(ts) AS INTEGER) AS month,
           CAST(year(ts) AS INTEGER) AS year,
           dayname(ts) AS weekday
    FROM events
    """,
)
def q33_time_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's time-dimension derivation (etl.py:98-131) on the
    events stream: second-truncated start_time (compat semantics of
    from_unixtime, SURVEY.md §2.5-F2) + date parts in pinned UTC + weekday
    name without the Python UDF."""
    e = read_table(spark, sf_dir, "events")
    base = e.select("event_id", F.date_trunc("second", F.col("ts")).alias("start_time"), "ts")
    parts = time_parts(base, ts_col="ts")
    return parts.select(
        "event_id", "start_time", "hour", "day", "week", "month", "year", "weekday"
    )
