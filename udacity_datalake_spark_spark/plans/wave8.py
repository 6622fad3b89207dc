"""Wave 8: scalar-function family parity — strings, datetime, and
higher-order array functions.

Function-surface completeness queries in the q31/q32 style (JSON/math):
each exercises a family of built-ins whose semantics Spark and DuckDB
share exactly, proving the engine's scalar layer gives the answers a SQL
user expects.  Everything is per-row map work inside whole-stage codegen
— the scale story is simply "one scan"; the care is all in picking
functions whose cross-engine semantics are bit-identical (1-based
positions, month-end clamping, set-semantics array ops on
pre-deduplicated inputs) and keeping ARRAYS out of the output (only
counts/scalars cross the oracle compare, since set-op element ORDER is
engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table


@query(
    "q190_string_funcs",
    oracle="""
    SELECT doc_id,
           levenshtein(source, lang) AS lev_src_lang,
           split_part(text, ' ', 1) AS first_word,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           translate(lang, 'aeiou', '12345') AS lang_coded,
           reverse(source) AS source_rev,
           strpos(text, 'the') AS pos_the,
           repeat(lang, 3) AS lang_x3
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def q190_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family: levenshtein, split_part, lpad, translate,
    reverse, 1-based substring position (instr ≡ strpos, 0 when absent),
    repeat — the everyday string surface, all codegen'd, zero shuffle."""
    d = read_table(spark, sf_dir, "documents").where(F.pmod("doc_id", F.lit(7)) == 0)
    return d.select(
        "doc_id",
        F.levenshtein("source", "lang").alias("lev_src_lang"),
        F.expr("split_part(text, ' ', 1)").alias("first_word"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.translate("lang", "aeiou", "12345").alias("lang_coded"),
        F.reverse("source").alias("source_rev"),
        F.instr("text", "the").alias("pos_the"),
        F.repeat("lang", 3).alias("lang_x3"),
    )


@query(
    "q191_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS month_start,
           date_trunc('quarter', o_orderdate) AS quarter_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           dayofyear(o_orderdate) AS doy,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS days_since_95
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def q191_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function family: month/quarter truncation, month-end,
    day-of-year, month arithmetic WITH end-of-month clamping (add_months
    ≡ + INTERVAL 3 MONTH in both engines), and day differences against
    an epoch — the calendar surface every warehouse query leans on.
    Session-pinned UTC (functions/datetime.py) is what makes these
    value-identical across engines."""
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).where(
        F.pmod("o_orderkey", F.lit(50)) == 0
    )
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.add_months("o_orderdate", 3).alias("plus_3m"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


@query(
    "q192_array_funcs",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE doc_id % 11 = 0
    ),
    halves AS (
        SELECT doc_id, toks,
               list_distinct(toks[1 : len(toks) // 2]) AS h1,
               list_distinct(toks[len(toks) // 2 + 1 : len(toks)]) AS h2
        FROM t
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           len(list_distinct(h1 || h2)) AS n_union,
           len(list_filter(h1, x -> list_contains(h2, x))) AS n_common,
           len(list_filter(h1, x -> NOT list_contains(h2, x))) AS n_only_first,
           len(list_filter(toks, x -> length(x) % 2 = 0)) AS n_even_len,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
               AS total_token_chars
    FROM halves
    """,
)
def q192_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function family: slice, array_distinct, set
    union/intersection/difference, lambda filter, and an aggregate fold
    — the codegen'd array algebra underlying the shingle/dedup operators,
    exercised directly.

    Set operations run on PRE-DEDUPLICATED halves so both engines agree
    on cardinalities, and only counts reach the output (set-op element
    order is engine-specific).  All map-side."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"]).where(
        F.pmod("doc_id", F.lit(11)) == 0
    )
    t = d.select("doc_id", F.split("text", " ").alias("toks"))
    half = F.floor(F.size("toks") / 2).cast("int")
    halves = t.select(
        "doc_id",
        "toks",
        F.array_distinct(F.slice("toks", F.lit(1), half)).alias("h1"),
        F.array_distinct(
            F.slice("toks", half + 1, F.size("toks") - half)
        ).alias("h2"),
    )
    return halves.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(F.array_union("h1", "h2")).alias("n_union"),
        F.size(F.filter("h1", lambda x: F.array_contains("h2", x))).alias("n_common"),
        F.size(F.filter("h1", lambda x: ~F.array_contains("h2", x))).alias(
            "n_only_first"
        ),
        F.size(F.filter("toks", lambda x: F.length(x) % 2 == 0)).alias("n_even_len"),
        F.aggregate(
            "toks", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_token_chars"),
    )
