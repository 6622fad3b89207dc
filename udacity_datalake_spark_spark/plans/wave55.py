"""Wave 55: Spark 4 extension-API surface — a custom Python DataSource
(partition-planned synthetic ingest, closed-form oracle) and a Python
UDTF (table function) chunker applied via LATERAL join — the two
escape hatches for sources and row-to-rows transforms the DataFrame
API can't express natively.

Reference parity note: the reference (etl.py:23-40, /root/reference)
ingests fixed JSON file globs; the DataSource API is how that pipeline
would wrap a non-file system (queue, REST pager) with real executor
parallelism, and a UDTF is its row-expanding custom logic done
engine-side instead of driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.pyds import (
    EVENTS_PER_DAY,
    N_TYPES,
    register,
)
from udacity_datalake_spark_spark.sources.readers import read_table

N_DAYS = 3


@query(
    "q334_custom_source_rollup",
    oracle=f"""
    WITH gen AS (
        SELECT d.range * {EVENTS_PER_DAY} + i.range AS event_id,
               CAST(d.range AS INT) AS day
        FROM range({N_DAYS}) d CROSS JOIN range({EVENTS_PER_DAY}) i
    ),
    rows_ AS (
        SELECT event_id, day,
               (event_id % 1048576) * 2654435761 AS h
        FROM gen
    ),
    decoded AS (
        SELECT event_id, day,
               CAST(h % 1000 AS INT) AS user_id,
               CAST((h // 1000) % {N_TYPES} AS INT) AS etype,
               (h // 7) % 10000 AS cents
        FROM rows_
    )
    SELECT CAST(etype AS INT) AS etype,
           count(*) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(count(DISTINCT day) AS BIGINT) AS n_days
    FROM decoded
    GROUP BY etype
    ORDER BY etype
    """,
)
def q334_custom_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource end-to-end: `spark.read.format(
    "synthevents")` plans one InputPartition PER DAY (real executor
    parallelism — the DataSource API's unit of scheduling), each task
    generates its closed-form rows, and the rollup aggregates them.
    The oracle re-derives every row from `range()` arithmetic, so the
    whole custom-source path — registration, partition planning, task
    reads, schema — is value-checked, not just smoke-tested.

    Scale shape: N partitions of bounded rows each; the only exchange
    is the type-grain aggregate.  Wrapping a real external system
    changes `read()`'s body, nothing else."""
    register(spark)
    src = spark.read.format("synthevents").option("n_days", str(N_DAYS)).load()
    return (
        src.groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.count_distinct("day").alias("n_days"),
        )
        .orderBy("etype")
        .select(F.col("etype").cast("int").alias("etype"), "n", "n_users", "total_cents", "n_days")
    )


CHUNK_TOKENS = 40


@query(
    "q335_udtf_chunk_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    chunks AS (
        SELECT doc_id, w,
               unnest(range((len(w) + {CHUNK_TOKENS} - 1) // {CHUNK_TOKENS})) AS c
        FROM t
    )
    SELECT doc_id,
           CAST(c AS INT) AS chunk_id,
           CAST(c * {CHUNK_TOKENS} + 1 AS INT) AS start_tok,
           CAST(least({CHUNK_TOKENS}, len(w) - c * {CHUNK_TOKENS}) AS INT)
               AS n_tokens,
           CAST(length(array_to_string(
               w[c * {CHUNK_TOKENS} + 1 :
                 c * {CHUNK_TOKENS} + least({CHUNK_TOKENS},
                      len(w) - c * {CHUNK_TOKENS})], ' ')) AS BIGINT)
               AS chunk_chars
    FROM chunks
    """,
)
def q335_udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) chunker: one document row in,
    one row PER fixed-size token chunk out, applied with a LATERAL join
    in SQL — the row-expanding custom-transform API (the engine-side
    replacement for driver-side loops; q76's array-explode chunker is
    the codegen twin this UDTF's output is oracle-matched against via
    the same SQL arithmetic).

    The UDTF is Arrow-batched per partition and stateless per row, so
    it scales like any map-side stage; output carries span metadata
    (offsets, token and char counts), not duplicated text — at 100 TB
    chunk TEXT is re-derived downstream from offsets, keeping the
    exchange narrow."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, start_tok int, n_tokens int, chunk_chars bigint")
    class ChunkSpans:
        def eval(self, text: str):
            if text is None:
                return
            w = text.split(" ")
            n = len(w)
            for c in range((n + CHUNK_TOKENS - 1) // CHUNK_TOKENS):
                lo = c * CHUNK_TOKENS
                hi = min(lo + CHUNK_TOKENS, n)
                chunk = " ".join(w[lo:hi])
                yield (c, lo + 1, hi - lo, len(chunk))

    spark.udtf.register("chunk_spans", ChunkSpans)
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    d.createOrReplaceTempView("__docs_for_chunking")
    return spark.sql(
        """
        SELECT d.doc_id, f.chunk_id, f.start_tok, f.n_tokens, f.chunk_chars
        FROM __docs_for_chunking d, LATERAL chunk_spans(d.text) f
        """
    )
