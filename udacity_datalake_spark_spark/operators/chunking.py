"""Document chunking — the context-window packing step of a training-data
pipeline: split each document into fixed-size token chunks.

Two implementations of the same semantics:

- ``chunk_documents`` (the hot path): pure built-ins — split →
  sequence → explode → slice → array_join, all inside whole-stage
  codegen.  This is the one to run at 100 TB.
- ``ChunkUdtf`` (the escape hatch): a Python UDTF with identical output,
  here to exercise Spark's table-function surface for chunkers whose
  logic (real tokenizers, sentence boundaries) can't be expressed with
  array built-ins.  Row-at-a-time Python — keep off hot paths.

tests/test_operators.py proves the two produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 40,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens) — whitespace tokens packed
    into consecutive ``chunk_tokens``-sized chunks (last chunk ragged)."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("bigint")
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * chunk_tokens
    return exploded.select(
        id_col,
        "chunk_idx",
        F.array_join(F.slice("__toks", start + 1, chunk_tokens), " ").alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("__n") - start).alias("n_tokens"),
    )


@udtf(returnType="chunk_idx: bigint, chunk_text: string, n_tokens: bigint")
class ChunkUdtf:
    """Python UDTF twin of ``chunk_documents`` (chunk size fixed at 40 —
    UDTF constructors take no args pre-Spark-4 'with' syntax)."""

    CHUNK = 40

    def eval(self, text: str):
        toks = text.split(" ")
        for i in range(0, (len(toks) + self.CHUNK - 1) // self.CHUNK):
            piece = toks[i * self.CHUNK : (i + 1) * self.CHUNK]
            yield i, " ".join(piece), len(piece)
