"""Similarity search over embedding columns (``array<float>``).

Two paths, as any 100 TB ANN design needs:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query set broadcast, one scan of the corpus, per-query heap via window.
- ``hyperplane_lsh_topk``: random-hyperplane LSH — sign-bit bucket per
  table, candidates only from matching buckets, exact re-rank inside.
  Multiple tables trade compute for recall.  Plane matrices derive from a
  fixed numpy seed → fully deterministic.

Scores are rounded before ranking and tie-broken on the neighbor id so
top-k sets are stable across engines and partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_datalake_spark_spark.functions.arrays import cosine_similarity


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic per-query top-k from a (qid, nid, sim) frame."""
    sim_r = F.round(F.col("sim"), 6)
    w = Window.partitionBy("qid").orderBy(sim_r.desc(), F.col("nid"))
    return (
        scored.select("qid", "nid", sim_r.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force top-k neighbors for each query vector.

    Output: (qid, nid, sim, rank).  The query side is broadcast — at scale
    this is one corpus scan per query batch, embarrassingly parallel,
    with the cosine evaluated by codegen'd higher-order functions (no UDF).
    """
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("__cv"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select("qid", "nid", cosine_similarity("__qv", "__cv").alias("sim"))
    )
    return _ranked_topk(scored, k)


def hyperplane_planes(dim: int, n_tables: int, bits_per_table: int, seed: int = 42) -> np.ndarray:
    """Deterministic (n_tables*bits_per_table, dim) Gaussian plane matrix."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables * bits_per_table, dim))


def _bucket_udf(planes: np.ndarray, n_tables: int, bits: int):
    """Arrow-vectorized bucket ids: one batch matmul against the plane
    matrix, sign bits packed per table → array<long> of length n_tables.
    (The per-bit zip_with/aggregate expression tree is codegen-friendly
    but its compile time grows with tables×bits×dim; a pandas UDF doing
    `M @ planes.T` is the right slow-path tool here.)"""
    weights = (1 << np.arange(bits)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (n, dim) float32
        signs = (m.astype(np.float64) @ planes.T) > 0  # (n, n_tables*bits)
        packed = signs.reshape(len(m), n_tables, bits).astype(np.int64) @ weights
        return pd.Series(list(packed))

    return buckets


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 16,
    bits_per_table: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing any LSH-table
    bucket with the query, exact cosine re-rank on candidates only.

    Scale shape: the bucket table is a narrow (id, table, bucket) frame —
    candidate generation is ONE hash equi-join on (table, bucket), and
    vectors are fetched back by id only for candidate scoring.  At 100 TB
    each table confines a query to 2^-bits of the corpus instead of a full
    scan; bits/tables trade candidate volume for recall.
    """
    planes = hyperplane_planes(dim, n_tables, bits_per_table, seed)
    buckets = _bucket_udf(planes, n_tables, bits_per_table)

    def bucket_rows(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(buckets(F.col(vec_col))).alias("__tbl", "__bucket"),
        )

    qb = bucket_rows(queries, "qid")
    cb = bucket_rows(corpus, "nid")
    cand = (
        qb.join(cb, ["__tbl", "__bucket"])
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )

    qv = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("__cv"))
    scored = (
        cand.join(F.broadcast(qv), "qid")
        .join(cv, "nid")
        .select("qid", "nid", cosine_similarity("__qv", "__cv").alias("sim"))
    )
    return _ranked_topk(scored, k)
