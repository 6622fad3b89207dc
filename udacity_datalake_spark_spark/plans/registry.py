"""Declared query surface: name → (Spark callable, DuckDB oracle SQL).

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered with
an ANSI-SQL twin the driver runs on DuckDB over the same parquet tables
(driver contract in __spark_entry__.py).  Column names are aliased
identically on both sides — the driver sorts columns by name before value
hashing.

Determinism rules for oracle-checked queries:
- money/double aggregation goes through DECIMAL (functions.numeric) so the
  result is bit-stable and engine-independent;
- any ranking over continuous scores rounds the score first and tie-breaks
  on a unique key;
- no wall-clock, no RNG without a fixed seed.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from udacity_datalake_spark_spark import scratch

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (the driver then records a weaker rows-only check).

    The REGISTERED callable is a thin wrapper that first releases every
    scratch frame the previous registered query persisted
    (``scratch.release()`` — round 11, VERDICT r10 #2): a caller looping
    over ``QUERIES`` sequentially gets bounded cache residency (at most
    one query's scratch outstanding) without knowing the tracker exists.
    The decorator returns the ORIGINAL function, so builders composing
    each other intra-module never release a caller's live scratch.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            scratch.release()
            return fn(spark, sf_dir)

        QUERIES[name] = runner
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco
