"""Named-table catalog: register the engine's tables as SQL views so the
full ``spark.sql`` surface (ANSI SQL, CTEs, set ops, window SQL) works
against them — the reference's star schema is a catalog of five named
tables (SURVEY.md §1.4); this generalizes that to any parquet directory.

At scale the same call-sites move to a persistent metastore
(``saveAsTable`` / Unity-style catalogs) — the engine only depends on
name → DataFrame resolution, so views and metastore tables are
interchangeable here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from udacity_datalake_spark_spark.schemas import TABLE_NAMES
from udacity_datalake_spark_spark.sources.readers import read_table


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register each testdata table as a temp view; returns the frames.
    Idempotent — re-registration replaces the view."""
    out: dict[str, DataFrame] = {}
    for name in tables or TABLE_NAMES:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """Run an ANSI-SQL statement against the registered catalog."""
    register_tables(spark, sf_dir)
    return spark.sql(statement)
