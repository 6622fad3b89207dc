"""Query surface registry — importing this package registers all queries."""

from udacity_datalake_spark_spark.plans import grouping, relational, scalar, setops, windows  # noqa: F401
from udacity_datalake_spark_spark.plans.registry import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
