"""Query surface registry — importing this package registers all queries."""

from udacity_datalake_spark_spark.plans import (  # noqa: F401
    analytic_extra,
    analytic_wave3,
    analytic_wave4,
    behavior_ops,
    corpus_ops,
    corpus_wave3,
    curation_extra,
    grouping,
    joins_extra,
    pipeline_ops,
    product_analytics,
    relational,
    scalar,
    scoring_ops,
    setops,
    similarity,
    sql_surface,
    streaming_queries,
    surface_extra,
    tpch_extra,
    tpch_gaps,
    warehouse_ops,
    wave5,
    wave6,
    wave7,
    wave8,
    wave9,
    wave10,
    wave11,
    wave12,
    textops,
    windows,
)
from udacity_datalake_spark_spark.plans.registry import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
