"""Declarative data-quality checks: a rule set folded into ONE aggregate
pass over the table.

A 100 TB ingest can't afford one scan per expectation — `dq_report`
compiles every rule into a conditional-sum column of a single `agg`, so
the whole report is map-side partial aggregation + one 1-row reduce.
Uniqueness checks (count-distinct) join the same aggregate; Catalyst
plans the mix as a single Expand + HashAggregate pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    rules: dict[str, Column],
    unique_keys: list[str] | None = None,
) -> DataFrame:
    """One-row violation report.

    ``rules`` maps a check name to a boolean Column that is True where the
    row VIOLATES the check; the output carries one violation-count column
    per rule plus ``n_rows`` (and ``dup_pk`` when ``unique_keys`` is
    given: rows beyond the first per key combination).
    """
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name) for name, cond in rules.items()
    ]
    if unique_keys:
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in unique_keys])).alias(
                "dup_pk"
            )
        )
    return df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)


def not_between(col: str, lo: float, hi: float) -> Column:
    """Violation: value outside [lo, hi] (nulls count as violations)."""
    c = F.col(col)
    return ~c.between(lo, hi) | c.isNull()


def not_in(col: str, allowed: list[str]) -> Column:
    """Violation: value outside the allowed domain (nulls violate)."""
    c = F.col(col)
    return ~c.isin(allowed) | c.isNull()


def is_null(col: str) -> Column:
    """Violation: null where a value is required."""
    return F.col(col).isNull()
