"""Shared closed-form statistics: the Wilson score interval.

One definition for the three queries that report it (q242 conversion CI,
q275 per-type return rates, q281 reliability ranking) — a correction to
the formula lands everywhere at once, Spark side and oracle side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: two-sided 95% normal quantile, fixed literal (spelled identically in
#: every oracle via wilson_sql)
Z95 = 1.959963984540054


def wilson_bounds(k: Column, n: Column, z: float = Z95) -> tuple[Column, Column]:
    """(lower, upper) 95% Wilson score bounds for k successes of n, as
    unrounded double Columns — callers round once at output.  Expression
    tree mirrors wilson_sql exactly so both engines produce identical
    doubles."""
    zc = F.lit(z)
    p = k / n.cast("double")
    half = zc * F.sqrt(p * (1 - p) / n + zc * zc / (F.lit(4.0) * n * n))
    center = p + zc * zc / (2 * n)
    denom = 1 + zc * zc / n
    return (center - half) / denom, (center + half) / denom


def wilson_sql(k: str, n: str, sign: str, z: float = Z95) -> str:
    """The DuckDB-side Wilson bound expression (sign '+' for the upper
    bound, '-' for the lower), structurally identical to
    wilson_bounds."""
    return f"""(({k} / CAST({n} AS DOUBLE) + {z} * {z} / (2 * {n})
                  {sign} {z} * sqrt({k} / CAST({n} AS DOUBLE)
                                  * (1 - {k} / CAST({n} AS DOUBLE)) / {n}
                                  + {z} * {z} / (4.0 * {n} * {n})))
                 / (1 + {z} * {z} / {n}))"""
