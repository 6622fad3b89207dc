"""Decimal-exact money math.

Floating-point SUM is order-dependent: at 100 TB a re-run (or a different
partitioning / AQE decision) produces a slightly different double sum, and
any equality-checked downstream consumer breaks.  All money aggregation in
the engine goes through fixed-point DECIMAL, which is associative — the
result is bit-stable across partitionings, engines (matches the DuckDB
oracle exactly), and scale factors.  Final results are surfaced as DOUBLE
(a single deterministic decimal→double conversion).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast a (money-like) column to exact fixed-point."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM: decimal-accumulate, surface as double."""
    return F.sum(dec(col, 18, scale)).cast("double")


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum, then one double divide."""
    return F.sum(dec(col, 18, scale)).cast("double") / F.count(F.lit(1))
