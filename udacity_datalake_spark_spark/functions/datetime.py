"""Timestamp derivation — the reference's F1-F5/U1 surface, Spark-first.

The reference converts epoch-milliseconds with
``to_timestamp(from_unixtime(ts/1000, 'yyyy-MM-dd HH:mm:ss.SSS'))``
(reference etl.py:98-102), which silently truncates to whole seconds
(``from_unixtime`` takes seconds; SURVEY.md §2.5-F2), and derives weekday
with a row-at-a-time Python UDF over ``calendar.day_name``
(reference etl.py:104-112) — a JVM→Python round trip per batch that breaks
whole-stage codegen.  Here both get codegen-friendly built-ins; the
compat/exact split is explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_ms_to_timestamp_compat(ms: Column | str) -> Column:
    """Epoch ms → timestamp truncated to whole seconds (reference-exact
    semantics of etl.py:98-102, without the string round-trip)."""
    c = F.col(ms) if isinstance(ms, str) else ms
    return F.timestamp_seconds(F.floor(c / 1000))


def epoch_ms_to_timestamp_exact(ms: Column | str) -> Column:
    """Epoch ms → timestamp keeping millisecond precision (the fix the
    reference's format string intended, SURVEY.md §4.3.6)."""
    c = F.col(ms) if isinstance(ms, str) else ms
    return (c / 1000).cast("timestamp")


def weekday_name(ts: Column | str) -> Column:
    """Full day name ('Monday'…'Sunday').

    Bit-identical replacement for the reference's ``get_weekday`` Python
    UDF (etl.py:104-112): ``date_format(_, 'EEEE')`` stays inside
    whole-stage codegen instead of crossing into a Python worker.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "EEEE")


def time_parts(df: DataFrame, ts_col: str = "start_time") -> DataFrame:
    """Attach the reference's time-dimension parts (etl.py:115-121):
    hour, day, week (ISO week-of-year), month, year, weekday-name.

    Computed in the session timezone — the engine session pins UTC
    (SURVEY.md §4.3.5).
    """
    c = F.col(ts_col)
    return (
        df.withColumn("hour", F.hour(c))
        .withColumn("day", F.dayofmonth(c))
        .withColumn("week", F.weekofyear(c))
        .withColumn("month", F.month(c))
        .withColumn("year", F.year(c))
        .withColumn("weekday", weekday_name(c))
    )
