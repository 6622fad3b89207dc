"""Sessionization — the shared lag → new-session flag → running-sum
rewrite (30-minute inactivity gap by default).

One canonical implementation for every session-keyed query (q65 raw
sessionize, q151 in-session funnel, q199 behavior paths): both windows
share the ``user_col`` hash partitioning so Catalyst plans exactly ONE
Exchange, time math is integer microseconds (no float drift), and the
(ts, tie) ordering is total so session numbering is bit-stable across
engines and partitionings.  Streaming twin: ``F.session_window`` (q54).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_US = 1800 * 1_000_000  # 30-minute inactivity gap


def with_session_seq(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tie_cols: Sequence[str] = ("event_id",),
    gap_us: int = DEFAULT_GAP_US,
    out_col: str = "session_seq",
) -> DataFrame:
    """``df`` plus a per-user 1-based ``out_col`` session number: a new
    session starts at the first event and whenever the gap to the
    previous event exceeds ``gap_us`` microseconds."""
    order = [F.col(ts_col), *[F.col(c) for c in tie_cols]]
    w = Window.partitionBy(user_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    return df.withColumn(out_col, F.sum(new_session).over(run))
