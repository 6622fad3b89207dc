"""Slowly-changing-dimension (type 2) construction from a changelog.

The reference overwrites its dimensions wholesale every run (reference
etl.py:46,62,95 — ``mode('overwrite')``), losing history.  ``scd2`` is
the warehouse-standard alternative: each key's attribute changes become
validity intervals ``[valid_from, valid_to)`` with an open-ended current
row — computed with one window pass over the changelog, no self-join.

Scale shape: one hash exchange on the business key, then per-partition
sort + lead().  Consecutive duplicate values are collapsed first (a lag
comparison in the same window, no extra shuffle) so re-delivered
unchanged records don't mint spurious versions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Build type-2 dimension rows from ``changes`` (one row per observed
    state of ``key`` at time ``ts``).

    Returns one row per version: key, attrs, ``valid_from``, ``valid_to``
    (null = current), ``is_current``.  Ties on (key, ts) are broken by the
    attribute tuple so the result is deterministic on any engine.
    """
    order = [F.col(ts), *[F.col(a) for a in attrs]]
    w = Window.partitionBy(key).orderBy(*order)
    state = F.struct(*[F.col(a) for a in attrs])
    # drop consecutive no-op records: same attribute tuple as the previous
    # observation for this key (first observation: lag is NULL, kept)
    deduped = (
        changes.withColumn("__prev", F.lag(state).over(w))
        .where(F.col("__prev").isNull() | (state != F.col("__prev")))
        .drop("__prev")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    nxt = F.lead(F.col(ts)).over(w2)
    return deduped.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
