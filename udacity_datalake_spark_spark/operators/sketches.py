"""Frequency-sketch operators: per-partition Misra–Gries heavy-hitter
candidate generation.

The two-pass frequent-items pattern for vocabularies that are
shuffle-hostile at 100 TB: pass 1 streams each partition through a
width-w Misra–Gries summary (Arrow-batched pandas, dict state across
batches); pass 2 exactly recounts ONLY the candidate union.  The MG
guarantee composes across partitions: any value with global frequency
> N/(w+1) has per-partition frequency > N_p/(w+1) in at least one
partition (weighted-average pigeonhole), so it survives that
partition's summary — the union is a guaranteed superset at
≤ width·partitions rows.  The caller's exact-recount + threshold filter
then makes the final result independent of partitioning and row order,
which is why a layout-dependent sketch can still be oracle-checked
bit-exactly (q215).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def mg_candidates(df: DataFrame, col: str, width: int) -> DataFrame:
    """Distinct candidate values of ``df[col]`` (string) whose global
    frequency can exceed n/(width+1) — a superset, never a miss.  One
    pass, no shuffle until the final candidate distinct."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for term, cnt in pdf[col].value_counts().items():
                counters[term] = counters.get(term, 0) + int(cnt)
            if len(counters) > width:
                # batch MG decrement: subtracting the k-th smallest count
                # from everyone (k = len-width) is k rounds of uniform
                # decrement — keeps ≤ width survivors, preserves the
                # total-decrement ≤ N_p/(width+1) bound
                cut = sorted(counters.values())[len(counters) - width - 1]
                counters = {t: c - cut for t, c in counters.items() if c > cut}
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(summarize, f"{col} string").distinct()
