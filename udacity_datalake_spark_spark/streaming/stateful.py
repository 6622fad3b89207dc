"""Custom stateful streaming operator via ``applyInPandasWithState``.

Built-in windowed aggregations (streaming/windows.py) cover time-bucketed
state; this is the escape hatch for arbitrary per-key state machines —
the Spark idiom for operators the reference class of engines implements
imperatively.  State lives in the state store (checkpointed, fault
tolerant); each micro-batch hands the operator one pandas batch per key
plus its persisted state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, sum_value DOUBLE"
OUTPUT_SCHEMA = "user_id LONG, n LONG, sum_value DOUBLE"


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as an explicit state machine: state =
    (count, sum); each micro-batch emits the user's updated totals.

    The memory-sink replay test asserts the *final* emission per user
    equals the batch groupBy — proving state survives across batches.
    At scale: state is hash-partitioned by user_id across executors, and
    a production deployment would add a timeout
    (``GroupStateTimeout.ProcessingTimeTimeout``) to reap idle keys.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "sum_value": [total]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
