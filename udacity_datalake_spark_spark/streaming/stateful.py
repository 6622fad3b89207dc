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


LATENESS_STATE_SCHEMA = "wm_us LONG"
LATENESS_OUTPUT_SCHEMA = (
    "event_type STRING, n_events LONG, n_late_1h LONG, max_lateness_us LONG"
)


def streaming_lateness_audit(
    events: DataFrame, late_threshold_us: int = 3_600_000_000
) -> DataFrame:
    """q271's lateness audit as a TRUE stateful stream: the running
    event-time high-water mark lives in the state store and advances
    across micro-batches; each batch emits per-event-type partial
    counts (events seen, events later than the threshold behind the
    watermark, max lateness) that the caller sums.

    Matches the batch replay exactly when each micro-batch is one
    arrival day (``maxFilesPerTrigger=1`` over per-day files): rows are
    re-sorted inside the operator by q271's intra-day arrival order
    (md5(event_id), event_id), so the running max visits events in the
    identical global sequence — the stream-vs-batch equality test pins
    it.  State is ONE long per key; the single global key mirrors the
    fact that an ingest watermark is a global scalar, and the per-batch
    pandas work is a sort + cummax, Arrow-batched."""
    import numpy as np
    from pyspark.sql import functions as F

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (wm,) = state.get if state.exists else (-(1 << 62),)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["__day", "__h", "event_id"], kind="mergesort")
        ts = batch["ts_us"].to_numpy(dtype="int64")
        run_wm = np.maximum(np.maximum.accumulate(ts), wm)
        lateness = run_wm - ts
        state.update((int(run_wm[-1]) if len(ts) else wm,))
        out = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(),
                "lateness": lateness,
            }
        )
        agg = out.groupby("event_type", as_index=False).agg(
            n_events=("lateness", "size"),
            n_late_1h=("lateness", lambda s: int((s > late_threshold_us).sum())),
            max_lateness_us=("lateness", "max"),
        )
        yield agg.astype(
            {"n_events": "int64", "n_late_1h": "int64", "max_lateness_us": "int64"}
        )

    keyed = events.select(
        F.lit(1).alias("__g"),
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_date(F.to_date("ts")).alias("__day"),
        F.md5(F.col("event_id").cast("string")).alias("__h"),
    )
    return keyed.groupBy("__g").applyInPandasWithState(
        update,
        outputStructType=LATENESS_OUTPUT_SCHEMA,
        stateStructType=LATENESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ADMIT_STATE_SCHEMA = "n LONG"
ADMIT_OUTPUT_SCHEMA = "user_id LONG, event_type STRING, n_admitted LONG, n_dropped LONG"


def streaming_admission_caps(events: DataFrame, cap: int = 5) -> DataFrame:
    """q318's ingest admission control as a TRUE stateful stream: the
    per-(user, calendar-day) admitted counter lives in the state store, so
    a user's quota holds across micro-batches; each batch emits partial
    (user, event_type) admitted/dropped counts the caller sums.

    Matches the batch q318 exactly when per-key arrival order equals the
    batch's (ts, event_id) order — rows are re-sorted inside the
    operator per batch, and a (user, day) key never spans arrival days,
    so day-per-micro-batch replay reproduces the batch admission set
    bit-for-bit (pinned by the stream-vs-batch test).  State is ONE long
    per active (user, day); production adds an EventTimeTimeout at the
    day boundary + watermark to reap closed windows, keeping state
    O(active keys), not O(stream)."""
    import numpy as np
    from pyspark.sql import functions as F

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts_us", "event_id"], kind="mergesort"
        )
        k = len(batch)
        n_admit = max(0, min(cap - n, k))
        state.update((n + k,))
        admitted = np.zeros(k, dtype=bool)
        admitted[:n_admit] = True
        out = pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(), "admitted": admitted}
        )
        agg = out.groupby("event_type", as_index=False).agg(
            n_admitted=("admitted", "sum"),
            n_dropped=("admitted", lambda s: int((~s).sum())),
        )
        agg.insert(0, "user_id", key[0])
        yield agg.astype({"n_admitted": "int64", "n_dropped": "int64"})

    keyed = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros(F.date_trunc("day", "ts")).alias("__day_us"),
    )
    return keyed.groupBy("user_id", "__day_us").applyInPandasWithState(
        update,
        outputStructType=ADMIT_OUTPUT_SCHEMA,
        stateStructType=ADMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
