"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-events generator with REAL partition planning — the template
for wrapping any external system (REST pager, message queue, legacy
store) as a first-class `spark.read.format(...)` source.

Why it matters at 100 TB: the DataSource API is how ingestion
parallelism is expressed — `partitions()` returns one InputPartition
per independent fetch unit (here: one per day), Spark schedules them
across executors, and each task materializes only its own slice.  The
generator is closed-form deterministic (pure integer hash arithmetic),
so the whole source is oracle-checkable: DuckDB reproduces every row
from `range()` (q334).

Reference parity note: the reference (etl.py:23-40, /root/reference)
reads fixed JSON paths; a custom source is how its ingestion would wrap
a non-file system without landing files first.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Generator constants — mirrored verbatim in q334's DuckDB oracle.
EVENTS_PER_DAY = 1000
N_TYPES = 5


def synth_row(day: int, i: int):
    """Row i of day `day` — pure integer arithmetic, no RNG state.

    event_id is globally unique; user and cents come from the same
    multiplicative-hash family the engine's sampling ops use (pre-mod
    keeps everything int64-safe)."""
    event_id = day * EVENTS_PER_DAY + i
    h = (event_id % 1_048_576) * 2654435761
    user_id = h % 1000
    etype = (h // 1000) % N_TYPES
    cents = (h // 7) % 10_000
    return (event_id, day, int(user_id), int(etype), int(cents))


class _DayPartition(InputPartition):
    def __init__(self, day: int):
        self.day = day


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_days = int(options.get("n_days", 3))

    def partitions(self):
        # one InputPartition per day: Spark schedules each as its own
        # task — the unit of parallelism for any wrapped external system
        return [_DayPartition(d) for d in range(self.n_days)]

    def read(self, partition):
        for i in range(EVENTS_PER_DAY):
            yield synth_row(partition.day, i)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader.  The offset is the next unread
    day index, persisted by Structured Streaming's checkpoint — a
    restart resumes exactly at the committed day (the same offset
    contract a Kafka or queue wrapper implements).  Each ``read`` call
    drains every day available up to the ``n_days`` horizon (an
    availableNow trigger plans from ONE read call, so returning a
    single day per call would strand the rest)."""

    def __init__(self, options):
        self.n_days = int(options.get("n_days", 3))

    def initialOffset(self):
        return {"day": 0}

    def read(self, start):
        day = start["day"]
        end = max(day, self.n_days)
        return (
            iter(
                [
                    synth_row(d, i)
                    for d in range(day, end)
                    for i in range(EVENTS_PER_DAY)
                ]
            ),
            {"day": end},
        )

    def readBetweenOffsets(self, start, end):
        # deterministic replay for recovery: regenerate the day range
        return iter(
            [
                synth_row(day, i)
                for day in range(start["day"], end["day"])
                for i in range(EVENTS_PER_DAY)
            ]
        )


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthevents").option("n_days", N)` source —
    batch reader (partition-planned) AND streaming reader (offset-
    checkpointed, one micro-batch per day) over the same generator."""

    @classmethod
    def name(cls) -> str:
        return "synthevents"

    def schema(self) -> str:
        return "event_id long, day int, user_id int, etype int, cents long"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
