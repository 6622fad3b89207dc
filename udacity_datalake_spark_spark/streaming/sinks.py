"""Streaming sinks beyond the built-ins: foreachBatch → parquet.

``foreachBatch`` hands each micro-batch to the full batch writer API, so
a stream can feed the same partitioned-parquet layout the batch pipelines
produce (sources/writers.py).  Exactly-once: a raw parquet append is not
transactional — a retried epoch double-writes — so the hardened shape is
``epoch_keyed_batch_writer``: each micro-batch lands in an
``{path}/epoch={id}`` subdirectory in overwrite mode.  Structured
Streaming replays a failed epoch under the SAME epoch id (that is the
checkpoint's contract), so the replay overwrites its own partial output
instead of appending next to it — idempotence by path, the same recipe a
transactional table format applies internally.  Asserted by
tests/test_streaming.py::test_epoch_keyed_sink_replay_idempotent.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def epoch_keyed_batch_writer(
    path: str, partition_by: list[str] | None = None
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callback writing each micro-batch to
    ``{path}/epoch={epoch_id}`` with mode('overwrite') — a replayed epoch
    (crash between sink write and checkpoint commit) overwrites its own
    directory, so rows are never doubled.  Read the sink back with
    ``read_epoch_keyed`` (drops the inferred ``epoch`` partition col)."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(f"{path}/epoch={epoch_id}")

    return write_batch


def read_epoch_keyed(spark, path: str) -> DataFrame:
    """Read an epoch-keyed sink directory back as the logical stream
    output: partition discovery surfaces the ``epoch`` dir key as a
    column, which is sink plumbing, not data — drop it."""
    return spark.read.parquet(path).drop("epoch")


def foreach_batch_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    epoch_subdirs: bool = False,
) -> StreamingQuery:
    """Drain a bounded stream (availableNow) into a parquet directory via
    foreachBatch.  ``epoch_subdirs=True`` uses ``epoch_keyed_batch_writer``
    (idempotent under epoch retries); plain append otherwise."""

    if epoch_subdirs:
        write_batch = epoch_keyed_batch_writer(path, partition_by)
    else:

        def write_batch(df: DataFrame, epoch_id: int) -> None:
            writer = df.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
