"""Streaming sinks beyond the built-ins: foreachBatch → parquet.

``foreachBatch`` hands each micro-batch to the full batch writer API, so
a stream can feed the same partitioned-parquet layout the batch pipelines
produce (sources/writers.py).  Exactly-once caveat: the parquet append is
not transactional — a retried epoch could double-write.  The checkpoint
makes replays epoch-aligned; production hardening is either per-epoch
output paths (idempotent overwrite by epoch id, sketched below) or a
transactional table format on top of the same call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def foreach_batch_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    epoch_subdirs: bool = False,
) -> StreamingQuery:
    """Drain a bounded stream (availableNow) into a parquet directory via
    foreachBatch.  ``epoch_subdirs=True`` writes ``{path}/epoch={id}`` in
    overwrite mode — idempotent under epoch retries."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        if epoch_subdirs:
            writer = df.write.mode("overwrite")
            target = f"{path}/epoch={epoch_id}"
        else:
            writer = df.write.mode("append")
            target = path
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
