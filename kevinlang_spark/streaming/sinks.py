"""Exactly-once streaming parquet sink (foreachBatch + idempotent writes).

Structured Streaming guarantees at-least-once delivery to ``foreachBatch``:
after a crash between "batch written" and "offset committed", the SAME
batch_id is redelivered.  Exactly-once therefore needs the write itself to
be idempotent — here, each micro-batch lands in its own ``__batch_id=<n>``
partition with dynamic partition overwrite, so a redelivered batch
OVERWRITES its previous (possibly partial) output instead of appending a
duplicate.  The checkpoint directory makes re-running the whole query a
no-op: processed source files are never re-read.

Scale notes: the sink adds no shuffle (partitionBy on a literal column is
a per-task file-naming concern); state is the streaming checkpoint, never
driver memory.  Readers see per-batch directories — compact downstream if
small-file pressure matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_batch_writer(path: str):
    """A ``foreachBatch`` function writing each micro-batch to its own
    partition, overwrite-idempotent under batch redelivery."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(path)
        )

    return write


def write_stream_exactly_once(
    df: DataFrame,
    path: str,
    checkpoint: str,
    timeout_s: int = 180,
):
    """Run a streaming frame into ``path`` with availableNow + checkpoint;
    returns after the trigger drains.  Re-invoking with the same
    checkpoint processes only NEW source data."""
    q = (
        df.writeStream.foreachBatch(idempotent_batch_writer(path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def read_stream_output(spark, path: str) -> DataFrame:
    """Read the sink back without the bookkeeping column."""
    return spark.read.parquet(path).drop("__batch_id")
