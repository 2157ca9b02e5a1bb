"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.7); this is the extension
surface for operators that need *cross-batch state* beyond what windowed
aggregation gives: running per-key counters, anomaly flags, cumulative
value tracking.  State is partitioned by key (scales with the cluster),
Arrow-batched per group, and bounded by timeouts.

The same transformation runs on a batch frame via a groupBy fallback so
tests can pin parity.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, value_sum double"
STATE_SCHEMA = "n bigint, s double"


def _running_totals_fn(
    key, pdf_iter: Iterable[pd.DataFrame], state: GroupState
):
    """Accumulate (count, value-sum) per user across micro-batches."""
    from decimal import ROUND_HALF_UP, Decimal

    if state.exists:
        n, s = state.get
    else:
        n, s = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    # HALF_UP on the shortest decimal repr — matches F.round in the batch
    # twin (python's round is half-even and would break parity at .xx5)
    rounded = float(Decimal(repr(s)).quantize(Decimal("0.01"), ROUND_HALF_UP))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_sum": [rounded]}
    )


def running_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming: per-user running totals with explicit GroupState.

    Use with update-mode output; state lives on the executors, hash-
    partitioned by user_id — no driver state, no collect.
    """
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``running_totals_stream`` — the parity oracle."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


def run_stateful_to_memory(
    spark,
    parquet_dir: str,
    query_name: str = "stateful_test",
):
    """Drive the stateful op over a file-source stream (availableNow) into
    a memory sink; returns the in-memory table (latest update per key)."""
    import os
    import tempfile

    schema = spark.read.parquet(parquet_dir).schema
    if os.path.isfile(parquet_dir):
        # file stream source requires a DIRECTORY (same shim as
        # windows.run_stream_to_memory)
        d = tempfile.mkdtemp(prefix="stateful_src_")
        os.symlink(
            os.path.abspath(parquet_dir),
            os.path.join(d, os.path.basename(parquet_dir)),
        )
        parquet_dir = d
    src = spark.readStream.schema(schema).parquet(parquet_dir)
    if dict(src.dtypes).get("ts") == "bigint":
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    out = running_totals_stream(src)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError(f"stateful stream {query_name} did not finish in 180s")
    # update-mode memory sink appends EVERY batch's emissions; with multiple
    # micro-batches a key appears once per batch — the row with the highest
    # running count is the latest state
    t = spark.table(query_name)
    return (
        t.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("value_sum", "n_events").alias("value_sum"),
        )
    )
