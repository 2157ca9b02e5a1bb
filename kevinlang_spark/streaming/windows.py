"""Event-time windowing — shared batch/streaming logic.

The reference is batch-only (SURVEY §2.7); these are the extension ops for
the ``events`` table.  Each transformation is written against a plain
DataFrame so the SAME function serves ``spark.read`` (batch) and
``spark.readStream`` (Structured Streaming): pass a streaming frame and
the windowed aggregation becomes a stateful streaming agg; add
``with_watermark`` for late-data bounds and append-mode output.

Scale notes: event-time windows group by (window, keys) — the shuffle key
space is bounded by (#windows × #keys); watermarks bound state size in
streaming; ``session_window`` state merges per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound (streaming only; no-op semantics on batch frames)."""
    return df.withWatermark(ts_col, delay)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts + value sum per key.

    Output: (window_start, window_end, *keys, n, value_sum) — window bounds
    as epoch seconds so results compare exactly across engines.
    """
    w = F.window(F.col(ts_col), window)
    return (
        events.groupBy(w.alias("w"), *keys)
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            F.unix_timestamp(F.col("w.end")).alias("window_end"),
            *keys,
            "n",
            "value_sum",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding-window counts (overlapping windows)."""
    w = F.window(F.col(ts_col), window, slide)
    return (
        events.groupBy(w.alias("w"), *keys)
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *keys,
            "n",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based): events of a key closer than ``gap``
    merge into one session.  ``session_window`` is Spark's native stateful
    session operator — works in batch and streaming alike."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(w.alias("w"), key)
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.col(key),
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            F.unix_timestamp(F.col("w.end")).alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def run_stream_to_memory(
    spark,
    parquet_path: str,
    transform,
    query_name: str = "stream_test",
    schema=None,
    output_mode: str = "complete",
):
    """Drive a file-source stream through ``transform`` with the
    availableNow trigger into a memory sink; returns the finished
    in-memory table.  This is the test harness for streaming parity:
    the same ``transform`` must give identical results on
    ``spark.read`` vs ``spark.readStream``."""
    if schema is None:
        schema = spark.read.parquet(parquet_path).schema
    import os
    import tempfile

    if os.path.isfile(parquet_path):
        # the file stream source requires a DIRECTORY; expose a single
        # parquet file through a temp dir containing a symlink to it
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(
            os.path.abspath(parquet_path),
            os.path.join(d, os.path.basename(parquet_path)),
        )
        parquet_path = d
    src = spark.readStream.schema(schema).parquet(parquet_path)
    out = transform(src)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    # False = timeout: a partial complete-mode snapshot plus a
    # still-active query under this name — fail loudly, never return
    # partial rows as if they were the drained result
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError(f"{query_name}: drain did not finish in 120s")
    return spark.table(query_name)
