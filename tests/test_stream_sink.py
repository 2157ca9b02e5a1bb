"""Exactly-once streaming sink: idempotent redelivery + checkpoint no-op."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.streaming.sinks import (
    idempotent_batch_writer,
    read_stream_output,
    write_stream_exactly_once,
)


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", src / "events.parquet")
    return str(src)


def test_redelivered_batch_does_not_duplicate(spark, sf_dir, tmp_path):
    """Calling the writer twice with the same batch_id (the crash-replay
    case) must leave exactly one copy of the batch."""
    out = str(tmp_path / "out")
    batch = spark.read.parquet(f"{sf_dir}/nation.parquet")
    writer = idempotent_batch_writer(out)
    writer(batch, 7)
    writer(batch, 7)  # redelivery
    assert read_stream_output(spark, out).count() == batch.count()
    # a different batch id APPENDS (its own partition)
    writer(batch, 8)
    assert read_stream_output(spark, out).count() == 2 * batch.count()


def test_stream_to_parquet_and_checkpoint_noop(spark, events_dir, tmp_path):
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(events_dir).schema
    n_src = spark.read.parquet(events_dir).count()

    def run():
        from kevinlang_spark.sources.parquet import normalize_event_ts

        src = normalize_event_ts(
            spark.readStream.schema(schema).parquet(events_dir)
        ).select("event_id", "user_id", "event_type", "value")
        write_stream_exactly_once(src, out, ckpt)

    run()
    got = read_stream_output(spark, out)
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src
    # second run with the same checkpoint: no new source files → no change
    run()
    assert read_stream_output(spark, out).count() == n_src
