"""Custom stateful streaming operator (applyInPandasWithState) parity."""

from __future__ import annotations

import os

import pytest

from kevinlang_spark.sources.parquet import load_events
from kevinlang_spark.streaming import stateful


def test_stateful_running_totals_matches_batch(spark, sf_dir, tmp_path):
    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "events.parquet")
    table = stateful.run_stateful_to_memory(spark, str(tmp_path), "t_stateful")
    # update mode may emit multiple rows per key across batches; the LAST
    # update per key is the final state — with availableNow over one file
    # there is one batch, so rows are final
    stream = {r["user_id"]: (r["n_events"], r["value_sum"]) for r in table.collect()}
    batch = {
        r["user_id"]: (r["n_events"], r["value_sum"])
        for r in stateful.running_totals_batch(load_events(spark, sf_dir)).collect()
    }
    assert stream == batch


def test_stateful_output_is_partitioned_state(spark, sf_dir):
    """The streaming plan must contain the stateful operator (state lives
    per-partition on executors, not the driver)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = spark.readStream.schema(schema).parquet(sf_dir)
    out = stateful.running_totals_stream(src)
    assert out.isStreaming
