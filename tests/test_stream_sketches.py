"""Streaming HLL sketch maintenance: stream -> sketch table -> distinct
parity with batch, checkpointed restart no-op."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.streaming.sketches import hll_distinct, write_stream_hll


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", src / "events.parquet")
    return str(src)


def _stream(spark, events_dir):
    from kevinlang_spark.sources.parquet import normalize_event_ts

    schema = spark.read.parquet(events_dir).schema
    return normalize_event_ts(
        spark.readStream.schema(schema).parquet(events_dir)
    ).select("event_type", "user_id")


def test_stream_hll_matches_batch_distinct(spark, events_dir, tmp_path):
    out, ckpt = str(tmp_path / "sk"), str(tmp_path / "ckpt")
    write_stream_hll(
        _stream(spark, events_dir), out, ckpt, ["event_type"], "user_id"
    )
    got = {
        r.event_type: r.n_distinct
        for r in hll_distinct(spark, out, ["event_type"]).collect()
    }
    exact = {
        r.event_type: r.n
        for r in spark.read.parquet(events_dir)
        .where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        # union-of-batch-sketches lands within the HLL bound of truth
        assert abs(got[k] - n) <= max(0.05 * n, 2)


def test_stream_hll_checkpoint_restart_noop(spark, events_dir, tmp_path):
    out, ckpt = str(tmp_path / "sk"), str(tmp_path / "ckpt")
    write_stream_hll(
        _stream(spark, events_dir), out, ckpt, ["event_type"], "user_id"
    )
    n_rows = spark.read.parquet(out).count()
    before = {
        r.event_type: r.n_distinct
        for r in hll_distinct(spark, out, ["event_type"]).collect()
    }
    # second drain with the same checkpoint: no new source files -> no
    # appended sketches, identical answers
    write_stream_hll(
        _stream(spark, events_dir), out, ckpt, ["event_type"], "user_id"
    )
    assert spark.read.parquet(out).count() == n_rows
    after = {
        r.event_type: r.n_distinct
        for r in hll_distinct(spark, out, ["event_type"]).collect()
    }
    assert before == after


def test_stream_hll_sketch_rows_are_bounded(spark, events_dir, tmp_path):
    """The sketch table carries keys x batches rows of <= 2^lgk bytes --
    never value-cardinality state."""
    out, ckpt = str(tmp_path / "sk"), str(tmp_path / "ckpt")
    write_stream_hll(
        _stream(spark, events_dir), out, ckpt, ["event_type"], "user_id",
        lgk=12,
    )
    tbl = spark.read.parquet(out)
    n_types = (
        spark.read.parquet(events_dir).select("event_type").distinct().count()
    )
    n_batches = tbl.select("batch_id").distinct().count()
    assert tbl.count() <= n_types * n_batches
    max_len = tbl.select(F.max(F.length("sketch"))).collect()[0][0]
    assert max_len <= 2**12 + 64  # sketch bytes + serialization header
