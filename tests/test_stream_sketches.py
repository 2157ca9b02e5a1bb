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


def _value_stream(spark, events_dir):
    from kevinlang_spark.sources.parquet import normalize_event_ts

    schema = spark.read.parquet(events_dir).schema
    return normalize_event_ts(
        spark.readStream.schema(schema).parquet(events_dir)
    ).select("event_type", "value")


def test_stream_kll_matches_batch_quantiles(spark, events_dir, tmp_path):
    from kevinlang_spark.streaming.sketches import kll_quantiles, write_stream_kll

    out, ckpt = str(tmp_path / "kll"), str(tmp_path / "kllckpt")
    write_stream_kll(
        _value_stream(spark, events_dir), out, ckpt, ["event_type"], "value"
    )
    got = {
        r.event_type: r.q_50
        for r in kll_quantiles(spark, out, ["event_type"]).collect()
    }
    exact = {
        r.event_type: (r.lo, r.hi)
        for r in spark.read.parquet(events_dir)
        .where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.45).alias("lo"),
            F.percentile("value", 0.55).alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, (lo, hi) in exact.items():
        # merged-across-batches estimate lands inside the exact
        # ±5-rank-point band (KLL bound at k=200 is ±1.65 at 99%)
        assert lo <= got[k] <= hi, (k, got[k], lo, hi)


def test_stream_kll_checkpoint_restart_noop(spark, events_dir, tmp_path):
    from kevinlang_spark.streaming.sketches import write_stream_kll

    out, ckpt = str(tmp_path / "kll"), str(tmp_path / "kllckpt")
    write_stream_kll(
        _value_stream(spark, events_dir), out, ckpt, ["event_type"], "value"
    )
    n_rows = spark.read.parquet(out).count()
    # second drain with the same checkpoint: no new batches, no appends
    write_stream_kll(
        _value_stream(spark, events_dir), out, ckpt, ["event_type"], "value"
    )
    assert spark.read.parquet(out).count() == n_rows
