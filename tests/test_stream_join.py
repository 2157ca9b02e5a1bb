"""Stream-stream interval join: batch semantics + streaming parity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.streaming import joins as J
from kevinlang_spark.streaming.windows import with_watermark


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from kevinlang_spark.sources.parquet import load_events

    return load_events(spark, sf_dir)


def test_attribution_pairs_semantics(events):
    out = J.attribute_clicks(events, within="24 hours").collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r.click_ts - r.view_ts <= 24 * 3600


def test_interval_join_is_not_nested_loop(events):
    from kevinlang_spark.plans.inspect import executed_plan

    plan = executed_plan(J.attribute_clicks(events, within="24 hours"))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_stream_stream_join_matches_batch(spark, sf_dir, events, tmp_path):
    """Two filtered restreams of the events source, watermarked and
    interval-joined in append mode, must produce exactly the batch pairs
    (availableNow processes everything, so no pair is dropped as late)."""
    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "events.parquet")
    stream_dir = str(tmp_path)
    batch = sorted(
        (r.view_id, r.click_id)
        for r in J.attribute_clicks(events, within="24 hours").collect()
    )

    schema = spark.read.parquet(stream_dir).schema

    def src():
        from kevinlang_spark.sources.parquet import normalize_event_ts

        df = spark.readStream.schema(schema).parquet(stream_dir)
        return normalize_event_ts(df)

    views = with_watermark(
        src().where(F.col("event_type") == "view"), delay="48 hours"
    )
    clicks = with_watermark(
        src().where(F.col("event_type") == "click"), delay="48 hours"
    )
    out = J.interval_pair_join(views, clicks, within="24 hours").select(
        F.col("event_id").alias("view_id"), F.col("event_id_r").alias("click_id")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream = sorted(
        (r.view_id, r.click_id) for r in spark.table("t_ss_join").collect()
    )
    assert stream == batch


def test_stream_static_enrich_matches_batch(spark, sf_dir, events, tmp_path):
    """Stream-static broadcast enrich (availableNow) must equal the batch
    join, carry no streaming state, and never shuffle the stream side."""
    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "ev.parquet")
    dim = events.groupBy("user_id").agg(
        F.count("*").alias("user_events")
    )

    batch = J.enrich_stream(events, dim, on="user_id")
    want = sorted(
        (r.event_id, r.user_events)
        for r in batch.select("event_id", "user_events").collect()
    )

    schema = spark.read.parquet(str(tmp_path)).schema
    src = spark.readStream.schema(schema).parquet(str(tmp_path))
    out = J.enrich_stream(src, dim, on="user_id").select(
        "event_id", "user_events"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.event_id, r.user_events)
        for r in spark.sql("SELECT * FROM enriched").collect()
    )
    assert got == want
    # no stateful operator in the streaming plan (progress reports no
    # state rows) and append mode needed no watermark
    assert all(
        p.get("stateOperators") in ([], None)
        for p in [q.lastProgress]
        if p is not None
    )
