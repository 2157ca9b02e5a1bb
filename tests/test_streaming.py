"""Event-time windows: batch/streaming parity on the events table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.streaming import windows as W


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from kevinlang_spark.sources.parquet import load_events

    return load_events(spark, sf_dir)


def test_tumbling_counts_total(events):
    out = W.tumbling_counts(events, "1 hour")
    total = out.agg(F.sum("n")).first()[0]
    assert total == events.count()
    r = out.first()
    assert (r["window_end"] - r["window_start"]) == 3600


def test_sliding_counts_overlap(events):
    tumb = W.tumbling_counts(events, "1 hour").count()
    slid = W.sliding_counts(events, "1 hour", "30 minutes").count()
    # each event lands in 2 sliding windows → strictly more window rows
    assert slid > tumb


def test_session_counts(events):
    out = W.session_counts(events, gap="30 minutes")
    assert out.count() > 0
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == events.count()
    # sessions of one user never overlap
    rows = (
        out.where(F.col("user_id") == out.first()["user_id"])
        .orderBy("session_start")
        .collect()
    )
    for a, b in zip(rows, rows[1:]):
        assert a["session_end"] <= b["session_start"]


def test_streaming_matches_batch(spark, sf_dir, events, tmp_path):
    """The same transform over readStream (availableNow) must equal batch."""
    import os

    # file-source streams require a DIRECTORY of files
    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "events.parquet")
    stream_dir = str(tmp_path)
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_sum"])
        for r in W.tumbling_counts(events, "1 hour").collect()
    }
    def transform(df):
        # file-source stream may read ns-as-long ts; same guarded
        # conversion as the batch loader
        from kevinlang_spark.sources.parquet import normalize_event_ts

        return W.tumbling_counts(normalize_event_ts(df), "1 hour")

    table = W.run_stream_to_memory(
        spark,
        stream_dir,
        transform,
        query_name="t_stream_parity",
    )
    stream = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_sum"])
        for r in table.collect()
    }
    assert stream == batch
