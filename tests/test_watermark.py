"""Watermark / late-data semantics: append-mode windowed aggregation across
two checkpointed runs — a late event beyond the watermark must be dropped."""

from __future__ import annotations

import datetime as dt
import glob
import shutil

from kevinlang_spark.streaming.windows import tumbling_counts, with_watermark


def _rows(spark, ts_values):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), "click", 1.0)
         for i, m in enumerate(ts_values)],
        "event_id long, ts timestamp, event_type string, value double",
    )


def _drop_file(spark, df, src_dir, name, tmp_path):
    stage = tmp_path / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    part = glob.glob(str(stage / "part-*.parquet"))[0]
    shutil.copy(part, str(src_dir / f"{name}.parquet"))


def _run_batch(spark, src, cp, sink):
    # parquet sink: supports checkpoint recovery (memory sink does not)
    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = tumbling_counts(with_watermark(stream, "ts", "10 minutes"), "1 hour")
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")  # append emits only FINALIZED windows
        .option("checkpointLocation", str(cp))
        .option("path", str(sink))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.read.parquet(str(sink)).collect()
    return {r["window_start"]: r["n"] for r in emitted}


def test_late_event_dropped_after_watermark(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    cp = tmp_path / "cp"

    sink = tmp_path / "out"

    # run 1: events at 0:05, 0:20, 2:50 → watermark advances to 2:40,
    # finalizing the hour-0 window with its 2 events
    _drop_file(spark, _rows(spark, [5, 20, 170]), src, "b1", tmp_path)
    _run_batch(spark, src, cp, sink)

    # run 2 (same checkpoint → watermark restored): a LATE event at 0:30
    # (behind the 2:40 watermark → dropped) + an on-time event at 3:10
    _drop_file(spark, _rows(spark, [30, 190]), src, "b2", tmp_path)
    got = _run_batch(spark, src, cp, sink)

    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    # the sink holds every window ever finalized; hour 0 must appear once
    # with its 2 ON-TIME events — the late 0:30 event was dropped
    assert got.get(base) == 2, got
