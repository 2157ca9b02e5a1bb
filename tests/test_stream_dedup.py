"""Streaming dedup (watermark-bounded state) vs its batch twin.

Extends SURVEY §2.7 streaming parity: the reference engine is batch-only
(src/Data/DataFrame.hs is a list-of-rows), so these semantics are
beyond-reference; parity is checked against Spark batch dropDuplicates
on the same key expression."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kevinlang_spark.streaming.dedup import dedup_batch, dedup_stream, with_fingerprint
from kevinlang_spark.streaming.windows import run_stream_to_memory


def _ts(minute):
    return dt.datetime(2024, 1, 1, 12, minute)


@pytest.fixture(scope="module")
def dup_docs(spark, tmp_path_factory):
    """Doc stream with near-in-time duplicate texts (same fp, different
    doc_id/arrival) plus unique docs."""
    rows = [
        Row(doc_id=1, ts=_ts(0), text="the cat sat on the mat"),
        Row(doc_id=2, ts=_ts(1), text="The   cat sat on the MAT"),  # dup of 1
        Row(doc_id=3, ts=_ts(2), text="something else entirely"),
        Row(doc_id=4, ts=_ts(3), text="the cat sat on the mat"),  # dup of 1
        Row(doc_id=5, ts=_ts(4), text="a third distinct document"),
        Row(doc_id=6, ts=_ts(5), text="something ELSE entirely"),  # dup of 3
    ]
    p = str(tmp_path_factory.mktemp("stream") / "docs")
    spark.createDataFrame(rows).write.parquet(p)
    return p


def test_stream_dedup_first_arrival(spark, dup_docs):
    out = run_stream_to_memory(
        spark,
        dup_docs,
        lambda src: dedup_stream(with_fingerprint(src), ["fp"], "ts", "10 minutes"),
        query_name="dedup_stream_t1",
        output_mode="append",
    )
    rows = out.collect()
    # 3 distinct fingerprints survive, one row each
    assert len(rows) == 3
    assert len({r["fp"] for r in rows}) == 3


def test_stream_dedup_matches_batch_key_set(spark, dup_docs):
    batch = dedup_batch(with_fingerprint(spark.read.parquet(dup_docs)), ["fp"])
    streamed = run_stream_to_memory(
        spark,
        dup_docs,
        lambda src: dedup_stream(with_fingerprint(src), ["fp"], "ts", "10 minutes"),
        query_name="dedup_stream_t2",
        output_mode="append",
    )
    assert {r["fp"] for r in batch.collect()} == {
        r["fp"] for r in streamed.collect()
    }
    assert batch.count() == streamed.count()


def test_stream_dedup_bounded_state_plan(spark, dup_docs):
    """The streaming plan must carry the watermark-eviction dedup operator
    (bounded state), not the unbounded plain dropDuplicates."""
    schema = spark.read.parquet(dup_docs).schema
    src = spark.readStream.schema(schema).parquet(dup_docs)
    out = dedup_stream(with_fingerprint(src), ["fp"], "ts", "10 minutes")
    logical = out._jdf.queryExecution().logical().toString()
    assert "DeduplicateWithinWatermark" in logical
