"""JSONL source/sink: round-trip fidelity, explicit-schema contract,
corrupt-line quarantine, gzip transparency."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.sources.jsonl import (
    CORRUPT_COL,
    corrupt_lines,
    infer_jsonl_schema,
    read_jsonl,
    valid_rows,
    write_jsonl,
)

SCHEMA = "doc_id long, source string, text string"


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )


def test_jsonl_round_trip(spark, docs, tmp_path):
    p = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, p)
    back = valid_rows(read_jsonl(spark, p, SCHEMA))
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.select("doc_id", "source", "text").collect()}
    assert a == b


def test_jsonl_gzip_round_trip(spark, docs, tmp_path):
    p = str(tmp_path / "docs_gz")
    write_jsonl(docs.limit(50), p, compression="gzip")
    back = valid_rows(read_jsonl(spark, p, SCHEMA))
    assert back.count() == 50


def test_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "source": "web", "text": "ok"}),
        '{"doc_id": 2, "source": "web", "text": "trunca',  # bad
        json.dumps({"doc_id": 3, "source": "books", "text": "fine"}),
        "not json at all",  # bad
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonl(spark, str(p), SCHEMA)
    assert valid_rows(df).count() == 2
    bad = [r[CORRUPT_COL] for r in corrupt_lines(df).collect()]
    assert len(bad) == 2
    assert any("trunca" in b for b in bad)


def test_failfast_mode_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1}\nnot json\n')
    df = read_jsonl(
        spark, str(p), "doc_id long", mode="FAILFAST", track_corrupt=False
    )
    with pytest.raises(Exception):
        df.collect()


def test_infer_schema_bounded(spark, docs, tmp_path):
    p = str(tmp_path / "infer")
    write_jsonl(docs.limit(100), p)
    schema = infer_jsonl_schema(spark, p, sampling_ratio=0.5)
    assert {f.name for f in schema.fields} >= {"doc_id", "source", "text"}


def test_jsonl_scan_prunes_columns(spark, docs, tmp_path):
    """Column pruning reaches the JSON scan (ReadSchema shows only the
    selected fields)."""
    from kevinlang_spark.plans.inspect import executed_plan

    p = str(tmp_path / "prune")
    write_jsonl(docs, p)
    df = read_jsonl(spark, p, SCHEMA, track_corrupt=False).select("doc_id")
    plan = executed_plan(df)
    assert "ReadSchema: struct<doc_id:bigint>" in plan
