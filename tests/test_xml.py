"""XML source/sink: round-trip fidelity, explicit-schema contract,
corrupt-element quarantine, multi-row-per-file splitting."""

from __future__ import annotations

import pytest

from kevinlang_spark.sources.xml import (
    CORRUPT_COL,
    corrupt_records,
    infer_xml_schema,
    read_xml,
    valid_records,
    write_xml,
)

SCHEMA = "doc_id bigint, title string, score double"


def _write(tmp_path, body, name="t.xml"):
    p = tmp_path / name
    p.write_text(f"<docs>{body}</docs>")
    return str(p)


def _row(i, title, score):
    return (
        f"<doc><doc_id>{i}</doc_id><title>{title}</title>"
        f"<score>{score}</score></doc>"
    )


def test_read_xml_explicit_schema(spark, tmp_path):
    p = _write(tmp_path, _row(1, "alpha", 0.5) + _row(2, "beta", 1.25))
    df = read_xml(spark, p, "doc", SCHEMA)
    rows = sorted(
        (r.doc_id, r.title, r.score) for r in valid_records(df).collect()
    )
    assert rows == [(1, "alpha", 0.5), (2, "beta", 1.25)]


def test_read_xml_quarantines_malformed(spark, tmp_path):
    # score is not a double -> PERMISSIVE routes the element to _corrupt
    bad = "<doc><doc_id>9</doc_id><title>x</title><score>oops</score></doc>"
    p = _write(tmp_path, _row(1, "ok", 2.0) + bad)
    df = read_xml(spark, p, "doc", SCHEMA)
    # collect full rows: corruption detection is projection-dependent
    # (pruned columns are never parsed, so their errors never fire — see
    # valid_records docstring), and a bare .count() is rejected outright
    assert len(valid_records(df).collect()) == 1
    quarantined = corrupt_records(df).collect()
    assert len(quarantined) == 1
    assert "oops" in quarantined[0][CORRUPT_COL]
    # full row shape preserved (see corrupt_records docstring)
    assert set(corrupt_records(df).columns) == set(df.columns)


def test_read_xml_failfast_raises(spark, tmp_path):
    bad = "<doc><doc_id>9</doc_id><title>x</title><score>oops</score></doc>"
    p = _write(tmp_path, bad)
    with pytest.raises(Exception):
        read_xml(spark, p, "doc", SCHEMA, mode="FAILFAST").collect()


def test_xml_round_trip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a & b <c>", 0.125), (2, "plain", 7.0)], SCHEMA
    )
    out = str(tmp_path / "out")
    write_xml(src, out, row_tag="doc")
    back = read_xml(spark, out, "doc", SCHEMA)
    rows = sorted(
        (r.doc_id, r.title, r.score) for r in valid_records(back).collect()
    )
    # entity escaping survives the round trip
    assert rows == [(1, "a & b <c>", 0.125), (2, "plain", 7.0)]


def test_infer_xml_schema_names(spark, tmp_path):
    p = _write(tmp_path, _row(1, "alpha", 0.5))
    sch = infer_xml_schema(spark, p, "doc", sampling_ratio=1.0)
    assert set(sch.fieldNames()) == {"doc_id", "title", "score"}
