"""Resumable stage-manifest pipeline runner (kevinlang_spark.pipeline):
skip-if-done, chained invalidation, crash resume, force semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.pipeline import Stage, pipeline_report, run_pipeline

RUNS: list[str] = []  # which stage fns actually executed


def _mark(name):
    RUNS.append(name)


def _stages(sf_dir, threshold=100):
    def ingest(spark):
        _mark("ingest")
        return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "source", "text"
        )

    def filt(ingest):
        _mark("filt")
        return ingest.where(F.length("text") >= threshold)

    def report(filt):
        _mark("report")
        return filt.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )

    return [
        Stage("ingest", ingest),
        # threshold is a closure variable the source hash cannot see:
        # fold it into an explicit version token
        Stage("filt", filt, inputs=("ingest",), version=f"filt-v1-{threshold}"),
        Stage("report", report, inputs=("filt",)),
    ]


def test_pipeline_runs_skips_and_resumes(spark, sf_dir, tmp_path):
    root = str(tmp_path / "pipe")
    RUNS.clear()
    out = run_pipeline(spark, _stages(sf_dir), root)
    assert RUNS == ["ingest", "filt", "report"]
    n_report = out["report"].count()
    assert n_report > 0

    # second run: everything fingerprint-matches -> zero stage fns run
    RUNS.clear()
    out2 = run_pipeline(spark, _stages(sf_dir), root)
    assert RUNS == []
    assert out2["report"].count() == n_report

    # simulate a crash mid-write of the LAST stage (no _SUCCESS marker)
    os.remove(os.path.join(root, "report", "_SUCCESS"))
    RUNS.clear()
    run_pipeline(spark, _stages(sf_dir), root)
    assert RUNS == ["report"]  # upstream stages were NOT recomputed


def test_pipeline_code_change_invalidates_downstream_only(
    spark, sf_dir, tmp_path
):
    root = str(tmp_path / "pipe2")
    run_pipeline(spark, _stages(sf_dir), root)
    # changing a mid-stage's version (parameter retune) recomputes it
    # and its consumers, never its producer
    RUNS.clear()
    out = run_pipeline(spark, _stages(sf_dir, threshold=200), root)
    assert RUNS == ["filt", "report"]
    assert (
        out["filt"]
        .where(F.length("text") < 200)
        .count()
        == 0
    )


def test_pipeline_force_recomputes_and_chains(spark, sf_dir, tmp_path):
    root = str(tmp_path / "pipe3")
    run_pipeline(spark, _stages(sf_dir), root)
    RUNS.clear()
    run_pipeline(spark, _stages(sf_dir), root, force=("filt",))
    assert RUNS == ["filt", "report"]
    with pytest.raises(ValueError, match="force names"):
        run_pipeline(spark, _stages(sf_dir), root, force=("nope",))


def test_pipeline_report_reads_manifests(spark, sf_dir, tmp_path):
    root = str(tmp_path / "pipe4")
    out = run_pipeline(spark, _stages(sf_dir), root)
    rep = {r["stage"]: r for r in pipeline_report(spark, root).collect()}
    assert set(rep) == {"ingest", "filt", "report"}
    assert rep["report"]["rows"] == out["report"].count()
    assert rep["filt"]["inputs"] == "ingest"
    # volume drop per stage is visible without recounting
    assert rep["filt"]["rows"] <= rep["ingest"]["rows"]


def test_pipeline_validates_topology(spark, sf_dir, tmp_path):
    with pytest.raises(ValueError, match="topological"):
        run_pipeline(
            spark,
            [Stage("b", lambda a: a, inputs=("a",), version="v")],
            str(tmp_path / "pipe5"),
        )
    with pytest.raises(ValueError, match="duplicate"):
        stages = _stages(sf_dir)
        run_pipeline(
            spark, stages + [stages[0]], str(tmp_path / "pipe6")
        )
