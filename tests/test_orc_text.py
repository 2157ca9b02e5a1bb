"""ORC round-trip (values + pushdown) and text-line source semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kevinlang_spark.plans.inspect import executed_plan, pushed_filters
from kevinlang_spark.sources.orc import read_orc, read_text_lines, write_orc


def test_orc_roundtrip_values(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    p = str(tmp_path / "nation_orc")
    write_orc(src, p)
    back = read_orc(spark, p)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_filter_pushdown(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = str(tmp_path / "orders_orc")
    write_orc(src, p)
    df = read_orc(spark, p).where(F.col("o_orderkey") == 42).select("o_orderkey")
    pushed = " ".join(pushed_filters(df))
    assert "o_orderkey" in pushed, executed_plan(df)


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    p = str(tmp_path / "orders_part")
    write_orc(src, p, partition_by=["status"])
    df = read_orc(spark, p).where(F.col("status") == "F")
    plan = executed_plan(df)
    # partition pruning shows up as a partition filter, not a data filter
    assert "status" in plan and df.count() > 0


def test_text_lines_ids_are_content_addressed(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("alpha beta\ngamma\nalpha beta\n")
    df = read_text_lines(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    ids = {r.text: r.doc_id for r in rows}
    # identical lines share an id (content-addressed); distinct lines differ
    assert len(ids) == 2 and ids["alpha beta"] != ids["gamma"]
    # reproducible across reads
    again = {r.text: r.doc_id for r in read_text_lines(spark, str(p)).collect()}
    assert again == ids


def test_text_lines_feed_dedup(spark, tmp_path):
    from kevinlang_spark.operators.dedup import dedup_exact

    p = tmp_path / "corpus2.txt"
    p.write_text("dup line\ndup line\nunique one\n")
    df = read_text_lines(spark, str(p))
    assert dedup_exact(df).count() == 2
