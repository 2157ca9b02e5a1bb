"""Write-side scale features: partitioned output, bucketed join without
shuffle, salted-join helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.plans import executed_plan
from kevinlang_spark.sources import sinks


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_part")
    sinks.write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = executed_plan(back)
    # partition filter handled at the file index, not as a data filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "o_orderstatus" in plan.split("PartitionFilters")[1][:120]
    want = orders.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == want


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # warehouse dir is set session-wide in conftest (static conf)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sinks.write_bucketed(orders, "orders_b", ["o_custkey"], 8, sort_by=["o_custkey"])
    sinks.write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "cust_b", ["o_custkey"], 8,
        sort_by=["o_custkey"],
    )
    a = spark.table("orders_b")
    b = spark.table("cust_b")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_custkey")
        joined.collect()
        plan = executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_salted_join_correctness(spark, sf_dir):
    """Salted fact + exploded dim join equals the plain join."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    nation_like = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey").distinct().limit(50)
        .withColumn("w", F.lit(1))
    )
    plain = li.join(nation_like, "l_orderkey").count()
    fact = sinks.salted(li, "l_orderkey", 8)
    dim = sinks.explode_salt(nation_like, 8)
    got = fact.join(dim, ["l_orderkey", "__salt"]).count()
    # salting must not lose or duplicate rows... but fact salt is random per
    # row and dim covers ALL salts → exact same multiset of matches
    assert got == plain
