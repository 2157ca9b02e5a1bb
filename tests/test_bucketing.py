"""Bucketed tables: the pay-the-shuffle-once co-location contract.

The plan assertions are the point: a join between two same-bucketed
tables must contain ZERO Exchange, and a groupBy on the bucket key must
not reshuffle.  These are the properties that turn a daily 100 TB join
into a scan-side merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.plans.inspect import executed_plan
from kevinlang_spark.sources.parquet import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "b_orders", "o_orderkey", 4, sort_cols="o_orderkey"
    )
    write_bucketed(
        li, "b_lineitem", "l_orderkey", 4, sort_cols="l_orderkey"
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    """At test scale the planner would broadcast the small side (which
    bypasses bucketing entirely); force the shuffle-join path the big
    sides take at 100 TB so the bucket contract is what's on trial."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield
    spark.conf.set(key, old)


def test_bucketed_join_has_no_exchange(spark, bucketed_pair, no_broadcast):
    t_orders, t_li = bucketed_pair
    joined = read_bucketed(spark, t_li).join(
        read_bucketed(spark, t_orders),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = executed_plan(joined)
    assert "Exchange" not in plan, plan
    # it IS a real join, not something degenerate
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_bucketed_groupby_on_key_has_no_exchange(spark, bucketed_pair):
    _, t_li = bucketed_pair
    agg = (
        read_bucketed(spark, t_li)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange" not in executed_plan(agg)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    t_orders, t_li = bucketed_pair
    bucketed = (
        read_bucketed(spark, t_li)
        .join(
            read_bucketed(spark, t_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_path_read_loses_bucket_contract(spark, bucketed_pair, no_broadcast):
    """Reading the same files WITHOUT the catalog reshuffles — pins why
    read_bucketed goes through spark.table."""
    t_orders, t_li = bucketed_pair
    loc = (
        spark.sql(f"DESCRIBE FORMATTED {t_li}")
        .where(F.col("col_name") == "Location")
        .collect()[0][1]
    )
    raw = spark.read.parquet(loc)
    joined = raw.join(
        read_bucketed(spark, t_orders),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert "Exchange hashpartitioning" in executed_plan(joined)
