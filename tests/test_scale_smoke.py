"""Scale smoke: 10M synthetic rows through the engine's unordered
(cluster-mode) paths.  Catches accidental collect()s, single-partition
windows, or driver-side loops that small fixtures would hide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.frame import KevinFrame, SortOrder
from kevinlang_spark.plans import executed_plan

N = 10_000_000


@pytest.fixture(scope="module")
def big(spark):
    return (
        spark.range(N, numPartitions=32)
        .select(
            F.col("id"),
            (F.col("id") % 1000).alias("k"),
            (F.pmod(F.xxhash64("id"), F.lit(10000)) / 100.0).alias("v"),
        )
    )


def test_big_groupby_aggregate(big):
    kf = KevinFrame.from_df(big, ordered=False)
    out = kf.groupby("k").aggregate("sum", "v", alias="s")
    rows = out.df.count()
    assert rows == 1000
    plan = executed_plan(out.df)
    assert "Window" not in plan


def test_big_join_and_filter(big, spark):
    kf = KevinFrame.from_df(big, ordered=False)
    dim = KevinFrame.from_df(
        spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("grp")),
        ordered=False,
    )
    out = (
        kf.filter(F.col("v") > 50)
        .merge(dim, on="k", broadcast_other=True)
        .groupby("grp")
        .aggregate("count", "v", alias="n")
    )
    res = out.df.collect()
    assert len(res) == 7
    total = sum(r["n"] for r in res)
    assert total == big.where(F.col("v") > 50).count()
    plan = executed_plan(out.df)
    assert "BroadcastHashJoin" in plan


def test_big_topk_parallel(big):
    """take on an ordered big frame must be TakeOrderedAndProject, not a
    single-partition window."""
    kf = KevinFrame.from_df(big)  # ordered: __idx = mid(), no shuffle
    top = kf.sort("v", SortOrder.DESCENDING).take(5)
    plan = executed_plan(top.df)
    assert "TakeOrderedAndProject" in plan
    rows = top.select(["v"]).collect()
    assert len(rows) == 5
    assert rows[0]["v"] == 99.99
