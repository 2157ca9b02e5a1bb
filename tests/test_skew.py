"""Salted (skew-safe) aggregation and join: result parity with the plain
plans, plus plan-shape checks that the salt actually fans out."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kevinlang_spark.operators.skew import salted_agg, salted_join
from kevinlang_spark.plans.inspect import executed_plan


@pytest.fixture(scope="module")
def skewed(spark):
    """1000 rows of one hot key + a sprinkle of cold keys."""
    rows = [Row(k="hot", v=float(i)) for i in range(1000)] + [
        Row(k=f"cold{i}", v=float(i)) for i in range(20)
    ]
    return spark.createDataFrame(rows)


def test_salted_agg_equals_plain(skewed):
    plain = {
        r["k"]: r
        for r in skewed.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.avg("v").alias("m"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        r["k"]: r
        for r in salted_agg(
            skewed,
            ["k"],
            {
                "n": ("count", "v"),
                "s": ("sum", "v"),
                "m": ("mean", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k]["n"] == plain[k]["n"]
        assert salted[k]["s"] == pytest.approx(plain[k]["s"])
        assert salted[k]["m"] == pytest.approx(plain[k]["m"])
        assert salted[k]["lo"] == plain[k]["lo"]
        assert salted[k]["hi"] == plain[k]["hi"]


def test_salted_agg_two_stages(skewed):
    plan = executed_plan(
        salted_agg(skewed, ["k"], {"s": ("sum", "v")}, n_salts=8)
    )
    # stage-1 agg on (k, salt) + stage-2 agg on k, each with its partial:
    # at least 2 Exchanges (salted + final) in the physical plan
    assert plan.count("Exchange") >= 2


def test_salted_agg_rejects_non_mergeable(skewed):
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_agg(skewed, ["k"], {"x": ("median", "v")})


def test_salted_join_equals_plain_inner(skewed):
    dim = skewed.groupBy("k").agg(F.count("*").alias("c"))
    plain = {tuple(r) for r in skewed.join(dim, "k").collect()}
    salted = {tuple(r) for r in salted_join(skewed, dim, on="k", n_salts=4).collect()}
    assert salted == plain


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    right = spark.createDataFrame([Row(k="a", c=10)])
    out = {(r["k"], r["c"]) for r in salted_join(left, right, on="k", how="left").collect()}
    assert out == {("a", 10), ("b", None)}


def test_salted_join_rejects_outer(spark):
    df = spark.createDataFrame([Row(k="a")])
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on="k", how="full")
