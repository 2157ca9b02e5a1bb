"""Round-4b operators: semantic dedup (SemDeDup-style), market-basket
association rules, and sideways-information-passing join pruning
(explicit key semi-join + Catalyst's native runtime Bloom filter)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.plans.inspect import assert_no_cartesian, executed_plan


# --------------------------------------------------------------------- #
# semantic_dedup
# --------------------------------------------------------------------- #


def _emb_df(spark):
    rows = [
        # bucket "11": 10 and 11 are near-identical (dup), 12 is orthogonal-ish
        (10, [1.0, 1.0, 0.5, 0.2]),
        (11, [1.0, 1.0, 0.5, 0.21]),
        (12, [0.1, 0.9, -4.0, 3.0]),
        # bucket "00": singleton
        (20, [-1.0, -1.0, 0.3, 0.3]),
        # null embedding dropped
        (30, None),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_semantic_dedup_flags_near_identical(spark):
    from kevinlang_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(_emb_df(spark), bits=2, threshold=0.95)
    got = {r.id: r for r in out.collect()}
    assert set(got) == {10, 11, 12, 20}
    # min-id representative per bucket
    assert got[10].rep_id == 10 and got[11].rep_id == 10 and got[12].rep_id == 10
    assert got[20].rep_id == 20
    # the rep itself is never a dup, its self-sim is 1
    assert got[10].sim == pytest.approx(1.0) and not got[10].is_dup
    assert got[11].is_dup  # cosine ~0.99997
    assert not got[12].is_dup  # cosine to rep well below threshold
    assert not got[20].is_dup  # singleton bucket


def test_semantic_dedup_single_shuffle_no_join(spark):
    from kevinlang_spark.operators.similarity import semantic_dedup

    plan = executed_plan(semantic_dedup(_emb_df(spark), bits=2, threshold=0.9))
    # window-based rep propagation: no join operator at all, and the only
    # exchange is the bucket hash partitioning
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_sign_bucket_matches_manual(spark):
    from kevinlang_spark.operators.similarity import sign_bucket

    df = spark.createDataFrame(
        [([0.5, -0.1, 0.0, 2.0],)], "embedding array<double>"
    )
    (r,) = df.select(sign_bucket(F.col("embedding"), 4).alias("b")).collect()
    assert r.b == "1011"  # zero counts as non-negative


# --------------------------------------------------------------------- #
# association rules
# --------------------------------------------------------------------- #


def _basket_df(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # repeat purchase collapses
        (4, "c"),
    ]
    return spark.createDataFrame(rows, "basket bigint, item string")


def test_cooccurrence_counts(spark):
    from kevinlang_spark.operators.baskets import cooccurrence_pairs

    out = cooccurrence_pairs(_basket_df(spark), "basket", "item")
    got = {(r.item_a, r.item_b): r.pair_support for r in out.collect()}
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}


def test_association_rules_confidence_lift(spark):
    from kevinlang_spark.operators.baskets import association_rules

    out = association_rules(_basket_df(spark), "basket", "item", min_support=2)
    got = {(r.antecedent, r.consequent): r for r in out.collect()}
    # only the a-b pair clears min_support=2; both directions emitted
    assert set(got) == {("a", "b"), ("b", "a")}
    r = got[("a", "b")]
    # supp(a)=3, supp(b)=3, supp(a,b)=3, n_baskets=4
    assert r.pair_support == 3
    assert r.confidence == pytest.approx(1.0)
    assert r.lift == pytest.approx(1.0 / (3 / 4), rel=1e-6)


def test_association_rules_max_basket_guard(spark):
    from kevinlang_spark.operators.baskets import cooccurrence_pairs

    out = cooccurrence_pairs(
        _basket_df(spark), "basket", "item", max_basket_size=2
    )
    got = {(r.item_a, r.item_b): r.pair_support for r in out.collect()}
    # basket 1 (3 items) dropped; only baskets 2 and 3 pair up
    assert got == {("a", "b"): 2}


def test_association_rules_data_joins_are_keyed(spark):
    """Every data-sized join must be keyed: the pair generation joins on
    the basket key, supports attach by broadcast hash join.  The only
    permitted nested-loop is the 1-row scalar (n_baskets) broadcast —
    the same plan Spark emits for a scalar subquery."""
    from kevinlang_spark.operators.baskets import association_rules

    plan = executed_plan(
        association_rules(_basket_df(spark), "basket", "item", min_support=2)
    )
    assert "CartesianProduct" not in plan
    # scalar attach is the one nested loop; its build side is a 1-row agg
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------- #
# key-filter join + native runtime bloom filter
# --------------------------------------------------------------------- #


def test_keyfilter_join_matches_plain_join(spark, sf_dir):
    from kevinlang_spark.operators.joins import keyfilter_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").where(
        F.col("s_acctbal") > 4000
    )
    got = keyfilter_join(li, supp, "l_suppkey", "s_suppkey").count()
    want = li.join(supp, li.l_suppkey == supp.s_suppkey).count()
    assert got == want > 0


def test_keyfilter_join_prunes_before_main_join(spark, sf_dir):
    from kevinlang_spark.operators.joins import keyfilter_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").where(
        F.col("s_acctbal") > 4000
    )
    plan = executed_plan(keyfilter_join(li, supp, "l_suppkey", "s_suppkey"))
    # the semi prune must be a broadcast join (keys only), not a shuffle
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_catalyst_injects_runtime_bloom_filter(spark, sf_dir):
    """With the application-side size gate lowered, Catalyst's
    InjectRuntimeFilter plants a bloom-filter might_contain on the fact
    side of a selective shuffle join — the native form of keyfilter_join."""
    from kevinlang_spark.operators.joins import runtime_bloom_configs

    cfgs = runtime_bloom_configs()
    old = {}
    for k, v in cfgs.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").where(
            F.col("s_acctbal") > 4000
        )
        j = li.join(supp, li.l_suppkey == supp.s_suppkey)
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
