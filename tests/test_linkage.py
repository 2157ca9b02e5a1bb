"""Unit semantics for Fellegi-Sunter record linkage (linkage.py)."""

import math

import pytest

from pyspark.sql import functions as F

from kevinlang_spark.operators.linkage import fs_link_pairs, u_probability


def _people(spark):
    # block X: two true twins (1,2) + one stranger; block Y: singletons
    rows = [
        (1, "X", "gold", 5),
        (2, "X", "gold", 5),
        (3, "X", "iron", 7),
        (4, "Y", "gold", 5),
        (5, "Y", "iron", 2),
    ]
    return spark.createDataFrame(
        rows, "id bigint, blk string, tier string, grp int"
    )


def test_u_probability_collision_math(spark):
    df = _people(spark)
    u = u_probability(df, "tier").collect()[0]
    # tier: gold×3, iron×2 over 5 rows → (9+4)/25
    assert u["u"] == pytest.approx(13 / 25)


def test_scores_match_closed_form(spark):
    df = _people(spark)
    out = {
        (r.id_a, r.id_b): (r.n_agree, r.score)
        for r in fs_link_pairs(
            df, "id", F.col("blk"), {"tier": 0.9, "grp": 0.8}, threshold=-99
        ).collect()
    }
    u_tier = 13 / 25
    u_grp = (9 + 4 + 4) / 25  # grp 5×3, 7×1... -> counts 5:3,7:1,2:1 → (9+1+1)/25
    u_grp = 11 / 25
    w = lambda m, u, agree: math.log2(m / u) if agree else math.log2((1 - m) / (1 - u))
    # twins agree on both fields
    exp_twin = round(w(0.9, u_tier, True) + w(0.8, u_grp, True), 4)
    assert out[(1, 2)] == (2, exp_twin)
    # (1,3): disagree on both
    exp_dis = round(w(0.9, u_tier, False) + w(0.8, u_grp, False), 4)
    assert out[(1, 3)] == (0, exp_dis)
    # blocking: cross-block pairs never scored
    assert (1, 4) not in out and (4, 5) in out


def test_threshold_filters(spark):
    df = _people(spark)
    out = fs_link_pairs(
        df, "id", F.col("blk"), {"tier": 0.9, "grp": 0.8}, threshold=1.0
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}  # only the twins


def test_param_guards(spark):
    df = _people(spark)
    with pytest.raises(ValueError):
        fs_link_pairs(df, "id", F.col("blk"), {})
    with pytest.raises(ValueError):
        fs_link_pairs(df, "id", F.col("blk"), {"tier": 1.0})


def test_null_field_is_zero_evidence(spark):
    # a NULL on either side contributes 0 to the score (standard F-S
    # missing-data treatment), not the disagreement weight
    rows = [
        (1, "X", "gold", 5),
        (2, "X", "gold", None),  # grp missing: only tier scores for (1,2)
        (3, "X", "iron", 7),
    ]
    df = spark.createDataFrame(rows, "id bigint, blk string, tier string, grp int")
    out = {
        (r.id_a, r.id_b): (r.n_agree, r.score)
        for r in fs_link_pairs(
            df, "id", F.col("blk"), {"tier": 0.9, "grp": 0.8},
            threshold=-100.0,
        ).collect()
    }
    u_tier = (4 + 1) / 9  # gold×2, iron×1
    u_grp = (1 + 1) / 4   # 5×1, 7×1 (NULL excluded)
    w_a_tier = math.log2(0.9 / u_tier)
    w_d_tier = math.log2(0.1 / (1 - u_tier))
    w_d_grp = math.log2(0.2 / (1 - u_grp))
    # (1,2): tier agrees, grp NULL → exactly the tier weight, n_agree 1
    assert out[(1, 2)] == (1, round(w_a_tier, 4))
    # (1,3): both disagree (no NULLs) → both disagreement weights
    assert out[(1, 3)] == (0, round(w_d_tier + w_d_grp, 4))
    # (2,3): tier disagrees, grp NULL → tier disagreement only
    assert out[(2, 3)] == (0, round(w_d_tier, 4))


def test_degenerate_field_raises(spark):
    # single-distinct-value field → u = 1.0 → clear error, not a crash
    rows = [(1, "X", "gold", 5), (2, "X", "gold", 6)]
    df = spark.createDataFrame(rows, "id bigint, blk string, tier string, grp int")
    with pytest.raises(ValueError, match="tier"):
        fs_link_pairs(df, "id", F.col("blk"), {"tier": 0.9})
    # all-NULL field → clear error naming the field, not TypeError
    rows2 = [(1, "X", None, 5), (2, "X", None, 6)]
    df2 = spark.createDataFrame(rows2, "id bigint, blk string, tier string, grp int")
    with pytest.raises(ValueError, match="tier"):
        fs_link_pairs(df2, "id", F.col("blk"), {"tier": 0.9})
