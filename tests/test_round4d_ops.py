"""Round-4d operators: time-decayed aggregates, Poisson bootstrap,
PSI drift, per-group OLS, k-anonymity audit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# time_decayed_agg
# --------------------------------------------------------------------- #


def test_decayed_agg_closed_form(spark):
    from kevinlang_spark.operators.events import time_decayed_agg

    # events exactly 0 / 1 / 2 half-lives before the reference instant
    df = spark.createDataFrame(
        [
            (1, "2024-01-08 00:00:00", 10.0),  # weight 1
            (1, "2024-01-01 00:00:00", 10.0),  # weight 0.5
            (1, "2023-12-25 00:00:00", 10.0),  # weight 0.25
            (2, "2024-01-08 00:00:00", 4.0),  # weight 1
        ],
        "user_id bigint, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.user_id: r
        for r in time_decayed_agg(
            df, ref_ts="2024-01-08 00:00:00", half_life_hours=168.0
        ).collect()
    }
    assert got[1].n_events == 3
    assert got[1].decayed_sum == pytest.approx(17.5, abs=1e-6)
    assert got[1].decayed_n == pytest.approx(1.75, abs=1e-6)
    assert got[1].decayed_mean == pytest.approx(10.0, abs=1e-6)
    assert got[2].decayed_sum == pytest.approx(4.0, abs=1e-6)


def test_decayed_agg_nulls_dropped_and_validation(spark):
    from kevinlang_spark.operators.events import time_decayed_agg

    df = spark.createDataFrame(
        [(1, "2024-01-08 00:00:00", None), (1, None, 5.0)],
        "user_id bigint, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    assert time_decayed_agg(df, ref_ts="2024-01-08 00:00:00").count() == 0
    with pytest.raises(ValueError, match="half_life_hours"):
        time_decayed_agg(df, ref_ts="2024-01-08 00:00:00", half_life_hours=0)


# --------------------------------------------------------------------- #
# poisson_bootstrap
# --------------------------------------------------------------------- #


def _boot_df(spark, n=2000, spread=1.0):
    return spark.range(n).select(
        F.col("id"),
        (50.0 + spread * (F.col("id") % 21 - 10)).alias("x"),
    )


def test_poisson_bootstrap_recovers_mean_and_se(spark):
    from kevinlang_spark.operators.stats import poisson_bootstrap

    n = 2000
    df = _boot_df(spark, n)
    (r,) = poisson_bootstrap(df, "x", "id", n_boot=32).collect()
    xs = [50.0 + (i % 21 - 10) for i in range(n)]
    mean = sum(xs) / n
    var = sum((v - mean) ** 2 for v in xs) / (n - 1)
    se = math.sqrt(var / n)
    assert r.n_boot == 32
    # bootstrap mean ≈ sample mean to within a few SEs
    assert abs(r.boot_mean - mean) < 3 * se
    # bootstrap SE ≈ analytic SE of the mean (within 2× either way)
    assert se / 2 < r.boot_se < se * 2
    assert r.ci_lo < mean < r.ci_hi


def test_poisson_bootstrap_deterministic(spark):
    from kevinlang_spark.operators.stats import poisson_bootstrap

    df = _boot_df(spark, 500).repartition(7)
    a = poisson_bootstrap(df, "x", "id", n_boot=16).collect()[0]
    b = poisson_bootstrap(df.repartition(3), "x", "id", n_boot=16).collect()[0]
    # hash-derived weights: identical regardless of partitioning / rerun
    assert a == b


def test_poisson_weights_distribution(spark):
    from kevinlang_spark.operators.sampling import hash_bucket
    from kevinlang_spark.operators.stats import _poisson1_weight

    n = 20_000
    u = hash_bucket(F.col("id").cast("string"), 1_000_000) / 1_000_000.0
    agg = (
        spark.range(n)
        .select(_poisson1_weight(u).cast("double").alias("w"))
        .agg(F.avg("w").alias("m"), F.var_samp("w").alias("v"))
        .collect()[0]
    )
    # Poisson(1): mean 1, variance 1
    assert agg.m == pytest.approx(1.0, abs=0.05)
    assert agg.v == pytest.approx(1.0, abs=0.1)


def test_poisson_bootstrap_validation(spark):
    from kevinlang_spark.operators.stats import poisson_bootstrap

    with pytest.raises(ValueError, match="n_boot"):
        poisson_bootstrap(_boot_df(spark, 10), "x", "id", n_boot=1)


# --------------------------------------------------------------------- #
# psi_drift
# --------------------------------------------------------------------- #


def test_psi_identical_arms_near_zero(spark):
    from kevinlang_spark.operators.drift import psi_drift

    rows = [(float(i % 100), arm) for i in range(2000) for arm in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, arm string")
    out = psi_drift(df, "v", "arm", "a", "b", lo=0.0, hi=100.0, nbins=10)
    got = out.collect()
    assert len(got) == 10
    assert all(abs(r.psi_total) < 1e-9 for r in got)
    assert sum(r.n_expected for r in got) == 2000


def test_psi_shifted_arm_flags_drift(spark):
    from kevinlang_spark.operators.drift import psi_drift

    rows = [(float(i % 100), "a") for i in range(2000)] + [
        (float(i % 100) + 40.0, "b") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "v double, arm string")
    (r, *_) = psi_drift(
        df, "v", "arm", "a", "b", lo=0.0, hi=100.0, nbins=10
    ).collect()
    assert r.psi_total > 0.25  # "drifted" by the standard rule of thumb


def test_psi_empty_bins_and_clamping(spark):
    from kevinlang_spark.operators.drift import psi_drift

    # arm b vacates bins 0-4 entirely and overflows the top edge
    rows = [(float(v), "a") for v in (5, 15, 25, 35, 45, 55)] + [
        (999.0, "b"),
        (-50.0, "a"),  # clamps into bin 0
    ]
    df = spark.createDataFrame(rows, "v double, arm string")
    out = {r.bin: r for r in psi_drift(
        df, "v", "arm", "a", "b", lo=0.0, hi=60.0, nbins=6
    ).collect()}
    assert len(out) == 6  # complete spine despite empty bins
    assert out[0].n_expected == 2  # clamped low outlier included
    assert out[5].n_actual == 1  # clamped high outlier included
    assert all(r.psi_bin is not None for r in out.values())


def test_psi_validation(spark):
    from kevinlang_spark.operators.drift import psi_drift

    df = spark.createDataFrame([(1.0, "a")], "v double, arm string")
    with pytest.raises(ValueError, match="nbins"):
        psi_drift(df, "v", "arm", "a", "b", lo=0.0, hi=1.0, nbins=1)
    with pytest.raises(ValueError, match="hi > lo"):
        psi_drift(df, "v", "arm", "a", "b", lo=1.0, hi=1.0)


# --------------------------------------------------------------------- #
# group_ols
# --------------------------------------------------------------------- #


def test_group_ols_exact_line(spark):
    from kevinlang_spark.operators.stats import group_ols

    rows = [("g1", float(x), 2.0 * x + 1.0) for x in range(10)] + [
        ("g2", float(x), -3.0 * x + 7.0) for x in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.k: r for r in group_ols(df, "k", "x", "y").collect()}
    assert got["g1"].slope == pytest.approx(2.0, abs=1e-6)
    assert got["g1"].intercept == pytest.approx(1.0, abs=1e-6)
    assert got["g1"].r2 == pytest.approx(1.0, abs=1e-6)
    assert got["g2"].slope == pytest.approx(-3.0, abs=1e-6)
    assert got["g2"].n == 10


def test_group_ols_noise_and_nulls(spark):
    from kevinlang_spark.operators.stats import group_ols

    rows = [("g", float(x), 5.0 * x + ((x * 7) % 3 - 1.0)) for x in range(50)]
    rows += [("g", None, 1.0), ("g", 1.0, None)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    (r,) = group_ols(df, "k", "x", "y").collect()
    assert r.n == 50  # null x/y rows excluded
    assert r.slope == pytest.approx(5.0, abs=0.05)
    assert 0.99 < r.r2 <= 1.0


def test_group_ols_single_exchange_plan(spark):
    from kevinlang_spark.operators.stats import group_ols
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.createDataFrame(
        [("g", 1.0, 2.0), ("g", 2.0, 4.0)], "k string, x double, y double"
    )
    plan = executed_plan(group_ols(df, "k", "x", "y"))
    # sufficient-statistic folds: ONE shuffle, no join, no window
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Window" not in plan


# --------------------------------------------------------------------- #
# k_anonymity
# --------------------------------------------------------------------- #


def test_k_anonymity_counts(spark):
    from kevinlang_spark.operators.quality import k_anonymity

    rows = (
        [("us", "m")] * 10  # safe group
        + [("us", "f")] * 3  # risky
        + [("fr", "m")] * 1  # risky (unique row!)
    )
    df = spark.createDataFrame(rows, "country string, seg string")
    (r,) = k_anonymity(df, ["country", "seg"], k=5).collect()
    assert (r.k, r.k_anonymity) == (5, 1)
    assert (r.n_groups, r.n_risky_groups) == (3, 2)
    assert (r.n_rows, r.n_risky_rows) == (14, 4)
    assert r.risk_rate == pytest.approx(4 / 14, abs=1e-6)


def test_k_anonymity_fully_anonymous(spark):
    from kevinlang_spark.operators.quality import k_anonymity

    df = spark.createDataFrame([("us",)] * 20, "country string")
    (r,) = k_anonymity(df, ["country"], k=5).collect()
    assert r.k_anonymity == 20 and r.n_risky_groups == 0
    assert r.risk_rate == 0.0
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity(df, ["country"], k=0)
