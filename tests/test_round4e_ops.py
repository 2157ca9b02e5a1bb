"""Round-4e operators: CUSUM change-points, seasonal anomalies,
snapshot diff, char entropy."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# cusum_changepoints
# --------------------------------------------------------------------- #


def _cusum_reference(values, mean, drift=0.0):
    """Classic stateful CUSUM recurrence (the model the window identity
    must reproduce)."""
    hi = lo = 0.0
    out = []
    for v in values:
        dev = v - mean - drift
        hi = max(0.0, hi + dev)
        lo = max(0.0, lo - dev)
        out.append((hi, lo))
    return out


def test_cusum_matches_stateful_recurrence(spark):
    from kevinlang_spark.operators.anomaly import cusum_changepoints

    values = [10.0, 11.0, 9.0, 10.0, 30.0, 31.0, 29.0, 30.0]  # level shift
    rows = [(1, float(i), v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "user_id bigint, ts double, value double")
    got = (
        cusum_changepoints(df, ts_col="ts", threshold_sd=1.0)
        .orderBy("ts")
        .collect()
    )
    mean = sum(values) / len(values)
    expect = _cusum_reference(values, mean)
    for r, (hi, lo) in zip(got, expect):
        assert r.cusum_hi == pytest.approx(hi, abs=1e-6)
        assert r.cusum_lo == pytest.approx(lo, abs=1e-6)
    # the level shift must flag (threshold 1 sd)
    assert any(r.is_change for r in got)
    # constant series never flags
    const = spark.createDataFrame(
        [(1, float(i), 5.0) for i in range(10)],
        "user_id bigint, ts double, value double",
    )
    assert not any(
        r.is_change for r in cusum_changepoints(const, ts_col="ts").collect()
    )


def test_cusum_per_key_isolation(spark):
    from kevinlang_spark.operators.anomaly import cusum_changepoints

    # key 1 shifts, key 2 stays flat — flags must not leak across keys
    rows = [(1, float(i), 0.0 if i < 5 else 50.0) for i in range(10)]
    rows += [(2, float(i), 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "user_id bigint, ts double, value double")
    out = cusum_changepoints(df, ts_col="ts", threshold_sd=1.0).collect()
    assert any(r.is_change for r in out if r.user_id == 1)
    assert not any(r.is_change for r in out if r.user_id == 2)


def test_cusum_single_shuffle_plan(spark):
    from kevinlang_spark.operators.anomaly import cusum_changepoints
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.createDataFrame(
        [(1, 1.0, 2.0)], "user_id bigint, ts double, value double"
    )
    plan = executed_plan(cusum_changepoints(df, ts_col="ts"))
    # all windows share the user partitioning: one Exchange, no join
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


# --------------------------------------------------------------------- #
# seasonal_anomalies
# --------------------------------------------------------------------- #


def test_seasonal_anomalies_flags_only_outliers(spark):
    from kevinlang_spark.operators.anomaly import seasonal_anomalies

    # 40 normal observations at hour 3 (mean 10, sd ~1), one wild point
    rows = [
        ("click", f"2024-01-{1 + i % 28:02d} 03:00:00", 10.0 + (i % 3 - 1))
        for i in range(40)
    ]
    rows.append(("click", "2024-01-29 03:00:00", 100.0))
    # a sparse hour: huge deviation but < min_obs → must NOT flag
    rows += [("click", "2024-01-01 05:00:00", 10.0),
             ("click", "2024-01-02 05:00:00", 500.0)]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    out = seasonal_anomalies(df, n_sd=3.0, min_obs=30).collect()
    assert [(r.hour, r.value) for r in out] == [(3, 100.0)]
    assert out[0].baseline_sd > 0


def test_seasonal_anomalies_no_fact_shuffle(spark):
    from kevinlang_spark.operators.anomaly import seasonal_anomalies
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.createDataFrame(
        [("a", "2024-01-01 03:00:00", 1.0)] * 40,
        "event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = executed_plan(seasonal_anomalies(df, min_obs=1))
    # profile joins back broadcast: the fact side never exchanges by key
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------------------------- #
# snapshot_diff
# --------------------------------------------------------------------- #


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, a string, b double")


def test_snapshot_diff_classification(spark):
    from kevinlang_spark.operators.incremental import snapshot_diff

    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, None, 4.0)])
    new = _snap(spark, [(2, "y", 2.0), (3, "z", 9.0), (4, None, 4.0), (5, "w", 5.0)])
    got = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got[1].status == "removed" and got[1].changed_cols is None
    assert got[2].status == "unchanged" and got[2].changed_cols == []
    assert got[3].status == "changed" and got[3].changed_cols == ["b"]
    assert got[4].status == "unchanged"  # NULL <=> NULL counts equal
    assert got[5].status == "added"


def test_snapshot_diff_multi_column_changes_and_summary(spark):
    from kevinlang_spark.operators.incremental import (
        snapshot_diff,
        snapshot_diff_summary,
    )

    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0)])
    new = _snap(spark, [(1, "X", 9.0), (2, "y", 2.0)])
    (r,) = [x for x in snapshot_diff(old, new, ["k"]).collect() if x.k == 1]
    assert sorted(r.changed_cols) == ["a", "b"]
    summary = {
        r.status: r.n for r in snapshot_diff_summary(old, new, ["k"]).collect()
    }
    assert summary == {"changed": 1, "unchanged": 1}
    with pytest.raises(ValueError, match="key_cols"):
        snapshot_diff(old, new, [])


def test_snapshot_diff_compare_subset(spark):
    from kevinlang_spark.operators.incremental import snapshot_diff

    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "x", 999.0)])
    (r,) = snapshot_diff(old, new, ["k"], compare_cols=["a"]).collect()
    assert r.status == "unchanged"  # b ignored when compare set is explicit


# --------------------------------------------------------------------- #
# char_entropy
# --------------------------------------------------------------------- #


def test_char_entropy_known_distributions(spark):
    from kevinlang_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaa"),          # single letter → H = 0
            (2, "abab"),          # two letters even → H = 1
            (3, "abcd"),          # four letters even → H = 2
            (4, "1234 !!"),       # no letters → NULL entropy
            (5, "AbAb"),          # case-folded → H = 1
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert got[1].entropy_bits == pytest.approx(0.0, abs=1e-6)
    assert got[2].entropy_bits == pytest.approx(1.0, abs=1e-6)
    assert got[3].entropy_bits == pytest.approx(2.0, abs=1e-6)
    assert got[4].entropy_bits is None and got[4].n_letters == 0
    assert got[5].entropy_bits == pytest.approx(1.0, abs=1e-6)
    assert got[1].letter_ratio == pytest.approx(1.0, abs=1e-6)
    assert got[4].letter_ratio == pytest.approx(0.0, abs=1e-6)


def test_char_entropy_prose_vs_uniform(spark):
    from kevinlang_spark.operators.text import char_entropy

    prose = "the quick brown fox jumps over the lazy dog and then sleeps " * 5
    uniform = "abcdefghijklmnopqrstuvwxyz" * 12
    df = spark.createDataFrame(
        [(1, prose), (2, uniform)], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    # uniform letters = max entropy; prose sits below it
    assert got[2].entropy_bits == pytest.approx(math.log2(26), abs=1e-6)
    assert 3.5 < got[1].entropy_bits < got[2].entropy_bits


def test_char_entropy_no_shuffle_no_udf(spark):
    from kevinlang_spark.operators.text import char_entropy
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.createDataFrame(
        [(i, "hello world") for i in range(10)], "doc_id bigint, text string"
    ).repartition(16)  # enough partitions that spread() is a no-op
    plan = executed_plan(char_entropy(df))
    # the ONLY Exchange is the input repartition above — the operator
    # itself is a pure narrow projection chain
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
