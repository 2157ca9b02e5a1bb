"""Round-12 second-wave operators: GRPO/RLOO advantages and the
reward-length-bias diagnostic."""

from __future__ import annotations

import math
import statistics

import pytest

from pyspark.sql import functions as F


def _collect(df):
    return [tuple(r) for r in df.collect()]


class TestGrpoAdvantages:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "prompt_id long, cand_id long, reward long"
        )

    def test_zscore_matches_population_stats(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        rows = [(1, 0, 10), (1, 1, 20), (1, 2, 30), (1, 3, 40)]
        out = {
            r["cand_id"]: r
            for r in grpo_advantages(self._df(spark, rows)).collect()
        }
        rewards = [10, 20, 30, 40]
        mu = statistics.mean(rewards)
        sd = statistics.pstdev(rewards)
        for cid, r in zip(range(4), rewards):
            got = out[cid]
            assert got["n_candidates"] == 4
            assert got["mean_reward"] == pytest.approx(mu)
            assert got["std_reward"] == pytest.approx(sd)
            assert got["advantage"] == pytest.approx((r - mu) / sd)

    def test_leave_one_out_baseline(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        rows = [(7, 0, 3), (7, 1, 9)]
        out = {
            r["cand_id"]: r
            for r in grpo_advantages(self._df(spark, rows)).collect()
        }
        # LOO baseline for each is the OTHER sample's reward
        assert out[0]["advantage_loo"] == pytest.approx(3 - 9)
        assert out[1]["advantage_loo"] == pytest.approx(9 - 3)

    def test_constant_rewards_zero_advantage(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        rows = [(1, 0, 5), (1, 1, 5), (1, 2, 5)]
        for r in grpo_advantages(self._df(spark, rows)).collect():
            assert r["std_reward"] == 0.0
            assert r["advantage"] == 0.0
            assert r["advantage_loo"] == pytest.approx(0.0)

    def test_singleton_group(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        rows = [(1, 0, 5)]
        (r,) = grpo_advantages(self._df(spark, rows)).collect()
        assert r["advantage"] == 0.0
        assert r["advantage_loo"] is None

    def test_null_rewards_dropped(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        df = spark.createDataFrame(
            [(1, 0, 10), (1, 1, None), (1, 2, 20)],
            "prompt_id long, cand_id long, reward long",
        )
        out = grpo_advantages(df).collect()
        assert {r["cand_id"] for r in out} == {0, 2}
        assert all(r["n_candidates"] == 2 for r in out)


class TestRewardLengthBias:
    def test_perfect_positive_correlation(self, spark):
        from kevinlang_spark.operators.preference import reward_length_bias

        rows = [("a", "x" * n, 2 * n + 1) for n in (5, 10, 15, 20)]
        df = spark.createDataFrame(
            rows, "source string, response string, reward long"
        )
        (r,) = reward_length_bias(df).collect()
        assert r["n_samples"] == 4
        assert r["pearson_r"] == pytest.approx(1.0)
        assert r["ols_slope"] == pytest.approx(2.0)
        assert r["mean_len"] == pytest.approx(12.5)

    def test_matches_statistics_module(self, spark):
        from kevinlang_spark.operators.preference import reward_length_bias

        lens = [3, 8, 21, 4, 17, 9]
        rewards = [40, 12, 99, 7, 63, 12]
        rows = [("s", "y" * n, rw) for n, rw in zip(lens, rewards)]
        df = spark.createDataFrame(
            rows, "source string, response string, reward long"
        )
        (r,) = reward_length_bias(df).collect()
        want_r = statistics.correlation(lens, rewards)
        want_slope = statistics.linear_regression(lens, rewards).slope
        assert r["pearson_r"] == pytest.approx(want_r)
        assert r["ols_slope"] == pytest.approx(want_slope)

    def test_zero_variance_yields_null(self, spark):
        from kevinlang_spark.operators.preference import reward_length_bias

        rows = [("a", "xxx", 1), ("a", "yyy", 9)]
        df = spark.createDataFrame(
            rows, "source string, response string, reward long"
        )
        (r,) = reward_length_bias(df).collect()
        assert r["pearson_r"] is None
        assert r["ols_slope"] is None
        # reward variance zero, length varying: same guard other side
        rows2 = [("a", "x", 5), ("a", "yy", 5)]
        df2 = spark.createDataFrame(
            rows2, "source string, response string, reward long"
        )
        (r2,) = reward_length_bias(df2).collect()
        assert r2["pearson_r"] is None
        assert r2["ols_slope"] == pytest.approx(0.0)
