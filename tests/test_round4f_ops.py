"""Round-4f operators: BPE merge-pair counting, n-gram diversity,
temperature-scaled mixture weights, tumbling-window event dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# bpe_merge_pairs
# --------------------------------------------------------------------- #


def test_bpe_pairs_counts_known_corpus(spark):
    from kevinlang_spark.operators.text import bpe_merge_pairs

    # "abab" -> ab, ba, ab ; "ab" -> ab ; "x" -> nothing (len 1)
    df = spark.createDataFrame(
        [(1, "abab ab"), (2, "x")], "doc_id bigint, text string"
    )
    got = {r.pair: r.n for r in bpe_merge_pairs(df).collect()}
    assert got == {"ab": 3, "ba": 1}


def test_bpe_pairs_case_and_punct_fold_into_tokenizer(spark):
    from kevinlang_spark.operators.text import bpe_merge_pairs

    # "Ab-ab" tokenizes to [ab, ab]: punctuation splits words, so no
    # pair spans the hyphen; case folds
    df = spark.createDataFrame([(1, "Ab-ab")], "doc_id bigint, text string")
    got = {r.pair: r.n for r in bpe_merge_pairs(df).collect()}
    assert got == {"ab": 2}


def test_bpe_pairs_top_k_ordering(spark):
    from kevinlang_spark.operators.text import bpe_merge_pairs

    df = spark.createDataFrame(
        [(1, "aaa bb aaa")], "doc_id bigint, text string"
    )
    rows = bpe_merge_pairs(df, top_k=1).collect()
    # aa appears 2x per "aaa" (4 total) > bb (1)
    assert [(r.pair, r.n) for r in rows] == [("aa", 4)]


# --------------------------------------------------------------------- #
# ngram_diversity
# --------------------------------------------------------------------- #


def test_ngram_diversity_exact_ratio(spark):
    from kevinlang_spark.operators.text import ngram_diversity

    df = spark.createDataFrame(
        [
            ("s1", "a b a b"),     # grams: ab, ba, ab -> 3 total, 2 distinct
            ("s1", "a b"),         # gram: ab -> total 4, distinct still 2
            ("s2", "only"),        # 1 token -> contributes nothing
            ("s2", "c d"),         # 1 gram
        ],
        "source string, text string",
    )
    got = {r.source: r for r in ngram_diversity(df).collect()}
    assert got["s1"].total_grams == 4
    assert got["s1"].distinct_grams == 2
    assert got["s1"].diversity == 0.5
    assert got["s2"].total_grams == 1
    assert got["s2"].diversity == 1.0


def test_ngram_diversity_short_doc_only_group_absent(spark):
    from kevinlang_spark.operators.text import ngram_diversity

    df = spark.createDataFrame(
        [("s1", "word"), ("s1", "")], "source string, text string"
    )
    assert ngram_diversity(df).count() == 0


# --------------------------------------------------------------------- #
# mixture_weights
# --------------------------------------------------------------------- #


def test_mixture_weights_sqrt_scaling(spark):
    from kevinlang_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [("a",)] * 1 + [("b",)] * 4, "source string"
    )
    got = {r.source: r for r in mixture_weights(df, alpha=0.5).collect()}
    # p = sqrt(n): 1 and 2 -> weights 1/3, 2/3
    assert got["a"].weight == pytest.approx(1 / 3, abs=1e-6)
    assert got["b"].weight == pytest.approx(2 / 3, abs=1e-6)
    # epochs = w * N / n: a oversampled (5/3), b undersampled (5/6)
    assert got["a"].epochs == pytest.approx(5 / 3, abs=1e-6)
    assert got["b"].epochs == pytest.approx(5 / 6, abs=1e-6)
    # weights always normalize
    assert sum(r.weight for r in got.values()) == pytest.approx(1.0, abs=1e-5)


def test_mixture_weights_alpha_one_is_natural(spark):
    from kevinlang_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame([("a",)] * 3 + [("b",)] * 1, "source string")
    got = {r.source: r for r in mixture_weights(df, alpha=1.0).collect()}
    assert got["a"].weight == pytest.approx(0.75, abs=1e-6)
    # natural proportions -> every doc sampled exactly once
    assert got["a"].epochs == pytest.approx(1.0, abs=1e-6)
    assert got["b"].epochs == pytest.approx(1.0, abs=1e-6)


def test_mixture_weights_rejects_negative_alpha(spark):
    from kevinlang_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame([("a",)], "source string")
    with pytest.raises(ValueError, match="alpha"):
        mixture_weights(df, alpha=-1.0)


# --------------------------------------------------------------------- #
# window_dedup
# --------------------------------------------------------------------- #


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts string, event_id bigint"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_window_dedup_keeps_first_per_window(spark):
    from kevinlang_spark.operators.events import window_dedup

    df = _ev(
        spark,
        [
            (1, "click", "2024-01-01 00:00:05", 10),
            (1, "click", "2024-01-01 00:03:00", 11),  # same 10-min window
            (1, "click", "2024-01-01 00:12:00", 12),  # next window
            (2, "click", "2024-01-01 00:01:00", 13),  # other user
        ],
    )
    rows = window_dedup(df, ["user_id", "event_type"], window_s=600).collect()
    got = {(r.user_id, r.win_start): r for r in rows}
    base = int(
        spark.sql("SELECT CAST(TIMESTAMP '2024-01-01 00:00:00' AS LONG)")
        .collect()[0][0]
    )
    first = got[(1, base)]
    assert first.event_id == 10 and first.n_dups == 2
    assert got[(1, base + 600)].event_id == 12
    assert got[(2, base)].event_id == 13 and got[(2, base)].n_dups == 1


def test_window_dedup_tie_breaks_by_id(spark):
    from kevinlang_spark.operators.events import window_dedup

    df = _ev(
        spark,
        [
            (1, "click", "2024-01-01 00:00:05", 99),
            (1, "click", "2024-01-01 00:00:05", 7),  # same ts -> min id wins
        ],
    )
    (r,) = window_dedup(df, ["user_id", "event_type"], window_s=600).collect()
    assert r.event_id == 7 and r.n_dups == 2


def test_window_dedup_no_unpartitioned_window(spark):
    from kevinlang_spark.operators.events import window_dedup

    df = _ev(spark, [(1, "click", "2024-01-01 00:00:05", 1)])
    out = window_dedup(df, ["user_id", "event_type"], window_s=600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # aggregation-based: no sort-window operator at all
    assert "Window" not in plan


# --------------------------------------------------------------------- #
# KevinFrame surface
# --------------------------------------------------------------------- #


def test_frame_methods_round4f(spark):
    from kevinlang_spark import KevinFrame

    docs = KevinFrame.from_df(
        spark.createDataFrame(
            [("s1", "ab cd ab cd", 1)],
            "source string, text string, doc_id bigint",
        )
    )
    assert docs.bpe_merge_pairs().height() > 0
    assert docs.ngram_diversity().height() == 1
    assert docs.mixture_weights().height() == 1
    ev = KevinFrame.from_df(
        spark.createDataFrame(
            [(1, "click", "2024-01-01 00:00:05", 1)],
            "user_id bigint, event_type string, ts string, event_id bigint",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    assert ev.window_dedup(["user_id", "event_type"]).height() == 1


# --------------------------------------------------------------------- #
# plan gates
# --------------------------------------------------------------------- #


def test_bpe_pairs_plan_partial_agg_and_topk(spark, sf_dir):
    from kevinlang_spark.operators.text import bpe_merge_pairs

    out = bpe_merge_pairs(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    out.collect()  # AQE: final plan exists only after execution
    plan = out._jdf.queryExecution().executedPlan().toString()
    # top-k never global-sorts, counts partial-aggregate before the shuffle
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    # only the text column reaches the scan
    assert "ReadSchema" not in plan or "doc_id" not in plan.split("FileScan")[1]


def test_ngram_diversity_plan_single_gram_shuffle(spark, sf_dir):
    from kevinlang_spark.operators.text import ngram_diversity

    out = ngram_diversity(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no Python in the pipeline, no sort window
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan


# --------------------------------------------------------------------- #
# mahalanobis_outliers
# --------------------------------------------------------------------- #


def test_mahalanobis_catches_joint_outlier_zscore_misses(spark):
    """The defining case: a point unremarkable in x and y separately but
    OFF the correlation line has huge Mahalanobis distance."""
    from kevinlang_spark.operators.stats import mahalanobis_outliers

    # y ~= 2x (tight), plus one point inside both marginals but off-line
    rows = [("g", i, float(x), 2.0 * x + (0.1 if i % 2 else -0.1))
            for i, x in enumerate(range(10, 60))]
    rows.append(("g", 999, 15.0, 90.0))  # x, y both in range; pair is wild
    df = spark.createDataFrame(rows, "grp string, id bigint, x double, y double")
    out = mahalanobis_outliers(df, "grp", "x", "y", "id", threshold=13.816)
    ids = [r.id for r in out.collect()]
    assert ids == [999]


def test_mahalanobis_drops_degenerate_groups(spark):
    from kevinlang_spark.operators.stats import mahalanobis_outliers

    df = spark.createDataFrame(
        # constant x -> singular covariance; tiny group -> n < 3
        [("c", 1, 1.0, 5.0), ("c", 2, 1.0, 9.0), ("c", 3, 1.0, 7.0),
         ("t", 4, 1.0, 2.0), ("t", 5, 3.0, 4.0)],
        "grp string, id bigint, x double, y double",
    )
    assert mahalanobis_outliers(df, "grp", "x", "y", "id", threshold=0.1).count() == 0


def test_mahalanobis_matches_closed_form(spark):
    import numpy as np
    from kevinlang_spark.operators.stats import mahalanobis_outliers

    rng = [(float(a), float(b)) for a, b in
           [(1, 2), (2, 1), (3, 5), (4, 3), (5, 9), (6, 4), (9, 1)]]
    df = spark.createDataFrame(
        [("g", i, x, y) for i, (x, y) in enumerate(rng)],
        "grp string, id bigint, x double, y double",
    )
    out = {r.id: r.d2 for r in
           mahalanobis_outliers(df, "grp", "x", "y", "id", threshold=0.0).collect()}
    xs = np.array(rng)
    mu = xs.mean(axis=0)
    cov = np.cov(xs.T, bias=True)
    inv = np.linalg.inv(cov)
    for i, p in enumerate(rng):
        d = p - mu
        assert out[i] == pytest.approx(float(d @ inv @ d), abs=1e-3)


# --------------------------------------------------------------------- #
# schema_diff
# --------------------------------------------------------------------- #


def test_schema_diff_reports_add_remove_typechange(spark):
    from kevinlang_spark.operators.incremental import schema_diff

    a = spark.createDataFrame([], "k bigint, gone string, v int")
    b = spark.createDataFrame([], "k bigint, v bigint, fresh string")
    got = {r.column: r for r in schema_diff(a, b).collect()}
    assert got["gone"].change == "removed" and got["gone"].old_type == "string"
    assert got["fresh"].change == "added" and got["fresh"].new_type == "string"
    assert got["v"].change == "type_changed"
    assert (got["v"].old_type, got["v"].new_type) == ("int", "bigint")
    assert "k" not in got  # unchanged columns emit nothing


def test_schema_diff_identical_schemas_empty(spark):
    from kevinlang_spark.operators.incremental import schema_diff

    a = spark.createDataFrame([], "k bigint, v string")
    assert schema_diff(a, a).count() == 0
