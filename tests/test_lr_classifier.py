"""Trained logistic-regression quality classifier: design matrix
shape, sparse-standardization algebra, GD trajectory determinism, and
actual learning (accuracy above the majority baseline)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators.text import (
    _lr_effective_weights,
    lr_feature_stats,
    lr_gram_features,
    lr_score,
    lr_train,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "spark spark spark", True),
        (2, "table scan merge", False),
        (3, "spark joins fast", True),
        (4, "row group filter", False),
        (5, "ab", False),  # shorter than the gram width: bias-only doc
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, y boolean")


def test_gram_features_shape(spark, tiny):
    feat = lr_gram_features(tiny, F.col("y"), dim=8, n=3)
    rows = feat.collect()
    bias = [r for r in rows if r["slot"] == 0]
    assert len(bias) == 5 and all(r["x"] == 1.0 for r in bias)
    # per-doc normalized counts sum to 1 over the gram slots
    by_doc: dict[int, float] = {}
    for r in rows:
        if r["slot"] > 0:
            by_doc[r["id"]] = by_doc.get(r["id"], 0.0) + r["x"]
    assert set(by_doc) == {1, 2, 3, 4}  # doc 5 has no grams
    for tot in by_doc.values():
        assert abs(tot - 1.0) < 1e-12
    assert all(1 <= r["slot"] <= 8 for r in rows if r["slot"] > 0)


def test_effective_weights_match_dense_standardization(spark, tiny):
    # logit through the sparse fold == dense z-score logit
    dim = 8
    feat = lr_gram_features(tiny, F.col("y"), dim=dim, n=3)
    mu, sd = lr_feature_stats(feat, 5)
    model = [0.3] + [0.1 * j for j in range(1, dim + 1)]
    v = _lr_effective_weights(model, mu, sd)
    dense: dict[int, dict[int, float]] = {}
    for r in feat.collect():
        dense.setdefault(r["id"], {})[r["slot"]] = r["x"]
    for d, slots in dense.items():
        sparse_logit = sum(x * v[s] for s, x in slots.items())
        dense_logit = model[0] + sum(
            ((slots.get(j, 0.0) - mu.get(j, 0.0)) / sd.get(j, 1.0)) * model[j]
            for j in range(1, dim + 1)
        )
        assert math.isclose(sparse_logit, dense_logit, rel_tol=1e-9), d


def test_train_is_deterministic_and_learns(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    label = F.col("text").contains("spark")
    feat = lr_gram_features(docs, label, dim=64, n=3).localCheckpoint(
        eager=True
    )
    m1, mu, sd = lr_train(feat, n, dim=64, steps=6, lr=2.0, checkpoint=False)
    m2, _, _ = lr_train(feat, n, dim=64, steps=6, lr=2.0, checkpoint=False)
    assert m1 == m2  # bit-identical trajectory
    scored = lr_score(feat, m1, mu, sd)
    agg = scored.select(
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias("acc"),
        F.avg(F.col("label").cast("double")).alias("pos"),
    ).first()
    baseline = max(agg["pos"], 1 - agg["pos"])
    assert agg["acc"] > baseline + 0.05, (agg["acc"], baseline)


def test_bias_only_doc_gets_scored(spark, tiny):
    feat = lr_gram_features(tiny, F.col("y"), dim=8, n=3)
    model, mu, sd = lr_train(feat, 5, dim=8, steps=2, lr=1.0)
    rows = {r["id"]: r for r in lr_score(feat, model, mu, sd).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # gramless doc 5 still scores
    assert rows[5]["prob"] is not None


def test_classifier_eval_metrics(spark, sf_dir):
    import __spark_entry__ as entrymod

    r = entrymod.q_lr_eval(spark, sf_dir).first()
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_docs"]
    assert r["acc"] == (r["tp"] + r["tn"]) / r["n_docs"]
    # the trained model genuinely ranks: AUC well above chance
    assert 0.8 < r["auc"] <= 1.0
    assert 0 < r["prec"] <= 1.0 and 0 < r["rec"] <= 1.0
    assert abs(r["f1"] - 2 * r["prec"] * r["rec"] / (r["prec"] + r["rec"])) < 1e-12


def test_q_lr_train_retrains_every_call(spark, sf_dir, monkeypatch):
    """VERDICT r12 item 1: the TRAIN query must pay its own GD on every
    call — a memo hit on the timed path would make the bench measure a
    dict lookup, not training.  Apply-side queries may reuse the memo
    (build-once/apply-many), but q_lr_train itself never does."""
    import __spark_entry__ as entrymod
    from kevinlang_spark.operators import text as text_mod

    calls = {"n": 0}
    real = text_mod.lr_train

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(text_mod, "lr_train", counting)
    entrymod._LR_MEMO.clear()
    w1 = entrymod.q_lr_train(spark, sf_dir).collect()
    assert calls["n"] == 1
    # memo now populated — a second TRAIN call must still retrain
    w2 = entrymod.q_lr_train(spark, sf_dir).collect()
    assert calls["n"] == 2
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))  # deterministic GD
    # apply side reuses the refreshed memo: no third training run
    entrymod.q_lr_score(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    assert calls["n"] == 2
