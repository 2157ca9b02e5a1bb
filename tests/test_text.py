"""Text-analysis extension operators over the documents table."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.functions.textexpr import tokenize, word_shingles
from kevinlang_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    with_text_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_tokenize(spark):
    df = spark.createDataFrame([("Hello, World! 42 foo-bar",)], ["t"])
    out = df.select(tokenize(F.col("t")).alias("toks")).first()["toks"]
    assert out == ["hello", "world", "42", "foo", "bar"]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], ["t"])
    rows = df.select(word_shingles(F.col("t"), 3).alias("sh")).collect()
    assert rows[0]["sh"] == ["a b c", "b c d"]
    assert rows[1]["sh"] == ["a b"]  # shorter than n → whole text
    assert rows[2]["sh"] == []


def test_fingerprint_matches_python_md5(spark):
    df = spark.createDataFrame([("Hello, World!",)], ["t"])
    got = df.select(fingerprint(F.col("t")).alias("fp")).first()["fp"]
    assert got == hashlib.md5(b"helloworld").hexdigest()


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here with us",),
            ("der hund und die katze ist hier",),
            ("el perro es grande y los gatos para mi",),
            ("le chien et les chats est avec pour moi",),
            ("这是一个中文句子",),
            ("xyzzy qwerty",),
        ],
        ["t"],
    )
    out = [r["l"] for r in df.select(lang_id(F.col("t")).alias("l")).collect()]
    assert out == ["en", "de", "es", "fr", "zh", "und"]


def test_lang_id_on_documents(docs):
    """The synthetic corpus uses an English-ish vocabulary for every `lang`
    label (labels are random metadata, not content) — so lang_id should
    classify the content as en/und, never crash, and be deterministic."""
    out = docs.select(lang_id(F.col("text")).alias("pred")).groupBy("pred").count()
    preds = {r["pred"]: r["count"] for r in out.collect()}
    assert set(preds) <= {"en", "de", "es", "fr", "zh", "und"}
    assert preds.get("en", 0) > 0.5 * sum(preds.values())


def test_quality_score_range(docs):
    stats = docs.select(quality_score(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).first()
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_with_text_stats_schema_and_no_shuffle(docs):
    out = with_text_stats(docs)
    for c in ("lang_pred", "n_tokens", "quality", "fp", "stopword_ratio"):
        assert c in out.columns
    # narrow plan: no exchange in the optimized plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert out.count() == docs.count()


def test_bigram_lm_score_ranks_gibberish_low(spark):
    from kevinlang_spark.operators.text import bigram_lm_score

    # corpus dominated by a repeated fluent pattern + one word-salad doc
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((99, "mat the on sat zq cat"))
    rows.append((100, "one"))  # single token: no bigrams, absent
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in bigram_lm_score(df).collect()}
    assert 100 not in out
    assert out[0].n_bigrams == 5
    # fluent doc scores strictly higher than the shuffled one
    assert out[0].avg_logp > out[99].avg_logp


def test_bigram_lm_score_smoothing_exact(spark):
    import math

    from kevinlang_spark.operators.text import bigram_lm_score

    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    out = bigram_lm_score(df).collect()[0]
    # occurrences: (a,b)x2, (b,a)x1; C(a)=2, C(b)=1; V=2
    want = (
        2 * math.log((2 + 1) / (2 + 2)) + math.log((1 + 1) / (1 + 2))
    ) / 3
    assert out.n_bigrams == 3
    assert abs(out.avg_logp - round(want, 6)) < 1e-9


def test_dsir_weights_favor_target_like_docs(spark):
    from kevinlang_spark.operators.text import dsir_weights

    rows = [
        (1, "alpha beta alpha beta", "en"),
        (2, "alpha beta gamma", "en"),
        (3, "delta epsilon zeta", "de"),
        (4, "alpha beta something", "de"),  # target-like bigrams, raw label
        (5, "x", "de"),  # <2 tokens: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {
        r.doc_id: r.weight
        for r in dsir_weights(df, F.col("lang") == "en", buckets=64).collect()
    }
    assert out[1] > out[3] and out[4] > out[3]
    assert 5 not in out
    with pytest.raises(ValueError):
        dsir_weights(df, F.col("lang") == "en", buckets=1)
