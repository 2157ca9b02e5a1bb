"""Repeated-substring span audit (dedup.repeated_span_stats) — the
n-gram-anchored form of Lee et al. 2022 exact-substring dedup."""

from __future__ import annotations

import pytest

from kevinlang_spark.operators.dedup import repeated_span_stats


def test_repeated_spans_shared_block_coverage(spark):
    # docs 1 and 2 share an identical 10-token block → with n=3 every
    # 3-gram of the block is duplicated; doc 3 is unique
    block = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [
            (1, block + " unique1 tokens1 here1"),
            (2, "other2 prefix2 " + block),
            (3, "entirely distinct words nothing shared at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in repeated_span_stats(df, n=3).collect()}
    # doc 1: 13 tokens, dup grams cover exactly the 10-token block
    assert out[1]["n_tokens"] == 13
    assert out[1]["dup_tokens"] == 10
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_frac"] == pytest.approx(round(10 / 13, 6))
    assert out[2]["dup_tokens"] == 10
    # doc 3: nothing repeated
    assert out[3]["dup_tokens"] == 0
    assert out[3]["n_spans"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_repeated_spans_two_separate_spans(spark):
    # two disjoint shared trigrams in doc 1 → two spans with a gap
    df = spark.createDataFrame(
        [
            (1, "a b c gapword1 gapword2 gapword3 gapword4 x y z"),
            (2, "a b c somethingelse"),
            (3, "x y z otherthing"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in repeated_span_stats(df, n=3).collect()}
    assert out[1]["dup_tokens"] == 6
    assert out[1]["n_spans"] == 2


def test_repeated_spans_short_doc_caps_at_token_count(spark):
    # 2-token docs with n=3 emit one whole-doc gram; coverage must cap
    # at the doc's real token count, not the nominal interval length
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in repeated_span_stats(df, n=3).collect()}
    assert out[1]["n_tokens"] == 2
    assert out[1]["dup_tokens"] == 2
    assert out[1]["dup_frac"] == 1.0


def test_repeated_spans_in_doc_repeat_counts(spark):
    # min_count counts OCCURRENCES corpus-wide, so an n-gram repeated
    # within one document is duplicated too
    df = spark.createDataFrame(
        [(1, "p q r filler p q r"), (2, "unrelated other words")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in repeated_span_stats(df, n=3).collect()}
    # both p-q-r occurrences covered ([0,2] and [4,6]); "filler" is not
    assert out[1]["dup_tokens"] == 6
    assert out[1]["n_spans"] == 2


def test_repeated_spans_param_guard(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="min_count"):
        repeated_span_stats(df, n=0)
    with pytest.raises(ValueError, match="min_count"):
        repeated_span_stats(df, min_count=1)
