"""Trigram stupid-backoff LM perplexity (operators/text.py
lm_perplexity — Brants et al. 2007 §4): every backoff branch hits a
hand-computed closed form, short/NULL docs drop, and the guards fire."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from kevinlang_spark.operators.text import lm_perplexity

ALPHA = 0.4


def _fixture(spark):
    # train doc 0: tokens [a b c a b c] →
    #   uni a:2 b:2 c:2 (N=6, V=3); big (a,b):2 (b,c):2 (c,a):1;
    #   tri (a,b,c):2 (b,c,a):1 (c,a,b):1
    # held-out docs exercise: seen trigram, seen-bigram backoff,
    # unseen-word floor, seen-unigram floor
    return spark.createDataFrame(
        [
            (0, "a b c a b c"),
            (1, "a b c x"),
            (2, "b c a z a b"),
            (3, "too short"),  # 2 tokens → no trigram → no row
            (4, None),  # NULL text → no row
        ],
        "doc_id bigint, text string",
    )


def _expected():
    n_plus_v = 6 + 3
    # doc 1: (a,b,c) seen → 2/2; (b,c,x) → x unseen → α²·(0+1)/(N+V)
    lp1 = [math.log(2 * 1.0 / 2), math.log(ALPHA * ALPHA * 1.0 / n_plus_v)]
    # doc 2: (b,c,a) seen → 1/2; (c,a,z) → z unseen floor;
    #        (a,z,a) → bigram (z,a) unseen → a seen floor α²·(2+1)/(N+V);
    #        (z,a,b) → bigram (a,b)=2 over c(a)=2 → α·2/2
    lp2 = [
        math.log(1 * 1.0 / 2),
        math.log(ALPHA * ALPHA * 1.0 / n_plus_v),
        math.log(ALPHA * ALPHA * 3.0 / n_plus_v),
        math.log(ALPHA * 2 / 2),
    ]
    # doc 0 (train): every trigram seen → c3/c2ctx
    lp0 = [
        math.log(2 * 1.0 / 2),  # (a,b,c)
        math.log(1 * 1.0 / 2),  # (b,c,a)
        math.log(1 * 1.0 / 1),  # (c,a,b)
        math.log(2 * 1.0 / 2),  # (a,b,c)
    ]
    out = {}
    for doc, lps in ((0, lp0), (1, lp1), (2, lp2)):
        avg6 = round(sum(lps) / len(lps), 6)
        out[doc] = (len(lps), avg6, round(math.exp(-avg6), 6))
    return out


def test_backoff_branches_closed_form(spark):
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logp"], r["perplexity"])
        for r in lm_perplexity(
            _fixture(spark), train_filter=F.col("doc_id") == 0
        ).collect()
    }
    exp = _expected()
    assert set(got) == set(exp)  # short/NULL docs contribute no rows
    for doc, (n, avg, ppl) in exp.items():
        assert got[doc][0] == n
        assert got[doc][1] == pytest.approx(avg, abs=1e-9)
        assert got[doc][2] == pytest.approx(ppl, abs=1e-6)


def test_no_split_never_backs_off(spark):
    # training on the full input means every scored trigram is its own
    # evidence → scores = c3/c2ctx ≤ 1 → avg_logp ≤ 0 → perplexity ≥ 1,
    # and a doc of one repeated trigram scores perplexity exactly 1
    df = spark.createDataFrame(
        [(0, "x y z x y z x y z")], "doc_id bigint, text string"
    )
    row = lm_perplexity(df).collect()[0]
    # trigram (x,y,z) c3=3 / big (x,y) c2=3 → 1.0 … every position ≤ 1
    assert row["perplexity"] >= 1.0
    assert row["avg_logp"] <= 0.0


def test_gibberish_scores_worse(spark):
    # the filter's purpose: natural repetition scores lower perplexity
    # than held-out token salad under the same trained counts
    rows = [(i, "the cat sat on the mat and the cat sat") for i in range(0, 10, 2)]
    rows += [(1, "the cat sat on the mat and the cat sat"), (3, "mat the on sat cat and on mat cat the")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["perplexity"]
        for r in lm_perplexity(
            df, train_filter=F.col("doc_id") % 2 == 0
        ).collect()
    }
    assert got[1] < got[3]


def test_guards(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="alpha"):
        lm_perplexity(df, alpha=0.0)
    with pytest.raises(ValueError, match="no tokens"):
        lm_perplexity(df, train_filter=F.lit(False)).collect()
