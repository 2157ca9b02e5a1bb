"""Round-11 operators: token-space SFT loss masks (chat_token_spans)
and the driver-side BPE word replay it constant-folds headers with."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators.text import (
    bpe_encode_word_py,
    bpe_encode_words,
    bpe_train,
    chat_token_spans,
)


def test_bpe_word_replay_matches_spark_fold(spark):
    """bpe_encode_word_py must be bit-identical to the Spark
    _apply_merge fold — headers are constant-folded through the Python
    replay while contents go through the Spark fold, so any drift
    between the two silently shifts every span."""
    merges = [(1, "l", "l", 9), (2, "ll", "o", 5), (3, "h", "e", 4),
              (4, "a", "n", 3)]
    words = ["hello", "llll", "lllll", "assistant", "im", "start", "end",
             "banana", "x", "anana"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["subtokens"].split(" ")
        for r in bpe_encode_words(df, merges).collect()
    }
    for w in words:
        assert got[w] == bpe_encode_word_py(w, merges), w
    # the fold re-reads its own output: 'l l l' under (l,l) -> 'll l'
    assert bpe_encode_word_py("lll", [(1, "l", "l", 9)]) == ["ll", "l"]


def test_chat_token_spans_closed_form_no_merges(spark):
    """With an empty merge table every word tokenizes to single chars,
    so spans are hand-computable: header <|im_start|>{role}\\n counts
    im(2)+start(5)+len(role chars); footer im(2)+end(3)=5."""
    rows = [
        # (id, sys, user, assistant)
        (1, "Hi there", "a bb ccc", "ok"),
        (2, "Hi there", None, "yes"),
        (3, "Hi there", "a bb ccc", None),
        (4, "Hi there", "a bb ccc", "!!!"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, sys string, u string, a string"
    )
    out = {
        r["doc_id"]: r
        for r in chat_token_spans(
            df,
            [("system", "sys"), ("user", "u"), ("assistant", "a")],
            merges=[],
        ).collect()
    }
    # headers: system 2+5+6=13, user 2+5+4=11, assistant 2+5+9=16; footer 5
    # sys content "Hi there" = 2+5 = 7 tokens -> sys piece 13+7+5 = 25
    # user content "a bb ccc" = 6 tokens -> user piece 11+6+5 = 22
    r1 = out[1]
    assert (r1["token_start"], r1["token_end"], r1["n_tokens"]) == (
        25 + 22 + 16 + 1, 25 + 22 + 16 + 2, 2)
    assert (r1["turn_idx"], r1["role"]) == (2, "assistant")
    # doc 2: user turn skipped entirely -> offsets shift back by 22
    r2 = out[2]
    assert (r2["token_start"], r2["token_end"], r2["n_tokens"]) == (
        25 + 16 + 1, 25 + 16 + 3, 3)
    # doc 3: NULL assistant -> no span row
    assert 3 not in out
    # doc 4: '!!!' has zero alnum tokens -> empty interval, honest
    r4 = out[4]
    assert r4["n_tokens"] == 0 and r4["token_end"] == r4["token_start"] - 1
    assert r4["token_start"] == 25 + 22 + 16 + 1


def test_chat_token_spans_trained_merges_consistency(spark):
    """With a TRAINED merge table the span width must equal the sum of
    per-word subtoken counts of the assistant content — replayed here
    word-by-word through the Python fold."""
    import re

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat and the cat ate") for i in range(20)],
        "doc_id bigint, text string",
    )
    merges = bpe_train(corpus, n_merges=4)
    assert merges  # corpus has adjacent pairs
    rows = [(1, "sys prompt", "the cat question", "the cat sat answer")]
    df = spark.createDataFrame(
        rows, "doc_id bigint, s string, u string, a string"
    )
    out = chat_token_spans(
        df, [("system", "s"), ("user", "u"), ("assistant", "a")], merges
    ).collect()
    assert len(out) == 1
    r = out[0]
    words = [w for w in re.split("[^a-z0-9]+", rows[0][3].lower()) if w]
    want = sum(len(bpe_encode_word_py(w, merges)) for w in words)
    assert r["n_tokens"] == want
    assert r["token_end"] - r["token_start"] + 1 == want


def test_chat_token_spans_multiple_train_roles(spark):
    """Two trainable turns emit two rows with disjoint, ordered
    intervals."""
    df = spark.createDataFrame(
        [(1, "q one", "a one", "q two", "a two")],
        "doc_id bigint, u1 string, a1 string, u2 string, a2 string",
    )
    out = chat_token_spans(
        df,
        [("user", "u1"), ("assistant", "a1"),
         ("user", "u2"), ("assistant", "a2")],
        merges=[],
    ).orderBy("turn_idx").collect()
    assert [r["turn_idx"] for r in out] == [1, 3]
    assert out[0]["token_end"] < out[1]["token_start"]


def test_chat_token_spans_errors(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, a string")
    with pytest.raises(ValueError, match="at least one turn"):
        chat_token_spans(df, [], merges=[])
    with pytest.raises(ValueError, match="train_roles"):
        chat_token_spans(df, [("user", "a")], merges=[])


def test_chat_token_spans_plan_no_python(spark):
    """The span plan must stay JVM-side: no BatchEvalPython, no
    cartesian product — token counting is a word-keyed join, not a
    per-occurrence fold."""
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("some user words here").alias("u"),
        F.lit("an answer").alias("a"),
    )
    plan = executed_plan(
        chat_token_spans(
            df, [("user", "u"), ("assistant", "a")], merges=[(1, "a", "n", 2)]
        )
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
