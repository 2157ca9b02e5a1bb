"""Unit semantics for winnow_fingerprints and token_pmi."""

import hashlib
import math

import pytest

from kevinlang_spark.operators.text import token_pmi, winnow_fingerprints


def _gram_hash(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:13], 16)


def _winnow_ref(text: str, k: int, w: int) -> tuple[int, list[int]]:
    norm = "".join(c for c in text.lower() if c.isalnum())
    m = len(norm) - k + 1
    hs = [_gram_hash(norm[i : i + k]) for i in range(m)]
    mins = [min(hs[j : j + w]) for j in range(max(m - w + 1, 1))]
    return m, sorted(set(mins))


def test_winnow_matches_reference_impl(spark):
    texts = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "aaaaaaaaaaaa"),  # degenerate: all grams identical -> 1 fp
        (3, "abcdefg"),       # fewer grams than window -> min of all
        (4, "Hello, WORLD! 123"),
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {
        r.id: (r.n_grams, list(r.fps))
        for r in winnow_fingerprints(df, k=5, window=4).collect()
    }
    for i, t in texts:
        m, fps = _winnow_ref(t, 5, 4)
        assert got[i] == (m, fps), i
    assert got[2][1] == [_gram_hash("aaaaa")]  # single repeated gram


def test_winnow_drops_too_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, "..!?"), (3, "abcdefghij")], "doc_id bigint, text string"
    )
    ids = [r.id for r in winnow_fingerprints(df, k=5, window=4).collect()]
    assert ids == [3]


def test_winnow_guarantee_shared_substring_shares_fp(spark):
    # winnowing guarantee: a shared substring of length >= k + w - 1
    # (here 8) yields at least one common fingerprint
    common = "sharedsubstringpayload"
    df = spark.createDataFrame(
        [(1, "xxxx " + common + " yyyy"), (2, "zz " + common + " qq")],
        "doc_id bigint, text string",
    )
    rows = {r.id: set(r.fps) for r in winnow_fingerprints(df, k=5, window=4).collect()}
    assert rows[1] & rows[2]


def test_winnow_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, window=0)


def test_token_pmi_exact_small_corpus(spark):
    # 6 docs; "alpha beta" together in 3, alpha in 4, beta in 5
    docs = [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "alpha beta gamma"),
        (4, "alpha gamma"),
        (5, "beta gamma"),
        (6, "beta"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {
        (r.tok_a, r.tok_b): (r.n_ab, r.pmi)
        for r in token_pmi(df, vocab_size=10, min_pair_docs=1).collect()
    }
    n_ab, pmi = out[("alpha", "beta")]
    assert n_ab == 3
    assert pmi == round(math.log(3 * 6 / (4 * 5)), 4)
    # pair ordering is canonical: tok_a < tok_b, no reversed duplicates
    assert ("beta", "alpha") not in out
    # min_pair_docs filters
    filtered = {
        (r.tok_a, r.tok_b)
        for r in token_pmi(df, vocab_size=10, min_pair_docs=3).collect()
    }
    assert filtered == {("alpha", "beta"), ("alpha", "gamma"), ("beta", "gamma")}


def test_token_pmi_vocab_cap_is_deterministic(spark):
    # 3 tokens tie on df; vocab_size=2 must keep the lexicographically
    # first two (aa, bb) — tie broken on token asc
    docs = [(i, "aa bb cc") for i in range(1, 5)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {
        (r.tok_a, r.tok_b) for r in token_pmi(df, vocab_size=2, min_pair_docs=1).collect()
    }
    assert out == {("aa", "bb")}
