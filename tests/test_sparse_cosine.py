"""Unit semantics for sparse TF-IDF cosine pairs (text.py)."""

import pytest

from kevinlang_spark.operators.text import sparse_cosine_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_identical_docs_cosine_one(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "epsilon zeta eta theta"),
    ]
    out = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_cosine_pairs(_docs(spark, rows), threshold=0.5).collect()
    }
    assert out == {(1, 2): 1.0}  # identical pair only; disjoint doc absent


def test_partial_overlap_below_threshold_dropped(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta something else"),
        (3, "totally different words here"),
    ]
    hi = sparse_cosine_pairs(_docs(spark, rows), threshold=0.9).collect()
    lo = sparse_cosine_pairs(_docs(spark, rows), threshold=0.1).collect()
    assert hi == []  # half-overlap cosine < 0.9
    pairs = {(r.id_a, r.id_b) for r in lo}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_max_df_cap_removes_stopword_similarity(spark):
    # docs share ONLY the ubiquitous token: df cap 2 < 3 docs drops it,
    # leaving empty vectors -> no pairs at all
    rows = [
        (1, "the unique1"),
        (2, "the unique2"),
        (3, "the unique3"),
    ]
    out = sparse_cosine_pairs(
        _docs(spark, rows), threshold=0.01, max_df=2
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == set()


def test_threshold_guard(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        sparse_cosine_pairs(df, threshold=0.0)
    with pytest.raises(ValueError):
        sparse_cosine_pairs(df, threshold=1.5)
