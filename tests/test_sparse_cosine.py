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


# --------------------------------------------------------------------- #
# feature hashing (hashing trick)
# --------------------------------------------------------------------- #


def test_feature_hash_deterministic_and_bounded(spark):
    from kevinlang_spark.operators.text import feature_hash

    df = _docs(spark, [(1, "alpha beta alpha"), (2, "alpha beta alpha")])
    a = sorted(tuple(r) for r in feature_hash(df, dim=64).collect())
    b = sorted(tuple(r) for r in feature_hash(df, dim=64).collect())
    assert a == b  # fully deterministic
    assert all(0 <= idx < 64 for _, idx, _ in a)
    # identical docs -> identical sparse vectors
    va = [(i, v) for d, i, v in a if d == 1]
    vb = [(i, v) for d, i, v in a if d == 2]
    assert va == vb and len(va) >= 1
    # repeated token accumulates: alpha contributes ±2, beta ±1
    assert sorted(abs(v) for _, v in va) == [1, 2]


def test_feature_hash_sign_cancellation_possible(spark):
    from kevinlang_spark.operators.text import feature_hash

    # dim=2 forces heavy collisions; just assert the zero-filter contract:
    # no emitted val is 0 and empty docs vanish
    df = _docs(spark, [(1, "a b c d e f g h i j"), (2, "!!!")])
    rows = feature_hash(df, dim=2).collect()
    assert all(r.val != 0 for r in rows)
    assert {r.id for r in rows} <= {1}


def test_feature_hash_param_guard(spark):
    import pytest as _pytest

    from kevinlang_spark.operators.text import feature_hash

    with _pytest.raises(ValueError):
        feature_hash(_docs(spark, [(1, "x")]), dim=1)


# --------------------------------------------------------------------- #
# trigram substring search
# --------------------------------------------------------------------- #


def test_trigram_search_matches_brute_scan(spark):
    from kevinlang_spark.operators.text import trigram_search

    rows = [
        (1, "the QUICK brown fox"),
        (2, "quick silver"),
        (3, "slow brown dog"),
        (4, "qu ick split apart"),  # has the grams' letters but not the substring
        (5, None),
    ]
    df = _docs(spark, rows)
    got = {r.doc_id for r in trigram_search(df, "quick").collect()}
    assert got == {1, 2}  # case-folded true matches only; 4 fails verify


def test_trigram_search_short_pattern_falls_back(spark):
    from kevinlang_spark.operators.text import trigram_search

    df = _docs(spark, [(1, "ab cd"), (2, "xyz")])
    got = {r.doc_id for r in trigram_search(df, "ab").collect()}
    assert got == {1}
