"""BM25 lexical scoring (text.bm25_scores) — the lexical half of the
hybrid-retrieval stack (q_bm25_search / q_hybrid_retrieval)."""

from __future__ import annotations

import math

import pytest

from kevinlang_spark.operators.text import bm25_scores


def _expected(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [
            (1, "spark join spark filter"),        # dl=4: spark tf=2, join tf=1
            (2, "join scan table"),                # dl=3: join tf=1
            (3, "filter scan value table build"),  # dl=5: no query term
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["id"]: r
        for r in bm25_scores(df, ["spark", "join"]).collect()
    }
    # doc 3 matches nothing and must be absent
    assert set(out) == {1, 2}
    n, avgdl = 3, (4 + 3 + 5) / 3.0
    # df(spark)=1, df(join)=2
    exp1 = _expected(2, 1, n, 4, avgdl) + _expected(1, 2, n, 4, avgdl)
    exp2 = _expected(1, 2, n, 3, avgdl)
    assert out[1]["n_terms"] == 2
    assert out[2]["n_terms"] == 1
    assert out[1]["bm25"] == pytest.approx(round(exp1, 6), abs=1e-6)
    assert out[2]["bm25"] == pytest.approx(round(exp2, 6), abs=1e-6)
    # higher-tf rarer-term doc scores above the single common-term doc
    assert out[1]["bm25"] > out[2]["bm25"]


def test_bm25_null_text_excluded_from_stats_and_output(spark):
    df = spark.createDataFrame(
        [(1, "spark spark"), (2, None)], "doc_id bigint, text string"
    )
    rows = bm25_scores(df, ["spark"]).collect()
    assert [r["id"] for r in rows] == [1]
    # N and avgdl must count ONLY the non-null doc (N=1, avgdl=2) — a
    # size()-on-NULL of -1 leaking into avg would shift the score
    exp = _expected(2, 1, 1, 2, 2.0)
    assert rows[0]["bm25"] == pytest.approx(round(exp, 6), abs=1e-6)


def test_bm25_argument_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="at least one query term"):
        bm25_scores(df, [])
    with pytest.raises(ValueError, match="bad k1/b"):
        bm25_scores(df, ["x"], k1=0.0)
    with pytest.raises(ValueError, match="bad k1/b"):
        bm25_scores(df, ["x"], b=1.5)


def test_bm25_query_cut_is_deterministic(spark, sf_dir):
    """q_bm25_search's top-10 cut ranks on the rounded score with a
    doc_id tie-break — two runs must agree row for row."""
    import __spark_entry__ as entry

    a = entry.queries()["q_bm25_search"](spark, sf_dir).collect()
    b = entry.queries()["q_bm25_search"](spark, sf_dir).collect()
    assert a == b and len(a) == 10
