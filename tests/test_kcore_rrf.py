"""Unit semantics for kcore peeling and reciprocal_rank_fusion."""

import pytest

from pyspark.sql import functions as F

from kevinlang_spark.operators.graph import kcore
from kevinlang_spark.operators.stats import reciprocal_rank_fusion


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a bigint, b bigint")


def test_kcore_extracts_clique_and_peels_tail(spark):
    # K4 clique {1,2,3,4} + pendant chain 4-5-6: 2-core == the clique.
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    out = {r.node: r.degree for r in kcore(_edges(spark, pairs), k=2).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascade_needs_multiple_rounds(spark):
    # Path 1-2-3-4-5: every peel exposes new degree-1 endpoints; the
    # 2-core is empty but only after ~len(path)/2 cascading rounds.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert kcore(_edges(spark, pairs), k=2, rounds=4).count() == 0


def test_kcore_bounded_rounds_stop_early(spark):
    # With rounds=1 the same path keeps its interior: one peel drops
    # nodes 1 and 5 only — fixed rounds are a documented contract.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    alive = {
        r.node for r in kcore(_edges(spark, pairs), k=2, rounds=1).collect()
    }
    assert alive == {2, 3, 4}


def test_kcore_rejects_bad_params(spark):
    df = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        kcore(df, k=0)
    with pytest.raises(ValueError):
        kcore(df, k=2, rounds=0)


def test_rrf_matches_closed_form(spark):
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "id bigint, rank int")
    b = spark.createDataFrame([(11, 1), (10, 2), (13, 3)], "id bigint, rank int")
    out = {
        r.id: (r.n_lists, r.rrf)
        for r in reciprocal_rank_fusion([a, b], "id").collect()
    }
    assert out[10] == (2, round(1 / 61 + 1 / 62, 6))
    assert out[11] == (2, round(1 / 62 + 1 / 61, 6))
    assert out[12] == (1, round(1 / 63, 6))  # missing from b: no penalty term
    assert out[13] == (1, round(1 / 63, 6))


def test_rrf_requires_a_ranking(spark):
    with pytest.raises(ValueError):
        reciprocal_rank_fusion([], "id")
