"""Unit semantics for distributed PCA (operators/pca.py)."""

import math

import pytest

from kevinlang_spark.operators.pca import covariance_matrix, pca_top_component


def _vecs(spark, rows, d):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        f"id bigint, embedding array<double>",
    )


def test_covariance_matches_closed_form(spark):
    # 2-dim toy with known population covariance
    rows = [[1.0, 2.0], [3.0, 6.0], [5.0, 10.0]]
    df = _vecs(spark, rows, 2)
    got = {
        (r.i, r.j): r.cov for r in covariance_matrix(df, "embedding", 2).collect()
    }
    # mean = (3, 6); var_x = 8/3... population: ((4+0+4)/3) = 8/3
    assert got[(0, 0)] == pytest.approx(8 / 3)
    assert got[(1, 1)] == pytest.approx(32 / 3)
    assert got[(0, 1)] == got[(1, 0)] == pytest.approx(16 / 3)


def test_covariance_drops_null_and_wrong_length(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [1.0, 2.0, 3.0]), (3, [3.0, 4.0])],
        "id bigint, embedding array<double>",
    )
    got = covariance_matrix(df, "embedding", 2).collect()
    assert len(got) == 4  # 2x2 entries from the two valid rows
    cov = {(r.i, r.j): r.cov for r in got}
    assert cov[(0, 0)] == pytest.approx(1.0)  # var of {1,3}


def test_pca_finds_dominant_axis(spark):
    # variance lives on axis 1; axis 0 is near-constant noise
    rows = [[0.01 * (i % 3), float(i) * 2.0] for i in range(-5, 6)]
    df = _vecs(spark, rows, 2)
    out = {r.dim: r for r in pca_top_component(df, "embedding", dim=2).collect()}
    assert abs(out[1].loading) == pytest.approx(1.0, abs=1e-3)
    assert abs(out[0].loading) < 0.01
    assert out[1].explained_var_ratio > 0.999
    # sign canonicalization: dominant loading is positive
    assert out[1].loading > 0


def test_pca_sign_is_canonical_under_negation(spark):
    # negating every vector must produce the IDENTICAL component
    rows = [[float(i), float(3 * i)] for i in range(-4, 5)]
    a = pca_top_component(_vecs(spark, rows, 2), "embedding", dim=2).collect()
    b = pca_top_component(
        _vecs(spark, [[-x for x in v] for v in rows], 2), "embedding", dim=2
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pca_degenerate_constant_input(spark):
    # zero covariance: loadings stay at the uniform start, ratio 0
    df = _vecs(spark, [[2.0, 2.0]] * 5, 2)
    out = {r.dim: r for r in pca_top_component(df, "embedding", dim=2).collect()}
    assert out[0].loading == pytest.approx(1 / math.sqrt(2), abs=1e-6)
    assert out[0].explained_var_ratio == 0.0


def test_pca_errors(spark):
    df = _vecs(spark, [[1.0, 2.0]], 2)
    with pytest.raises(ValueError):
        pca_top_component(df, "embedding", dim=2, iterations=0)
    with pytest.raises(ValueError):
        pca_top_component(df, "embedding", dim=5)  # no 5-dim rows


def test_two_components_orthogonal_and_ordered(spark):
    from kevinlang_spark.operators.pca import pca_top_components

    # anisotropic 2-D cloud: var along y >> var along x
    rows = [[0.5 * (i % 5), float(i) * 3.0] for i in range(-6, 7)]
    df = _vecs(spark, rows, 2)
    out = pca_top_components(df, "embedding", dim=2, n_components=2).collect()
    pc = {}
    for r in out:
        pc.setdefault(r.component, {})[r.dim] = (r.loading, r.explained_var_ratio)
    v1 = [pc[0][0][0], pc[0][1][0]]
    v2 = [pc[1][0][0], pc[1][1][0]]
    dot = v1[0] * v2[0] + v1[1] * v2[1]
    assert abs(dot) < 1e-3  # orthogonal
    assert pc[0][0][1] > pc[1][0][1]  # variance ratios decreasing
    # in 2-D the two ratios account for (virtually) all variance
    assert pc[0][0][1] + pc[1][0][1] == pytest.approx(1.0, abs=1e-4)


def test_components_first_matches_single_component(spark):
    from kevinlang_spark.operators.pca import (
        pca_top_component,
        pca_top_components,
    )

    rows = [[float(i), float(2 * i + (i % 3))] for i in range(-5, 6)]
    df = _vecs(spark, rows, 2)
    single = {
        r.dim: (r.loading, r.explained_var_ratio)
        for r in pca_top_component(df, "embedding", dim=2).collect()
    }
    multi = {
        r.dim: (r.loading, r.explained_var_ratio)
        for r in pca_top_components(df, "embedding", dim=2, n_components=1).collect()
    }
    assert single == multi


def test_components_param_guard(spark):
    from kevinlang_spark.operators.pca import pca_top_components

    df = _vecs(spark, [[1.0, 2.0]], 2)
    with pytest.raises(ValueError):
        pca_top_components(df, "embedding", dim=2, n_components=0)
    with pytest.raises(ValueError):
        pca_top_components(df, "embedding", dim=2, n_components=3)
