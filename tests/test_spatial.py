"""Unit semantics for the grid-blocked radius join (spatial.py)."""

import math

import pytest

from kevinlang_spark.operators.spatial import haversine_km, radius_join_pairs


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id bigint, lat double, lon double")


def _hav(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2
    return 2 * 6371.0088 * math.asin(math.sqrt(a))


def test_matches_brute_force(spark):
    # 40 deterministic points in a 2x2-degree box at mid latitude
    rows = [
        (i, 45.0 + (i * 7 % 20) / 10.0, 9.0 + (i * 13 % 20) / 10.0)
        for i in range(40)
    ]
    got = {
        (r.id_a, r.id_b): r.dist_km
        for r in radius_join_pairs(
            _pts(spark, rows), "id", "lat", "lon", radius_km=30.0
        ).collect()
    }
    want = {}
    for i in range(40):
        for j in range(i + 1, 40):
            d = _hav(rows[i][1], rows[i][2], rows[j][1], rows[j][2])
            if d <= 30.0:
                want[(i, j)] = round(d, 3)
    assert got == want  # blocking is COMPLETE, not just plausible


def test_cross_cell_pairs_found(spark):
    # two points ~49km apart straddling a cell boundary at radius 50
    rows = [(1, 0.0, 0.0), (2, 0.44, 0.0), (3, 20.0, 20.0)]
    got = {(r.id_a, r.id_b) for r in radius_join_pairs(
        _pts(spark, rows), "id", "lat", "lon", radius_km=50.0
    ).collect()}
    assert got == {(1, 2)}


def test_hot_cell_cap_drops_dense_cells(spark):
    rows = [(i, 10.0001 * 0 + 10.0, 10.0) for i in range(30)]  # 30 identical pts
    out = radius_join_pairs(
        _pts(spark, rows), "id", "lat", "lon", radius_km=10.0, cell_cap=10
    )
    assert out.count() == 0  # the hot cell is quarantined, no n^2 blowup


def test_param_guards(spark):
    df = _pts(spark, [(1, 0.0, 0.0)])
    with pytest.raises(ValueError):
        radius_join_pairs(df, "id", "lat", "lon", radius_km=0)
    with pytest.raises(ValueError):
        radius_join_pairs(df, "id", "lat", "lon", lat_band_deg=95)


def test_antimeridian_pairs_found(spark):
    # pairs straddling lon ±180 must be found: the lon cells wrap mod n,
    # so cell n-1 and cell 0 are adjacent (no seam at the antimeridian)
    rows = [
        (1, 10.0, 179.8),
        (2, 10.0, -179.9),  # ~33 km from id 1 across the antimeridian
        (3, 10.0, 170.0),   # far from both
        (4, -45.0, -180.0),
        (5, -45.0, 179.7),  # ~24 km from id 4 across the seam
    ]
    got = {(r.id_a, r.id_b) for r in radius_join_pairs(
        _pts(spark, rows), "id", "lat", "lon", radius_km=50.0
    ).collect()}
    assert got == {(1, 2), (4, 5)}
    # distances are the true great-circle values (haversine is periodic
    # in dlon, so no special-casing needed on the verify side)
    d = {
        (r.id_a, r.id_b): r.dist_km
        for r in radius_join_pairs(
            _pts(spark, rows), "id", "lat", "lon", radius_km=50.0
        ).collect()
    }
    assert abs(d[(1, 2)] - round(_hav(10.0, 179.8, 10.0, -179.9 + 360), 3)) < 1e-9


def test_matches_brute_force_global(spark):
    """Completeness on points spread across the full lon range (both
    seams: ±180 and the 0/360 wrap of the internal normalization),
    several latitude bands, radius large enough to span cells."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(120):
        lat = rng.uniform(-60.0, 60.0)
        # half the points hug the antimeridian, half spread everywhere
        lon = (
            rng.choice([179.0, -179.0]) + rng.uniform(-1.0, 1.0)
            if i % 2
            else rng.uniform(-180.0, 180.0)
        )
        rows.append((i, round(lat, 4), round(lon, 4)))
    got = {
        (r.id_a, r.id_b)
        for r in radius_join_pairs(
            _pts(spark, rows), "id", "lat", "lon", radius_km=200.0
        ).collect()
    }
    want = set()
    for i in range(120):
        for j in range(i + 1, 120):
            if _hav(rows[i][1], rows[i][2], rows[j][1], rows[j][2]) <= 200.0:
                want.add((i, j))
    assert got == want
