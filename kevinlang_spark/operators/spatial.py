"""Spatial operators: radius joins via grid-cell blocking.

The scale shape every distributed spatial join uses (GeoSpark/Sedona,
BigQuery GIS): quantize points to grid cells sized >= the search
radius, duplicate the PROBE side into the 3x3 neighborhood of its
cell, hash-join on the cell key, then verify exact haversine distance.
Every candidate pair falls in the build point's own-or-adjacent cell,
so the join is complete by construction, and each join group is
bounded by the density cap — never an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine) as a pure Catalyst
    expression — codegen, no UDF; identical formula is expressible in
    any SQL engine for cross-checks."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def radius_join_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float = 50.0,
    cell_cap: int = 10_000,
    lat_band_deg: float = 66.0,
) -> DataFrame:
    """All point pairs within ``radius_km`` (great-circle), id_a < id_b,
    complete for points with \\|lat\\| ≤ ``lat_band_deg``.

    Blocking: latitude cells of radius/111.045°; longitude cells
    widened by 1/cos(lat_band) so a lon cell spans ≥ one radius in km
    anywhere inside the band — that is what makes the 3×3 neighborhood
    COMPLETE (a pair within the radius can differ by at most one cell
    per axis).  Longitude cells are laid out as exactly
    ``n = floor(360/width)`` EQUAL cells around the circle (each ≥ the
    required width) and the probe's ±1 shifts wrap modulo n, so pairs
    straddling the ±180° antimeridian land in adjacent (mod-n) cells —
    no seam, no missed pairs.  The build side keeps its own cell; the
    probe side is duplicated into the 3×3 neighborhood, so the join key
    is exact cell equality — a plain hash join, never a range/theta
    join.
    ``cell_cap`` guards degenerate density (all points in one city
    block): cells above the cap are dropped — the standard hot-cell
    guard; production re-blocks those at finer granularity.

    Returns (id_a, id_b, dist_km rounded 3dp).
    """
    import math as _math

    if radius_km <= 0:
        raise ValueError(f"radius_km must be > 0 (got {radius_km})")
    if not 0 < lat_band_deg < 90:
        raise ValueError(f"lat_band_deg must be in (0, 90), got {lat_band_deg}")
    cell_deg = radius_km / 111.045
    cell_deg_lon = cell_deg / _math.cos(_math.radians(lat_band_deg))
    # n equal lon cells around the full circle, each >= cell_deg_lon —
    # equal widths keep the mod-n ±1 neighborhood complete (a trailing
    # narrower remainder cell would let within-radius pairs sit 2 cells
    # apart across it)
    n_lon_cells = max(1, int(360.0 / cell_deg_lon))
    lon_cell_width = 360.0 / n_lon_cells
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    ).where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    # lon normalized to [0, 360) so every point has one canonical cell;
    # pmod keeps negatives positive
    lon360 = F.pmod(F.col("lon"), F.lit(360.0))
    cx = F.least(
        F.floor(lon360 / lon_cell_width), F.lit(n_lon_cells - 1)
    ).cast("long")
    cy = F.floor(F.col("lat") / cell_deg).cast("long")
    base = pts.select("id", "lat", "lon", cx.alias("cx"), cy.alias("cy"))

    # hot-cell guard: drop cells beyond the density cap
    cells = base.groupBy("cx", "cy").agg(F.count("*").alias("__n"))
    base = base.join(
        cells.where(F.col("__n") <= cell_cap).select("cx", "cy"),
        ["cx", "cy"],
        "left_semi",
    ).localCheckpoint(eager=True)

    probe = base
    shifted = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            shifted.append(
                probe.select(
                    "id",
                    "lat",
                    "lon",
                    # lon shifts wrap mod n so cell n-1 and cell 0 are
                    # adjacent — the antimeridian seam disappears
                    F.pmod(F.col("cx") + dx, F.lit(n_lon_cells)).alias("cx"),
                    (F.col("cy") + dy).alias("cy"),
                )
            )
    neighbors = shifted[0]
    for s in shifted[1:]:
        neighbors = neighbors.unionByName(s)

    a, b = base.alias("a"), neighbors.alias("b")
    dist = haversine_km(
        F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
    )
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .where(dist <= radius_km)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dist, 3).alias("dist_km"),
        )
        .distinct()
    )


#: geohash base32 alphabet (Niemeyer 2008 — 'a', 'i', 'l', 'o' omitted)
GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Standard geohash string of a (lat, lon) point — the textual
    spatial key next to :func:`morton_key`: shared prefixes mean
    shared cells, so a prefix `groupBy` buckets points hierarchically
    and an equality join on a prefix is proximity blocking.

    Closed form, no per-bit bisection loop: a geohash's bit string IS
    the bit-interleaving (lon first) of the quantized cell indices

        qlon = floor((lon + 180)/360 · 2^ceil(5p/2)),
        qlat = floor((lat +  90)/180 · 2^floor(5p/2)),

    so the code builds with shift/or interleaving (morton with the
    axes swapped) and slices 5 bits per character — all BIGINT
    expressions, bit-for-bit reproducible in any engine.  Points on
    the +180°/+90° edge clamp into the last cell.  Boundary
    semantics follow THIS closed form: a coordinate within one ulp of
    a cell edge (e.g. -1e-45) can land one cell away from the
    textbook bisection encoder, because (lon + 180)/360 absorbs the
    sub-epsilon offset — both engines share the closed form, so the
    cross-engine contract is unaffected.

    Returns a length-``precision`` lowercase base32 string."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12] (got {precision})")
    total = 5 * precision
    n_lon = (total + 1) // 2
    n_lat = total // 2
    qlon = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << n_lon))),
        F.lit((1 << n_lon) - 1),
    ).cast("bigint")
    qlat = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << n_lat))),
        F.lit((1 << n_lat) - 1),
    ).cast("bigint")
    one = F.lit(1).cast("bigint")
    code = F.lit(0).cast("bigint")
    # geohash bit k (MSB first) alternates lon, lat: lon bit j sits at
    # code position total-1-2j, lat bit j at total-2-2j (from the top)
    for j in range(n_lon):
        bit = F.shiftrightunsigned(qlon, n_lon - 1 - j).bitwiseAND(one)
        code = code.bitwiseOR(F.shiftleft(bit, total - 1 - 2 * j))
    for j in range(n_lat):
        bit = F.shiftrightunsigned(qlat, n_lat - 1 - j).bitwiseAND(one)
        code = code.bitwiseOR(F.shiftleft(bit, total - 2 - 2 * j))
    chars = [
        F.substring(
            F.lit(GEOHASH32),
            (
                F.shiftrightunsigned(code, 5 * (precision - 1 - i))
                .bitwiseAND(F.lit(31).cast("bigint"))
                + 1
            ).cast("int"),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def geohash_census(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int = 4,
) -> DataFrame:
    """Spatial density census: points bucketed by geohash cell at
    ``precision`` — the aggregation every map tile / hot-spot report
    starts from.  One scan-stage encode + one keyed count; returns
    (cell, n_points, mean_lat, mean_lon) with the means derived from
    1e-6-quantized integer sums (exact in any order)."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    base = df.where(
        lat.isNotNull()
        & lon.isNotNull()
        & (lat >= -90)
        & (lat <= 90)
        & (lon >= -180)
        & (lon <= 180)
    ).select(
        geohash(lat, lon, precision).alias("cell"),
        F.floor(lat * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("qlat"),
        F.floor(lon * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("qlon"),
    )
    g = base.groupBy("cell").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum("qlat").alias("__slat"),
        F.sum("qlon").alias("__slon"),
    )
    return g.select(
        "cell",
        "n_points",
        (F.col("__slat") / (F.col("n_points") * F.lit(1000000.0))).alias(
            "mean_lat"
        ),
        (F.col("__slon") / (F.col("n_points") * F.lit(1000000.0))).alias(
            "mean_lon"
        ),
    )
