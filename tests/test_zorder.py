"""Z-order layout keys: bit math and the measured clustering effect."""

import pytest

from pyspark.sql import functions as F

from kevinlang_spark.operators.layout import morton_key, quantize16, zorder_keys


def _ref_morton(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_reference(spark):
    pts = [(0, 0), (1, 1), (3, 5), (12345, 54321), (65535, 65535)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _ref_morton(x, y)


def test_quantize_clamps_and_guards(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (10.0,), (99.0,)], "v double")
    got = [r.q for r in df.select(quantize16(F.col("v"), 0.0, 10.0).alias("q")).collect()]
    assert got[0] == 0 and got[2] == 65535 and got[3] == 65535
    with pytest.raises(ValueError):
        quantize16(F.col("v"), 5.0, 5.0)
    with pytest.raises(ValueError):
        morton_key(F.col("v"), F.col("v"), bits=0)


def test_zorder_layout_clusters_box_queries(spark, tmp_path):
    """The point of Z-order: after sorting by zkey, rows matching a 2-D
    box predicate live in FEW files, so per-file min-max stats can skip
    the rest.  Measured here as distinct input files touched by the
    same query under z-ordered vs id-ordered layout."""
    n = 200_000
    df = (
        spark.range(n, numPartitions=8)
        .select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), 1000) / 10.0).alias("x"),  # [0,100)
            (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0).alias("y"),
        )
    )
    zed = zorder_keys(df, "x", (0.0, 100.0), "y", (0.0, 100.0))
    zpath, rpath = str(tmp_path / "zorder"), str(tmp_path / "plain")
    (
        zed.repartitionByRange(16, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    df.repartitionByRange(16, "id").write.mode("overwrite").parquet(rpath)

    box = (F.col("x") < 12.5) & (F.col("y") < 12.5)  # ~1/64 of the space
    touched = lambda p: (
        spark.read.parquet(p)
        .where(box)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    z_files, r_files = touched(zpath), touched(rpath)
    assert r_files == 16  # id layout: matches spread over every file
    assert z_files <= 4, (z_files, r_files)  # z layout: concentrated
