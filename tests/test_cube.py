"""CUBE / ROLLUP grouping-set semantics and plan shape."""

from pyspark.sql import functions as F


def test_cube_emits_all_grouping_sets(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0)],
        "k string, y int, v double",
    )
    out = {
        (r.k, r.y, r.gid): r.s
        for r in df.cube("k", "y")
        .agg(
            F.sum("v").alias("s"),
            (F.grouping("k") * 2 + F.grouping("y")).cast("int").alias("gid"),
        )
        .collect()
    }
    assert out[("a", 1, 0)] == 10.0
    assert out[("a", None, 1)] == 30.0  # k subtotal
    assert out[(None, 1, 2)] == 15.0  # y subtotal
    assert out[(None, None, 3)] == 35.0  # grand total
    assert len(out) == 3 + 2 + 2 + 1  # detail + k-sets + y-sets + grand


def test_rollup_skips_cross_sets(spark):
    df = spark.createDataFrame(
        [("r1", "n1", 1.0), ("r1", "n2", 2.0), ("r2", "n3", 4.0)],
        "r string, n string, v double",
    )
    rows = (
        df.rollup("r", "n")
        .agg(
            F.sum("v").alias("s"),
            (F.grouping("r") * 2 + F.grouping("n")).cast("int").alias("gid"),
        )
        .collect()
    )
    gids = sorted(r.gid for r in rows)
    # detail×3, per-r×2, grand — and NEVER gid=2 (n without r)
    assert gids == [0, 0, 0, 1, 1, 3]
    grand = [r.s for r in rows if r.gid == 3]
    assert grand == [7.0]


def test_cube_is_one_pass_expand(spark):
    """The cube must plan as a single scan + Expand + aggregate, not a
    union of per-grouping-set aggregations."""
    df = spark.createDataFrame([("a", 1, 1.0)], "k string, y int, v double")
    plan = (
        df.cube("k", "y")
        .agg(F.sum("v").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in plan
    assert plan.count("Scan") <= 1 or "ExistingRDD" in plan
