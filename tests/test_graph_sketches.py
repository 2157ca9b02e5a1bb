"""PageRank, Misra–Gries heavy hitters, parquet compaction."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# pagerank
# --------------------------------------------------------------------- #


def _numpy_pagerank(edges, n_iter=10, d=0.85):
    """Reference power iteration with uniform dangling redistribution."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    r = [1.0 / n] * n
    for _ in range(n_iter):
        nxt = [(1 - d) / n] * n
        dangling = sum(r[idx[u]] for u in nodes if u not in out)
        for u, vs in out.items():
            share = r[idx[u]] / len(vs)
            for v in vs:
                nxt[idx[v]] += d * share
        for i in range(n):
            nxt[i] += d * dangling / n
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_power_iteration(spark):
    from kevinlang_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(df, iterations=10).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_nodes_conserve_mass(spark):
    from kevinlang_spark.operators.graph import pagerank

    # node 3 is a pure sink (dangling): without redistribution mass leaks
    df = spark.createDataFrame([(1, 3), (2, 3)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(df, iterations=5).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[3] > got[1]


# --------------------------------------------------------------------- #
# heavy_hitters
# --------------------------------------------------------------------- #


def test_heavy_hitters_exact_when_capacity_covers(spark):
    from kevinlang_spark.operators.sketches import heavy_hitters

    rows = [(v,) for v in ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5]
    df = spark.createDataFrame(rows, ["x"]).repartition(4)
    got = [(r.value, r.est_count) for r in heavy_hitters(df, "x", k=3, capacity=16).collect()]
    assert got == [("a", 50), ("b", 30), ("c", 15)]


def test_heavy_hitters_finds_majority_under_capacity(spark):
    from kevinlang_spark.operators.sketches import heavy_hitters

    # 'hot' has frequency 0.5; MG with capacity 8 over 100 distinct cold
    # values MUST retain it (undercount bound < n/capacity < hot's count)
    rows = [("hot",)] * 400 + [(f"cold{i % 100}",) for i in range(400)]
    df = spark.createDataFrame(rows, ["x"]).repartition(4)
    out = heavy_hitters(df, "x", k=1, capacity=8).collect()
    assert out[0].value == "hot"
    assert out[0].est_count <= 400  # MG only ever undercounts
    assert out[0].est_count >= 400 - 800 // 8


def test_heavy_hitters_summary_is_bounded(spark):
    from kevinlang_spark.operators.sketches import heavy_hitters

    rows = [(f"v{i}",) for i in range(5000)]
    df = spark.createDataFrame(rows, ["x"]).repartition(8)
    # 8 partitions x capacity 32 = at most 256 summary rows pre-top-k
    out = heavy_hitters(df, "x", k=300, capacity=32).collect()
    assert len(out) <= 8 * 32


# --------------------------------------------------------------------- #
# compact_parquet
# --------------------------------------------------------------------- #


def test_compact_parquet_reduces_files(spark, tmp_path):
    from kevinlang_spark.sources.parquet import compact_parquet

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    spark.range(10000).repartition(32).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 32
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    assert spark.read.parquet(dst).count() == 10000
    # narrow repacking: same data, same schema
    a = {r.id for r in spark.read.parquet(dst).collect()}
    assert a == set(range(10000))


def test_compact_parquet_respects_target_size(spark, tmp_path):
    from kevinlang_spark.sources.parquet import compact_parquet

    src = str(tmp_path / "small2")
    dst = str(tmp_path / "compacted2")
    spark.range(50000).repartition(16).write.parquet(src)
    import os

    total = sum(
        os.path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    n = compact_parquet(spark, src, dst, target_file_bytes=total // 4 + 1)
    assert 2 <= n <= 5
    assert len(glob.glob(f"{dst}/*.parquet")) == n
    assert spark.read.parquet(dst).count() == 50000


# --------------------------------------------------------------------- #
# retention_cohorts
# --------------------------------------------------------------------- #


def test_retention_cohorts_matrix(spark):
    from kevinlang_spark.operators.events import retention_cohorts

    W = 604_800
    # users 1,2 start week 0; user 1 returns weeks 1,2; user 3 starts wk 1
    rows = [
        (1, 0), (1, W), (1, 2 * W),
        (2, 10), (2, W + 5),
        (3, W + 1),
    ]
    df = spark.createDataFrame(rows, ["user_id", "t"]).select(
        "user_id", F.col("t").cast("timestamp").alias("ts")
    )
    out = {
        (r.cohort_period, r.period_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert out[(0, 0)] == 2  # users 1 and 2 active in their cohort week
    assert out[(0, 1)] == 2  # both returned the next week
    assert out[(0, 2)] == 1  # only user 1
    assert out[(1, 0)] == 1  # user 3's own cohort
    assert (1, 1) not in out


# --------------------------------------------------------------------- #
# validate (constraint checks)
# --------------------------------------------------------------------- #


def test_validate_single_pass_report(spark):
    from kevinlang_spark.operators.quality import (
        accepted_values,
        in_range,
        matches_regex,
        not_null,
        unique,
        validate,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 5.0, "x-1"),
            (2, "b", 50.0, "y-2"),
            (2, None, -1.0, "zz"),
        ],
        ["id", "s", "v", "code"],
    )
    out = {
        r.check: (r.violations, r.passed)
        for r in validate(
            df,
            [
                unique("id"),
                not_null("s"),
                in_range("v", 0.0, 10.0),
                accepted_values("s", ["a", "b"]),
                matches_regex("code", "^[a-z]-[0-9]$"),
            ],
        ).collect()
    }
    assert out["id_unique"] == (1, False)  # one duplicate row
    assert out["s_not_null"] == (1, False)
    assert out["v_in_range"] == (2, False)  # 50.0 and -1.0
    assert out["s_accepted"] == (0, True)  # NULL is not a violation
    assert out["code_matches"] == (1, False)  # 'zz'


def test_validate_is_one_scan(spark):
    from kevinlang_spark.operators.quality import in_range, not_null, validate

    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )
    plan = validate(
        df, [not_null("id"), in_range("v", 0.0, 500.0)]
    )._jdf.queryExecution().executedPlan().toString()
    # no unique() check -> plain aggregate, exactly one Range scan and
    # no Expand (the multi-distinct rewrite)
    assert plan.count("Range (0") == 1
    assert "Expand" not in plan


def test_profile_numeric_values(spark):
    from kevinlang_spark.operators.stats import profile_numeric

    df = spark.createDataFrame(
        [(1.0, 10), (3.0, 20), (None, 30)], ["a", "b"]
    )
    out = {r.column: r for r in profile_numeric(df).collect()}
    assert out["a"].n == 2 and out["a"].n_null == 1
    assert out["a"].min == 1.0 and out["a"].max == 3.0
    assert out["a"].mean == 2.0 and out["a"].std == 1.0
    assert out["b"].n == 3 and out["b"].n_null == 0
    assert out["b"].mean == 20.0


def test_equidepth_histogram_balanced(spark):
    from kevinlang_spark.operators.stats import equidepth_histogram

    # heavily skewed values: fixed-width binning would put ~everything
    # in one bucket; equi-depth must keep populations equal
    vals = [float(i**3) for i in range(1, 101)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = {r.bucket: r for r in equidepth_histogram(df, "v", buckets=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(out[b].n == 25 for b in out)
    assert out[0].lo == 1.0 and out[3].hi == 1e6
    # contiguous, non-overlapping realized ranges
    assert out[0].hi <= out[1].lo and out[2].hi <= out[3].lo


def test_incremental_merge_equals_full_recompute(spark):
    from kevinlang_spark.operators.incremental import (
        aggregate_delta,
        finalize,
        merge_states,
    )

    rows = [(i % 5, float(i * 7 % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v"])
    a = df.where("k * 41 % 7 < 4")
    b = df.subtract(a)
    merged = merge_states(
        aggregate_delta(a, ["k"], "v"),
        aggregate_delta(b, ["k"], "v"),
        ["k"],
    )
    got = {r.k: (r.n, r.sum_v, r.min_v, r.max_v, r.avg_v) for r in finalize(merged).collect()}
    want = {
        r.k: (r.n, r.sum_v, r.min_v, r.max_v, r.avg_v)
        for r in finalize(aggregate_delta(df, ["k"], "v")).collect()
    }
    assert got == want


def test_incremental_new_keys_pass_through(spark):
    from kevinlang_spark.operators.incremental import (
        aggregate_delta,
        merge_states,
    )

    state = aggregate_delta(
        spark.createDataFrame([(1, 10.0)], ["k", "v"]), ["k"], "v"
    )
    delta = aggregate_delta(
        spark.createDataFrame([(2, 5.0), (2, 7.0)], ["k", "v"]), ["k"], "v"
    )
    out = {r.k: (r.n, r.sum_v) for r in merge_states(state, delta, ["k"]).collect()}
    assert out == {1: (1, 10.0), 2: (2, 12.0)}


def test_triangle_count_known_graph(spark):
    """K4 has exactly 4 triangles; adding a pendant edge changes nothing."""
    import itertools

    edges = list(itertools.combinations(range(4), 2)) + [(3, 9)]
    df = spark.createDataFrame(edges, ["u", "v"])
    e = df.selectExpr("least(u, v) AS a", "greatest(u, v) AS b").distinct()
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    from pyspark.sql import functions as FF

    wedges = e1.join(e2, FF.col("e1.b") == FF.col("e2.a")).select(
        FF.col("e1.a").alias("x"), FF.col("e2.b").alias("z")
    )
    tri = wedges.join(
        e3, (FF.col("x") == FF.col("e3.a")) & (FF.col("z") == FF.col("e3.b"))
    )
    assert tri.count() == 4


def test_skyline_frontier_semantics(spark):
    """Pareto frontier via cumulative max: a row survives iff no
    strictly-earlier row has >= price (2-D skyline reduction)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as FF

    rows = [
        ("P", 1, 10, 100.0),
        ("P", 2, 20, 50.0),   # dominated by key 1 (earlier, higher)
        ("P", 3, 30, 150.0),  # new max -> frontier
        ("P", 4, 30, 200.0),  # same date as 3: prev-window excludes it
        ("Q", 5, 5, 10.0),
    ]
    df = spark.createDataFrame(rows, ["g", "k", "d", "p"])
    w = Window.partitionBy("g").orderBy("d").rangeBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        df.withColumn("pm", FF.max("p").over(w))
        .where(FF.col("pm").isNull() | (FF.col("p") > FF.col("pm")))
        .select("k")
    )
    assert {r.k for r in out.collect()} == {1, 3, 4, 5}


# --------------------------------------------------------------------- #
# hll_rollup
# --------------------------------------------------------------------- #


def test_hll_rollup_near_exact_and_unit_count(spark):
    from kevinlang_spark.operators.sketches import hll_rollup
    from pyspark.sql import functions as F

    # 3 days x users; user 1 active every day (union must not double count)
    rows = [
        (d, u, "click")
        for d, users in [("2024-01-01", [1, 2]), ("2024-01-02", [1, 3]),
                         ("2024-01-03", [1, 4, 5])]
        for u in users
    ]
    df = spark.createDataFrame(rows, "day string, user_id bigint, event_type string")
    (r,) = hll_rollup(
        df, ["event_type"], F.col("day"), "user_id"
    ).collect()
    assert r.n_units == 3
    # HLL is exact in the sparse regime
    assert r.n_union == 5


def test_hll_rollup_sketch_table_round_trips(spark, tmp_path):
    """The per-unit sketch table persists as plain parquet (binary
    column) and the union over the READ-BACK sketches matches the union
    over the live ones — the incremental-maintenance contract."""
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") % 10).alias("day"),
        F.col("id").alias("v"),
    )
    per_unit = df.groupBy("k", "day").agg(
        F.hll_sketch_agg("v", F.lit(12)).alias("sketch")
    )
    path = str(tmp_path / "sketches")
    per_unit.write.parquet(path)
    live = {
        r.k: r.n
        for r in per_unit.groupBy("k")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n"))
        .collect()
    }
    reread = {
        r.k: r.n
        for r in spark.read.parquet(path)
        .groupBy("k")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n"))
        .collect()
    }
    assert live == reread
    # estimates stay within 5% of truth after the round trip
    exact = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    for k, n in exact.items():
        assert abs(reread[k] - n) <= 0.05 * n
