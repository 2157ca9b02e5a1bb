"""As-of and range join operators (beyond-reference extension joins)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators.joins import asof_join, range_join_binned


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:05"), 100.0),
            (2, "A", _ts("2024-01-01 10:00:20"), 101.0),
            (3, "B", _ts("2024-01-01 10:00:10"), 50.0),
            (4, "C", _ts("2024-01-01 10:00:10"), 7.0),
        ],
        ["trade_id", "sym", "ts", "px"],
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 99.5),
            ("A", _ts("2024-01-01 10:00:10"), 100.5),
            ("A", _ts("2024-01-01 10:00:20"), 100.9),  # simultaneous with trade 2
            ("B", _ts("2024-01-01 10:00:15"), 49.9),  # AFTER trade 3
        ],
        ["sym", "ts", "bid"],
    )


def test_asof_backward_semantics(trades, quotes):
    out = asof_join(trades, quotes, on="sym", right_cols=["bid"])
    by_id = {r["trade_id"]: r["bid"] for r in out.collect()}
    assert by_id[1] == 99.5  # latest quote at/before 10:00:05
    assert by_id[2] == 100.9  # simultaneous quote IS visible (<=)
    assert by_id[3] is None  # only quote is after the trade
    assert by_id[4] is None  # no quotes for key C at all
    assert out.count() == 4  # left join: every trade survives


def test_asof_single_shuffle_no_nested_loop(trades, quotes):
    plan = (
        asof_join(trades, quotes, on="sym", right_cols=["bid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # the only join machinery is the union + window
    assert "Window" in plan


def test_asof_matches_duckdb(spark, sf_dir):
    """Spark as-of (union+window) must equal DuckDB's native ASOF JOIN."""
    import duckdb

    from kevinlang_spark.sources.parquet import load_events

    ev = load_events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    got = {
        r["event_id"]: r["click_id"]
        for r in asof_join(purchases, clicks, on="user_id", right_cols=["click_id"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = dict(
        con.execute(
            "WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'), "
            "c AS (SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type='click') "
            "SELECT p.event_id, c.click_id FROM p ASOF LEFT JOIN c "
            "ON p.user_id = c.user_id AND p.ts >= c.ts"
        ).fetchall()
    )
    assert got == want


def test_range_join_binned(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:30:00")),
            (2, _ts("2024-01-01 13:00:00")),
            (3, _ts("2024-01-02 00:00:00")),
        ],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            ("w1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            ("w2", _ts("2024-01-01 10:15:00"), _ts("2024-01-01 14:00:00")),
        ],
        ["iv", "start", "end"],
    )
    out = range_join_binned(points, intervals, None, "ts", "start", "end")
    got = {(r["pid"], r["iv"]) for r in out.collect()}
    assert got == {(1, "w1"), (1, "w2"), (2, "w2")}


def test_range_join_no_nested_loop(spark):
    points = spark.range(10).select(
        F.col("id").alias("pid"),
        (F.lit(_ts("2024-01-01 00:00:00")) + F.make_interval(mins=F.col("id"))).alias("ts"),
    )
    intervals = spark.createDataFrame(
        [("w", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:05:00"))],
        ["iv", "start", "end"],
    )
    plan = (
        range_join_binned(points, intervals, None, "ts", "start", "end")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


# --------------------------------------------------------------------- #
# fuzzy_join (edit-distance with length-bucket blocking)
# --------------------------------------------------------------------- #


def test_fuzzy_join_matches_brute_force(spark):
    import itertools

    from kevinlang_spark.operators.joins import fuzzy_join

    words = [
        "kitten", "sitting", "kitchen", "mitten", "fitting",
        "apple", "apples", "applesauce", "grape", "grapes",
        "a", "ab", "abcd", "abcdef",
    ]
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, ["doc_id", "s"])
    got = {
        (r.left_id, r.right_id): r.distance
        for r in fuzzy_join(df, df, "s", "s", max_distance=2)
        .where("left_id < right_id")
        .collect()
    }

    def lev(a, b):
        d = [[max(i, j) if min(i, j) == 0 else 0 for j in range(len(b) + 1)] for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[len(a)][len(b)]

    want = {
        (i, j): lev(a, b)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= 2
    }
    # blocking must lose NOTHING vs brute force (incl. cross-bucket
    # pairs like 'abcd'/'abcdef' whose length buckets differ)
    assert got == want
    assert (12, 13) in got  # lengths 4 and 6: neighbor-bucket probe


def test_fuzzy_join_is_equi_join(spark):
    from kevinlang_spark.operators.joins import fuzzy_join
    from kevinlang_spark import plans

    df = spark.createDataFrame([(1, "abc"), (2, "abd")], ["doc_id", "s"])
    out = fuzzy_join(df, df, "s", "s", max_distance=1)
    plan = plans.executed_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# --------------------------------------------------------------------- #
# temporal_join (point-in-time SCD2 enrichment)
# --------------------------------------------------------------------- #


def _scd2_dim(spark):
    # key "a": v1 [10, 20), v2 [20, 30), v3 [30, NULL)
    return spark.createDataFrame(
        [("a", 10, 20, "v1"), ("a", 20, 30, "v2"), ("a", 30, None, "v3")],
        "k string, valid_from bigint, valid_to bigint, attr string",
    )


def test_temporal_join_picks_version_valid_at_ts(spark):
    from kevinlang_spark.operators.joins import temporal_join

    facts = spark.createDataFrame(
        [("a", 15, 1), ("a", 25, 2), ("a", 99, 3)],
        "k string, ts bigint, fid bigint",
    )
    got = {
        r.fid: r.attr
        for r in temporal_join(facts, _scd2_dim(spark), "k", "ts").collect()
    }
    assert got == {1: "v1", 2: "v2", 3: "v3"}


def test_temporal_join_boundaries_are_half_open(spark):
    from kevinlang_spark.operators.joins import temporal_join

    facts = spark.createDataFrame(
        [("a", 20, 1), ("a", 30, 2)], "k string, ts bigint, fid bigint"
    )
    got = {
        r.fid: r.attr
        for r in temporal_join(facts, _scd2_dim(spark), "k", "ts").collect()
    }
    # ts == valid_from of the NEXT version -> next version, never the old
    assert got == {1: "v2", 2: "v3"}


def test_temporal_join_no_time_travel_leakage(spark):
    """Facts BEFORE a key's first version (or on an unknown key) keep
    their row but get NULL attributes — never a future value."""
    from kevinlang_spark.operators.joins import temporal_join

    facts = spark.createDataFrame(
        [("a", 5, 1), ("zz", 50, 2)], "k string, ts bigint, fid bigint"
    )
    got = {
        r.fid: r.attr
        for r in temporal_join(facts, _scd2_dim(spark), "k", "ts").collect()
    }
    assert got == {1: None, 2: None}


def test_temporal_join_composes_with_scd2_build(spark):
    from kevinlang_spark.operators.events import scd2_build
    from kevinlang_spark.operators.joins import temporal_join

    changes = spark.createDataFrame(
        [("a", 10, "x"), ("a", 20, "y")], "k string, ts bigint, s string"
    )
    dim = scd2_build(changes, "k", "ts", ["s"])
    facts = spark.createDataFrame(
        [("a", 12, 1), ("a", 20, 2)], "k string, ts bigint, fid bigint"
    )
    got = {
        r.fid: r.s for r in temporal_join(facts, dim, "k", "ts").collect()
    }
    assert got == {1: "x", 2: "y"}


# --------------------------------------------------------------------- #
# resample_lerp
# --------------------------------------------------------------------- #


def test_resample_lerp_exact_interpolation(spark):
    from pyspark.sql import functions as F
    from kevinlang_spark.operators.joins import resample_lerp

    # events at t=0 (v=10) and t=100 (v=20); grid step 25
    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 100, 20.0)], "user_id bigint, ts bigint, value double"
    )
    got = {
        r.grid_ts: r.value
        for r in resample_lerp(df, step=25).collect()
    }
    assert got == {0: 10.0, 25: 12.5, 50: 15.0, 75: 17.5, 100: 20.0}


def test_resample_lerp_boundary_policy(spark):
    from kevinlang_spark.operators.joins import resample_lerp

    # first event mid-grid: grid starts at floor(min)=100 -> exact hit;
    # after the last event -> forward fill; NULL observation ignored
    df = spark.createDataFrame(
        [(1, 100, 5.0), (1, 150, None), (1, 200, 9.0)],
        "user_id bigint, ts bigint, value double",
    )
    got = {
        r.grid_ts: r.value for r in resample_lerp(df, step=50).collect()
    }
    assert got[100] == 5.0
    assert got[150] == 7.0  # lerp across the dropped NULL, not through it
    assert got[200] == 9.0


def test_resample_lerp_single_exchange(spark):
    from kevinlang_spark.operators.joins import resample_lerp

    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 7200, 3.0), (2, 0, 5.0)],
        "user_id bigint, ts bigint, value double",
    )
    out = resample_lerp(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every window is key-partitioned (no global sort window), and all
    # neighbor windows share the same (key, ts, side) ordering so they
    # ride one Exchange+Sort
    specs = plan.split("windowspecdefinition(")[1:]
    assert specs and all(s.startswith("user_id") for s in specs)
