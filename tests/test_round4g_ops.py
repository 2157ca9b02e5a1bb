"""Round-4g operators: KLL quantile rollup, Theta-sketch set algebra,
exact-dyadic sequential smoothing, per-source corpus novelty."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# kll_rollup
# --------------------------------------------------------------------- #


def _value_events(spark, n=400, units=4):
    rows = [
        (i, i % units, float(i % 101))  # values 0..100 uniform-ish
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id bigint, unit int, value double")


def test_kll_rollup_median_within_bound(spark):
    from kevinlang_spark.operators.sketches import kll_rollup

    df = _value_events(spark).withColumn("k", F.lit("a"))
    out = kll_rollup(df, ["k"], "unit", "value", quantiles=(0.5,)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_units == 4 and r.n_rows == 400
    # exact median of 0..100-cycle data is ~50; KLL rank error at
    # k=200 on 400 points is tiny
    assert abs(r.q_50 - 50.0) <= 3.0


def test_kll_rollup_merge_spans_units(spark):
    """The merged quantile reflects ALL units, not any single one: give
    each unit a disjoint value range and check the merged median falls
    between the per-unit medians."""
    from kevinlang_spark.operators.sketches import kll_rollup

    rows = [(i, 0, float(i)) for i in range(100)] + [
        (100 + i, 1, 1000.0 + i) for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, unit int, value double"
    ).withColumn("k", F.lit("a"))
    r = kll_rollup(df, ["k"], "unit", "value", quantiles=(0.5,)).collect()[0]
    # true merged median sits at the gap between the two ranges; a
    # median from unit 0 alone would be ~50, from unit 1 alone ~1050
    assert 90.0 <= r.q_50 <= 1010.0


def test_kll_rollup_null_values_excluded(spark):
    from kevinlang_spark.operators.sketches import kll_rollup

    df = spark.createDataFrame(
        [(1, 0, 10.0), (2, 0, None), (3, 1, 20.0)],
        "id bigint, unit int, value double",
    ).withColumn("k", F.lit("a"))
    r = kll_rollup(df, ["k"], "unit", "value").collect()[0]
    assert r.n_rows == 2 and r.n_units == 2


# --------------------------------------------------------------------- #
# theta_rollup / theta_overlap
# --------------------------------------------------------------------- #


def test_theta_overlap_exact_mode_set_algebra(spark):
    """Below 2^lgk the sketch is exact: intersection and difference
    equal the true set counts."""
    from kevinlang_spark.operators.sketches import theta_overlap, theta_rollup

    # unit 1: users 0..9 ; unit 2: users 5..14  -> both=5, only_a=5
    rows = [(u, 1) for u in range(10)] + [(u, 2) for u in range(5, 15)]
    df = spark.createDataFrame(rows, "user bigint, unit int").withColumn(
        "k", F.lit("a")
    )
    sk = theta_rollup(df, ["k"], "unit", "user")
    r = theta_overlap(sk, ["k"], F.lit(1), F.lit(2)).collect()[0]
    assert (r.n_a, r.n_b, r.n_both, r.n_only_a) == (10, 10, 5, 5)


def test_theta_span_overlap_picks_min_max_units(spark):
    from kevinlang_spark.operators.sketches import (
        theta_rollup,
        theta_span_overlap,
    )

    # three units; first (d1) and last (d3) share exactly user 7
    d1, d2, d3 = (
        datetime.date(2024, 1, 1),
        datetime.date(2024, 1, 2),
        datetime.date(2024, 1, 3),
    )
    rows = (
        [(u, d1) for u in (1, 2, 7)]
        + [(u, d2) for u in (100, 101)]
        + [(u, d3) for u in (7, 9)]
    )
    df = spark.createDataFrame(rows, "user bigint, unit date").withColumn(
        "k", F.lit("a")
    )
    sk = theta_rollup(df, ["k"], "unit", "user")
    r = theta_span_overlap(sk, ["k"]).collect()[0]
    # middle unit must not leak in
    assert (r.n_a, r.n_b, r.n_both, r.n_only_a) == (3, 2, 1, 2)


def test_theta_rollup_dedups_within_unit(spark):
    from kevinlang_spark.operators.sketches import theta_overlap, theta_rollup

    rows = [(1, 1), (1, 1), (1, 1), (2, 2)]
    df = spark.createDataFrame(rows, "user bigint, unit int").withColumn(
        "k", F.lit("a")
    )
    sk = theta_rollup(df, ["k"], "unit", "user")
    r = theta_overlap(sk, ["k"], F.lit(1), F.lit(2)).collect()[0]
    assert (r.n_a, r.n_b, r.n_both) == (1, 1, 0)


# --------------------------------------------------------------------- #
# dyadic_smooth
# --------------------------------------------------------------------- #


def _py_dyadic(values, horizon=20, scale=100):
    """Reference fold in plain Python — same exact arithmetic.  Half-way
    quantization rounds AWAY from zero like Spark and DuckDB ROUND (not
    Python's banker's round)."""
    import math

    def q(x):
        return math.copysign(math.floor(abs(x) + 0.5), x)

    out = []
    for t in range(len(values)):
        window = values[max(0, t - horizon + 1) : t + 1]
        acc = 0.0
        for v in window:
            acc = acc / 2 + q((v or 0.0) * scale) / 2
        out.append(acc / scale)
    return out


def test_dyadic_smooth_matches_python_reference(spark):
    from kevinlang_spark.operators.events import dyadic_smooth

    import datetime as dt

    vals = [3.14, 0.0, None, 42.5, 7.77, 100.01, 0.005, 9.999]
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=i), i, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )
    got = [
        r.smooth
        for r in dyadic_smooth(df, ["user_id"]).orderBy("event_id").collect()
    ]
    want = _py_dyadic(vals)
    # EXACT equality — the whole point of the dyadic formulation
    assert got == want


def test_dyadic_smooth_partitioning_invariant(spark):
    """Same bit-exact result regardless of input partitioning — the
    property float EWMAs lose."""
    from kevinlang_spark.operators.events import dyadic_smooth

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(seconds=i), i, (i * 37 % 997) / 7.0)
        for i in range(300)
        for u in (1, 2)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )
    a = dyadic_smooth(df.repartition(1), ["user_id"])
    b = dyadic_smooth(df.repartition(13), ["user_id"])
    ra = sorted((r.user_id, r.event_id, r.smooth) for r in a.collect())
    rb = sorted((r.user_id, r.event_id, r.smooth) for r in b.collect())
    assert ra == rb


def test_dyadic_smooth_horizon_truncates(spark):
    """Events older than the horizon contribute nothing: two identical
    tails preceded by different ancient heads give equal smoothed
    values at the end."""
    from kevinlang_spark.operators.events import dyadic_smooth

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    tail = [(i * 13 % 50) / 3.0 for i in range(20)]
    rows = []
    for uid, head in ((1, 9999.0), (2, 0.125)):
        vals = [head] + tail
        rows += [
            (uid, base + dt.timedelta(minutes=i), i, v)
            for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )
    out = dyadic_smooth(df, ["user_id"], horizon=20)
    last = {
        r.user_id: r.smooth
        for r in out.where(F.col("event_id") == 20).collect()
    }
    assert last[1] == last[2]


# --------------------------------------------------------------------- #
# novelty_counts
# --------------------------------------------------------------------- #


def test_novelty_charges_duplicate_to_later_source(spark):
    from kevinlang_spark.operators.dedup import novelty_counts

    rows = [
        (1, "alpha text", "s1"),
        (2, "beta text", "s1"),
        (3, "ALPHA  text!", "s2"),  # dup of doc 1 after normalization
        (4, "gamma", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        r.source: (r.n_docs, r.n_first)
        for r in novelty_counts(df).collect()
    }
    # s1 contributed both of its docs first; s2's copy of alpha is not
    # novel
    assert got == {"s1": (2, 2), "s2": (2, 1)}


def test_novelty_order_col_decides_first(spark):
    from kevinlang_spark.operators.dedup import novelty_counts

    rows = [
        (10, "same thing", "late"),
        (2, "same thing", "early"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        r.source: (r.n_docs, r.n_first)
        for r in novelty_counts(df).collect()
    }
    assert got == {"early": (1, 1), "late": (1, 0)}


# --------------------------------------------------------------------- #
# join_key_profile
# --------------------------------------------------------------------- #


def test_join_key_profile_exact_regime(spark):
    from kevinlang_spark.operators.sketches import join_key_profile

    a = spark.createDataFrame([(k,) for k in range(10)], "k bigint")
    b = spark.createDataFrame([(k,) for k in range(5, 20)], "k bigint")
    r = join_key_profile(a, b, "k", "k").collect()[0]
    assert (r.n_keys_a, r.n_keys_b, r.n_matched, r.n_only_a, r.n_only_b) == (
        10,
        15,
        5,
        5,
        10,
    )


def test_join_key_profile_ignores_nulls_and_dups(spark):
    from kevinlang_spark.operators.sketches import join_key_profile

    a = spark.createDataFrame([(1,), (1,), (None,), (2,)], "k bigint")
    b = spark.createDataFrame([(2,), (2,), (None,)], "k bigint")
    r = join_key_profile(a, b, "k", "k").collect()[0]
    assert (r.n_keys_a, r.n_keys_b, r.n_matched) == (2, 1, 1)


def test_join_key_profile_runs_no_join_shuffle(spark):
    """The profile must not execute the join it is sizing: no
    hashpartitioning Exchange on either input's key."""
    from kevinlang_spark.operators.sketches import join_key_profile
    from kevinlang_spark.plans.inspect import executed_plan

    a = spark.createDataFrame([(k,) for k in range(100)], "k bigint")
    b = spark.createDataFrame([(k,) for k in range(100)], "k bigint")
    plan = executed_plan(join_key_profile(a, b, "k", "k"))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# --------------------------------------------------------------------- #
# funnel_latency
# --------------------------------------------------------------------- #


def _ev(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (u, base + dt.timedelta(seconds=s), i, etype, 1.0)
        for i, (u, s, etype) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double",
    )


def test_funnel_latency_first_a_to_first_b_after(spark):
    from kevinlang_spark.operators.events import funnel_latency

    rows = [
        # user 1: click@10, purchase@70 -> 60s
        (1, 10, "click"),
        (1, 70, "purchase"),
        # user 2: purchase BEFORE any click, then click@50, purchase@110
        # -> 60s (the pre-click purchase must not count)
        (2, 5, "purchase"),
        (2, 50, "click"),
        (2, 110, "purchase"),
        # user 3: click only -> not converted
        (3, 7, "click"),
    ]
    r = funnel_latency(_ev(spark, rows), "click", "purchase").collect()[0]
    assert r.n_converted == 2
    assert (r.p25_s, r.p50_s, r.p75_s) == (60.0, 60.0, 60.0)


def test_funnel_latency_simultaneous_counts(spark):
    from kevinlang_spark.operators.events import funnel_latency

    rows = [(1, 10, "click"), (1, 10, "purchase")]
    r = funnel_latency(_ev(spark, rows), "click", "purchase").collect()[0]
    assert r.n_converted == 1 and r.p50_s == 0.0


# --------------------------------------------------------------------- #
# KevinFrame method exposure
# --------------------------------------------------------------------- #


def test_frame_methods_round4g(spark):
    import datetime as dt

    from kevinlang_spark import KevinFrame

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, base, 0, "click", 4.0),
            (1, base + dt.timedelta(seconds=30), 1, "purchase", 2.0),
            (2, base, 2, "click", 8.0),
        ],
        "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double",
    )
    kf = KevinFrame.from_df(ev)
    assert kf.kll_rollup(["event_type"], "user_id", "value").height() == 2
    assert kf.theta_rollup(["event_type"], "user_id", "user_id").height() == 3
    prof = kf.join_key_profile(kf, "user_id", "user_id")
    assert prof.to_df().collect()[0].n_matched == 2
    assert kf.dyadic_smooth(["user_id"]).height() == 3
    assert kf.funnel_latency("click", "purchase").to_df().collect()[0].n_converted == 1

    docs = spark.createDataFrame(
        [(1, "aa", "s1"), (2, "aa", "s2")],
        "doc_id bigint, text string, source string",
    )
    got = {
        r.source: r.n_first
        for r in KevinFrame.from_df(docs).novelty_counts().to_df().collect()
    }
    assert got == {"s1": 1, "s2": 0}


# --------------------------------------------------------------------- #
# dp_counts
# --------------------------------------------------------------------- #


def test_dp_counts_deterministic_and_noisy(spark):
    from kevinlang_spark.operators.quality import dp_counts

    df = spark.createDataFrame(
        [(i, f"g{i % 50}") for i in range(5000)], "id bigint, g string"
    )
    a = {r.g: r.noisy_count for r in dp_counts(df, ["g"], seed="s1", release_id="r1").collect()}
    b = {r.g: r.noisy_count for r in dp_counts(df, ["g"], seed="s1", release_id="r1").collect()}
    assert a == b  # same seed -> identical release
    c = {r.g: r.noisy_count for r in dp_counts(df, ["g"], seed="s2", release_id="r1").collect()}
    assert a != c  # fresh seed -> fresh draw
    # noise is real but Laplace(1)-scale: every group's true count is 100
    errs = [abs(v - 100) for v in a.values()]
    assert max(errs) > 0
    assert sum(errs) / len(errs) < 5  # E|Laplace(1)| = 1


def test_dp_counts_epsilon_scales_noise(spark):
    from kevinlang_spark.operators.quality import dp_counts

    df = spark.createDataFrame(
        [(i, f"g{i % 200}") for i in range(2000)], "id bigint, g string"
    )
    tight = dp_counts(df, ["g"], epsilon=10.0, release_id="r1").collect()
    loose = dp_counts(df, ["g"], epsilon=0.1, release_id="r1").collect()
    err_tight = sum(abs(r.noisy_count - 10) for r in tight) / 200
    err_loose = sum(abs(r.noisy_count - 10) for r in loose) / 200
    # E|noise| = 1/eps: 0.1 vs 10 (clamping at 0 halves the loose side's
    # observable error at true count 10, still >> the tight side)
    assert err_loose > err_tight * 5


def test_dp_counts_clamps_at_zero(spark):
    from kevinlang_spark.operators.quality import dp_counts

    df = spark.createDataFrame(
        [(i, f"g{i}") for i in range(500)], "id bigint, g string"
    )
    # true count 1 per group, eps=0.1 -> lots of would-be-negative draws
    rel = dp_counts(df, ["g"], epsilon=0.1, release_id="r1").collect()
    assert min(r.noisy_count for r in rel) == 0
    unclamped = dp_counts(df, ["g"], epsilon=0.1, clamp=False, release_id="r1").collect()
    assert min(r.noisy_count for r in unclamped) < 0


def test_dp_counts_rejects_bad_epsilon(spark):
    from kevinlang_spark.operators.quality import dp_counts

    df = spark.createDataFrame([(1, "a")], "id bigint, g string")
    with pytest.raises(ValueError):
        dp_counts(df, ["g"], epsilon=0.0, release_id="r1")


# --------------------------------------------------------------------- #
# join_delta (incremental join maintenance)
# --------------------------------------------------------------------- #


def test_join_delta_applied_equals_full_recompute(spark):
    from kevinlang_spark.operators.incremental import join_delta

    a_old = spark.createDataFrame(
        [(1, "a1"), (2, "a2")], "k bigint, av string"
    )
    da = spark.createDataFrame([(2, "a3"), (3, "a4")], "k bigint, av string")
    b_old = spark.createDataFrame(
        [(1, "b1"), (3, "b2")], "k bigint, bv string"
    )
    db = spark.createDataFrame([(2, "b3"), (3, "b4")], "k bigint, bv string")

    base_view = a_old.join(b_old, "k")
    delta = join_delta(a_old, da, b_old, db, "k")
    maintained = base_view.unionByName(delta)
    full = a_old.unionByName(da).join(b_old.unionByName(db), "k")
    got = sorted(map(tuple, maintained.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want
    # and the delta is disjoint from the base view (no double counting)
    assert len(got) == len(base_view.collect()) + len(delta.collect())


def test_join_delta_broadcasts_delta_sides(spark):
    from kevinlang_spark.operators.incremental import join_delta
    from kevinlang_spark.plans.inspect import executed_plan

    a_old = spark.range(1000).withColumnRenamed("id", "k")
    da = spark.range(5).withColumnRenamed("id", "k")
    b_old = spark.range(1000).withColumnRenamed("id", "k")
    db = spark.range(5).withColumnRenamed("id", "k")
    plan = executed_plan(join_delta(a_old, da, b_old, db, "k"))
    # all three terms broadcast a delta: no base-table shuffle exchange
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "Exchange hashpartitioning" not in plan, plan


# --------------------------------------------------------------------- #
# cms_frequencies
# --------------------------------------------------------------------- #


def test_cms_never_undercounts_and_finds_exact(spark):
    from kevinlang_spark.operators.sketches import cms_frequencies

    rows = [(f"t{i % 7}",) for i in range(700)] + [("rare",)]
    df = spark.createDataFrame(rows, "tok string")
    got = {
        r.item: r.est_count
        for r in cms_frequencies(
            df, "tok", ["t0", "rare", "absent"]
        ).collect()
    }
    assert got["t0"] >= 100  # never undercounts
    assert got["rare"] >= 1
    assert got["absent"] >= 0
    # collision-free regime (8 distinct << width): exact
    assert got["t0"] == 100 and got["rare"] == 1 and got["absent"] == 0


def test_cms_deterministic_for_seed(spark):
    from kevinlang_spark.operators.sketches import cms_frequencies

    df = spark.createDataFrame([(f"t{i % 50}",) for i in range(500)], "tok string")
    a = cms_frequencies(df, "tok", ["t1", "t2"], seed=7).collect()
    b = cms_frequencies(df, "tok", ["t1", "t2"], seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cms_long_items(spark):
    from kevinlang_spark.operators.sketches import cms_frequencies

    df = spark.createDataFrame([(i % 10,) for i in range(100)], "v bigint")
    got = {
        r.item: r.est_count
        for r in cms_frequencies(df, "v", [0, 9, 123]).collect()
    }
    assert got == {0: 10, 9: 10, 123: 0}


# --------------------------------------------------------------------- #
# grouped_heavy_hitters
# --------------------------------------------------------------------- #


def test_grouped_hh_exact_regime_matches_relational(spark):
    from kevinlang_spark.operators.sketches import grouped_heavy_hitters

    rows = [("a", f"t{i % 5}") for i in range(50)] + [
        ("b", f"t{i % 3}") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = sorted(
        (r.g, r.value, r.est_count, r.rank)
        for r in grouped_heavy_hitters(df, "g", "v", k=2).collect()
    )
    want = sorted(
        (r.g, r.v, r.n, r.rank)
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT g, v, n, CAST(ROW_NUMBER() OVER
                 (PARTITION BY g ORDER BY n DESC, v ASC) AS INT) AS rank
                 FROM (SELECT g, v, COUNT(*) AS n FROM {d} GROUP BY g, v)
               ) WHERE rank <= 2""",
            d=df,
        ).collect()
    )
    assert got == want


def test_grouped_hh_majority_survives_under_capacity(spark):
    """Per-group Misra–Gries guarantee: a value holding >1/capacity of
    its group's mass is present even when eviction fires."""
    from kevinlang_spark.operators.sketches import grouped_heavy_hitters

    rows = [("g", "big")] * 500 + [("g", f"noise{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v string").repartition(2)
    out = grouped_heavy_hitters(df, "g", "v", k=1, capacity=16).collect()
    assert out[0].value == "big"
    # undercount bound: est >= true - n/capacity
    assert out[0].est_count >= 500 - (700 // 16)


def test_grouped_hh_groups_isolated(spark):
    """One group's eviction pressure must not evict another group's
    counters."""
    from kevinlang_spark.operators.sketches import grouped_heavy_hitters

    rows = [("noisy", f"n{i}") for i in range(300)] + [("clean", "x")] * 5
    df = spark.createDataFrame(rows, "g string, v string").repartition(1)
    out = grouped_heavy_hitters(df, "g", "v", k=1, capacity=8).collect()
    clean = [r for r in out if r.g == "clean"]
    assert clean and clean[0].value == "x" and clean[0].est_count == 5


# --------------------------------------------------------------------- #
# kcenter_sample
# --------------------------------------------------------------------- #


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )


def test_kcenter_picks_one_per_cluster(spark):
    from kevinlang_spark.operators.similarity import kcenter_sample

    # three tight angular clusters: along +x, +y, +z
    vecs = (
        [[10, 0.1 * i, 0] for i in range(5)]
        + [[0.1 * i, 10, 0] for i in range(5)]
        + [[0, 0.1 * i, 10] for i in range(5)]
    )
    out = kcenter_sample(_emb_df(spark, vecs), k=3).collect()
    clusters = {r.id // 5 for r in out}
    assert len(out) == 3 and clusters == {0, 1, 2}


def test_kcenter_radius_monotone_and_ids_distinct(spark):
    from kevinlang_spark.operators.similarity import kcenter_sample

    vecs = [[(i * 13 % 29) / 7.0, (i * 7 % 31) / 5.0, 1.0] for i in range(40)]
    out = sorted(kcenter_sample(_emb_df(spark, vecs), k=5).collect(),
                 key=lambda r: r.rank)
    assert out[0].radius is None
    radii = [r.radius for r in out[1:]]
    # greedy picks the farthest remaining point: radii never increase
    assert all(radii[i] >= radii[i + 1] for i in range(len(radii) - 1))
    assert len({r.id for r in out}) == 5


def test_kcenter_k_exceeds_n(spark):
    from kevinlang_spark.operators.similarity import kcenter_sample

    vecs = [[1.0, 0.0], [0.0, 1.0]]
    out = kcenter_sample(_emb_df(spark, vecs), k=10).collect()
    assert len(out) == 2


# --------------------------------------------------------------------- #
# km_survival
# --------------------------------------------------------------------- #


def test_km_survival_textbook_values(spark):
    from kevinlang_spark.operators.stats import km_survival

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    end = base + dt.timedelta(days=30)
    rows = []
    # users 1,2: lifetime 5d, churned (last event long before end)
    for u in (1, 2):
        rows += [(u, base, u), (u, base + dt.timedelta(days=5), 100 + u)]
    # user 3: lifetime 10d, churned
    rows += [(3, base, 3), (3, base + dt.timedelta(days=10), 103)]
    # user 4: lifetime 29.9d, censored (last event at the window edge)
    rows += [(4, base, 4), (4, end - dt.timedelta(hours=2), 104)]
    df = spark.createDataFrame(
        [(u, ts, i, "e", 1.0) for u, ts, i in rows],
        "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double",
    )
    out = {r.t: (r.n_risk, r.d, r.s) for r in km_survival(df).collect()}
    # t=5: 4 at risk, 2 churn -> S = 1/2 ; t=10: 2 at risk, 1 churn ->
    # S = 1/4 ; t=29: censored user leaves without churning, S stays
    assert out[5] == (4, 2, 0.5)
    assert out[10] == (2, 1, 0.25)
    assert out[29] == (1, 0, 0.25)


def test_km_survival_all_censored_is_flat(spark):
    from kevinlang_spark.operators.stats import km_survival

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(days=d), u * 10 + d, "e", 1.0)
        for u in (1, 2)
        for d in (0, 3)
    ]
    df = spark.createDataFrame(
        rows,
        "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double",
    )
    out = km_survival(df).collect()
    assert all(r.s == 1.0 and r.d == 0 for r in out)


# --------------------------------------------------------------------- #
# seasonal_backtest
# --------------------------------------------------------------------- #


def test_backtest_perfect_seasonality_zero_error(spark):
    from kevinlang_spark.operators.anomaly import seasonal_backtest

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    # identical daily pattern: hour h gets (h % 3) + 1 events, 4 days
    for day in range(4):
        for h in range(24):
            for _ in range((h % 3) + 1):
                rows.append(
                    (1, base + dt.timedelta(days=day, hours=h, minutes=5), i)
                )
                i += 1
    df = spark.createDataFrame(
        [(u, ts, e, "e", 1.0) for u, ts, e in rows],
        "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double",
    )
    out = seasonal_backtest(df, key_col="event_type", eval_buckets=48).collect()
    assert len(out) == 1
    assert out[0].mae == 0.0 and out[0].mape == 0.0 and out[0].n_eval == 48


def test_backtest_known_error(spark):
    from kevinlang_spark.operators.anomaly import seasonal_backtest

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    # day 0: 2 events at hour 0; day 1: 4 events at hour 0 -> |4-2|=2,
    # mape = 2/4 = 0.5
    for day, n in ((0, 2), (1, 4)):
        for _ in range(n):
            rows.append((1, base + dt.timedelta(days=day, minutes=10), i))
            i += 1
    df = spark.createDataFrame(
        [(u, ts, e, "e", 1.0) for u, ts, e in rows],
        "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double",
    )
    out = seasonal_backtest(df, eval_buckets=24).collect()
    assert out[0].n_eval == 1 and out[0].mae == 2.0 and out[0].mape == 0.5


def test_frame_methods_round4g_late(spark):
    import datetime as dt

    from kevinlang_spark import KevinFrame

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (u, base + dt.timedelta(days=d, hours=u), u * 100 + d, "e", 1.0)
            for u in (1, 2, 3)
            for d in (0, 1, 2)
        ],
        "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double",
    )
    kf = KevinFrame.from_df(ev)
    assert kf.dp_counts(["event_type"], release_id="r1").height() == 1
    assert kf.cms_frequencies("event_type", ["e", "x"]).height() == 2
    assert kf.grouped_heavy_hitters("event_type", "user_id", k=2).height() == 2
    assert kf.km_survival().height() >= 1
    assert kf.seasonal_backtest(eval_buckets=48).height() == 1

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id bigint, embedding array<double>",
    )
    assert KevinFrame.from_df(emb).kcenter_sample(k=3).height() == 3


# --------------------------------------------------------------------- #
# leakage_safe_split
# --------------------------------------------------------------------- #


def test_leakage_split_pairs_share_split(spark):
    from kevinlang_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id bigint, text string"
    )
    # chain 10-11-12 plus pair 40-41: both clusters must be atomic
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (40, 41)], "id_a bigint, id_b bigint"
    )
    out = {
        r.doc_id: (r.split_group, r.split)
        for r in leakage_safe_split(docs, pairs).collect()
    }
    assert len(out) == 100
    assert out[10] == out[11] == out[12]
    assert out[40] == out[41]
    # unpaired docs group under their own id
    assert out[5][0] == 5


def test_leakage_split_matches_hash_split_for_unpaired(spark):
    """With no pairs, the assignment degenerates to the plain hash
    split — same buckets, same labels."""
    from kevinlang_spark.operators.sampling import hash_split, leakage_safe_split

    docs = spark.createDataFrame(
        [(i, "t") for i in range(200)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    a = {r.doc_id: r.split for r in leakage_safe_split(docs, pairs).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs).select("doc_id", "split").collect()}
    assert a == b


# --------------------------------------------------------------------- #
# twonn_intrinsic_dim
# --------------------------------------------------------------------- #


def test_twonn_recovers_low_dim_manifold(spark):
    """Points on a 2-D plane embedded in 16-D: TwoNN should estimate
    far below the ambient dimension."""
    from kevinlang_spark.operators.similarity import twonn_intrinsic_dim

    import math

    rows = []
    for i in range(200):
        a, b = (i * 37 % 199) / 199.0, (i * 101 % 197) / 197.0
        v = [1.0 + a, 1.0 + b] + [1.0] * 14  # affine 2-D sheet, off-origin
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    r = twonn_intrinsic_dim(df, probe_mod=4).collect()[0]
    assert r.n_probes >= 30
    assert r.id_est < 8.0  # ambient is 16; a flat sheet reads low


def test_twonn_drops_duplicate_probes(spark):
    from kevinlang_spark.operators.similarity import twonn_intrinsic_dim

    rows = [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0])] + [
        (i, [float(i), 1.0, (i * 7 % 13) / 3.0]) for i in range(2, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    # probe 0 has an exact duplicate (r1 = 0) -> excluded, not a crash
    r = twonn_intrinsic_dim(df, probe_mod=2).collect()[0]
    assert r.n_probes <= 19 and r.id_est is not None


# --------------------------------------------------------------------- #
# rank_biased_overlap
# --------------------------------------------------------------------- #


def _ranked(spark, ids):
    return spark.createDataFrame(
        [(v, i + 1) for i, v in enumerate(ids)], "item bigint, rank int"
    )


def test_rbo_identical_lists_is_one(spark):
    from kevinlang_spark.operators.stats import rank_biased_overlap

    a = _ranked(spark, list(range(10)))
    r = rank_biased_overlap(a, a, "item", k=10).collect()[0]
    # truncated RBO@10 of identical lists = 1 - p^10 (tail mass beyond
    # the cutoff); with p=0.9 that's ~0.6513
    assert abs(r.rbo - (1 - 0.9**10)) < 1e-6


def test_rbo_disjoint_lists_is_zero(spark):
    from kevinlang_spark.operators.stats import rank_biased_overlap

    a = _ranked(spark, list(range(10)))
    b = _ranked(spark, list(range(100, 110)))
    r = rank_biased_overlap(a, b, "item", k=10).collect()[0]
    assert r.rbo == 0.0


def test_rbo_top_weighted(spark):
    """Agreement at the TOP counts more than at the bottom: swap rank-1
    items vs swap rank-10 items."""
    from kevinlang_spark.operators.stats import rank_biased_overlap

    base = list(range(10))
    top_diff = [99] + base[1:]
    bot_diff = base[:9] + [99]
    a = _ranked(spark, base)
    r_top = rank_biased_overlap(a, _ranked(spark, top_diff), "item").collect()[0].rbo
    r_bot = rank_biased_overlap(a, _ranked(spark, bot_diff), "item").collect()[0].rbo
    assert r_bot > r_top


# --------------------------------------------------------------------- #
# frequent_sequences (PrefixSpan)
# --------------------------------------------------------------------- #


def _seq_events(spark, user_seqs):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows, i = [], 0
    for u, types in user_seqs.items():
        for j, t in enumerate(types):
            rows.append((u, base + dt.timedelta(minutes=j), i, t, 1.0))
            i += 1
    return spark.createDataFrame(
        rows,
        "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double",
    )


def test_frequent_sequences_order_matters(spark):
    from kevinlang_spark.operators.baskets import frequent_sequences

    # a->b in 2 of 2 sequences; b->a in only 1
    ev = _seq_events(spark, {1: ["a", "b"], 2: ["a", "b", "a"]})
    got = {
        r.pattern: r.freq
        for r in frequent_sequences(ev, min_support=0.9).collect()
    }
    assert got["a->b"] == 2
    assert "b->a" not in got  # support 1/2 < 0.9
    assert got["a"] == 2 and got["b"] == 2


def test_frequent_sequences_repeat_pattern(spark):
    from kevinlang_spark.operators.baskets import frequent_sequences

    # x->x needs two x's in the same sequence
    ev = _seq_events(spark, {1: ["x", "x"], 2: ["x"]})
    got = {
        r.pattern: r.freq
        for r in frequent_sequences(ev, min_support=0.4).collect()
    }
    assert got["x"] == 2 and got["x->x"] == 1


def test_frequent_sequences_user_counted_once(spark):
    from kevinlang_spark.operators.baskets import frequent_sequences

    # user 1 repeats a->b many times: still freq 1 for that sequence
    ev = _seq_events(spark, {1: ["a", "b"] * 5, 2: ["c"]})
    got = {
        r.pattern: r.freq
        for r in frequent_sequences(ev, min_support=0.4).collect()
    }
    assert got["a->b"] == 1
