"""Event-analytics operators (SCD2, funnel, transitions) + round-4b
sampling/stats/text/layout additions."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# scd2_build
# --------------------------------------------------------------------- #


def test_scd2_intervals(spark):
    from kevinlang_spark.operators.events import scd2_build

    df = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 150.0), (1, 30, 120.0), (2, 5, 7.0)],
        ["k", "t", "v"],
    )
    out = scd2_build(df, key="k", ts_col="t", value_cols=["v"])
    rows = {(r.k, r.valid_from): r for r in out.collect()}
    assert rows[(1, 10)].valid_to == 20 and not rows[(1, 10)].is_current
    assert rows[(1, 20)].valid_to == 30
    assert rows[(1, 30)].valid_to is None and rows[(1, 30)].is_current
    assert rows[(2, 5)].valid_to is None and rows[(2, 5)].is_current
    assert rows[(1, 20)].v == 150.0


def test_scd2_collapses_simultaneous_changes(spark):
    from kevinlang_spark.operators.events import scd2_build

    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 9.0), (1, 20, 2.0)], ["k", "t", "v"]
    )
    out = scd2_build(df, key="k", ts_col="t", value_cols=["v"]).collect()
    assert len(out) == 2  # the two t=10 rows collapse (max value wins)
    first = next(r for r in out if r.valid_from == 10)
    assert first.v == 9.0 and first.valid_to == 20


# --------------------------------------------------------------------- #
# funnel_counts
# --------------------------------------------------------------------- #


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    )


def test_funnel_requires_order(spark):
    from kevinlang_spark.operators.events import funnel_counts

    # u1 completes in order; u2 clicked BEFORE viewing (click must not
    # count); u3 only views
    df = _ev(
        spark,
        [
            (1, 10, 1, "view"), (1, 20, 2, "click"), (1, 30, 3, "purchase"),
            (2, 10, 4, "click"), (2, 20, 5, "view"), (2, 30, 6, "purchase"),
            (3, 10, 7, "view"),
        ],
    )
    out = {
        r.step_name: r.n_users
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_purchase_needs_qualified_click(spark):
    from kevinlang_spark.operators.events import funnel_counts

    # click precedes view, purchase after everything: purchase must NOT
    # count because no click happened at-or-after the first view
    df = _ev(
        spark,
        [(1, 10, 1, "click"), (1, 20, 2, "view"), (1, 30, 3, "purchase")],
    )
    out = {
        r.step_name: r.n_users
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 1, "click": 0, "purchase": 0}


def test_funnel_single_shuffle_plan(spark):
    from kevinlang_spark.operators.events import funnel_counts

    df = _ev(spark, [(1, 10, 1, "view")])
    plan = funnel_counts(df, ["view", "click"])._jdf.queryExecution().executedPlan().toString()
    # windows + per-user groupBy share one hash exchange on user_id; the
    # only other exchange is the single-row global reduce
    assert plan.count("hashpartitioning(user_id") <= 1


# --------------------------------------------------------------------- #
# event_transitions
# --------------------------------------------------------------------- #


def test_transitions_counts_and_entries(spark):
    from kevinlang_spark.operators.events import event_transitions

    df = _ev(
        spark,
        [
            (1, 10, 1, "view"), (1, 20, 2, "click"), (1, 30, 3, "view"),
            (2, 10, 4, "view"), (2, 20, 5, "click"),
        ],
    )
    out = {
        (r.prev_type, r.event_type): r.n
        for r in event_transitions(df).collect()
    }
    assert out[("view", "click")] == 2
    assert out[("click", "view")] == 1
    assert out[(None, "view")] == 2  # one entry row per user


# --------------------------------------------------------------------- #
# budget_sample
# --------------------------------------------------------------------- #


def test_budget_sample_prefix_property(spark):
    from kevinlang_spark.operators.sampling import budget_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", 10 + i % 7) for i in range(200)],
        ["doc_id", "source", "cost"],
    )
    out = budget_sample(
        df, {"a": 100, "b": 55}, group_col="source", cost_col="cost"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, budget in (("a", 100), ("b", 55)):
        total = sum(r.cost for r in by_src[src])
        # realized total is the smallest hash-prefix >= budget
        assert total >= budget
        assert total - max(r.cost for r in by_src[src]) < budget
    # dropped group stays dropped
    out2 = budget_sample(
        df, {"a": 100}, group_col="source", cost_col="cost"
    ).collect()
    assert {r.source for r in out2} == {"a"}


def test_budget_sample_deterministic(spark):
    from kevinlang_spark.operators.sampling import budget_sample

    df = spark.createDataFrame(
        [(i, "s", 5) for i in range(100)], ["doc_id", "source", "cost"]
    )
    a = {r.doc_id for r in budget_sample(df, {"s": 50}, "source", "cost").collect()}
    b = {
        r.doc_id
        for r in budget_sample(
            df.repartition(7), {"s": 50}, "source", "cost"
        ).collect()
    }
    assert a == b and len(a) == 10


# --------------------------------------------------------------------- #
# winsorize
# --------------------------------------------------------------------- #


def test_winsorize_clips_to_exact_quantiles(spark):
    import numpy as np

    from kevinlang_spark.operators.stats import winsorize

    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)], ["id", "v"])
    out = winsorize(df, "v", lower=0.05, upper=0.95).collect()
    lo = float(np.percentile(vals, 5))
    hi = float(np.percentile(vals, 95))
    for r in out:
        assert r.v_wins == min(max(r.v, lo), hi)
    assert min(r.v_wins for r in out) == lo
    assert max(r.v_wins for r in out) == hi


def test_winsorize_grouped(spark):
    from kevinlang_spark.operators.stats import winsorize

    df = spark.createDataFrame(
        [("g1", float(v)) for v in range(11)]
        + [("g2", float(v)) for v in range(100, 1200, 100)],
        ["g", "v"],
    )
    out = winsorize(df, "v", group_col="g", lower=0.0, upper=0.5).collect()
    g1 = [r.v_wins for r in out if r.g == "g1"]
    g2 = [r.v_wins for r in out if r.g == "g2"]
    assert max(g1) == 5.0  # median of 0..10
    assert max(g2) == 600.0  # median of 100..1100


# --------------------------------------------------------------------- #
# inverted_index
# --------------------------------------------------------------------- #


def test_inverted_index_bounded_postings(spark):
    from kevinlang_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(i, "common special" if i < 3 else "common") for i in range(50)],
        ["doc_id", "text"],
    )
    out = {r.term: r for r in inverted_index(docs, min_df=2, max_postings=5).collect()}
    assert out["common"].df == 50
    # postings capped at 5 smallest doc ids despite df=50
    assert out["common"].postings == "0,1,2,3,4"
    assert out["special"].df == 3
    assert out["special"].postings == "0,1,2"


def test_inverted_index_min_df_filters(spark):
    from kevinlang_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, "alpha beta")], ["doc_id", "text"]
    )
    terms = {r.term for r in inverted_index(docs, min_df=3).collect()}
    assert terms == {"alpha"}


# --------------------------------------------------------------------- #
# write_zorder
# --------------------------------------------------------------------- #


def test_zorder_files_are_2d_local(spark, tmp_path):
    """Every z-ordered output file must cover a small bounding box in
    BOTH dimensions — a single-column sort leaves the second dimension's
    per-file span at ~full range."""
    from kevinlang_spark.sources.parquet import write_range_sorted, write_zorder

    import random

    n = 4096
    side = 64
    rng = random.Random(7)
    df = spark.createDataFrame(
        [(i % side, rng.randrange(side)) for i in range(n)],
        ["x", "y"],
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zorder(df, zpath, ["x", "y"], num_files=16)
    write_range_sorted(df, spath, ["x"], num_files=16)

    def mean_spans(path):
        xs_spans, ys_spans = [], []
        for f in glob.glob(f"{path}/*.parquet"):
            t = pq.read_table(f)
            if t.num_rows == 0:
                continue
            xs = t.column("x").to_pylist()
            ys = t.column("y").to_pylist()
            xs_spans.append((max(xs) - min(xs)) / side)
            ys_spans.append((max(ys) - min(ys)) / side)
        return (
            sum(xs_spans) / len(xs_spans),
            sum(ys_spans) / len(ys_spans),
        )

    zx, zy = mean_spans(zpath)
    sx, sy = mean_spans(spath)
    # x-sort: x tightly bounded but y spans ~the full range per file —
    # a y-filter prunes nothing.  z-order: BOTH dims bounded, so min/max
    # stats prune on either dimension.
    assert sy > 0.8
    assert zx < 0.6 and zy < 0.6
    assert zy < sy * 0.7


def test_zorder_constant_column_safe(spark, tmp_path):
    from kevinlang_spark.sources.parquet import write_zorder

    df = spark.createDataFrame([(1, i) for i in range(100)], ["c", "y"])
    write_zorder(df, str(tmp_path / "zc"), ["c", "y"], num_files=2)
    back = spark.read.parquet(str(tmp_path / "zc"))
    assert back.count() == 100
    assert set(back.columns) == {"c", "y"}


# --------------------------------------------------------------------- #
# merge_intervals / time_weighted_avg
# --------------------------------------------------------------------- #


def test_merge_intervals_islands(spark):
    from kevinlang_spark.operators.events import merge_intervals

    rows = [
        # [0,10) [5,20) [20,25) overlap/adjacent? 20 > max_end(20)? no ->
        # contained chain merges [0,20); [20,25) has s=20 == pme=20 -> same
        # island (adjacent touches merge)
        (1, 0, 10), (1, 5, 20), (1, 20, 25),
        (1, 40, 50),            # gap -> new island
        (1, 41, 43),            # contained in [40,50)
        (2, 0, 5),
    ]
    df = spark.createDataFrame(rows, ["k", "start", "end"])
    out = {
        (r.k, r.island_start): (r.island_end, r.n_merged)
        for r in merge_intervals(df, key="k").collect()
    }
    assert out[(1, 0)] == (25, 3)
    assert out[(1, 40)] == (50, 2)
    assert out[(2, 0)] == (5, 1)
    assert len(out) == 3


def test_merge_intervals_contained_does_not_split(spark):
    from kevinlang_spark.operators.events import merge_intervals

    # second interval ends BEFORE the running max end: a naive lag(end)
    # (instead of cumulative max) would wrongly break the island at s=30
    rows = [(1, 0, 100), (1, 10, 20), (1, 30, 40)]
    df = spark.createDataFrame(rows, ["k", "start", "end"])
    out = merge_intervals(df, key="k").collect()
    assert len(out) == 1
    assert (out[0].island_start, out[0].island_end, out[0].n_merged) == (0, 100, 3)


def test_twap_weights_by_holding_period(spark):
    from kevinlang_spark.operators.events import time_weighted_avg

    # value 10 held for 90s, value 100 held for 10s, final value ignored
    # (no holding period): twap = (10*90 + 100*10) / 100 = 19
    rows = [(1, 0.0, 10.0), (1, 90.0, 100.0), (1, 100.0, 7.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = time_weighted_avg(df, key="k").collect()[0]
    assert out.twap == pytest.approx(19.0)
    assert out.n_obs == 3


def test_twap_single_observation(spark):
    from kevinlang_spark.operators.events import time_weighted_avg

    df = spark.createDataFrame([(1, 5.0, 42.0)], ["k", "ts", "value"])
    out = time_weighted_avg(df, key="k").collect()[0]
    assert out.twap == 42.0 and out.n_obs == 1


def test_markov_attribution_removal_effects(spark):
    """Hand-computed chain: journeys view->click->CONV, view->NULL,
    click->CONV, direct CONV.  Base conv 0.75; removing click leaves
    only the direct 0.25 path (effect 2/3); removing view keeps
    click's 0.25 (effect 1/3)."""
    import datetime

    from kevinlang_spark.operators.events import markov_attribution

    t0 = datetime.datetime(2024, 1, 1)
    rows = []

    def ev(i, u, ty, k):
        rows.append((i, t0 + datetime.timedelta(minutes=k), u, ty))

    ev(1, 1, "view", 0); ev(2, 1, "click", 1); ev(3, 1, "purchase", 2)
    ev(4, 2, "view", 0)
    ev(5, 3, "click", 0); ev(6, 3, "purchase", 1)
    ev(7, 4, "purchase", 0)
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    out = {r.channel: r for r in markov_attribution(df).collect()}
    assert out["click"].conv_base == 0.75
    assert out["click"].conv_without == 0.25
    assert out["click"].removal_effect == 0.666667
    assert out["view"].removal_effect == 0.333333
    import pytest as _pytest

    with _pytest.raises(ValueError):
        markov_attribution(df, iterations=0)
