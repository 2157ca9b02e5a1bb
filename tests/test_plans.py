"""Plan-quality gates: the physical plans our 100 TB design depends on.

These tests pin the properties that make the engine scale — if a future
change silently turns a broadcast join into a shuffle, un-pushes a filter,
or widens a scan, they fail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from kevinlang_spark import plans


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_flagship_broadcasts_all_dims(spark, sf):
    df = entrymod.q_revenue_by_nation(spark, sf)
    plans.assert_broadcast_join(df, at_least=3)  # orders, customer, nation
    plans.assert_no_cartesian(df)
    plans.assert_whole_stage_codegen(df)


def test_flagship_prunes_lineitem_scan(spark, sf):
    df = entrymod.q_revenue_by_nation(spark, sf)
    # lineitem has 11 columns; the query needs 3
    plans.assert_columns_pruned(df, "lineitem", 3)


def test_q1_filter_pushed_to_scan(spark, sf):
    df = entrymod.q_tpch_q1(spark, sf)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pushed, pushed


def test_select_projection_reaches_scan(spark, sf):
    df = entrymod.q_select(spark, sf)
    plans.assert_columns_pruned(df, "lineitem", 3)


def test_filter_pushdown_through_kevinframe(spark, sf):
    """KevinFrame.filter predicates must reach PushedFilters — the wrapper
    adds no barrier between Catalyst and the scan."""
    df = entrymod.q_filter(spark, sf)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_quantity" in pushed and "l_returnflag" in pushed, pushed


def test_topk_is_take_ordered(spark, sf):
    plan = plans.executed_plan(entrymod.q_sort_take(spark, sf))
    assert "TakeOrderedAndProject" in plan, plan


def test_no_python_udfs_in_core_queries(spark, sf):
    """Reference-surface queries must stay entirely JVM-side."""
    for name in ("q_groupby_sum", "q_tpch_q1", "q_knn_cosine", "q_text_stats"):
        plan = plans.executed_plan(entrymod.queries()[name](spark, sf))
        assert "EvalPython" not in plan, f"{name} runs Python:\n{plan}"


def test_dedup_joins_never_nested_loop(spark, sf):
    for name in ("q_minhash_pairs", "q_simhash_pairs", "q_ngram_jaccard"):
        plans.assert_no_cartesian(entrymod.queries()[name](spark, sf))


def test_aggregate_output_order_needs_no_window(spark, sf):
    """groupby+aggregate carries its ascending-key order as a lazy spec —
    the plan must contain no Window operator."""
    plan = plans.executed_plan(entrymod.q_groupby_sum(spark, sf))
    assert "Window" not in plan, plan


def test_tpch_suite_no_cartesian_no_python(spark, sf):
    """The full TPC-H-derived suite must stay JVM-side and never fall
    back to a nested-loop join — the OR-of-conjuncts in q19 and the
    inequality semi/anti probes in q21 are the shapes most at risk."""
    for name in (
        "q_tpch_q2",
        "q_tpch_q7",
        "q_tpch_q8",
        "q_tpch_q9",
        "q_tpch_q11",
        "q_tpch_q15",
        "q_tpch_q16",
        "q_tpch_q17",
        "q_tpch_q19",
        "q_tpch_q20",
        "q_tpch_q21",
    ):
        df = entrymod.queries()[name](spark, sf)
        plan = plans.executed_plan(df)
        assert "EvalPython" not in plan, f"{name} runs Python:\n{plan}"
        assert "CartesianProduct" not in plan, f"{name} cartesian:\n{plan}"


def test_tpch_q2_window_is_partitioned(spark, sf):
    """q2's correlated-min window must partition by part — a global
    (unpartitioned) window would serialize the whole table through one
    task at scale."""
    plan = plans.executed_plan(entrymod.q_tpch_q2(spark, sf))
    assert "Window" in plan, plan
    import re

    for m in re.finditer(r"partitionBy=\[\]", plan):
        raise AssertionError(f"unpartitioned window in q2:\n{plan}")


def test_tpch_q9_broadcasts_part_filter(spark, sf):
    """q9's %red% part filter must broadcast into the lineitem join so
    the fact scan never shuffles non-matching rows."""
    plans.assert_broadcast_join(entrymod.q_tpch_q9(spark, sf), at_least=2)


def test_window_rank_uses_group_limit_pushdown(spark, sf):
    """rank<=k filters must trigger WindowGroupLimit (Spark 3.5+): each
    partition pre-prunes to its top-k BEFORE the shuffle+sort, so a
    top-3-per-group over 10^12 rows shuffles ~3·groups rows, not the
    table."""
    plan = plans.executed_plan(entrymod.q_window_rank(spark, sf))
    assert "WindowGroupLimit" in plan, plan


def test_profile_is_single_scan_no_expand(spark, sf):
    """All-column profiling must stay one aggregation over one scan."""
    plan = plans.executed_plan(entrymod.q_profile(spark, sf))
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" not in plan, plan


def test_scd2_single_key_exchange(spark, sf):
    """Collapse groupBy + lead window must share ONE user hash exchange."""
    plan = plans.executed_plan(entrymod.q_scd2(spark, sf))
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_merge_intervals_single_key_exchange(spark, sf):
    plan = plans.executed_plan(entrymod.q_merge_intervals(spark, sf))
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_twap_single_key_exchange(spark, sf):
    plan = plans.executed_plan(entrymod.q_twap(spark, sf))
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_fuzzy_join_prunes_scan(spark, sf):
    """The doc_id<300 filter and 2-column projection must reach the scan."""
    plan = plans.executed_plan(entrymod.q_fuzzy_join(spark, sf))
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,300" in plan, plan


def test_jaccard_prefix_no_nested_loop(spark, sf):
    """The prefix candidate join must extract the token equi-key (with
    id< as residual), never fall back to a nested loop."""
    plan = plans.executed_plan(entrymod.q_jaccard_prefix(spark, sf))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
