"""Composite combinator chains — the cross-operator interactions the
per-operator tests can't see (order-spec propagation through melt's hidden
column, append after slicing, pivot after filter, etc.)."""

from __future__ import annotations

import pytest

from kevinlang_spark.frame import SortOrder


def test_melt_filter_sort_take_chain(simple_frame):
    out = (
        simple_frame.melt(["city"], ["sale", "cost"])
        .filter("value", lambda v: v > 500)
        .sort("value", SortOrder.DESCENDING)
        .take(3)
    )
    rows = out.collect()
    assert [r["value"] for r in rows] == [6544.0, 5467.0, 5439.0]


def test_melt_then_groupby_aggregate(simple_frame):
    out = (
        simple_frame.melt(["city"], ["sale", "cost"])
        .groupby(["city", "variable"])
        .aggregate("sum", "value")
    )
    got = {(r["city"], r["variable"]): r["value"] for r in out.collect()}
    assert got[("beijing", "sale")] == 5439 + 3211
    assert got[("beijing", "cost")] == 246 + 541


def test_slice_append_slice(simple_frame):
    a = simple_frame.take(3)
    b = simple_frame.drop(10)
    combined = a.append(b)  # 3 + 3 rows
    assert combined.height() == 6
    last = combined.last().collect()[0]
    assert last["sale"] == 3211.0  # the 13th original row
    assert combined.take(1).collect()[0]["sale"] == 1060.0


def test_filter_cast_pivot_chain(simple_frame):
    wide = (
        simple_frame.filter("year", lambda y: y < 2003)
        .cast(["gender"], ["product"], "sum", "sale")
        .pivot_table()
        .collect()
    )
    by_g = {r["gender"]: r for r in wide}
    # 2003 rows excluded: M/CD loses 6544, F/CD loses 5321
    assert by_g["M"]["CD"] == 5467 + 1437
    assert by_g["F"]["CD"] == 1060 + 1360 + 1807 + 3211


def test_sort_survives_select_and_groups(simple_frame):
    out = (
        simple_frame.sort("cost")
        .select(["city", "cost", "sale"])
        .groupby("city")
        .aggregate("concat", "city", alias="trail")
    )
    # concat evaluated in cost order within each city group
    got = {r["city"]: r["trail"] for r in out.collect()}
    assert got["beijing"] == "beijingbeijing"
    assert len(got["hangzhou"]) == len("hangzhou") * 6


def test_double_sort_tiebreak_semantics(simple_frame):
    # sort by product, then by year: rows ordered by (year, product, orig)
    out = simple_frame.sort("product").sort("year").select(["year", "product"])
    rows = [(r["year"], r["product"]) for r in out.collect()]
    assert rows == sorted(rows, key=lambda t: (t[0], t[1] or ""))


def test_positional_join_of_derived_frames(simple_frame):
    # zip the sorted sales against the sorted costs (both derived)
    left = simple_frame.sort("sale").select(["sale"])
    right = simple_frame.sort("cost", SortOrder.DESCENDING).select(["cost"])
    rows = left.join(right).collect()
    assert rows[0]["sale"] == 1040.0 and rows[0]["cost"] == 872.0
    assert rows[-1]["sale"] == 6544.0 and rows[-1]["cost"] == 244.0
