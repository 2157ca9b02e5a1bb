"""Round-2 regression tests for the judge/advisor findings:

- merge(): USING-key coalescing on full/right joins with overlapping
  non-key columns (ADVICE high, frame.py merge)
- merge(): semi/anti joins with overlapping columns (ADVICE medium)
- pivot state cleared by every combinator (reference Combinator.hs
  stamps Nothing for TitleTrees in sort/take/drop/head/tail/init/last/
  filter/groupby — ADVICE low)
- ordered append renumbers by offset, not an un-partitioned window
  (VERDICT item 4)
- init/last plan as distributed filters, not count-then-limit
  (VERDICT item 7)
- asof_join with a (key, ts)-only right frame (ADVICE low)
- pivot_table / render on dotted column names (ADVICE low)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.frame import KevinFrame


def _kf(spark, rows, schema, ordered=True):
    return KevinFrame.from_df(spark.createDataFrame(rows, schema), ordered=ordered)


# --------------------------------------------------------------------- #
# merge: full/right joins keep right-only keys; semi/anti work with dups
# --------------------------------------------------------------------- #


def test_merge_full_outer_keeps_right_only_keys(spark):
    left = _kf(spark, [(1, "a")], "k int, name string")
    right = _kf(spark, [(1, "x"), (9, "w")], "k int, name string")
    out = left.merge(right, on="k", how="full")
    rows = {r["k"]: r for r in out.to_df().collect()}
    assert set(rows) == {1, 9}, "right-only row must keep its join key"
    assert rows[9]["name_r"] == "w"
    assert rows[9]["name"] is None
    assert rows[1]["name"] == "a" and rows[1]["name_r"] == "x"


def test_merge_right_join_keeps_right_only_keys(spark):
    left = _kf(spark, [(1, "a")], "k int, name string")
    right = _kf(spark, [(1, "x"), (9, "w")], "k int, name string")
    out = left.merge(right, on="k", how="right")
    rows = {r["k"]: r for r in out.to_df().collect()}
    assert set(rows) == {1, 9}
    assert rows[9]["name"] is None and rows[9]["name_r"] == "w"


def test_merge_semi_anti_with_overlapping_columns(spark):
    left = _kf(spark, [(1, "a"), (2, "b")], "k int, name string")
    right = _kf(spark, [(1, "x")], "k int, name string")
    semi = left.merge(right, on="k", how="semi")
    assert semi.columns == ["k", "name"]
    assert [r["k"] for r in semi.to_df().collect()] == [1]
    anti = left.merge(right, on="k", how="anti")
    assert anti.columns == ["k", "name"]
    assert [r["k"] for r in anti.to_df().collect()] == [2]


def test_merge_multi_key_full_outer(spark):
    left = _kf(spark, [(1, 10, "a")], "k1 int, k2 int, v string")
    right = _kf(spark, [(1, 10, "x"), (2, 20, "y")], "k1 int, k2 int, v string")
    out = left.merge(right, on=["k1", "k2"], how="full")
    rows = {(r["k1"], r["k2"]): r for r in out.to_df().collect()}
    assert set(rows) == {(1, 10), (2, 20)}
    assert rows[(2, 20)]["v_r"] == "y" and rows[(2, 20)]["v"] is None


# --------------------------------------------------------------------- #
# pivot state: every combinator exits pivot form
# --------------------------------------------------------------------- #


@pytest.fixture()
def pivoted(simple_frame):
    return simple_frame.cast(["city"], ["gender"], "sum", "sale")


def test_pivot_cleared_by_combinators(pivoted):
    assert pivoted.pivot is not None
    assert pivoted.sort("city").pivot is None
    assert pivoted.sort("no_such_field").pivot is None  # fallback also clears
    assert pivoted.take(2).pivot is None
    assert pivoted.drop(0).pivot is None
    assert pivoted.drop(1).pivot is None
    assert pivoted.head().pivot is None
    assert pivoted.tail().pivot is None
    assert pivoted.init().pivot is None
    assert pivoted.last().pivot is None
    assert pivoted.filter("sale", lambda c: c > 0).pivot is None
    assert pivoted.groupby("city").pivot is None


def test_pivot_cleared_height_semantics(pivoted):
    # after sort, height() counts ROWS of the long frame, not row-tree
    # leaves (reference: sorting a crosstab flattens it)
    sorted_kf = pivoted.sort("city")
    assert sorted_kf.height() == sorted_kf.df.count()


# --------------------------------------------------------------------- #
# ordered append: no un-partitioned window in the plan
# --------------------------------------------------------------------- #


def test_append_plan_has_no_window(simple_frame):
    out = simple_frame.append(simple_frame)
    plan = out.df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, "ordered append must not use a global window"
    # order semantics preserved: left rows first, then right rows
    sales = [r["sale"] for r in out.select("sale").collect()]
    assert sales[:13] == sales[13:]


def test_append_after_sort_orders_correctly(simple_frame):
    # a pending sort on either side must resolve before the offset union
    a = simple_frame.sort("sale").take(3)
    out = a.append(a)
    sales = [r["sale"] for r in out.select("sale").collect()]
    assert sales == sorted(sales[:3]) + sorted(sales[3:])


# --------------------------------------------------------------------- #
# init/last: distributed-filter plans
# --------------------------------------------------------------------- #


def test_init_last_semantics(simple_frame):
    ordered = simple_frame.sort("sale")
    sales = [r["sale"] for r in ordered.select("sale").collect()]
    init_sales = [r["sale"] for r in ordered.init().select("sale").collect()]
    last_sales = [r["sale"] for r in ordered.last().select("sale").collect()]
    assert init_sales == sales[:-1]
    assert last_sales == [sales[-1]]


def test_init_plan_is_filter_not_limit(simple_frame):
    plan = simple_frame.init().df._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit" not in plan and "Offset" not in plan
    assert "Filter" in plan


# --------------------------------------------------------------------- #
# asof_join: right frame with only (key, ts)
# --------------------------------------------------------------------- #


def test_asof_join_key_ts_only_right(spark):
    from kevinlang_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2")], "k string, ts long, pay string"
    )
    right = spark.createDataFrame([("a", 5), ("a", 15)], "k string, ts long")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    rows = {r["pay"]: r for r in out.collect()}
    assert rows["L1"]["ts_right"] == 5
    assert rows["L2"]["ts_right"] == 15


# --------------------------------------------------------------------- #
# dotted column names through pivot_table / render
# --------------------------------------------------------------------- #


def test_pivot_table_dotted_columns(spark, tmp_path):
    from kevinlang_spark.sources.csv import read_csv

    p = tmp_path / "dotted.csv"
    p.write_text(
        "a.x,b.y,val\n"
        "r1,c1,1\n"
        "r1,c2,2\n"
        "r2,c1,3\n"
    )
    kf = read_csv(spark, str(p))
    piv = kf.cast(["a.x"], ["b.y"], "sum", "val")
    out = piv.pivot_table()
    vals = {r["a.x"]: r for r in out.collect()}
    assert vals["r1"]["c1"] == 1.0
    rendered = piv.render()
    assert "r1" in rendered and "c1" in rendered
