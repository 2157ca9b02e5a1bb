"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.errors import KevinFieldError, KevinPivotError
from kevinlang_spark.frame import KevinFrame, SortOrder


def test_select_after_sort_drops_spec_column(simple_frame):
    # sort by a column, then project it away — order must survive
    out = simple_frame.sort("cost").select(["city"])
    cities = [r["city"] for r in out.collect()]
    assert cities[0] == "hangzhou"  # cost 244
    assert cities[-1] == "shanghai"  # cost 872
    # slicing still works on the projected frame: 2nd-cheapest is beijing (246)
    assert out.take(2).collect()[1]["city"] == "beijing"
    # stable sort on cost: ties keep ORIGINAL row order (hangzhou's 541 at
    # row 5 precedes beijing's 541 at row 13)
    original = [
        (244, "hangzhou"), (545, "hangzhou"), (322, "hangzhou"), (446, "hangzhou"),
        (541, "hangzhou"), (321, "hangzhou"), (655, "shanghai"), (741, "shanghai"),
        (336, "shanghai"), (437, "shanghai"), (872, "shanghai"), (246, "beijing"),
        (541, "beijing"),
    ]
    expected = [c for _, c in sorted(original, key=lambda t: t[0])]
    assert cities == expected


def test_melt_after_sort_on_var_column(simple_frame):
    # the sort column does not survive the unpivot — must not crash, and
    # melt's row order must follow the sorted order
    out = simple_frame.sort("cost").melt(["city"], ["sale"])
    rows = out.collect()
    assert len(rows) == 13
    assert rows[0]["value"] == 1060.0  # cost 244 row carries sale 1060


def test_merge_disambiguates_overlapping_columns(spark):
    a = KevinFrame.from_df(
        spark.createDataFrame([(1, "x")], ["k", "note"]), ordered=False
    )
    b = KevinFrame.from_df(
        spark.createDataFrame([(1, "y")], ["k", "note"]), ordered=False
    )
    out = a.merge(b, on="k")
    assert sorted(out.columns) == ["k", "note", "note_r"]
    r = out.df.collect()[0]
    assert (r["note"], r["note_r"]) == ("x", "y")


def test_pivot_key_null_and_separator_safety(spark):
    df = spark.createDataFrame(
        [("r", "a", None, 1.0), ("r", None, "a", 2.0)], ["row", "c1", "c2", "v"]
    )
    kf = KevinFrame.from_df(df, ordered=False)
    agg = kf.groupby(["row", "c1", "c2"]).aggregate("sum", "v")
    wide = agg.to_pivot("v").unstack("c1").unstack("c2").pivot_table()
    # ('a', NULL) and (NULL, 'a') must be DISTINCT pivot columns
    assert len(wide.columns) == 3, wide.columns


def test_pivot_width_guard(simple_frame):
    kf = simple_frame.cast(["gender"], ["sale"], "sum", "cost")
    with pytest.raises(KevinPivotError, match="modeling error"):
        kf.pivot_table(max_distinct=3)


def test_cast_unknown_field_fails_fast(simple_frame):
    with pytest.raises(KevinFieldError):
        simple_frame.cast(["city"], ["typo_col"], "sum", "sale")


def test_slicing_on_pivot_frame_uses_row_units(simple_frame):
    p = simple_frame.cast(["gender"], ["product"], "sum", "sale")
    assert p.height() == 2  # leaf count (reference semantics)
    # last() operates on the 4 underlying (gender, product) rows
    assert p.last()._df.count() == 1


def test_aggregate_trait_follows_output_dtype(simple_frame):
    out = simple_frame.groupby("product").aggregate("max", "city")
    assert out.traits["city"].ktype.value == "Text"
    # and appending two such frames passes the trait-equality check
    assert out.append(out).height() == 4


def test_global_transform_has_no_unpartitioned_window(simple_frame):
    out = simple_frame.transform_grouped("mean", "sale", alias="m")
    plan = out._df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert out.collect()[0]["m"] == pytest.approx(41692 / 13)
