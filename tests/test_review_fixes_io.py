"""Regression tests for the sources/streaming/render/viz review findings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark import viz
from kevinlang_spark.errors import KevinValueError
from kevinlang_spark.frame import KevinFrame
from kevinlang_spark.sources.csv import read_csv
from kevinlang_spark.traits import DataRole


def test_render_nan_and_inf(spark):
    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, 1.5)], ["k", "v"]
    )
    out = KevinFrame.from_df(df).render()
    assert "nan" in out and "inf" in out and "1.5" in out


def test_csv_dotted_headers(spark, tmp_path):
    p = tmp_path / "dots.csv"
    p.write_text("total.sales,name\n100,x\n200,y\n")
    kf = read_csv(spark, str(p))
    assert kf.traits["total.sales"].role == DataRole.MEASURE
    assert kf.height() == 2


def test_dotted_names_through_all_combinators(spark, tmp_path):
    from kevinlang_spark.frame import SortOrder

    p = tmp_path / "dots2.csv"
    p.write_text("total.sales,region.name\n100,east\n250,west\n150,east\n")
    kf = read_csv(spark, str(p))
    assert kf.groupby("region.name").aggregate("sum", "total.sales").height() == 2
    assert kf.melt(["region.name"], ["total.sales"]).height() == 3
    assert kf.filter("total.sales", lambda c: c > 120).height() == 2
    assert (
        kf.sort("total.sales", SortOrder.DESCENDING)
        .select(["region.name"])
        .take(1)
        .collect()[0]["region.name"]
        == "west"
    )
    assert kf.append(kf).height() == 6
    zipd = kf.select(["region.name"]).join(kf.select(["total.sales"]))
    assert zipd.height() == 3


def test_csv_mixed_numeric_string_strict_errors(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text("a\nabc\n123\n")
    with pytest.raises(KevinValueError, match="Invalid data"):
        read_csv(spark, str(p))
    kf = read_csv(spark, str(p), strict=False)
    assert kf.traits["a"].ktype.value == "Text"


def test_csv_year_rule_exact_case(spark, tmp_path):
    # (separate files: Spark's CSV reader mangles case-duplicate headers)
    p1 = tmp_path / "y1.csv"
    p1.write_text("Year\n2001\n2002\n")
    p2 = tmp_path / "y2.csv"
    p2.write_text("year\n2001\n2002\n")
    # exact-name match only (reference DataFrame.hs:226-228)
    assert read_csv(spark, str(p1)).traits["Year"].role == DataRole.MEASURE
    assert read_csv(spark, str(p2)).traits["year"].role == DataRole.DIMENSION


def test_pivot_duplicate_cell_errors(simple_frame):
    # pivot form over NON-aggregated data with clashing (row, col) paths →
    # reference raises instead of silently picking one value
    p = simple_frame.to_pivot("sale").unstack("product").unstack("year")
    p = p._derive(
        p._df,
        pivot=type(p.pivot)(("gender",), ("product",), "sale"),
    )
    with pytest.raises(KevinValueError, match="many values"):
        p.render()


def test_pivot_cell_and_header_formats(simple_frame):
    # cells: plain Scientific show (trailing .0); headers: numeric → 0-dec
    kf = simple_frame.cast(["gender"], ["year"], "sum", "sale")
    out = kf.render()
    lines = out.splitlines()
    assert lines[0].split() == ["year", "2001", "2002", "2003"]  # 0-dec headers
    assert "12759.0" not in lines[0]
    body = "\n".join(lines[2:])
    assert ".0" in body  # cells keep the trailing .0


def test_viz_jitter_emits_transform(simple_frame):
    m = viz.jitter(viz.point(viz.linear("sale"), viz.linear("cost")))
    spec = viz.with_frame(simple_frame, m)
    assert spec["transform"] == [{"calculate": "random()", "as": "__jitter"}]
    assert spec["encoding"]["yOffset"]["field"] == "__jitter"
    assert spec["mark"]["opacity"] == 0.7
