"""Reshape semantics: melt (Combinator.hs:78-120), cast (269-276),
pivot state machine (DataFrame.hs:273-283, Combinator.hs:239-267)."""

from __future__ import annotations

import pytest

from kevinlang_spark.errors import KevinPivotError, KevinTypeError, KevinValueError


def test_melt_single(simple_frame):
    out = simple_frame.melt(["city"], ["cost"])
    assert out.columns == ["city", "variable", "value"]
    rows = out.collect()
    assert len(rows) == 13
    assert all(r["variable"] == "cost" for r in rows)
    assert rows[0]["value"] == 244.0


def test_melt_var_major_order(simple_frame):
    # Combinator.hs:102-107 — all rows of var1, then var2, in frame order
    out = simple_frame.melt("city", ["sale", "cost"])
    rows = out.collect()
    assert len(rows) == 26
    assert [r["variable"] for r in rows] == ["sale"] * 13 + ["cost"] * 13
    assert rows[0]["value"] == 1060.0
    assert rows[13]["value"] == 244.0


def test_melt_empty_ids_ok(simple_frame):
    out = simple_frame.melt([], ["cost"])
    assert out.columns == ["variable", "value"]
    assert out.height() == 13


def test_melt_empty_vars_errors(simple_frame):
    with pytest.raises(KevinTypeError):
        simple_frame.melt(["city"], [])


def test_melt_unknown_fields_row_empty(simple_frame):
    # test/Spec.lhs:106
    out = simple_frame.melt(["hehehe"], ["hahaha"])
    assert out.height() == 0
    assert out.columns == ["variable", "value"]


def test_melt_invalid_types(simple_frame):
    with pytest.raises(KevinTypeError):
        simple_frame.melt([1, 2, 3], [4, 5, 6])


def test_melt_traits(simple_frame):
    out = simple_frame.melt(["city"], ["cost"])
    assert out.traits["variable"].role.value == "Dimension"
    assert out.traits["value"].role.value == "Measure"


def test_cast_crosstab(simple_frame):
    kf = simple_frame.cast(["gender"], ["product"], "sum", "sale")
    assert kf.pivot is not None
    assert kf.pivot.row_fields == ("gender",)
    assert kf.pivot.col_fields == ("product",)
    wide = kf.pivot_table().collect()
    by_gender = {r["gender"]: r for r in wide}
    assert by_gender["F"]["CD"] == 1060 + 1360 + 1807 + 5321 + 3211
    assert by_gender["F"]["mp4"] == 1040 + 3218
    assert by_gender["M"]["CD"] == 5467 + 6544 + 1437
    assert by_gender["M"]["mp4"] == 3245 + 2543 + 5439


def test_cast_guards(simple_frame):
    with pytest.raises(KevinValueError):
        simple_frame.cast(["city"], ["city"], "sum", "sale")
    with pytest.raises(KevinValueError):
        simple_frame.cast(["sale"], ["product"], "sum", "sale")


def test_pivot_state_machine(simple_frame):
    kf = simple_frame.groupby(["gender", "product"]).aggregate("sum", "sale")
    p = kf.to_pivot("sale")
    assert p.pivot.row_fields == ("gender", "product")
    assert p.pivot.col_fields == ()
    p2 = p.unstack("product")
    assert p2.pivot.row_fields == ("gender",)
    assert p2.pivot.col_fields == ("product",)
    p3 = p2.stack("product")
    assert p3.pivot.row_fields == ("gender", "product")
    assert p3.pivot.col_fields == ()
    back = p3.from_pivot()
    assert back.pivot is None


def test_pivot_errors(simple_frame):
    kf = simple_frame.groupby(["gender"]).aggregate("sum", "sale")
    with pytest.raises(KevinPivotError):
        kf.stack("gender")  # not in pivot form
    p = kf.to_pivot("sale")
    with pytest.raises(KevinPivotError):
        p.stack("gender")  # gender is in the ROW tree, not col
    with pytest.raises(KevinPivotError):
        p.unstack("nope")


def test_pivot_size(simple_frame):
    # Combinator.hs:278-291 — pivot sizes are title-tree leaf counts
    p = simple_frame.cast(["gender"], ["product"], "sum", "sale")
    assert p.height() == 2  # F, M
    assert p.width() == 2  # CD, mp4
