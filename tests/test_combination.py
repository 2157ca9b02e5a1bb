"""append (Combinator.hs:317-337), positional join (339-360), and the
relational merge extension."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.errors import KevinValueError


def test_append_self(simple_frame):
    out = simple_frame.append(simple_frame)
    assert out.height() == 26
    rows = out.select("sale").collect()
    # left's rows first, then right's (renumbered)
    assert rows[0]["sale"] == 1060.0
    assert rows[13]["sale"] == 1060.0


def test_append_respects_views(simple_frame):
    # only visible rows of each side are kept (Combinator.hs:330-333)
    a = simple_frame.take(2)
    b = simple_frame.drop(11)
    out = a.append(b)
    assert out.height() == 4


def test_append_column_order_insensitive(simple_frame):
    # same (name, traits) sets in different order is OK; output order = left's
    reordered = simple_frame.select(
        ["discount", "cost", "sale", "year", "product", "city", "gender"]
    )
    out = simple_frame.append(reordered)
    assert out.height() == 26
    assert out.columns == simple_frame.columns


def test_append_mismatch_errors(simple_frame):
    with pytest.raises(KevinValueError):
        simple_frame.append(simple_frame.select(["city", "cost"]))


def test_positional_join(simple_frame):
    # i-th row glued to i-th row — NOT a relational join (Combinator.hs:339-360)
    left = simple_frame.select(["city"])
    right = simple_frame.select(["cost"])
    out = left.join(right)
    assert out.columns == ["city", "cost"]
    rows = out.collect()
    assert len(rows) == 13
    assert (rows[0]["city"], rows[0]["cost"]) == ("hangzhou", 244.0)
    assert (rows[12]["city"], rows[12]["cost"]) == ("beijing", 541.0)


def test_positional_join_after_sort(simple_frame):
    # join glues by CURRENT order, so sorting one side changes pairing
    left = simple_frame.select(["city"])
    right = simple_frame.sort("cost").select(["cost"])
    rows = left.join(right).collect()
    assert rows[0]["cost"] == 244.0  # smallest cost pairs with first city
    assert rows[12]["cost"] == 872.0


def test_positional_join_height_mismatch(simple_frame):
    with pytest.raises(KevinValueError):
        simple_frame.join(simple_frame.take(5))


def test_positional_join_duplicate_names(simple_frame):
    out = simple_frame.select(["city"]).join(simple_frame.select(["city"]))
    assert out.columns == ["city", "city_r"]
    rows = out.collect()
    assert all(r["city"] == r["city_r"] for r in rows)


def test_merge_relational(spark, sf_dir):
    from kevinlang_spark.sources.parquet import read_parquet

    nation = read_parquet(spark, f"{sf_dir}/nation.parquet")
    region = read_parquet(spark, f"{sf_dir}/region.parquet")
    out = nation.merge(
        region,
        on=nation.df.n_regionkey == region.df.r_regionkey,
        broadcast_other=True,
    )
    assert out.height() == 25
    assert "r_name" in out.columns
