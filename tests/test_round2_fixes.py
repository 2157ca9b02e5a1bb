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


# --------------------------------------------------------------------- #
# decimal ingestion mode (reference Data.Scientific exactness)
# --------------------------------------------------------------------- #


def test_decimal_mode_exact_sums(spark, tmp_path):
    from decimal import Decimal

    from kevinlang_spark.sources.csv import read_csv

    p = tmp_path / "money.csv"
    # 0.1 summed 10 times drifts in binary doubles (≠ 1.0 exactly at
    # higher repetitions); decimals are exact
    p.write_text("amt\n" + "0.1\n" * 100)
    exact = read_csv(spark, str(p), decimal=True)
    assert str(exact.df.schema["amt"].dataType) == "DecimalType(38,18)"
    got = exact.aggregate("sum", "amt", alias="t").to_df().collect()[0]["t"]
    assert got == Decimal("10.0")
    dbl = read_csv(spark, str(p), decimal=False)
    assert dict(dbl.df.dtypes)["amt"] == "double"
    # double mode still ballpark-correct
    dgot = dbl.aggregate("sum", "amt", alias="t").to_df().collect()[0]["t"]
    assert abs(dgot - 10.0) < 1e-9


def test_decimal_mode_pipeline_ops(spark, tmp_path):
    from kevinlang_spark.sources.csv import read_csv

    p = tmp_path / "dm.csv"
    p.write_text("k,v\na,1.5\nb,2.5\na,3.5\n")
    kf = read_csv(spark, str(p), decimal=True)
    out = {
        r["k"]: r["v"]
        for r in kf.groupby("k").aggregate("sum", "v").to_df().collect()
    }
    assert float(out["a"]) == 5.0 and float(out["b"]) == 2.5


# --------------------------------------------------------------------- #
# PolyParam kind dispatch in filter_udf
# --------------------------------------------------------------------- #


def test_filter_udf_kind_dispatch(simple_frame):
    import pytest

    from kevinlang_spark.errors import KevinTypeError

    # double predicate on numeric column: fine
    assert simple_frame.filter_udf("cost", lambda v: v > 500).height() > 0
    # int predicate on an integral-valued double column: fine (year casts
    # clean); on 'cost' (integral values ingested as double) also fine
    assert simple_frame.filter_udf("cost", lambda v: v > 500, kind="int").height() > 0
    # string predicate on numeric column: plan-time inconsistent type
    with pytest.raises(KevinTypeError):
        simple_frame.filter_udf("cost", lambda v: v == "x", kind="str")
    # numeric predicate on string column: plan-time inconsistent type
    with pytest.raises(KevinTypeError):
        simple_frame.filter_udf("city", lambda v: v > 1, kind="double")


def test_filter_udf_int_on_fractional_errors(simple_frame):
    import pytest

    # 'discount' holds genuine fractions (0.8, 0.75, ...): an Int-kind
    # predicate must fail at evaluation like the reference's
    # toBoundedInteger/fromJust crash (Combinator.hs:176-182)
    with pytest.raises(Exception, match="inconsistent type"):
        simple_frame.filter_udf("discount", lambda v: v > 0, kind="int").height()


def test_filter_udf_word_negative_errors(spark):
    import pytest

    from kevinlang_spark.frame import KevinFrame

    kf = KevinFrame.from_df(
        spark.createDataFrame([(1, -5.0), (2, 3.0)], "id int, v double")
    )
    with pytest.raises(Exception, match="inconsistent type"):
        kf.filter_udf("v", lambda v: v > 0, kind="word").height()
    # int kind tolerates negatives (signed)
    assert kf.filter_udf("v", lambda v: v > 0, kind="int").height() == 1


# --------------------------------------------------------------------- #
# review findings: stable agg __idx, NULL-text dedup, filter_udf edges
# --------------------------------------------------------------------- #


def test_aggregate_idx_stable_across_jobs(simple_frame):
    """init()/last() on an aggregation output must select the same row in
    every job — __idx on shuffle outputs has to be deterministic."""
    agg = simple_frame.groupby("city").aggregate("sum", "sale", alias="t")
    for _ in range(3):
        last = agg.last().to_df().collect()
        assert len(last) == 1 and last[0]["city"] == "shanghai"
        init_cities = sorted(r["city"] for r in agg.init().to_df().collect())
        assert init_cities == ["beijing", "hangzhou"]


def test_null_text_docs_never_pair(spark):
    from kevinlang_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, None),
            (2, None),
            (3, "   "),
            (4, "real content words here repeated real content words here"),
        ],
        "doc_id long, text string",
    )
    mh = dedup.minhash_dedup_pairs(df, threshold=0.5)
    assert mh.count() == 0, "NULL/empty docs must not form minhash pairs"
    sh = dedup.simhash_neardup_pairs(df, max_hamming=3)
    assert sh.count() == 0, "NULL/empty docs must not form simhash pairs"


def test_filter_udf_nan_inf_range(spark):
    import pytest

    from kevinlang_spark.frame import KevinFrame

    kf = KevinFrame.from_df(
        spark.createDataFrame(
            [(1, float("nan")), (2, 1.0)], "id int, v double"
        )
    )
    with pytest.raises(Exception, match="inconsistent type"):
        kf.filter_udf("v", lambda v: True, kind="int").height()
    inf = KevinFrame.from_df(
        spark.createDataFrame([(1, float("inf"))], "id int, v double")
    )
    with pytest.raises(Exception, match="inconsistent type"):
        inf.filter_udf("v", lambda v: True, kind="int").height()
    big = KevinFrame.from_df(
        spark.createDataFrame([(1, 1e30)], "id int, v double")
    )
    with pytest.raises(Exception, match="inconsistent type"):
        big.filter_udf("v", lambda v: True, kind="int").height()


def test_minhash_indexed_family_mismatch_errors(spark, sf_dir, tmp_path):
    import pytest

    from kevinlang_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    idx = str(tmp_path / "mh_small")
    dedup.write_minhash_index(docs, idx, num_hashes=32)
    with pytest.raises(ValueError, match="32-hash"):
        dedup.minhash_dedup_pairs_indexed(spark, idx, num_hashes=64)
