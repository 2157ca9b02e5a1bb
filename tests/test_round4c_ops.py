"""Round-4c operators: global line dedup, CDC apply, interval overlap
join, target encoding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.plans.inspect import executed_plan


# --------------------------------------------------------------------- #
# line_dedup
# --------------------------------------------------------------------- #


def test_line_dedup_first_occurrence_wins(spark):
    from kevinlang_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),  # beta repeats → dropped here
            (3, "delta\nalpha\nepsilon"),  # both repeats dropped
        ],
        "doc_id bigint, text string",
    )
    got = {r.id: r for r in line_dedup(df).collect()}
    assert got[1].text_dedup == "alpha\nbeta\ngamma"
    assert got[2].text_dedup == "delta"
    assert got[3].text_dedup == "epsilon"
    assert (got[3].n_lines_kept, got[3].n_lines_total) == (1, 3)


def test_line_dedup_within_doc_repeat(spark):
    from kevinlang_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(7, "same\nsame\nsame\nother")], "doc_id bigint, text string"
    )
    (r,) = line_dedup(df).collect()
    # repeats inside one document dedup too; order preserved
    assert r.text_dedup == "same\nother"
    assert (r.n_lines_kept, r.n_lines_total) == (2, 4)


def test_line_dedup_whitespace_and_empty(spark):
    from kevinlang_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "  x  \n\n   \ny"), (2, "\n \n")], "doc_id bigint, text string"
    )
    rows = {r.id: r for r in line_dedup(df).collect()}
    # blank lines vanish; lines compare trimmed; all-blank doc → no row
    assert set(rows) == {1}
    assert rows[1].text_dedup == "x\ny"


# --------------------------------------------------------------------- #
# apply_cdc
# --------------------------------------------------------------------- #


def _cdc_frames(spark):
    base = spark.createDataFrame(
        [(1, "ann", 10.0), (2, "bob", 20.0), (3, "cat", 30.0)],
        "k bigint, name string, bal double",
    )
    log = spark.createDataFrame(
        [
            # k=1: update then delete (delete wins by seq)
            (1, "ann2", 11.0, 5, "U"),
            (1, "ann3", 12.0, 9, "D"),
            # k=2: delete then re-insert (insert wins)
            (2, "bob", 0.0, 3, "D"),
            (2, "bob2", 25.0, 8, "I"),
            # k=4: brand-new key
            (4, "dan", 40.0, 2, "I"),
        ],
        "k bigint, name string, bal double, seq bigint, op string",
    )
    return base, log


def test_apply_cdc_semantics(spark):
    from kevinlang_spark.operators.incremental import apply_cdc

    base, log = _cdc_frames(spark)
    got = {r.k: r for r in apply_cdc(base, log, ["k"], "seq", "op").collect()}
    assert set(got) == {2, 3, 4}  # 1 deleted, 3 untouched, 4 inserted
    assert (got[2].name, got[2].bal) == ("bob2", 25.0)
    assert (got[3].name, got[3].bal) == ("cat", 30.0)
    assert (got[4].name, got[4].bal) == ("dan", 40.0)


def test_apply_cdc_empty_log_is_identity(spark):
    from kevinlang_spark.operators.incremental import apply_cdc

    base, log = _cdc_frames(spark)
    empty = log.where(F.lit(False))
    got = apply_cdc(base, empty, ["k"], "seq", "op").orderBy("k").collect()
    assert [(r.k, r.name, r.bal) for r in got] == [
        (1, "ann", 10.0), (2, "bob", 20.0), (3, "cat", 30.0)
    ]


# --------------------------------------------------------------------- #
# interval_overlap_join
# --------------------------------------------------------------------- #


def test_interval_overlap_canonical_bucket_dedups(spark):
    from kevinlang_spark.operators.joins import interval_overlap_join

    # both intervals span MANY bins; the pair must appear exactly once
    a = spark.createDataFrame(
        [(1, "u", 0, 1000)], "aid bigint, key string, start bigint, end bigint"
    )
    b = spark.createDataFrame(
        [(9, "u", 500, 2000)], "bid bigint, key string, start bigint, end bigint"
    )
    out = interval_overlap_join(a, b, "key", bin_size=100).collect()
    assert len(out) == 1
    assert (out[0].a_aid, out[0].b_bid) == (1, 9)


def test_interval_overlap_half_open_and_keys(spark):
    from kevinlang_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(1, "u", 0, 100), (2, "u", 100, 200), (3, "v", 0, 100)],
        "aid bigint, key string, start bigint, end bigint",
    )
    b = spark.createDataFrame(
        [(8, "u", 100, 150), (9, "u", 99, 100)],
        "bid bigint, key string, start bigint, end bigint",
    )
    got = sorted(
        (r.a_aid, r.b_bid)
        for r in interval_overlap_join(a, b, "key", bin_size=50).collect()
    )
    # [0,100) does NOT touch [100,150) (half-open); does touch [99,100)
    # different key never matches
    assert got == [(1, 9), (2, 8)]


def test_interval_overlap_join_is_equi(spark):
    from kevinlang_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(1, "u", 0, 100)], "aid bigint, key string, start bigint, end bigint"
    )
    b = spark.createDataFrame(
        [(9, "u", 50, 150)], "bid bigint, key string, start bigint, end bigint"
    )
    plan = executed_plan(interval_overlap_join(a, b, "key", bin_size=100))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------- #
# target_encode
# --------------------------------------------------------------------- #


def test_target_encode_shrinks_rare_categories(spark):
    from kevinlang_spark.operators.stats import target_encode

    df = spark.createDataFrame(
        [("big", 10.0)] * 50 + [("rare", 100.0)],
        "cat string, y double",
    )
    got = {r.cat: r for r in target_encode(df, "cat", "y", alpha=10.0).collect()}
    gmean = (50 * 10.0 + 100.0) / 51
    assert got["big"].n == 50
    assert got["big"].enc == pytest.approx(
        (500.0 + 10 * gmean) / 60.0, abs=1e-4
    )
    # the rare category pulls hard toward the global mean, far from 100
    assert got["rare"].enc == pytest.approx(
        (100.0 + 10 * gmean) / 11.0, abs=1e-4
    )
    assert got["rare"].enc < 30


# --------------------------------------------------------------------- #
# mad_outliers / chi_square
# --------------------------------------------------------------------- #


def test_mad_outliers_not_masked_by_the_outlier(spark):
    from kevinlang_spark.operators.stats import mad_outliers

    # one wild value among tight data: stddev-based z < 3 would mask it
    # (with n=9 the single 1000 inflates sigma to ~331, z ≈ 2.8), MAD
    # flags it
    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 10.2, 11.8, 12.2, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = mad_outliers(df, "g", "v", k=3.0).collect()
    flagged = [r.v for r in out if r.is_outlier]
    assert flagged == [1000.0]


def test_mad_outliers_uniform_has_none(spark):
    from kevinlang_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(100)], "g string, v double"
    )
    out = mad_outliers(df, "g", "v", k=3.0).collect()
    # uniform data: max deviation = 2*MAD, so nothing clears 3*MAD
    assert not any(r.is_outlier for r in out)


def test_chi_square_independent_vs_dependent(spark):
    from kevinlang_spark.operators.stats import chi_square

    # perfectly independent 2x2 (all cells equal) → chi2 = 0
    indep = spark.createDataFrame(
        [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 5 + [("b", "y")] * 5,
        "u string, v string",
    )
    (r,) = chi_square(indep, "u", "v").collect()
    assert (r.chi2, r.dof, r.n) == (0.0, 1, 20)

    # perfectly dependent (v == u) → chi2 = n
    dep = spark.createDataFrame(
        [("a", "a")] * 10 + [("b", "b")] * 10, "u string, v string"
    )
    (r,) = chi_square(dep, "u", "v").collect()
    assert (r.chi2, r.dof, r.n) == (20.0, 1, 20)
