"""Unit semantics for the Bloom membership sketch (sketches.py)."""

import pytest

from kevinlang_spark.operators.sketches import bloom_build, bloom_probe


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k bigint")


def test_no_false_negatives(spark):
    built = list(range(100))
    filt = bloom_build(_keys(spark, built), "k")
    out = {
        r.value: r.maybe_present
        for r in bloom_probe(filt, _keys(spark, built), "k").collect()
    }
    assert all(out[v] for v in built)  # every inserted key reports present


def test_absent_keys_mostly_negative_at_sized_m(spark):
    filt = bloom_build(_keys(spark, range(100)), "k")  # n=100 vs m=16384
    probes = list(range(1000, 1200))
    out = [
        r.maybe_present
        for r in bloom_probe(filt, _keys(spark, probes), "k").collect()
    ]
    # FPR at n=100, m=16384, k=5 is ~1e-8 — expect zero false positives
    assert sum(out) == 0


def test_tiny_filter_saturates_to_false_positives(spark):
    # m=8 bits with 100 keys: every bit set, every probe a false positive
    filt = bloom_build(_keys(spark, range(100)), "k", m=8, k=3)
    assert filt.count() == 8
    out = [
        r.maybe_present
        for r in bloom_probe(filt, _keys(spark, [7777]), "k", m=8, k=3).collect()
    ]
    assert out == [True]


def test_filters_merge_by_row_union(spark):
    a = bloom_build(_keys(spark, range(50)), "k")
    b = bloom_build(_keys(spark, range(50, 100)), "k")
    merged = a.unionByName(b).distinct()
    whole = bloom_build(_keys(spark, range(100)), "k")
    assert sorted(r.bit for r in merged.collect()) == sorted(
        r.bit for r in whole.collect()
    )


def test_nulls_dropped_and_param_guard(spark):
    df = spark.createDataFrame([(1,), (None,)], "k bigint")
    filt = bloom_build(df, "k")
    probed = bloom_probe(filt, df, "k")
    assert probed.count() == 1  # the NULL probe is dropped
    with pytest.raises(ValueError):
        bloom_build(df, "k", m=1)
