"""Fingerprint clustering and FD verification (quality.py)."""

import pytest

from kevinlang_spark.operators.quality import fd_violations, fingerprint_clusters


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_fingerprint_clusters_word_order_variants(spark):
    rows = [
        (1, "Acme Corp"),
        (2, "corp ACME!"),       # same token set -> same fingerprint
        (3, "Acme Corp"),        # exact repeat of 1
        (4, "totally different"),
        (5, None),
    ]
    out = fingerprint_clusters(_docs(spark, rows)).collect()
    assert len(out) == 1
    c = out[0]
    # 3 members across 2 raw variants; canonical = most frequent raw
    assert (c.n_members, c.n_variants, c.canonical) == (3, 2, "Acme Corp")


def test_fingerprint_exact_only_groups_excluded(spark):
    # identical raws collide but are NOT variants -> not a cluster
    rows = [(1, "same text"), (2, "same text")]
    assert fingerprint_clusters(_docs(spark, rows)).count() == 0


def test_fingerprint_canonical_tie_alphabetical(spark):
    rows = [(1, "b a"), (2, "a b")]  # each variant once: tie -> "a b"
    out = fingerprint_clusters(_docs(spark, rows)).collect()
    assert out[0].canonical == "a b"


def test_fd_violations_holds_and_fails(spark):
    df = spark.createDataFrame(
        [(1, "x", "en"), (2, "x", "en"), (3, "y", "en"), (4, "y", "de")],
        "id bigint, src string, lang string",
    )
    ok = fd_violations(df, ["id"], "lang").collect()[0]
    assert ok.holds and ok.n_violating == 0 and ok.n_groups == 4
    bad = fd_violations(df, ["src"], "lang").collect()[0]
    assert not bad.holds
    assert (bad.n_groups, bad.n_violating, bad.max_variants) == (2, 1, 2)
    with pytest.raises(ValueError):
        fd_violations(df, [], "lang")


def test_acf_perfect_periodicity(spark):
    """A period-2 alternating series has ACF(-ish) -1 at lag 1 and +1 at
    lag 2."""
    import datetime

    from kevinlang_spark.operators.anomaly import acf_by_key

    rows = [
        ("a", datetime.datetime(2024, 1, 1, h), float(10 if h % 2 == 0 else 2))
        for h in range(24)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        (r.event_type, r.lag): r.acf
        for r in acf_by_key(df, max_lag=2).collect()
    }
    assert out[("a", 1)] == -1.0
    assert out[("a", 2)] == 1.0


def test_acf_constant_series_null_and_guard(spark):
    import datetime

    import pytest as _pytest

    from kevinlang_spark.operators.anomaly import acf_by_key

    rows = [
        ("c", datetime.datetime(2024, 1, 1, h), 5.0) for h in range(6)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = acf_by_key(df, max_lag=1).collect()
    assert out[0].acf is None  # zero variance: undefined, not 0
    with _pytest.raises(ValueError):
        acf_by_key(df, max_lag=0)
