"""Unit semantics for sorted-neighborhood blocking (dedup.py)."""

import pytest

from kevinlang_spark.operators.dedup import sorted_neighborhood_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _brute(rows, key_len, bucket_prefix, window, max_dist):
    """Reference: rank within bucket by (key, id), compare rank gaps
    <= window, Levenshtein-verify."""
    import re

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    keyed = []
    for i, t in rows:
        k = re.sub(r"[^a-z0-9]", "", t.lower())[:key_len]
        if k:
            keyed.append((k[:bucket_prefix], k, i))
    out = set()
    byb = {}
    for b, k, i in keyed:
        byb.setdefault(b, []).append((k, i))
    for b, items in byb.items():
        items.sort()
        for x in range(len(items)):
            for y in range(x + 1, min(x + window + 1, len(items))):
                d = lev(items[x][0], items[y][0])
                if d <= max_dist:
                    ia, ib = items[x][1], items[y][1]
                    out.add((min(ia, ib), max(ia, ib), d))
    return sorted(out)


def test_matches_brute_force_reference(spark):
    rows = [
        (1, "The quick brown fox jumps"),
        (2, "The quick brown fox jumped"),
        (3, "the QUICK brown fox jumps!!"),
        (4, "completely different text about spark"),
        (5, "zzz unrelated documents here"),
        (6, "completely different text about sparks"),
        (7, "the quick brown dog jumps"),
    ]
    got = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(
            _docs(spark, rows), window=3, max_dist=8
        ).collect()
    )
    assert got == _brute(rows, 24, 2, 3, 8)


def test_block_boundary_pairs_are_found(spark):
    # 8 near-identical keys in ONE bucket with window=3: pairs span
    # rank-block boundaries (blocks of width 3), which only the
    # copied-down probe side can see — the regression case.
    rows = [(i, f"aaaa common prefix item {chr(97 + i)}") for i in range(8)]
    got = sorted(
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            _docs(spark, rows), window=3, max_dist=24
        ).collect()
    )
    want = sorted(
        (i, j) for i in range(8) for j in range(i + 1, min(i + 4, 8))
    )
    assert got == want  # every rank gap <= 3, none missed at boundaries


def test_outside_window_not_compared(spark):
    # identical texts but ranks 1 and 5 with window=2: never compared
    rows = [
        (1, "aa target one"),
        (2, "aa bbbbbbbbbbbbbbbbbbbbbb"),
        (3, "aa cccccccccccccccccccccc"),
        (4, "aa dddddddddddddddddddddd"),
        (5, "aa target one"),
    ]
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            _docs(spark, rows), window=2, max_dist=0
        ).collect()
    }
    # ranks: (1,5) sort adjacent (identical keys) so they ARE within 2
    assert (1, 5) in got
    # but nothing pairs the filler rows at distance 0
    assert got == {(1, 5)}


def test_empty_keys_dropped_and_param_guard(spark):
    rows = [(1, "!!!"), (2, "???")]  # keys normalize to empty
    assert (
        sorted_neighborhood_pairs(_docs(spark, rows)).count() == 0
    )
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(_docs(spark, rows), window=0)
