"""Property-based models for the round-12 second-wave operators:
random inputs against plain-Python references (hypothesis, bounded
examples)."""

from __future__ import annotations

import math
import statistics

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401


@settings(max_examples=6, deadline=None)
@given(
    rewards=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 999)),
        min_size=1, max_size=24,
    ),
)
def test_grpo_advantages_matches_statistics(spark, rewards):
    from kevinlang_spark.operators.preference import grpo_advantages

    rows = [(p, i, r) for i, (p, r) in enumerate(rewards)]
    df = spark.createDataFrame(
        rows, "prompt_id long, cand_id long, reward long"
    )
    out = {(r["prompt_id"], r["cand_id"]): r for r in grpo_advantages(df).collect()}
    from collections import defaultdict

    groups = defaultdict(list)
    for p, i, r in rows:
        groups[p].append((i, r))
    for p, members in groups.items():
        rs = [r for _, r in members]
        mu = statistics.mean(rs)
        sd = statistics.pstdev(rs)
        for i, r in members:
            got = out[(p, i)]
            assert got["mean_reward"] == pytest.approx(mu)
            if sd > 0:
                assert got["advantage"] == pytest.approx((r - mu) / sd)
            else:
                assert got["advantage"] == 0.0
            if len(rs) >= 2:
                loo = r - (sum(rs) - r) / (len(rs) - 1)
                assert got["advantage_loo"] == pytest.approx(loo)


@settings(max_examples=6, deadline=None)
@given(
    counts=st.lists(st.integers(1, 5000), min_size=1, max_size=12),
    cap=st.integers(1, 4),
    num=st.integers(1, 3),
    den=st.integers(2, 5),
)
def test_unimax_matches_greedy(spark, counts, cap, num, den):
    from kevinlang_spark.operators.sampling import unimax_weights

    rows = [(f"s{i}", n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = {
        r["source"]: r
        for r in unimax_weights(
            df, epoch_cap=cap, budget_num=num, budget_den=den
        ).collect()
    }
    total = sum(counts)
    B = (total * num) // den
    langs = sorted(rows, key=lambda r: (r[1], r[0]))
    rem = float(B)
    for idx, (g, n) in enumerate(langs):
        fair = rem / (len(langs) - idx)
        alloc = min(fair, float(cap) * n)
        assert out[g]["alloc"] == pytest.approx(alloc, rel=1e-9), g
        rem -= alloc


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 4)),
        min_size=2, max_size=60,
    ),
)
def test_t_closeness_matches_brute_emd(spark, rows):
    from kevinlang_spark.operators.quality import t_closeness

    df = spark.createDataFrame(rows, "q string, s long")
    out = {r["q"]: r for r in t_closeness(df, ["q"], "s").collect()}
    from collections import Counter, defaultdict

    glob = Counter(s for _, s in rows)
    dom = sorted(glob)
    G = sum(glob.values())
    by_g = defaultdict(Counter)
    for g, s in rows:
        by_g[g][s] += 1
    for g, cnt in by_g.items():
        n = sum(cnt.values())
        if len(dom) < 2:
            assert out[g]["emd"] == 0.0
            continue
        cp = cq = emd = 0.0
        for v in dom:
            cp += cnt.get(v, 0) / n
            cq += glob[v] / G
            emd += abs(cp - cq)
        emd /= len(dom) - 1
        assert out[g]["emd"] == pytest.approx(emd), g


@settings(max_examples=6, deadline=None)
@given(
    rels=st.lists(st.integers(0, 3), min_size=1, max_size=12),
    k=st.integers(1, 8),
)
def test_ranking_metrics_match_brute(spark, rels, k):
    from kevinlang_spark.operators.stats import ranking_metrics

    rows = [(1, i + 1, rel) for i, rel in enumerate(rels)]
    df = spark.createDataFrame(rows, "query_id long, rank long, rel long")
    (r,) = ranking_metrics(df, k=k).collect()
    dcg = sum(
        rel / math.log2(i + 2) for i, rel in enumerate(rels) if i < k
    )
    ideal = sorted(rels, reverse=True)[:k]
    idcg = sum(rel / math.log2(i + 2) for i, rel in enumerate(ideal))
    assert r["dcg"] == pytest.approx(dcg)
    assert r["idcg"] == pytest.approx(idcg)
    if idcg > 0:
        assert r["ndcg"] == pytest.approx(dcg / idcg)
    hits = [i + 1 for i, rel in enumerate(rels) if rel > 0]
    if hits:
        assert r["mrr"] == pytest.approx(1.0 / hits[0])
        ap = statistics.mean(
            (j + 1) / rank for j, rank in enumerate(hits)
        )
        assert r["ap"] == pytest.approx(ap)
    else:
        assert r["mrr"] is None and r["ap"] is None


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1000),  # prob in milli-units
            st.booleans(),
        ),
        min_size=1, max_size=50,
    ),
)
def test_calibration_matches_brute(spark, rows):
    from kevinlang_spark.operators.stats import calibration_audit

    data = [(pm / 1000.0, int(y)) for pm, y in rows]
    df = spark.createDataFrame(data, "prob double, label int")
    out = calibration_audit(df).collect()
    N = len(rows)
    brier = sum((pm / 1000.0 - y) ** 2 for pm, y in rows) / N
    from collections import defaultdict

    bins = defaultdict(lambda: [0, 0, 0])  # n, sum_pm, sum_y
    for pm, y in rows:
        b = min(pm * 10 // 1000, 9)
        bins[b][0] += 1
        bins[b][1] += pm
        bins[b][2] += int(y)
    ece = sum(
        abs(sy * 1000 - sp) for _, sp, sy in bins.values()
    ) / (N * 1000)
    for r in out:
        assert r["brier"] == pytest.approx(brier)
        assert r["ece"] == pytest.approx(ece)
        n, sp, sy = bins[r["bin"]]
        assert r["n_obs"] == n
        assert r["frac_pos"] == pytest.approx(sy / n)


@settings(max_examples=6, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=2, max_size=40,
    ),
)
def test_spearman_matches_reference(spark, pairs):
    from kevinlang_spark.operators.stats import spearman_corr

    rows = [("g", float(x), float(y)) for x, y in pairs]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    (r,) = spearman_corr(df, "g", "x", "y").collect()

    def avg_ranks(vals):
        s = sorted(vals)
        return [
            (s.index(v) + 1 + len(s) - s[::-1].index(v)) / 2
            for v in vals
        ]

    xs = [x for x, _ in pairs]
    ys = [y for _, y in pairs]
    if len(set(xs)) < 2 or len(set(ys)) < 2:
        assert r["spearman_rho"] is None
    else:
        rho = statistics.correlation(avg_ranks(xs), avg_ranks(ys))
        assert r["spearman_rho"] == pytest.approx(rho)


@settings(max_examples=5, deadline=None)
@given(
    units=st.lists(
        st.tuples(
            st.booleans(),                      # arm
            st.integers(0, 10000),              # y cents
            st.integers(0, 10000),              # x cents
        ),
        min_size=4, max_size=40,
    ),
)
def test_cuped_matches_brute(spark, units):
    from kevinlang_spark.operators.experiments import cuped_ab_test

    # ensure both arms present
    units = [(True, 100, 50), (False, 80, 40)] + units
    rows = [
        ("treat" if a else "control", y / 100.0, x / 100.0)
        for a, y, x in units
    ]
    df = spark.createDataFrame(rows, "arm string, y double, x double")
    out = {r["arm"]: r for r in cuped_ab_test(df).collect()}
    q = [("treat" if a else "control", y, x) for a, y, x in units]
    N = len(q)
    gsx = sum(x for _, _, x in q)
    gsy = sum(y for _, y, _ in q)
    gsxx = sum(x * x for _, _, x in q)
    gsxy = sum(x * y for _, y, x in q)
    vxp = gsxx * N - gsx * gsx
    th = (gsxy * N - gsx * gsy) / vxp if vxp > 0 else 0.0
    mx = gsx / N
    for arm in ("control", "treat"):
        sub = [(y, x) for a, y, x in q if a == arm]
        n = len(sub)
        sy = sum(y for y, _ in sub)
        sx = sum(x for _, x in sub)
        my = sy / n
        mxa = sx / n
        mya = my - th * (mxa - mx)
        assert out[arm]["theta"] == pytest.approx(th)
        assert out[arm]["mean_y"] == pytest.approx(my / 100.0)
        assert out[arm]["mean_y_adj"] == pytest.approx(mya / 100.0)


@settings(max_examples=6, deadline=None)
@given(
    # milli-degree grid: the closed form and the bisection encoder
    # agree everywhere except coordinates within one ulp of a cell
    # edge (documented boundary semantics) — a 1/1000 grid never
    # produces such sub-epsilon neighbors
    pts=st.lists(
        st.tuples(
            st.integers(-90000, 90000),
            st.integers(-180000, 180000),
        ),
        min_size=1, max_size=20,
    ),
    precision=st.integers(1, 8),
)
def test_geohash_matches_reference_encoder(spark, pts, precision):
    pts = [(la / 1000.0, lo / 1000.0) for la, lo in pts]
    from kevinlang_spark.operators.spatial import GEOHASH32, geohash

    def ref(lat, lon, p):
        """Textbook bisection encoder."""
        lat_i = (-90.0, 90.0)
        lon_i = (-180.0, 180.0)
        bits = []
        even = True
        while len(bits) < 5 * p:
            if even:
                mid = (lon_i[0] + lon_i[1]) / 2
                if lon >= mid:
                    bits.append(1)
                    lon_i = (mid, lon_i[1])
                else:
                    bits.append(0)
                    lon_i = (lon_i[0], mid)
            else:
                mid = (lat_i[0] + lat_i[1]) / 2
                if lat >= mid:
                    bits.append(1)
                    lat_i = (mid, lat_i[1])
                else:
                    bits.append(0)
                    lat_i = (lat_i[0], mid)
            even = not even
        out = ""
        for i in range(p):
            v = 0
            for b in bits[5 * i : 5 * i + 5]:
                v = v * 2 + b
            out += GEOHASH32[v]
        return out

    df = spark.createDataFrame(
        [(float(la), float(lo)) for la, lo in pts],
        "lat double, lon double",
    )
    got = [
        r[0]
        for r in df.select(
            geohash(F.col("lat"), F.col("lon"), precision)
        ).collect()
    ]
    want = [ref(float(la), float(lo), precision) for la, lo in pts]
    assert got == want
