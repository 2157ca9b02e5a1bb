"""Property-based models for the round-12 operators: random inputs
against plain-Python references (hypothesis, bounded examples)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401


@settings(max_examples=6, deadline=None)
@given(
    votes=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),  # group
            st.integers(0, 8),            # item
            st.integers(0, 2),            # rater
            st.integers(0, 3),            # category
        ),
        min_size=3, max_size=40,
        unique_by=lambda t: (t[0], t[1], t[2]),
    ),
)
def test_fleiss_kappa_matches_brute_force(spark, votes):
    from kevinlang_spark.operators.quality import fleiss_kappa

    n_raters = 3
    df = spark.createDataFrame(
        votes, "source string, doc_id bigint, rater_id int, category int"
    )
    got = {
        r["source"]: (
            r["n_items"], r["n_items_dropped"], r["p_bar"], r["p_e"],
            r["kappa"],
        )
        for r in fleiss_kappa(df, n_raters=n_raters).collect()
    }
    # brute force
    from collections import defaultdict

    by_gi = defaultdict(dict)
    for g, i, r, c in votes:
        by_gi[(g, i)][r] = min(c, by_gi[(g, i)].get(r, c))
    want = {}
    for g in {g for g, _, _, _ in votes}:
        items = {i: rs for (gg, i), rs in by_gi.items() if gg == g}
        kept = {i: rs for i, rs in items.items() if len(rs) == n_raters}
        dropped = len(items) - len(kept)
        if not kept:
            continue
        sum_s2n = 0
        marg = defaultdict(int)
        for rs in kept.values():
            cnt = defaultdict(int)
            for c in rs.values():
                cnt[c] += 1
                marg[c] += 1
            sum_s2n += sum(v * v for v in cnt.values()) - n_raters
        n_items = len(kept)
        p_bar = sum_s2n / (n_items * n_raters * (n_raters - 1))
        nn = n_items * n_raters
        p_e = 0.0
        for cj in sorted(marg.values()):
            p_e = p_e + (cj / nn) * (cj / nn)
        kappa = (p_bar - p_e) / (1.0 - p_e) if p_e != 1.0 else None
        want[g] = (n_items, dropped, p_bar, p_e, kappa)
    assert set(got) == set(want)
    for g, (ni, nd, pb, pe, ka) in want.items():
        gni, gnd, gpb, gpe, gka = got[g]
        assert (gni, gnd) == (ni, nd)
        assert gpb == pytest.approx(pb, abs=1e-12)
        assert gpe == pytest.approx(pe, abs=1e-12)
        if ka is not None and math.isfinite(ka):
            assert gka == pytest.approx(ka, abs=1e-9)


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 9)),  # (conv, msg)
        min_size=1, max_size=16, unique_by=lambda t: t,
    ),
    data=st.data(),
)
def test_conversation_paths_match_brute_force(spark, edges, data):
    """Random rooted forests (parent always a smaller id or a root):
    the Spark walks must equal a plain-Python DFS path enumeration."""
    from kevinlang_spark.operators.text import conversation_paths

    rows = []
    for conv, msg in edges:
        parent = data.draw(
            st.one_of(st.none(), st.integers(0, msg - 1)), label="parent"
        )
        rows.append((conv, msg, parent, "user" if msg % 2 == 0 else "bot"))
    # roots for referenced parents that don't exist as messages stay
    # dangling -> incomplete rows; add msg 0 as a root for conv 0
    rows.append((0, 0, None, "user"))
    df = spark.createDataFrame(
        rows, "conv_id bigint, msg_id bigint, parent_id bigint, role string"
    )
    got = {
        (r["conv_id"], r["leaf_id"]): (
            r["depth"], r["path"], r["roles"], r["is_complete"]
        )
        for r in conversation_paths(df, max_depth=16).collect()
    }
    # brute force
    from collections import defaultdict

    by_conv = defaultdict(dict)
    for conv, msg, parent, role in rows:
        by_conv[conv][msg] = (parent, role)
    want = {}
    for conv, msgs in by_conv.items():
        parents = {p for p, _ in msgs.values() if p is not None}
        for leaf in msgs:
            if leaf in parents:
                continue
            chain = [leaf]
            complete = False
            for _ in range(16 + 1):
                p = msgs[chain[0]][0]
                if p is None:
                    complete = True
                    break
                if p not in msgs or len(chain) > 16:
                    break
                chain.insert(0, p)
            # mirror the operator: the fold runs exactly max_depth
            # steps; a dangling parent id stops the walk (filter
            # returns nothing to prepend)
            want[(conv, leaf)] = (
                len(chain),
                ">".join(str(m) for m in chain),
                ">".join(msgs[m][1] for m in chain),
                complete,
            )
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k][:3] == v[:3], (k, got[k], v)


@settings(max_examples=6, deadline=None)
@given(
    battles=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 4), st.integers(0, 4)),
        min_size=1, max_size=20,
    ),
)
def test_winrate_matrix_matches_brute_force(spark, battles):
    from collections import defaultdict

    from kevinlang_spark.operators.preference import winrate_matrix

    df = spark.createDataFrame(
        battles, "board bigint, winner bigint, loser bigint"
    )
    got = {
        (r["board"], r["model_a"], r["model_b"]): (
            r["n_battles"], r["wins_a"], r["win_rate"],
            r["wilson_lo"], r["wilson_hi"],
        )
        for r in winrate_matrix(df).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for b, w, l in battles:
        if w == l:
            continue
        a, bb = min(w, l), max(w, l)
        agg[(b, a, bb)][0] += 1
        agg[(b, a, bb)][1] += 1 if w == a else 0
    assert set(got) == set(agg)
    z = 1.96
    for k, (n, wa) in agg.items():
        p = wa / n
        z2 = z * z
        denom = 1.0 + z2 / n
        center = (p + z2 / (2.0 * n)) / denom
        half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom
        gn, gw, gp, glo, ghi = got[k]
        assert (gn, gw) == (n, wa)
        assert gp == pytest.approx(p, abs=1e-12)
        assert glo == pytest.approx(center - half, abs=1e-12)
        assert ghi == pytest.approx(center + half, abs=1e-12)
