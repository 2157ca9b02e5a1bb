"""Round-12 operators: Bradley-Terry strength fitting and
similarity-assigned interleaved media."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


def _bt_brute(comps, n_iters=2, alpha=0.5):
    """Independent reference: plain-Python MM rounds with the same
    sorted-order folds."""
    from collections import defaultdict

    by_p = defaultdict(list)
    for p, w, l in comps:
        if w is not None and l is not None and w != l:
            by_p[p].append((w, l))
    out = {}
    for p, pairs in by_p.items():
        pairs = sorted(pairs)
        cands = sorted({w for w, _ in pairs} | {l for _, l in pairs})
        ps = {c: 1.0 for c in cands}
        for _ in range(n_iters):
            raw = {}
            for c in cands:
                wins = sum(1 for w, _ in pairs if w == c)
                den = 0.0
                for w, l in pairs:
                    if w == c or l == c:
                        other = l if w == c else w
                        den = den + 1.0 / (ps[c] + ps[other])
                den = den + 2.0 * alpha / (ps[c] + 1.0)
                raw[c] = (wins + alpha) / den
            s = 0.0
            for c in cands:
                s = s + raw[c]
            norm = len(cands) / s
            ps = {c: raw[c] * norm for c in cands}
        for c in cands:
            out[(p, c)] = (
                sum(1 for w, l in pairs if c in (w, l)),
                sum(1 for w, _ in pairs if w == c),
                ps[c],
            )
    return out


def test_bt_strength_hand_math(spark):
    """One prompt, a beats b: first MM round from p=1 gives
    (1.5, 0.5); second gives the 1.5909/0.4091 normalized pair —
    checked against the closed-form recurrence by hand."""
    from kevinlang_spark.operators.preference import bt_strength

    df = spark.createDataFrame(
        [(2, "x", "y")], "prompt_id bigint, winner string, loser string"
    )
    out = {r["cand_id"]: r for r in bt_strength(df).collect()}
    assert out["x"]["wins"] == 1 and out["y"]["wins"] == 0
    assert out["x"]["n_comparisons"] == 1 and out["y"]["n_comparisons"] == 1
    assert abs(out["x"]["strength"] - 35.0 / 22) < 1e-12
    assert abs(out["y"]["strength"] - 9.0 / 22) < 1e-12
    # strengths mean-normalize to n_cands
    assert abs(out["x"]["strength"] + out["y"]["strength"] - 2.0) < 1e-12


def test_bt_strength_orders_by_dominance(spark):
    """A transitive tournament a > b > c must fit strictly decreasing
    strengths; self-comparisons and NULLs drop."""
    from kevinlang_spark.operators.preference import bt_strength

    rows = [
        (1, "a", "b"), (1, "a", "c"), (1, "b", "c"), (1, "a", "b"),
        (1, "a", "a"), (1, None, "b"),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id bigint, winner string, loser string"
    )
    out = {r["cand_id"]: r for r in bt_strength(df).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["a"]["strength"] > out["b"]["strength"] > out["c"]["strength"]
    assert out["a"]["wins"] == 3 and out["c"]["wins"] == 0
    assert out["a"]["n_comparisons"] == 3 and out["c"]["n_comparisons"] == 2
    want = _bt_brute([(p, w, l) for p, w, l in rows])
    for c, r in out.items():
        bw = want[(1, c)]
        assert (r["n_comparisons"], r["wins"]) == bw[:2]
        assert r["strength"] == pytest.approx(bw[2], abs=1e-12)


def test_bt_strength_n_iters_guard(spark):
    from kevinlang_spark.operators.preference import bt_strength

    df = spark.createDataFrame(
        [(1, "a", "b")], "prompt_id bigint, winner string, loser string"
    )
    with pytest.raises(ValueError, match="n_iters"):
        bt_strength(df, n_iters=0)


@settings(max_examples=6, deadline=None)
@given(
    comps=st.lists(
        st.tuples(
            st.integers(0, 2),   # prompt
            st.integers(0, 5),   # winner
            st.integers(0, 5),   # loser
        ),
        min_size=1, max_size=24,
    ),
)
def test_bt_strength_matches_brute_force(spark, comps):
    from kevinlang_spark.operators.preference import bt_strength

    df = spark.createDataFrame(
        comps, "prompt_id bigint, winner bigint, loser bigint"
    )
    got = {
        (r["prompt_id"], r["cand_id"]): (
            r["n_comparisons"], r["wins"], r["strength"]
        )
        for r in bt_strength(df).collect()
    }
    want = _bt_brute(comps)
    assert set(got) == set(want)
    for k, (nc, w, s) in want.items():
        assert got[k][:2] == (nc, w)
        assert got[k][2] == pytest.approx(s, abs=1e-12)


def test_interleave_media_assign_greedy_unique(spark):
    """Greedy maximal matching: best pair first, conflicts excluded,
    each media used at most once, unassignable slots (zero-norm vec or
    fewer media than slots) dropped."""
    from kevinlang_spark.operators.multimodal import interleave_media_assign

    slots = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]), (1, 1, [0.0, 1.0]),
            (2, 0, [1.0, 1.0]), (2, 1, [0.0, 0.0]),  # zero-norm slot
        ],
        "doc_id bigint, slot int, slot_vec array<double>",
    )
    media = spark.createDataFrame(
        [
            (1, 10, [1.0, 0.1]), (1, 11, [0.1, 1.0]), (1, 12, [0.9, 0.2]),
            (2, 20, [1.0, 1.0]),
        ],
        "doc_id bigint, media_id bigint, media_vec array<double>",
    )
    rows = interleave_media_assign(slots, media).collect()
    got = {(r["doc_id"], r["slot"]): r for r in rows}
    assert set(got) == {(1, 0), (1, 1), (2, 0)}  # zero-norm slot dropped
    assert got[(1, 0)]["media_id"] == 10  # best cosine for slot 0
    assert got[(1, 1)]["media_id"] == 11  # 10 is taken; 11 beats 12
    assert got[(2, 0)]["media_id"] == 20
    assert got[(2, 0)]["sim_micros"] == 1_000_000
    # media uniqueness within a doc
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["media_id"])
    assert all(len(v) == len(set(v)) for v in per_doc.values())
    # pick_order follows similarity rank
    assert got[(1, 0)]["pick_order"] == 1 and got[(1, 1)]["pick_order"] == 2


def test_interleave_media_assign_contention(spark):
    """Two slots both preferring the same media: the higher-similarity
    slot wins it, the other takes its second choice — the MMC4 unique-
    assignment property a per-slot argmax would violate."""
    from kevinlang_spark.operators.multimodal import interleave_media_assign

    slots = spark.createDataFrame(
        [(7, 0, [1.0, 0.0]), (7, 1, [0.96, 0.28])],
        "doc_id bigint, slot int, slot_vec array<double>",
    )
    media = spark.createDataFrame(
        [(7, 1, [1.0, 0.0]), (7, 2, [0.8, 0.6])],
        "doc_id bigint, media_id bigint, media_vec array<double>",
    )
    got = {
        r["slot"]: r["media_id"]
        for r in interleave_media_assign(slots, media).collect()
    }
    # both slots' best is media 1 (sim 1.0 vs 0.96); slot 0 wins it
    assert got == {0: 1, 1: 2}


FLEISS_WIKI = [  # Fleiss 1971 worked example: 10 subjects x 14 raters x 5 cats
    [0, 0, 0, 0, 14],
    [0, 2, 6, 4, 2],
    [0, 0, 3, 5, 6],
    [0, 3, 9, 2, 0],
    [2, 2, 8, 1, 1],
    [7, 7, 0, 0, 0],
    [3, 2, 6, 3, 0],
    [2, 5, 3, 2, 2],
    [6, 5, 2, 1, 0],
    [0, 2, 2, 3, 7],
]


def test_fleiss_kappa_published_example(spark):
    """The Fleiss 1971 worked example: P-bar 0.378, P-e 0.213,
    kappa 0.210 (3 d.p.)."""
    from kevinlang_spark.operators.quality import fleiss_kappa

    rows = []
    for item, counts in enumerate(FLEISS_WIKI):
        rater = 0
        for cat, c in enumerate(counts):
            for _ in range(c):
                rows.append(("s", item, rater, cat))
                rater += 1
    df = spark.createDataFrame(
        rows, "source string, doc_id bigint, rater_id int, category int"
    )
    r = fleiss_kappa(df, n_raters=14).collect()[0]
    assert r["n_items"] == 10 and r["n_items_dropped"] == 0
    assert round(r["p_bar"], 3) == 0.378
    assert round(r["p_e"], 3) == 0.213
    assert round(r["kappa"], 3) == 0.210


def test_fleiss_kappa_edges(spark):
    """Perfect agreement -> kappa 1; items with the wrong rater count
    drop and are reported; duplicate (item, rater) votes dedupe to the
    min category; n_raters guard."""
    from kevinlang_spark.operators.quality import fleiss_kappa

    rows = [("s", i, r, "A" if i < 3 else "B") for i in range(6)
            for r in range(3)]
    rows += [("s", 99, 0, "A"), ("s", 99, 1, "B")]  # 2 raters -> dropped
    rows += [("s", 0, 0, "B")]  # duplicate vote, min("A","B") = "A" kept
    df = spark.createDataFrame(
        rows, "source string, doc_id bigint, rater_id int, category string"
    )
    r = fleiss_kappa(df, n_raters=3).collect()[0]
    assert r["n_items"] == 6 and r["n_items_dropped"] == 1
    assert r["kappa"] == 1.0
    with pytest.raises(ValueError, match="n_raters"):
        fleiss_kappa(df, n_raters=1)


def test_conversation_paths_tree_walks(spark):
    """Root-to-leaf linearization over a branching tree; orphaned
    parents flag is_complete=false; pure cycles emit no rows; depth
    guard raises."""
    from kevinlang_spark.operators.text import conversation_paths

    rows = [
        (1, 1, None, "user"), (1, 2, 1, "assistant"),
        (1, 3, 1, "assistant"), (1, 4, 2, "user"),
        (2, 10, 99, "user"),            # orphaned parent
        (3, 20, 21, "u"), (3, 21, 20, "a"),  # pure 2-cycle: no leaf
    ]
    df = spark.createDataFrame(
        rows, "conv_id bigint, msg_id bigint, parent_id bigint, role string"
    )
    got = {
        (r["conv_id"], r["leaf_id"]): r
        for r in conversation_paths(df, max_depth=8).collect()
    }
    assert set(got) == {(1, 3), (1, 4), (2, 10)}
    assert got[(1, 4)]["path"] == "1>2>4"
    assert got[(1, 4)]["roles"] == "user>assistant>user"
    assert got[(1, 4)]["depth"] == 3 and got[(1, 4)]["is_complete"]
    assert got[(1, 3)]["path"] == "1>3" and got[(1, 3)]["depth"] == 2
    assert not got[(2, 10)]["is_complete"] and got[(2, 10)]["depth"] == 1
    with pytest.raises(ValueError, match="max_depth"):
        conversation_paths(df, max_depth=0)


def test_conversation_paths_depth_cap_marks_incomplete(spark):
    """A chain longer than max_depth stops walking and reports
    is_complete=false with the truncated (partial) path."""
    from kevinlang_spark.operators.text import conversation_paths

    chain = [(9, 0, None, "user")] + [
        (9, i, i - 1, "assistant") for i in range(1, 6)
    ]
    df = spark.createDataFrame(
        chain, "conv_id bigint, msg_id bigint, parent_id bigint, role string"
    )
    full = conversation_paths(df, max_depth=8).collect()[0]
    assert full["depth"] == 6 and full["is_complete"]
    capped = conversation_paths(df, max_depth=3).collect()[0]
    assert capped["depth"] == 4  # leaf + 3 hops
    assert not capped["is_complete"]
    assert capped["path"] == "2>3>4>5"


def test_winrate_matrix_wilson(spark):
    """7/10 wins: the textbook Wilson 95% interval (0.3968, 0.8922);
    canonicalization puts the lower id in model_a regardless of who
    won; self-battles and NULLs drop."""
    from kevinlang_spark.operators.preference import winrate_matrix

    rows = [(0, 1, 2)] * 7 + [(0, 2, 1)] * 3 + [(0, 5, 5), (0, None, 1)]
    df = spark.createDataFrame(
        rows, "board bigint, winner bigint, loser bigint"
    )
    out = winrate_matrix(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["model_a"], r["model_b"]) == (1, 2)
    assert (r["n_battles"], r["wins_a"]) == (10, 7)
    assert r["win_rate"] == 0.7
    assert round(r["wilson_lo"], 4) == 0.3968
    assert round(r["wilson_hi"], 4) == 0.8922
    assert r["wilson_lo"] < r["win_rate"] < r["wilson_hi"]


def test_bt_bootstrap_intervals(spark):
    """CIs bracket the dominant model above the dominated one; the
    deterministic weights make re-runs identical; replicate guard."""
    from kevinlang_spark.operators.preference import bt_bootstrap

    rows = [(i, 1 if i % 3 else 2, 2 if i % 3 else 1) for i in range(30)]
    df = spark.createDataFrame(
        rows, "battle_id bigint, winner bigint, loser bigint"
    )
    out = {r["model_id"]: r for r in bt_bootstrap(df, n_replicates=10).collect()}
    assert set(out) == {1, 2}
    r1, r2 = out[1], out[2]
    assert r1["n_present"] == 10 and r2["n_present"] == 10
    assert r1["strength_lo"] <= r1["strength_median"] <= r1["strength_hi"]
    assert r1["strength_lo"] > r2["strength_hi"]  # 2:1 dominance separates
    again = {r["model_id"]: r for r in bt_bootstrap(df, n_replicates=10).collect()}
    assert again[1] == r1 and again[2] == r2  # deterministic replicates
    with pytest.raises(ValueError, match="n_replicates"):
        bt_bootstrap(df, n_replicates=1)


def test_bt_bootstrap_poisson_weights_are_calibrated(spark):
    """The md5-uniform inverse-CDF weights are Poisson(1)-shaped:
    mean ~1 and ~36.8% zeros over a large deterministic sample."""
    from pyspark.sql import functions as F

    from kevinlang_spark.operators.preference import POISSON1_CDF

    n = 20_000
    df = spark.range(n)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("id").cast("string"), F.lit("#bs1"))),
                1, 13,
            ),
            16, 10,
        ).cast("bigint")
        / F.lit(4503599627370496.0)
    )
    w = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    stats = df.select(w.alias("w")).agg(
        F.avg("w").alias("mean"), F.count_if(F.col("w") == 0).alias("z")
    ).collect()[0]
    assert abs(stats["mean"] - 1.0) < 0.03
    assert abs(stats["z"] / n - 0.3679) < 0.01


def test_pass_at_k_matches_comb_formula(spark):
    """Exact HumanEval formula per task: 1 - C(n-c,k)/C(n,k); n < k
    excluded; n-c < k saturates at 1.0; ks guard."""
    from math import comb

    from kevinlang_spark.operators.evals import pass_at_k

    rows = [("s", t, i < c) for t, c in enumerate((2, 0, 10))
            for i in range(10)]
    rows += [("s", 99, True), ("s", 99, False)]  # n=2 task
    df = spark.createDataFrame(rows, "suite string, task_id bigint, correct boolean")
    out = {r["k"]: r for r in pass_at_k(df, ks=(1, 5)).collect()}
    want1 = (sum(1 - comb(10 - c, 1) / comb(10, 1) for c in (2, 0, 10))
             + (1 - comb(1, 1) / comb(2, 1))) / 4
    assert out[1]["n_tasks"] == 4
    assert out[1]["mean_pass_at_k"] == pytest.approx(want1, abs=1e-6)
    want5 = sum(1 - comb(10 - c, 5) / comb(10, 5) for c in (2, 0, 10)) / 3
    assert out[5]["n_tasks"] == 3  # the n=2 task is excluded at k=5
    assert out[5]["mean_pass_at_k"] == pytest.approx(want5, abs=1e-6)
    with pytest.raises(ValueError, match="ks"):
        pass_at_k(df, ks=())


def test_majority_vote_accuracy(spark):
    """Modal answer with min-answer tie-break vs reference; vote share
    averaged over tasks."""
    from kevinlang_spark.operators.evals import majority_vote

    rows = [
        ("s", 0, "A", "A"), ("s", 0, "A", "A"), ("s", 0, "B", "A"),
        ("s", 1, "X", "Y"), ("s", 1, "X", "Y"), ("s", 1, "Y", "Y"),
        ("s", 2, "P", "P"), ("s", 2, "Q", "P"),  # tie -> min("P","Q")=P
    ]
    df = spark.createDataFrame(
        rows, "suite string, task_id bigint, answer string, reference string"
    )
    r = majority_vote(df).collect()[0]
    assert r["n_tasks"] == 3 and r["n_correct"] == 2
    assert r["accuracy"] == pytest.approx(2 / 3, abs=1e-12)
    assert r["mean_vote_share"] == pytest.approx(
        (2 / 3 + 2 / 3 + 1 / 2) / 3, abs=1e-5
    )


def test_conversation_paths_renders_chatml(spark):
    """text_col adds the ChatML linearization: render_chat's grammar
    byte-for-byte, NULL-content turns skipped but kept on the path."""
    from kevinlang_spark.operators.text import conversation_paths

    rows = [
        (1, 1, None, "user", "hi"),
        (1, 2, 1, "assistant", "hello"),
        (1, 3, 2, "user", None),
        (1, 4, 3, "assistant", "bye"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id bigint, msg_id bigint, parent_id bigint, "
        "role string, text string",
    )
    r = conversation_paths(df, max_depth=8, text_col="text").collect()[0]
    assert r["path"] == "1>2>3>4"  # NULL-content msg stays on the path
    assert r["rendered"] == (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello<|im_end|>\n"
        "<|im_start|>assistant\nbye<|im_end|>\n"
    )
    # without text_col the column is absent (schema unchanged for old callers)
    cols = conversation_paths(df, max_depth=8).columns
    assert "rendered" not in cols


def test_asof_join_directions(spark):
    """merge_asof family: forward = smallest right_ts >= left_ts,
    nearest = closer side with ties to backward; inclusive equality on
    both sides; numeric and timestamp ts both work."""
    from kevinlang_spark.operators.joins import asof_join

    trades = spark.createDataFrame(
        [("a", 10), ("a", 25), ("a", 35), ("b", 5)],
        "sym string, ts bigint",
    )
    quotes = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, 2.0), ("a", 40, 3.0), ("b", 9, 9.0)],
        "sym string, ts bigint, bid double",
    )
    back = {
        (r["sym"], r["ts"]): r["bid"]
        for r in asof_join(trades, quotes, on="sym",
                           right_cols=["bid"]).collect()
    }
    assert back == {("a", 10): 1.0, ("a", 25): 2.0, ("a", 35): 2.0,
                    ("b", 5): None}
    fwd = {
        (r["sym"], r["ts"]): r["bid"]
        for r in asof_join(trades, quotes, on="sym", right_cols=["bid"],
                           direction="forward").collect()
    }
    assert fwd == {("a", 10): 1.0, ("a", 25): 3.0, ("a", 35): 3.0,
                   ("b", 5): 9.0}
    near = {
        (r["sym"], r["ts"]): r["bid"]
        for r in asof_join(trades, quotes, on="sym", right_cols=["bid"],
                           direction="nearest").collect()
    }
    # ts=25 is 5 from quote@20 and 15 from quote@40 -> backward;
    # ts=35 is 15 from quote@20 and 5 from quote@40 -> forward;
    # equidistant would tie to backward (pandas convention)
    assert near == {("a", 10): 1.0, ("a", 25): 2.0, ("a", 35): 3.0,
                    ("b", 5): 9.0}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="sym", direction="sideways")


def test_asof_nearest_tie_goes_backward_and_timestamps_work(spark):
    from datetime import datetime

    from kevinlang_spark.operators.joins import asof_join

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([("k", t(30))], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", t(20), "early"), ("k", t(40), "late")],
        "k string, ts timestamp, v string",
    )
    r = asof_join(left, right, on="k", right_cols=["v"],
                  direction="nearest").collect()[0]
    assert r["v"] == "early"  # exact tie -> backward


def test_bfd_packing_plan_math(spark):
    """Hand-traced BFD: lens [5,4,3,3,2,2,2] cap 8 packs into exactly
    3 bins (loads 6/7/8); clamping, guards, and the lower bound."""
    from kevinlang_spark.operators.chunking import bfd_packing_plan

    rows = [("s", i, n) for i, n in enumerate([5, 4, 3, 3, 2, 2, 2])]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, n_tokens int")
    r = bfd_packing_plan(df, max_tokens=8, n_shards=1).collect()[0]
    assert (r["n_docs"], r["total_tokens"]) == (7, 21)
    assert r["n_bins_bfd"] == 3 and r["n_bins_lb"] == 3
    assert r["utilization"] == pytest.approx(21 / 24, abs=1e-12)
    # an over-long doc clamps to the capacity (its own full bin)
    rows2 = [("s", 0, 100), ("s", 1, 3)]
    r2 = bfd_packing_plan(
        spark.createDataFrame(rows2, "source string, doc_id bigint, n_tokens int"),
        max_tokens=8, n_shards=1,
    ).collect()[0]
    assert r2["total_tokens"] == 11 and r2["n_bins_bfd"] == 2
    with pytest.raises(ValueError, match="max_tokens"):
        bfd_packing_plan(df, max_tokens=0)


@settings(max_examples=6, deadline=None)
@given(
    lens=st.lists(st.integers(1, 9), min_size=1, max_size=24),
)
def test_bfd_matches_brute_force(spark, lens):
    """The in-row fold equals a plain-Python best-fit-decreasing over
    the same sorted multiset."""
    from kevinlang_spark.operators.chunking import bfd_packing_plan

    cap = 10
    rows = [("s", i, n) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, n_tokens int")
    r = bfd_packing_plan(df, max_tokens=cap, n_shards=1).collect()[0]
    bins: list = []
    for n in sorted(lens, reverse=True):
        cand = [b for b in bins if b + n <= cap]
        if not cand:
            bins.append(n)
        else:
            best = max(cand)
            bins.remove(best)
            bins.append(best + n)
    assert r["n_bins_bfd"] == len(bins)
    assert r["total_tokens"] == sum(lens)
