"""Property-based models for the round-11 operators: random inputs,
closed-form invariants (hypothesis, bounded examples — Spark jobs are
~100 ms each so budgets stay small)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

TEXTS = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=120,
)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), TEXTS), min_size=1, max_size=12,
        unique_by=lambda t: t[0],
    ),
    rate=st.sampled_from([0.0, 0.2, 0.5, 1.0]),
    mode=st.sampled_from(["psm", "spm"]),
)
def test_fim_partitions_characters(spark, rows, rate, mode):
    """For EVERY applied row, (prefix, middle, suffix) partition the
    original characters exactly, in both orderings, for arbitrary
    unicode text."""
    from kevinlang_spark.operators.text import fim_transform

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = fim_transform(df, rate=rate, mode=mode).collect()
    orig = dict(rows)
    for r in out:
        if not r["fim_applied"]:
            assert r["text_out"] == orig[r["doc_id"]]
            continue
        t = r["text_out"]
        if mode == "psm":
            pre, rest = t[len("<PRE>"):].split("<SUF>", 1)
            suf, mid = rest.split("<MID>", 1)
        else:
            suf, rest = t[len("<PRE><SUF>"):].split("<MID>", 1)
            pre, mid = rest, ""
        assert pre + mid + suf == orig[r["doc_id"]]


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), st.text(min_size=20, max_size=200)),
        min_size=1, max_size=10, unique_by=lambda t: t[0],
    ),
)
def test_span_corruption_property(spark, rows):
    """inputs ⊕ targets reconstruct the document for arbitrary text of
    sufficient length; sentinel order is always 0 < 1 < 2."""
    from kevinlang_spark.operators.text import span_corruption

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    orig = dict(rows)
    for r in span_corruption(df).collect():
        d = r["doc_id"]
        if not r["corrupted"]:
            assert len(orig[d]) < 20
            continue
        pre, rest = r["inputs"].split("<extra_id_0>", 1)
        gap, tail = rest.split("<extra_id_1>", 1)
        body = r["targets"][len("<extra_id_0>"):-len("<extra_id_2>")]
        sp1, sp2 = body.split("<extra_id_1>", 1)
        assert pre + sp1 + gap + sp2 + tail == orig[d]


@settings(max_examples=6, deadline=None)
@given(
    cands=st.lists(
        st.tuples(
            st.integers(0, 5),      # prompt
            st.integers(0, 50),     # cand id
            st.integers(-100, 100),  # reward
        ),
        min_size=1, max_size=24, unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_dpo_pairs_matches_brute_force(spark, cands):
    """dpo_pairs equals the obvious per-prompt python argmax/argmin
    with the documented tie-breaks."""
    from kevinlang_spark.operators.preference import dpo_pairs

    rows = [(p, c, f"resp-{p}-{c}", r) for p, c, r in cands]
    df = spark.createDataFrame(
        rows, "prompt_id bigint, cand_id bigint, response string, reward bigint"
    )
    got = {
        r["prompt_id"]: (r["chosen_id"], r["rejected_id"], r["margin"])
        for r in dpo_pairs(df).collect()
    }
    want = {}
    by_p: dict = {}
    for p, c, r in cands:
        by_p.setdefault(p, []).append((c, r))
    for p, cs in by_p.items():
        hi = max(cs, key=lambda t: (t[1], -t[0]))
        lo = min(cs, key=lambda t: (t[1], t[0]))
        if hi[1] - lo[1] > 0:
            want[p] = (hi[0], lo[0], hi[1] - lo[1])
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    contents=st.lists(
        st.tuples(TEXTS, st.booleans()), min_size=1, max_size=6
    ),
)
def test_chat_word_spans_slice_rendered_tokens(spark, contents):
    """Word-unit spans must select exactly the assistant content's
    tokens inside the tokenization of the rendered string, for random
    unicode contents and NULL patterns."""
    import re

    from kevinlang_spark.operators.text import chat_token_spans, render_chat

    def words(s):
        return [w for w in re.split("[^a-z0-9]+", s.lower()) if w]

    row = {"doc_id": 1}
    turns = []
    for i, (body, present) in enumerate(contents):
        role = "assistant" if i % 2 else "user"
        col = f"c{i}"
        row[col] = body if present else None
        turns.append((role, col))
    if not any(r == "assistant" for r, _ in turns):
        return
    df = spark.createDataFrame(
        [tuple(row.values())],
        ", ".join(
            f"{k} bigint" if k == "doc_id" else f"{k} string" for k in row
        ),
    )
    rendered = render_chat(df, turns).collect()[0]["rendered"]
    stream = words(rendered)
    for r in chat_token_spans(df, turns, unit="word").collect():
        body = row[turns[r["turn_idx"]][1]]
        assert body is not None
        got = stream[r["token_start"] - 1 : r["token_end"]]
        assert got == words(body), (r["turn_idx"], got)


@settings(max_examples=6, deadline=None)
@given(
    cands=st.lists(
        st.tuples(
            st.integers(0, 3),       # prompt
            st.integers(0, 30),      # cand
            st.integers(-5, 5),      # reward a (narrow -> ties likely)
            st.integers(-5, 5),      # reward b
        ),
        min_size=2, max_size=20, unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_reward_agreement_matches_brute_force(spark, cands):
    from kevinlang_spark.operators.preference import reward_agreement

    df = spark.createDataFrame(
        cands,
        "prompt_id bigint, cand_id bigint, reward_a bigint, reward_b bigint",
    )
    got = {
        r["prompt_id"]: (r["concordant"], r["discordant"], r["tied"],
                         r["tau_a"])
        for r in reward_agreement(df).collect()
    }
    by_p: dict = {}
    for p, c, a, b in cands:
        by_p.setdefault(p, []).append((c, a, b))
    want = {}
    for p, xs in by_p.items():
        if len(xs) < 2:
            continue
        C = D = T = 0
        for i in range(len(xs)):
            for j in range(len(xs)):
                if xs[j][0] > xs[i][0]:
                    s = ((xs[i][1] > xs[j][1]) - (xs[i][1] < xs[j][1])) * (
                        (xs[i][2] > xs[j][2]) - (xs[i][2] < xs[j][2]))
                    C += s == 1
                    D += s == -1
                    T += s == 0
        n = len(xs)
        want[p] = (C, D, T, (C - D) * 2.0 / (n * (n - 1)))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 100), st.integers(1, 50)),
        min_size=1, max_size=30,
    ),
)
def test_retention_curve_matches_brute_force(spark, docs):
    from kevinlang_spark.operators.text import quality_retention_curve

    n_bins = 4
    df = spark.createDataFrame(docs, "score int, n_tokens int")
    got = {
        r["bin"]: (r["n_docs"], r["total_tokens"], r["cum_tokens"])
        for r in quality_retention_curve(df, n_bins=n_bins).collect()
    }
    # brute force: group by score, walk desc, bin by first rank
    from collections import defaultdict

    g = defaultdict(lambda: [0, 0])
    for s, n in docs:
        g[s][0] += 1
        g[s][1] += n
    N = len(docs)
    want_bins = defaultdict(lambda: [0, 0])
    before = 0
    for s in sorted(g, reverse=True):
        nd, nt = g[s]
        b = before * n_bins // N
        want_bins[b][0] += nd
        want_bins[b][1] += nt
        before += nd
    want, cum = {}, 0
    for b in sorted(want_bins):
        nd, nt = want_bins[b]
        cum += nt
        want[b] = (nd, nt, cum)
    assert got == want
