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
