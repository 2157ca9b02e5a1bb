"""Round-11 operators: token-space SFT loss masks (chat_token_spans)
and the driver-side BPE word replay it constant-folds headers with."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators.text import (
    bpe_encode_word_py,
    bpe_encode_words,
    bpe_train,
    chat_token_spans,
)


def test_bpe_word_replay_matches_spark_fold(spark):
    """bpe_encode_word_py must be bit-identical to the Spark
    _apply_merge fold — headers are constant-folded through the Python
    replay while contents go through the Spark fold, so any drift
    between the two silently shifts every span."""
    merges = [(1, "l", "l", 9), (2, "ll", "o", 5), (3, "h", "e", 4),
              (4, "a", "n", 3)]
    words = ["hello", "llll", "lllll", "assistant", "im", "start", "end",
             "banana", "x", "anana"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["subtokens"].split(" ")
        for r in bpe_encode_words(df, merges).collect()
    }
    for w in words:
        assert got[w] == bpe_encode_word_py(w, merges), w
    # the fold re-reads its own output: 'l l l' under (l,l) -> 'll l'
    assert bpe_encode_word_py("lll", [(1, "l", "l", 9)]) == ["ll", "l"]


def test_chat_token_spans_closed_form_no_merges(spark):
    """With an empty merge table every word tokenizes to single chars,
    so spans are hand-computable: header <|im_start|>{role}\\n counts
    im(2)+start(5)+len(role chars); footer im(2)+end(3)=5."""
    rows = [
        # (id, sys, user, assistant)
        (1, "Hi there", "a bb ccc", "ok"),
        (2, "Hi there", None, "yes"),
        (3, "Hi there", "a bb ccc", None),
        (4, "Hi there", "a bb ccc", "!!!"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, sys string, u string, a string"
    )
    out = {
        r["doc_id"]: r
        for r in chat_token_spans(
            df,
            [("system", "sys"), ("user", "u"), ("assistant", "a")],
            merges=[],
        ).collect()
    }
    # headers: system 2+5+6=13, user 2+5+4=11, assistant 2+5+9=16; footer 5
    # sys content "Hi there" = 2+5 = 7 tokens -> sys piece 13+7+5 = 25
    # user content "a bb ccc" = 6 tokens -> user piece 11+6+5 = 22
    r1 = out[1]
    assert (r1["token_start"], r1["token_end"], r1["n_tokens"]) == (
        25 + 22 + 16 + 1, 25 + 22 + 16 + 2, 2)
    assert (r1["turn_idx"], r1["role"]) == (2, "assistant")
    # doc 2: user turn skipped entirely -> offsets shift back by 22
    r2 = out[2]
    assert (r2["token_start"], r2["token_end"], r2["n_tokens"]) == (
        25 + 16 + 1, 25 + 16 + 3, 3)
    # doc 3: NULL assistant -> no span row
    assert 3 not in out
    # doc 4: '!!!' has zero alnum tokens -> empty interval, honest
    r4 = out[4]
    assert r4["n_tokens"] == 0 and r4["token_end"] == r4["token_start"] - 1
    assert r4["token_start"] == 25 + 22 + 16 + 1


def test_chat_token_spans_trained_merges_consistency(spark):
    """With a TRAINED merge table the span width must equal the sum of
    per-word subtoken counts of the assistant content — replayed here
    word-by-word through the Python fold."""
    import re

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat and the cat ate") for i in range(20)],
        "doc_id bigint, text string",
    )
    merges = bpe_train(corpus, n_merges=4)
    assert merges  # corpus has adjacent pairs
    rows = [(1, "sys prompt", "the cat question", "the cat sat answer")]
    df = spark.createDataFrame(
        rows, "doc_id bigint, s string, u string, a string"
    )
    out = chat_token_spans(
        df, [("system", "s"), ("user", "u"), ("assistant", "a")], merges
    ).collect()
    assert len(out) == 1
    r = out[0]
    words = [w for w in re.split("[^a-z0-9]+", rows[0][3].lower()) if w]
    want = sum(len(bpe_encode_word_py(w, merges)) for w in words)
    assert r["n_tokens"] == want
    assert r["token_end"] - r["token_start"] + 1 == want


def test_chat_token_spans_multiple_train_roles(spark):
    """Two trainable turns emit two rows with disjoint, ordered
    intervals."""
    df = spark.createDataFrame(
        [(1, "q one", "a one", "q two", "a two")],
        "doc_id bigint, u1 string, a1 string, u2 string, a2 string",
    )
    out = chat_token_spans(
        df,
        [("user", "u1"), ("assistant", "a1"),
         ("user", "u2"), ("assistant", "a2")],
        merges=[],
    ).orderBy("turn_idx").collect()
    assert [r["turn_idx"] for r in out] == [1, 3]
    assert out[0]["token_end"] < out[1]["token_start"]


def test_chat_token_spans_errors(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, a string")
    with pytest.raises(ValueError, match="at least one turn"):
        chat_token_spans(df, [], merges=[])
    with pytest.raises(ValueError, match="train_roles"):
        chat_token_spans(df, [("user", "a")], merges=[])


def test_chat_token_spans_plan_no_python(spark):
    """The span plan must stay JVM-side: no BatchEvalPython, no
    cartesian product — token counting is a word-keyed join, not a
    per-occurrence fold."""
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("some user words here").alias("u"),
        F.lit("an answer").alias("a"),
    )
    plan = executed_plan(
        chat_token_spans(
            df, [("user", "u"), ("assistant", "a")], merges=[(1, "a", "n", 2)]
        )
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------- #
# FIM: SPM ordering + context-level application (round 11)
# --------------------------------------------------------------------- #


def test_fim_spm_reassembly(spark):
    """SPM rows reassemble: text_out = <PRE><SUF>suffix<MID>prefix+middle
    with the SAME cuts PSM picks for the same id (selection and cut
    hashes ignore the mode)."""
    from kevinlang_spark.operators.text import fim_transform

    rows = [(i, f"doc {i} " + "abcdefghij" * (i % 4 + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    psm = {r["doc_id"]: r for r in fim_transform(df, rate=0.5).collect()}
    spm = {
        r["doc_id"]: r
        for r in fim_transform(df, rate=0.5, mode="spm").collect()
    }
    orig = dict(rows)
    n_applied = 0
    for d, r in spm.items():
        assert r["fim_applied"] == psm[d]["fim_applied"]  # same selection
        if not r["fim_applied"]:
            assert r["text_out"] == orig[d]
            continue
        n_applied += 1
        t = r["text_out"]
        assert t.startswith("<PRE><SUF>")
        sufx, rest = t[len("<PRE><SUF>"):].split("<MID>", 1)
        # rest = prefix + middle contiguous; original = prefix+middle+suffix
        assert rest + sufx == orig[d]
        # cross-check cuts against the PSM rendering of the same id
        p = psm[d]["text_out"][len("<PRE>"):]
        pre_part, p_rest = p.split("<SUF>", 1)
        p_suf, p_mid = p_rest.split("<MID>", 1)
        assert sufx == p_suf and rest == pre_part + p_mid
    assert n_applied > 5


def test_fim_context_boundary_aware(spark):
    """Context-level FIM: every chunk is exactly chunk_chars long except
    the tail, chunks reassemble to the original document, and applied
    chunks rewrite WITHIN the chunk (cuts never cross a boundary)."""
    from kevinlang_spark.operators.text import fim_transform_context

    body = "".join(chr(97 + (i % 26)) for i in range(300))
    df = spark.createDataFrame(
        [(1, body), (2, "short"), (3, None), (4, "")],
        "doc_id bigint, text string",
    )
    out = fim_transform_context(df, chunk_chars=128, rate=1.0).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # NULL / empty docs contribute no contexts
    assert set(by_doc) == {1, 2}
    rows1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in rows1] == [0, 1, 2]
    recon = []
    for r in rows1:
        assert r["fim_applied"]  # rate=1.0 selects every chunk
        t = r["text_out"]
        pre, rest = t[len("<PRE>"):].split("<SUF>", 1)
        sufx, midl = rest.split("<MID>", 1)
        recon.append(pre + midl + sufx)
    assert recon[0] == body[:128] and recon[1] == body[128:256]
    assert recon[2] == body[256:]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_idx"] == 0


def test_fim_context_rate_zero_passthrough(spark):
    from kevinlang_spark.operators.text import fim_transform_context

    df = spark.createDataFrame(
        [(1, "abcdef" * 50)], "doc_id bigint, text string"
    )
    rows = fim_transform_context(df, chunk_chars=100, rate=0.0).collect()
    assert all(not r["fim_applied"] for r in rows)
    assert "".join(
        r["text_out"] for r in sorted(rows, key=lambda r: r["chunk_idx"])
    ) == "abcdef" * 50


def test_fim_mode_errors(spark):
    import pytest as _pytest

    from kevinlang_spark.operators.text import (
        fim_transform,
        fim_transform_context,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="mode"):
        fim_transform(df, mode="mps")
    with _pytest.raises(ValueError, match="chunk_chars"):
        fim_transform_context(df, chunk_chars=0)


# --------------------------------------------------------------------- #
# Llama-3 chat template + multi-turn spans (round 11)
# --------------------------------------------------------------------- #


def test_render_chat_llama3_bytes(spark):
    """Byte-exact Llama-3 wire format: bos once, header/footer per
    non-NULL turn, NULL turns skipped entirely."""
    from kevinlang_spark.operators.text import render_chat

    df = spark.createDataFrame(
        [(1, "be brief", "hi", "hello"), (2, "be brief", "yo", None)],
        "doc_id bigint, s string, u string, a string",
    )
    out = {
        r["doc_id"]: r
        for r in render_chat(
            df, [("system", "s"), ("user", "u"), ("assistant", "a")],
            fmt="llama3",
        ).collect()
    }
    want1 = (
        "<|begin_of_text|>"
        "<|start_header_id|>system<|end_header_id|>\n\nbe brief<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nhello<|eot_id|>"
    )
    assert out[1]["rendered"] == want1
    assert out[1]["n_turns"] == 3 and out[1]["n_chars"] == len(want1)
    want2 = (
        "<|begin_of_text|>"
        "<|start_header_id|>system<|end_header_id|>\n\nbe brief<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nyo<|eot_id|>"
    )
    assert out[2]["rendered"] == want2 and out[2]["n_turns"] == 2


def test_chat_loss_spans_llama3_land_on_content(spark):
    """llama3 spans must slice the rendered string to exactly the
    assistant contents — including the second assistant turn shifted
    past a skipped follow-up user turn."""
    from kevinlang_spark.operators.text import chat_loss_spans, render_chat

    turns = [("system", "s"), ("user", "u"), ("assistant", "a"),
             ("user", "u2"), ("assistant", "a2")]
    df = spark.createDataFrame(
        [
            (1, "sys", "q1", "ans one", "q2", "ans two"),
            (2, "sys", "q1", "ans one", None, "ans two"),  # u2 skipped
            (3, "sys", "q1", None, "q2", "ans two"),       # a skipped
        ],
        "doc_id bigint, s string, u string, a string, u2 string, a2 string",
    )
    rendered = {
        r["doc_id"]: r["rendered"]
        for r in render_chat(df, turns, fmt="llama3").collect()
    }
    spans = chat_loss_spans(df, turns, fmt="llama3").collect()
    assert len(spans) == 5  # docs 1,2 have two assistant turns; doc 3 one
    contents = {"a": "ans one", "a2": "ans two"}
    for r in spans:
        text = rendered[r["doc_id"]]
        got = text[r["start"] - 1 : r["end"]]
        want = contents["a" if r["turn_idx"] == 2 else "a2"]
        assert got == want, (r["doc_id"], r["turn_idx"], got)


def test_render_chat_unknown_fmt(spark):
    from kevinlang_spark.operators.text import chat_loss_spans, render_chat

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, a string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="format"):
        render_chat(df, [("user", "a")], fmt="llama2")
    with _pytest.raises(ValueError, match="format"):
        chat_loss_spans(df, [("assistant", "a")], fmt="alpaca")


# --------------------------------------------------------------------- #
# preference data: DPO pairs + best-of-n (round 11)
# --------------------------------------------------------------------- #


def test_dpo_pairs_selection_and_margin(spark):
    from kevinlang_spark.operators.preference import dpo_pairs

    rows = [
        # prompt 1: clear spread
        (1, 0, "bad", 10), (1, 1, "best", 90), (1, 2, "mid", 50),
        # prompt 2: reward tie at the top -> smallest cand_id wins;
        # tie at the bottom -> smallest cand_id is rejected
        (2, 3, "tie-a", 70), (2, 1, "tie-b", 70), (2, 5, "low-a", 20),
        (2, 4, "low-b", 20),
        # prompt 3: zero margin -> dropped
        (3, 0, "same", 40), (3, 1, "same2", 40),
        # prompt 4: NULL reward candidate ignored; margin from the rest
        (4, 0, "x", None), (4, 1, "keep-hi", 60), (4, 2, "keep-lo", 30),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id bigint, cand_id bigint, response string, reward bigint"
    )
    out = {r["prompt_id"]: r for r in dpo_pairs(df).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1]["chosen_text"], out[1]["rejected_text"]) == ("best", "bad")
    assert out[1]["margin"] == 80
    assert (out[2]["chosen_id"], out[2]["rejected_id"]) == (1, 4)
    assert (out[4]["chosen_reward"], out[4]["rejected_reward"]) == (60, 30)


def test_dpo_pairs_min_margin(spark):
    from kevinlang_spark.operators.preference import dpo_pairs

    df = spark.createDataFrame(
        [(1, 0, "a", 10), (1, 1, "b", 14), (2, 0, "c", 10), (2, 1, "d", 40)],
        "prompt_id bigint, cand_id bigint, response string, reward bigint",
    )
    got = {r["prompt_id"] for r in dpo_pairs(df, min_margin=5).collect()}
    assert got == {2}


def test_best_of_n_stats(spark):
    from kevinlang_spark.operators.preference import best_of_n

    df = spark.createDataFrame(
        [(1, 0, "a", 10), (1, 1, "b", 30), (1, 2, "c", 20),
         (1, 3, None, 99),  # NULL text disqualified everywhere
         (2, 7, "solo", 5)],
        "prompt_id bigint, cand_id bigint, response string, reward bigint",
    )
    out = {r["prompt_id"]: r for r in best_of_n(df).collect()}
    assert out[1]["response"] == "b" and out[1]["reward"] == 30
    assert out[1]["n_candidates"] == 3 and out[1]["mean_reward"] == 20.0
    assert out[2]["response"] == "solo" and out[2]["n_candidates"] == 1


def test_preference_plan_one_shuffle(spark):
    """The aggregation must partial-combine map-side: exactly one
    Exchange (the prompt-key shuffle), no window sort, no Python."""
    from kevinlang_spark.operators.preference import dpo_pairs
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.range(1000).select(
        (F.col("id") % 100).alias("prompt_id"),
        (F.col("id") % 10).alias("cand_id"),
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("response"),
        (F.col("id") * 7 % 97).alias("reward"),
    )
    plan = executed_plan(dpo_pairs(df))
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "Window" not in plan


# --------------------------------------------------------------------- #
# word-unit spans + packed-sequence positions (round 11)
# --------------------------------------------------------------------- #


def test_chat_token_spans_word_unit(spark):
    """unit='word': every [a-z0-9]+ run is one token; header = 3 words,
    footer = 2 — and the path is a pure projection (no join, no
    shuffle beyond spread)."""
    from kevinlang_spark.operators.text import chat_token_spans
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.createDataFrame(
        [(1, "Hi there", "a bb ccc", "two words"),
         (2, "Hi there", None, "three little words")],
        "doc_id bigint, s string, u string, a string",
    )
    turns = [("system", "s"), ("user", "u"), ("assistant", "a")]
    out = {
        r["doc_id"]: r
        for r in chat_token_spans(df, turns, unit="word").collect()
    }
    # doc 1: p0 = 3+2+2 = 7, p1 = 3+3+2 = 8; start = 7+8+3+1 = 19
    assert (out[1]["token_start"], out[1]["token_end"],
            out[1]["n_tokens"]) == (19, 20, 2)
    # doc 2: user skipped -> start = 7+3+1 = 11, three tokens
    assert (out[2]["token_start"], out[2]["token_end"],
            out[2]["n_tokens"]) == (11, 13, 3)
    plan = executed_plan(chat_token_spans(df, turns, unit="word"))
    assert "Join" not in plan and "BatchEvalPython" not in plan
    # bpe unit without merges must refuse
    import pytest as _pytest

    with _pytest.raises(ValueError, match="merge table"):
        chat_token_spans(df, turns, unit="bpe")
    with _pytest.raises(ValueError, match="unit"):
        chat_token_spans(df, turns, unit="char")


def test_pack_sequences_with_offsets_arithmetic(spark):
    """Offsets replay the concat-and-split rule: stream_offset is the
    running sum of earlier docs in the (source, shard) stream, seq_id
    floors it by the budget, tok_offset is the remainder."""
    from kevinlang_spark.operators.chunking import pack_sequences_with_offsets

    rows = [(i, "s", 60) for i in range(0, 20, 4)]  # one shard, 5 docs
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens int")
    out = {
        r["id"]: r
        for r in pack_sequences_with_offsets(
            df, max_tokens=100, n_shards=4
        ).collect()
    }
    # all ids % 4 == 0 -> same shard; offsets 0,60,120,180,240
    want = {0: (0, 0, 0), 4: (60, 0, 60), 8: (120, 1, 20),
            12: (180, 1, 80), 16: (240, 2, 40)}
    for i, (so, seq, off) in want.items():
        r = out[i]
        assert (r["stream_offset"], r["seq_id"], r["tok_offset"]) == (
            so, seq, off), i


def test_packed_spans_cross_boundary_detection(spark):
    """A span whose start and end land in different sequences must
    flag crosses=True — replayed end-to-end through the driver query
    at sf0.001."""
    out = q_entry_query("q_packed_spans", spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    for r in rows:
        assert 1 <= r["pos_start"] <= 128 and 1 <= r["pos_end"] <= 128
        if r["seq_start"] == r["seq_end"]:
            assert not r["crosses"] and r["pos_start"] <= r["pos_end"]
        else:
            assert r["crosses"] and r["seq_end"] > r["seq_start"]
    assert any(r["crosses"] for r in rows)  # 128-token budget guarantees some


def q_entry_query(name, spark, sf_dir):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name](spark, sf_dir)


# --------------------------------------------------------------------- #
# span corruption + packing report (round 11)
# --------------------------------------------------------------------- #


def test_span_corruption_reconstructs(spark):
    """inputs and targets must jointly reconstruct the original text:
    splicing the target spans back into the sentinel holes gives the
    document back byte-for-byte."""
    from kevinlang_spark.operators.text import span_corruption

    rows = [(i, f"doc {i} " + "abcdefghij" * (3 + i % 5)) for i in range(40)]
    rows += [(100, "too short"), (101, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in span_corruption(df).collect()}
    orig = dict(rows)
    n_ok = 0
    for d, r in out.items():
        if not r["corrupted"]:
            assert r["inputs"] == orig[d] and r["targets"] is None
            continue
        n_ok += 1
        pre, rest = r["inputs"].split("<extra_id_0>", 1)
        gap, tail = rest.split("<extra_id_1>", 1)
        tg = r["targets"]
        assert tg.startswith("<extra_id_0>") and tg.endswith("<extra_id_2>")
        body = tg[len("<extra_id_0>"):-len("<extra_id_2>")]
        sp1, sp2 = body.split("<extra_id_1>", 1)
        assert 3 <= len(sp1) <= 10 and 3 <= len(sp2) <= 10
        assert pre + sp1 + gap + sp2 + tail == orig[d], d
    assert n_ok == 40
    assert not out[100]["corrupted"] and not out[101]["corrupted"]


def test_span_corruption_rejects_small_min_chars(spark):
    """ADVICE r11: min_chars < 20 makes half - len1 + 1 nonpositive
    (modulo by <= 0 → null/overlapping spans); the guard raises at
    entry instead of silently corrupting."""
    import pytest as _pytest

    from kevinlang_spark.operators.text import span_corruption

    df = spark.createDataFrame([(1, "x" * 19)], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="min_chars >= 20"):
        span_corruption(df, min_chars=19)


def test_span_corruption_plan_scan_stage(spark):
    from kevinlang_spark.operators.text import span_corruption
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("some body text that is long enough here").alias("text"),
    )
    plan = executed_plan(span_corruption(df))
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 1  # at most spread()


def test_packing_report_math(spark):
    from kevinlang_spark.operators.text import packing_report

    rows = [
        # one stream (source 's', shard 0): 100 + 300 + 50 = 450 tokens
        (0, "s", 100), (4, "s", 300), (8, "s", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens int")
    out = packing_report(df, max_tokens=128).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3 and r["total_tokens"] == 450
    assert r["n_sequences"] == 4  # ceil(450/128)
    assert r["tail_fill_ratio"] == (450 - 3 * 128) / 128.0
    # pad waste: 100->28, 300->300%128=44 -> 128-44=84, 50->78 = 190
    assert r["padded_waste_tokens"] == 28 + 84 + 78
    # truncation: only the 300-token doc loses 172
    assert r["truncated_tokens"] == 172


def test_bpe_fertility_closed_form(spark):
    """Fertility replays word-by-word: with merge (a,n) applied twice
    in 'banana' (b a n a n a -> b an an a = 4 subtokens)."""
    from kevinlang_spark.operators.text import bpe_fertility

    df = spark.createDataFrame(
        [(1, "banana banana cab", "s1"), (2, "cab", "s2"), (3, None, "s2")],
        "doc_id bigint, text string, source string",
    )
    merges = [(1, "a", "n", 4)]
    out = {r["source"]: r for r in bpe_fertility(df, merges).collect()}
    # s1: banana = 4 subtokens x2, cab = 3 -> 11 tokens / 3 words
    r = out["s1"]
    assert (r["n_words"], r["n_bpe_tokens"], r["n_chars"]) == (3, 11, 15)
    assert r["fertility"] == 11 / 3 and r["chars_per_token"] == 15 / 11
    # s2: one word (NULL doc dropped)
    assert out["s2"]["n_words"] == 1 and out["s2"]["n_bpe_tokens"] == 3


def test_interleave_media_slots_deterministic(spark):
    """Slot counts, positions, and media refs replay the hash rule;
    short/NULL docs yield no slots; positions stay in [0, n]."""
    import hashlib

    from kevinlang_spark.operators.multimodal import interleave_media_slots

    body = "x" * 100
    df = spark.createDataFrame(
        [(0, body), (1, body), (2, body), (5, body),
         (7, "short"), (8, None)],
        "doc_id bigint, text string",
    )
    rows = interleave_media_slots(df, corpus_size=50).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 1, 2, 5}
    for d, rs in by_doc.items():
        assert len(rs) == d % 3 + 1 == rs[0]["n_slots"]
        for r in sorted(rs, key=lambda r: r["slot"]):
            h = int(
                hashlib.md5(f"{d}#img{r['slot']}".encode()).hexdigest()[:13],
                16,
            )
            assert r["char_pos"] == h % 101
            assert r["media_id"] == (d * 3 + r["slot"]) % 50


def test_bitext_mine_margin_math(spark):
    """Hand-built vectors: probe q is near target 100 and far from the
    rest -> high margin accepted; probe q2 sits equidistant from
    everything -> margin ~1, rejected."""
    from kevinlang_spark.operators.similarity import bitext_mine

    targets = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]),
         (102, [0.0, 1.0, 0.0]),
         (104, [0.0, 0.9, 0.1]),
         (106, [0.1, 0.9, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    probes = spark.createDataFrame(
        [(1, [0.99, 0.1, 0.0]),   # hugs target 100
         (3, [0.5, 0.5, 0.35])],  # generic hub direction
        "vec_id bigint, embedding array<float>",
    )
    out = {
        r["qid"]: r for r in bitext_mine(targets, probes, k=4,
                                         threshold=1.2).collect()
    }
    assert out[1]["best_id"] == 100 and out[1]["accepted"]
    assert out[1]["margin"] > 1.2 and out[1]["n_topk"] == 4
    assert not out[3]["accepted"] and out[3]["margin"] < 1.2
    # best_sim is carried as exact 1e-6 integer micros
    assert isinstance(out[1]["best_sim_micros"], int)
    assert 0 < out[1]["best_sim_micros"] <= 1_000_000


def test_reward_agreement_kendall(spark):
    """Hand-checkable tau: prompt 1 perfectly concordant (tau 1),
    prompt 2 perfectly inverted (tau -1), prompt 3 mixed with a tie;
    singleton prompts drop."""
    from kevinlang_spark.operators.preference import reward_agreement

    rows = [
        (1, 0, 10, 1), (1, 1, 20, 2), (1, 2, 30, 3),
        (2, 0, 10, 3), (2, 1, 20, 2), (2, 2, 30, 1),
        (3, 0, 10, 5), (3, 1, 20, 5), (3, 2, 5, 9),
        (4, 0, 1, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "prompt_id bigint, cand_id bigint, reward_a bigint, reward_b bigint",
    )
    out = {r["prompt_id"]: r for r in reward_agreement(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["tau_a"] == 1.0 and out[1]["concordant"] == 3
    assert out[2]["tau_a"] == -1.0 and out[2]["discordant"] == 3
    # prompt 3 pairs (0,1): a up, b tied -> 0; (0,2): a down, b up -> -1;
    # (1,2): a down, b up -> -1  => C=0 D=2 T=1, tau = -4/6
    r3 = out[3]
    assert (r3["concordant"], r3["discordant"], r3["tied"]) == (0, 2, 1)
    assert abs(r3["tau_a"] - (-2 * 2.0 / 6)) < 1e-12


def test_reward_agreement_duplicate_cand_ids_keep_full_census(spark):
    """ADVICE r11: id-inequality pairing dropped pairs between
    duplicate cand_id values while tau_a still divided by n(n-1).
    Position pairing over the sorted structs keeps C + D + T ==
    n(n-1)/2 for every input."""
    from kevinlang_spark.operators.preference import reward_agreement

    rows = [  # prompt 1: THREE candidates all sharing cand_id 0
        (1, 0, 10, 1), (1, 0, 20, 2), (1, 0, 30, 3),
        (2, 5, 1, 2), (2, 5, 3, 1),  # one duplicate pair, inverted
    ]
    df = spark.createDataFrame(
        rows,
        "prompt_id bigint, cand_id bigint, reward_a bigint, reward_b bigint",
    )
    out = {r["prompt_id"]: r for r in reward_agreement(df).collect()}
    r1 = out[1]
    assert r1["n_cands"] == 3
    assert (r1["concordant"], r1["discordant"], r1["tied"]) == (3, 0, 0)
    assert r1["tau_a"] == 1.0
    r2 = out[2]
    assert (r2["concordant"], r2["discordant"], r2["tied"]) == (0, 1, 0)
    assert r2["tau_a"] == -1.0


def test_length_bucket_batches_math(spark):
    from kevinlang_spark.operators.text import length_bucket_batches

    df = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (100,), (120,), (0,)], "n_tokens int"
    )
    out = {r["bucket"]: r for r in length_bucket_batches(
        df, token_budget=256).collect()}
    # n=1 -> bucket 0; n=2 -> bucket 1; n=3,4 -> bucket 2; 100,120 -> 7
    assert set(out) == {0, 1, 2, 7}
    b2 = out[2]
    assert (b2["max_len"], b2["n_docs"], b2["total_tokens"]) == (4, 2, 7)
    assert b2["batch_size"] == 64 and b2["n_batches"] == 1
    assert b2["pad_waste_tokens"] == 2 * 4 - 7
    b7 = out[7]
    assert b7["max_len"] == 128 and b7["batch_size"] == 2
    assert b7["pad_waste_tokens"] == 2 * 128 - 220
    # zero-token docs dropped
    assert sum(r["n_docs"] for r in out.values()) == 6


def test_length_bucket_integer_log2_at_large_powers_of_two(spark):
    """ADVICE r11: float LOG2(2^29) = 29.000000000000004 in Spark, so a
    float-ceil bucket put 2^29 into bucket 30.  The integer bit-length
    bucket must keep every exact power of two n = 2^k in bucket k."""
    from kevinlang_spark.operators.text import length_bucket_batches

    df = spark.createDataFrame(
        [(2**29,), (2**29 + 1,), (2**31,), (2**39,)], "n_tokens bigint"
    )
    out = {r["bucket"]: r for r in length_bucket_batches(
        df, token_budget=4096).collect()}
    assert set(out) == {29, 30, 31, 39}
    assert out[29]["max_len"] == 2**29 and out[29]["n_docs"] == 1
    assert out[30]["n_docs"] == 1  # 2^29 + 1 genuinely needs bucket 30


def test_epoch_shuffle_keys_properties(spark):
    """Each epoch's permutation is independent and replayable: keys
    match the hashlib replay; the same id gets different keys across
    epochs; n_epochs guard."""
    import hashlib

    import pytest as _pytest

    from kevinlang_spark.operators.sampling import epoch_shuffle_keys

    df = spark.range(20).select(F.col("id").alias("doc_id"))
    rows = epoch_shuffle_keys(df, n_epochs=2).collect()
    assert len(rows) == 40
    for r in rows:
        h = int(
            hashlib.md5(f"{r['doc_id']}#ep{r['epoch']}".encode())
            .hexdigest()[:13], 16,
        )
        assert r["shuffle_key"] == h
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], set()).add(r["shuffle_key"])
    assert all(len(v) == 2 for v in by_id.values())
    with _pytest.raises(ValueError, match="n_epochs"):
        epoch_shuffle_keys(df, n_epochs=0)


def test_quality_retention_curve_math(spark):
    """20 docs, distinct scores, 4 bins -> 5 docs per bin; cumulative
    token mass is the running sum from the best bin down."""
    from kevinlang_spark.operators.text import quality_retention_curve

    rows = [(i, 100 - i, 10 + i) for i in range(20)]  # score desc = id asc
    df = spark.createDataFrame(rows, "doc_id bigint, score int, n_tokens int")
    out = sorted(
        quality_retention_curve(df, n_bins=4).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in out] == [0, 1, 2, 3]
    assert all(r["n_docs"] == 5 for r in out)
    # bin 0 holds the 5 best scores = ids 0..4 -> tokens 10+11+..+14
    assert out[0]["total_tokens"] == sum(10 + i for i in range(5))
    assert out[-1]["cum_tokens"] == sum(10 + i for i in range(20))
    # tied scores never straddle bins: one score with mass 8 of 10 docs
    rows2 = [(i, 1 if i < 8 else 0, 5) for i in range(10)]
    df2 = spark.createDataFrame(rows2, "doc_id bigint, score int, n_tokens int")
    out2 = {r["bin"]: r for r in quality_retention_curve(df2, n_bins=5).collect()}
    assert out2[0]["n_docs"] == 8 and out2[4]["n_docs"] == 2


def test_quality_retention_curve_quantizes_continuous_scores(spark):
    """VERDICT r11: a raw continuous double score must NOT degenerate
    the grid to one cell per document — the default quantize buckets
    scores to 1e-4 cells, so near-identical doubles merge while
    well-separated ones keep their order."""
    import pytest as _pytest

    from kevinlang_spark.operators.text import quality_retention_curve

    rows = [  # two clusters of scores inside one 1e-4 cell each
        (1, 0.500000, 10), (2, 0.50000004, 20),
        (3, 0.100000, 1), (4, 0.10000002, 2),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, score double, n_tokens int")
    out = {r["bin"]: r for r in quality_retention_curve(df, n_bins=2).collect()}
    # each cluster is ONE grid cell; ties-never-straddle keeps them whole
    assert out[0]["n_docs"] == 2 and out[0]["total_tokens"] == 30
    assert out[1]["n_docs"] == 2 and out[1]["total_tokens"] == 3
    # quantize=None reverts to raw grouping (caller owns the bound)
    raw = quality_retention_curve(df, n_bins=2, quantize=None).collect()
    assert sum(r["n_docs"] for r in raw) == 4
    with _pytest.raises(ValueError, match="quantize"):
        quality_retention_curve(df, quantize=0)
