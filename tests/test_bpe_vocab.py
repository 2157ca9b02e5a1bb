"""Production-vocab local BPE trainer (text.py bpe_train_local,
VERDICT r11 item 2): parity with the distributed trainer, the
incremental pair-count bookkeeping vs a brute-force recount reference,
merge-count invariants, and the driver-query wiring."""

from __future__ import annotations

import pytest

from kevinlang_spark.operators.text import (
    bpe_merges_local_df,
    bpe_train,
    bpe_train_local,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog 00912 00913",
    "pack my box with five dozen liquor jugs 00914 00915 00912",
    "the five boxing wizards jump quickly 00913 00912",
    "sphinx of black quartz judge my vow the the the",
]


def _corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


def _brute_force(df, n_merges):
    """Independent reference: full recount of overlapping adjacent
    pairs every round — no heap, no index, no deltas."""
    rows = (
        df.selectExpr(
            "explode(filter(split(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '')) AS w"
        )
        .groupBy("w")
        .count()
        .collect()
    )
    vocab = {tuple(r["w"]): int(r["count"]) for r in rows}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, n))
        new_vocab: dict = {}
        for seq, f in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_local_trainer_matches_distributed_first_rounds(spark):
    """The first 8 merges (the oracle-covered regime of q_bpe_train)
    must be byte-identical between the two trainers — same argmax pair,
    same tie-breaks, same pair counts."""
    df = _corpus_df(spark)
    assert bpe_train_local(df, n_merges=8) == bpe_train(df, n_merges=8)


def test_local_trainer_matches_brute_force_to_exhaustion(spark):
    """The lazy-heap + delta-update bookkeeping must agree with a full
    per-round recount all the way to pair exhaustion."""
    df = _corpus_df(spark)
    got = bpe_train_local(df, n_merges=10_000)
    want = _brute_force(df, 10_000)
    assert got == want
    assert len(got) < 10_000  # genuinely exhausted, loop terminated


def test_merge_counts_never_increase(spark):
    """Max-pair count is non-increasing over rounds: a merge-created
    pair occurs at most once per occurrence of the merged token, so no
    later argmax can exceed an earlier one."""
    got = bpe_train_local(_corpus_df(spark), n_merges=10_000)
    assert all(got[i][3] >= got[i + 1][3] for i in range(len(got) - 1))
    assert all(got[i][0] == i + 1 for i in range(len(got)))  # dense ranks


def test_vocab_cap_guard(spark):
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train_local(_corpus_df(spark), n_merges=4, max_vocab_rows=3)


def test_merges_local_df_schema(spark):
    out = bpe_merges_local_df(_corpus_df(spark), n_merges=5)
    assert [f.name for f in out.schema.fields] == [
        "merge_rank", "tok_a", "tok_b", "pair_count",
    ]
    assert out.count() == 5


def test_q_bpe_train_vocab_reaches_production_merge_counts(spark, sf_dir):
    """The registered driver query must deliver >= 100 merges even at
    the smallest test scale (sf0.001; the driver's sf0.01 run exceeds
    1000) with dense ranks and non-increasing counts."""
    import __spark_entry__ as entry

    rows = entry.queries()["q_bpe_train_vocab"](spark, sf_dir).collect()
    assert len(rows) >= 100
    ranks = [r["merge_rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    counts = [r["pair_count"] for r in rows]
    assert all(counts[i] >= counts[i + 1] for i in range(len(counts) - 1))


def _brute_force_core(words, freqs, n_merges):
    """Pure-Python per-round full recount over explicit (words, freqs)
    state — the reference for _bpe_train_core's heap bookkeeping."""
    vocab: dict = {}
    for seq, f in zip(words, freqs):
        vocab[tuple(seq)] = vocab.get(tuple(seq), 0) + f
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, n))
        new_vocab: dict = {}
        for seq, f in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_heap_discipline_stale_entry_stress():
    """r12 optimization: _bpe_train_core discards stale heap entries on
    pop (one fresh entry per changed pair per merge) instead of
    re-queueing.  This stresses exactly the hazardous trajectories:
    pair counts that DECREASE (stale overestimates in the heap), then
    REBOUND to a previously-pushed value (duplicate equal-value
    entries), under heavy tie-breaking — and demands byte-parity with
    a full per-round recount."""
    from kevinlang_spark.operators.text import _bpe_train_core

    # 'aba' chains make (a,b)/(b,a) counts interleave and rebound as
    # merges rewrite them; the rotated suffixes force ties broken by
    # (tok_a, tok_b) order; freqs are primes so no accidental equality.
    base = ["ababab", "bababa", "aabb", "bbaa", "abba", "baab"]
    words = [list(w * (i % 3 + 1)) for i, w in enumerate(base * 4)]
    freqs = [f for f in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37,
                         41, 43, 47, 53, 59, 61, 67, 71, 73, 79, 83, 89)]
    import copy

    got_words = copy.deepcopy(words)
    got = _bpe_train_core(got_words, list(freqs), 50)
    want = _brute_force_core(words, freqs, 50)
    assert got == want
    # the rewritten word states must match a fresh left-to-right replay
    # of the merge list (training state == encoding, the sweep property)
    for seq0, seq1 in zip(words, got_words):
        cur = list(seq0)
        for _, a, b, _n in got:
            out, i = [], 0
            while i < len(cur):
                if i + 1 < len(cur) and cur[i] == a and cur[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(cur[i])
                    i += 1
            cur = out
        assert cur == seq1


def test_vocab_sweep_matches_encode_state(spark):
    """The sweep's token total at checkpoint k must equal encoding the
    corpus with the first k merges (the trajectory-replay property),
    fertility 1.0 exactly at saturation, monotone totals, and the
    char-level row at n_merges=0."""
    from kevinlang_spark.operators.text import (
        bpe_encode_words,
        bpe_train_local,
        bpe_vocab_sweep,
    )

    df = _corpus_df(spark)
    out = {r["n_merges"]: r for r in bpe_vocab_sweep(
        df, checkpoints=(4, 16, 10_000)).collect()}
    assert set(out) == {0, 4, 16, 10_000}
    totals = [out[k]["total_tokens"] for k in (0, 4, 16, 10_000)]
    assert totals == sorted(totals, reverse=True)
    assert out[10_000]["fertility"] == 1.0  # saturated: 1 token per word
    assert out[10_000]["n_merges_effective"] < 10_000
    assert out[0]["chars_per_token"] == 1.0
    # independent replay: encode distinct words with the first 4 merges
    merges = bpe_train_local(df, n_merges=4)
    words = df.selectExpr(
        "explode(filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w"
    ).groupBy("w").count()
    enc = bpe_encode_words(words.select("w"), merges)
    joined = enc.join(words, "w")
    want = sum(
        r["n_subtokens"] * r["count"] for r in joined.collect()
    )
    assert out[4]["total_tokens"] == want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="checkpoints"):
        bpe_vocab_sweep(df, checkpoints=())


def test_arrow_encode_matches_python_replay_on_edge_words(spark):
    """r12 optimization: bpe_encode_words' Arrow UDF must replay the old
    Catalyst fold exactly — including the regexp '(.)' seed quirks (line
    terminators glue to the following char's token; trim strips spaces
    only) and the left-to-right non-overlapping merge scan — so its
    subtokens equal bpe_encode_word_py for plain words, and n_subtokens
    always equals the split-on-space count of the subtoken string."""
    from kevinlang_spark.operators.text import (
        bpe_encode_word_py,
        bpe_encode_words,
    )

    merges = [
        (1, "l", "l", 9),
        (2, "ll", "o", 7),
        (3, "h", "e", 5),
        (4, "a", "b", 3),
    ]
    words = ["hello", "llll", "lllll", "ababab", "x", "he", "", "llo"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    out = {r["w"]: r for r in bpe_encode_words(df, merges).collect()}
    for w in words:
        want = bpe_encode_word_py(w, merges)
        got = out[w]["subtokens"].split(" ")
        assert got == (want if want else [""]), (w, got, want)
        assert out[w]["n_subtokens"] == len(out[w]["subtokens"].split(" "))
