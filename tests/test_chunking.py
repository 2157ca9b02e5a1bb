"""chunk_tokens / clean_lines / pack_sequences — shaping-stage semantics
the oracle queries don't fully exercise (empty docs, terminal punctuation,
packing budget invariants, plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kevinlang_spark.operators.chunking import (
    chunk_tokens,
    clean_lines,
    pack_sequences,
)
from kevinlang_spark.plans.inspect import executed_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_tokens_windows_and_partial_tail(spark):
    df = _docs(spark, [(1, "a b c d e f g"), (2, "x y"), (3, ""), (4, None)])
    out = chunk_tokens(df, chunk_size=3).orderBy("id", "chunk_id").collect()
    got = [(r.id, r.chunk_id, r.chunk_text, r.chunk_tokens) for r in out]
    assert got == [
        (1, 0, "a b c", 3),
        (1, 1, "d e f", 3),
        (1, 2, "g", 1),
        (2, 0, "x y", 2),
    ]  # empty/NULL docs emit no chunks


def test_chunk_tokens_reassembles_document(spark):
    text = " ".join(f"tok{i}" for i in range(100))
    df = _docs(spark, [(7, text)])
    out = chunk_tokens(df, chunk_size=32).orderBy("chunk_id").collect()
    assert " ".join(r.chunk_text for r in out) == text
    assert sum(r.chunk_tokens for r in out) == 100


def test_clean_lines_min_words_terminal_and_blocklist(spark):
    text = "\n".join(
        [
            "short line",  # < 3 words → dropped
            "this line has enough words.",  # kept
            "no terminal punctuation here at all",  # dropped (terminal rule)
            "the SPAM word is banned here.",  # dropped (blocklist, case-insens.)
            "   ",  # empty after trim → not counted at all
        ]
    )
    out = clean_lines(
        _docs(spark, [(1, text)]),
        min_words=3,
        require_terminal=True,
        blocklist=("spam",),
    ).collect()[0]
    assert out.cleaned_text == "this line has enough words."
    assert out.n_lines_kept == 1
    assert out.n_lines_total == 4


def test_clean_lines_no_rules_keeps_everything(spark):
    out = clean_lines(
        _docs(spark, [(1, "a\nb\nc")]), min_words=0
    ).collect()[0]
    assert out.cleaned_text == "a\nb\nc"
    assert (out.n_lines_kept, out.n_lines_total) == (3, 3)


def test_pack_sequences_budget_and_determinism(spark):
    # 10 docs of 30 tokens in one source; shard = id % 2
    rows = [(i, " ".join(["w"] * 30), "s") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = pack_sequences(
        df, max_tokens=64, part_cols=("source",), n_shards=2
    ).collect()
    by_id = {r.id: r for r in out}
    # within a shard, ids pack in order: first tokens at offsets 0,30,60,...
    for r in out:
        ids_before = [
            i for i in by_id if i % 2 == r.shard and i < r.id
        ]
        offset = 30 * len(ids_before)
        assert r.seq_id == offset // 64, r
    # a sequence never exceeds the budget in START offsets (spread ≤ budget)
    assert all(r.n_tokens == 30 for r in out)
    # deterministic: re-run gives the identical assignment
    out2 = pack_sequences(
        df, max_tokens=64, part_cols=("source",), n_shards=2
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_chunking_ops_stay_jvm_side(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (
        chunk_tokens(docs),
        clean_lines(docs),
        pack_sequences(docs, n_shards=4),
    ):
        plan = executed_plan(df)
        assert "EvalPython" not in plan, plan


def test_pack_sequences_window_is_sharded(spark, sf_dir):
    """The packing window must partition by (source, shard) — an
    unpartitioned ordered window would serialize the corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = executed_plan(pack_sequences(docs, n_shards=4))
    assert "partitionBy=[]" not in plan.replace(" ", ""), plan
