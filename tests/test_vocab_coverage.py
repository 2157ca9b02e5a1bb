"""Vocabulary/OOV coverage diagnostic (text.vocab_coverage) and the
GROUPING SETS member of the cube/rollup trio."""

from __future__ import annotations

import pytest

from kevinlang_spark.operators.text import vocab_coverage


def test_vocab_coverage_hand_computed(spark):
    # vocab_size=2 → df ranking: "spark" df=3, "join" df=2, "scan" df=1
    # (ties impossible here); vocab = [spark, join]
    df = spark.createDataFrame(
        [
            (1, "spark join spark", "a"),   # 3 tokens, 0 oov
            (2, "spark scan", "a"),         # 2 tokens, 1 oov (scan)
            (3, "join spark", "b"),         # 2 tokens, 0 oov
        ],
        "doc_id bigint, text string, source string",
    )
    out = {
        r["source"]: r
        for r in vocab_coverage(df, vocab_size=2, by="source").collect()
    }
    assert out["a"]["n_docs"] == 2
    assert out["a"]["total_tokens"] == 5
    assert out["a"]["oov_tokens"] == 1
    assert out["a"]["oov_rate"] == pytest.approx(0.2)
    assert out["b"]["oov_tokens"] == 0
    assert out["b"]["oov_rate"] == 0.0


def test_vocab_coverage_corpus_rollup_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, None)], "doc_id bigint, text string"
    )
    rows = vocab_coverage(df, vocab_size=10).collect()
    assert len(rows) == 1
    r = rows[0]
    # NULL-text doc contributes to nothing (not even n_docs)
    assert (r["n_docs"], r["total_tokens"], r["oov_tokens"]) == (1, 2, 0)


def test_vocab_coverage_vocab_rank_is_df_not_tf(spark):
    # "rare" appears 10× in ONE doc; "common" once in each of 2 docs —
    # document frequency must rank "common" above "rare"
    df = spark.createDataFrame(
        [(1, " ".join(["rare"] * 10)), (2, "common x"), (3, "common y")],
        "doc_id bigint, text string",
    )
    out = vocab_coverage(df, vocab_size=1).collect()[0]
    # vocab = [common]; oov = 10 rare + x + y = 12 of 14
    assert out["total_tokens"] == 14
    assert out["oov_tokens"] == 12


def test_vocab_coverage_param_guard(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="vocab_size"):
        vocab_coverage(df, vocab_size=0)


def test_grouping_sets_skips_per_nation_stream(spark, sf_dir):
    """q_grouping_sets emits detail/per-year/grand-total but NOT the
    per-nation subtotals a rollup would include."""
    import __spark_entry__ as entry

    rows = entry.queries()["q_grouping_sets"](spark, sf_dir).collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 2, 3}  # 1 (= per-nation, year grouped) must be absent
    assert sum(1 for r in rows if r["gid"] == 3) == 1  # one grand total
