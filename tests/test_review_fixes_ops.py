"""Regression tests for the operator-module review findings."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators import dedup, multimodal, similarity
from kevinlang_spark.operators.text import lang_id, quality_score


def test_quality_score_token_free_text_is_low(spark):
    df = spark.createDataFrame([("!!!",), ("",), ("?? ~~ ##",)], ["text"])
    vals = [r["q"] for r in df.select(quality_score(F.col("text")).alias("q")).collect()]
    # no tokens → no stopword credit, no length credit, no alpha → ~0
    assert all(v is not None and v < 0.05 for v in vals), vals


def test_lang_id_german_ascii_markers(spark):
    df = spark.createDataFrame(
        [("der hund und die katze ist hier mit das buch",)], ["t"]
    )
    assert df.select(lang_id(F.col("t")).alias("l")).first()["l"] == "de"


def test_minhash_band_validation(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="multiple of"):
        dedup.minhash_lsh_candidates(docs, num_hashes=64, bands=128)
    with pytest.raises(ValueError, match="multiple of"):
        dedup.minhash_lsh_candidates(docs, num_hashes=100, bands=16)


def test_simhash_pigeonhole_validation(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_neardup_pairs(docs, max_hamming=4, blocks=4)


def test_ann_lsh_multibit_probe(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    # probe_hamming=2 must scan a superset of probe_hamming=1's buckets
    got1 = {r["vec_id"] for r in similarity.ann_topk_lsh(emb, q, k=50, probe_hamming=1).collect()}
    got2 = {r["vec_id"] for r in similarity.ann_topk_lsh(emb, q, k=50, probe_hamming=2).collect()}
    assert 0 in got2
    assert len(got2) >= len(got1)


def test_embedding_neardup_null_embeddings(spark):
    df = spark.createDataFrame(
        [(1, None, 0), (2, None, 0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    assert similarity.embedding_neardup_pairs(df).count() == 0


def test_multimodal_null_payload(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"abc")), (2, "audio", None)],
        "doc_id bigint, media_type string, payload binary",
    )
    rows = {r["doc_id"]: r for r in multimodal.extract_media_features(df).collect()}
    assert rows[1]["n_bytes"] == 3
    assert rows[2]["n_bytes"] is None and rows[2]["n_frames"] is None


def test_sample_frames_zero_frame_video(spark):
    def zero_decode(payload, media_type):
        return {"width": 1, "height": 1, "n_frames": 0}

    df = spark.createDataFrame(
        [(3, "video", bytearray(b"x"))],
        "doc_id bigint, media_type string, payload binary",
    )
    feats = multimodal.extract_media_features(df, decode=zero_decode)
    frames = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(30)),
    ).otherwise(F.array().cast("array<int>"))
    assert feats.select(F.explode(frames)).count() == 0


def test_asof_tie_deterministic(spark):
    from kevinlang_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    trades = spark.createDataFrame([(1, "A", t0)], ["trade_id", "sym", "ts"])
    # two quotes at the IDENTICAL (key, ts): result must be stable
    quotes = spark.createDataFrame(
        [("A", t0, 10.0), ("A", t0, 20.0)], ["sym", "ts", "bid"]
    )
    vals = {
        asof_join(trades, quotes, on="sym", right_cols=["bid"]).first()["bid"]
        for _ in range(3)
    }
    assert vals == {20.0}  # greatest struct wins, every run


def test_range_join_shared_column_name(spark):
    from kevinlang_spark.operators.joins import range_join_binned

    t = dt.datetime(2024, 1, 1, 10, 30, 0)
    points = spark.createDataFrame([(1, t)], ["pid", "ts"])
    intervals = spark.createDataFrame(
        [("w", dt.datetime(2024, 1, 1, 10, 0, 0), dt.datetime(2024, 1, 1, 11, 0, 0),
          dt.datetime(2024, 1, 1))],
        ["iv", "start", "end", "ts"],  # intervals ALSO have a 'ts' column
    )
    out = range_join_binned(points, intervals, None, "ts", "start", "end")
    assert out.count() == 1
