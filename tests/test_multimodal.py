"""Multimodal binary-column plumbing (decode stubbed, Spark shape real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.attach_fake_media(docs)


def test_payload_is_binary(media):
    assert dict(media.dtypes)["payload"] == "binary"


def test_extract_features_schema_and_counts(media):
    out = multimodal.extract_media_features(media)
    assert out.columns == [
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames", "checksum",
    ]
    assert out.count() == media.count()
    row = out.where(F.col("media_type") == "image").first()
    assert row["width"] is not None and row["n_frames"] == 1
    audio = out.where(F.col("media_type") == "audio").first()
    assert audio["width"] is None and audio["n_frames"] >= 1


def test_features_deterministic(media):
    a = sorted(multimodal.extract_media_features(media).collect())
    b = sorted(multimodal.extract_media_features(media).collect())
    assert a == b


def test_checksum_matches_bytes(media, spark):
    out = multimodal.extract_media_features(media.limit(5))
    joined = out.join(media.limit(5), ["doc_id"])
    for r in joined.select("checksum", "payload").collect():
        import hashlib

        assert r["checksum"] == hashlib.md5(bytes(r["payload"])).hexdigest()


def test_real_decode_raises(media):
    out = multimodal.extract_media_features(media.limit(1), decode=multimodal.real_decode)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        out.collect()


def test_sample_frames_only_video(media):
    frames = multimodal.sample_frames(media.limit(30), every_n=50)
    rows = frames.collect()
    assert len(rows) > 0
    assert all(r["frame_idx"] % 50 == 0 for r in rows)


def test_real_decode_with_pil_if_available(spark):
    """The real_decode plug point, exercised end-to-end when PIL exists
    (skipped in codec-less environments): a real PNG payload through the
    same mapInPandas plumbing yields the actual pixel dimensions."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 23)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()))],
        "doc_id bigint, media_type string, payload binary",
    )
    row = multimodal.extract_media_features(df, decode=multimodal.real_decode).first()
    assert (row["width"], row["height"], row["n_frames"]) == (17, 23, 1)


def test_real_decode_image_without_pil_raises():
    """Without PIL the image path must raise NotImplementedError directly
    (plain function, no Spark needed)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; covered by the end-to-end test")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.real_decode(b"\x89PNG", "image")
    with pytest.raises(NotImplementedError, match="codecs"):
        multimodal.real_decode(b"", "video")
