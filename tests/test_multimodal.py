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


def test_real_decode_quarantines_without_codecs(media):
    """In codec-less environments real_decode raises per payload; the
    extractor routes those rows to null features (quarantine) instead of
    killing the task — the raw decoder still raises directly (see
    test_stdlib_decode_rejects_garbage for the ValueError twin)."""
    rows = multimodal.extract_media_features(
        media.limit(1), decode=multimodal.real_decode
    ).collect()
    assert len(rows) == 1
    assert rows[0]["width"] is None and rows[0]["n_frames"] is None
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"payload", "video")


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


# --------------------------------------------------------------------- #
# stdlib container decode (real bytes, zero codecs)
# --------------------------------------------------------------------- #


def test_stdlib_decode_real_containers():
    import struct

    from kevinlang_spark.operators.multimodal import (
        make_bmp,
        make_wav,
        stdlib_decode,
    )

    assert stdlib_decode(make_bmp(17, 9), "image") == {
        "width": 17, "height": 9, "n_frames": 1
    }
    assert stdlib_decode(make_wav(123), "audio")["n_frames"] == 123
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 320, 200, 8, 2, 0, 0, 0)
    )
    assert stdlib_decode(png, "image")["width"] == 320
    gif = b"GIF89a" + struct.pack("<HH", 99, 44)
    assert stdlib_decode(gif, "image")["height"] == 44
    jpg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 8) + b"\x08"
        + struct.pack(">HH", 240, 360) + b"\x03"
    )
    assert stdlib_decode(jpg, "image") == {
        "width": 360, "height": 240, "n_frames": 1
    }


def test_stdlib_decode_rejects_garbage():
    import pytest as _pytest

    from kevinlang_spark.operators.multimodal import stdlib_decode

    with _pytest.raises(ValueError):
        stdlib_decode(b"nonsense bytes", "image")
    with _pytest.raises(ValueError):
        stdlib_decode(b"RIFFxxxx", "audio")
    with _pytest.raises(NotImplementedError):
        stdlib_decode(b"anything", "video")


def test_corrupt_payload_quarantines_not_kills(spark):
    from kevinlang_spark.operators.multimodal import (
        extract_media_features,
        make_bmp,
        stdlib_decode,
    )

    rows = [
        (1, "image", bytearray(make_bmp(5, 4))),
        (2, "image", bytearray(b"corrupt!!")),
        (3, "image", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary"
    )
    out = {
        r.doc_id: (r.width, r.height)
        for r in extract_media_features(df, decode=stdlib_decode).collect()
    }
    assert out[1] == (5, 4)
    assert out[2] == (None, None)  # quarantined, task alive
    assert out[3] == (None, None)


def test_stdlib_media_decode_roundtrip_on_spark(spark):
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_media_features,
        stdlib_decode,
    )

    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    out = {
        r.doc_id: (r.media_type, r.width, r.n_frames)
        for r in extract_media_features(
            attach_stdlib_media(docs), decode=stdlib_decode
        ).collect()
    }
    assert out[4] == ("image", 4 % 64 + 1, 1)
    assert out[7] == ("audio", None, 7 % 1000 + 1)


def test_pixel_decode_reads_actual_bmp_pixels():
    """Full BMP decode: channel means come from the real BGR bytes,
    row padding excluded."""
    from kevinlang_spark.operators.multimodal import make_bmp, stdlib_pixel_decode

    out = stdlib_pixel_decode(make_bmp(5, 3, rgb=(200, 100, 50)), "image")
    assert out["width"] == 5 and out["height"] == 3 and out["n_frames"] == 1
    # 5*3 = 15 bytes/row -> 1 pad byte/row; a decoder that includes the
    # zero padding or swaps BGR->RGB gets different numbers
    assert out["mean_r"] == 200.0
    assert out["mean_g"] == 100.0
    assert out["mean_b"] == 50.0


def test_pixel_decode_reads_actual_wav_samples():
    from kevinlang_spark.operators.multimodal import make_wav, stdlib_pixel_decode

    out = stdlib_pixel_decode(make_wav(7, amplitude=-1234), "audio")
    assert out["n_frames"] == 7
    assert out["rms"] == 1234.0 and out["peak"] == 1234.0


def test_pixel_decode_rejects_unsupported():
    import pytest as _pytest

    from kevinlang_spark.operators.multimodal import (
        make_bmp,
        make_wav,
        stdlib_pixel_decode,
    )

    with _pytest.raises(ValueError):
        stdlib_pixel_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40, "image")  # compressed
    with _pytest.raises(ValueError):
        stdlib_pixel_decode(make_bmp(4, 4)[:40], "image")  # truncated
    with _pytest.raises(ValueError):
        stdlib_pixel_decode(make_wav(5)[:20], "audio")  # truncated
    with _pytest.raises(ValueError):
        stdlib_pixel_decode(b"junk", "video")


def test_pixel_stats_on_spark(spark):
    """End-to-end: synthesized filled containers -> mapInPandas full
    decode -> stats match the generation formula for both media types."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_pixel_stats,
    )

    docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    out = {
        r["doc_id"]: r
        for r in extract_pixel_stats(attach_stdlib_media(docs, filled=True)).collect()
    }
    assert len(out) == 20
    for d, r in out.items():
        if d % 2 == 0:
            assert r["media_type"] == "image"
            assert (r["width"], r["height"]) == (d % 64 + 1, d % 48 + 1)
            assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
                float(d % 256), float(d * 3 % 256), float(d * 7 % 256))
            assert r["rms"] is None
        else:
            assert r["media_type"] == "audio"
            assert r["n_frames"] == d % 1000 + 1
            assert r["rms"] == float(d % 2048) == r["peak"]
            assert r["width"] is None
