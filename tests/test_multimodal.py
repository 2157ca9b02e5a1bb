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
        stdlib_pixel_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40, "image")  # no IHDR/IDAT
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


def test_png_roundtrip_all_filter_types():
    """make_png encodes a deterministic gradient under each of the five
    PNG scanline predictors; _png_pixels must invert every one back to
    the identical pixel grid (spec §4.5 unfiltering)."""
    import numpy as np

    from kevinlang_spark.operators.multimodal import make_png, stdlib_pixel_decode

    h, w = 7, 11
    grad = np.fromfunction(
        lambda y, x, c: (13 * y + 29 * x + 71 * c) % 256, (h, w, 3)
    ).astype("uint8")
    for ftype in range(5):
        payload = make_png(w, h, pixels=grad, filter_type=ftype)
        out = stdlib_pixel_decode(payload, "image")
        assert (out["width"], out["height"], out["n_frames"]) == (w, h, 1)
        assert out["mean_r"] == float(grad[:, :, 0].mean())
        assert out["mean_g"] == float(grad[:, :, 1].mean())
        assert out["mean_b"] == float(grad[:, :, 2].mean())


def test_png_grey_and_rgba_paths():
    """Hand-built 8-bit greyscale and RGBA PNGs (stdlib zlib, filter 0):
    grey replicates into all three channel means; RGBA excludes alpha."""
    import struct
    import zlib

    from kevinlang_spark.operators.multimodal import stdlib_pixel_decode

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def png(w, h, color_type, rows):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in rows)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    grey = png(2, 2, 0, [bytes([10, 20]), bytes([30, 40])])
    out = stdlib_pixel_decode(grey, "image")
    assert out["mean_r"] == out["mean_g"] == out["mean_b"] == 25.0
    assert (out["width"], out["height"]) == (2, 2)

    rgba = png(
        1, 2, 6, [bytes([100, 150, 200, 255]), bytes([0, 50, 100, 0])]
    )
    out = stdlib_pixel_decode(rgba, "image")
    assert (out["mean_r"], out["mean_g"], out["mean_b"]) == (50.0, 100.0, 150.0)


def test_png_unsupported_and_corrupt_raise():
    import pytest as _pytest

    from kevinlang_spark.operators.multimodal import make_png, stdlib_pixel_decode

    good = make_png(5, 4, rgb=(9, 9, 9))
    with _pytest.raises(ValueError):
        stdlib_pixel_decode(good[:30], "image")  # truncated chunk stream
    # 16-bit depth is outside the honest codec-free subset
    bad_depth = bytearray(good)
    bad_depth[24] = 16
    with _pytest.raises(ValueError):
        stdlib_pixel_decode(bytes(bad_depth), "image")


def test_pixel_stats_include_png_containers(spark):
    """attach_stdlib_media(png=True): doc_id % 4 == 2 images travel as
    real PNGs; decoded stats still equal the generation formula."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_pixel_stats,
    )

    docs = spark.range(0, 16).select(F.col("id").alias("doc_id"))
    media = attach_stdlib_media(docs, filled=True, png=True)
    # the table really contains both containers
    magic = {
        int(r["doc_id"]): bytes(r["payload"])[:2]
        for r in media.where(F.col("media_type") == "image").collect()
    }
    assert all(m == b"\x89P" for d, m in magic.items() if d % 4 == 2)
    assert all(m == b"BM" for d, m in magic.items() if d % 4 == 0)
    out = {r["doc_id"]: r for r in extract_pixel_stats(media).collect()}
    for d in range(0, 16, 2):
        r = out[d]
        assert (r["width"], r["height"]) == (d % 64 + 1, d % 48 + 1)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            float(d % 256),
            float(d * 3 % 256),
            float(d * 7 % 256),
        )
