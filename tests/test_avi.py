"""AVI Motion-JPEG video tier (multimodal.py make_avi /
_avi_mjpeg_frames): container round-trips through the real per-frame
JPEG entropy decode, quarantine gates fire for non-MJPEG codecs and
malformed trees, and the frame-sampling extractor rides the same path."""

from __future__ import annotations

import pytest

from kevinlang_spark.operators.jpeg import make_jpeg
from kevinlang_spark.operators.multimodal import (
    _avi_mjpeg_frames,
    make_avi,
    stdlib_pixel_decode,
)


def _avi(d: int) -> bytes:
    w, h, n = d % 64 + 1, d % 48 + 1, d % 3 + 1
    return make_avi(
        w, h, [make_jpeg(w, h, gray=(d + f) % 256) for f in range(n)]
    )


def test_roundtrip_constant_frames_bit_exact():
    for d in (0, 2, 4, 62, 254, 510, 1022):
        w, h, n = d % 64 + 1, d % 48 + 1, d % 3 + 1
        got_w, got_h, frames = _avi_mjpeg_frames(_avi(d))
        assert (got_w, got_h, frames.shape[0]) == (w, h, n)
        assert frames.shape[1:] == (h, w, 3)
        for f in range(n):
            assert (frames[f] == (d + f) % 256).all()


def test_pixel_stats_closed_form():
    d = 8  # 3 frames: grays 8, 9, 10
    stats = stdlib_pixel_decode(_avi(d), "video")
    assert stats["width"] == d % 64 + 1
    assert stats["height"] == d % 48 + 1
    assert stats["n_frames"] == 3
    assert stats["mean_r"] == pytest.approx(9.0)
    assert stats["mean_r"] == stats["mean_g"] == stats["mean_b"]


def test_quarantine_gates():
    with pytest.raises(ValueError, match="AVI-MJPEG only"):
        _avi_mjpeg_frames(b"RIFF\x00\x00\x00\x00WAVEfmt ")
    good = _avi(2)
    with pytest.raises(ValueError, match="not MJPEG"):
        _avi_mjpeg_frames(good.replace(b"vidsMJPG", b"vidsH264"))
    with pytest.raises(ValueError, match="truncated"):
        _avi_mjpeg_frames(good[:-7])
    with pytest.raises(ValueError, match="not a JPEG"):
        # corrupt the frame payload's SOI marker inside the 00dc chunk
        i = good.index(b"\xff\xd8", 12)
        _avi_mjpeg_frames(good[:i] + b"\x00\x00" + good[i + 2 :])
    # a stream header whose frames never arrive
    with pytest.raises(ValueError, match="no video frames"):
        hdr_only = good[: good.index(b"LIST", good.index(b"movi") - 8)]
        import struct

        fixed = (
            b"RIFF"
            + struct.pack("<I", len(hdr_only) - 8)
            + hdr_only[8:]
        )
        _avi_mjpeg_frames(fixed)


def test_dimension_drift_quarantines():
    frames = [make_jpeg(8, 8, gray=1), make_jpeg(16, 8, gray=1)]
    with pytest.raises(ValueError, match="drift"):
        _avi_mjpeg_frames(make_avi(8, 8, frames))


def test_maker_guards():
    with pytest.raises(ValueError, match="at least one frame"):
        make_avi(8, 8, [])
    with pytest.raises(ValueError, match="fps"):
        make_avi(8, 8, [make_jpeg(8, 8, gray=0)], fps=0)


def test_frame_stats_rides_the_video_path(spark):
    from kevinlang_spark.operators.multimodal import extract_frame_stats

    df = spark.createDataFrame(
        [(8, "video", bytearray(_avi(8)))],
        "doc_id bigint, media_type string, payload binary",
    )
    rows = {
        r["frame_idx"]: r
        for r in extract_frame_stats(df, every_k=2, thumb=(4, 4)).collect()
    }
    # 3 frames, every 2nd → frames 0 and 2; constant gray survives resize
    assert set(rows) == {0, 2}
    assert rows[0]["mean_r"] == pytest.approx(8.0)
    assert rows[2]["mean_r"] == pytest.approx(10.0)
    assert rows[0]["width"] == 4 and rows[0]["height"] == 4
