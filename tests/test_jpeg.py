"""Baseline JPEG codec (operators/jpeg.py): encoder/decoder round
trips, the honest-subset error gates, and integration with the
multimodal decode surface.

Parity target: ITU-T T.81 baseline sequential.  The encoder writes
all-ones quantization tables, so constant blocks round-trip exactly —
the property the q_media_jpeg oracle asserts at fleet scale.
"""

from __future__ import annotations

import numpy as np
import pytest

from kevinlang_spark.operators.jpeg import (
    ZIGZAG,
    _dct_matrix,
    jpeg_pixels,
    make_jpeg,
)
from kevinlang_spark.operators.multimodal import stdlib_decode, stdlib_pixel_decode


def test_zigzag_is_a_permutation_with_known_anchors():
    assert sorted(ZIGZAG) == list(range(64))
    # T.81 Figure 5 anchors: start right-then-down-diagonal, end at 63
    assert ZIGZAG[:8] == [0, 1, 8, 16, 9, 2, 3, 10]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]


def test_dct_matrix_is_orthonormal():
    a = _dct_matrix()
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)


def test_constant_gray_roundtrip_is_exact():
    for v in (0, 1, 77, 128, 254, 255):
        w, h, c, px = jpeg_pixels(make_jpeg(17, 9, gray=v))
        assert (w, h, c) == (17, 9, 1)
        assert px.min() == px.max() == v


def test_constant_color_roundtrip_within_one():
    for rgb in ((200, 30, 99), (0, 0, 0), (255, 255, 255), (1, 254, 128)):
        w, h, c, px = jpeg_pixels(make_jpeg(20, 12, rgb=rgb))
        assert (w, h, c) == (20, 12, 3)
        for i, v in enumerate(rgb):
            assert np.abs(px[:, :, i].astype(float) - v).max() <= 1.0


def test_subsampled_420_roundtrip_within_one():
    # odd dimensions force edge-replicated partial chroma blocks
    w, h, c, px = jpeg_pixels(make_jpeg(21, 13, rgb=(10, 250, 128), subsample=True))
    assert (w, h, c) == (21, 13, 3)
    for i, v in enumerate((10, 250, 128)):
        assert np.abs(px[:, :, i].astype(float) - v).max() <= 1.0


def test_arbitrary_gray_content_bounded_error():
    rng = np.random.RandomState(7)
    src = rng.randint(0, 256, (24, 31)).astype(np.uint8)
    w, h, c, px = jpeg_pixels(make_jpeg(31, 24, pixels=src))
    assert (w, h, c) == (31, 24, 1)
    # all-ones quantization: error is rounding-level, not quality-level
    assert np.abs(px[:, :, 0].astype(float) - src.astype(float)).max() <= 2.0


def test_arbitrary_rgb_content_bounded_error():
    rng = np.random.RandomState(11)
    src = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    _, _, c, px = jpeg_pixels(make_jpeg(16, 16, pixels=src))
    assert c == 3
    # YCbCr forward+inverse rounding adds at most a few counts
    assert np.abs(px.astype(float) - src.astype(float)).max() <= 4.0


def test_restart_markers_roundtrip():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 256, (20, 40)).astype(np.uint8)
    payload = make_jpeg(40, 20, pixels=src, restart_interval=3)
    assert b"\xff\xdd" in payload  # DRI present
    assert any(bytes([0xFF, 0xD0 + n]) in payload for n in range(8))
    _, _, _, px = jpeg_pixels(payload)
    assert np.abs(px[:, :, 0].astype(float) - src.astype(float)).max() <= 2.0


def test_sof2_with_baseline_scan_quarantines():
    # a baseline stream MISDECLARED as SOF2 routes to the progressive
    # decoder, whose scan-header validation rejects the baseline scan
    # (Ss=0 with Se=63) instead of misdecoding it
    p = bytearray(make_jpeg(8, 8, gray=5))
    i = p.index(b"\xff\xc0")
    p[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        jpeg_pixels(bytes(p))


def test_truncated_scan_rejected():
    p = make_jpeg(24, 24, gray=9)
    with pytest.raises(ValueError):
        jpeg_pixels(p[: len(p) // 2])


def test_non_jpeg_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_pixels(b"BMnope")


def test_stdlib_pixel_decode_routes_jpeg():
    stats = stdlib_pixel_decode(make_jpeg(13, 7, gray=42), "image")
    assert (stats["width"], stats["height"], stats["n_frames"]) == (13, 7, 1)
    assert stats["mean_r"] == stats["mean_g"] == stats["mean_b"] == 42.0
    color = stdlib_pixel_decode(make_jpeg(8, 8, rgb=(100, 150, 200)), "image")
    assert abs(color["mean_r"] - 100) <= 1.0
    assert abs(color["mean_b"] - 200) <= 1.0


def test_header_walk_agrees_with_full_decode():
    """stdlib_decode's SOFn header walk and the full decoder must agree
    on dimensions for the same bytes."""
    payload = make_jpeg(31, 22, rgb=(1, 2, 3), subsample=True)
    hdr = stdlib_decode(payload, "image")
    w, h, _, _ = jpeg_pixels(payload)
    assert (hdr["width"], hdr["height"]) == (w, h) == (31, 22)


def test_corrupt_jpeg_quarantines_in_extract_pixel_stats(spark):
    from kevinlang_spark.operators.multimodal import extract_pixel_stats

    good = make_jpeg(9, 9, gray=10)
    corrupt = good[:-20] + b"\xff" * 10  # stray marker mid-scan
    df = spark.createDataFrame(
        [(1, "image", good), (2, "image", corrupt)],
        "doc_id bigint, media_type string, payload binary",
    )
    got = {r["doc_id"]: r for r in extract_pixel_stats(df).collect()}
    assert got[1]["mean_r"] == 10.0
    assert got[2]["mean_r"] is None  # quarantined, task survived


def test_real_quantization_tables_dequantize_on_decode():
    """quant > 1 exercises the decoder's dequantization multiply —
    constant-block reconstruction error is bounded by quant/16."""
    for q in (2, 4, 8, 16, 32):
        for v in (0, 63, 128, 200, 255):
            _, _, _, px = jpeg_pixels(make_jpeg(17, 9, gray=v, quant=q))
            err = np.abs(px[:, :, 0].astype(float) - v).max()
            assert err <= q / 16 + 1, (q, v, err)


def test_lossy_quantization_still_bounded_on_content():
    rng = np.random.RandomState(5)
    src = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    _, _, _, px = jpeg_pixels(make_jpeg(16, 16, pixels=src, quant=8))
    # per-coefficient error <= q/2; worst-case pixel error ~ q * few
    assert np.abs(px[:, :, 0].astype(float) - src.astype(float)).max() <= 40


def test_separate_chroma_huffman_tables():
    """Td/Ta = 1 for chroma — the multi-table DHT/SOS wiring real
    encoders emit; decode must be identical to the shared-table form."""
    a = jpeg_pixels(make_jpeg(20, 12, rgb=(200, 30, 99)))
    b = jpeg_pixels(make_jpeg(20, 12, rgb=(200, 30, 99), two_tables=True))
    assert (a[3] == b[3]).all() and a[:3] == b[:3]


def test_16bit_dqt_precision_accepted():
    """Pq=1 (16-bit) quantization tables: rewrite the 8-bit DQT
    segments of a valid stream into 16-bit form — same values, so the
    decode must be bit-identical."""
    import struct

    payload = make_jpeg(15, 10, gray=77, quant=3)
    out = bytearray()
    i = 0
    ref = jpeg_pixels(payload)
    while i < len(payload):
        if payload[i] == 0xFF and payload[i + 1] == 0xDB:
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            body = payload[i + 4 : i + 2 + seg_len]
            tq = body[0] & 0x0F
            vals = body[1:65]
            new_body = bytes([(1 << 4) | tq]) + b"".join(
                struct.pack(">H", v) for v in vals
            )
            out += b"\xff\xdb" + struct.pack(">H", 2 + len(new_body)) + new_body
            i += 2 + seg_len
        else:
            out.append(payload[i])
            i += 1
    got = jpeg_pixels(bytes(out))
    assert got[:3] == ref[:3] and (got[3] == ref[3]).all()


# --------------------------------------------------------------------- #
# spectral-selection progressive (SOF2, Ah=0) — VERDICT r8 item 7
# --------------------------------------------------------------------- #


def test_progressive_constant_gray_roundtrip_is_exact():
    for v in (0, 77, 255):
        payload = make_jpeg(17, 9, gray=v, progressive=True)
        assert payload[2:4] != b"\xff\xc0"  # really SOF2, not baseline
        w, h, c, px = jpeg_pixels(payload)
        assert (w, h, c) == (17, 9, 1)
        assert px.min() == px.max() == v


def test_progressive_decodes_identically_to_baseline():
    """Same pixels through SOF0 and SOF2 carry the SAME quantized
    coefficients, so the two decodes must agree BIT-FOR-BIT — the
    strongest cross-check the two scan layouts allow."""
    rng = np.random.RandomState(17)
    for shape in ((24, 31), (16, 16, 3)):
        src = rng.randint(0, 256, shape).astype(np.uint8)
        w, h = shape[1], shape[0]
        base = jpeg_pixels(make_jpeg(w, h, pixels=src))
        prog = jpeg_pixels(make_jpeg(w, h, pixels=src, progressive=True))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3])


def test_progressive_subsampled_420_roundtrip():
    """Odd dims + 4:2:0: the luma component's non-interleaved AC-scan
    block count differs from its MCU-padded grid (17px → 3 vs 4 block
    columns), exercising the T.81 A.2.2 dimension rule."""
    w, h, c, px = jpeg_pixels(
        make_jpeg(17, 13, rgb=(10, 250, 128), subsample=True, progressive=True)
    )
    assert (w, h, c) == (17, 13, 3)
    for i, v in enumerate((10, 250, 128)):
        assert np.abs(px[:, :, i].astype(float) - v).max() <= 1.0
    # and bit-identical to the baseline-encoded twin
    base = jpeg_pixels(make_jpeg(17, 13, rgb=(10, 250, 128), subsample=True))
    assert np.array_equal(base[3], px)


def test_progressive_restart_markers_roundtrip():
    rng = np.random.RandomState(23)
    src = rng.randint(0, 256, (20, 40)).astype(np.uint8)
    payload = make_jpeg(40, 20, pixels=src, restart_interval=3, progressive=True)
    assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
    base = jpeg_pixels(make_jpeg(40, 20, pixels=src))
    w, h, c, px = jpeg_pixels(payload)
    assert (w, h, c) == (40, 20, 1)
    assert np.array_equal(px, base[3])


def test_progressive_real_quant_tables():
    rng = np.random.RandomState(29)
    src = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    base = jpeg_pixels(make_jpeg(24, 16, pixels=src, quant=8))
    prog = jpeg_pixels(make_jpeg(24, 16, pixels=src, quant=8, progressive=True))
    assert np.array_equal(base[3], prog[3])


def test_successive_approximation_decodes_identically_to_baseline():
    """Al=1 first scans + Ah=1 refinement scans fully refine every
    coefficient, so the SA stream must decode BIT-FOR-BIT equal to its
    baseline twin — DC bit OR, newly-nonzero placement, correction
    bits, and cross-block EOB runs all exact."""
    rng = np.random.RandomState(31)
    for shape in ((24, 31), (16, 16, 3)):
        src = rng.randint(0, 256, shape).astype(np.uint8)
        w, h = shape[1], shape[0]
        payload = make_jpeg(w, h, pixels=src, progressive=True, successive=True)
        base = jpeg_pixels(make_jpeg(w, h, pixels=src))
        got = jpeg_pixels(payload)
        assert base[:3] == got[:3]
        assert np.array_equal(base[3], got[3])


def test_successive_approximation_sparse_blocks_exercise_eob_runs():
    """A mostly-constant image makes most blocks' AC bands empty at
    Al=1, forcing multi-block EOB runs whose refinement path reads one
    correction bit per nonzero-history coefficient."""
    src = np.full((32, 40), 128, dtype=np.uint8)
    src[5, 7] = 131  # one odd-magnitude detail → correction bits exist
    src[20, 30] = 127
    payload = make_jpeg(40, 32, pixels=src, progressive=True, successive=True)
    base = jpeg_pixels(make_jpeg(40, 32, pixels=src))
    got = jpeg_pixels(payload)
    assert np.array_equal(base[3], got[3])
    # the EOBn symbols (r<<4, r>=1) must actually appear: the SA stream
    # is much smaller than one EOB-per-block coding would be
    assert len(payload) < len(
        make_jpeg(40, 32, pixels=src, progressive=True)
    ) + 600


def test_successive_approximation_subsampled_and_restarts():
    rng = np.random.RandomState(37)
    src = rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)
    sa = jpeg_pixels(
        make_jpeg(17, 13, pixels=src, subsample=True,
                  progressive=True, successive=True)
    )
    base = jpeg_pixels(make_jpeg(17, 13, pixels=src, subsample=True))
    assert np.array_equal(base[3], sa[3])

    gray = rng.randint(0, 256, (20, 40)).astype(np.uint8)
    sa2 = jpeg_pixels(
        make_jpeg(40, 20, pixels=gray, restart_interval=3,
                  progressive=True, successive=True)
    )
    base2 = jpeg_pixels(make_jpeg(40, 20, pixels=gray))
    assert np.array_equal(base2[3], sa2[3])


def test_progressive_stdlib_decode_dimensions():
    from kevinlang_spark.operators.multimodal import stdlib_decode

    meta = stdlib_decode(make_jpeg(33, 21, gray=9, progressive=True), "image")
    assert (meta["width"], meta["height"]) == (33, 21)
