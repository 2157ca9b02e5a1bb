"""GIF codec (operators/gif.py) and the frame-sampling operator:
LZW round trips, animation compositing, the honest-subset gates, and
extract_frame_stats' decode→sample→resize pipeline.
"""

from __future__ import annotations

import numpy as np
import pytest

from kevinlang_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    gif_frames,
    make_gif,
)
from kevinlang_spark.operators.multimodal import (
    extract_frame_stats,
    resize_nearest,
    stdlib_pixel_decode,
)


def test_lzw_roundtrip_across_dictionary_resets():
    rng = np.random.RandomState(5)
    for size in (1, 10, 300, 5000, 60000):  # 60k forces 4096-entry resets
        data = bytes(rng.randint(0, 16, size, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(data, 4), 4, size) == data


def test_lzw_kwkwk_case():
    # 'aaaa...' triggers the code-equals-next-entry path immediately
    data = b"\x01" * 50
    assert _lzw_decode(_lzw_encode(data, 2), 2, 50) == data


def test_single_frame_roundtrip_exact():
    pal = [(10, 20, 30), (200, 100, 50)]
    w, h, n, fr = gif_frames(make_gif(9, 5, [1], pal))
    assert (w, h, n) == (9, 5, 1)
    assert (fr[0] == (200, 100, 50)).all()


def test_animated_frames_roundtrip_exact():
    pal = [(i, 2 * i % 256, 3 * i % 256) for i in range(64)]
    w, h, n, fr = gif_frames(make_gif(33, 21, [3, 17, 40, 63], pal))
    assert (w, h, n) == (33, 21, 4)
    for k, pi in enumerate([3, 17, 40, 63]):
        assert (fr[k] == pal[pi]).all()


def test_arbitrary_content_roundtrip_exact():
    rng = np.random.RandomState(7)
    pal = [(i, 255 - i, (i * 7) % 256) for i in range(256)]
    idx = rng.randint(0, 256, (21, 33)).astype(np.uint8)
    _, _, _, fr = gif_frames(make_gif(33, 21, [idx], pal))
    assert (fr[0] == np.array(pal, dtype=np.uint8)[idx]).all()


def test_disposal_restore_previous_rejected():
    p = bytearray(make_gif(4, 4, [0, 1], [(1, 1, 1), (2, 2, 2)]))
    i = p.index(b"\x21\xf9\x04")
    p[i + 3] = (p[i + 3] & ~0x1C) | (3 << 2)  # disposal=3
    with pytest.raises(ValueError, match="restore previous"):
        gif_frames(bytes(p))


def test_truncated_and_non_gif_rejected():
    p = make_gif(16, 16, [0], [(9, 9, 9), (0, 0, 0)])
    with pytest.raises(ValueError):
        gif_frames(p[: len(p) // 2])
    with pytest.raises(ValueError, match="not a GIF"):
        gif_frames(b"JFIFnope")


def test_stdlib_pixel_decode_routes_gif_means_over_all_frames():
    pal = [(10, 0, 0), (30, 0, 0)]
    stats = stdlib_pixel_decode(make_gif(6, 4, [0, 1], pal), "image")
    assert (stats["width"], stats["height"], stats["n_frames"]) == (6, 4, 2)
    assert stats["mean_r"] == 20.0  # (10 + 30) / 2 across frames
    assert stats["mean_g"] == 0.0


def test_resize_nearest_shapes_and_constants():
    frame = np.full((10, 6, 3), 7, dtype=np.uint8)
    up = resize_nearest(frame, 8, 8)
    down = resize_nearest(frame, 2, 3)
    assert up.shape == (8, 8, 3) and (up == 7).all()
    assert down.shape == (3, 2, 3) and (down == 7).all()


def test_extract_frame_stats_samples_and_resizes(spark):
    pal = [(5, 6, 7), (50, 60, 70), (100, 110, 120)]
    gif3 = make_gif(12, 9, [0, 1, 2], pal)
    rows = [
        (1, "image", gif3),
        (2, "audio", b"RIFF"),  # non-image: no rows
        (3, "image", b"garbage"),  # undecodable: no rows
        (4, "image", None),  # null payload: no rows
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary"
    )
    got = extract_frame_stats(df, every_k=2, thumb=(4, 4)).collect()
    by_frame = {(r["doc_id"], r["frame_idx"]): r for r in got}
    assert set(by_frame) == {(1, 0), (1, 2)}  # frames 0 and 2 sampled
    r0 = by_frame[(1, 0)]
    assert (r0["width"], r0["height"]) == (4, 4)
    assert (r0["mean_r"], r0["mean_g"], r0["mean_b"]) == (5.0, 6.0, 7.0)
    r2 = by_frame[(1, 2)]
    assert (r2["mean_r"], r2["mean_g"], r2["mean_b"]) == (100.0, 110.0, 120.0)


def test_extract_frame_stats_single_image_formats(spark):
    from kevinlang_spark.operators.jpeg import make_jpeg
    from kevinlang_spark.operators.multimodal import make_bmp, make_png

    rows = [
        (1, "image", make_bmp(5, 4, rgb=(9, 8, 7))),
        (2, "image", make_png(5, 4, rgb=(1, 2, 3))),
        (3, "image", make_jpeg(8, 8, gray=33)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary"
    )
    got = {r["doc_id"]: r for r in extract_frame_stats(df).collect()}
    assert all(got[d]["frame_idx"] == 0 for d in (1, 2, 3))
    assert (got[1]["mean_r"], got[1]["mean_b"]) == (9.0, 7.0)
    assert (got[2]["mean_r"], got[2]["mean_b"]) == (1.0, 3.0)
    assert got[3]["mean_r"] == got[3]["mean_g"] == 33.0


def _manual_gif(width, height, blocks, palette, bg_index=0):
    """Hand-assembled GIF89a with full control over per-frame image
    descriptors (left/top offsets, partial patches), GCE disposal and
    transparency — the stream shapes make_gif never emits but real
    animated GIFs use constantly."""
    import struct

    from kevinlang_spark.operators.gif import _lzw_encode, _sub_blocks

    depth = max(2, (len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), bg_index, 0])
    for r, g, b in palette:
        out += bytes((r, g, b))
    out += b"\x00\x00\x00" * ((1 << depth) - len(palette))
    for left, top, idx, disposal, transparent in blocks:
        h, w = idx.shape
        gce_flags = (disposal << 2) | (0x01 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes([gce_flags, 0, 0, transparent or 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + b"\x00"
        mcs = max(2, depth)
        out += bytes([mcs]) + _sub_blocks(_lzw_encode(idx.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def test_partial_frame_patch_composites_onto_canvas():
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0)]
    base = np.full((4, 6), 1, dtype=np.uint8)  # all red
    patch = np.full((2, 2), 2, dtype=np.uint8)  # green 2x2
    payload = _manual_gif(6, 4, [(0, 0, base, 1, None), (1, 1, patch, 1, None)], pal)
    w, h, n, fr = gif_frames(payload)
    assert (w, h, n) == (6, 4, 2)
    assert (fr[0] == (255, 0, 0)).all()
    expect = fr[0].copy()
    expect[1:3, 1:3] = (0, 255, 0)
    assert (fr[1] == expect).all()


def test_transparency_keeps_underlying_canvas():
    pal = [(9, 9, 9), (255, 0, 0), (0, 0, 255)]
    base = np.full((3, 3), 1, dtype=np.uint8)
    overlay = np.array([[2, 0, 2], [0, 2, 0], [2, 0, 2]], dtype=np.uint8)
    # index 0 declared transparent: those pixels keep the red base
    payload = _manual_gif(
        3, 3, [(0, 0, base, 1, None), (0, 0, overlay, 1, 0)], pal
    )
    _, _, n, fr = gif_frames(payload)
    assert n == 2
    assert (fr[1][0, 0] == (0, 0, 255)).all()  # overlay index 2
    assert (fr[1][0, 1] == (255, 0, 0)).all()  # transparent -> base shows
    assert (fr[1][1, 1] == (0, 0, 255)).all()


def test_disposal_background_restores_region():
    pal = [(7, 7, 7), (255, 0, 0), (0, 255, 0)]
    base = np.full((4, 4), 1, dtype=np.uint8)
    patch = np.full((2, 2), 2, dtype=np.uint8)
    tail = np.full((1, 1), 2, dtype=np.uint8)
    # patch draws with disposal=2: after frame 2 its region resets to
    # the background color before frame 3
    payload = _manual_gif(
        4,
        4,
        [(0, 0, base, 1, None), (0, 0, patch, 2, None), (3, 3, tail, 1, None)],
        pal,
        bg_index=0,
    )
    _, _, n, fr = gif_frames(payload)
    assert n == 3
    assert (fr[1][0, 0] == (0, 255, 0)).all()  # patch visible in frame 2
    assert (fr[2][0, 0] == (7, 7, 7)).all()  # region restored to bg
    assert (fr[2][3, 3] == (0, 255, 0)).all()  # tail pixel drawn


def test_frame_exceeding_screen_rejected():
    pal = [(0, 0, 0), (1, 1, 1)]
    big = np.zeros((5, 5), dtype=np.uint8)
    payload = _manual_gif(4, 4, [(2, 2, big, 1, None)], pal)
    with pytest.raises(ValueError, match="exceeds logical screen"):
        gif_frames(payload)


def test_interlaced_frame_rows_reordered():
    import struct

    from kevinlang_spark.operators.gif import _lzw_encode, _sub_blocks

    pal = [(i, i, i) for i in range(16)]
    h, w = 11, 5  # odd height exercises all four interlace passes
    rng = np.random.RandomState(9)
    idx = rng.randint(0, 16, (h, w)).astype(np.uint8)
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    stored = idx[order]  # rows as an interlaced encoder would emit them
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    out += bytes([0x80 | (3 << 4) | 3, 0, 0])
    for r, g, b in pal:
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x40])  # interlaced
    out += bytes([4]) + _sub_blocks(_lzw_encode(stored.tobytes(), 4))
    out += b"\x3b"
    gw, gh, n, fr = gif_frames(bytes(out))
    assert (gw, gh, n) == (w, h, 1)
    assert (fr[0] == np.array(pal, dtype=np.uint8)[idx]).all()
