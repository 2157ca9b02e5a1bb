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
