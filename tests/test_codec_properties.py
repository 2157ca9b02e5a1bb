"""Property-based tests for the codec-free media codecs
(operators/jpeg.py, operators/gif.py, multimodal PNG/BMP/WAV) and URL
canonicalization — extends the reference's quickcheck TODO
(test/Spec.lhs:5) to the round-8 surfaces.

Lossless codecs (GIF LZW, PNG deflate+predictors, BMP) must round-trip
EXACTLY on arbitrary content; JPEG with all-ones quantization must stay
within the rounding-error bound; normalize_url must be idempotent (a
canonical form that changes on re-application isn't canonical).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=4000),
    mcs=st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip_arbitrary_bytes(data, mcs):
    from kevinlang_spark.operators.gif import _lzw_decode, _lzw_encode

    # clamp symbols into the alphabet for this code size
    clamped = bytes(b % (1 << mcs) for b in data)
    assert _lzw_decode(_lzw_encode(clamped, mcs), mcs, len(clamped)) == clamped


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    n_frames=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_random_frames(w, h, n_frames, seed):
    from kevinlang_spark.operators.gif import gif_frames, make_gif

    rng = np.random.RandomState(seed)
    n_colors = int(rng.randint(2, 256))
    pal = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(n_colors)]
    frames = [rng.randint(0, n_colors, (h, w)).astype(np.uint8) for _ in range(n_frames)]
    gw, gh, gn, out = gif_frames(make_gif(w, h, frames, pal))
    assert (gw, gh, gn) == (w, h, n_frames)
    table = np.array(pal, dtype=np.uint8)
    for k in range(n_frames):
        assert (out[k] == table[frames[k]]).all()


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=48),
    h=st.integers(min_value=1, max_value=32),
    v=st.integers(min_value=0, max_value=255),
)
def test_jpeg_constant_gray_exact(w, h, v):
    from kevinlang_spark.operators.jpeg import jpeg_pixels, make_jpeg

    gw, gh, c, px = jpeg_pixels(make_jpeg(w, h, gray=v))
    assert (gw, gh, c) == (w, h, 1)
    assert px.min() == px.max() == v


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_random_gray_bounded_error(w, h, seed):
    from kevinlang_spark.operators.jpeg import jpeg_pixels, make_jpeg

    src = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    _, _, _, px = jpeg_pixels(make_jpeg(w, h, pixels=src))
    # all-ones quantization: per-coefficient error <= 0.5 -> tight bound
    assert np.abs(px[:, :, 0].astype(float) - src.astype(float)).max() <= 2.0


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_random_rgb_exact(w, h, seed):
    from kevinlang_spark.operators.multimodal import _png_pixels, make_png

    src = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    pw, ph, c, px = _png_pixels(make_png(w, h, pixels=src))
    assert (pw, ph, c) == (w, h, 3)
    assert (px == src).all()  # PNG is lossless: exact or bust


@pytest.mark.parametrize("n_urls", [300])
def test_normalize_url_is_idempotent_and_stable(spark, n_urls):
    """Canonicalization law: normalize(normalize(u)) == normalize(u),
    over a deterministic grid of messy component combinations — checked
    in ONE Spark job, not per-example sessions."""
    from pyspark.sql import functions as F

    from kevinlang_spark.operators.web import normalize_url

    urls = []
    for i in range(n_urls):
        scheme = ["http", "HTTPS", "https"][i % 3]
        www = ["", "www.", "WWW."][i % 3]
        host = f"Sub{i % 7}.Example{i % 5}." + ["com", "co.uk", "org"][i % 3]
        port = ["", ":443", ":80", ":8080"][i % 4]
        path = ["", "/", "/A/b", "/A/b/", "/x//"][i % 5]
        q = ["", "?z=1&a=2", "?utm_source=t", "?utm_source=t&b=1&A=2"][i % 4]
        frag = ["", "#f"][i % 2]
        urls.append((f"{scheme}://{www}{host}{port}{path}{q}{frag}",))
    df = spark.createDataFrame(urls, "url string")
    once = normalize_url(F.col("url"))
    out = df.select(
        once.alias("n1"), normalize_url(once).alias("n2")
    ).collect()
    for r in out:
        assert r["n1"] == r["n2"], r
        assert "#" not in r["n1"] and "utm_" not in r["n1"]
        assert "://www." not in r["n1"].lower() or r["n1"].count("www.") == 0
