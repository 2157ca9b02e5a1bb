"""Round-9 ADVICE fixes (VERDICT/ADVICE r8): scheme-less URL
passthrough in normalize_url, JPEG fill-byte / missing-EOI tolerance,
and the code-versioned artifact-cache key."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators.jpeg import jpeg_pixels, make_jpeg
from kevinlang_spark.operators.web import normalize_url


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]


def test_normalize_url_schemeless_passthrough(spark):
    """A bare host or protocol-relative URL must NOT collapse to a
    malformed '://…' dedup key (ADVICE r8 item 2) — it passes through
    unchanged; NULL stays NULL; schemed URLs still normalize."""
    got = _norm(
        spark,
        [
            "example.com/path?a=1",
            "//cdn.example.com/lib.js",
            "www.example.com",
            None,
            "HTTPS://WWW.Example.COM/Docs/?z=9&a=1",
        ],
    )
    assert got == [
        "example.com/path?a=1",
        "//cdn.example.com/lib.js",
        "www.example.com",
        None,
        "https://example.com/Docs?a=1&z=9",
    ]
    # and two scheme-less spellings of DIFFERENT resources stay distinct
    assert len(set(_norm(spark, ["hosta.com/x", "hostb.com/x"]))) == 2


def test_jpeg_missing_trailing_eoi_keeps_final_entropy_byte():
    """T.81 decoders must not need the EOI to delimit the scan: with
    the trailing FFD9 stripped, the final entropy byte still decodes
    (ADVICE r8 item 3 — the old scan loop dropped payload[-1])."""
    rng = np.random.RandomState(5)
    src = rng.randint(0, 256, (16, 24)).astype(np.uint8)
    payload = make_jpeg(24, 16, pixels=src)
    assert payload[-2:] == b"\xff\xd9"
    w, h, c, px = jpeg_pixels(payload[:-2])
    assert (w, h, c) == (24, 16, 1)
    ref = jpeg_pixels(payload)[3]
    assert np.array_equal(px, ref)


def test_jpeg_fill_bytes_before_markers_are_skipped():
    """0xFF fill bytes before a marker are legal padding (T.81
    B.1.1.2); the segment walker skips them instead of quarantining."""
    payload = make_jpeg(9, 7, gray=123)
    padded = payload[:2] + b"\xff\xff" + payload[2:]
    w, h, c, px = jpeg_pixels(padded)
    assert (w, h, c) == (9, 7, 1)
    assert px.min() == px.max() == 123


def test_artifact_path_changes_with_source(tmp_path, monkeypatch):
    """The build-once artifact cache key folds the generating code's
    hash (ADVICE r8 item 1): same sf_dir + changed module source →
    different path, so stale indexes are never silently replayed."""
    import __spark_entry__ as entry

    a = entry._artifact_path("/data/sf1", "pq_idx",
                             "kevinlang_spark/operators/similarity.py")
    b = entry._artifact_path("/data/sf2", "pq_idx",
                             "kevinlang_spark/operators/similarity.py")
    assert a != b  # data key still participates
    # patch the module-source read to simulate a code change
    real_open = open

    def fake_open(path, mode="r", *args, **kwargs):
        fh = real_open(path, mode, *args, **kwargs)
        if "similarity.py" in str(path) and "b" in mode:
            import io

            return io.BytesIO(fh.read() + b"# changed")
        return fh

    monkeypatch.setattr("builtins.open", fake_open)
    a2 = entry._artifact_path("/data/sf1", "pq_idx",
                              "kevinlang_spark/operators/similarity.py")
    assert a2 != a


# --------------------------------------------------------------------- #
# perceptual image fingerprints (dHash/pHash) + Hamming banding
# --------------------------------------------------------------------- #


def _gradient_image(fp: int):
    """9×8 RGB image whose dHash is exactly ``fp`` (the q_image_neardup
    construction: per-row pixel walk, ±15 around 128)."""
    px = np.zeros((8, 9, 3), np.uint8)
    for r in range(8):
        v = 128
        px[r, 0, :] = v
        for c in range(8):
            v = v - 15 if (fp >> (r * 8 + c)) & 1 else v + 15
            px[r, c + 1, :] = v
    return px


def test_make_bmp_pixels_roundtrip():
    from kevinlang_spark.operators.multimodal import _bmp_pixels, make_bmp

    rng = np.random.RandomState(9)
    src = rng.randint(0, 256, (8, 9, 3)).astype(np.uint8)
    w, h, rgb = _bmp_pixels(make_bmp(9, 8, pixels=src))
    assert (w, h) == (9, 8)
    assert np.array_equal(rgb, src)


def test_dhash_encodes_constructed_gradients():
    from kevinlang_spark.operators.multimodal import dhash_bits

    for fp in (0, 0x5A5A5A5A5A5A5A5A, (1 << 63) - 1, 0x0123456789ABCDEF):
        got = dhash_bits(_gradient_image(fp))
        assert got == fp, (hex(fp), hex(got))


def test_dhash_survives_nearest_upscale():
    """The fingerprint is resize-invariant for integer upscales — the
    property that makes it a NEAR-dup key, not an exact-byte key."""
    from kevinlang_spark.operators.multimodal import dhash_bits

    fp = 0x0F0F00FF12345678
    px = _gradient_image(fp)
    up = np.repeat(np.repeat(px, 4, axis=0), 4, axis=1)  # 32×36
    assert dhash_bits(up) == fp


def test_phash_brightness_invariant_and_discriminative():
    from kevinlang_spark.operators.multimodal import phash_bits

    rng = np.random.RandomState(21)
    img = rng.randint(30, 200, (16, 16, 3)).astype(np.uint8)
    brighter = np.clip(img.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    # +20 brightness shifts only the DC coefficient; the median
    # threshold over AC bits is unchanged
    assert phash_bits(img) == phash_bits(brighter)
    other = rng.randint(30, 200, (16, 16, 3)).astype(np.uint8)
    a, b = phash_bits(img), phash_bits(other)
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") > 10


def test_extract_image_phash_quarantines(spark):
    from kevinlang_spark.operators.multimodal import (
        extract_image_phash,
        make_bmp,
    )

    rows = [
        (1, "image", make_bmp(9, 8, pixels=_gradient_image(0xABCD))),
        (2, "image", b"not an image at all"),
        (3, "audio", make_bmp(9, 8, pixels=_gradient_image(0xABCD))),
        (4, "image", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary"
    )
    got = extract_image_phash(df, method="dhash").collect()
    assert [(r["doc_id"], r["phash"]) for r in got] == [(1, 0xABCD)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown method"):
        extract_image_phash(df, method="md5")


def test_hamming_neardup_pairs_on_fingerprints(spark):
    from kevinlang_spark.operators.dedup import hamming_neardup_pairs

    base = 0x1122334455667788
    rows = [
        (1, base),
        (2, base ^ 0b1),          # hamming 1 from base
        (3, base ^ 0b111),        # hamming 3 from base, 2 from id=2
        (4, ~base & ((1 << 63) - 1)),  # far away
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, phash bigint")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_neardup_pairs(
            df, max_hamming=3, blocks=4, id_col="doc_id", sig_col="phash"
        ).collect()
    )
    assert got == [(1, 2, 1), (1, 3, 3), (2, 3, 2)]


def test_fasttext_quality_score_semantics(spark):
    import hashlib

    from kevinlang_spark.operators.text import (
        fasttext_quality_score,
        fasttext_weights,
    )

    rows = [
        (1, "Hello World"),   # 9 trigrams of "hello world"
        (2, "ab"),            # shorter than n -> bias only
        (3, None),            # null -> bias only
        (4, ""),              # empty -> bias only
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r
        for r in fasttext_quality_score(
            df, dim=64, n=3, seed=13, bias=-0.05
        ).collect()
    }
    # independent Python replay of doc 1
    w = fasttext_weights(64, 13)
    t = "hello world"
    grams = [t[i : i + 3] for i in range(len(t) - 2)]
    tot = 0.0
    for g in grams:
        h = int(hashlib.md5((g + "#qs").encode()).hexdigest()[:13], 16)
        tot += w[h % 64]
    logit = -0.05 + tot / len(grams)
    assert got[1]["n_grams"] == 9
    assert abs(got[1]["logit"] - logit) < 1e-12
    import math

    # score is ROUNDED to 6 dp (JVM exp vs libm exp last-ULP divergence)
    assert abs(got[1]["score"] - 1.0 / (1.0 + math.exp(-logit))) < 1e-6
    assert got[1]["keep"] == (logit >= 0)
    for d in (2, 3, 4):
        assert got[d]["n_grams"] == 0
        assert got[d]["logit"] == -0.05
        assert got[d]["keep"] is False


def test_fasttext_quality_score_guards(spark):
    from kevinlang_spark.operators.text import fasttext_quality_score

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="dim must be"):
        fasttext_quality_score(df, dim=1)
    with pytest.raises(ValueError, match="n must be"):
        fasttext_quality_score(df, n=0)


# --------------------------------------------------------------------- #
# audio energy-gradient fingerprints (the audio dedup tier)
# --------------------------------------------------------------------- #


def _staircase_samples(fp: int, start=2000, step=25, frame=16):
    amps = [start]
    for k in range(64):
        amps.append(amps[-1] - step if (fp >> k) & 1 else amps[-1] + step)
    return np.repeat(np.array(amps, dtype=np.int64), frame)


def test_audio_energy_hash_encodes_staircases():
    from kevinlang_spark.operators.multimodal import audio_energy_hash

    for fp in (0, 0x5A5A5A5A5A5A5A5A, (1 << 63) - 1, 0x0123456789ABCDEF):
        got = audio_energy_hash(_staircase_samples(fp))
        assert got == fp & ~(1 << 63) | (-(fp & (1 << 63)))  # signed pack
    with pytest.raises(ValueError, match="need >="):
        audio_energy_hash(np.zeros(10))


def test_audio_fingerprint_container_invariant(spark):
    """The SAME samples through WAV and rice-coded FLAC must fingerprint
    identically — the audio analogue of the cross-format image check —
    and junk/short/non-audio payloads quarantine by omission."""
    from kevinlang_spark.operators.flac import make_flac
    from kevinlang_spark.operators.multimodal import (
        extract_audio_fingerprint,
        make_wav,
    )

    fp = 0x00FF00FF12345678
    samples = _staircase_samples(fp)
    rows = [
        (1, "audio", make_wav(0, samples=samples)),
        (2, "audio", make_flac(samples, block_size=256)),
        (3, "audio", b"not audio"),
        (4, "image", make_wav(0, samples=samples)),
        (5, "audio", make_wav(10, amplitude=5)),  # too short: <65 frames
        (6, "audio", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary"
    )
    got = {r["doc_id"]: r["ahash"] for r in extract_audio_fingerprint(df).collect()}
    assert set(got) == {1, 2}
    assert got[1] == got[2] == fp
