"""FLAC codec (operators/flac.py): lossless round trips, the
decoder-only paths the encoder never emits (LPC, stereo decorrelation,
partition orders, escape partitions, wasted bits, fixed orders 3-4),
error gates, and the multimodal integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kevinlang_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    _zigzag,
    flac_samples,
    make_flac,
)


# ---------------------------------------------------------------- round trips


def test_constant_and_verbatim_roundtrip():
    x = np.full(500, -1234, dtype=np.int64)
    for mode in ("constant", "auto"):
        _, ch, s = flac_samples(make_flac(x, subframe=mode))
        assert ch == 1 and (s[:, 0] == x).all()
    y = np.array([0, 1, -1, 32767, -32768, 5], dtype=np.int64)
    _, _, s = flac_samples(make_flac(y, subframe="verbatim"))
    assert (s[:, 0] == y).all()


def test_fixed2_rice_roundtrip_multiblock():
    rng = np.random.RandomState(7)
    x = rng.randint(-32768, 32768, 9000)
    _, _, s = flac_samples(make_flac(x, block_size=4096))
    assert (s[:, 0] == x).all()


def test_smooth_signal_compresses():
    t = np.arange(20000)
    smooth = (1000 * np.sin(t / 50)).astype(np.int64)
    p = make_flac(smooth)
    assert len(p) < 0.25 * 2 * smooth.size  # real compression, not a container
    _, _, s = flac_samples(p)
    assert (s[:, 0] == smooth).all()


def test_stereo_independent_roundtrip():
    rng = np.random.RandomState(3)
    st2 = np.stack([rng.randint(-1000, 1000, 700), rng.randint(-9, 9, 700)], axis=1)
    _, ch, s = flac_samples(make_flac(st2, block_size=256))
    assert ch == 2 and (s == st2).all()


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    stereo=st.booleans(),
)
def test_roundtrip_property(n, seed, stereo):
    rng = np.random.RandomState(seed)
    shape = (n, 2) if stereo else (n,)
    x = rng.randint(-32768, 32768, shape)
    _, _, s = flac_samples(make_flac(x, block_size=512))
    assert (s.reshape(-1) == np.asarray(x, dtype=np.int64).reshape(-1)).all()


# ------------------------------------------------- hand-built decoder streams


def _stream(bs, n_ch, ch_code, write_subframes, sample_rate=8000):
    """fLaC header + STREAMINFO + ONE frame whose subframe bits come
    from ``write_subframes(bitwriter)`` — full control over the paths
    make_flac never takes."""
    out = bytearray(b"fLaC")
    info = bytearray()
    info += struct.pack(">HH", bs, bs)
    info += b"\x00\x00\x00" * 2
    packed = (sample_rate << 44) | ((n_ch - 1) << 41) | (15 << 36) | bs
    info += packed.to_bytes(8, "big")
    info += b"\x00" * 16
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info)
    hdr = _BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)
    hdr.write(0b0000, 4)
    hdr.write(ch_code, 4)
    hdr.write(0b100, 3)
    hdr.write(0, 1)
    hdr.write(_utf8_number(0)[0], 8)
    hdr.write(bs - 1, 16)
    hdr.align()
    header = bytes(hdr.buf)
    fw = _BitWriter()
    for b in header:
        fw.write(b, 8)
    fw.write(_crc8(header), 8)
    write_subframes(fw)
    fw.align()
    body = bytes(fw.buf)
    return bytes(out + body + struct.pack(">H", _crc16(body)))


def _write_verbatim(fw, samples, bits):
    fw.write(0, 1)
    fw.write(0b000001, 6)
    fw.write(0, 1)
    for v in samples:
        fw.write(int(v) & ((1 << bits) - 1), bits)


def test_left_side_and_right_side_decorrelation():
    left = [100, -50, 7, 0]
    right = [97, -53, -3, 30]
    side = [l - r for l, r in zip(left, right)]

    def ws_left(fw):
        _write_verbatim(fw, left, 16)
        _write_verbatim(fw, side, 17)  # side channel carries 17 bits

    _, _, s = flac_samples(_stream(4, 2, 0b1000, ws_left))
    assert s[:, 0].tolist() == left and s[:, 1].tolist() == right

    def ws_right(fw):
        _write_verbatim(fw, side, 17)
        _write_verbatim(fw, right, 16)

    _, _, s = flac_samples(_stream(4, 2, 0b1001, ws_right))
    assert s[:, 0].tolist() == left and s[:, 1].tolist() == right


def test_mid_side_decorrelation():
    left = [100, -3, 32000, -32000]
    right = [-3, 100, 31999, -31998]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]

    def ws(fw):
        _write_verbatim(fw, mid, 16)
        _write_verbatim(fw, side, 17)

    _, _, s = flac_samples(_stream(4, 2, 0b1010, ws))
    assert s[:, 0].tolist() == left and s[:, 1].tolist() == right


def _write_rice_residual(fw, res, k, part_order=0, order=0, bs=None):
    fw.write(0b00, 2)
    fw.write(part_order, 4)
    n_parts = 1 << part_order
    pos = 0
    for p in range(n_parts):
        count = (bs >> part_order) - (order if p == 0 else 0)
        fw.write(k, 4)
        for r in res[pos : pos + count]:
            m = _zigzag(int(r))
            fw.write_unary(m >> k)
            if k:
                fw.write(m & ((1 << k) - 1), k)
        pos += count


def test_fixed_order4_and_partition_order():
    bs = 16
    rng = np.random.RandomState(11)
    x = list(rng.randint(-500, 500, bs))
    coef = [4, -6, 4, -1]
    res = [
        x[n] - sum(c * x[n - 1 - j] for j, c in enumerate(coef))
        for n in range(4, bs)
    ]

    def ws(fw):
        fw.write(0, 1)
        fw.write(0b001000 | 4, 6)  # FIXED order 4
        fw.write(0, 1)
        for v in x[:4]:
            fw.write(int(v) & 0xFFFF, 16)
        _write_rice_residual(fw, res, k=5, part_order=2, order=4, bs=bs)

    _, _, s = flac_samples(_stream(bs, 1, 0b0000, ws))
    assert s[:, 0].tolist() == x


def test_fixed_order4_big_block_transient_residuals_decode():
    """ADVICE r11: the up-front overflow guard bounded risk as
    res_bound*len^order, so a VALID 16-bit order-4 block of 4096
    samples with transient ~2^19 residuals (4th differences of full-
    scale noise) hit risk ≈ 2^67 and was quarantined.  The per-stage
    guard must decode it exactly (true intermediates are the signal's
    lower-order differences, far below int64)."""
    bs = 4096
    rng = np.random.RandomState(23)
    x = list(rng.randint(-32768, 32768, bs))
    coef = [4, -6, 4, -1]
    res = [
        x[n] - sum(c * x[n - 1 - j] for j, c in enumerate(coef))
        for n in range(4, bs)
    ]
    assert max(abs(r) for r in res) >= 2**18  # the ADVICE regime

    def ws(fw):
        fw.write(0, 1)
        fw.write(0b001000 | 4, 6)  # FIXED order 4
        fw.write(0, 1)
        for v in x[:4]:
            fw.write(int(v) & 0xFFFF, 16)
        _write_rice_residual(fw, res, k=14, part_order=0, order=4, bs=bs)

    _, _, s = flac_samples(_stream(bs, 1, 0b0000, ws))
    assert s[:, 0].tolist() == x


def test_fixed_order4_true_overflow_still_quarantines():
    """The exact-int fallback still quarantines residuals whose TRUE
    reconstruction exceeds the int64 carrier (corrupt stream), instead
    of wrapping or killing the task."""
    bs = 4096
    huge = 2**29 - 1  # max positive 30-bit raw residual
    res = [huge] * (bs - 4)
    # true order-4 integral ≈ huge * bs^4 / 24 ≈ 2^72 — past int64

    def ws(fw):
        fw.write(0, 1)
        fw.write(0b001000 | 4, 6)  # FIXED order 4
        fw.write(0, 1)
        for _ in range(4):
            fw.write(0, 16)
        # method-1 escape partition: raw 30-bit residuals
        fw.write(0b01, 2)
        fw.write(0, 4)  # partition order 0
        fw.write(31, 5)  # escape
        fw.write(30, 5)  # raw bit width
        for r in res:
            fw.write(r, 30)

    with pytest.raises(ValueError, match="overflow 64-bit"):
        flac_samples(_stream(bs, 1, 0b0000, ws))


def test_lpc_subframe():
    bs = 12
    x = [10, 20]
    coefs, shift, precision = [3, -1], 1, 4
    res = [1, -2, 0, 3, -1, 2, 0, 0, 1, -3]
    for n in range(2, bs):
        acc = coefs[0] * x[n - 1] + coefs[1] * x[n - 2]
        x.append((acc >> shift) + res[n - 2])

    def ws(fw):
        fw.write(0, 1)
        fw.write(0b100000 | (2 - 1), 6)  # LPC order 2
        fw.write(0, 1)
        for v in x[:2]:
            fw.write(int(v) & 0xFFFF, 16)
        fw.write(precision - 1, 4)
        fw.write(shift & 0x1F, 5)
        for c in coefs:
            fw.write(c & ((1 << precision) - 1), precision)
        _write_rice_residual(fw, res, k=2, part_order=0, order=2, bs=bs)

    _, _, s = flac_samples(_stream(bs, 1, 0b0000, ws))
    assert s[:, 0].tolist() == x


def test_escape_partition_raw_residuals():
    bs = 8
    x = [5] + [0] * (bs - 1)
    res = [x[n] - x[n - 1] for n in range(1, bs)]  # fixed order 1

    def ws(fw):
        fw.write(0, 1)
        fw.write(0b001000 | 1, 6)
        fw.write(0, 1)
        fw.write(x[0] & 0xFFFF, 16)
        fw.write(0b00, 2)
        fw.write(0, 4)  # partition order 0
        fw.write(0b1111, 4)  # ESCAPE
        fw.write(6, 5)  # 6-bit raw residuals
        for r in res:
            fw.write(r & 0x3F, 6)

    _, _, s = flac_samples(_stream(bs, 1, 0b0000, ws))
    assert s[:, 0].tolist() == x


def test_wasted_bits_shift_restored():
    bs = 4
    stored = [3, -2, 5, 0]  # samples >> 2
    expect = [v << 2 for v in stored]

    def ws(fw):
        fw.write(0, 1)
        fw.write(0b000001, 6)  # VERBATIM
        fw.write(1, 1)  # wasted-bits flag
        fw.write_unary(1)  # unary 1 -> wasted = 2
        for v in stored:
            fw.write(v & ((1 << 14) - 1), 14)  # 16 - 2 wasted

    _, _, s = flac_samples(_stream(bs, 1, 0b0000, ws))
    assert s[:, 0].tolist() == expect


# ------------------------------------------------------------------ gates


def test_non_flac_and_truncation_rejected():
    with pytest.raises(ValueError, match="not a FLAC"):
        flac_samples(b"RIFFxxxx")
    p = make_flac(np.arange(300) % 100)
    with pytest.raises(ValueError):
        flac_samples(p[: len(p) - 10])


def test_24bit_rejected():
    p = bytearray(make_flac(np.full(10, 3)))
    # bits-per-sample lives in STREAMINFO byte 16 bits 36..40 of packed;
    # flip 16-bit (01111) to 24-bit (10111): byte index 8+4+12 = 16
    packed = int.from_bytes(p[18:26], "big")
    packed = (packed & ~(0x1F << 36)) | (23 << 36)
    p[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="16-bit"):
        flac_samples(bytes(p))


def test_crc_trailers_present_and_correct():
    p = make_flac(np.full(100, 7), block_size=256)
    # STREAMINFO block: 4 magic + 4 header + 34 body; frame follows
    frame = p[42:]
    body, crc = frame[:-2], struct.unpack(">H", frame[-2:])[0]
    assert _crc16(body) == crc
    # header CRC-8: header is everything before it; locate by re-deriving
    # (header = 4 fixed bytes + 1 utf8 byte + 2 blocksize bytes here)
    assert _crc8(body[:7]) == body[7]


def test_multimodal_routes_flac(spark):
    from kevinlang_spark.operators.multimodal import (
        extract_pixel_stats,
        stdlib_decode,
        stdlib_pixel_decode,
    )

    p = make_flac(np.full(321, 55))
    hdr = stdlib_decode(p, "audio")
    assert hdr["n_frames"] == 321
    stats = stdlib_pixel_decode(p, "audio")
    assert stats["n_frames"] == 321
    assert stats["rms"] == 55.0 == stats["peak"]
    df = spark.createDataFrame(
        [(1, "audio", p), (2, "audio", p[:20])],  # second: truncated
        "doc_id bigint, media_type string, payload binary",
    )
    got = {r["doc_id"]: r for r in extract_pixel_stats(df).collect()}
    assert got[1]["rms"] == 55.0
    assert got[2]["rms"] is None  # quarantined


# ------------------------------------------ second-review regression pins


def test_utf8_number_roundtrips_past_2048_frames():
    """Review finding: a wrong byte-count threshold emitted malformed
    coded numbers for frame indexes >= 2048 — any stream longer than
    ~2048 blocks was undecodable past that frame."""
    from kevinlang_spark.operators.flac import _BitReader, _read_utf8_number

    for n in (127, 128, 2047, 2048, 4095, 65535, (1 << 36) - 1):
        enc = _utf8_number(n)
        assert _read_utf8_number(_BitReader(enc)) == n, n
    assert _utf8_number(2048) == b"\xe0\xa0\x80"  # proper 3-byte coding
    with pytest.raises(ValueError, match="36 bits"):
        _utf8_number(1 << 36)


def test_long_stream_many_blocks_roundtrip():
    """>2048 frames end-to-end with a small block size (the shape the
    coded-number bug corrupted)."""
    n_blocks = 2100
    x = (np.arange(n_blocks * 4) % 251 - 125).astype(np.int64)
    _, _, s = flac_samples(make_flac(x, block_size=4))
    assert (s[:, 0] == x).all()


def test_unknown_total_samples_quarantines():
    """Review finding: total == 0 means UNKNOWN (RFC 9639), not 'zero
    frames' — silently returning empty audio is wrong data."""
    p = bytearray(make_flac(np.full(50, 9)))
    packed = int.from_bytes(p[18:26], "big")
    p[18:26] = (packed & ~((1 << 36) - 1)).to_bytes(8, "big")
    with pytest.raises(ValueError, match="unknown total"):
        flac_samples(bytes(p))
    with pytest.raises(ValueError, match="empty input"):
        make_flac(np.array([], dtype=np.int64))


def test_header_walk_rejects_corrupt_streaminfo(spark):
    """Review findings: stdlib_decode must not trust a fLaC prefix —
    a non-STREAMINFO first block or a 36-bit sample count that would
    overflow the Int32 feature column quarantines instead of returning
    garbage or killing the task."""
    from kevinlang_spark.operators.multimodal import (
        extract_media_features,
        stdlib_decode,
    )

    good = make_flac(np.full(50, 9))
    wrong_type = bytearray(good)
    wrong_type[4] = 0x81  # first block claims PADDING
    huge = bytearray(good)
    packed = int.from_bytes(huge[18:26], "big")
    packed = (packed & ~((1 << 36) - 1)) | (1 << 35)
    huge[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="STREAMINFO"):
        stdlib_decode(bytes(wrong_type), "audio")
    with pytest.raises(ValueError, match="unknown or corrupt"):
        stdlib_decode(bytes(huge), "audio")
    # and through the Arrow batch: null features, live task
    df = spark.createDataFrame(
        [(1, "audio", bytes(huge)), (2, "audio", good)],
        "doc_id bigint, media_type string, payload binary",
    )
    got = {
        r["doc_id"]: r
        for r in extract_media_features(df, decode=stdlib_decode).collect()
    }
    assert got[1]["n_frames"] is None and got[2]["n_frames"] == 50


def test_domain_cap_salts_skip_map_columns(spark):
    """Review finding: hashing every column broke frames with map-typed
    columns (xxhash64 cannot hash maps) — they are excluded by default,
    and salt_cols overrides the hash input."""
    from pyspark.sql import functions as F

    from kevinlang_spark.operators.web import domain_cap

    rows = [(i, "d.com", i, {"k": str(i)}) for i in range(20)]
    df = spark.createDataFrame(
        rows, "id bigint, domain string, rank bigint, meta map<string,string>"
    )
    got = domain_cap(df, "domain", 3, "rank", salt_buckets=4)
    assert sorted(r["id"] for r in got.collect()) == [0, 1, 2]
    got2 = domain_cap(
        df, "domain", 3, "rank", salt_buckets=4, salt_cols=["id"]
    )
    assert sorted(r["id"] for r in got2.collect()) == [0, 1, 2]
