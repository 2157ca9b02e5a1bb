"""Round-8 fixes: corrupt-container quarantine hardening, the 60-bit
binaryFile doc_id, and the end-to-end binaryFile ingest driver query.

ADVICE r7: a corrupt DEFLATE stream inside an otherwise well-formed PNG
raised zlib.error (and a short IHDR raised struct.error) out of
_png_pixels, escaping extract_pixel_stats' ``except ValueError``
quarantine and killing the task — reachable since read_media_dir
ingests arbitrary on-disk bytes.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from kevinlang_spark.operators.multimodal import (
    _png_pixels,
    extract_pixel_stats,
    make_png,
    stdlib_pixel_decode,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_with_corrupt_idat() -> bytes:
    """Well-formed chunk stream, garbage DEFLATE payload."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\xde\xad\xbe\xef\x00\x01\x02")
        + _chunk(b"IEND", b"")
    )


def _png_with_short_ihdr() -> bytes:
    """IHDR declares size 4 (< the 13 bytes struct.unpack needs)."""
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", b"\x00\x00\x00\x01")
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )


def test_corrupt_idat_raises_value_error_not_zlib_error():
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        _png_pixels(_png_with_corrupt_idat())


def test_short_ihdr_raises_value_error_not_struct_error():
    with pytest.raises(ValueError, match="malformed PNG IHDR"):
        _png_pixels(_png_with_short_ihdr())


def test_corrupt_payloads_quarantine_in_extract_pixel_stats(spark):
    """The documented contract: undecodable payloads yield null stats,
    never a dead task — including zlib/struct-level corruption."""
    rows = [
        (1, "image", _png_with_corrupt_idat()),
        (2, "image", _png_with_short_ihdr()),
        (3, "image", make_png(2, 2, rgb=(10, 20, 30))),
        (4, "audio", b"RIFFxxxxWAVE"),  # truncated container
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary"
    )
    got = {r["doc_id"]: r for r in extract_pixel_stats(df).collect()}
    assert got[1]["width"] is None and got[2]["width"] is None
    assert got[4]["rms"] is None
    assert got[3]["width"] == 2 and got[3]["mean_r"] == 10.0


def test_good_png_still_decodes():
    stats = stdlib_pixel_decode(make_png(3, 2, rgb=(5, 6, 7)), "image")
    assert (stats["width"], stats["height"]) == (3, 2)
    assert (stats["mean_r"], stats["mean_g"], stats["mean_b"]) == (5.0, 6.0, 7.0)


def test_media_ingest_query_end_to_end(spark, sf_dir):
    """q_media_ingest at sf0.001: documents ids 0 (BMP) and 25 (WAV) —
    decoded stats must equal the closed-form generation formulas, and
    the binaryFile length column must flow through as n_bytes."""
    import __spark_entry__ as entry

    from pyspark.sql import functions as F

    expected = {
        int(r["doc_id"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 25 == 0)
        .select("doc_id")
        .collect()
    }
    rows = {
        r["file_key"]: r
        for r in entry.queries()["q_media_ingest"](spark, sf_dir).collect()
    }
    assert set(rows) == expected and expected
    for d, r in rows.items():
        if d % 2 == 0:
            assert r["media_type"] == "image"
            w, h = d % 64 + 1, d % 48 + 1
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, 1)
            assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
                float(d % 256), float(d * 3 % 256), float(d * 7 % 256)
            )
            assert r["n_bytes"] == 54 + ((w * 3 + 3) // 4) * 4 * h
            assert r["rms"] is None
        elif d % 4 == 1:
            assert r["media_type"] == "audio"
            assert r["n_frames"] == d % 1000 + 1
            assert r["rms"] == float(d % 2048) == r["peak"]
            assert r["n_bytes"] == 44 + 2 * (d % 1000 + 1)
            assert r["width"] is None
        else:  # .txt junk -> 'other', quarantined to null stats
            assert r["media_type"] == "other"
            assert r["n_bytes"] == len(f"not media: {d}")
            assert r["width"] is None and r["rms"] is None


# --- round-8 code-review findings ---------------------------------------


def test_round_half_up_matches_spark_shortest_repr():
    """Review finding: Decimal(x) sees the exact binary double (5.5e-6
    is stored just BELOW the half), while Spark F.round rounds the
    shortest decimal rendering — Decimal(repr(x)).  These boundary
    doubles all round UP in Spark."""
    from kevinlang_spark.operators.similarity import _round_half_up

    assert _round_half_up(5e-7) == 1e-6
    assert _round_half_up(3.5e-6) == 4e-6
    assert _round_half_up(5.5e-6) == 6e-6
    assert _round_half_up(1.0000005) == 1.000001


def test_gif_gce_scope_is_one_image_only():
    """Review finding: GCE transparency leaked into GCE-less frames.
    Frame 2 (no GCE) draws index 0 everywhere — it must render
    palette[0] opaque, not keep frame 1's canvas through a stale
    transparent=0."""
    import struct

    import numpy as np

    from kevinlang_spark.operators.gif import _lzw_encode, _sub_blocks, gif_frames

    pal = [(9, 9, 9), (255, 0, 0)]
    out = bytearray(b"GIF89a") + struct.pack("<HH", 2, 2)
    out += bytes([0x80 | (1 << 4) | 1, 0, 0])
    for r, g, b in pal:
        out += bytes((r, g, b))
    out += b"\x00\x00\x00" * 2
    # frame 1: GCE transparent=0, draws index 1 (red)
    out += b"\x21\xf9\x04" + bytes([0x01, 0, 0, 0, 0])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
    out += bytes([2]) + _sub_blocks(_lzw_encode(b"\x01" * 4, 2))
    # frame 2: NO GCE, draws index 0 everywhere
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
    out += bytes([2]) + _sub_blocks(_lzw_encode(b"\x00" * 4, 2))
    out += b"\x3b"
    _, _, n, fr = gif_frames(bytes(out))
    assert n == 2
    assert (fr[1] == (9, 9, 9)).all()  # stale transparency would keep red


def test_corrupt_media_never_escapes_quarantine(spark):
    """Review finding: IndexError/StopIteration from truncated GIF/JPEG
    streams escaped the (ValueError, zlib, struct) quarantine and
    killed the task."""
    import struct as _s

    from kevinlang_spark.operators.gif import make_gif
    from kevinlang_spark.operators.jpeg import make_jpeg
    from kevinlang_spark.operators.multimodal import (
        extract_frame_stats,
        extract_pixel_stats,
    )

    gif_hdr = make_gif(2, 2, [0], [(1, 1, 1), (2, 2, 2)])[:13]
    bad_ext = gif_hdr + b"\x21"  # extension introducer, then EOF
    jp = bytearray(make_jpeg(8, 8, gray=5))
    i = jp.index(b"\xff\xda")
    jp[i + 5] = 9  # SOS references undeclared component id 9
    zero_gce = make_gif(2, 2, [0], [(1, 1, 1), (2, 2, 2)])
    j = zero_gce.index(b"\x21\xf9\x04")
    zero_gce = zero_gce[:j] + b"\x21\xf9\x00\x00" + zero_gce[j + 8 :]
    rows = [
        (1, "image", bytes(bad_ext)),
        (2, "image", bytes(jp)),
        (3, "image", zero_gce),
        (4, "image", make_jpeg(8, 8, gray=7)[:24]),  # truncated SOF
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary"
    )
    got = {r["doc_id"]: r for r in extract_pixel_stats(df).collect()}
    assert len(got) == 4 and all(got[d]["mean_r"] is None for d in got)
    assert extract_frame_stats(df).count() == 0  # no rows, no dead task


def test_jpeg_multi_scan_rejected_not_misdecoded():
    """Review finding: a 3-component stream whose SOS lists one
    component decoded as grayscale instead of raising."""
    import struct as _s

    import pytest as _pt

    from kevinlang_spark.operators.jpeg import jpeg_pixels, make_jpeg

    p = bytearray(make_jpeg(8, 8, rgb=(10, 20, 30)))
    i = p.index(b"\xff\xda")
    # rewrite SOS to ns=1 (Y only): new body = [1, comp1, Td/Ta, Ss, Se, Ah/Al]
    new_sos = b"\xff\xda" + _s.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    old_len = _s.unpack(">H", p[i + 2 : i + 4])[0]
    p[i : i + 2 + old_len] = new_sos
    with _pt.raises(ValueError, match="multi-scan"):
        jpeg_pixels(bytes(p))


def test_gif_disposal2_restores_global_background_color():
    """Review finding: disposal-2 restore indexed the CURRENT frame's
    local color table with the global bg index."""
    import struct

    import numpy as np

    from kevinlang_spark.operators.gif import _lzw_encode, _sub_blocks, gif_frames

    out = bytearray(b"GIF89a") + struct.pack("<HH", 2, 2)
    out += bytes([0x80 | (1 << 4) | 1, 1, 0])  # global bg index 1
    out += bytes((10, 10, 10)) + bytes((20, 20, 20))  # global table
    out += b"\x00\x00\x00" * 2  # pad to the declared 4-entry size
    # frame 1: disposal=2, LOCAL color table with different colors
    out += b"\x21\xf9\x04" + bytes([2 << 2, 0, 0, 0, 0])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0x81])  # local, 4 entries
    out += bytes((200, 0, 0)) + bytes((0, 200, 0)) + b"\x00" * 6  # local table
    out += bytes([2]) + _sub_blocks(_lzw_encode(b"\x00" * 4, 2))
    # frame 2: draws nothing new (1x1 patch of local-table color)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
    out += bytes([2]) + _sub_blocks(_lzw_encode(b"\x00", 2))
    out += b"\x3b"
    _, _, n, fr = gif_frames(bytes(out))
    assert n == 2
    # after disposal 2, the canvas region must be GLOBAL table color 1
    # (20,20,20) — not local_table[1] = (0,200,0)
    assert (fr[1][1, 1] == (20, 20, 20)).all()


def test_gif_truncated_middle_sub_block_detected():
    """Review finding: the cumulative-length check only fired on the
    first sub-block; later truncated blocks walked past the end."""
    import pytest as _pt

    from kevinlang_spark.operators.gif import gif_frames, make_gif

    # a large frame produces multiple 255-byte sub-blocks: truncate
    # INSIDE a later one
    p = make_gif(64, 48, [0], [(5, 5, 5), (6, 6, 6)])
    with _pt.raises(ValueError):
        gif_frames(p[: len(p) - 40])


def test_domain_cap_salt_spreads_tied_order_values(spark):
    """Review finding: salting on order_col alone put every tied row of
    a hot domain in ONE salt bucket.  With all-column salting, 200 tied
    rows of one domain must occupy several salt buckets."""
    from pyspark.sql import functions as F

    from kevinlang_spark.operators.web import domain_cap

    rows = [(i, "hot.com", 0) for i in range(200)]  # all ranks tie at 0
    df = spark.createDataFrame(rows, "id bigint, domain string, rank bigint")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8))
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets >= 4, n_buckets
    # and the capped result is still a valid 3-row answer
    assert domain_cap(df, "domain", 3, "rank", salt_buckets=8).count() == 3
