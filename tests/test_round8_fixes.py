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
