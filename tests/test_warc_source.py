"""WARC web-archive source: writer/parser round trip, gzip member
split, HTTP envelope split, quarantine, and the distributed reader."""

from __future__ import annotations

import gzip
import hashlib

import pytest

from kevinlang_spark.sources.warc import (
    gunzip_members,
    iter_warc_records,
    make_http_response,
    make_warc,
    make_warc_record,
    parse_http_response,
    read_warc,
    split_warc_file,
)


def _page(i: int) -> bytes:
    return f"<html><body>page {i}</body></html>".encode()


def _archive(n: int = 3, compress: bool = True) -> bytes:
    recs = [
        make_warc_record("warcinfo", b"software: kevinlang-spark\r\n")
    ] + [
        make_warc_record(
            "response",
            make_http_response(_page(i)),
            uri=f"http://example.com/{i}",
        )
        for i in range(n)
    ]
    return make_warc(recs, compress=compress)


def test_roundtrip_uncompressed():
    recs = list(iter_warc_records(_archive(3, compress=False)))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo"] + ["response"] * 3
    status, ctype, body = parse_http_response(recs[1][1])
    assert (status, body) == (200, _page(0))
    assert ctype == "text/html; charset=utf-8"
    assert recs[2][0]["warc-target-uri"] == "http://example.com/1"


def test_roundtrip_member_gzip():
    data = _archive(2, compress=True)
    members = list(gunzip_members(data))
    assert len(members) == 3  # warcinfo + 2 responses: one member each
    recs = list(iter_warc_records(b"".join(members)))
    assert len(recs) == 3


def test_whole_file_gzip_and_deterministic_bytes():
    # single-member whole-file gzip is also valid WARC
    plain = _archive(2, compress=False)
    rows = list(split_warc_file("a.warc.gz", gzip.compress(plain, mtime=0)))
    assert [r[2] for r in rows] == ["warcinfo", "response", "response"]
    # writer determinism (mtime=0): same input → same bytes
    assert _archive(2) == _archive(2)


def test_record_id_deterministic_from_content():
    r1 = make_warc_record("response", make_http_response(_page(7)))
    r2 = make_warc_record("response", make_http_response(_page(7)))
    assert r1 == r2
    (h, _), = iter_warc_records(r1)
    assert h["warc-record-id"].startswith("<urn:md5:")


def test_truncated_member_raises():
    data = _archive(2)
    with pytest.raises(ValueError):
        list(gunzip_members(data[: len(data) - 10]))


def test_malformed_frames_raise():
    with pytest.raises(ValueError):
        list(iter_warc_records(b"NOT A WARC\r\n\r\n"))
    rec = make_warc_record("response", b"x" * 10)
    with pytest.raises(ValueError):  # content shorter than Content-Length
        list(iter_warc_records(rec[:-14]))


def test_split_quarantines_corrupt_file_after_good_records():
    good = make_warc(
        [make_warc_record("warcinfo", b"software: x\r\n")], compress=True
    )
    bad = good + b"\x1f\x8b\x08\x00garbage-member"
    rows = list(split_warc_file("bad.warc.gz", bad))
    assert [r[2] for r in rows] == ["warcinfo", "invalid"]
    assert rows[1][1] == 1 and rows[1][8] is None  # idx reached, null payload


def test_http_parse_non_http_passthrough():
    assert parse_http_response(b"just bytes") == (None, None, b"just bytes")


def test_read_warc_distributed(spark, tmp_path):
    (tmp_path / "00.warc.gz").write_bytes(_archive(3))
    (tmp_path / "01.warc.gz").write_bytes(_archive(2))
    (tmp_path / "junk.warc.gz").write_bytes(b"\x1f\x8b\x08\x00nope")
    (tmp_path / "ignore.txt").write_bytes(b"not a warc")
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["warc_file"], []).append(r)
    assert set(by_file) == {"00.warc.gz", "01.warc.gz", "junk.warc.gz"}
    assert len(by_file["00.warc.gz"]) == 4 and len(by_file["01.warc.gz"]) == 3
    assert [r["warc_type"] for r in by_file["junk.warc.gz"]] == ["invalid"]
    resp = [r for r in by_file["00.warc.gz"] if r["warc_type"] == "response"]
    assert sorted(r["rec_idx"] for r in resp) == [1, 2, 3]
    for r in resp:
        i = int(r["target_uri"].rsplit("/", 1)[1])
        assert bytes(r["payload"]) == _page(i)
        assert r["http_status"] == 200
        assert r["payload_len"] == len(_page(i))
        assert r["content_type"] == "text/html; charset=utf-8"
    info = [r for r in by_file["01.warc.gz"] if r["warc_type"] == "warcinfo"]
    assert info[0]["content_type"] == "application/warc-fields"
    assert info[0]["http_status"] is None


def test_read_warc_chunked_batches(spark, tmp_path):
    # more records than one _CHUNK batch: all come through exactly once
    recs = [
        make_warc_record(
            "response",
            make_http_response(_page(i)),
            uri=f"http://example.com/{i}",
        )
        for i in range(300)
    ]
    (tmp_path / "big.warc.gz").write_bytes(make_warc(recs))
    df = read_warc(spark, str(tmp_path), glob="big.warc.gz")
    assert df.count() == 300
    md5s = {
        r["m"]
        for r in df.selectExpr("md5(payload) AS m").distinct().collect()
    }
    assert md5s == {hashlib.md5(_page(i)).hexdigest() for i in range(300)}


def test_negative_content_length_quarantines_not_hangs():
    # a self-referencing frame (clen < 0 moves the cursor backward)
    # must quarantine, not loop the incremental reader forever
    rec = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -33\r\n\r\n"
    rows = list(split_warc_file("neg.warc", rec))
    assert [r[2] for r in rows] == ["invalid"]
    with pytest.raises(ValueError):
        list(iter_warc_records(rec))


def test_non_ascii_status_degrades_to_passthrough():
    # latin-1 '\xb2' decodes to a char where str.isdigit() is True but
    # int() raises — must degrade THIS record, not quarantine the file
    body = b"HTTP/1.1 \xb200 OK\r\nContent-Type: text/html\r\n\r\nhi"
    # the envelope still splits; only the unparseable status nulls
    assert parse_http_response(body) == (None, "text/html", b"hi")
    rec = make_warc_record("response", body, uri="http://e.com/x")
    after = make_warc_record("response", make_http_response(b"ok"),
                             uri="http://e.com/y")
    rows = list(split_warc_file("s.warc.gz", make_warc([rec, after])))
    assert [r[2] for r in rows] == ["response", "response"]
    assert rows[0][6] is None and rows[1][6] == 200


def test_gunzip_members_windowed_progress():
    # members larger than the 1 MiB input window still split correctly
    import gzip

    big = make_warc_record("response", make_http_response(b"x" * (3 << 20)))
    small = make_warc_record("warcinfo", b"software: x\r\n")
    data = gzip.compress(big, mtime=0) + gzip.compress(small, mtime=0)
    members = list(gunzip_members(data))
    assert members == [big, small]


def test_chunked_transfer_encoding_decodes():
    # crawls capture responses AS SENT: chunked framing included
    body = b"4\r\nWiki\r\n6\r\npedia \r\nD;ext=1\r\nin\r\n\r\nchunks.\r\n0\r\n\r\n"
    head = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
    )
    status, ctype, out = parse_http_response(head + body)
    assert (status, out) == (200, b"Wikipedia in\r\n\r\nchunks.")
    # malformed framing falls back to the raw body, never raises
    bad = head + b"ZZZ\r\nnot chunked"
    status, _, out = parse_http_response(bad)
    assert status == 200 and out == b"ZZZ\r\nnot chunked"
    # and payload_len downstream reflects the DECODED body
    rec = make_warc_record("response", head + body, uri="http://e.com/c")
    rows = list(split_warc_file("c.warc.gz", make_warc([rec])))
    assert rows[0][9] == len(b"Wikipedia in\r\n\r\nchunks.")


def test_content_encoding_gzip_decodes_and_composes():
    page = b"<html><body>compressed page</body></html>"
    # gzip alone
    rec = make_http_response(page, gzip_body=True)
    assert parse_http_response(rec) == (
        200, "text/html; charset=utf-8", page
    )
    # gzip INSIDE chunked framing (RFC 9112 order: de-frame, then decode)
    both = make_http_response(page, gzip_body=True, chunked=True)
    assert parse_http_response(both)[2] == page
    # corrupt coded body degrades to the raw bytes, never raises
    head = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\nContent-Length: 9\r\n\r\nnot gzip!"
    )
    assert parse_http_response(head)[2] == b"not gzip!"


def test_content_encoding_deflate_both_wrappings_decode():
    import zlib

    page = b"<html><body>deflated page</body></html>"
    head = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: deflate\r\n\r\n"
    )
    # zlib-wrapped deflate (the RFC 9110 meaning of the token)
    assert parse_http_response(head + zlib.compress(page)) == (
        200, "text/html", page
    )
    # RAW deflate (the historically common server bug: no zlib header)
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    raw = c.compress(page) + c.flush()
    assert parse_http_response(head + raw) == (200, "text/html", page)


# ---------------------------------------------------------------------------
# zstd-wrapped WARC (round 10): whole-file frames inflate, dictionary
# (skippable-frame) archives quarantine honestly


def test_split_warc_zstd_whole_file_roundtrip():
    from kevinlang_spark.sources.archive import _zstd_compress
    from kevinlang_spark.sources.warc import (
        make_warc,
        make_warc_record,
        split_warc_file,
    )

    recs = [
        make_warc_record("response", b"<html>zstd one</html>",
                         uri="http://a.test/1"),
        make_warc_record("response", b"<html>zstd two</html>",
                         uri="http://a.test/2"),
    ]
    plain = make_warc(recs, compress=False)
    z = _zstd_compress(plain)
    rows_z = list(split_warc_file("f.warc.zst", z))
    rows_p = list(split_warc_file("f.warc", plain))
    # identical records modulo the file-name column
    assert [r[1:] for r in rows_z] == [r[1:] for r in rows_p]
    assert len(rows_z) == 2
    assert all(r[2] == "response" for r in rows_z)


def test_split_warc_zstd_corrupt_quarantines():
    from kevinlang_spark.sources.warc import split_warc_file

    rows = list(
        split_warc_file("bad.warc.zst", b"\x28\xb5\x2f\xfd not a frame")
    )
    assert len(rows) == 1 and rows[0][2] == "invalid"
