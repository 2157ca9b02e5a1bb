"""WARC (ISO 28500) web-archive source — the Common Crawl ingestion path.

A WARC file is a stream of records, each framed by a ``WARC/1.0``
header block and a ``Content-Length``-delimited content block.  Common
Crawl (and ``wget --warc``) write each record as its own *gzip member*
and concatenate the members, so a reader can split a ~1 GB archive
without decompressing from the front; the whole-file-gzip and
uncompressed layouts are also valid WARC and handled here.

Scale rules baked in:

- **One file = one work unit.**  WARC is a sequential stream format —
  records inside a file cannot be split without scanning — so
  parallelism comes from the FILE axis, exactly how Common Crawl sizes
  its archives (~1 GB each, tens of thousands per crawl).  The
  ``binaryFile`` source plans one task per file; a 100 TB crawl is
  ~100k files = ~100k tasks, far above any cluster's slot count, so
  executors stay saturated with zero skew handling needed.
- **Bytes stay in Arrow.**  The payload column is ``binary`` end to
  end; record splitting runs in an Arrow-batched ``mapInPandas`` stage
  and emits bounded batches (``_CHUNK`` records at a time), so a
  million-record archive never materializes as one Python list.
- **Quarantine, never a dead task.**  A corrupt gzip member or a
  malformed record frame aborts THAT FILE's parse with a single
  ``warc_type='invalid'`` marker row (stream integrity is lost past the
  corruption point); every other file in the job is unaffected.
- **HTTP split without body copies.**  Response records carry an HTTP
  envelope; ``parse_http_response`` slices the status line and
  ``Content-Type`` out of the header block and returns the body as a
  zero-copy slice.

The reference engine has no web-archive source (its IO surface is the
CSV reader, ``/root/reference/src/Data/CsvParser.hs:12-45``); this
module is part of the beyond-reference LLM-pipeline tier, feeding the
curation operators (``operators/web.py``, ``operators/text.py``) from
raw crawl archives.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: records per emitted Arrow batch in read_warc's splitter stage
_CHUNK = 256

#: output schema of read_warc (flat; payload is the raw content block,
#: or the HTTP body for response records)
WARC_SCHEMA = (
    "warc_file string, rec_idx int, warc_type string, record_id string, "
    "target_uri string, warc_date string, http_status int, "
    "content_type string, payload binary, payload_len bigint"
)


# ---------------------------------------------------------------------------
# writer (fixture/export side)


def make_chunked(body: bytes, chunk_size: int = 100) -> bytes:
    """Frame ``body`` with Transfer-Encoding: chunked size lines (the
    as-sent form crawls capture); :func:`_dechunk` inverts it."""
    out = []
    for i in range(0, len(body), chunk_size):
        c = body[i : i + chunk_size]
        out.append(f"{len(c):x}\r\n".encode() + c + b"\r\n")
    out.append(b"0\r\n\r\n")
    return b"".join(out)


def make_http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
    gzip_body: bool = False,
) -> bytes:
    """Minimal HTTP/1.1 response envelope around ``body`` (the content
    block of a WARC ``response`` record).  ``gzip_body=True`` applies
    Content-Encoding: gzip; ``chunked=True`` frames with
    Transfer-Encoding: chunked instead of Content-Length; both compose
    (content coding inside transfer framing, RFC 9112 §6.1) — the
    reader must decode back to the identical payload either way."""
    import gzip as _gzip

    extra = ""
    if gzip_body:
        body = _gzip.compress(body, mtime=0)
        extra = "Content-Encoding: gzip\r\n"
    if chunked:
        head = (
            f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n{extra}"
            "Transfer-Encoding: chunked\r\n\r\n"
        )
        return head.encode("latin-1") + make_chunked(body)
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n{extra}"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("latin-1") + body


def make_warc_record(
    warc_type: str,
    content: bytes,
    uri: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    content_type: str | None = None,
    rec_id: str | None = None,
) -> bytes:
    """One uncompressed WARC/1.0 record.  ``rec_id`` defaults to a
    DETERMINISTIC urn derived from the content (md5), so fixture
    archives are byte-stable across runs and machines."""
    import hashlib

    if rec_id is None:
        rec_id = f"<urn:md5:{hashlib.md5(content).hexdigest()}>"
    if content_type is None:
        content_type = (
            "application/http; msgtype=response"
            if warc_type == "response"
            else "application/warc-fields"
        )
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", rec_id),
        ("WARC-Date", date),
        ("Content-Type", content_type),
        ("Content-Length", str(len(content))),
    ]
    if uri is not None:
        headers.insert(3, ("WARC-Target-URI", uri))
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    return head.encode("utf-8") + b"\r\n" + content + b"\r\n\r\n"


def make_warc(records: list[bytes], compress: bool = True) -> bytes:
    """Assemble record byte-blocks into one archive.  ``compress=True``
    writes the Common Crawl layout — one gzip MEMBER per record,
    members concatenated — with ``mtime=0`` so output is deterministic."""
    import gzip

    if not compress:
        return b"".join(records)
    return b"".join(gzip.compress(r, mtime=0) for r in records)


# ---------------------------------------------------------------------------
# parser


#: input window fed to the inflater per call in gunzip_members —
#: bounds the tail bytes zlib re-materializes as unused_data
_GZ_WINDOW = 1 << 20


def gunzip_members(data: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a concatenated-member stream.  Raises
    ``ValueError`` on a corrupt or truncated member (WARC readers must
    treat the rest of the file as unreachable — member boundaries can't
    be re-found past bad bytes).

    The inflater is fed bounded ``_GZ_WINDOW`` slices and the cursor
    advances by bytes consumed — feeding the whole remaining buffer
    would make zlib copy the unconsumed TAIL into ``unused_data`` once
    per member, O(file²) memcpy on a Common-Crawl-layout archive with
    tens of thousands of members."""
    mv = memoryview(data)
    off, n = 0, len(mv)
    while off < n:
        d = zlib.decompressobj(47)  # 32+15: auto-detect gzip/zlib header
        out: list[bytes] = []
        try:
            while not d.eof:
                if off >= n:
                    raise ValueError("truncated gzip member")
                chunk = mv[off : off + _GZ_WINDOW]
                out.append(d.decompress(chunk))
                consumed = len(chunk) - len(d.unused_data)
                off += consumed
                if consumed == 0 and not d.eof:
                    raise ValueError("gzip member makes no progress")
            out.append(d.flush())
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member: {exc}") from exc
        yield b"".join(out)


def _parse_frame(buf: bytes, pos: int, final: bool):
    """Parse ONE record frame at ``buf[pos:]``.  Returns (headers,
    content, new_pos), or None when the frame is incomplete and more
    bytes may follow (``final=False`` — the member-at-a-time reader
    waits); raises ``ValueError`` on a malformed or, when ``final``, a
    truncated frame."""
    n = len(buf)
    while buf.startswith(b"\r\n", pos):  # inter-record separators
        pos += 2
    if pos >= n:
        return None
    if n - pos >= 5 and not buf.startswith(b"WARC/", pos):
        raise ValueError("missing WARC version line")
    j = buf.find(b"\r\n\r\n", pos)
    if j < 0:
        if final:
            raise ValueError("unterminated WARC header block")
        return None
    lines = buf[pos:j].decode("utf-8", "replace").split("\r\n")
    if not lines[0].startswith("WARC/"):
        raise ValueError("missing WARC version line")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    try:
        clen = int(headers["content-length"])
    except (KeyError, ValueError) as exc:
        raise ValueError("missing/invalid Content-Length") from exc
    if clen < 0:
        # a negative length would move the cursor BACKWARD and loop the
        # incremental reader forever on one frame — quarantine instead
        raise ValueError("negative Content-Length")
    if n < j + 4 + clen:
        if final:
            raise ValueError("truncated record content")
        return None
    return headers, buf[j + 4 : j + 4 + clen], j + 4 + clen


def iter_warc_records(stream: bytes) -> Iterator[tuple[dict, bytes]]:
    """Parse sequential WARC record frames from an UNCOMPRESSED stream;
    yields (headers-dict lowercase-keyed, content-block bytes).  Raises
    ``ValueError`` at the first malformed frame."""
    pos = 0
    while True:
        parsed = _parse_frame(stream, pos, final=True)
        if parsed is None:
            break
        headers, content, pos = parsed
        yield headers, content


def _dechunk(body: bytes) -> bytes:
    """Decode a ``Transfer-Encoding: chunked`` body (size-line framing;
    trailers ignored).  Raises ``ValueError`` on malformed framing — the
    caller falls back to the raw body rather than quarantining."""
    out: list[bytes] = []
    i, n = 0, len(body)
    while True:
        j = body.find(b"\r\n", i)
        if j < 0:
            raise ValueError("chunk size line missing CRLF")
        size_tok = body[i:j].split(b";", 1)[0].strip()  # drop extensions
        try:
            size = int(size_tok, 16)
        except ValueError as exc:
            raise ValueError("bad chunk size") from exc
        if size < 0:
            raise ValueError("negative chunk size")
        if size == 0:
            return b"".join(out)
        if j + 2 + size + 2 > n:
            raise ValueError("truncated chunk")
        out.append(body[j + 2 : j + 2 + size])
        if body[j + 2 + size : j + 4 + size] != b"\r\n":
            raise ValueError("chunk missing trailing CRLF")
        i = j + 4 + size


def parse_http_response(content: bytes) -> tuple[int | None, str | None, bytes]:
    """Split a ``response`` record's HTTP envelope: returns (status,
    content-type, body-slice).  Non-HTTP content passes through as
    (None, None, content) — e.g. ``warcinfo`` blocks.  A
    ``Transfer-Encoding: chunked`` body (crawls capture responses
    AS SENT, framing included) is decoded; malformed chunk framing
    falls back to the raw body — degrade, never quarantine, at the
    record level."""
    if not content.startswith(b"HTTP/"):
        return None, None, content
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, content
    lines = content[:sep].decode("latin-1").split("\r\n")
    parts = lines[0].split(None, 2)
    # isascii() guards isdigit(): non-ASCII digit chars (e.g. latin-1
    # '²') pass str.isdigit but make int() raise — and that exception
    # would quarantine the whole rest of the file instead of this one
    # record degrading to (None, None, content)
    status = (
        int(parts[1])
        if len(parts) >= 2 and parts[1].isascii() and parts[1].isdigit()
        else None
    )
    ctype = None
    chunked = False
    gzipped = False
    for line in lines[1:]:
        k, _, v = line.partition(":")
        key = k.strip().lower()
        if key == "content-type":
            ctype = v.strip()
        elif key == "transfer-encoding" and "chunked" in v.strip().lower():
            chunked = True
        elif key == "content-encoding" and v.strip().lower() in (
            "gzip",
            "x-gzip",
            "deflate",
        ):
            gzipped = True
    body = content[sep + 4 :]
    # transfer framing first, then content coding (RFC 9112 §6.1 order)
    if chunked:
        try:
            body = _dechunk(body)
        except ValueError:
            pass  # keep the raw framed body; downstream text gates cope
    if gzipped:
        # wbits=47 autodetects zlib/gzip headers; -15 retries the
        # header-less RAW deflate stream many servers historically sent
        # under 'Content-Encoding: deflate' (the bug that forced
        # browsers to implement the same fallback)
        for wbits in (47, -15):
            try:
                d = zlib.decompressobj(wbits)
                out = d.decompress(body) + d.flush()
                if not d.eof:
                    raise ValueError("truncated content coding")
                body = out
                break
            except (zlib.error, ValueError):
                pass  # keep the coded body; degrade, never quarantine
    return status, ctype, body


def _frame_rows(name: str, buf: bytes, pos: int, idx: int, final: bool):
    """Parse COMPLETE record frames out of ``buf[pos:]`` into
    WARC_SCHEMA rows; returns (rows, new_pos, new_idx).  An incomplete
    tail is an error only when ``final`` — otherwise it waits for the
    next gzip member."""
    rows: list[tuple] = []
    while True:
        parsed = _parse_frame(buf, pos, final)
        if parsed is None:
            break
        headers, content, pos = parsed
        wtype = headers.get("warc-type", "unknown")
        status, http_ctype, body = (
            parse_http_response(content)
            if wtype == "response"
            else (None, None, content)
        )
        rows.append(
            (
                name,
                idx,
                wtype,
                headers.get("warc-record-id"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                status,
                http_ctype or headers.get("content-type"),
                body,
                len(body),
            )
        )
        idx += 1
    return rows, pos, idx


def split_warc_file(name: str, data: bytes) -> Iterator[tuple]:
    """Parse one archive's bytes into WARC_SCHEMA rows.  Detects the
    layout (member-gzip / whole-gzip vs plain) from the magic bytes and
    parses INCREMENTALLY — complete frames are emitted as each member
    decompresses, so a corrupt member mid-file quarantines only the
    unreachable remainder: records before the corruption are kept,
    followed by ONE ``('invalid', ...)`` marker row carrying the
    records-parsed-so-far index."""
    idx = 0
    buf, pos = b"", 0
    try:
        if data[:2] == b"\x1f\x8b":
            for member in gunzip_members(bytes(data)):
                buf = buf[pos:] + member
                pos = 0
                rows, pos, idx = _frame_rows(name, buf, pos, idx, False)
                yield from rows
        elif data[:4] == b"\x28\xb5\x2f\xfd":
            # whole-file zstd wrapper (concatenated plain frames inflate
            # as one stream).  The Common Crawl *.warc.zst convention's
            # shared-dictionary skippable frames are NOT modeled —
            # pyarrow fails on dictionary-needing frames and the file
            # quarantines honestly below, never a misparse.
            from kevinlang_spark.sources.archive import _zstd_decompress

            buf = _zstd_decompress(bytes(data))
        else:
            buf = bytes(data)
        rows, pos, idx = _frame_rows(name, buf, pos, idx, True)
        yield from rows
    except ValueError:
        yield (name, idx, "invalid", None, None, None, None, None, None, None)


def _split_stage(bronze: DataFrame) -> DataFrame:
    """The record-split stage over a (path, content) bronze frame —
    shared verbatim by the batch and streaming readers, so streaming
    ingestion is the SAME code path with a different source."""
    import os

    import pandas as pd

    cols = [c.strip().split(" ")[0] for c in WARC_SCHEMA.split(",")]

    def split_batches(batches):
        for pdf in batches:
            buf: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(fpath)
                for row in split_warc_file(fname, content):
                    buf.append(row)
                    if len(buf) >= _CHUNK:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
            if buf:
                yield pd.DataFrame(buf, columns=cols)

    return bronze.select("path", "content").mapInPandas(
        split_batches, schema=WARC_SCHEMA
    )


def read_warc(spark, path: str, glob: str = "*.warc*") -> DataFrame:
    """Read a directory/bucket of WARC archives into a flat record
    table (WARC_SCHEMA).  File listing, split planning and byte reads
    are JVM-side (``binaryFile``); the record splitter is one
    Arrow-batched ``mapInPandas`` stage emitting ``_CHUNK``-record
    batches.  ``warc_file`` is the archive basename — the natural
    re-partition key for downstream per-crawl work."""
    bronze = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )
    return _split_stage(bronze)


def stream_warc(spark, path: str, glob: str = "*.warc*") -> DataFrame:
    """STREAMING WARC ingestion: the same record splitter over a
    ``binaryFile`` file-source stream — the continuous-crawl shape
    (new archives land in the bucket; each micro-batch splits only the
    new files).  The file source tracks processed files in the
    checkpoint, so records are ingested exactly once."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("modificationTime", TimestampType()),
            StructField("length", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    bronze = (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return _split_stage(bronze)
