"""PDF text extraction with zero external libraries — the curation
source for the web's second-biggest document format after HTML.

Honest codec-free subset (everything else raises ValueError →
quarantine, never a misextract): non-encrypted files, content streams
stored plain or FlateDecode-compressed (PDF's deflate IS stdlib zlib,
the PNG argument), text shown via the standard operators — ``Tj``,
``'``, ``"``, and ``TJ`` arrays — with literal ``(…)`` strings
(backslash escapes + octal) and hex ``<…>`` strings, standard-encoding
byte text (no CMap/CID translation).  Layout operators ``Td``/``TD``/
``T*`` map to line breaks, which is exactly the whitespace fidelity a
text-quality pipeline needs (token counts, Gopher rules) — not a
typeset reconstruction.

Spark-side shape: :func:`extract_pdf_text` is the standard
Arrow-batched ``mapInPandas`` extractor — per-payload Python rides the
scan partitions, only the extracted text shuffles downstream; the
parse is one linear pass per object, so cost is O(bytes) per file and
partition-parallel across files.

:func:`make_pdf` emits a minimal VALID single-page PDF (catalog →
pages → page → Helvetica font + content stream, xref table, trailer)
so fixtures are honest PDF files other readers open, not a private
dialect.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

#: object header / stream delimiters (PDF 32000-1 §7.3.10, §7.3.8)
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


def make_pdf(text_lines: list, compress: bool = True) -> bytes:
    """A minimal valid one-page PDF showing ``text_lines`` in Helvetica,
    one ``Tj`` per line with ``Td`` line advances; ``compress`` routes
    the content stream through FlateDecode (the overwhelmingly common
    form in the wild)."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("latin-1", "replace")

    body = b"BT /F1 12 Tf 72 720 Td\n"
    for i, line in enumerate(text_lines):
        if i:
            body += b"0 -14 Td\n"
        body += b"(" + esc(str(line)) + b") Tj\n"
    body += b"ET"
    if compress:
        data = zlib.compress(body)
        filt = b"/Filter /FlateDecode "
    else:
        data, filt = body, b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< " + filt + b"/Length " + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


def _pdf_string(buf: bytes, i: int):
    """Decode one literal string starting at ``buf[i] == '('``; returns
    (text, next_index).  Handles nested parens, backslash escapes, and
    octal codes (§7.3.4.2)."""
    assert buf[i : i + 1] == b"("
    out = bytearray()
    depth, i = 1, i + 1
    esc_map = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8,
        ord("f"): 12, ord("("): 40, ord(")"): 41, ord("\\"): 92,
    }
    while i < len(buf):
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(buf):
                break
            c2 = buf[i]
            if c2 in esc_map:
                out.append(esc_map[c2])
                i += 1
            elif 0x30 <= c2 <= 0x37:  # octal, 1-3 digits
                oct_digits = bytearray([c2])
                i += 1
                while len(oct_digits) < 3 and i < len(buf) and 0x30 <= buf[i] <= 0x37:
                    oct_digits.append(buf[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif c2 in (0x0A, 0x0D):  # line continuation
                i += 1
                if c2 == 0x0D and i < len(buf) and buf[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(c2)
                i += 1
        elif c == 0x28:  # nested (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return out.decode("latin-1"), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated PDF string literal")


_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
# the (?!\d) stops backtracking from splitting the digit run (greedy
# (\d+) retreating to a prefix so the ref-lookahead passes — '/Length
# 123 0 R' must NOT parse as direct length 12); the second lookahead
# excludes indirect refs of ANY generation, not just 0
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")


def _stream_text(stream: bytes) -> list:
    """Text chunks from one decoded content stream, in stream order;
    ``Td``/``TD``/``T*``/``'``/``\"`` contribute line breaks."""
    toks: list = []
    i = 0
    pending: list = []  # string operands awaiting their operator

    def flush_strings():
        if pending:
            toks.extend(pending)
            pending.clear()

    while i < len(stream):
        c = stream[i : i + 1]
        if c == b"(":
            s, i = _pdf_string(stream, i)
            pending.append(s)
            continue
        if c == b"<":
            if stream[i : i + 2] == b"<<":
                # inline dictionary (marked content: '/Tag <<…>> BDC',
                # ubiquitous in tagged PDFs) — step past the delimiter;
                # any strings inside are operands of the closing BDC/DP
                # operator and get cleared there
                i += 2
                continue
            m = _HEX_RE.match(stream, i)
            if not m:
                raise ValueError("unterminated PDF hex string")
            h = re.sub(rb"\s", b"", m.group(1))
            if len(h) % 2:
                h += b"0"  # §7.3.4.3: odd count → trailing 0
            pending.append(bytes.fromhex(h.decode()).decode("latin-1"))
            i = m.end()
            continue
        if c.isalpha() or c in (b"'", b'"', b"*"):
            # match IN PLACE — slicing the tail here would copy O(n)
            # bytes per operator and turn the pass quadratic
            m = _OP_RE.match(stream, i)
            op = m.group(0)
            i += len(op)
            if op in (b"Tj", b"TJ"):
                flush_strings()
            elif op in (b"'", b'"'):
                toks.append("\n")
                flush_strings()
            elif op in (b"Td", b"TD", b"T*"):
                flush_strings()
                toks.append("\n")
            else:
                pending.clear()  # strings were operands to a non-text op
            continue
        i += 1
    flush_strings()
    return toks


def pdf_text(payload: bytes) -> str:
    """Extract the shown text of a PDF — the honest stdlib subset (see
    module docstring).  Encrypted files, non-Flate filters, and
    malformed streams raise ValueError (quarantine semantics)."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF")
    if b"/Encrypt" in payload:
        raise ValueError("encrypted PDF — text extraction gated")
    chunks: list = []
    # cursor-based scan: after consuming a stream we resume PAST its
    # endstream, so 'N N obj … stream' byte patterns INSIDE stream
    # bodies (common in stored/Flate data) can't fabricate phantom
    # objects that would raise and false-quarantine a valid file
    pos = 0
    while True:
        m = _OBJ_RE.search(payload, pos)
        if m is None:
            break
        start = m.end()
        end = payload.find(b"endobj", start)
        if end < 0:
            end = len(payload)
        sm = _STREAM_RE.search(payload, start, end)
        if not sm:
            pos = end + 6  # len(b"endobj")
            continue
        head = payload[start : sm.start()]
        # prefer the dict's direct /Length — the EOL-before-endstream
        # heuristic eats a REAL trailing 0x0D data byte whenever a Flate
        # stream happens to end in \r (then writer's \n makes it look
        # like a two-byte EOL): ~0.4% of compressed streams
        lm = _LENGTH_RE.search(head)
        if lm:
            n = int(lm.group(1))
            data = payload[sm.end() : sm.end() + n]
            if len(data) < n:
                raise ValueError("PDF stream shorter than /Length")
            se = payload.find(b"endstream", sm.end() + n)
        else:
            # indirect/absent /Length: first endstream after the data
            # start (cursor semantics — rfind-within-object would trust
            # an 'endobj' that may itself sit inside the stream body)
            se = payload.find(b"endstream", sm.end())
            if se < 0:
                raise ValueError("PDF stream without endstream")
            data = payload[sm.end() : se]
            # §7.3.8.1: EOL before 'endstream' is not stream data
            if data.endswith(b"\r\n"):
                data = data[:-2]
            elif data.endswith(b"\n") or data.endswith(b"\r"):
                data = data[:-1]
        if se < 0:
            raise ValueError("PDF stream without endstream")
        pos = se + 9  # len(b"endstream")
        if b"/Filter" in head:
            if b"/FlateDecode" not in head:
                raise ValueError(
                    "only FlateDecode PDF streams extract codec-free"
                )
            try:
                data = zlib.decompress(data)
            except zlib.error as exc:
                raise ValueError(f"corrupt PDF Flate stream: {exc}") from exc
        if b"BT" not in data:
            continue  # not a text-showing content stream (font file, image)
        chunks.extend(_stream_text(data))
    # collapse the Td-newline markers into the line structure
    text = "".join(chunks)
    lines = [ln for ln in (p.strip() for p in text.split("\n")) if ln]
    return "\n".join(lines)


PDF_TEXT_SCHEMA = "doc_id bigint, n_bytes bigint, text string"


def extract_pdf_text(media_df: DataFrame) -> DataFrame:
    """(doc_id, payload) → (doc_id, n_bytes, text) via Arrow-batched
    mapInPandas over :func:`pdf_text`; undecodable payloads yield a
    NULL text row (file-level quarantine audit, the
    extract_pixel_stats convention)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts, sizes = [], []
            for p in pdf["payload"]:
                if p is None:
                    texts.append(None)
                    sizes.append(None)
                    continue
                b = bytes(p)
                sizes.append(len(b))
                try:
                    texts.append(pdf_text(b))
                except ValueError:
                    texts.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(sizes, dtype="Int64"),
                    "text": texts,
                }
            )

    return media_df.mapInPandas(batches, schema=PDF_TEXT_SCHEMA)
