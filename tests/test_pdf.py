"""PDF text extraction (sources/pdf.py): round trips through both wire
forms, string-escape/octal/hex decoding, text-operator handling, and
the quarantine gates."""

from __future__ import annotations

import pytest

from kevinlang_spark.sources.pdf import (
    _stream_text,
    extract_pdf_text,
    make_pdf,
    pdf_text,
)


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_both_wire_forms(compress):
    lines = ["Hello World", "line two (with parens)", "back\\slash"]
    assert pdf_text(make_pdf(lines, compress=compress)) == "\n".join(lines)


def test_string_escapes_octal_hex():
    # \051 = ')', \101\102 = 'AB'; hex strings decode pairwise with the
    # odd-count trailing-zero rule
    assert _stream_text(rb"BT (A\051B) Tj ET") == ["A)B"]
    assert _stream_text(rb"BT (\101\102) Tj ET") == ["AB"]
    assert _stream_text(b"BT <48656C6C6F> Tj ET") == ["Hello"]
    assert _stream_text(b"BT <484> Tj ET") == ["H@"]
    assert _stream_text(rb"BT ((nested) parens) Tj ET") == ["(nested) parens"]


def test_tj_array_and_line_operators():
    assert _stream_text(b"BT [(ker) -120 (ned)] TJ ET") == ["ker", "ned"]
    # ' moves to the next line THEN shows; Td breaks before the string
    assert _stream_text(b"BT (a) Tj (b) ' ET") == ["a", "\n", "b"]
    assert _stream_text(b"BT (a) Tj 0 -14 Td (b) Tj ET") == ["a", "\n", "b"]
    # strings that are operands of a non-text operator never leak out
    assert _stream_text(b"BT (note) XYZ (real) Tj ET") == ["real"]


def test_quarantine_gates():
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_text(b"plain text")
    with pytest.raises(ValueError, match="encrypted"):
        pdf_text(make_pdf(["x"]) + b"/Encrypt")
    with pytest.raises(ValueError, match="FlateDecode"):
        pdf_text(
            make_pdf(["x"]).replace(b"/FlateDecode", b"/DCTDecode\x20\x20")
        )
    with pytest.raises(ValueError, match="corrupt"):
        pdf_text(make_pdf(["x"]).replace(b"stream\n", b"stream\n\x00\x07", 1))
    with pytest.raises(ValueError, match="unterminated"):
        _stream_text(b"BT (never closed Tj ET")


def test_non_text_streams_skipped():
    # a stream with no BT marker (font program, image) contributes
    # nothing rather than garbage
    pdf = make_pdf(["kept"], compress=False)
    extra = b"9 0 obj\n<< /Length 8 >>\nstream\nrawbytes\nendstream\nendobj\n"
    assert pdf_text(pdf + extra) == "kept"


def test_extractor_quarantines_per_row(spark):
    good = make_pdf(["row text"], compress=True)
    bad = good.replace(b"stream\n", b"stream\n\x00\x07", 1)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad)), (3, None)],
        "doc_id bigint, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_pdf_text(df).collect()}
    assert rows[1]["text"] == "row text"
    assert rows[2]["text"] is None and rows[2]["n_bytes"] == len(bad)
    assert rows[3]["text"] is None and rows[3]["n_bytes"] is None


def test_flate_stream_ending_in_carriage_return():
    # when zlib output ends in 0x0D the writer's \n makes the tail look
    # like a \r\n EOL; /Length-based slicing must keep the real byte.
    # doc 1238's q_pdf_extract fixture is the first natural repro; pin
    # a sweep so the boundary can't regress
    d = 1238
    lines = [f"doc {d} line {i} token{(d * 7 + i) % 1000}" for i in range(d % 4 + 1)]
    assert pdf_text(make_pdf(lines, compress=True)) == "\n".join(lines)
    for d in range(0, 3000, 2):
        lines = [f"doc {d} line {i} token{(d * 7 + i) % 1000}" for i in range(d % 4 + 1)]
        assert pdf_text(make_pdf(lines, compress=True)) == "\n".join(lines)


def test_inline_dictionary_marked_content():
    # tagged PDFs wrap text in '/Tag <<…>> BDC … EMC'; the dict must
    # not be misread as a hex string
    assert _stream_text(b"BT /P <</MCID 0>> BDC (x) Tj EMC ET") == ["x"]
    # a dict carrying a string value: the string is the dict's operand,
    # cleared at BDC, never leaked into the text
    assert _stream_text(b"BT /Span <</Alt (alt text)>> BDC (real) Tj EMC ET") == ["real"]
