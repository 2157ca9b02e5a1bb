"""Property-based round trips for the round-9c container tier
(sources/archive.py ZIP/TAR, sources/pdf.py): arbitrary member
names/contents must survive archive → enumerate exactly, and arbitrary
text must survive PDF render → extract under the documented whitespace
contract (per-line trim, blank lines drop)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

#: member-name alphabet: portable archive names (no slashes at the
#: edges, no '.', which WebDataset grouping treats as the key split)
_NAME = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-",
    min_size=1,
    max_size=40,
)


@settings(max_examples=25, deadline=None)
@given(
    members=st.dictionaries(
        _NAME, st.binary(min_size=0, max_size=2000), min_size=1, max_size=6
    ),
    compress=st.booleans(),
)
def test_zip_roundtrip_arbitrary_members(members, compress):
    from kevinlang_spark.sources.archive import _zip_members, make_zip

    got = {
        m: data
        for m, size, _crc, st_, data in _zip_members(
            make_zip(members, compress=compress)
        )
        if st_ == "ok"
    }
    assert got == members


@settings(max_examples=25, deadline=None)
@given(
    members=st.dictionaries(
        _NAME, st.binary(min_size=0, max_size=2000), min_size=1, max_size=6
    ),
    gz=st.booleans(),
)
def test_tar_roundtrip_arbitrary_members(members, gz):
    from kevinlang_spark.sources.archive import _tar_members, make_tar

    got = {
        m: data
        for m, _size, st_, data in _tar_members(make_tar(members, gz=gz))
        if st_ == "ok"
    }
    assert got == members


#: PDF text alphabet: printable latin-1 incl. the chars that need
#: escaping in literals; no control chars (the extractor's line
#: contract strips/collapses whitespace)
_PDF_LINE = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0xFF, exclude_characters="\x7f"
    ),
    min_size=1,
    max_size=60,
).map(str.strip).filter(bool)


@settings(max_examples=25, deadline=None)
@given(
    lines=st.lists(_PDF_LINE, min_size=1, max_size=8),
    compress=st.booleans(),
)
def test_pdf_roundtrip_arbitrary_lines(lines, compress):
    from kevinlang_spark.sources.pdf import make_pdf, pdf_text

    assert pdf_text(make_pdf(lines, compress=compress)) == "\n".join(lines)


@settings(max_examples=25, deadline=None)
@given(paras=st.lists(_PDF_LINE, min_size=1, max_size=6))
def test_docx_roundtrip_arbitrary_paragraphs(paras):
    # the WordprocessingML chain is Catalyst-side; its Python mirror is
    # the same regex sequence — verify the ESCAPE side (make_docx) and
    # the XML structure round-trip through a reference implementation
    import re

    from kevinlang_spark.sources.archive import _zip_members, make_docx

    xml = {
        m: d for m, _s, _c, st_, d in _zip_members(make_docx(paras))
    }["word/document.xml"].decode()
    t = re.sub(r"</w:p>|<w:br[^>]*/>|<w:cr[^>]*/>", "\n", xml)
    t = re.sub(r"<w:tab[^>]*/>", "\t", t)
    t = re.sub(r"<[^>]*>", "", t)
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        t = t.replace(ent, ch)
    assert re.sub(r"\s+$", "", t) == "\n".join(paras)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=48),
    h=st.integers(min_value=1, max_value=40),
    grays=st.lists(
        st.integers(min_value=0, max_value=255), min_size=1, max_size=4
    ),
)
def test_avi_constant_frames_roundtrip(w, h, grays):
    # constant-gray MJPEG frames decode bit-exactly (all-ones
    # quantization), for every dimension and frame count
    from kevinlang_spark.operators.jpeg import make_jpeg
    from kevinlang_spark.operators.multimodal import _avi_mjpeg_frames, make_avi

    avi = make_avi(w, h, [make_jpeg(w, h, gray=g) for g in grays])
    got_w, got_h, frames = _avi_mjpeg_frames(avi)
    assert (got_w, got_h, frames.shape[0]) == (w, h, len(grays))
    for f, g in enumerate(grays):
        assert (frames[f] == g).all()
