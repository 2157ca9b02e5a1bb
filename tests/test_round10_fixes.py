"""Round-10 ADVICE fixes, pinned:

1. pdf.py _LENGTH_RE: backtracking could split the digit run so an
   indirect '/Length 123 0 R' parsed as direct length 12 (truncated
   stream → silent text loss / false quarantine); any-generation
   indirect refs ('/Length 8 1 R') must also fall through to the
   endstream heuristic.
2. pdf.py pdf_text: the object scan must not regex-match INSIDE stream
   bodies — stored/Flate bytes that look like 'N N obj … stream' used
   to fabricate phantom objects and false-quarantine valid files.
3. text.py lm_perplexity: an all-empty-token train slice must raise
   (token-mass guard), not silently emit NULL scores via a 0/(N+V=0)
   division with ANSI off.
"""

from __future__ import annotations

import re
import zlib

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.sources.pdf import _LENGTH_RE, make_pdf, pdf_text


def _one_stream_pdf(head: bytes, stream_body: bytes) -> bytes:
    """Minimal PDF wrapping one content-stream object with an arbitrary
    dict head — for exercising the /Length parse paths directly."""
    return (
        b"%PDF-1.4\n1 0 obj\n" + head + b"\nstream\n" + stream_body
        + b"\nendstream\nendobj\n%%EOF\n"
    )


def test_length_re_indirect_ref_not_split_by_backtracking():
    # '/Length 123 0 R' must NOT yield a direct match of '12'
    assert _LENGTH_RE.search(b"<< /Length 123 0 R >>") is None
    # any generation, not just 0
    assert _LENGTH_RE.search(b"<< /Length 8 1 R >>") is None
    assert _LENGTH_RE.search(b"<< /Length 8 12 R >>") is None
    # direct lengths still parse, including multi-digit
    m = _LENGTH_RE.search(b"<< /Length 123 >>")
    assert m is not None and m.group(1) == b"123"
    # a direct length followed by another key is still direct
    m = _LENGTH_RE.search(b"<< /Length 47 /Filter /FlateDecode >>")
    assert m is not None and m.group(1) == b"47"


def test_indirect_length_falls_through_to_endstream_heuristic():
    body = b"BT (indirect ok) Tj ET"
    pdf = _one_stream_pdf(b"<< /Length 2 0 R >>", body)
    # before the fix this truncated the stream to its first 2 bytes
    # ('/Length 2 0 R' → direct 2 via backtracking at the old regex's
    # weaker lookahead) and lost the text silently
    assert pdf_text(pdf) == "indirect ok"


def test_stream_body_cannot_fabricate_phantom_objects():
    # stored stream whose DATA contains an object header + 'stream'
    # keyword; a raw finditer scan used to "find" this phantom object,
    # fail to find its endstream/Length sanely, and false-quarantine
    evil = b"BT (real text) Tj ET % 7 0 obj << >> stream\n xx"
    pdf = _one_stream_pdf(
        b"<< /Length " + str(len(evil)).encode() + b" >>", evil
    )
    assert pdf_text(pdf) == "real text"


def test_flate_body_with_phantom_header_roundtrips():
    # same property through the compressed path: craft a Flate stream
    # whose compressed bytes happen to contain 'obj'/'stream' markers is
    # hard to force, so instead embed the marker in a SECOND stored
    # stream and make sure the scan resumes past each endstream
    s1 = b"BT (first) Tj T* ET"  # T* so the streams join on a line break
    s2 = b"9 0 obj stream\n junk"  # looks like a header, is data
    s3 = zlib.compress(b"BT (third) Tj ET")
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Length " + str(len(s1)).encode() + b" >>\n"
        b"stream\n" + s1 + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(s2)).encode() + b" >>\n"
        b"stream\n" + s2 + b"\nendstream\nendobj\n"
        b"3 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(s3)).encode() + b" >>\n"
        b"stream\n" + s3 + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert pdf_text(pdf) == "first\nthird"


def test_make_pdf_fixtures_still_roundtrip():
    lines = ["alpha", "beta (y)", "gamma"]
    for compress in (True, False):
        assert pdf_text(make_pdf(lines, compress=compress)) == "\n".join(lines)


def test_lm_perplexity_all_empty_token_train_slice_raises(spark):
    import pyspark.sql.functions as F

    from kevinlang_spark.operators.text import lm_perplexity

    df = spark.createDataFrame(
        [(1, "...", True), (2, "real words here to score", False)],
        "id bigint, body string, is_train boolean",
    )
    # train doc tokenizes to zero tokens → token-mass guard must fire
    with pytest.raises(ValueError, match="training slice has no tokens"):
        lm_perplexity(
            df, text_col="body", id_col="id",
            train_filter=F.col("is_train"),
        )


def test_lm_perplexity_nonempty_train_still_works(spark):
    import pyspark.sql.functions as F

    from kevinlang_spark.operators.text import lm_perplexity

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", True),
            (2, "the cat sat on the hat", False),
        ],
        "id bigint, body string, is_train boolean",
    )
    out = lm_perplexity(
        df, text_col="body", id_col="id", train_filter=F.col("is_train")
    ).collect()
    scored = {r["id"]: r for r in out}
    assert 2 in scored
    assert scored[2]["avg_logp"] is not None
    assert scored[2]["perplexity"] is not None


# --------------------------------------------------------------------- #
# PIL decode fast path (VERDICT r9 item 4): routing + parity
# --------------------------------------------------------------------- #


def test_decode_frames_pure_fallback_without_pil():
    """In a codec-less environment decode_frames(prefer_pil=True) must
    silently use the pure tier — identical output to prefer_pil=False."""
    import numpy as np

    from kevinlang_spark.operators.multimodal import (
        decode_frames,
        make_bmp,
        pil_available,
    )

    payload = make_bmp(6, 4, rgb=(10, 20, 30))
    w0, h0, f0 = decode_frames(payload, prefer_pil=False)
    w1, h1, f1 = decode_frames(payload, prefer_pil=True)
    assert (w0, h0) == (w1, h1) == (6, 4)
    assert np.array_equal(f0, f1)
    if not pil_available():
        import pytest as _pytest

        from kevinlang_spark.operators.multimodal import pil_frames

        with _pytest.raises(NotImplementedError, match="PIL"):
            pil_frames(payload)


def test_pil_parity_on_synthetic_corpus():
    """PIL output vs the pure decoders on the synthetic corpus
    (VERDICT r9 item 4's oracle cross-check): lossless containers
    (BMP/PNG/GIF) must agree exactly; JPEG within the ±1/pixel lossy
    latitude (different IDCTs are both spec-conformant)."""
    import pytest as _pytest

    _pytest.importorskip("PIL")
    import numpy as np

    from kevinlang_spark.operators.gif import make_gif
    from kevinlang_spark.operators.jpeg import make_jpeg
    from kevinlang_spark.operators.multimodal import (
        _decode_frames,
        make_bmp,
        make_png,
        pil_frames,
    )

    lossless = [
        make_bmp(9, 7, rgb=(11, 22, 33)),
        make_png(8, 6, rgb=(200, 100, 50)),
        make_gif(5, 4, frames=[0, 1], palette=[(7, 7, 7), (99, 99, 99)]),
    ]
    for payload in lossless:
        wp, hp, fp = pil_frames(payload)
        w0, h0, f0 = _decode_frames(payload)
        assert (wp, hp) == (w0, h0)
        assert np.array_equal(fp, f0)
    jp = make_jpeg(16, 16, gray=123)
    wp, hp, fp = pil_frames(jp)
    w0, h0, f0 = _decode_frames(jp)
    assert (wp, hp) == (w0, h0)
    assert np.max(np.abs(fp.astype(int) - f0.astype(int))) <= 1


def test_extract_pixel_stats_prefer_pil_matches_pure_when_absent(spark):
    """prefer_pil=True must be a no-op (bit-identical stats) when PIL is
    not importable — the codec-less deployment contract."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_pixel_stats,
    )

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = attach_stdlib_media(docs, filled=True, png=True)
    pure = sorted(tuple(r) for r in extract_pixel_stats(media).collect())
    fast = sorted(
        tuple(r)
        for r in extract_pixel_stats(media, prefer_pil=True).collect()
    )
    assert pure == fast


def test_pdf_scan_property_marker_bytes_in_streams():
    """Property: pdf_text must extract exactly the shown lines no matter
    what marker-like byte sequences ('N N obj', 'stream', 'endobj')
    appear INSIDE content-stream string literals — the cursor-based
    object scan never re-enters consumed stream extents."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    evil_tokens = ["7 0 obj", "stream", "endobj", "xref", "%PDF-", "<<"]

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=32, max_codepoint=126
                ),
                min_size=0,
                max_size=30,
            ),
            min_size=1,
            max_size=5,
        ),
        st.lists(st.sampled_from(evil_tokens), max_size=3),
        st.booleans(),
    )
    def check(lines, evils, compress):
        # inject the marker-like tokens into the shown text itself
        salted = [ln + " " + " ".join(evils) for ln in lines]
        out = pdf_text(make_pdf(salted, compress=compress))
        expect = "\n".join(
            ln for ln in (s.strip() for s in salted) if ln
        )
        assert out == expect

    check()


# --------------------------------------------------------------------- #
# fill-in-the-middle transformation (round 10)
# --------------------------------------------------------------------- #


def test_fim_reassembly_and_determinism(spark):
    """Every applied row reassembles to the original text (prefix +
    middle + suffix partition the characters), unapplied rows pass
    through untouched, and the transformation replays bit-identically
    across partitionings."""
    from kevinlang_spark.operators.text import fim_transform

    rows = [(i, f"document {i} body " + "abcdefghij" * (i % 5)) for i in range(60)]
    rows += [(60, None), (61, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in fim_transform(df, rate=0.5).collect()}
    orig = dict(rows)
    n_applied = 0
    for d, r in out.items():
        if not r["fim_applied"]:
            assert r["text_out"] == orig[d]
            continue
        n_applied += 1
        t = r["text_out"]
        assert t.startswith("<PRE>")
        body = t[len("<PRE>"):]
        pre, rest = body.split("<SUF>", 1)
        sufx, midl = rest.split("<MID>", 1)
        assert pre + midl + sufx == orig[d]
    assert 10 < n_applied < 50  # ~half at rate=0.5
    assert not out[60]["fim_applied"] and out[60]["text_out"] is None
    assert not out[61]["fim_applied"] and out[61]["text_out"] == ""
    again = {r["doc_id"]: r["text_out"]
             for r in fim_transform(df.repartition(7), rate=0.5).collect()}
    assert again == {d: r["text_out"] for d, r in out.items()}


def test_fim_rate_exact_threshold(spark):
    """ADVICE r10: sub-percent rates must not quantize — selection is
    h52 < int(rate * 2**52) exactly, replayed here per-id with
    hashlib."""
    import hashlib

    from kevinlang_spark.operators.text import fim_transform

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("body text here").alias("text")
    )
    for rate in (0.004, 0.005, 0.031):
        got = {
            r["doc_id"]
            for r in fim_transform(df, rate=rate).collect()
            if r["fim_applied"]
        }
        thr = int(rate * 2**52)
        want = {
            i
            for i in range(2000)
            if int(hashlib.md5(f"{i}#fim".encode()).hexdigest()[:13], 16) < thr
        }
        assert got == want, f"rate={rate}"
    # 0.004 and 0.005 must differ (old code mapped them to 0% and 1%)
    sel = {
        rate: sum(
            r["fim_applied"] for r in fim_transform(df, rate=rate).collect()
        )
        for rate in (0.0, 0.004, 0.005)
    }
    assert sel[0.0] == 0 and 0 < sel[0.004] <= sel[0.005]


def test_fim_rate_bounds(spark):
    import pytest as _pytest

    from kevinlang_spark.operators.text import fim_transform

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="rate"):
        fim_transform(df, rate=1.5)
    assert all(
        not r["fim_applied"]
        for r in fim_transform(df, rate=0.0).collect()
    )


def test_fim_plan_is_scan_stage(spark):
    """Zero shuffle, zero Python: the rewrite must be a pure projection."""
    from kevinlang_spark.operators.text import fim_transform
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("some body text").alias("text")
    )
    plan = executed_plan(fim_transform(df))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange") <= 1  # at most the spread() repartition


def test_code_stats_stack_filters(spark):
    """The Stack / StarCoder file-filter semantics: SPDX beats header
    heuristics, over-long lines and autogen markers fail the gate,
    integer outputs carry the gate math exactly, NULL text quarantines
    to NULL stats."""
    from kevinlang_spark.operators.text import code_stats

    rows = [
        (1, "// SPDX-License-Identifier: BSD-3-Clause\nMIT License\ncode"),
        (2, "/* MIT License */\nint x;"),
        (3, "prose line\n" + "y" * 1500),
        (4, "# Auto-Generated by tool\nbody"),
        (5, "short\nlines\nhere"),
        (6, None),
        (7, "%%%% @@@@ !!!! ~~~~ ^^^^"),  # <25% alphanumeric
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in code_stats(df).collect()}
    assert got[1]["license"] == "BSD-3-Clause"  # SPDX wins over 'MIT License'
    assert got[2]["license"] == "MIT" and got[2]["passes"]
    assert got[3]["max_line_len"] == 1500 and not got[3]["passes"]
    assert got[4]["autogen"] and not got[4]["passes"]
    assert got[5]["license"] is None and got[5]["passes"]
    assert got[6]["n_lines"] is None and got[6]["passes"] is None
    assert not got[7]["passes"] and 4 * got[7]["alnum_chars"] < got[7]["n_chars"]


def test_code_stats_plan_is_scan_stage(spark):
    from kevinlang_spark.operators.text import code_stats
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("a\nbb\nccc").alias("text")
    )
    plan = executed_plan(code_stats(df))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange") <= 1  # at most the spread() repartition



def test_encoding_quality_damage_classes(spark):
    """Each damage class trips its counter and the clean verdict:
    U+FFFD, cp1252-reread mojibake markers, C0 control bytes; the 1%
    control tolerance is integer math; NULL text -> NULL stats."""
    from kevinlang_spark.operators.text import encoding_quality

    rows = [
        (1, "perfectly ordinary text"),
        (2, "decoder gave up \ufffd here"),
        (3, "caf\u00c3\u00a9 and \u00e2\u20ac\u2122smart\u00e2\u20ac\u0153 quotes"),
        (4, "bell\u0007 and more" + "x" * 200),  # 1 ctrl in >100 chars: tolerated
        (5, "a\u0007b"),  # 1 ctrl in 3 chars: over the 1% line
        (6, None),
        (7, "nbsp\u00c2\u00a0joined"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in encoding_quality(df).collect()}
    assert got[1]["clean"] and got[1]["n_mojibake"] == 0
    assert got[2]["n_replacement"] == 1 and not got[2]["clean"]
    assert got[3]["n_mojibake"] == 3 and not got[3]["clean"]
    assert got[4]["n_ctrl"] == 1 and got[4]["clean"]
    assert got[5]["n_ctrl"] == 1 and not got[5]["clean"]
    assert got[6]["clean"] is None
    assert got[7]["n_mojibake"] == 1 and not got[7]["clean"]


def test_encoding_quality_plan_is_scan_stage(spark):
    from kevinlang_spark.operators.text import encoding_quality
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.range(20).select(
        F.col("id").alias("doc_id"), F.lit("plain body").alias("text")
    )
    plan = executed_plan(encoding_quality(df))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange") <= 1



def test_render_chat_formats_and_skip_rule(spark):
    """ChatML and Alpaca render byte-exactly; NULL-content turns are
    skipped entirely (not rendered empty); counts are exact."""
    from kevinlang_spark.operators.text import render_chat

    df = spark.createDataFrame(
        [(1, "be brief", "hi", "hello"), (2, "be brief", "ping", None)],
        "doc_id bigint, s string, u string, a string",
    )
    turns = [("system", "s"), ("user", "u"), ("assistant", "a")]
    got = {r["doc_id"]: r for r in render_chat(df, turns).collect()}
    assert got[1]["rendered"] == (
        "<|im_start|>system\nbe brief<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello<|im_end|>\n"
    )
    assert got[1]["n_turns"] == 3
    assert got[2]["rendered"].endswith("ping<|im_end|>\n")
    assert "assistant" not in got[2]["rendered"]
    assert got[2]["n_turns"] == 2
    alp = {r["doc_id"]: r for r in render_chat(df, turns, fmt="alpaca").collect()}
    assert alp[1]["rendered"] == (
        "### System:\nbe brief\n\n### User:\nhi\n\n### Assistant:\nhello\n\n"
    )
    for r in list(got.values()) + list(alp.values()):
        assert r["n_chars"] == len(r["rendered"])


def test_render_chat_guards(spark):
    import pytest as _pytest

    from kevinlang_spark.operators.text import render_chat

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, u string")
    with _pytest.raises(ValueError, match="unknown format"):
        render_chat(df, [("user", "u")], fmt="llama")
    with _pytest.raises(ValueError, match="at least one"):
        render_chat(df, [])


def test_render_chat_plan_is_scan_stage(spark):
    from kevinlang_spark.operators.text import render_chat
    from kevinlang_spark.plans.inspect import executed_plan

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("hey").alias("u")
    )
    plan = executed_plan(render_chat(df, [("user", "u")]))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange") <= 1



def test_chat_loss_spans_extract_exact_content(spark):
    """Cross-check spans against the renderer: slicing the rendered
    string at [start-1:end] must give exactly the trainable turn's
    content, including when an earlier NULL turn shifted the offsets."""
    from kevinlang_spark.operators.text import chat_loss_spans, render_chat

    rows = [
        (1, "sys a", "user text", "answer one"),
        (2, "sys b", None, "answer shifts left"),   # user turn skipped
        (3, "sys c", "ping", None),                  # no trainable turn
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, s string, u string, a string")
    turns = [("system", "s"), ("user", "u"), ("assistant", "a")]
    rendered = {r["doc_id"]: r["rendered"] for r in render_chat(df, turns).collect()}
    spans = chat_loss_spans(df, turns).collect()
    assert {r["doc_id"] for r in spans} == {1, 2}
    content = dict(((r[0], r[3]) for r in rows))
    for r in spans:
        assert rendered[r["doc_id"]][r["start"] - 1 : r["end"]] == content[r["doc_id"]]
        assert r["role"] == "assistant" and r["turn_idx"] == 2


def test_chat_loss_spans_multi_trainable_and_guards(spark):
    import pytest as _pytest

    from kevinlang_spark.operators.text import chat_loss_spans, render_chat

    df = spark.createDataFrame(
        [(1, "q1", "a1", "q2", "a2")],
        "doc_id bigint, u1 string, a1 string, u2 string, a2 string",
    )
    turns = [("user", "u1"), ("assistant", "a1"), ("user", "u2"), ("assistant", "a2")]
    spans = sorted(
        (r["turn_idx"], r["start"], r["end"])
        for r in chat_loss_spans(df, turns).collect()
    )
    rendered = render_chat(df, turns).first()["rendered"]
    assert len(spans) == 2
    assert rendered[spans[0][1] - 1 : spans[0][2]] == "a1"
    assert rendered[spans[1][1] - 1 : spans[1][2]] == "a2"
    with _pytest.raises(ValueError, match="train_roles"):
        chat_loss_spans(df, [("user", "u1")])
    with _pytest.raises(ValueError, match="at least one"):
        chat_loss_spans(df, [])
