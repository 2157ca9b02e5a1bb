"""Round-9 ADVICE fixes (VERDICT/ADVICE r8): scheme-less URL
passthrough in normalize_url, JPEG fill-byte / missing-EOI tolerance,
and the code-versioned artifact-cache key."""

from __future__ import annotations

import numpy as np
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
