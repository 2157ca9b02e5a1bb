"""binaryFile media-ingestion source: directory of raw files → bronze
media table → real pixel/sample decode end-to-end."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators.multimodal import make_bmp, make_png, make_wav
from kevinlang_spark.sources.binary import read_media_dir


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "red.bmp").write_bytes(make_bmp(4, 3, rgb=(200, 10, 30)))
    (d / "grad.png").write_bytes(make_png(5, 4, rgb=(7, 8, 9)))
    (d / "tone.wav").write_bytes(make_wav(100, amplitude=123))
    (d / "notes.txt").write_bytes(b"not media")
    (d / "big.bmp").write_bytes(make_bmp(64, 64))
    return str(d)


def _expected_id(path: str) -> int:
    return int(hashlib.md5(f"file:{path}".encode()).hexdigest()[:15], 16)


def test_read_media_dir_routes_and_ids(spark, media_dir):
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in read_media_dir(spark, media_dir).collect()}
    assert set(rows) == {"red.bmp", "grad.png", "tone.wav", "notes.txt", "big.bmp"}
    assert rows["red.bmp"]["media_type"] == "image"
    assert rows["grad.png"]["media_type"] == "image"
    assert rows["tone.wav"]["media_type"] == "audio"
    assert rows["notes.txt"]["media_type"] == "other"
    # deterministic path-hash ids (engine-wide md5-prefix convention)
    for r in rows.values():
        assert r["doc_id"] == _expected_id(r["path"].replace("file:", ""))
        assert r["n_bytes"] == len(bytes(r["payload"]))


def test_glob_filters_at_listing_time(spark, media_dir):
    names = {
        r["path"].rsplit("/", 1)[-1]
        for r in read_media_dir(spark, media_dir, glob="*.bmp").collect()
    }
    assert names == {"red.bmp", "big.bmp"}


def test_max_bytes_is_pushed_into_the_scan(spark, media_dir):
    small = read_media_dir(spark, media_dir, glob="*.bmp", max_bytes=200)
    names = {r["path"].rsplit("/", 1)[-1] for r in small.collect()}
    assert names == {"red.bmp"}  # big.bmp (64x64) exceeds 200 bytes
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "length" in plan


def test_ingested_files_decode_end_to_end(spark, media_dir):
    from kevinlang_spark.operators.multimodal import extract_pixel_stats

    media = read_media_dir(spark, media_dir, glob="*.{bmp,png,wav}")
    stats = {
        r["path"].rsplit("/", 1)[-1]: r
        for r in extract_pixel_stats(media.drop("path", "n_bytes"))
        .join(media.select("doc_id", "path"), "doc_id")
        .collect()
    }
    r = stats["red.bmp"]
    assert (r["width"], r["height"]) == (4, 3)
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (200.0, 10.0, 30.0)
    p = stats["grad.png"]
    assert (p["width"], p["height"]) == (5, 4)
    assert (p["mean_r"], p["mean_g"], p["mean_b"]) == (7.0, 8.0, 9.0)
    w = stats["tone.wav"]
    assert w["n_frames"] == 100 and w["rms"] == 123.0 == w["peak"]


def test_sniff_media_type_branches(spark):
    import gzip as _gz

    from kevinlang_spark.operators.multimodal import make_bmp, make_png, make_wav
    from kevinlang_spark.sources.binary import sniff_media_type

    from pyspark.sql import functions as F

    rows = [
        ("png", make_png(3, 2)),
        ("bmp", make_bmp(3, 2)),
        ("wav", make_wav(10)),
        ("jpeg", b"\xff\xd8\xff\xe0rest"),
        ("gif", b"GIF89a..."),
        ("flac", b"fLaC...."),
        ("gzip", _gz.compress(b"x", mtime=0)),
        ("pdf", b"%PDF-1.7..."),
        ("zip", b"PK\x03\x04...."),
        ("html", b"  <!DOCTYPE HTML><html>"),
        ("html", b"<HTML><body>"),
        # UTF-8 BOM-prefixed markup (common crawl error-page shape)
        ("html", b"\xef\xbb\xbf<!DOCTYPE html><html>"),
        ("xml", b"\xef\xbb\xbf  <?xml version='1.0'?>"),
        ("xml", b"<?xml version='1.0'?>"),
        ("other", b"plain text payload"),
        ("other", b""),
        # a RIFF that is NOT WAVE must not claim 'wav'; AVI gets its
        # own verdict (the MJPEG video tier decodes it)
        ("avi", b"RIFF\x00\x00\x00\x00AVI LIST"),
        # a RIFF that is neither WAVE nor AVI stays 'other'
        ("other", b"RIFF\x00\x00\x00\x00ACON...."),
    ]
    df = spark.createDataFrame(
        [(t, bytearray(p)) for t, p in rows], "expect string, payload binary"
    )
    got = df.select(
        "expect", sniff_media_type(F.col("payload")).alias("s")
    ).collect()
    for r in got:
        assert r["s"] == r["expect"], (r["expect"], r["s"])
    plan = (
        df.select(sniff_media_type(F.col("payload")).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_tiny_file_scan_coalesces_to_size_derived_tasks(
    spark, tmp_path_factory
):
    """r12 optimization: a directory of KB-scale files must not fan out
    into one near-empty task per openCostInBytes-padded file — the scan
    coalesces DOWN to max(defaultParallelism, bytes/maxPartitionBytes),
    with the row set (ids, payloads, routing) unchanged."""
    d = tmp_path_factory.mktemp("tiny_corpus")
    for i in range(120):
        (d / f"{i}.bmp").write_bytes(make_bmp(3, 2, rgb=(i % 255, 1, 2)))
    df = read_media_dir(spark, str(d))
    nparts = df.rdd.getNumPartitions()
    assert nparts <= max(spark.sparkContext.defaultParallelism, 1)
    rows = {
        (r["doc_id"], r["media_type"], r["n_bytes"])
        for r in df.select("doc_id", "media_type", "n_bytes").collect()
    }
    assert len(rows) == 120
    assert all(mt == "image" for _, mt, _ in rows)
