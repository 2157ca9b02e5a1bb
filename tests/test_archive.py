"""ZIP member source + DOCX extraction (sources/archive.py): census
and payload round trips, per-member vs file-level quarantine, the
WordprocessingML → text Catalyst chain, and plan hygiene."""

from __future__ import annotations

import io
import zipfile

import pytest

from pyspark.sql import functions as F

from kevinlang_spark.sources.archive import (
    _zip_members,
    extract_docx_text,
    make_docx,
    make_zip,
    read_zip_members,
)


def test_zip_member_roundtrip_both_methods():
    members = {"a.txt": b"hello", "nested/b.bin": bytes(range(256)) * 4}
    for compress in (True, False):
        got = {m: data for m, _, _, st, data in _zip_members(
            make_zip(members, compress=compress)
        ) if st == "ok"}
        assert got == members


def test_fixture_bytes_are_stable():
    assert make_zip({"a": b"x"}) == make_zip({"a": b"x"})
    assert make_docx(["p"]) == make_docx(["p"])


def test_member_level_quarantine_keeps_siblings():
    # an encrypted member quarantines alone; the good member extracts.
    # zipfile.writestr rewrites flag_bits, so set the encryption bit by
    # byte surgery on locked.txt's local header (PK\x03\x04, flags at
    # +6, name at +30/len at +26) and central record (PK\x01\x02,
    # flags at +8, name at +46/len at +28)
    raw = bytearray(make_zip({"good.txt": b"fine", "locked.txt": b"secret"}))

    def set_flag(sig: bytes, flag_off: int, name_off: int, len_off: int):
        i = 0
        while (i := raw.find(sig, i)) >= 0:
            nlen = int.from_bytes(raw[i + len_off : i + len_off + 2], "little")
            if raw[i + name_off : i + name_off + nlen] == b"locked.txt":
                raw[i + flag_off] |= 0x1
            i += 4

    set_flag(b"PK\x03\x04", 6, 30, 26)
    set_flag(b"PK\x01\x02", 8, 46, 28)
    rows = {m: (st, data) for m, _, _, st, data in _zip_members(bytes(raw))}
    assert rows["good.txt"] == ("ok", b"fine")
    assert rows["locked.txt"][0] == "encrypted"
    assert rows["locked.txt"][1] is None


def test_file_level_quarantine():
    with pytest.raises(ValueError, match="not a readable ZIP"):
        list(_zip_members(b"PK\x03\x04 junk that is not an archive"))


def test_read_zip_members_census_mode(spark):
    good = make_zip({"x.txt": b"abc", "y.txt": b"de"})
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, b"nope"), (3, None)],
        "doc_id bigint, payload binary",
    )
    rows = read_zip_members(df, keep_payload=False).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert {r["member"]: r["n_bytes"] for r in by_id[1]} == {
        "x.txt": 3, "y.txt": 2
    }
    assert all(r["payload"] is None for r in rows)  # census never ships bytes
    assert by_id[2][0]["status"].startswith("invalid")
    assert by_id[3][0]["status"] == "null_payload"


def test_docx_text_roundtrip(spark):
    paras = ["Title", "A&B <tagged> \"quoted\"", "tabs\tstay"]
    df = spark.createDataFrame(
        [(1, bytearray(make_docx(paras)))], "doc_id bigint, payload binary"
    )
    out = extract_docx_text(df).collect()
    assert len(out) == 1
    assert out[0]["text"] == "\n".join(paras)


def test_docx_xml_chain_is_jvm_side(spark):
    # the XML→text conversion must stay Catalyst: no Python stage beyond
    # the one mapInPandas member enumeration
    df = spark.createDataFrame(
        [(1, bytearray(make_docx(["p"])))], "doc_id bigint, payload binary"
    )
    plan = extract_docx_text(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_non_docx_zip_contributes_no_row(spark):
    df = spark.createDataFrame(
        [(1, bytearray(make_zip({"data.txt": b"not a docx"})))],
        "doc_id bigint, payload binary",
    )
    assert extract_docx_text(df).count() == 0


def test_tar_member_roundtrip_both_wrappings():
    from kevinlang_spark.sources.archive import _tar_members, make_tar

    members = {"s/000001.txt": b"hello", "s/000001.cls": b"7"}
    for gz in (True, False):
        got = {m: data for m, _, st, data in _tar_members(
            make_tar(members, gz=gz)
        ) if st == "ok"}
        assert got == members
    assert make_tar({"a": b"x"}) == make_tar({"a": b"x"})  # stable bytes


def test_tar_quarantine_gates():
    from kevinlang_spark.sources.archive import _tar_members

    with pytest.raises(ValueError, match="corrupt gzip"):
        list(_tar_members(b"\x1f\x8b\x08 junk"))
    with pytest.raises(ValueError, match="not a readable TAR"):
        list(_tar_members(b"A" * 1024))


def test_webdataset_grouping(spark):
    from kevinlang_spark.sources.archive import (
        make_tar,
        read_tar_members,
        webdataset_samples,
    )

    shard = make_tar(
        {
            "d/000001.txt": b"text one",
            "d/000001.cls": b"3",
            "d/000002.txt": b"two",
        }
    )
    df = spark.createDataFrame(
        [(1, bytearray(shard)), (2, b"\x1f\x8b\x08 bad")],
        "doc_id bigint, payload binary",
    )
    rows = {
        (r["doc_id"], r["key"]): r
        for r in webdataset_samples(read_tar_members(df)).collect()
    }
    # keys keep the directory (the base_plus_ext convention); sample
    # d/000001 has two parts, d/000002 one, the corrupt shard: none
    assert set(rows) == {(1, "d/000001"), (1, "d/000002")}
    assert rows[(1, "d/000001")]["n_parts"] == 2
    assert bytes(rows[(1, "d/000001")]["parts"]["txt"]) == b"text one"
    assert bytes(rows[(1, "d/000001")]["parts"]["cls"]) == b"3"
    assert rows[(1, "d/000002")]["n_parts"] == 1


def test_webdataset_directory_keys_stay_distinct(spark):
    # 'train/0001.txt' and 'val/0001.txt' are DIFFERENT samples
    from kevinlang_spark.sources.archive import (
        make_tar,
        read_tar_members,
        webdataset_samples,
    )

    shard = make_tar({"train/0001.txt": b"t", "val/0001.txt": b"v"})
    df = spark.createDataFrame(
        [(1, bytearray(shard))], "doc_id bigint, payload binary"
    )
    rows = {
        r["key"]: bytes(r["parts"]["txt"])
        for r in webdataset_samples(read_tar_members(df)).collect()
    }
    assert rows == {"train/0001": b"t", "val/0001": b"v"}


def test_webdataset_duplicate_part_does_not_kill_the_task(spark):
    # the same (key, ext) twice in one archive must dedupe
    # deterministically (smallest payload), not DUPLICATED_MAP_KEY
    import io
    import tarfile

    from kevinlang_spark.sources.archive import (
        read_tar_members,
        webdataset_samples,
    )

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for data in (b"bbb", b"aaa"):
            ti = tarfile.TarInfo("0001.txt")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id bigint, payload binary"
    )
    rows = webdataset_samples(read_tar_members(df)).collect()
    assert len(rows) == 1
    assert rows[0]["n_parts"] == 1
    assert bytes(rows[0]["parts"]["txt"]) == b"aaa"


def test_zip_duplicate_names_keep_their_own_bytes():
    # appended/updated ZIPs carry duplicate names; each entry must
    # return ITS bytes, not the last entry's
    import io
    import zipfile

    from kevinlang_spark.sources.archive import _zip_members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", b"FIRST")
        zf.writestr("a.txt", b"SECOND")
    datas = [d for _m, _s, _c, st, d in _zip_members(buf.getvalue()) if st == "ok"]
    assert datas == [b"FIRST", b"SECOND"]


def test_tar_truncation_quarantines_whole_archive(spark):
    from kevinlang_spark.sources.archive import (
        _tar_members,
        make_tar,
        read_tar_members,
    )

    full = make_tar({"a.txt": b"A" * 600, "b.txt": b"B" * 600}, gz=False)
    # cut after the first member's data: tarfile would silently read a
    # smaller-but-'valid' shard without the end-block check
    cut = full[: 512 + 1024]
    with pytest.raises(ValueError, match="truncated TAR archive"):
        list(_tar_members(cut))
    # and the reader collapses it to ONE file-level invalid row — no
    # partial 'ok' members survive (atomic quarantine)
    df = spark.createDataFrame(
        [(1, bytearray(cut))], "doc_id bigint, payload binary"
    )
    rows = read_tar_members(df).collect()
    assert len(rows) == 1
    assert rows[0]["status"].startswith("invalid")
    assert rows[0]["member"] is None


def test_tar_pax_and_gnu_formats_accepted():
    # pax/GNU members carry extension headers between the header block
    # and the data; the end-of-archive check must count from
    # offset_data or valid archives false-quarantine
    import io
    import tarfile

    from kevinlang_spark.sources.archive import _tar_members

    for fmt in (tarfile.PAX_FORMAT, tarfile.GNU_FORMAT):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
            for nm, data in (("a.txt", b"A" * 700), ("b" * 120 + ".txt", b"B" * 10)):
                ti = tarfile.TarInfo(nm)
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
        got = {m: d for m, _s, st, d in _tar_members(buf.getvalue()) if st == "ok"}
        assert got == {"a.txt": b"A" * 700, "b" * 120 + ".txt": b"B" * 10}


def test_stream_tar_census_matches_batch(spark, tmp_path):
    # the streaming enumerator must converge to exactly the batch census
    from kevinlang_spark.sources.archive import (
        make_tar,
        read_tar_members,
        stream_tar_members,
    )

    for g in range(3):
        (tmp_path / f"s{g}.tar.gz").write_bytes(
            make_tar({f"{g}_{i}.txt": b"x" * (g + i) for i in range(4)})
        )
    (tmp_path / "bad.tar.gz").write_bytes(b"\x1f\x8b\x08 nope")

    q = (
        stream_tar_members(spark, str(tmp_path))
        .writeStream.format("memory")
        .queryName("stream_tar_test_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r["member"], r["n_bytes"], r["status"].split(":")[0])
        for r in spark.table("stream_tar_test_mem").collect()
    }
    files = [
        (1, bytearray((tmp_path / f"s{g}.tar.gz").read_bytes()))
        for g in range(3)
    ] + [(9, bytearray((tmp_path / "bad.tar.gz").read_bytes()))]
    batch = spark.createDataFrame(files, "doc_id bigint, payload binary")
    want = {
        (r["member"], r["n_bytes"], r["status"].split(":")[0])
        for r in read_tar_members(batch, keep_payload=False).collect()
    }
    assert got == want
    assert ("...", None, "invalid") not in got  # shape sanity
    assert sum(1 for m, _n, st in got if st == "invalid") >= 1


# ---------------------------------------------------------------------------
# zstd-wrapped shards (round 10)


def test_tar_zstd_roundtrip_and_determinism():
    from kevinlang_spark.sources.archive import _tar_members, make_tar

    members = {"a.txt": b"alpha", "dir/b.bin": b"\x00\x01\x02" * 50}
    p1 = make_tar(members, zstd=True)
    p2 = make_tar(members, zstd=True)
    assert p1 == p2  # deterministic fixture bytes
    assert p1[:4] == b"\x28\xb5\x2f\xfd"  # RFC 8878 frame magic
    got = {m: d for m, _s, _st, d in _tar_members(p1)}
    assert got == members


def test_tar_zstd_smaller_than_plain():
    from kevinlang_spark.sources.archive import make_tar

    members = {f"f{i}.txt": b"the same line of text\n" * 40 for i in range(4)}
    assert len(make_tar(members, zstd=True)) < len(make_tar(members, gz=False)) / 4


def test_corrupt_zstd_quarantines():
    import pytest as _pytest

    from kevinlang_spark.sources.archive import _ZSTD_MAGIC, _tar_members

    with _pytest.raises(ValueError, match="corrupt zstd wrapper"):
        list(_tar_members(_ZSTD_MAGIC + b"garbage body"))


def test_zstd_truncated_frame_quarantines():
    import pytest as _pytest

    from kevinlang_spark.sources.archive import _tar_members, make_tar

    p = make_tar({"a.txt": b"x" * 4000}, zstd=True)
    with _pytest.raises(ValueError, match="corrupt zstd wrapper"):
        list(_tar_members(p[: len(p) // 2]))


def test_webdataset_samples_through_zstd(spark):
    """The sample grouping is wrapper-agnostic: a .tar.zst WebDataset
    shard groups exactly like its .tar.gz twin."""
    from kevinlang_spark.sources.archive import (
        make_tar,
        read_tar_members,
        webdataset_samples,
    )

    members = {
        "0001.txt": b"caption one",
        "0001.cls": b"7",
        "0002.txt": b"caption two",
        "0002.cls": b"9",
    }
    rows = [(1, make_tar(members, zstd=True)), (2, make_tar(members, gz=True))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    samples = webdataset_samples(read_tar_members(df)).collect()
    by = {(r["doc_id"], r["key"]): r["n_parts"] for r in samples}
    assert by == {(1, "0001"): 2, (1, "0002"): 2, (2, "0001"): 2, (2, "0002"): 2}


def test_tar_lz4_roundtrip_and_quarantine():
    import pytest as _pytest

    from kevinlang_spark.sources.archive import (
        _LZ4_MAGIC,
        _tar_members,
        make_tar,
    )

    members = {"a.txt": b"alpha" * 20, "b.txt": b"beta"}
    p = make_tar(members, lz4=True)
    assert p[:4] == _LZ4_MAGIC
    assert p == make_tar(members, lz4=True)  # deterministic
    assert {m: d for m, _s, _st, d in _tar_members(p)} == members
    with _pytest.raises(ValueError, match="corrupt lz4 wrapper"):
        list(_tar_members(_LZ4_MAGIC + b"\xff\xff garbage"))
