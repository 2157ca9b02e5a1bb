"""ZIP archive member source + DOCX text extraction — the container
tier between raw bytes and documents: corpora and office files ship as
ZIP archives (a .docx IS a ZIP of XML parts), and a curation pipeline
must enumerate members distributedly without landing archives on the
driver.

Spark-side shape: archives arrive as a ``(doc_id/path, payload
binary)`` bronze table (e.g. from ``binaryFile``); member enumeration
is Arrow-batched ``mapInPandas`` — stdlib ``zipfile`` over an
in-memory view, one linear central-directory read per archive, so cost
is O(bytes) per file and partition-parallel across files.  Member
payloads stay inside the executor row; only requested members ever
shuffle.

Honest subset: stored + deflate members (stdlib zlib — every
real-world office file and virtually every data ZIP); encrypted
members and other compression methods quarantine per-member with a
``status`` column, never a dead task.  DOCX text extraction reads
``word/document.xml`` and converts WordprocessingML structure to text:
``<w:p>`` paragraphs → line breaks, ``<w:tab/>`` → tabs, ``<w:t>``
runs → their character data with XML entities decoded.
"""

from __future__ import annotations

import io
import zipfile
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZIP_MEMBERS_SCHEMA = (
    "doc_id bigint, member string, n_bytes bigint, crc32 bigint, "
    "status string, payload binary"
)


def make_zip(members: dict, compress: bool = True) -> bytes:
    """A real ZIP archive from a {name: bytes} mapping (stdlib
    zipfile, deterministic 1980-01-01 timestamps so fixture bytes are
    stable)."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, data in members.items():
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = method
            zf.writestr(zi, data)
    return buf.getvalue()


def _zip_members(payload: bytes):
    """Yield (member, size, crc32, status, data) per archive entry.
    Directory entries are skipped; per-member failures (encryption,
    unsupported method, corrupt deflate) quarantine that MEMBER with a
    status string and NULL payload — the rest of the archive still
    extracts."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        infos = zf.infolist()
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not a readable ZIP: {exc}") from exc
    for zi in infos:
        if zi.is_dir():
            continue
        if zi.flag_bits & 0x1:
            yield zi.filename, zi.file_size, zi.CRC, "encrypted", None
            continue
        if zi.compress_type not in (
            zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED
        ):
            yield zi.filename, zi.file_size, zi.CRC, "unsupported_method", None
            continue
        try:
            # read by ZipInfo, not name: duplicate-named entries
            # (appended/updated archives) would otherwise all return
            # the LAST entry's bytes against each entry's own size/CRC
            data = zf.read(zi)
        except (zipfile.BadZipFile, zlib.error) as exc:
            yield zi.filename, zi.file_size, zi.CRC, f"corrupt: {exc}", None
            continue
        yield zi.filename, zi.file_size, zi.CRC, "ok", data


_INT_FIELDS = frozenset({"n_bytes", "crc32"})


def _member_batches(
    id_col, payload_col, rows_of, fields, keep_payload, id_dtype="Int64"
):
    """The ONE place archive-enumeration row building and quarantine
    semantics live (shared by the ZIP and TAR readers): per archive,
    ``rows_of(payload)`` is materialized ATOMICALLY — a parse error at
    any point yields a single file-level ``invalid`` row and discards
    partial members, so 'invalid' can never coexist with 'ok' rows from
    the same archive; NULL payloads audit as ``null_payload``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (id_col, *fields)}

            def push(did, row):
                out[id_col].append(did)
                for f in fields:
                    out[f].append(row.get(f))

            for did, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    push(did, {"status": "null_payload"})
                    continue
                try:
                    rows = list(rows_of(bytes(p)))
                except ValueError as exc:
                    push(did, {"status": f"invalid: {exc}"})
                    continue
                for row in rows:
                    if not keep_payload:
                        row = {**row, "payload": None}
                    push(did, row)
            yield pd.DataFrame(
                {
                    id_col: (
                        pd.array(out[id_col], dtype=id_dtype)
                        if id_dtype
                        else out[id_col]
                    ),
                    **{
                        f: (
                            pd.array(out[f], dtype="Int64")
                            if f in _INT_FIELDS
                            else out[f]
                        )
                        for f in fields
                    },
                }
            )

    return batches


def read_zip_members(
    archives: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    keep_payload: bool = True,
) -> DataFrame:
    """(id, payload) of ZIP archives → one row per member:
    (doc_id, member, n_bytes, crc32, status, payload).  An unreadable
    archive contributes a single ``invalid`` row (file-level
    quarantine); member-level failures quarantine only that member.
    ``keep_payload=False`` drops member bytes before anything
    shuffles — the census/audit mode."""

    def rows_of(p: bytes):
        for m, size, crc, status, data in _zip_members(p):
            yield {
                "member": m, "n_bytes": size, "crc32": crc,
                "status": status, "payload": data,
            }

    return archives.mapInPandas(
        _member_batches(
            id_col,
            payload_col,
            rows_of,
            ("member", "n_bytes", "crc32", "status", "payload"),
            keep_payload,
        ),
        schema=ZIP_MEMBERS_SCHEMA,
    )


TAR_MEMBERS_SCHEMA = ZIP_MEMBERS_SCHEMA.replace(", crc32 bigint", "")


#: zstd frame magic (RFC 8878 §3.1.1) — the wrapper Common Crawl's
#: newer dumps and HF dataset shards increasingly ship in
_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
#: LZ4 frame magic (LZ4 frame format spec §3.1) — the low-latency
#: wrapper data-lake shard pipelines favor
_LZ4_MAGIC = b"\x04\x22\x4d\x18"


def _lz4_compress(data: bytes) -> bytes:
    """Deterministic LZ4 frame via pyarrow's bundled codec (same story
    as :func:`_zstd_compress`)."""
    import pyarrow as pa

    if not pa.Codec.is_available("lz4"):
        raise NotImplementedError("this pyarrow build lacks the lz4 codec")
    sink = pa.BufferOutputStream()
    with pa.output_stream(sink, compression="lz4") as out:
        out.write(data)
    return sink.getvalue().to_pybytes()


def _lz4_decompress(data: bytes) -> bytes:
    """Inflate one LZ4 frame; quarantine semantics like
    :func:`_zstd_decompress`."""
    try:
        import pyarrow as pa

        if not pa.Codec.is_available("lz4"):
            raise ImportError("pyarrow built without lz4")
    except ImportError as exc:
        raise ValueError(
            f"lz4 wrapper needs the pyarrow lz4 codec: {exc}"
        ) from exc
    try:
        return pa.input_stream(
            pa.BufferReader(data), compression="lz4"
        ).read()
    except OSError as exc:
        raise ValueError(f"corrupt lz4 wrapper: {exc}") from exc


def _zstd_compress(data: bytes) -> bytes:
    """Deterministic zstd frame via pyarrow's bundled codec (pyarrow is
    a baked dependency; no external zstd library).  Raises
    NotImplementedError if this pyarrow build lacks the codec."""
    import pyarrow as pa

    if not pa.Codec.is_available("zstd"):
        raise NotImplementedError("this pyarrow build lacks the zstd codec")
    sink = pa.BufferOutputStream()
    with pa.output_stream(sink, compression="zstd") as out:
        out.write(data)
    return sink.getvalue().to_pybytes()


def _zstd_decompress(data: bytes) -> bytes:
    """Inflate one zstd frame; quarantine semantics — a deployment
    whose pyarrow lacks the codec quarantines zstd shards (ValueError)
    rather than dying, and corrupt frames do the same."""
    try:
        import pyarrow as pa

        if not pa.Codec.is_available("zstd"):
            raise ImportError("pyarrow built without zstd")
    except ImportError as exc:
        raise ValueError(
            f"zstd wrapper needs the pyarrow zstd codec: {exc}"
        ) from exc
    try:
        return pa.input_stream(
            pa.BufferReader(data), compression="zstd"
        ).read()
    except OSError as exc:
        raise ValueError(f"corrupt zstd wrapper: {exc}") from exc


def make_tar(
    members: dict, gz: bool = True, zstd: bool = False, lz4: bool = False
) -> bytes:
    """A real (optionally gzip'd or zstd'd) TAR from a {name: bytes}
    mapping — the WebDataset shard shape.  Deterministic: zeroed
    mtimes, fixed uid/gid, gzip with mtime=0 (and pyarrow's zstd
    writer is deterministic for a given input), so fixture bytes are
    stable.  ``zstd=True`` wraps in a zstd frame instead of gzip."""
    import gzip as _gzip
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members.items():
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            tf.addfile(ti, io.BytesIO(data))
    raw = buf.getvalue()
    if zstd:
        return _zstd_compress(raw)
    if lz4:
        return _lz4_compress(raw)
    if not gz:
        return raw
    out = io.BytesIO()
    with _gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gzf:
        gzf.write(raw)
    return out.getvalue()


def _tar_members(payload: bytes):
    """Yield (member, size, status, data) per TAR entry; gzip-wrapped
    archives (the .tar.gz / WebDataset norm) inflate first.  Non-file
    entries (directories, links) are skipped; a corrupt OR TRUNCATED
    stream raises ValueError (file-level quarantine).  Truncation needs
    an explicit check: tarfile in non-stream mode treats EOF as
    end-of-archive, so a partially-downloaded shard would otherwise
    read as a smaller-but-valid shard — every member must carry its
    declared size, and the archive must still hold the two 512-byte
    zero end blocks after the last entry."""
    import gzip as _gzip
    import tarfile

    if payload[:2] == b"\x1f\x8b":
        try:
            payload = _gzip.decompress(payload)
        except (OSError, EOFError, zlib.error) as exc:
            raise ValueError(f"corrupt gzip wrapper: {exc}") from exc
    elif payload[:4] == _ZSTD_MAGIC:
        payload = _zstd_decompress(payload)  # .tar.zst shards
    elif payload[:4] == _LZ4_MAGIC:
        payload = _lz4_decompress(payload)  # .tar.lz4 shards
    results = []
    end = 0
    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
            for ti in tf:
                # offset_data (not offset + 512) — pax/GNU entries carry
                # extension headers between offset and the data block,
                # and miscounting them would false-quarantine valid
                # archives at the end-block check below
                end = max(
                    end, ti.offset_data + ((ti.size + 511) // 512) * 512
                )
                if not ti.isfile():
                    continue
                f = tf.extractfile(ti)
                data = f.read() if f is not None else b""
                if len(data) != ti.size:
                    raise ValueError(
                        f"truncated TAR member {ti.name!r}: "
                        f"{len(data)} of {ti.size} bytes"
                    )
                results.append((ti.name, ti.size, "ok", data))
    except tarfile.TarError as exc:
        raise ValueError(f"not a readable TAR: {exc}") from exc
    tail = payload[end : end + 1024]
    if len(tail) < 1024 or tail.count(0) != 1024:
        raise ValueError("truncated TAR archive: end-of-archive blocks missing")
    yield from results


def read_tar_members(
    archives: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    keep_payload: bool = True,
) -> DataFrame:
    """(id, payload) of TAR / TAR.GZ archives → one row per file member
    (doc_id, member, n_bytes, status, payload) — the ZIP source's
    contract for the tape-archive family; unreadable or truncated
    archives collapse to a single ``invalid`` row."""

    def rows_of(p: bytes):
        for m, size, status, data in _tar_members(p):
            yield {
                "member": m, "n_bytes": size,
                "status": status, "payload": data,
            }

    return archives.mapInPandas(
        _member_batches(
            id_col,
            payload_col,
            rows_of,
            ("member", "n_bytes", "status", "payload"),
            keep_payload,
        ),
        schema=TAR_MEMBERS_SCHEMA,
    )


def webdataset_samples(members: DataFrame) -> DataFrame:
    """Group TAR members into WebDataset SAMPLES: key = the member PATH
    up to the first '.' after the last '/' (directories stay in the
    key, matching the library's ``base_plus_ext`` convention —
    'train/0001.txt' and 'val/0001.txt' are DIFFERENT samples), parts =
    {extension → payload}.  One keyed aggregation on (archive, key);
    within-sample part count is bounded by the format (a handful of
    extensions), so map values stay row-sized.  A duplicated member
    path (the same (key, ext) twice in one archive) keeps the
    lexicographically-smallest payload deterministically instead of
    killing the task with DUPLICATED_MAP_KEY.

    Returns (doc_id, key, n_parts, parts map<string, binary>)."""
    key = F.regexp_extract(F.col("member"), r"^((?:.*/)?[^.]*)", 1)
    ext = F.regexp_extract(F.col("member"), r"^(?:.*/)?[^.]*\.(.*)$", 1)
    ok = members.where(
        F.col("status") == "ok"
    ).select(
        "doc_id",
        key.alias("key"),
        ext.alias("ext"),
        "payload",
    )
    # ONE shuffle carries the payloads; duplicate (key, ext) entries
    # dedupe IN-ROW after the sort (first of each ext run = smallest
    # payload) — map_from_entries would otherwise throw
    # DUPLICATED_MAP_KEY under Spark's default mapKeyDedupPolicy.  The
    # sorted array is materialized in its own projection so the filter
    # lambda's previous-element probe (F.get — 0-based, NULL out of
    # bounds, ANSI-safe) is an attribute lookup, not a re-evaluation.
    agg = ok.groupBy("doc_id", "key").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("ext"), F.col("payload")))
        ).alias("__arr")
    )
    arr = F.col("__arr")
    staged = agg.select(
        "doc_id",
        "key",
        F.filter(
            arr,
            lambda x, i: (i == F.lit(0))
            | (F.get(arr, i - 1)["ext"] != x["ext"]),
        ).alias("__parts"),
    )
    return staged.select(
        "doc_id",
        "key",
        F.size("__parts").cast("bigint").alias("n_parts"),
        F.map_from_entries(F.col("__parts")).alias("parts"),
    )


STREAM_TAR_SCHEMA = (
    "path string, member string, n_bytes bigint, status string, "
    "payload binary"
)


def stream_tar_members(
    spark, path: str, glob: str = "*.tar*", keep_payload: bool = False
) -> DataFrame:
    """STREAMING shard ingestion: the same TAR member enumeration over
    a ``binaryFile`` file-source stream — the continuous-training-data
    shape (new WebDataset shards land in the bucket; each micro-batch
    enumerates only the new files, the checkpoint guarantees
    exactly-once).  Rows are keyed by the shard PATH; census mode
    (``keep_payload=False``, the default) keeps streaming state free of
    member bytes."""
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

    def rows_of(p: bytes):
        for m, size, status, data in _tar_members(p):
            yield {
                "member": m, "n_bytes": size,
                "status": status, "payload": data,
            }

    return bronze.select("path", "content").mapInPandas(
        _member_batches(
            "path",
            "content",
            rows_of,
            ("member", "n_bytes", "status", "payload"),
            keep_payload,
            id_dtype=None,
        ),
        schema=STREAM_TAR_SCHEMA,
    )


#: WordprocessingML → text rules, applied in order (single pass each,
#: all RE2-compatible so a SQL engine can replay them)
_DOCX_BREAKS = r"</w:p>|<w:br[^>]*/>|<w:cr[^>]*/>"
_DOCX_TABS = r"<w:tab[^>]*/>"


def docx_xml_to_text(xml: Column) -> Column:
    """WordprocessingML (word/document.xml) → plain text as a PURE
    Catalyst expression chain (the html_text precedent): paragraph and
    line-break elements become newlines, tabs become tabs, every other
    tag drops, core XML entities decode, trailing whitespace trims.
    Zero Python, zero shuffle — runs in the scan stage."""
    t = F.regexp_replace(xml, _DOCX_BREAKS, "\n")
    t = F.regexp_replace(t, _DOCX_TABS, "\t")
    t = F.regexp_replace(t, r"<[^>]*>", "")
    # entity decode AFTER tag drop (single pass, &amp; last so produced
    # ampersands are not re-decoded — the html_text ordering argument)
    t = F.regexp_replace(t, r"&lt;", "<")
    t = F.regexp_replace(t, r"&gt;", ">")
    t = F.regexp_replace(t, r"&quot;", '"')
    t = F.regexp_replace(t, r"&apos;", "'")
    t = F.regexp_replace(t, r"&amp;", "&")
    return F.regexp_replace(t, r"\s+$", "")


def extract_docx_text(
    archives: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, payload) of .docx files → (doc_id, text): enumerate the ZIP,
    keep ``word/document.xml``, convert WordprocessingML to text.  The
    member read is the Python leg (stdlib zipfile); the XML→text
    conversion is the Catalyst chain :func:`docx_xml_to_text`, so
    everything after the inflate stays JVM-side.  Files without a
    readable document part yield no row (quarantine-by-omission)."""
    members = read_zip_members(archives, id_col, payload_col)
    doc = members.where(
        (F.col("member") == "word/document.xml") & (F.col("status") == "ok")
    )
    xml = F.decode(F.col("payload"), "UTF-8")
    return doc.select(
        F.col("doc_id"), docx_xml_to_text(xml).alias("text")
    )


def make_docx(paragraphs: list) -> bytes:
    """A minimal REAL .docx: ZIP with [Content_Types].xml, the package
    relationships, and a WordprocessingML document part carrying
    ``paragraphs`` — stdlib-only, opens in Word/LibreOffice."""

    def esc(s: str) -> str:
        return (
            str(s)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
        )

    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{esc(p)}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>' + body
        + "</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/'
        'xml"/><Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/><Override PartName='
        '"/word/document.xml" ContentType="application/vnd.openxmlformats'
        '-officedocument.wordprocessingml.document.main+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/"
        'officeDocument" Target="word/document.xml"/></Relationships>'
    )
    return make_zip(
        {
            "[Content_Types].xml": content_types.encode(),
            "_rels/.rels": rels.encode(),
            "word/document.xml": document.encode(),
        }
    )
