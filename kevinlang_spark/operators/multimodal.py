"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested — schema contracts,
partition-parallel batch iteration, bounded batch sizes — while the media
decode itself is STUBBED (`decode=fake`): the container ships no
image/audio codecs, so the default extractor derives deterministic fake
features from the bytes.  Swapping in a real decoder (PIL/ffmpeg) changes
ONE function that receives `bytes` and returns a feature dict; nothing in
the Spark plumbing moves.

Scale notes: mapInPandas streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor memory is
O(batch), not O(partition); payloads never hit the driver; a binary
column of N bytes shuffles only if the caller repartitions.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor
MEDIA_FEATURES_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int, checksum string"
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a binary payload column from text (the testdata has no
    real media); payload + declared media_type mirror a real bronze table:
    (doc_id, media_type, payload binary)."""
    return df.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a real media decoder.

    A real implementation would be e.g.::

        from PIL import Image; img = Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, ...}

    which is unavailable here; raise if explicitly asked for real decode.
    """
    n = len(payload)
    if media_type == "image":
        return {"width": (n % 640) + 1, "height": (n % 480) + 1, "n_frames": 1}
    if media_type == "video":
        return {"width": (n % 1280) + 1, "height": (n % 720) + 1, "n_frames": (n % 300) + 1}
    return {"width": None, "height": None, "n_frames": (n % 44100) + 1}


def real_decode(payload: bytes, media_type: str) -> dict:
    """Real media decode, gated on importable codecs.

    Images decode through PIL when it is installed (width/height from the
    actual pixel grid, n_frames from the container for animated formats).
    Audio/video need ffmpeg-class codecs that have no pure-Python
    fallback — those still raise until such a library is present.  In
    codec-less environments (this container) every call raises, and
    ``decode=fake_decode`` remains the tested default.
    """
    if media_type == "image":
        try:
            import io

            from PIL import Image  # noqa: PLC0415
        except ImportError as exc:
            raise NotImplementedError(
                "image decode needs PIL (pip install pillow); "
                "use decode=fake_decode in codec-less environments"
            ) from exc
        with Image.open(io.BytesIO(payload)) as img:
            return {
                "width": img.width,
                "height": img.height,
                "n_frames": getattr(img, "n_frames", 1),
            }
    raise NotImplementedError(
        f"{media_type} decode needs ffmpeg-class codecs which are not "
        "available; use decode=fake_decode or plug a decoder in here"
    )


def extract_media_features(
    media_df: DataFrame,
    decode: Callable[[bytes, str], dict] = fake_decode,
) -> DataFrame:
    """(doc_id, media_type, payload) → per-item features via mapInPandas.

    The UDF iterates Arrow record batches; per row it calls ``decode`` —
    the single pluggable point — and emits a flat typed row.  Checksum is
    computed JVM-side beforehand (md5 of the payload) so the Python loop
    carries no crypto cost.
    """
    with_ck = media_df.withColumn("checksum", F.md5(F.col("payload")))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payloads (failed fetches — routine in a bronze media
            # table) yield null features, not a task-killing TypeError;
            # bytes() materialized once per row
            raw = [None if p is None else bytes(p) for p in pdf["payload"]]
            feats = [
                {} if p is None else decode(p, m)
                for p, m in zip(raw, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(
                        [None if p is None else len(p) for p in raw], dtype="Int64"
                    ),
                    "width": pd.array([f.get("width") for f in feats], dtype="Int32"),
                    "height": pd.array([f.get("height") for f in feats], dtype="Int32"),
                    "n_frames": pd.array([f.get("n_frames") for f in feats], dtype="Int32"),
                    "checksum": pdf["checksum"],
                }
            )

    return with_ck.mapInPandas(batches, schema=MEDIA_FEATURES_SCHEMA)


def sample_frames(
    media_df: DataFrame, every_n: int = 30
) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.

    Frame indices are computed from (stubbed) n_frames JVM-side with
    sequence+explode — the real decoder would attach frame payloads in the
    mapInPandas stage instead; the partition-parallel explode shape is
    identical.
    """
    feats = extract_media_features(media_df).where(F.col("media_type") == "video")
    # zero-frame/corrupt items (a real decoder returns n_frames=0) must not
    # blow up sequence(0, -1): guard to an empty frame list
    frames = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return feats.select("doc_id", F.explode(frames).alias("frame_idx"))
