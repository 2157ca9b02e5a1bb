"""Streaming deduplication with watermark-bounded state.

The batch dedup operators (operators/dedup.py) assume the corpus is at
rest; an ingestion pipeline dedups ON ARRIVAL instead.  Spark's
``dropDuplicatesWithinWatermark`` keeps one row per key and, crucially,
EVICTS key state once the watermark passes — so state is bounded by the
key arrival rate × the dedup horizon, not by the total corpus: the only
form that survives an unbounded 100 TB/day stream.  (A plain streaming
``dropDuplicates`` would grow state forever.)

No counterpart in /root/reference (its engine is batch-only lists,
src/Data/DataFrame.hs); this extends SURVEY §2.7's streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kevinlang_spark.functions.textexpr import normalize_text


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """+ ``fp`` column: md5 of the normalized text — the dedup key used by
    both the batch and streaming paths (same expression ⇒ same key)."""
    return df.withColumn("fp", F.md5(normalize_text(F.col(text_col))))


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins streaming dedup on ``keys`` with watermark-bounded
    state.  Duplicates arriving within ``delay`` of the first occurrence
    are dropped; key state is evicted once the watermark passes, so a
    duplicate arriving later than the horizon is treated as new — the
    standard bounded-state trade-off."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def dedup_batch(df: DataFrame, keys: list[str]) -> DataFrame:
    """Batch twin of ``dedup_stream``: one row per key tuple (map-side
    partial dedup + one key shuffle).  Row choice within a key is
    arbitrary in both engines; parity is on the KEY SET."""
    return df.dropDuplicates(keys)
