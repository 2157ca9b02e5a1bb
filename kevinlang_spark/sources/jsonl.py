"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
training-corpus interchange (each line one document).

Scale rules baked in:

- **Explicit schema always.**  ``spark.read.json`` without a schema runs a
  full inference pass over the data — a complete extra scan at 100 TB.
  ``read_jsonl`` requires the schema (or samples it once via
  ``infer_jsonl_schema`` at a bounded fraction, for interactive use).
- **Malformed lines never kill the job.**  The default corrupt-tracking
  path parses via ``text`` + ``from_json`` (same Jackson parser the json
  source uses) so a 10-billion-line crawl with a few truncated records
  still loads, and the quarantine stream (``corrupt_lines``) is a plain
  filter — Spark's native json source forbids corrupt-column-only
  queries (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which
  is why the tracking path does not use it.
- ``track_corrupt=False`` switches to the native json source: scan-level
  field pruning (Jackson skips unreferenced fields), malformed lines
  become all-NULL rows (or fail the job with ``mode='FAILFAST'``).
- Compressed inputs (``.gz``/``.zst``) decompress transparently; the
  file listing is the parallelism floor for non-splittable gzip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "PERMISSIVE",
    track_corrupt: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON with an EXPLICIT schema (no inference
    scan).

    With ``track_corrupt`` (default): unparseable lines yield a row with
    all schema fields NULL and the raw line in ``_corrupt``; blank lines
    are skipped (matching the native source).  With
    ``track_corrupt=False``: native json source, malformed → all-NULL
    row (PERMISSIVE) or job failure (FAILFAST)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if not track_corrupt:
        return spark.read.schema(schema).option("mode", mode).json(path)
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))
    raw = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    parsed = F.from_json(
        "value",
        schema,
        {"mode": mode, "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return raw.select(parsed.alias("__r")).select("__r.*")


def infer_jsonl_schema(
    spark: SparkSession, path: str, sampling_ratio: float = 0.01
) -> T.StructType:
    """One bounded inference pass (samplingRatio caps the scan cost);
    returns the schema to pin in code / a schema registry afterwards."""
    return spark.read.option("samplingRatio", sampling_ratio).json(path).schema


def corrupt_lines(df: DataFrame) -> DataFrame:
    """The quarantine stream: raw text of lines that failed to parse."""
    if CORRUPT_COL not in df.columns:
        return df.limit(0).select(F.lit("").alias(CORRUPT_COL))
    return df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)


def valid_rows(df: DataFrame) -> DataFrame:
    """Rows that parsed cleanly, with the corrupt column dropped."""
    if CORRUPT_COL not in df.columns:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write newline-delimited JSON shards; ``max_records_per_file`` caps
    shard size so downstream loaders get uniform chunks."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.json(path)
