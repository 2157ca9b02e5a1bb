"""Sources: parquet (primary, typed), CSV (reference-parity ingestion
with trait inference), JSONL (corrupt-line quarantine), ORC, and raw
text lines (corpus ingestion)."""

from kevinlang_spark.sources.csv import read_csv
from kevinlang_spark.sources.jsonl import read_jsonl, write_jsonl
from kevinlang_spark.sources.orc import read_orc, read_text_lines, write_orc
from kevinlang_spark.sources.parquet import load_tables, read_parquet

__all__ = [
    "read_parquet",
    "load_tables",
    "read_csv",
    "read_jsonl",
    "write_jsonl",
    "read_orc",
    "write_orc",
    "read_text_lines",
]
