"""Sources: parquet (primary, typed) and CSV (reference-parity ingestion
with trait inference)."""

from kevinlang_spark.sources.parquet import read_parquet, load_tables
from kevinlang_spark.sources.csv import read_csv

__all__ = ["read_parquet", "load_tables", "read_csv"]
