"""ORC source/sink and raw text-line source.

ORC is Spark's other built-in columnar format: same pushdown/pruning
machinery as parquet (predicate pushdown reaches ORC's stripe/row-group
indexes), useful when interoperating with Hive-era warehouses.  The raw
text source is the corpus-ingestion entry point: one document per line
(the common WET/plain-text dump shape), with a deterministic line id so
downstream dedup/chunking has a stable key without any single-partition
renumbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_text_lines(
    spark: SparkSession, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per line with a deterministic 64-bit id.

    The id is ``xxhash64(line)`` — content-addressed, reproducible across
    runs and cluster sizes, and shuffle-free to compute (unlike a global
    ``row_number`` which would serialize the corpus through one task).
    Identical lines collide on purpose: they're exact duplicates, and the
    dedup operators treat the id as the dedup key anyway.
    """
    df = spark.read.text(path)
    return df.select(
        F.xxhash64(F.col("value")).alias(id_col), F.col("value").alias(text_col)
    )
