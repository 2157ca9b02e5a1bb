"""Parquet source — the engine's primary format (columnar, typed, splittable).

The reference only reads CSV (src/Data/DataFrame.hs:182-190); parquet is the
100 TB-scale equivalent: predicate pushdown and column pruning reach the
footer/page level, and splits parallelize across executors for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kevinlang_spark.frame import KevinFrame

#: the driver's synthetic star schema (TESTDATA.md)
TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(
    spark: SparkSession, path: str, ordered: bool = False
) -> KevinFrame:
    """Read a parquet file/directory as a KevinFrame.

    ``ordered`` defaults to False here (scale mode): most analytic queries
    never need row order, and skipping the order column keeps every scan
    prunable to exactly the referenced columns.  Pass ``ordered=True`` for
    the reference's presentation semantics.
    """
    return KevinFrame.from_df(spark.read.parquet(path), ordered=ordered)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark reads as
    long (with ``spark.sql.legacy.parquet.nanosAsLong``); convert to a real
    timestamp at microsecond precision (integer division — no float
    round-trip)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names=TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's tables as plain Spark DataFrames keyed by name.

    Missing files are skipped so callers can run against partial dirs.
    """
    out: dict[str, DataFrame] = {}
    for n in names:
        p = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(p):
            out[n] = spark.read.parquet(p)
    return out
