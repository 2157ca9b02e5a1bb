"""Sinks: partitioned/bucketed parquet output — the write-side half of the
100 TB design.

- ``write_parquet(partition_by=...)`` → directory partitioning: downstream
  filters on the partition column prune whole directories (partition
  pruning at the file-index level).
- ``write_bucketed(bucket_by=..., n)`` → hash-bucketed table: two tables
  bucketed the same way join WITHOUT a shuffle (both sides arrive
  pre-partitioned), the single biggest cost lever for repeated big-table
  joins.  Requires a table catalog (``saveAsTable``) because bucket
  metadata lives in the metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) catalog table.  Joining two
    tables bucketed by the same keys and count skips both shuffle AND sort
    (sort-merge join reads pre-sorted buckets)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def salted(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Add a ``__salt`` column for manual skew mitigation: join on
    (key, __salt) after exploding the small side across salt values.
    AQE's skew-join split handles most cases; salting remains for extreme
    single-key skew (one key ≫ a partition).  The composed, parity-tested
    operators are ``operators/skew.py:salted_join`` / ``salted_agg``."""
    from pyspark.sql import functions as F

    return df.withColumn("__salt", F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt_buckets)))


def explode_salt(small: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Replicate the small side across every salt value (the other half of
    a salted join)."""
    from pyspark.sql import functions as F

    return small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
