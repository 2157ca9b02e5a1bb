"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition a narrow source so per-row heavy compute (regex, md5,
    gram building) runs on all cores.  Only fires when the input has fewer
    partitions than the cluster has slots — a small parquet arrives as ONE
    partition and would serialize the whole pass; a production-scale table
    already has ample partitions and skips the extra shuffle entirely."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df
