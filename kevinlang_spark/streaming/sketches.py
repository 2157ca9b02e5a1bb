"""Streaming sketch maintenance: incremental distinct counting whose
state lives in a TABLE, not in streaming state.

``write_stream_hll`` folds each micro-batch into one HLL sketch row per
key and APPENDS it to a parquet sketch table; ``hll_distinct`` answers
"distinct values so far" by unioning a key's sketch rows.  Compared to a
stateful streaming distinct:

- memory is bounded by (keys × 2^lgk bytes) per batch, never by the
  value cardinality;
- the sketch table is restart-safe (checkpoint + append; a replayed
  batch would double-append, so pair with the idempotent batch writer
  for exactly-once sinks) and batch-queryable at any time;
- history is never rescanned — a new batch appends rows, and the union
  aggregation over sketch rows is mergeable/associative, the same
  contract as ``operators.sketches.hll_rollup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_stream_hll(
    df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> None:
    """Drain ``df`` (a streaming DataFrame) with availableNow, appending
    one (keys…, sketch, batch_id) row per key per micro-batch."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.where(F.col(value_col).isNotNull())
            .groupBy(*key_cols)
            .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(path)
        )

    q = (
        df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def hll_distinct(
    spark: SparkSession, path: str, key_cols: list[str]
) -> DataFrame:
    """Distinct-so-far per key from the sketch table: a union aggregation
    over sketch rows (bytes per row, not values)."""
    return (
        spark.read.parquet(path)
        .groupBy(*key_cols)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("bigint")
            .alias("n_distinct")
        )
    )


def write_stream_kll(
    df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: list[str],
    value_col: str,
    k: int = 200,
) -> None:
    """Quantile twin of :func:`write_stream_hll`: drain a streaming
    DataFrame with availableNow, appending one (keys…, KLL sketch,
    batch_id) row per key per micro-batch.  Memory per batch is bounded
    by keys × O(k) — never by the value distribution — and the table
    answers "p50/p99 so far" (or over any batch range) via a mergeable
    KLL merge, with history never rescanned."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.where(F.col(value_col).isNotNull())
            .groupBy(*key_cols)
            .agg(
                F.kll_sketch_agg_double(
                    F.col(value_col).cast("double"), F.lit(k)
                ).alias("sketch")
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(path)
        )

    q = (
        df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def kll_quantiles(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    quantiles: tuple[float, ...] = (0.5,),
) -> DataFrame:
    """Quantiles-so-far per key from the sketch table: one mergeable KLL
    merge over sketch rows (bytes per row, not values)."""
    from kevinlang_spark.operators.sketches import quantile_col_names

    merged = F.kll_merge_agg_double("sketch")
    qcols = [
        F.kll_sketch_get_quantile_double(merged, F.lit(float(q))).alias(name)
        for q, name in zip(quantiles, quantile_col_names(quantiles))
    ]
    return spark.read.parquet(path).groupBy(*key_cols).agg(*qcols)
