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


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to a real timestamp.

    Driver test data has shipped ``ts`` both as TIMESTAMP(NANOS) — which
    Spark surfaces as long under ``spark.sql.legacy.parquet.nanosAsLong``
    — and as TIMESTAMP(MICROS) (already a timestamp).  Convert only the
    long form, at microsecond precision via integer division (no float
    round-trip); timestamp columns pass through untouched.  Works on
    batch and streaming frames alike.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    elif isinstance(dt, T.TimestampNTZType):
        # watermarks/windows need TIMESTAMP (with tz); the session runs in
        # UTC so the cast is value-identical
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet with ``ts`` normalized to a timestamp (see
    ``normalize_event_ts``)."""
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return normalize_event_ts(df)


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


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Rewrite a small-files parquet directory into ~``target_file_bytes``
    files (the maintenance pass every streaming/append pipeline needs:
    per-microbatch writes leave thousands of KB-scale files whose
    open/footer overhead eventually dominates scans).

    File count = ceil(current on-disk bytes / target); the rewrite uses
    ``coalesce`` — a NARROW repacking that concatenates input splits into
    fewer tasks with no shuffle and no sort, preserving existing row
    order within each lineage.  Returns the file count used.
    """
    total = 0
    for root, _, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, -(-total // target_file_bytes))
    spark.read.parquet(src).coalesce(n).write.mode("overwrite").parquet(dst)
    return n


def zorder_value(df: DataFrame, cols, bits: int = 16):
    """Morton (Z-order) key over numeric columns: each column is min/max
    scaled to ``bits`` quantization levels (one tiny agg job for the
    bounds), then bit-interleaved with pure shift/mask expressions —
    whole-stage codegen, no UDF.  Returns (df_with___z, z_column_name)."""
    from pyspark.sql import functions as F

    cs = list(cols)
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cs],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cs],
    ).first()
    levels = (1 << bits) - 1
    quantized = []
    for c in cs:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        span = (hi - lo) or 1.0
        q = F.least(
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * levels),
            F.lit(levels),
        ).cast("long")
        quantized.append(F.greatest(q, F.lit(0)))
    n = len(cs)
    z = F.lit(0).cast("long")
    for j, q in enumerate(quantized):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return df.withColumn("__z", z), "__z"


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str] | tuple[str, ...],
    num_files: int | None = None,
) -> None:
    """Multi-dimensional clustered parquet output (Delta OPTIMIZE ZORDER's
    layout, expressed with stock Spark): rows are range-partitioned and
    sorted by their Morton key, so every output file covers a small
    bounding box in ALL ``cols`` at once and parquet min/max stats prune
    files for predicates on any subset of the dimensions.  A plain sort
    on (a, b) only prunes on ``a``; at 100 TB the z-layout is the
    difference between reading 1% and 50% of files for a 2-D selective
    filter."""
    zdf, zc = zorder_value(df, cols)
    part = (
        zdf.repartitionByRange(num_files, zc)
        if num_files
        else zdf.repartitionByRange(zc)
    )
    part.sortWithinPartitions(zc).drop(zc).write.mode("overwrite").parquet(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    cols: list[str] | tuple[str, ...],
    num_files: int | None = None,
) -> None:
    """Totally-ordered parquet output without a single-partition sort:
    ``repartitionByRange`` samples the sort key to build range boundaries,
    every output file covers a disjoint key range, and each file is sorted
    internally (``sortWithinPartitions``).  Reading the files in range
    order replays the global order; a predicate on the sort key prunes to
    the files whose range overlaps (parquet min/max stats line up with the
    range partitioning).  This is the scale answer to "write the table
    sorted" — the classic ``orderBy().write`` collapses the whole dataset
    through one task's sort at 100 TB."""
    cs = list(cols)
    part = (
        df.repartitionByRange(num_files, *cs)
        if num_files
        else df.repartitionByRange(*cs)
    )
    part.sortWithinPartitions(*cs).write.mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols,
    n_buckets: int,
    sort_cols=None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a parquet table hash-BUCKETED on ``bucket_cols`` — the
    co-location contract that makes later joins and aggregations on the
    bucket key SHUFFLE-FREE: two tables bucketed the same way (same
    columns, same ``n_buckets``) sort-merge-join with zero Exchange on
    either side, and a groupBy on the bucket key skips its Exchange too.
    This is THE preparation step for a 100 TB fact table that will be
    joined on the same key every day: pay the shuffle once at write
    time, never again at read time.

    ``sort_cols`` additionally sorts within each bucket file
    (``sortBy``), which lets the join skip its per-task Sort as well.
    Bucketing rides the table catalog (Spark needs the bucket spec in
    metadata), hence ``saveAsTable``; pass ``path`` to make it an
    external table at a chosen location.

    Scale note: ``n_buckets`` fixes output-file count per partition
    write — pick it like you pick shuffle partitions (≈ data size /
    target file size), and keep it identical across every table meant
    to co-join."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog — a plain
    ``spark.read.parquet(path)`` on the same files loses the bucket
    metadata and re-shuffles on join, so the catalog read is the one
    that honors the co-location contract."""
    return spark.table(table)
