"""CSV ingestion with reference-parity trait inference.

Mirrors the reference pipeline (src/Data/DataFrame.hs:182-242 +
src/CsvParser.hs:12-45): header row, comma-delimited, `""`-escaped quotes,
blank → Empty/NULL, numbers parsed as decimals; then per-column trait
inference:

- all values string            → (Text, Dimension, Discrete)
- all numeric AND name=="year" → (Number, Dimension, Discrete)
- all numeric                  → (Number, Measure, Continuous)
- anything else (any missing / mixed) → strict mode raises
  "Invalid data (possibly missing values)" (DataFrame.hs:237-238);
  lenient=True instead keeps the column nullable with the majority type.

The inference statistics are computed in ONE distributed aggregation pass
(not a per-column driver loop), so ingestion scales with the cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kevinlang_spark.errors import KevinValueError
from kevinlang_spark.frame import KevinFrame
from kevinlang_spark.traits import NUM_DIM, NUM_MEASURE, TEXT_DIM, FieldTraits


def read_csv(
    spark: SparkSession,
    path: str,
    strict: bool = True,
    ordered: bool = True,
    decimal: bool = False,
) -> KevinFrame:
    """Read a CSV file into a KevinFrame with inferred traits.

    ``decimal=True`` ingests numeric columns as ``DecimalType(38, 18)``
    instead of ``double`` — the engine analog of the reference's
    arbitrary-precision ``Data.Scientific`` values
    (reference src/Data/DataFrame.hs:76, kevin.cabal:30).  Exact decimal
    arithmetic survives aggregation (summing currency at warehouse scale
    accumulates no float drift) at the cost of slower arithmetic; the
    default stays ``double`` for throughput.
    """
    raw = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", "")
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .csv(path)
    )
    cols = raw.columns

    # one aggregation pass: per column — total, nulls, non-numeric values,
    # non-integral numeric values.  Backtick-quoted refs: headers may
    # contain dots, which bare F.col parses as nested-field access.
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(cols):
        col = F.col(f"`{c}`")
        num = col.try_cast("double")
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nulls_{i}"))
        aggs.append(
            F.sum(F.when(col.isNotNull() & num.isNull(), 1).otherwise(0)).alias(
                f"__nonnum_{i}"
            )
        )
        aggs.append(
            F.sum(
                F.when(num.isNotNull() & (num != F.floor(num)), 1).otherwise(0)
            ).alias(f"__frac_{i}")
        )
    stats = raw.agg(*aggs).collect()[0].asDict()
    total = stats["__total"] or 0

    traits: dict[str, FieldTraits] = {}
    casts = {}
    for i, c in enumerate(cols):
        nulls = stats[f"__nulls_{i}"] or 0
        nonnum = stats[f"__nonnum_{i}"] or 0
        frac = stats[f"__frac_{i}"] or 0
        n_numeric = total - nulls - nonnum
        if strict and nulls > 0:
            raise KevinValueError("Invalid data (possibly missing values)")
        if strict and nonnum > 0 and n_numeric > 0:
            # mixed numeric+string column: reference's makeField hits the
            # otherwise-guard and errors (DataFrame.hs:237-238)
            raise KevinValueError("Invalid data (possibly missing values)")
        if nonnum == 0 and n_numeric > 0:
            # all (non-null) values numeric; the year rule matches the
            # exact name only (reference DataFrame.hs:226-228)
            num_type = "decimal(38,18)" if decimal else "double"
            if c == "year":
                traits[c] = NUM_DIM
                casts[c] = "bigint" if frac == 0 else num_type
            else:
                traits[c] = NUM_MEASURE
                casts[c] = num_type
        else:
            traits[c] = TEXT_DIM

    df = raw.withColumns({c: F.col(f"`{c}`").cast(t) for c, t in casts.items()})
    return KevinFrame.from_df(df, ordered=ordered, traits=traits)


def write_csv(
    df,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    partition_by: list[str] | None = None,
) -> None:
    """CSV output matching the reference grammar the reader parses
    (CsvParser.hs:12-45): comma-delimited, fields quoted when needed with
    ``""``-escaped embedded quotes, NULL → empty field.  Distributed
    write (one file per partition); ``partition_by`` gives directory
    partitioning like the parquet sink.  Accepts a KevinFrame or a plain
    DataFrame."""
    if isinstance(df, KevinFrame):
        df = df.df  # plain columns only; order/trait state is presentation
    w = (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", "")
        .option("nullValue", "")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)
