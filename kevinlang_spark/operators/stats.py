"""Distribution/statistics operators for outlier handling at scale."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Clip ``value_col`` to its [lower, upper] exact quantiles
    (optionally per group), adding ``<value_col>_wins`` — the standard
    outlier-robust normalization before computing corpus statistics.

    Exact interpolated percentiles (``F.percentile`` — same definition as
    ANSI ``percentile_cont``) are computed in one aggregation; the
    per-group bounds table is tiny (one row per group) so the join back
    is a broadcast — the fact table is scanned twice but never shuffled.
    For sketch-sized state at extreme cardinality swap in
    ``approx_percentile``; here exactness keeps the operator
    oracle-comparable.
    """
    v = F.col(value_col).cast("double")
    bounds_agg = [
        F.percentile(v, F.lit(lower)).alias("__lo"),
        F.percentile(v, F.lit(upper)).alias("__hi"),
    ]
    if group_col is None:
        bounds = df.agg(*bounds_agg)
        joined = df.join(F.broadcast(bounds))
    else:
        bounds = df.groupBy(group_col).agg(*bounds_agg)
        joined = df.join(F.broadcast(bounds), group_col)
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return joined.withColumn(f"{value_col}_wins", clipped).drop("__lo", "__hi")
