"""Distribution-drift detection between data splits / snapshots.

The monitoring primitive every production pipeline runs between a
reference window ("expected": training data, last week, arm A) and a
live window ("actual": serving data, this week, arm B).  Binning is by
EXPLICIT breaks (lo / hi / nbins are configuration, exactly as drift
monitors pin them at deploy time) so the whole computation is one scan
with a scan-stage bin expression + one tiny bin-keyed aggregation —
no quantile pass, no driver-side data, identical plan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_drift(
    df: DataFrame,
    value_col: str,
    arm_col: str,
    expected: str,
    actual: str,
    lo: float,
    hi: float,
    nbins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two arms of one DataFrame.

    ``bin = clamp(floor((x - lo) / width), 0, nbins - 1)`` (out-of-range
    values land in the edge bins, the standard monitoring convention),
    both arms' counts come from ONE pass via conditional aggregation,
    and the PSI contribution ``(p - q) * ln(p / q)`` is computed over
    the complete bin spine (empty bins clamp their share to ``eps`` —
    dropping them would hide exactly the mass-moved-away signal PSI
    exists to catch).  Returns ``nbins`` rows:
    (bin, bin_lo, n_expected, n_actual, psi_bin, psi_total), with
    psi_total repeated per row (broadcast of a 1-row total — rule of
    thumb: < 0.1 stable, > 0.25 drifted).
    """
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2 (got {nbins})")
    if not hi > lo:
        raise ValueError(f"need hi > lo (got {lo}, {hi})")
    width = (hi - lo) / nbins
    x = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("bigint")
    counts = (
        df.where(x.isNotNull() & F.col(arm_col).isin(expected, actual))
        .groupBy(b.alias("bin"))
        .agg(
            F.count_if(F.col(arm_col) == expected).alias("n_expected"),
            F.count_if(F.col(arm_col) == actual).alias("n_actual"),
        )
    )
    # complete bin spine: a drifted distribution can vacate a bin
    # entirely; the spine is nbins rows (driver-free, engine-side)
    spine = df.sparkSession.range(nbins).select(F.col("id").alias("bin"))
    full = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
            F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
        )
    )
    tot = full.agg(
        F.sum("n_expected").alias("te"), F.sum("n_actual").alias("ta")
    )
    p = F.greatest(F.col("n_expected") / F.col("te"), F.lit(eps))
    q = F.greatest(F.col("n_actual") / F.col("ta"), F.lit(eps))
    contrib = (p - q) * F.log(p / q)
    binned = full.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
        "n_expected",
        "n_actual",
        F.round(contrib, 6).alias("psi_bin"),
        contrib.alias("__c"),
    )
    total = binned.agg(F.round(F.sum("__c"), 6).alias("psi_total"))
    return binned.drop("__c").crossJoin(F.broadcast(total))
