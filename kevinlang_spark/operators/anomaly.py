"""Time-series anomaly operators: CUSUM change-point detection and
seasonal-baseline deviation flagging.

Both are pure window/aggregation compositions — per-key shuffles only,
no iteration, no driver state — so they run identically on a 100 TB
event log: the partition key is the series key, and every window frame
is bounded by the per-key history (CUSUM) or the tiny seasonal profile
(baseline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoints(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    drift: float = 0.0,
    threshold_sd: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM change-point screen per series.

    The classic formulation keeps running sums ``hi = max(0, hi + dev)``
    / ``lo = min(0, lo + dev)`` — a stateful recurrence.  Expressed
    Spark-first instead via the cumulative-sum identity:
    ``hi_i = cusum_i - min(cusum_0..i)`` (and ``lo_i`` against the
    running max), where ``cusum`` is a plain cumulative sum of
    deviations from the per-series mean — so the whole detector is ONE
    key shuffle + ordered windows, no recursion and no UDF.

    ``dev = value - series_mean - drift`` (the per-series mean comes
    from a window aggregate over the same partitioning — no second
    scan, no join).  Rows where either side exceeds
    ``threshold_sd × series_sd`` are flagged.  Returns
    (key, ts, value, cusum_hi, cusum_lo, is_change).
    """
    by_key = Window.partitionBy(key_col)
    ordered = by_key.orderBy(F.col(ts_col).asc(), F.col(value_col).asc())
    run = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mean = F.avg(value_col).over(by_key)
    sd = F.stddev_pop(value_col).over(by_key)
    dev = F.col(value_col) - mean - F.lit(drift)
    cusum = F.sum(dev).over(run)
    # the running extremum must include the virtual empty prefix C_0 = 0
    # (max(0, ...) in the recurrence), hence the least/greatest clamps
    hi = cusum - F.least(F.min(cusum).over(run), F.lit(0.0))
    lo = F.greatest(F.max(cusum).over(run), F.lit(0.0)) - cusum
    limit = F.lit(threshold_sd) * sd
    return (
        df.where(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            key_col,
            ts_col,
            value_col,
            F.round(hi, 6).alias("cusum_hi"),
            F.round(lo, 6).alias("cusum_lo"),
            ((hi > limit) | (lo > limit)).alias("is_change"),
        )
    )


def seasonal_anomalies(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    n_sd: float = 3.0,
    min_obs: int = 30,
) -> DataFrame:
    """Deviation-from-seasonal-baseline anomaly flags.

    The baseline is the per-(key, hour-of-day) mean/sd — the simplest
    seasonal profile and the shape every richer one (day-of-week,
    holiday calendars) shares.  The profile is a key×24 aggregate
    (map-side combined, tiny output) joined back broadcast, so the fact
    table is scanned once and never shuffled: flagging happens in the
    scan stage of the second pass.  Cells with fewer than ``min_obs``
    observations never flag (an unstable sd would mark everything).
    Returns anomalous rows only:
    (key, ts, hour, value, baseline_mean, baseline_sd).
    """
    hour = F.hour(ts_col)
    profile = (
        df.where(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col), hour.alias("hour"))
        .agg(
            F.avg(value_col).alias("baseline_mean"),
            F.stddev_pop(value_col).alias("baseline_sd"),
            F.count("*").alias("n_obs"),
        )
    )
    flagged = (
        df.withColumn("hour", hour)
        .join(F.broadcast(profile), [key_col, "hour"])
        .where(
            (F.col("n_obs") >= min_obs)
            & (
                F.abs(F.col(value_col) - F.col("baseline_mean"))
                > F.lit(n_sd) * F.col("baseline_sd")
            )
        )
    )
    return flagged.select(
        key_col,
        ts_col,
        "hour",
        value_col,
        F.round("baseline_mean", 6).alias("baseline_mean"),
        F.round("baseline_sd", 6).alias("baseline_sd"),
    )


def seasonal_backtest(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    season_s: int = 86_400,
    bucket_s: int = 3_600,
    eval_buckets: int = 168,
) -> DataFrame:
    """Forecast-quality backtest for the seasonal-naive baseline
    (predict this hour's count = the count one season ago): per key,
    MAE and MAPE over the trailing ``eval_buckets`` buckets.  The
    baseline every real forecasting deployment must beat — running the
    backtest IS the forecast evaluation harness, and the same
    two-aggregation shape scores any model whose predictions land in a
    (key, bucket, yhat) table.

    Execution: one bucket-count aggregation (the only data-sized
    shuffle), a self-join of the tiny count table offset by one season
    (key-partitioned, count-table-sized), and a per-key metric rollup.
    Buckets missing on either side drop out of the inner join rather
    than fabricating zeros — n_eval reports the coverage."""
    bucket = (
        F.floor(F.col(ts_col).cast("double") / bucket_s).cast("bigint")
        * bucket_s
    )
    counts = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"), bucket.alias("h"))
        .agg(F.count("*").alias("c"))
    )
    bounds = counts.agg(F.max("h").alias("hmax"))
    actual = (
        counts.crossJoin(F.broadcast(bounds))
        .where(F.col("h") > F.col("hmax") - eval_buckets * bucket_s)
        .select("k", "h", "c")
    )
    pred = counts.select(
        F.col("k"),
        (F.col("h") + season_s).alias("h"),
        F.col("c").alias("yhat"),
    )
    joined = actual.join(pred, ["k", "h"])
    err = F.abs(F.col("c") - F.col("yhat"))
    return joined.groupBy(F.col("k").alias(key_col)).agg(
        F.count("*").alias("n_eval"),
        F.round(F.avg(err), 4).alias("mae"),
        F.round(F.avg(err / F.col("c")), 4).alias("mape"),
    )



def acf_by_key(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_s: int = 3600,
    max_lag: int = 6,
) -> DataFrame:
    """Per-key autocorrelation function: Pearson correlation between
    the bucketed value series and its lag-k shift, k = 1..``max_lag``
    — the classic seasonality/persistence diagnostic read before
    choosing forecast seasons or smoothing constants
    (:func:`seasonal_backtest`'s tuning input).

    One bucket aggregation (key shuffle), then per-key ordered lag
    windows (keyed, never global) build the (series, shifted) pairs
    for every lag in a single pass; the correlations are one more
    grouped aggregate over (key, lag).  Returns (key, lag, n_pairs,
    acf) with acf rounded 6dp; lags with <2 pairs or zero variance
    yield NULL acf (undefined, not 0)."""
    from functools import reduce

    from pyspark.sql import Window

    if max_lag < 1 or bucket_s < 1:
        raise ValueError(
            f"max_lag and bucket_s must be >= 1 (got {max_lag}, {bucket_s})"
        )
    series = (
        df.where(F.col(key_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("k"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_s).alias("b"),
        )
        .agg(F.sum(value_col).alias("x"))
    )
    w = Window.partitionBy("k").orderBy("b")
    lagged = series.select(
        "k",
        "x",
        *[F.lag("x", lag).over(w).alias(f"y{lag}") for lag in range(1, max_lag + 1)],
    ).localCheckpoint(eager=True)  # one window pass feeds every lag's slice
    parts = [
        lagged.where(F.col(f"y{lag}").isNotNull()).select(
            "k", F.lit(lag).alias("lag"), "x", F.col(f"y{lag}").alias("y")
        )
        for lag in range(1, max_lag + 1)
    ]
    stacked = reduce(lambda a, b: a.unionByName(b), parts)
    # corr spelled as covar/(sd·sd) with try_divide: ANSI-mode F.corr
    # raises divide-by-zero on zero-variance series, where the defined
    # answer is NULL (and what other engines' corr() returns)
    return stacked.groupBy(F.col("k").alias(key_col), "lag").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(
            F.try_divide(
                F.covar_samp("x", "y"),
                F.stddev_samp("x") * F.stddev_samp("y"),
            ),
            6,
        ).alias("acf"),
    )
