"""Distribution/statistics operators for outlier handling at scale."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass numeric column profile: (column, n, n_null, min, max,
    mean, std) — the table-health snapshot every ingestion run records.

    All columns' statistics are computed in a SINGLE aggregation over a
    single scan (never a scan per column), then the one wide row is
    exploded to per-column rows.  At 100 TB the scan dominates; this adds
    k·6 cheap accumulators to it.
    """
    from pyspark.sql import types as T

    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.NumericType)
        ]
    aggs = []
    for i, c in enumerate(cols):
        v = F.col(c).cast("double")
        aggs += [
            F.count(v).alias(f"__n{i}"),
            F.count_if(F.col(c).isNull()).alias(f"__nn{i}"),
            F.min(v).alias(f"__mi{i}"),
            F.max(v).alias(f"__ma{i}"),
            F.avg(v).alias(f"__me{i}"),
            F.stddev_pop(v).alias(f"__sd{i}"),
        ]
    wide = df.agg(*aggs)
    rows = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__n{i}").alias("n"),
                        F.col(f"__nn{i}").alias("n_null"),
                        F.col(f"__mi{i}").alias("min"),
                        F.col(f"__ma{i}").alias("max"),
                        F.round(F.col(f"__me{i}"), 6).alias("mean"),
                        F.round(F.col(f"__sd{i}"), 6).alias("std"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.*")


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Equi-depth (quantile) histogram: ~equal-population buckets with
    their realized (bucket, n, min, max) — the summary that exposes
    skew a fixed-width histogram hides.

    The scale-correct formulation: ONE aggregation computes the exact
    interior quantile boundaries, broadcast back as a literal array;
    bucket assignment is then a pure scan-stage expression (count of
    boundaries below the value), and the rollup shuffles only ``buckets``
    keys.  The NTILE formulation every SQL cookbook reaches for needs a
    GLOBAL sort window — one task sorts the world at 100 TB.  Values
    equal to a boundary land in the lower bucket on every engine.
    """
    v = F.col(value_col).cast("double")
    fracs = [i / buckets for i in range(1, buckets)]
    bounds = df.agg(
        F.percentile(v, F.array(*[F.lit(f) for f in fracs])).alias("__b")
    )
    binned = df.join(F.broadcast(bounds)).select(
        F.size(F.filter(F.col("__b"), lambda b: v > b)).alias("bucket"),
        v.alias("__v"),
    )
    return binned.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
    )


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


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    alpha: float = 10.0,
    decimals: int = 6,
) -> DataFrame:
    """Smoothed mean target encoding (the leakage-safe categorical
    feature): ``enc = (sum_y + alpha * global_mean) / (n + alpha)`` — a
    category's mean shrunk toward the global mean by pseudo-count
    ``alpha``, so rare categories don't memorize their few labels.

    One keyed aggregation (map-side partial) plus a broadcast 1-row
    global mean; returns (cat, n, enc)."""
    g = df.agg(F.avg(target_col).alias("__gmean"))
    per_cat = df.groupBy(cat_col).agg(
        F.count(target_col).alias("n"), F.sum(target_col).alias("__sum")
    )
    return per_cat.crossJoin(F.broadcast(g)).select(
        cat_col,
        "n",
        F.round(
            (F.col("__sum") + F.lit(alpha) * F.col("__gmean"))
            / (F.col("n") + F.lit(alpha)),
            decimals,
        ).alias("enc"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags: |x − median| > k · MAD, where MAD
    is the median absolute deviation — the estimator that, unlike z-score,
    no single wild value can drag (the outlier itself inflates stddev and
    masks itself; the median ignores it).

    Two grouped exact-median aggregations (each one keyed shuffle with
    Spark's native ``median``), each joined back by broadcast — group
    cardinality is tiny relative to rows, the row table never re-shuffles.
    Returns the input rows plus (group_median, mad, is_outlier)."""
    med = df.groupBy(group_col).agg(F.median(value_col).alias("group_median"))
    withmed = df.join(F.broadcast(med), group_col)
    dev = F.abs(F.col(value_col) - F.col("group_median"))
    mad = (
        withmed.select(group_col, dev.alias("__dev"))
        .groupBy(group_col)
        .agg(F.median("__dev").alias("mad"))
    )
    return withmed.join(F.broadcast(mad), group_col).withColumn(
        "is_outlier", dev > F.lit(k) * F.col("mad")
    )


def chi_square(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Chi-square test of independence between two categorical columns:
    one (a, b) pair-count aggregation over the data, then margins and the
    statistic computed entirely on the tiny contingency table (broadcast
    joins — the row table is touched exactly once).  Returns one row
    (chi2, dof, n)."""
    obs = df.where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).groupBy(col_a, col_b).agg(F.count("*").alias("o"))
    row_m = obs.groupBy(col_a).agg(F.sum("o").alias("ra"))
    col_m = obs.groupBy(col_b).agg(F.sum("o").alias("cb"))
    tot = obs.agg(F.sum("o").alias("n"))
    e = F.col("ra") * F.col("cb") / F.col("n")
    # the statistic sums over the FULL r×c grid — a zero cell still
    # contributes (0−e)²/e = e, and dropping them understates chi2
    # exactly when dependence is strongest; the grid is margins × margins
    # (contingency-table sized, driver-free)
    grid = row_m.crossJoin(col_m)
    cells = (
        grid.join(obs, [col_a, col_b], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .select(
            ((F.col("o") - e) * (F.col("o") - e) / e).alias("cell"),
            "n",
        )
    )
    dof = (
        obs.agg(
            (
                (F.count_distinct(col_a) - 1) * (F.count_distinct(col_b) - 1)
            ).alias("dof")
        )
    )
    return (
        cells.groupBy("n")
        .agg(F.round(F.sum("cell"), 4).alias("chi2"))
        .crossJoin(F.broadcast(dof))
        .select("chi2", "dof", "n")
    )


#: cumulative Poisson(1) probabilities P(X <= k) for k = 0..8 — the
#: inverse-CDF table for hash-derived bootstrap weights (P(X <= 8) leaves
#: ~1e-7 mass for the final bucket)
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
    0.9999988747974021,
)


def _poisson1_weight(u: Column) -> Column:
    """Poisson(1) draw from a uniform ``u`` in [0, 1) by inverse CDF —
    a pure when-chain expression (codegen, no UDF)."""
    out = F.lit(9)
    for k, cdf in reversed(list(enumerate(_POISSON1_CDF))):
        out = F.when(u < F.lit(cdf), F.lit(k)).otherwise(out)
    return out


def poisson_bootstrap(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 32,
) -> DataFrame:
    """Bootstrap standard error / CI of the mean via the Poisson
    bootstrap — the formulation that actually scales: classical
    resampling needs sampling WITH replacement from the full dataset
    (a global operation), but for large n the multinomial resample
    counts converge to independent Poisson(1) weights per row, so each
    of the ``n_boot`` resamples is just a per-row weight expression.

    One scan: each row is md5-hashed ONCE (the only expensive hash —
    engine-portable, deterministic across runs and partitionings), then
    exploded ×n_boot in the scan stage, and replicate ``b``'s uniform is
    an affine integer rehash of the row hash — universal-hash family
    ``u_b = ((a_b·h + c_b) mod P) / P`` with per-``b`` LCG-derived
    constants, all int64-overflow-safe so the SQL oracle reproduces it
    verbatim (DuckDB raises on BIGINT overflow rather than wrapping).
    The only shuffle is the n_boot-key aggregation of weighted sums
    (map-side partial → n_boot rows).  A no-explode variant computing
    all 2·n_boot sums as one wide aggregation benched SLOWER (64 deep
    CASE-chain aggregate expressions defeat whole-stage codegen); the
    narrow explode keeps one compact weight expression in the loop.
    Returns ONE row: (n_boot, boot_mean, boot_se, ci_lo, ci_hi) with a
    normal-approximation 95% interval.
    """
    if n_boot < 2:
        raise ValueError(f"n_boot must be >= 2 (got {n_boot})")
    # one md5 per ROW (not per row×replicate): 60 digest bits → h,
    # folded to 30 bits so a_b·h30 + c_b stays < 2^63 in both engines
    h30 = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("bigint"),
        F.lit(1_073_741_824),
    )
    b1 = (F.col("b") + F.lit(1)).cast("bigint")
    a_b = F.pmod(
        F.lit(1_103_515_245) * b1 + F.lit(12_345), F.lit(2_147_483_647)
    ) + F.lit(1)
    c_b = F.pmod(F.lit(69_069) * b1 + F.lit(12_345), F.lit(2_147_483_647))
    u = F.pmod(a_b * F.col("h30") + c_b, F.lit(1_000_003)) / F.lit(1_000_003.0)
    w = _poisson1_weight(u).cast("double")
    resamples = (
        df.where(F.col(value_col).isNotNull())
        .select(h30.alias("h30"), F.col(value_col).cast("double").alias("x"))
        .withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))))
        .groupBy("b")
        .agg((F.sum(w * F.col("x")) / F.sum(w)).alias("m"))
    )
    se = F.stddev_samp("m")
    return resamples.agg(
        F.count("*").cast("bigint").alias("n_boot"),
        F.round(F.avg("m"), 6).alias("boot_mean"),
        F.round(se, 6).alias("boot_se"),
        F.round(F.avg("m") - 1.96 * se, 6).alias("ci_lo"),
        F.round(F.avg("m") + 1.96 * se, 6).alias("ci_hi"),
    )


def group_ols(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group simple linear regression (closed-form OLS) — slope,
    intercept, r², n per key, all from ONE aggregation over one scan:
    ``regr_*`` aggregates are mergeable sufficient-statistic folds
    (Σx, Σy, Σxy, Σx², Σy²), so they partial-aggregate map-side like
    any sum.  Millions of small regressions (per-entity trends) scale
    exactly like a groupBy-sum — no per-group iteration, no ML library.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    return (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(key_col)
        .agg(
            F.regr_count(y, x).cast("bigint").alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
    )


def mahalanobis_outliers(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    threshold: float = 13.816,
) -> DataFrame:
    """Bivariate outliers per group by squared Mahalanobis distance —
    the correlation-aware generalization of the z-score (a point can be
    unremarkable in x AND y yet wildly off the joint distribution).

    The 2×2 covariance inverts in closed form, so the whole operator is
    two passes with NO iteration and NO ML library: one mergeable
    aggregation per group (mean/var/cov sufficient statistics), one
    broadcast join-back, and the distance

        d² = (σy²·dx² − 2·σxy·dx·dy + σx²·dy²) / (σx²σy² − σxy²)

    as a scan-stage expression.  Default threshold 13.816 = χ²₂ at
    99.9%.  Degenerate groups (singular covariance, e.g. a constant
    column or n < 3) are dropped — distance is undefined there, and a
    pseudo-inverse would silently flag everything on the degenerate
    axis."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.where(x.isNotNull() & y.isNotNull())
    stats = base.groupBy(key_col).agg(
        F.avg(x).alias("__mx"),
        F.avg(y).alias("__my"),
        F.var_pop(x).alias("__vx"),
        F.var_pop(y).alias("__vy"),
        F.covar_pop(x, y).alias("__cxy"),
        F.count("*").alias("__n"),
    )
    det = F.col("__vx") * F.col("__vy") - F.col("__cxy") * F.col("__cxy")
    stats = stats.where((F.col("__n") >= 3) & (det > 0))
    dx = x - F.col("__mx")
    dy = y - F.col("__my")
    d2 = (
        F.col("__vy") * dx * dx
        - 2 * F.col("__cxy") * dx * dy
        + F.col("__vx") * dy * dy
    ) / (F.col("__vx") * F.col("__vy") - F.col("__cxy") * F.col("__cxy"))
    return (
        base.join(F.broadcast(stats), key_col)
        .withColumn("d2", d2)
        # cut on the ROUNDED distance (the value we return): the
        # var/cov sufficient statistics are aggregation-order-dependent
        # in their low bits, so an unrounded cut lets boundary rows
        # flicker across runs/engines (repo convention, cf.
        # sparse_cosine_pairs / adamic_adar)
        .where(F.round(F.col("d2"), 4) > threshold)
        .select(
            key_col,
            id_col,
            x.alias(x_col),
            y.alias(y_col),
            F.round("d2", 4).alias("d2"),
        )
    )


def km_survival(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 3,
) -> DataFrame:
    """Kaplan–Meier survival curve over user LIFETIMES (days between a
    user's first and last event): at each observed lifetime t, the
    at-risk count n_t, the churn count d_t, and the survival estimate
    S(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}).

    Censoring: users whose last event falls within ``censor_days`` of
    the corpus's max timestamp are censored (still alive) — they leave
    the risk set at their lifetime without counting as churn, the
    textbook KM treatment of an observation window's right edge.

    Execution: one user-keyed rollup (the only data-sized shuffle), a
    lifetime histogram bounded by the observation span in days, then the
    cumulative product over that tiny ordered table computed
    DRIVER-SIDE (the same metadata-scale finish as the CMS probe —
    Spark has no sequential product aggregate, and a log/exp rewrite
    would lose cross-engine bit parity).  Collecting ≤ span-days rows is
    O(1) with respect to data size."""
    rolled = df.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).groupBy(user_col).agg(
        F.min(ts_col).alias("__first"),
        F.max(ts_col).alias("__last"),
    )
    bounds = df.agg(F.max(ts_col).alias("__maxts"))
    per_user = rolled.crossJoin(F.broadcast(bounds)).select(
        F.floor(
            (F.col("__last").cast("double") - F.col("__first").cast("double"))
            / 86400.0
        )
        .cast("bigint")
        .alias("t"),
        (
            F.col("__last").cast("double")
            < F.col("__maxts").cast("double") - censor_days * 86400.0
        ).alias("churned"),
    )
    hist = (
        per_user.groupBy("t")
        .agg(
            F.count("*").alias("n_leaving"),
            F.sum(F.col("churned").cast("long")).alias("d"),
        )
        .orderBy("t")
        .collect()
    )
    total = sum(r["n_leaving"] for r in hist)
    rows, at_risk, s = [], total, 1.0
    for r in hist:
        d, n = int(r["d"]), at_risk
        if d > 0:
            s = s * (1.0 - d / n)  # sequential product, ascending t
        rows.append((int(r["t"]), n, d, round(s, 4)))
        at_risk -= int(r["n_leaving"])
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "t bigint, n_risk bigint, d bigint, s double"
    )


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    rank_col: str = "rank",
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Truncated Rank-Biased Overlap between two top-``k`` rankings
    (Webber et al. 2010): RBO@k = Σ_{d=1..k} (1−p)·p^{d−1}·|A_:d ∩ B_:d|/d
    — the top-weighted similarity measure for comparing retrieval
    results (exact vs ANN, two embedding models, yesterday's vs today's
    ranking).  p controls top-weightedness (0.9 ≈ the top ~10 ranks
    carry the weight).

    Relational form: an item joined across both lists enters every
    prefix depth ≥ max(rank_a, rank_b), so per-depth overlap counts are
    one inner join + a depth-spine join over ≤ k² rows — metadata-scale
    regardless of how big the corpora behind the rankings were.
    Returns one row (k, rbo)."""
    spark = a.sparkSession
    ra = a.where(F.col(rank_col) <= k).select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("__ra")
    )
    rb = b.where(F.col(rank_col) <= k).select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("__rb")
    )
    m = ra.join(rb, "__id").select(
        F.greatest("__ra", "__rb").alias("__m")
    )
    spine = spark.range(1, k + 1).select(F.col("id").alias("__d"))
    per_depth = (
        spine.join(F.broadcast(m), F.col("__m") <= F.col("__d"), "left")
        .groupBy("__d")
        .agg(F.count("__m").alias("__x"))
    )
    w = (1.0 - p) * F.pow(F.lit(p), F.col("__d") - 1)
    return per_depth.agg(
        F.max(F.lit(k)).alias("k"),
        F.round(F.sum(w * F.col("__x") / F.col("__d")), 6).alias("rbo"),
    )


def reciprocal_rank_fusion(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    c: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. SIGIR 2009): fuse N
    top-k rankings into one by RRF(i) = Σ_lists 1/(c + rank_i), the
    standard zero-tuning ensemble for hybrid retrieval (BM25 + dense,
    exact + ANN, multiple embedding models).  c=60 is the paper's
    constant; items missing from a list contribute nothing for it.

    Relational form: a full outer merge of ≤k-row rank frames — strictly
    metadata-scale regardless of the corpus scans that produced the
    rankings.  Returns (id, n_lists, rrf) with rrf rounded to 6dp,
    engine-reproducible because each list's contribution is a single
    IEEE division and the sum has ≤N terms in a deterministic order."""
    if not rankings:
        raise ValueError("reciprocal_rank_fusion: need at least one ranking")
    parts = [
        r.select(
            F.col(id_col).alias("__id"),
            (1.0 / (F.lit(c) + F.col(rank_col))).alias("__w"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("__id").agg(
        F.count("*").cast("int").alias("n_lists"),
        F.round(F.sum("__w"), 6).alias("rrf"),
    ).select(F.col("__id").alias(id_col), "n_lists", "rrf")


def benford_audit(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """Benford's-law first-digit audit (Benford 1938; the standard
    fabricated-data screen in accounting/quality forensics — Nigrini
    1996): the distribution of the first significant digit of a
    naturally-occurring numeric column against the Benford expectation
    p(d) = log10(1 + 1/d), with per-digit deviation and chi-square
    contribution plus the total statistic.

    Determinism: values convert to integer units FIRST
    (floor(|x|·scale + 0.5) — exact for fixed-decimal money columns),
    and the first digit is the first character of the INTEGER's
    decimal rendering, which both engines produce identically (no
    float formatting, no log10-of-value flooring ambiguity).  The
    9-digit census collapses to ONE row; fractions, expectations, and
    the chi-square fold all run in-row over digit order 1..9, so
    every double replays.

    Shape: one scan-stage projection + one 9-group aggregation — the
    audit itself is O(1) after the census.  Returns 9 rows: (digit,
    n_obs, frac, benford_p, deviation, chi2_contrib, chi2_total,
    n_total)."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1 (got {scale})")
    v = F.col(value_col)
    n = F.floor(F.abs(v) * F.lit(int(scale)) + F.lit(0.5)).cast("bigint")
    base = (
        df.where(v.isNotNull())
        .select(n.alias("n"))
        .where(F.col("n") > 0)
    )
    digit = F.substring(F.col("n").cast("string"), 1, 1).cast("int")
    census = (
        base.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("obs"))
    )
    one = census.agg(
        F.array_sort(
            F.collect_list(F.struct("digit", "obs"))
        ).alias("a")
    )
    a = F.col("a")
    staged = one.select(
        "a",
        F.aggregate(
            a, F.lit(0).cast("bigint"), lambda acc, x: acc + x["obs"]
        ).alias("N"),
    )
    nn = F.col("N")

    def obs_of(d):
        # try_element_at: a digit absent from the census yields an
        # empty filter result, and ANSI element_at throws on index 1
        return F.coalesce(
            F.try_element_at(
                F.filter(a, lambda x: x["digit"] == d), F.lit(1)
            )["obs"],
            F.lit(0).cast("bigint"),
        )

    rows = F.transform(
        F.sequence(F.lit(1), F.lit(9)),
        lambda d: F.struct(
            d.alias("digit"),
            obs_of(d).alias("n_obs"),
            F.log10(F.lit(1.0) + F.lit(1.0) / d).alias("p"),
            (nn * F.log10(F.lit(1.0) + F.lit(1.0) / d)).alias("exp"),
        ),
    )
    staged2 = staged.select("N", rows.alias("rows"))
    chi2 = F.aggregate(
        F.col("rows"),
        F.lit(0.0),
        lambda acc, r: acc
        + (r["n_obs"].cast("double") - r["exp"])
        * (r["n_obs"].cast("double") - r["exp"])
        / r["exp"],
    )
    staged3 = staged2.select(
        "N", "rows", chi2.alias("chi2_total")
    )
    ex = staged3.select(
        "N", "chi2_total", F.explode(F.col("rows")).alias("r")
    )
    r = F.col("r")
    return ex.select(
        r["digit"].alias("digit"),
        r["n_obs"].alias("n_obs"),
        (r["n_obs"] / nn).alias("frac"),
        r["p"].alias("benford_p"),
        (r["n_obs"] / nn - r["p"]).alias("deviation"),
        (
            (r["n_obs"].cast("double") - r["exp"])
            * (r["n_obs"].cast("double") - r["exp"])
            / r["exp"]
        ).alias("chi2_contrib"),
        "chi2_total",
        nn.alias("n_total"),
    )


def calibration_audit(
    df: DataFrame,
    prob_col: str = "prob",
    label_col: str = "label",
    n_bins: int = 10,
    prob_scale: int = 1000,
) -> DataFrame:
    """Probability-calibration audit — reliability bins, expected
    calibration error, and the Brier score (Naeini et al. 2015 for
    ECE; Brier 1950): the QC gate on any quality/toxicity classifier
    whose scores feed threshold decisions, where a mis-calibrated 0.9
    silently shifts the retention budget.

    Everything is INTEGER-EXACT until the final divisions: the
    probability quantizes to ``prob_scale`` units (floor(p·s + 0.5)),
    so per-row Brier contributions ``(pm − y·s)²`` and the weighted
    ECE numerator ``Σ_b |Σy·s − Σpm|`` are BIGINT sums in any
    accumulation order:

        brier = Σ(pm − y·s)² / (N·s²)
        ece   = Σ_b |Σ_b y·s − Σ_b pm| / (N·s)

    (the n_b/N weighting cancels into the numerator).

    Shape: one scan-stage quantize + bin, one ≤ n_bins-group census
    collected to ONE row (the Benford pattern), totals folded in bin
    order, re-exploded.  Returns one row per OBSERVED bin: (bin,
    n_obs, mean_prob, frac_pos, gap, ece, brier, n_total)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1 (got {n_bins})")
    if prob_scale < 1:
        raise ValueError(f"prob_scale must be >= 1 (got {prob_scale})")
    s = int(prob_scale)
    p = F.col(prob_col)
    y = F.col(label_col).cast("bigint")
    pm = F.floor(p * F.lit(s) + F.lit(0.5)).cast("bigint")
    base = df.where(p.isNotNull() & y.isNotNull()).select(
        pm.alias("pm"), y.alias("y")
    )
    bin_ = F.least(
        F.expr(f"(pm * {int(n_bins)}) div {s}"),
        F.lit(int(n_bins) - 1).cast("bigint"),
    )
    census = (
        base.select(bin_.alias("bin"), "pm", "y")
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("pm").alias("sp"),
            F.sum("y").alias("sy"),
            F.sum(
                (F.col("pm") - F.col("y") * F.lit(s))
                * (F.col("pm") - F.col("y") * F.lit(s))
            ).alias("sq"),
        )
    )
    one = census.agg(
        F.array_sort(
            F.collect_list(F.struct("bin", "n", "sp", "sy", "sq"))
        ).alias("a")
    )
    a = F.col("a")

    def fold(f):
        return F.aggregate(
            a, F.lit(0).cast("bigint"), lambda acc, x: acc + f(x)
        )

    staged = one.select(
        "a",
        fold(lambda x: x["n"]).alias("N"),
        fold(lambda x: x["sq"]).alias("SQ"),
        fold(
            lambda x: F.abs(x["sy"] * F.lit(s) - x["sp"])
        ).alias("ED"),
    )
    nn = F.col("N")
    ex = staged.select(
        "N",
        (F.col("SQ").cast("double") / (nn * F.lit(s) * F.lit(s))).alias(
            "brier"
        ),
        (F.col("ED").cast("double") / (nn * F.lit(s))).alias("ece"),
        F.explode(a).alias("r"),
    )
    r = F.col("r")
    return ex.select(
        r["bin"].alias("bin"),
        r["n"].alias("n_obs"),
        (r["sp"] / (r["n"] * F.lit(s))).alias("mean_prob"),
        (r["sy"] / r["n"]).alias("frac_pos"),
        (
            (r["sy"] * F.lit(s) - r["sp"]).cast("double")
            / (r["n"] * F.lit(s))
        ).alias("gap"),
        "ece",
        "brier",
        nn.alias("n_total"),
    )


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation with average-rank tie
    handling — the robust companion to the ``regr_``-based Pearson
    (:func:`group_ols`): monotone-but-nonlinear relations score 1.0,
    single outliers can't dominate.

    Exactness: the average rank of a tied run is rank_lo +
    (ties−1)/2, so DOUBLED ranks ``2·rank_lo + ties − 1`` are
    INTEGERS (the factor 2 cancels in the correlation), and every
    sufficient statistic is a BIGINT sum — accumulation order can't
    matter; the closed form computes in double with fixed
    parenthesization.  (Bigint headroom bounds the scale: Σ(2r)² ≈
    4n³ must stay under 2^63 — fine to ~750M rows per group; beyond
    that, pre-bucket the values.)

    Shape: two partitioned rank windows (one sort per axis) + the
    tie-run counts as unordered (group, value) windows, then ONE
    keyed aggregation.  Returns (group_col, n, spearman_rho); groups
    with zero variance on either axis yield NULL."""
    from pyspark.sql import Window

    x, y = F.col(x_col), F.col(y_col)
    base = df.where(x.isNotNull() & y.isNotNull()).select(
        F.col(group_col), x.alias("__x"), y.alias("__y")
    )
    wx = Window.partitionBy(group_col).orderBy("__x")
    wy = Window.partitionBy(group_col).orderBy("__y")
    tx = Window.partitionBy(group_col, "__x")
    ty = Window.partitionBy(group_col, "__y")
    ranked = base.select(
        group_col,
        (
            F.lit(2) * F.rank().over(wx) + F.count("*").over(tx) - 1
        ).cast("bigint").alias("rx"),
        (
            F.lit(2) * F.rank().over(wy) + F.count("*").over(ty) - 1
        ).cast("bigint").alias("ry"),
    )
    rx, ry = F.col("rx"), F.col("ry")
    g = ranked.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(rx).alias("__sx"),
        F.sum(ry).alias("__sy"),
        F.sum(rx * ry).alias("__sxy"),
        F.sum(rx * rx).alias("__sxx"),
        F.sum(ry * ry).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    cov_n = n * sxy - sx * sy
    vx_n = n * sxx - sx * sx
    vy_n = n * syy - sy * sy
    return g.select(
        group_col,
        "n",
        F.when(
            (vx_n > 0) & (vy_n > 0),
            cov_n / (F.sqrt(vx_n) * F.sqrt(vy_n)),
        ).alias("spearman_rho"),
    )


def ranking_metrics(
    df: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Per-query ranking metrics — NDCG@k (Järvelin & Kekäläinen
    2002), MRR, and (binary) average precision — the retrieval-eval
    table next to rank-biased overlap and RRF:

        DCG@k  = Σ_{i≤k} rel_i / log2(i + 1)     (rank order)
        IDCG@k = the same sum over rels sorted descending
        MRR    = 1 / first rank with rel > 0
        AP     = mean over relevant hits of precision@hit

    Shape: ONE query-keyed aggregation collects the (rank, rel)
    structs; every metric folds IN-ROW over the rank-sorted bounded
    array (candidate lists are small constants), so the float
    accumulation order is fixed and both engines replay it.  Returns
    (query_col, n_cands, n_rel, dcg, idcg, ndcg, mrr, ap); queries
    with no relevant candidate report ndcg 0.0 and NULL mrr/ap."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    r = F.col(rank_col)
    base = df.where(
        r.isNotNull() & F.col(rel_col).isNotNull() & (r >= 1)
    )
    g = base.groupBy(query_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(r.alias("rk"), F.col(rel_col).alias("rel"))
            )
        ).alias("a"),
        F.count("*").alias("n_cands"),
    )
    a = F.col("a")
    topk = F.filter(a, lambda x: x["rk"] <= k)
    dcg = F.aggregate(
        topk,
        F.lit(0.0),
        lambda acc, x: acc
        + x["rel"].cast("double") / F.log2(x["rk"].cast("double") + 1),
    )
    # ideal: rels sorted DESCENDING, positions 1..k
    rels_desc = F.reverse(
        F.array_sort(F.transform(a, lambda x: x["rel"]))
    )
    ideal_k = F.slice(rels_desc, 1, k)
    idcg = F.aggregate(
        F.zip_with(
            ideal_k,
            F.sequence(F.lit(1), F.size(ideal_k)),
            lambda rel, i: F.struct(
                rel.alias("rel"), i.alias("i")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc
        + x["rel"].cast("double") / F.log2(x["i"].cast("double") + 1),
    )
    first_hit = F.try_element_at(
        F.filter(a, lambda x: x["rel"] > 0), F.lit(1)
    )["rk"]
    n_rel = F.size(F.filter(a, lambda x: x["rel"] > 0)).cast("bigint")
    # AP: the j-th relevant candidate (rank order) contributes
    # precision@hit = j / rank_j — a flat fold over the FILTERED
    # relevant list, no stateful accumulator needed
    hits = F.filter(a, lambda x: x["rel"] > 0)
    ap_sum = F.aggregate(
        F.transform(
            hits,
            lambda x, j: (j + 1).cast("double")
            / x["rk"].cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    staged = g.select(
        query_col,
        "n_cands",
        n_rel.alias("n_rel"),
        dcg.alias("dcg"),
        idcg.alias("idcg"),
        first_hit.alias("__fh"),
        ap_sum.alias("__aps"),
    )
    return staged.select(
        query_col,
        "n_cands",
        "n_rel",
        "dcg",
        "idcg",
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
        (F.lit(1.0) / F.col("__fh")).alias("mrr"),
        F.when(
            F.col("n_rel") > 0, F.col("__aps") / F.col("n_rel")
        ).alias("ap"),
    )
