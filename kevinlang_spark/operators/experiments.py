"""Controlled-experiment (A/B) analysis operators.

The experimentation counterpart of the drift/eval tiers: arm-level
effect estimates with CUPED variance reduction (Deng, Xu, Kohavi &
Walker 2013, "Improving the sensitivity of online controlled
experiments by utilizing pre-experiment data") and the sample-ratio-
mismatch gate every experiment platform runs before trusting a
readout.  Both reduce to keyed aggregations of integer-exact
sufficient statistics with fixed-parenthesization closed forms, so
the DuckDB oracle replays every double bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cuped_ab_test(
    df: DataFrame,
    arm_col: str = "arm",
    metric_col: str = "y",
    covariate_col: str = "x",
    value_scale: int = 100,
) -> DataFrame:
    """CUPED-adjusted two-arm test: per experiment unit, an
    experiment-period metric Y and a PRE-experiment covariate X;
    the adjusted metric Y' = Y − θ·(X − E[X]) with the pooled
    θ = cov(X, Y)/var(X) removes the covariate-explained variance
    (typically 30-50% for strong pre-metrics), shrinking the CI with
    zero bias (X predates assignment).

    Exactness: units quantize to ``value_scale`` integer units, so
    every per-arm and pooled sufficient statistic (n, Σx, Σy, Σx²,
    Σy², Σxy) is a BIGINT sum; the adjusted-arm variance expands
    algebraically —

        var(Y') = var(Y) − 2θ·cov(X, Y) + θ²·var(X)

    — so NO per-unit double is ever summed; θ, means, variances, the
    lift, and the z statistic all derive from the exact integers with
    one fixed expression each.

    Shape: one unit-level aggregation upstream of the call produces
    (arm, y, x); here one arm-keyed aggregation + the 2-row census
    collapsed to one row (the Benford pattern) and re-exploded.
    Returns one row per arm: (arm_col, n_units, mean_y, mean_y_adj,
    var_y, var_y_adj, theta, var_reduction, lift_adj, z_raw, z_adj) —
    the last five repeat the experiment-level readout on every row;
    lift/z are signed treatment-minus-control with arms ordered by
    name (first = control)."""
    if value_scale < 1:
        raise ValueError(f"value_scale must be >= 1 (got {value_scale})")
    s = int(value_scale)
    y = F.floor(F.col(metric_col) * F.lit(s) + F.lit(0.5)).cast("bigint")
    x = F.floor(F.col(covariate_col) * F.lit(s) + F.lit(0.5)).cast(
        "bigint"
    )
    base = df.where(
        F.col(metric_col).isNotNull()
        & F.col(covariate_col).isNotNull()
        & F.col(arm_col).isNotNull()
    ).select(F.col(arm_col).alias("arm"), y.alias("qy"), x.alias("qx"))
    per_arm = base.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("qy").alias("sy"),
        F.sum("qx").alias("sx"),
        F.sum(F.col("qy") * F.col("qy")).alias("syy"),
        F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
        F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
    )
    one = per_arm.agg(
        F.array_sort(
            F.collect_list(
                F.struct("arm", "n", "sy", "sx", "syy", "sxx", "sxy")
            )
        ).alias("a")
    )
    a = F.col("a")

    def tot(f):
        return F.aggregate(
            a, F.lit(0).cast("bigint"), lambda acc, r: acc + f(r)
        )

    staged = one.select(
        "a",
        tot(lambda r: r["n"]).alias("N"),
        tot(lambda r: r["sx"]).alias("gsx"),
        tot(lambda r: r["sy"]).alias("gsy"),
        tot(lambda r: r["sxx"]).alias("gsxx"),
        tot(lambda r: r["sxy"]).alias("gsxy"),
    )
    nn = F.col("N").cast("double")
    vx_pool = (
        F.col("gsxx") * F.col("N") - F.col("gsx") * F.col("gsx")
    ).cast("double")
    cov_pool = (
        F.col("gsxy") * F.col("N") - F.col("gsx") * F.col("gsy")
    ).cast("double")
    theta = F.when(vx_pool > 0, cov_pool / vx_pool).otherwise(F.lit(0.0))
    mx = F.col("gsx") / F.col("N")
    staged2 = staged.select(
        "a", theta.alias("__th"), mx.alias("__mx")
    )
    th, mxc = F.col("__th"), F.col("__mx")

    def arm_stats(r):
        n = r["n"].cast("double")
        my = r["sy"] / r["n"]
        mxa = r["sx"] / r["n"]
        var_y = (r["syy"] * r["n"] - r["sy"] * r["sy"]).cast(
            "double"
        ) / (r["n"] * r["n"])
        var_x = (r["sxx"] * r["n"] - r["sx"] * r["sx"]).cast(
            "double"
        ) / (r["n"] * r["n"])
        cov = (r["sxy"] * r["n"] - r["sx"] * r["sy"]).cast("double") / (
            r["n"] * r["n"]
        )
        my_adj = my - th * (mxa - mxc)
        var_adj = var_y - F.lit(2.0) * th * cov + th * th * var_x
        return n, my, my_adj, var_y, var_adj

    rows = F.transform(
        a,
        lambda r: F.struct(
            r["arm"].alias("arm"),
            r["n"].alias("n_units"),
            arm_stats(r)[1].alias("my"),
            arm_stats(r)[2].alias("mya"),
            arm_stats(r)[3].alias("vy"),
            arm_stats(r)[4].alias("vya"),
        ),
    )
    staged3 = staged2.select("__th", rows.alias("rows"))
    r1 = F.element_at(F.col("rows"), 1)
    r2 = F.element_at(F.col("rows"), 2)
    two = F.size(F.col("rows")) == 2

    def z(mfield, vfield):
        # a zero pooled standard error (e.g. a perfect covariate
        # zeroing the adjusted variance) yields NULL, not an ANSI
        # divide-by-zero
        denom = (
            r2[vfield] / r2["n_units"] + r1[vfield] / r1["n_units"]
        )
        return F.when(
            two & (denom > 0),
            (r2[mfield] - r1[mfield]) / F.sqrt(denom),
        )

    staged4 = staged3.select(
        "__th",
        "rows",
        F.when(two, r2["mya"] - r1["mya"]).alias("__lift"),
        z("my", "vy").alias("__zr"),
        z("mya", "vya").alias("__za"),
        F.when(
            two & (r1["vy"] > 0) & (r2["vy"] > 0),
            F.lit(1.0)
            - (r1["vya"] + r2["vya"]) / (r1["vy"] + r2["vy"]),
        ).alias("__vred"),
    )
    ex = staged4.select(
        "__th", "__lift", "__zr", "__za", "__vred",
        F.explode(F.col("rows")).alias("r"),
    )
    r = F.col("r")
    sc = F.lit(float(s))
    return ex.select(
        r["arm"].alias(arm_col),
        r["n_units"].alias("n_units"),
        (r["my"] / sc).alias("mean_y"),
        (r["mya"] / sc).alias("mean_y_adj"),
        (r["vy"] / (sc * sc)).alias("var_y"),
        (r["vya"] / (sc * sc)).alias("var_y_adj"),
        F.col("__th").alias("theta"),
        F.col("__vred").alias("var_reduction"),
        (F.col("__lift") / sc).alias("lift_adj"),
        F.col("__zr").alias("z_raw"),
        F.col("__za").alias("z_adj"),
    )


def srm_check(
    df: DataFrame,
    arm_col: str = "arm",
    expected: "dict[str, float] | None" = None,
) -> DataFrame:
    """Sample-ratio-mismatch gate (Fabijan et al. 2019): chi-square
    goodness-of-fit of observed arm counts against the design ratios
    (default: uniform over observed arms).  An experiment whose
    traffic split drifted is invalid no matter what the metric says —
    this is the FIRST check a readout pipeline runs.

    One arm-keyed count + the bounded census collapsed in-row; the
    chi-square folds in arm order.  Expected ratios enter as exact
    Python doubles shared with the oracle.  Returns one row per arm:
    (arm_col, n_obs, expected_frac, expected_n, chi2_contrib,
    chi2_total, n_total)."""
    counts = (
        df.where(F.col(arm_col).isNotNull())
        .groupBy(F.col(arm_col).alias("arm"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    one = counts.agg(
        F.array_sort(F.collect_list(F.struct("arm", "n"))).alias("a")
    )
    a = F.col("a")
    staged = one.select(
        "a",
        F.aggregate(
            a, F.lit(0).cast("bigint"), lambda acc, r: acc + r["n"]
        ).alias("N"),
    )
    nn = F.col("N")
    if expected is None:
        frac = lambda r: F.lit(1.0) / F.size(a)  # noqa: E731
    else:
        total = float(sum(expected.values()))
        emap = F.create_map(
            *[
                x
                for k, v in sorted(expected.items())
                for x in (F.lit(k), F.lit(float(v) / total))
            ]
        )
        frac = lambda r: emap[r["arm"]]  # noqa: E731
    rows = F.transform(
        a,
        lambda r: F.struct(
            r["arm"].alias("arm"),
            r["n"].alias("n_obs"),
            frac(r).alias("ef"),
            (nn * frac(r)).alias("en"),
        ),
    )
    staged2 = staged.select("N", rows.alias("rows"))
    chi2 = F.aggregate(
        F.col("rows"),
        F.lit(0.0),
        lambda acc, r: acc
        + (r["n_obs"].cast("double") - r["en"])
        * (r["n_obs"].cast("double") - r["en"])
        / r["en"],
    )
    ex = staged2.select(
        "N", chi2.alias("chi2_total"), F.explode(F.col("rows")).alias("r")
    )
    r = F.col("r")
    return ex.select(
        r["arm"].alias(arm_col),
        r["n_obs"].alias("n_obs"),
        r["ef"].alias("expected_frac"),
        r["en"].alias("expected_n"),
        (
            (r["n_obs"].cast("double") - r["en"])
            * (r["n_obs"].cast("double") - r["en"])
            / r["en"]
        ).alias("chi2_contrib"),
        "chi2_total",
        F.col("N").alias("n_total"),
    )


def ratio_metric_test(
    df: DataFrame,
    arm_col: str = "arm",
    num_col: str = "num",
    den_col: str = "den",
    value_scale: int = 100,
) -> DataFrame:
    """Two-arm test for a RATIO metric (CTR, revenue-per-session,
    tokens-per-doc): the arm-level metric is R = ΣN/ΣD — not the mean
    of per-unit ratios — and its standard error comes from the delta
    method (Deng, Knoblich & Lu 2018, "Applying the Delta method in
    metric analytics"):

        var(R̂) = (var(n) − 2R·cov(n, d) + R²·var(d)) / (n_units·d̄²)

    Naively treating the ratio as a mean understates the variance
    whenever numerator and denominator correlate (they always do).

    Same exactness contract as :func:`cuped_ab_test`: per-unit values
    quantize to integers, every moment is a BIGINT sum, and R / SE /
    z derive with fixed parenthesization.  Returns one row per arm:
    (arm_col, n_units, ratio, se, z) — z is treatment-minus-control
    over pooled SEs, repeated on both rows, NULL unless exactly two
    arms with positive denominators."""
    if value_scale < 1:
        raise ValueError(f"value_scale must be >= 1 (got {value_scale})")
    s = int(value_scale)
    qn = F.floor(F.col(num_col) * F.lit(s) + F.lit(0.5)).cast("bigint")
    qd = F.floor(F.col(den_col) * F.lit(s) + F.lit(0.5)).cast("bigint")
    base = df.where(
        F.col(num_col).isNotNull()
        & F.col(den_col).isNotNull()
        & F.col(arm_col).isNotNull()
    ).select(F.col(arm_col).alias("arm"), qn.alias("qn"), qd.alias("qd"))
    per = base.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("qn").alias("sn"),
        F.sum("qd").alias("sd"),
        F.sum(F.col("qn") * F.col("qn")).alias("snn"),
        F.sum(F.col("qd") * F.col("qd")).alias("sdd"),
        F.sum(F.col("qn") * F.col("qd")).alias("snd"),
    )
    one = per.agg(
        F.array_sort(
            F.collect_list(
                F.struct("arm", "n", "sn", "sd", "snn", "sdd", "snd")
            )
        ).alias("a")
    )
    a = F.col("a")

    def arm_row(r):
        n = r["n"]
        ratio = F.when(r["sd"] > 0, r["sn"] / r["sd"])
        md = r["sd"] / n
        vn = (r["snn"] * n - r["sn"] * r["sn"]).cast("double") / (n * n)
        vd = (r["sdd"] * n - r["sd"] * r["sd"]).cast("double") / (n * n)
        cov = (r["snd"] * n - r["sn"] * r["sd"]).cast("double") / (
            n * n
        )
        var_r = F.when(
            r["sd"] > 0,
            (
                vn
                - F.lit(2.0) * ratio * cov
                + ratio * ratio * vd
            )
            / (n * (md * md)),
        )
        return F.struct(
            r["arm"].alias("arm"),
            n.alias("n_units"),
            ratio.alias("ratio"),
            F.sqrt(var_r).alias("se"),
        )

    rows = F.transform(a, arm_row)
    staged = one.select(rows.alias("rows"))
    r1 = F.element_at(F.col("rows"), 1)
    r2 = F.element_at(F.col("rows"), 2)
    two = F.size(F.col("rows")) == 2
    denom = r1["se"] * r1["se"] + r2["se"] * r2["se"]
    zz = F.when(
        two & r1["ratio"].isNotNull() & r2["ratio"].isNotNull()
        & (denom > 0),
        (r2["ratio"] - r1["ratio"]) / F.sqrt(denom),
    )
    ex = staged.select(
        zz.alias("__z"), F.explode(F.col("rows")).alias("r")
    )
    r = F.col("r")
    return ex.select(
        r["arm"].alias(arm_col),
        r["n_units"].alias("n_units"),
        r["ratio"].alias("ratio"),
        r["se"].alias("se"),
        F.col("__z").alias("z"),
    )
