"""Single-pass data-quality validation (deequ-style constraint checks).

A quality gate over a 100 TB table must not scan once per rule: every
check here compiles to an aggregate expression, so N rules run in ONE
aggregation over ONE scan (uniqueness rules add Spark's standard
two-phase distinct).  The report is a tiny (check, violations, passed)
frame — the shape CI gates and write-audit-publish pipelines consume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"{col}_not_null", F.count_if(F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"{col}_in_range",
        F.count_if(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))),
    )


def accepted_values(col: str, values) -> tuple[str, Column]:
    c = F.col(col)
    arr = F.array(*[F.lit(v) for v in values])
    return (
        f"{col}_accepted",
        F.count_if(c.isNotNull() & ~F.array_contains(arr, c)),
    )


def unique(*cols: str) -> tuple[str, Column]:
    """Violations = rows beyond the first per key (0 when key-unique)."""
    name = "_".join(cols) + "_unique"
    if len(cols) == 1:
        key = F.col(cols[0])
    else:
        key = F.struct(*[F.col(c) for c in cols])
    return name, F.count(key) - F.count_distinct(key)


def matches_regex(col: str, pattern: str) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"{col}_matches",
        F.count_if(c.isNotNull() & ~c.rlike(pattern)),
    )


def validate(df: DataFrame, checks) -> DataFrame:
    """Run ``checks`` (name, violation-count expression pairs from the
    builders above) in one aggregation; returns
    (check, violations, passed) rows."""
    checks = list(checks)
    agg = df.agg(
        *[expr.cast("long").alias(f"__v{i}") for i, (_, expr) in enumerate(checks)]
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check"),
                        F.col(f"__v{i}").alias("violations"),
                        (F.col(f"__v{i}") == 0).alias("passed"),
                    )
                    for i, (name, _) in enumerate(checks)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.check", "r.violations", "r.passed")


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """Re-identification risk audit: group by the quasi-identifier
    columns and measure how much of the dataset lives in groups smaller
    than ``k`` (a row in a size-1 group is uniquely re-identifiable
    from the quasi-identifiers alone).

    Shape is the TPC-H Q13 double aggregation: one shuffle on the
    quasi-identifier key (map-side combined), then the summary folds
    the ≤|groups| counts — the raw table is scanned exactly once.
    Returns ONE row: (k, k_anonymity = min group size, n_groups,
    n_risky_groups, n_rows, n_risky_rows, risk_rate).  A dataset is
    k-anonymous iff ``k_anonymity >= k`` (risk_rate 0).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    groups = df.groupBy(*quasi_cols).agg(F.count("*").alias("n"))
    risky = F.col("n") < k
    return groups.agg(
        F.lit(k).cast("bigint").alias("k"),
        F.min("n").cast("bigint").alias("k_anonymity"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.count_if(risky).cast("bigint").alias("n_risky_groups"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum(F.when(risky, F.col("n")).otherwise(0)).cast("bigint").alias(
            "n_risky_rows"
        ),
        F.round(
            F.sum(F.when(risky, F.col("n")).otherwise(0)) / F.sum("n"), 6
        ).alias("risk_rate"),
    )


def dp_counts(
    df: DataFrame,
    keys: list[str],
    epsilon: float = 1.0,
    seed: str = "dp",
    clamp: bool = True,
    *,
    release_id: str,
) -> DataFrame:
    """Differentially-private count release: per-group counts with
    Laplace(1/ε) noise (count queries have sensitivity 1), the standard
    ε-DP mechanism for publishing histograms over sensitive data.

    The noise draw is DETERMINISTIC per (release_id, seed, group): a
    md5-derived uniform (13 hex chars → 52-bit integer, exactly
    representable) pushed through the Laplace inverse CDF.  That makes
    the release reproducible across runs, engines, and partitionings —
    the property that lets the oracle replicate it bit-for-bit — and is
    the seed-keyed-noise pattern real reproducible-DP pipelines use;
    the privacy guarantee then rests on the SEED staying secret.

    ``release_id`` is MANDATORY and keyword-only because reusing the
    same noise across two releases is a differencing attack: if the
    table grew between releases, subtracting the two published counts
    cancels the (identical) noise and recovers the exact per-group
    increment.  Give every release of the same statistic a distinct id
    (date, version, run id) so each gets fresh noise; noise for
    distinct release_ids is independent by construction.

    Execution: one count aggregation (map-side partials), noise applied
    in the result projection — group-cardinality rows, never data rows.
    ``clamp`` floors released counts at 0 (post-processing preserves
    DP)."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0 (got {epsilon})")
    if not release_id:
        raise ValueError("release_id must be a non-empty string")
    grp = df.groupBy(*keys).agg(F.count("*").alias("__n"))
    key_str = F.concat_ws(
        "\x1f",
        F.lit(release_id),
        F.lit(seed),
        *[F.coalesce(F.col(k).cast("string"), F.lit("\x00")) for k in keys],
    )
    h = F.conv(F.substring(F.md5(key_str), 1, 13), 16, 10).cast("bigint")
    u = (h.cast("double") + 0.5) / float(16**13)
    lap = (
        (-1.0 / epsilon)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    noisy = F.round(F.col("__n") + lap, 0).cast("bigint")
    if clamp:
        noisy = F.greatest(noisy, F.lit(0).cast("bigint"))
    return grp.select(*keys, noisy.alias("noisy_count"))


def fingerprint_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """OpenRefine-style fingerprint key clustering: records whose
    normalized SORTED-UNIQUE-TOKEN fingerprint collides are spelling /
    word-order variants of the same value ("acme corp" ≈ "Corp, ACME")
    — the standard first pass of entity cleanup, catching what exact
    dedup misses and fuzzy matching over-pays for.

    One scan-stage key expression + one key shuffle; only colliding
    keys (clusters of ≥2 with >1 distinct raw text) are returned:
    (fp, n_members, n_variants, canonical) where canonical is the
    most frequent raw text, ties to the alphabetically smallest —
    elected with min(struct(-count, raw)), no window."""
    from kevinlang_spark.functions.textexpr import tokenize

    fp = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(tokenize(F.col(text_col))))
        )
    )
    keyed = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("raw"), fp.alias("fp")
    ).where(F.col("raw").isNotNull())
    by_variant = keyed.groupBy("fp", "raw").agg(F.count("*").alias("n"))
    return (
        by_variant.groupBy("fp")
        .agg(
            F.sum("n").cast("bigint").alias("n_members"),
            F.count("*").cast("bigint").alias("n_variants"),
            F.min(F.struct((-F.col("n")).alias("negn"), F.col("raw")))[
                "raw"
            ].alias("canonical"),
        )
        .where((F.col("n_members") >= 2) & (F.col("n_variants") >= 2))
    )


def fd_violations(
    df: DataFrame,
    lhs: list[str],
    rhs: str,
) -> DataFrame:
    """Functional-dependency check (profiling / TANE-style candidate
    verification): does ``lhs → rhs`` hold?  Returns a 1-row report
    (n_groups, n_violating, max_variants, holds) — a group violates
    when one ``lhs`` value maps to >1 distinct ``rhs``.

    One grouped count-distinct over the lhs key (Spark's standard
    two-phase distinct), then a metadata-sized rollup — the shape a
    schema-inference or key-discovery pass runs per candidate FD."""
    if not lhs:
        raise ValueError("fd_violations: need at least one lhs column")
    per = df.groupBy(*[F.col(c) for c in lhs]).agg(
        F.count_distinct(F.col(rhs)).alias("nv")
    )
    return per.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.count_if(F.col("nv") > 1).cast("bigint").alias("n_violating"),
        F.max("nv").cast("bigint").alias("max_variants"),
        (F.count_if(F.col("nv") > 1) == 0).alias("holds"),
    )


def fleiss_kappa(
    df: DataFrame,
    group_col: str = "source",
    item_col: str = "doc_id",
    rater_col: str = "rater_id",
    cat_col: str = "category",
    n_raters: int = 3,
) -> DataFrame:
    """Inter-annotator agreement per group — Fleiss' kappa (Fleiss
    1971, "Measuring nominal scale agreement among many raters"): the
    QC gate before trusting LLM-judge or human labels enough to train
    on them.  Items are rated by exactly ``n_raters`` raters into
    nominal categories; kappa = (P̄ − P̄e) / (1 − P̄e), where P̄ is the
    mean per-item pairwise agreement and P̄e the chance agreement from
    the category marginals.

    Classic Fleiss assumes a CONSTANT rater count: items whose
    deduplicated rater count differs from ``n_raters`` are dropped and
    reported (n_items_dropped).  Duplicate (item, rater) votes keep
    the MIN category (deterministic dedup).

    Cross-engine exactness: P̄ stays INTEGER until one final division
    — Σᵢ(Σⱼ nᵢⱼ² − n) is exact int64 (nᵢⱼ ≤ n_raters, the per-item sum
    is bounded; the corpus sum fits 2^63 to ~10¹⁷ items), so no
    float-sum-order drift over items.  P̄e folds over the per-group
    category marginals IN-ROW over a sorted bounded array (categories
    are a nominal handful), the reward_agreement discipline.

    Scale shape: ONE corpus-scale aggregation chain (votes →
    per-item-category counts → per-item stats carrying the bounded
    per-item category array), lazily checkpointed so its four
    consumers (kept stats, dropped census, category marginals, group
    rollup) share ONE materialization instead of re-scanning the
    corpus per branch — the first cut of this operator read the
    parquet scan 4× (zero ReusedExchange: column pruning makes the
    branch subtrees non-identical, so Spark cannot dedupe them).
    Everything downstream of the checkpoint is item- or group-scale.

    Returns (group_col, n_items, n_items_dropped, p_bar, p_e,
    kappa)."""
    if n_raters < 2:
        raise ValueError(f"n_raters must be >= 2, got {n_raters}")
    votes = (
        df.where(
            F.col(item_col).isNotNull()
            & F.col(rater_col).isNotNull()
            & F.col(cat_col).isNotNull()
        )
        .groupBy(group_col, item_col, rater_col)
        .agg(F.min(cat_col).alias("__cat"))
    )
    item_cat = votes.groupBy(group_col, item_col, "__cat").agg(
        F.count("*").alias("__nij")
    )
    item = (
        item_cat.groupBy(group_col, item_col)
        .agg(
            F.sum("__nij").alias("__n"),
            F.sum(F.col("__nij") * F.col("__nij")).alias("__s2"),
            F.collect_list(
                F.struct(
                    F.col("__cat").alias("c"), F.col("__nij").alias("k")
                )
            ).alias("__cks"),
        )
        .localCheckpoint(eager=False)
    )
    kept = item.where(F.col("__n") == n_raters)
    dropped = (
        item.where(F.col("__n") != n_raters)
        .groupBy(group_col)
        .agg(F.count("*").alias("n_items_dropped"))
    )
    # category marginals over KEPT items only (bounded alphabet) —
    # the per-item category counts ride the checkpointed frame, so no
    # join back to item_cat and no corpus re-scan
    cat_counts = (
        kept.select(group_col, F.explode("__cks").alias("e"))
        .groupBy(group_col, F.col("e.c").alias("__c"))
        .agg(F.sum("e.k").alias("__cj"))
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_list(F.col("__cj"))).alias("__cjs"))
    )
    g = kept.groupBy(group_col).agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("__s2") - n_raters).alias("__sum_s2n"),
    )
    joined = (
        g.join(cat_counts, group_col)
        .join(dropped, group_col, "left")
        .withColumn(
            "n_items_dropped",
            F.coalesce(F.col("n_items_dropped"), F.lit(0)).cast("bigint"),
        )
    )
    nn = F.col("n_items") * n_raters  # total votes, exact int
    p_bar = F.col("__sum_s2n") / (
        F.col("n_items") * n_raters * (n_raters - 1)
    )
    p_e = F.aggregate(
        F.col("__cjs"),
        F.lit(0.0),
        lambda acc, c: acc + (c / nn) * (c / nn),
    )
    staged = joined.select(
        group_col,
        "n_items",
        "n_items_dropped",
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
    )
    return staged.select(
        group_col,
        "n_items",
        "n_items_dropped",
        "p_bar",
        "p_e",
        (
            (F.col("p_bar") - F.col("p_e")) / (F.lit(1.0) - F.col("p_e"))
        ).alias("kappa"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: "list[str]",
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, "l-diversity:
    Privacy beyond k-anonymity") — the attribute-disclosure companion
    to :func:`k_anonymity`: a k-anonymous group whose sensitive
    attribute is CONSTANT still leaks it, so each quasi-identifier
    group must carry at least ``l`` distinct sensitive values
    (distinct l-diversity); the entropy variant additionally requires
    group entropy ≥ ln(l).

    Shape: one shuffle on (quasi, sensitive) for the value census,
    one on quasi for the per-group roll-up — the raw table is scanned
    once.  Group entropy folds IN-ROW over the value-sorted (value,
    count) array (bounded by the sensitive domain — bin continuous
    attributes first), with fixed parenthesization, so the doubles
    replay across engines; MIN over groups is order-insensitive.

    Returns ONE row: (l, l_diversity = min distinct sensitive values
    per group, n_groups, n_risky_groups, n_rows, n_risky_rows,
    risk_rate, min_entropy); the dataset is l-diverse iff
    ``l_diversity >= l``, entropy-l-diverse iff ``min_entropy >=
    ln(l)``."""
    if l < 1:
        raise ValueError(f"l must be >= 1 (got {l})")
    v = F.col(sensitive_col)
    gv = (
        df.where(v.isNotNull())
        .groupBy(*quasi_cols, sensitive_col)
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    per = gv.groupBy(*quasi_cols).agg(
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum("c").alias("n"),
        F.array_sort(
            F.collect_list(F.struct(v.alias("v"), F.col("c").alias("c")))
        ).alias("vc"),
    )
    # entropy = -Σ (c/n) ln(c/n), folded in sensitive-value order;
    # written 0.0 - fold so a constant group yields +0.0, not -0.0
    # (a -0.0/-0.0 split across engines re-orders the row sort)
    ent = F.lit(0.0) - F.aggregate(
        F.col("vc"),
        F.lit(0.0),
        lambda acc, p: acc
        + (p["c"] / F.col("n")) * F.log(p["c"] / F.col("n")),
    )
    staged = per.select(*quasi_cols, "n_distinct", "n", ent.alias("ent"))
    risky = F.col("n_distinct") < l
    return staged.agg(
        F.lit(l).cast("bigint").alias("l"),
        F.min("n_distinct").alias("l_diversity"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.count_if(risky).cast("bigint").alias("n_risky_groups"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum(F.when(risky, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_risky_rows"),
        F.round(
            F.sum(F.when(risky, F.col("n")).otherwise(0)) / F.sum("n"), 6
        ).alias("risk_rate"),
        F.min("ent").alias("min_entropy"),
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: "list[str]",
    sensitive_col: str,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) for an
    ORDERED sensitive attribute: per quasi-identifier group, the Earth
    Mover's Distance between the group's sensitive-value distribution
    and the global one, with unit ground distance between adjacent
    categories — EMD = Σᵢ |cumP(i) − cumQ(i)| / (m−1) over the m
    global categories.  A group whose EMD exceeds the chosen t leaks
    the sensitive attribute even if it is k-anonymous AND l-diverse
    (the skewness attack).

    Everything is INTEGER-EXACT until one final division: with group
    size n, global size G, and integer cumulative counts cumc/cumg,

        |cumP − cumQ| = |cumc·G − cumg·n| / (n·G)

    so the per-group sum accumulates BIGINT terms (order-insensitive,
    engine-independent) and EMD = sum / (n·G·(m−1)) computes as one
    double expression.  (The bigint products bound the scale: n·G must
    stay under 2^63 — bin and/or sample first above ~10^9 rows.)

    Shape: value census on (quasi, sensitive), bounded-domain census
    on sensitive (collected to ONE row, cumulated in-row, re-exploded
    — the sensitive domain must be bounded, bin first), a broadcast
    domain join to materialize absent categories, one partitioned
    cumulative window, one final group roll-up.

    Returns per group: (quasi_cols..., n, n_distinct, emd)."""
    from pyspark.sql import Window

    v = F.col(sensitive_col)
    base = (
        df.where(v.isNotNull())
        .select(*quasi_cols, sensitive_col)
        # feeds the group census AND the domain census pre-shuffle
        .localCheckpoint(eager=True)
    )
    gv = base.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").cast("bigint").alias("c")
    )
    dom = base.groupBy(sensitive_col).agg(
        F.count("*").cast("bigint").alias("g")
    )
    # bounded domain → ONE row; in-row cumulative + totals; re-explode
    dom_arr = dom.agg(
        F.array_sort(
            F.collect_list(F.struct(v.alias("v"), F.col("g").alias("g")))
        ).alias("a")
    )
    a = F.col("a")
    dom_cum = dom_arr.select(
        F.size(a).cast("bigint").alias("m"),
        F.aggregate(
            a, F.lit(0).cast("bigint"), lambda acc, p: acc + p["g"]
        ).alias("G"),
        F.explode(
            F.transform(
                a,
                lambda e, i: F.struct(
                    e["v"].alias("v"),
                    F.aggregate(
                        F.slice(a, F.lit(1), i + 1),
                        F.lit(0).cast("bigint"),
                        lambda acc, p: acc + p["g"],
                    ).alias("cumg"),
                ),
            )
        ).alias("d"),
    ).select("m", "G", F.col("d.v").alias("v"), F.col("d.cumg").alias("cumg"))
    groups = gv.groupBy(*quasi_cols).agg(F.sum("c").alias("n"))
    # every group × every domain category (absent → c = 0)
    full = (
        groups.crossJoin(F.broadcast(dom_cum))
        .join(
            gv.withColumnRenamed(sensitive_col, "v"),
            [*quasi_cols, "v"],
            "left",
        )
        .select(
            *quasi_cols,
            "n",
            "m",
            "G",
            "v",
            "cumg",
            F.coalesce(F.col("c"), F.lit(0).cast("bigint")).alias("c"),
        )
    )
    wcum = Window.partitionBy(*quasi_cols).orderBy("v")
    terms = full.select(
        *quasi_cols,
        "n",
        "m",
        "G",
        (F.col("c") > 0).cast("int").alias("present"),
        F.abs(
            F.sum("c").over(wcum) * F.col("G")
            - F.col("cumg") * F.col("n")
        ).alias("term"),
    )
    return (
        terms.groupBy(*quasi_cols)
        .agg(
            F.max("n").alias("n"),
            F.sum("present").cast("bigint").alias("n_distinct"),
            F.max("m").alias("__m"),
            F.max("G").alias("__G"),
            F.sum("term").alias("__s"),
        )
        .select(
            *quasi_cols,
            "n",
            "n_distinct",
            F.when(
                F.col("__m") >= 2,
                F.col("__s").cast("double")
                / (
                    F.col("n").cast("double")
                    * F.col("__G")
                    * (F.col("__m") - 1)
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("emd"),
        )
    )
