"""Fixed-memory frequency sketches (heavy hitters).

Exact per-value counts of a high-cardinality column need a shuffle whose
state grows with the number of distinct values; at 100 TB the top-k
question ("which domains dominate the crawl?") is answered instead with
a bounded-memory summary per partition + a tiny merge — the same
sketch-then-verify pattern as ``q_approx_distinct`` (HLL) and
``q_approx_quantile``: run the sketch at scale, bound-check it against
the exact twin at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = 256,
) -> DataFrame:
    """Approximate top-``k`` values of ``col`` via per-partition
    Misra–Gries summaries (≤ ``capacity`` counters each, batched
    decrement) merged by a grouped sum.

    Error bound: each partition undercounts any value by at most
    (partition rows)/``capacity``; merging preserves the bound, and
    every value with true frequency above Σ nᵖ/capacity is guaranteed
    present.  With ``capacity`` ≥ the distinct-value count no decrement
    ever fires and the counts are EXACT — that's the oracle-checkable
    regime; the under-capacity regime is the 100 TB path (fixed memory
    regardless of cardinality).

    The summary rows shuffled are ≤ partitions × capacity — independent
    of both row count and distinct count.
    """
    vtype = df.schema[col].dataType
    out_schema = T.StructType(
        [
            T.StructField("value", vtype),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts(dropna=True).items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                # batched Misra-Gries decrement: subtract the
                # (capacity+1)-th largest count from everyone and drop
                # the non-positive — keeps <= capacity counters and the
                # classic undercount bound (total decrement <= n/capacity)
                thresh = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    v: c - thresh for v, c in counters.items() if c > thresh
                }
        yield pd.DataFrame(
            {"value": list(counters), "cnt": list(counters.values())},
        )

    summaries = df.select(col).mapInPandas(summarize, out_schema)
    return (
        summaries.groupBy("value")
        .agg(F.sum("cnt").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col("value").asc())
        .limit(k)
    )


def hll_rollup(
    df: DataFrame,
    key_cols: list[str],
    unit_col,
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Distinct counting over arbitrary unit ranges WITHOUT rescanning
    raw data: build one DataSketches HLL sketch per (keys…, unit) —
    e.g. distinct users per event type per day — then answer the
    rolled-up question (distinct per key across ALL units) by UNIONING
    the unit sketches.

    This is the incremental-maintenance shape for distinct counts at
    100 TB: the per-unit sketch table is tiny (≤ 2^lgk bytes per row),
    persists like any table (binary column — see the round-trip test),
    appends new units without touching history, and any date-range
    distinct count is a union over the selected rows.  Both levels are
    mergeable aggregates: map-side partial sketches merge exactly like
    partial sums (union is associative + commutative), so neither
    aggregation shuffles raw values.

    Returns (keys…, n_units, n_union): unit count and the estimated
    distinct ``value_col`` across all units per key."""
    unit = unit_col if not isinstance(unit_col, str) else F.col(unit_col)
    per_unit = df.where(F.col(value_col).isNotNull()).groupBy(
        *key_cols, unit.alias("__unit")
    ).agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"))
    return per_unit.groupBy(*key_cols).agg(
        F.count("*").alias("n_units"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("bigint")
        .alias("n_union"),
    )


def quantile_col_names(quantiles) -> list[str]:
    """Column names for quantile estimates: ``q_`` + the quantile's
    decimal digits (``0.5 → q_50``, ``0.25 → q_25``, ``0.999 → q_999``,
    ``1.0 → q_100``), padded to ≥2 digits so the common two-decimal
    names stay stable.  Raises if the requested quantiles collide —
    Spark happily builds duplicate-named columns and downstream selects
    then fail ambiguously, so collide loudly here instead."""
    names = []
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")
        if q == 1.0:
            digits = "100"
        else:
            digits = f"{q:.10f}".rstrip("0").split(".")[1] or "0"
            digits = digits.ljust(2, "0")
        names.append(f"q_{digits}")
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"quantiles {list(quantiles)} produce colliding column names {sorted(dupes)}"
        )
    return names


def kll_rollup(
    df: DataFrame,
    key_cols: list[str],
    unit_col,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5,),
    k: int = 200,
) -> DataFrame:
    """Range-queryable QUANTILES without rescanning raw data — the
    quantile twin of :func:`hll_rollup`: one DataSketches KLL sketch of
    ``value_col`` per (keys…, unit), merged per key, then any quantile
    read off the merged sketch.

    Same incremental-maintenance story as the HLL table: the per-unit
    sketch rows are a few KB each (k = 200 ⇒ ~1.65 % normalized rank
    error at 99 % confidence), persist as a binary column, append new
    units without touching history, and a p50/p99 over any unit range is
    a merge over the selected rows.  Both aggregation levels are
    mergeable (KLL merge is associative), so partial aggregation applies
    and neither level shuffles raw values — at 100 TB the only full-data
    pass is the per-unit sketch build.

    Returns (keys…, n_units, n_rows, q_<pct> …) with one estimate column
    per requested quantile."""
    unit = unit_col if not isinstance(unit_col, str) else F.col(unit_col)
    per_unit = df.where(F.col(value_col).isNotNull()).groupBy(
        *key_cols, unit.alias("__unit")
    ).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias("sketch"),
        F.count("*").alias("n_rows"),
    )
    merged = F.kll_merge_agg_double("sketch")
    qcols = [
        F.kll_sketch_get_quantile_double(merged, F.lit(float(q))).alias(name)
        for q, name in zip(quantiles, quantile_col_names(quantiles))
    ]
    return per_unit.groupBy(*key_cols).agg(
        F.count("*").alias("n_units"),
        F.sum("n_rows").alias("n_rows"),
        *qcols,
    )


def theta_rollup(
    df: DataFrame,
    key_cols: list[str],
    unit_col,
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-(keys…, unit) DataSketches Theta sketch of ``value_col`` —
    the set-algebra-capable distinct sketch.  Unlike HLL, Theta sketches
    support INTERSECTION and DIFFERENCE, so a persisted per-unit sketch
    table answers audience-overlap questions (users active in unit A
    *and* unit B; in A but *not* B) without ever joining raw data.

    Below ~2^lgk distinct values the sketch stores the full hash set and
    estimates are EXACT — that is the oracle-checkable regime; above it
    the sketch samples and the relative error is ~1/√(2^lgk).  One
    sketch row per (keys…, unit); mergeable, so partial agg applies."""
    unit = unit_col if not isinstance(unit_col, str) else F.col(unit_col)
    return df.where(F.col(value_col).isNotNull()).groupBy(
        *key_cols, unit.alias("unit")
    ).agg(F.theta_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"))


def theta_overlap(
    sketches: DataFrame,
    key_cols: list[str],
    unit_a,
    unit_b,
) -> DataFrame:
    """Set algebra over a :func:`theta_rollup` table: per key, the
    distinct-count of unit A, unit B, A∩B (both) and A\\B (churned from
    A) — retention/churn straight off the sketch table.

    The join is sketch-row × sketch-row (|keys| rows a side, bytes per
    row); raw data is never touched, which is the point at 100 TB: the
    expensive full scan happened ONCE when the sketch table was built,
    and every subsequent overlap question is a metadata-scale join."""
    a = sketches.where(F.col("unit") == unit_a).select(
        *key_cols, F.col("sketch").alias("sk_a")
    )
    b = sketches.where(F.col("unit") == unit_b).select(
        *key_cols, F.col("sketch").alias("sk_b")
    )
    return _theta_estimates(a, b, key_cols)


def theta_span_overlap(sketches: DataFrame, key_cols: list[str]) -> DataFrame:
    """First-unit vs last-unit overlap per key off a :func:`theta_rollup`
    table — day-1 vs day-N retention without naming the dates: the unit
    bounds come from a broadcast 1-row MIN/MAX aggregate of the sketch
    table itself (metadata-scale — no driver collect, no raw-data
    scan)."""
    bounds = sketches.groupBy().agg(
        F.min("unit").alias("__lo"), F.max("unit").alias("__hi")
    )
    skb = sketches.crossJoin(F.broadcast(bounds))
    a = skb.where(F.col("unit") == F.col("__lo")).select(
        *key_cols, F.col("sketch").alias("sk_a")
    )
    b = skb.where(F.col("unit") == F.col("__hi")).select(
        *key_cols, F.col("sketch").alias("sk_b")
    )
    return _theta_estimates(a, b, key_cols)


def _theta_estimates(a: DataFrame, b: DataFrame, key_cols) -> DataFrame:
    # FULL OUTER on the key: a key whose users are all-new (no unit-A
    # sketch) or fully churned (no unit-B sketch) must still appear in
    # the retention report, with the missing side counted as the empty
    # set.  CASE WHEN short-circuits, so the theta set-algebra
    # expressions are never evaluated on a NULL sketch.
    est = F.theta_sketch_estimate
    sk_a, sk_b = F.col("sk_a"), F.col("sk_b")
    return a.join(b, list(key_cols), "full_outer").select(
        *key_cols,
        F.when(sk_a.isNull(), F.lit(0))
        .otherwise(est(sk_a).cast("bigint"))
        .alias("n_a"),
        F.when(sk_b.isNull(), F.lit(0))
        .otherwise(est(sk_b).cast("bigint"))
        .alias("n_b"),
        F.when(sk_a.isNull() | sk_b.isNull(), F.lit(0))
        .otherwise(
            est(F.theta_intersection(sk_a, sk_b)).cast("bigint")
        )
        .alias("n_both"),
        F.when(sk_a.isNull(), F.lit(0))
        .when(sk_b.isNull(), est(sk_a).cast("bigint"))
        .otherwise(est(F.theta_difference(sk_a, sk_b)).cast("bigint"))
        .alias("n_only_a"),
    )


def join_key_profile(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    lgk: int = 14,
) -> DataFrame:
    """Pre-flight JOIN PLANNING from two Theta sketches: distinct keys on
    each side, matched keys (intersection), and each side's unmatched
    keys — WITHOUT executing the join.  At 100 TB this is the question
    you ask before committing to a shuffle: "how many keys actually
    match, is one side's key set a subset, is this join worth bucketing"
    — answered by one sketch aggregation per side (a scan each, no
    shuffle beyond the 1-row partials) and set algebra on two sketch
    rows.

    Estimates are exact below 2^lgk distinct keys per side and ~1/√(2^lgk)
    relative error above.  The 1×1-row crossJoin is the scalar-broadcast
    pattern (nested-loop over a single broadcast row)."""
    sa = a.where(F.col(key_a).isNotNull()).agg(
        F.theta_sketch_agg(F.col(key_a), F.lit(lgk)).alias("sk_a")
    )
    sb = b.where(F.col(key_b).isNotNull()).agg(
        F.theta_sketch_agg(F.col(key_b), F.lit(lgk)).alias("sk_b")
    )
    est = F.theta_sketch_estimate
    return sa.crossJoin(sb).select(
        est(F.col("sk_a")).cast("bigint").alias("n_keys_a"),
        est(F.col("sk_b")).cast("bigint").alias("n_keys_b"),
        est(F.theta_intersection(F.col("sk_a"), F.col("sk_b")))
        .cast("bigint")
        .alias("n_matched"),
        est(F.theta_difference(F.col("sk_a"), F.col("sk_b")))
        .cast("bigint")
        .alias("n_only_a"),
        est(F.theta_difference(F.col("sk_b"), F.col("sk_a")))
        .cast("bigint")
        .alias("n_only_b"),
    )


def cms_build(
    df: DataFrame,
    col: str,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 1,
) -> DataFrame:
    """One Count–Min sketch of ``col`` as a 1-row binary frame —
    Spark's built-in mergeable CMS aggregate (map-side partials, a
    width×depth integer grid per partition, O(1/eps) memory regardless
    of cardinality)."""
    return df.where(F.col(col).isNotNull()).agg(
        F.count_min_sketch(
            F.col(col), F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias("cms")
    )


def cms_frequencies(
    df: DataFrame,
    col: str,
    items,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 1,
) -> DataFrame:
    """Point-frequency estimates for specific ``items`` without a
    groupBy: build the CMS in one pass (see :func:`cms_build`), pull the
    kilobyte-scale sketch to the driver, probe each item via the JVM
    sketch API, and re-emit (item, est_count) as a tiny frame.

    This is the "how often does THIS token/URL/user appear" query at
    100 TB: the only full-data work is the sketch aggregation; the probe
    is metadata-scale (the sketch is ~width×depth ints — the same
    collect-a-summary pattern as the ANN coarse quantizer).  CMS
    guarantee: estimates never undercount, and overcount by more than
    eps·N with probability < 1−confidence.  Deterministic for a fixed
    ``seed``."""
    sk = cms_build(df, col, eps, confidence, seed).collect()[0]["cms"]
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    jin = jvm.java.io.ByteArrayInputStream(bytes(sk))
    jsketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(jin)
    rows = [(it, int(jsketch.estimateCount(it))) for it in items]
    vtype = "string" if rows and isinstance(rows[0][0], str) else "bigint"
    return spark.createDataFrame(rows, f"item {vtype}, est_count bigint")


def grouped_heavy_hitters(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int = 10,
    capacity: int = 256,
) -> DataFrame:
    """Per-GROUP approximate top-``k`` (top tokens per source, top pages
    per country): one Misra–Gries summary per group per partition, merged
    by a grouped sum, ranked within each group.

    Same bound as :func:`heavy_hitters`, per group: a partition
    undercounts any value of group g by at most (g's partition rows)/
    ``capacity``, merging preserves it, and with ``capacity`` ≥ g's
    distinct values the counts are exact (the oracle regime).  Memory
    per partition is (groups present in partition) × ``capacity``
    counters — pre-repartitioning by group bounds it to
    capacity counters per task at the cost of one key shuffle; the
    default trades memory for zero shuffle on the data pass.

    Shuffled rows: ≤ partitions × groups × capacity summary rows — never
    the data."""
    gtype = df.schema[group_col].dataType
    vtype = df.schema[col].dataType
    out_schema = T.StructType(
        [
            T.StructField("grp", gtype),
            T.StructField("value", vtype),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def summarize(batches):
        import pandas as pd

        counters: dict = {}  # group -> {value: count}
        for pdf in batches:
            for (g, v), c in (
                pdf.groupby([group_col, col], dropna=True, sort=False)
                .size()
                .items()
            ):
                gc = counters.setdefault(g, {})
                gc[v] = gc.get(v, 0) + int(c)
                if len(gc) > capacity:
                    thresh = sorted(gc.values(), reverse=True)[capacity]
                    counters[g] = {
                        vv: cc - thresh for vv, cc in gc.items() if cc > thresh
                    }
        yield pd.DataFrame(
            [(g, v, c) for g, gc in counters.items() for v, c in gc.items()],
            columns=["grp", "value", "cnt"],
        )

    summaries = df.select(group_col, col).mapInPandas(summarize, out_schema)
    merged = summaries.groupBy("grp", "value").agg(
        F.sum("cnt").alias("est_count")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(
        F.col("est_count").desc(), F.col("value").asc()
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col),
            F.col("value"),
            "est_count",
            "rank",
        )
    )


# --------------------------------------------------------------------- #
# Bloom filter membership
# --------------------------------------------------------------------- #


def _bloom_positions(key, m: int, k: int):
    """The k bit positions of ``key``: md5-prefix 52-bit hashes of the
    seeded key, mod ``m`` — engine-portable (DuckDB reproduces the md5
    math bit-for-bit, unlike xxhash64)."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(key.cast("string"), F.lit(f"#bloom{i}"))),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % m
            )
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    m: int = 1 << 14,
    k: int = 5,
) -> DataFrame:
    """Build a Bloom filter over ``col`` as its SET BIT POSITIONS —
    one row per set bit, ≤ ``m`` rows total regardless of input size.

    The relational representation keeps the sketch mergeable and
    engine-portable: union two filters' rows and de-dup = bit-OR; a
    day's filter appends to history without rescanning it (same
    mergeability contract as the HLL/theta/KLL rollups).  Build cost is
    one scan + one ≤m-key shuffle (map-side combined to distinct
    positions).  Standard sizing: FPR ≈ (1 − e^{−k·n/m})^k; the default
    (m=16384, k=5) holds ~1% FPR to n ≈ 1.6k keys and degrades
    gracefully — callers size ``m`` to the expected distinct count.
    """
    if m < 2 or k < 1:
        raise ValueError(f"m must be >= 2 and k >= 1 (got m={m}, k={k})")
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(_bloom_positions(F.col(col), m, k)).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    col: str,
    m: int = 1 << 14,
    k: int = 5,
) -> DataFrame:
    """Probe a :func:`bloom_build` filter: a probe is ``maybe_present``
    iff ALL k of its bit positions are set (no false negatives; false
    positives at the sized FPR).

    The join is (probe bit, filter bit) on ≤ m distinct bits with the
    filter side broadcast (a full filter is ≤ m rows ≈ kilobytes) —
    probing a billion keys is one scan + one broadcast, no shuffle of
    the probe side.  Returns (value, maybe_present)."""
    pb = (
        probes.where(F.col(col).isNotNull())
        .select(
            F.col(col).alias("value"),
            F.explode(_bloom_positions(F.col(col), m, k)).alias("bit"),
        )
    )
    hits = (
        pb.join(F.broadcast(bloom.select("bit").distinct()), "bit", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("__hits"))
    )
    return (
        pb.groupBy("value")
        .agg(F.count("*").alias("__k"))
        .join(hits, "value", "left")
        .select(
            "value",
            (F.coalesce(F.col("__hits"), F.lit(0)) == F.col("__k")).alias(
                "maybe_present"
            ),
        )
    )
