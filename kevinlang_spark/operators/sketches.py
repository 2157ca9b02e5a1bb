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
