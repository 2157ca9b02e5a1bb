"""Incremental aggregate maintenance (materialized-view refresh).

At 100 TB you never re-aggregate history to absorb a day of new data:
you keep a per-key STATE table of mergeable partial aggregates
(count/sum/min/max — avg derives as sum/n) and fold each delta batch
into it.  ``aggregate_delta`` builds the state from rows;
``merge_states`` combines two state tables (yesterday's state + the
delta's state) with ONE key shuffle over state-sized inputs; the
invariant ``merge(state(A), state(B)) == state(A ∪ B)`` is what makes
the refresh exact, and is what the oracle checks (incremental path vs
direct full aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n", "sum_v", "min_v", "max_v")


def aggregate_delta(
    rows: DataFrame, keys: list[str] | tuple[str, ...], value_col: str
) -> DataFrame:
    """Rows → per-key mergeable state (one map-side-combined shuffle)."""
    v = F.col(value_col).cast("double")
    return rows.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_states(
    state: DataFrame, delta: DataFrame, keys: list[str] | tuple[str, ...]
) -> DataFrame:
    """Fold a delta state into an existing state: union + grouped merge —
    one key shuffle over two STATE-sized (not history-sized) inputs.
    Keys present in only one side pass through unchanged."""
    keys = list(keys)
    u = state.select(*keys, *STATE_COLS).unionByName(
        delta.select(*keys, *STATE_COLS)
    )
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame, decimals: int = 4) -> DataFrame:
    """State → presentation aggregates (adds the derived mean)."""
    return state.select(
        *[c for c in state.columns if c not in STATE_COLS],
        F.col("n"),
        F.round("sum_v", decimals).alias("sum_v"),
        F.col("min_v"),
        F.col("max_v"),
        F.round(F.col("sum_v") / F.col("n"), decimals).alias("avg_v"),
    )
