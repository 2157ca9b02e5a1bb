"""Aggregator library — Spark-native equivalents of the reference's
aggregators (reference src/Data/DataFrame/Aggregator.hs:1-24).

Each aggregator is a function ``(value_col, idx_col|None) -> Column`` so that
order-sensitive aggregators (``concat``) can use the frame's order column.
All of these are JVM-side built-ins — they participate in partial (map-side)
aggregation and whole-stage codegen; no Python crosses the hot path.

Reference parity notes:
- ``count`` returns a float in the reference (Aggregator.hs:12-13) → cast.
- ``variance``/``sd`` are *population* (no n-1) (Aggregator.hs:15-21) →
  ``var_pop``/``stddev_pop``, NOT the sample variants.
- ``concat`` concatenates strings in frame order (Aggregator.hs:23-24) →
  collect (idx, value) structs, sort by idx, join. collect_list is fine here
  because concat is a presentation-scale aggregator; at 100 TB you would cap
  group size upstream.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

AggFn = Callable[[Column, Optional[Column]], Column]


def agg_sum(col: Column, idx: Column | None = None) -> Column:
    return F.sum(col)


def agg_mean(col: Column, idx: Column | None = None) -> Column:
    return F.avg(col)


def agg_count(col: Column, idx: Column | None = None) -> Column:
    # reference count returns RealFloat (Aggregator.hs:12-13)
    return F.count(col).cast("double")


def agg_variance(col: Column, idx: Column | None = None) -> Column:
    return F.var_pop(col)


def agg_sd(col: Column, idx: Column | None = None) -> Column:
    return F.stddev_pop(col)


def agg_concat(col: Column, idx: Column | None = None) -> Column:
    if idx is None:
        # unordered mode: fall back to deterministic value order
        return F.array_join(F.array_sort(F.collect_list(col)), "")
    pairs = F.array_sort(F.collect_list(F.struct(idx.alias("i"), col.alias("v"))))
    return F.array_join(F.transform(pairs, lambda s: s["v"]), "")


def agg_median(col: Column, idx: Column | None = None) -> Column:
    return F.median(col)


def agg_min(col: Column, idx: Column | None = None) -> Column:
    return F.min(col)


def agg_max(col: Column, idx: Column | None = None) -> Column:
    return F.max(col)


def agg_count_distinct(col: Column, idx: Column | None = None) -> Column:
    return F.count_distinct(col).cast("double")


#: name → (aggregator, required column kind).  The kind reproduces the
#: reference's PolyParam dispatch (Combinator.hs:122-156): its numeric
#: aggregators (incl. count! see test/Spec.lhs:89) only type-check against
#: numeric columns and raise "invalid type" otherwise; ``concat`` is the one
#: String aggregator.  'any' = our own kind-agnostic extensions.
REGISTRY: dict[str, tuple[AggFn, str]] = {
    "sum": (agg_sum, "numeric"),
    "mean": (agg_mean, "numeric"),
    "avg": (agg_mean, "numeric"),
    "count": (agg_count, "numeric"),
    "variance": (agg_variance, "numeric"),
    "var": (agg_variance, "numeric"),
    "sd": (agg_sd, "numeric"),
    "stddev": (agg_sd, "numeric"),
    "concat": (agg_concat, "string"),
    "median": (agg_median, "numeric"),
    "min": (agg_min, "any"),
    "max": (agg_max, "any"),
    "count_distinct": (agg_count_distinct, "any"),
}


def resolve(agg) -> tuple[AggFn, str]:
    """Resolve an aggregator spec: registry name or (col, idx)->Column
    callable.  Returns (fn, required_kind)."""
    if isinstance(agg, str):
        try:
            return REGISTRY[agg]
        except KeyError:
            raise ValueError(
                f"unknown aggregator {agg!r}; known: {sorted(REGISTRY)}"
            ) from None
    if callable(agg):
        return agg, "any"
    raise TypeError(f"invalid aggregator: {agg!r}")
