"""Skew mitigation: salted two-stage aggregation and salted joins.

At 100 TB a handful of hot keys (one viral document source, one bot
user) concentrate a shuffle partition onto one reducer and stall the
stage.  Two classical remedies, both pure DataFrame compositions:

- **Salted aggregation** — append a random salt to the key, pre-aggregate
  on (key, salt) so each hot key's rows are spread over ``n_salts``
  reducers, then finish on the key alone.  Works for any ALGEBRAIC
  aggregate (one whose partial states merge: sum/count/min/max, and
  mean via sum+count decomposition).  The result is bit-identical to the
  unsalted plan for sum/count/min/max.
- **Salted join** — salt the skewed side's key randomly, replicate the
  small side once per salt value, join on (key, salt).  Output rows are
  exactly the plain join's (salt only routes them).

AQE's runtime skew-join splitting (``spark.sql.adaptive.skewJoin``) makes
the manual join variant a fallback for when statistics mislead AQE or the
skew is in an aggregation (which AQE does not split); both forms are here
so a pipeline can choose explicitly.

No counterpart in /root/reference (839-LoC single-node list engine —
skew cannot exist there); this is SURVEY §4.2's scale work.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregates whose partial states merge with themselves
_MERGEABLE = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Two-stage skew-safe aggregation: ``aggs`` maps output column name →
    (agg, input column) with agg in sum/count/min/max/mean/avg.

    Stage 1 groups by (keys…, salt) — the hot key fans out over
    ``n_salts`` reducers; stage 2 merges the ≤ n_salts partial rows per
    key.  mean is decomposed into sum+count and recombined, so it merges
    exactly.  Both stages keep map-side partial aggregation; total cost
    is one extra (tiny) shuffle of n_salts·|keys| rows.
    """
    keys = list(keys)
    salt = (F.rand(seed) * n_salts).cast("int").alias("__salt")

    partial_cols: list[Column] = []
    final_cols: list[Column] = []
    for out_name, (agg, col) in aggs.items():
        if agg in ("mean", "avg"):
            partial_cols.append(F.sum(col).alias(f"__s_{out_name}"))
            partial_cols.append(F.count(col).alias(f"__c_{out_name}"))
            final_cols.append(
                (F.sum(f"__s_{out_name}") / F.sum(f"__c_{out_name}")).alias(out_name)
            )
        elif agg in _MERGEABLE:
            partial_cols.append(_MERGEABLE[agg](col).alias(f"__p_{out_name}"))
            merge = F.sum if agg in ("sum", "count") else _MERGEABLE[agg]
            final_cols.append(merge(f"__p_{out_name}").alias(out_name))
        else:
            raise ValueError(
                f"salted_agg: non-mergeable aggregate {agg!r} "
                "(supported: sum, count, min, max, mean/avg)"
            )

    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_cols)
    return partial.groupBy(*keys).agg(*final_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 7,
) -> DataFrame:
    """Skew-safe equi join: the (big, skewed) ``left`` gets a random salt
    per row; ``right`` is replicated once per salt value via a tiny
    ``explode(sequence(...))`` — no row of ``right`` is shuffled more than
    n_salts times — and the join runs on (on…, salt).  Row-identical to
    the plain join for inner/left joins (salt only routes rows to
    reducers; every (key, salt) pair on the left finds its replicated
    right partner).
    """
    from kevinlang_spark.sources.sinks import explode_salt

    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left (got {how!r})")
    on = [on] if isinstance(on, str) else list(on)
    l = left.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    return l.join(explode_salt(right, n_salts), on + ["__salt"], how).drop("__salt")
