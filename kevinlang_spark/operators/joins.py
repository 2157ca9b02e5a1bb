"""Join operators beyond the reference's positional zip join.

The reference lists relational joins as future work (TODO:2); plain
equi/theta joins come free with Spark (`KevinFrame.merge`).  This module
adds the two join shapes Spark has no native operator for, each built
scale-first:

- **as-of join** (latest right row at-or-before each left row per key):
  realized as union + window, ONE shuffle on the join key — not a range
  join, not a per-key collect.  This is the merge-asof of time-series
  stores, used for "attach the prevailing quote to each trade".
- **range join** (left rows matched to right intervals): realized with
  coarse time-bin bucketing so the physical join is an EQUI join on
  (key, bin) with a residual range filter — Catalyst would otherwise
  fall back to BroadcastNestedLoopJoin, which dies at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach one right row within the same ``on``
    key by timestamp proximity — the pandas ``merge_asof`` direction
    family:

    - ``backward`` (default): greatest ``right_ts <= left_ts`` (DuckDB
      ``ASOF JOIN`` semantics);
    - ``forward``: smallest ``right_ts >= left_ts``;
    - ``nearest``: whichever of the two is closer in absolute time,
      ties to the BACKWARD match (the pandas convention).

    Implementation: tag and union both sides, then one window per key
    ordered by (ts, side) carrying ``last(right_value, ignoreNulls)`` —
    a single hash-partition shuffle on the key, sorted within
    partitions.  ``forward`` is the mirror image (descending scan);
    ``nearest`` evaluates both windows over the SAME partitioning (one
    exchange, two in-partition sorts) and picks per row.  No per-key
    collect, no range explosion; skewed keys are split by AQE.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    if not right_cols:
        # a right frame of only (key, ts) still has a meaningful as-of
        # answer — the matched row's timestamp; F.struct() with zero
        # fields would raise, so carry the timestamp itself
        right_cols = [right_ts]
    out_names = {c: f"{c}{suffix}" if c in left.columns else c for c in right_cols}

    # the carried struct leads with the matched right timestamp so
    # `nearest` can compare distances; it is stripped on output.  The
    # leading field is constant among equal-(key, ts) right rows, so
    # the deterministic struct tie-break is unchanged.
    rv_fields = lambda: [F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]]  # noqa: E731
    l = left.select(
        F.lit(1).alias("__side"),
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*rv_fields()).alias("s")).schema["s"].dataType
        ).alias("__rval"),
    )
    r = right.select(
        F.lit(0).alias("__side"),
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*rv_fields()).alias("__rval"),
    )
    # right rows sort before left rows at equal ts (__side 0 < 1) so an
    # exactly-simultaneous right row IS visible to the left row (<= / >=);
    # __rval as the final key makes ties among equal-(key, ts) right rows
    # deterministic (struct ordering) instead of partition-layout-dependent
    def scan(desc: bool):
        ts = F.col("__ts").desc() if desc else F.col("__ts").asc()
        return (
            Window.partitionBy("__key")
            .orderBy(ts, F.col("__side").asc(), F.col("__rval").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    unioned = l.unionByName(r)
    if direction == "backward":
        unioned = unioned.withColumn(
            "__pick", F.last("__rval", ignorenulls=True).over(scan(False))
        )
    elif direction == "forward":
        unioned = unioned.withColumn(
            "__pick", F.last("__rval", ignorenulls=True).over(scan(True))
        )
    else:
        unioned = (
            unioned.withColumn(
                "__b", F.last("__rval", ignorenulls=True).over(scan(False))
            )
            .withColumn(
                "__f", F.last("__rval", ignorenulls=True).over(scan(True))
            )
            .withColumn(
                "__pick",
                F.when(F.col("__b").isNull(), F.col("__f"))
                .when(F.col("__f").isNull(), F.col("__b"))
                .when(
                    # ties to backward: strictly-closer forward required
                    (F.col("__f")["__rts"] - F.col("__ts"))
                    < (F.col("__ts") - F.col("__b")["__rts"]),
                    F.col("__f"),
                )
                .otherwise(F.col("__b")),
            )
        )
    out = unioned.where(F.col("__side") == 1).select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col("__pick")[c].alias(out_names[c]) for c in right_cols],
    )
    return out


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Join points to intervals containing them (``start <= t < end``),
    optionally within an equi key.

    Each interval is exploded to the coarse time bins it overlaps; points
    map to one bin — the physical join is then an EQUI join on
    (key, bin) + residual filter, so Catalyst picks a shuffled hash join
    instead of a nested-loop cross product.  ``bin_seconds`` trades
    duplication (long intervals → more bins) against candidate precision.
    """
    p_bin = (F.unix_timestamp(F.col(point_ts)) / bin_seconds).cast("long")
    i_lo = (F.unix_timestamp(F.col(start_ts)) / bin_seconds).cast("long")
    i_hi = (F.unix_timestamp(F.col(end_ts)) / bin_seconds).cast("long")

    # qualified refs: the residual filter must stay unambiguous even when
    # both frames carry same-named columns (e.g. both have a 'ts')
    p = points.withColumn("__bin", p_bin).alias("p")
    i = intervals.withColumn("__bin", F.explode(F.sequence(i_lo, i_hi))).alias("i")
    keys = ["__bin"] + ([on] if on else [])
    cond = (F.col(f"p.{point_ts}") >= F.col(f"i.{start_ts}")) & (
        F.col(f"p.{point_ts}") < F.col(f"i.{end_ts}")
    )
    return p.join(i, on=keys, how="inner").where(cond).drop("__bin")


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str] | tuple[str, ...] = ("id",),
) -> DataFrame:
    """Batch MERGE/upsert: rows from ``updates`` replace same-key rows in
    ``base``; unmatched update rows insert; unmatched base rows persist.

    Realized as union + one grouped ``max_by`` — a SINGLE key shuffle with
    map-side partial aggregation, instead of the outer-join formulation
    (two shuffled inputs + join + coalesce per column).  This is the
    warehouse CDC-apply shape: at 100 TB the one-shuffle union form also
    handles update-heavy batches without skew amplification, and writing
    the result partitioned by the key range gives an idempotent sink.

    Both inputs must be key-unique (the standard MERGE precondition);
    duplicate keys *within* ``updates`` would make the winner arbitrary.
    Schemas must match by name (``unionByName``).
    """
    keys = list(keys)
    payload = [c for c in base.columns if c not in keys]
    tagged = base.select(*base.columns, F.lit(0).alias("__pr")).unionByName(
        updates.select(*base.columns, F.lit(1).alias("__pr"))
    )
    row = F.max_by(F.struct(*payload), F.col("__pr")).alias("__r")
    return tagged.groupBy(*keys).agg(row).select(*keys, "__r.*")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
) -> DataFrame:
    """Edit-distance join: pairs with ``levenshtein(l, r) <= d`` —
    fuzzy entity matching / typo-tolerant dedup.

    Never all-pairs: levenshtein ≤ d implies the lengths differ by ≤ d,
    so rows are blocked into length buckets of width ``d+1`` and each
    LEFT row additionally probes its two neighbor buckets (explode ×3).
    Any qualifying pair then shares a bucket key, the physical join is a
    hash equi-join on the bucket, and the exact distance is the residual
    filter.  Candidate volume is Σ per-bucket |L|·|R| — governed by the
    length distribution, not n².
    """
    lb = (F.length(F.col(left_col)) / (max_distance + 1)).cast("long")
    rb = (F.length(F.col(right_col)) / (max_distance + 1)).cast("long")
    l = left.select(
        F.col(left_id).alias("left_id"),
        F.col(left_col).alias("__l"),
        F.explode(
            F.array(lb - 1, lb, lb + 1)
        ).alias("__bucket"),
    )
    r = right.select(
        F.col(right_id).alias("right_id"),
        F.col(right_col).alias("__r"),
        rb.alias("__bucket"),
    )
    # no pair dedup needed: the right side carries ONE bucket per row,
    # so a qualifying pair meets on exactly one bucket key
    return (
        l.join(r, "__bucket")
        .where(
            (
                F.abs(F.length("__l") - F.length("__r"))
                <= F.lit(max_distance)
            )
            & (F.levenshtein("__l", "__r") <= F.lit(max_distance))
        )
        .select(
            "left_id",
            "right_id",
            F.levenshtein("__l", "__r").alias("distance"),
        )
    )


def resample_ffill(
    df: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: int = 3600,
) -> DataFrame:
    """Regularize an event stream onto a fixed ``step``-second grid per
    key, forward-filling the last observed value (time-series resampling
    with gap fill — the feature-store/training-window shape).

    Events are first collapsed to one row per (key, second) so the as-of
    match is unambiguous; each key's grid spans its own [min, max]
    (floor-aligned), built with ``sequence``+``explode`` — per-key work,
    no global structure.  The fill itself is ``asof_join`` (union + one
    key-shuffle window), so the whole operator is two key shuffles
    regardless of scale; grid size is bounded by span/step per key.
    Grid points before a key's first event keep NULL.
    """
    ev = (
        df.select(
            F.col(on),
            F.col(ts_col).cast("long").alias("__ets"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(on, "__ets")
        .agg(F.max("__v").alias(value_col))
    )
    lo = (F.floor(F.min("__ets") / step) * step).cast("long")
    hi = (F.floor(F.max("__ets") / step) * step).cast("long")
    grid = (
        ev.groupBy(on)
        .agg(lo.alias("__lo"), hi.alias("__hi"))
        .select(
            on,
            F.explode(
                F.sequence("__lo", "__hi", F.lit(step).cast("long"))
            ).alias("grid_ts"),
        )
    )
    out = asof_join(
        grid,
        ev.select(on, F.col("__ets"), F.col(value_col)),
        on=on,
        left_ts="grid_ts",
        right_ts="__ets",
        right_cols=[value_col],
    )
    return out.select(on, "grid_ts", value_col)


def keyfilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """Big-to-big join with an explicit build-side key pre-filter: the
    (already filtered) dim side's distinct keys broadcast as a LEFT SEMI
    join against the fact side BEFORE the real join, so fact rows that
    cannot match never enter the join shuffle.

    This is the hand-rolled form of runtime filtering ("sideways
    information passing"): at 100 TB the fact-side shuffle dominates, and
    a selective dim predicate means most fact rows shuffle only to be
    dropped.  The distinct-key set is usually orders of magnitude smaller
    than the dim payload, so it broadcasts even when the dim itself can't.
    Catalyst's native version (spark.sql.optimizer.runtime.bloomFilter.*)
    injects a Bloom filter instead of an exact key set — same plan shape,
    constant memory; `runtime_bloom_configs()` below returns the knobs and
    tests/test_round4_ops.py gates the injected plan.  Use this explicit
    form when the key set is known-small or the engine's runtime filtering
    is disabled.
    """
    keys = F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct())
    pruned = fact.join(keys, fact_key, "leftsemi")
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)


def runtime_bloom_configs(application_side_bytes: int = 0) -> dict[str, str]:
    """Session configs that let Catalyst inject its runtime Bloom filter
    (InjectRuntimeFilter) for selective shuffle joins.  The defaults gate
    on a ≥10 GB application-side scan — correct on a cluster, never true
    at test scale — so tests lower the scan threshold to observe the
    `might_contain` filter in the optimized plan."""
    return {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": str(
            application_side_bytes
        ),
    }


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    bin_size: int,
    a_start: str = "start",
    a_end: str = "end",
    b_start: str = "start",
    b_end: str = "end",
) -> DataFrame:
    """Interval × interval overlap join per key (half-open [start, end)
    semantics) as an EQUI join — never a nested loop.

    Each interval explodes to every ``bin_size`` bucket it touches; the
    join keys on (key, bin).  A pair that shares several buckets would
    match repeatedly, so the residual predicate keeps only the pair's
    CANONICAL bucket — the one holding max(a.start, b.start) — which
    both dedups without a distinct shuffle and implies the overlap test
    on that side.  Output: the paired rows' columns prefixed a_/b_.

    Scale: shuffle size = rows × (interval_span / bin_size); pick
    ``bin_size`` near the typical span so explosion stays O(1) per row.
    Same family as range_join_binned above (point × interval)."""
    def binned(df, start, end, prefix):
        cols = [F.col(c).alias(f"{prefix}{c}") for c in df.columns]
        return df.select(
            *cols,
            F.col(key).alias(f"__{prefix}key"),
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / bin_size),
                    F.floor((F.col(end) - 1) / bin_size),
                )
            ).alias(f"__{prefix}bin"),
        )

    al = binned(a, a_start, a_end, "a_")
    bl = binned(b, b_start, b_end, "b_")
    canon = F.floor(
        F.greatest(F.col(f"a_{a_start}"), F.col(f"b_{b_start}")) / bin_size
    )
    return (
        al.join(
            bl,
            (F.col("__a_key") == F.col("__b_key"))
            & (F.col("__a_bin") == F.col("__b_bin")),
        )
        .where(
            (F.col("__a_bin") == canon)
            & (F.col(f"a_{a_start}") < F.col(f"b_{b_end}"))
            & (F.col(f"b_{b_start}") < F.col(f"a_{a_end}"))
        )
        .drop("__a_key", "__b_key", "__a_bin", "__b_bin")
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    dim_cols: list[str] | None = None,
    suffix: str = "_dim",
) -> DataFrame:
    """Point-in-time enrichment against an SCD2 dimension: each fact row
    gets the dimension attributes of the version valid AT its timestamp
    (``valid_from <= ts`` and ``valid_to`` NULL-or-``> ts``) — the
    feature-store join that prevents time-travel leakage (reading an
    attribute value that didn't exist yet).

    Built on ``asof_join`` (backward as-of on ``valid_from``): one key
    shuffle, no range explosion.  The as-of match is then gated by
    ``valid_to`` — with a contiguous ``scd2_build`` dimension the gate
    only fires for facts BEFORE a key's first version or after a
    retired key's last, where the attributes must be NULL, not the
    stale last version (left-join semantics: the fact row survives
    either way)."""
    if dim_cols is None:
        dim_cols = [
            c for c in dim.columns
            if c not in (on, valid_from, valid_to, "is_current")
        ]
    carried = dim_cols + [valid_to]
    out = asof_join(
        facts,
        dim.select(on, valid_from, *carried),
        on,
        left_ts=fact_ts,
        right_ts=valid_from,
        right_cols=carried,
        suffix=suffix,
    )
    vt_out = f"{valid_to}{suffix}" if valid_to in facts.columns else valid_to
    valid = F.col(vt_out).isNull() | (F.col(vt_out) > F.col(fact_ts))
    sel = [F.col(c) for c in facts.columns]
    for c in dim_cols:
        name = f"{c}{suffix}" if c in facts.columns else c
        sel.append(F.when(valid, F.col(name)).alias(name))
    return out.select(*sel)


def resample_lerp(
    df: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: int = 3600,
) -> DataFrame:
    """Grid resampling with LINEAR interpolation between the surrounding
    observations (the companion to ``resample_ffill`` for continuous
    signals, where a step function distorts trends).

    Same per-key [min, max] grid as ``resample_ffill``; both neighbors
    are found in ONE union + one key-shuffle sort carrying two window
    passes over the same ordering (backward last-observation, forward
    first-observation) — Catalyst reuses the single Exchange+Sort, so
    the operator costs the same one key shuffle as the as-of fill, never
    a range join.  Policy: before a key's first event → NULL, after its
    last → forward-fill of the final value, exact grid hits → the
    observed value (the interpolation weight degenerates to 0).
    """
    ev = (
        # NULL observations are dropped up front: a kept NULL would split
        # the (pv, pt) neighbor pair across different events
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(on),
            F.col(ts_col).cast("long").alias("__t"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy(on, "__t")
        .agg(F.max("__v").alias("__v"))
    )
    lo = (F.floor(F.min("__t") / step) * step).cast("long")
    hi = (F.floor(F.max("__t") / step) * step).cast("long")
    grid = (
        ev.groupBy(on)
        .agg(lo.alias("__lo"), hi.alias("__hi"))
        .select(
            on,
            F.explode(
                F.sequence("__lo", "__hi", F.lit(step).cast("long"))
            ).alias("__t"),
        )
        .select(on, "__t", F.lit(None).cast("double").alias("__v"),
                F.lit(1).alias("__side"))
    )
    u = ev.select(on, "__t", "__v", F.lit(0).alias("__side")).unionByName(grid)
    # events sort BEFORE grid points at equal ts (side 0 < 1): an exact
    # hit is the backward neighbor, and the interpolation weight
    # (t - pt)/(nt - pt) is then exactly 0 — no special case needed
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ev_t = F.when(F.col("__side") == 0, F.col("__t"))
    withn = (
        u.withColumn("__pv", F.last("__v", ignorenulls=True).over(w_back))
        .withColumn("__pt", F.max(ev_t).over(w_back))
        .withColumn("__nv", F.first("__v", ignorenulls=True).over(w_fwd))
        .withColumn("__nt", F.min(ev_t).over(w_fwd))
    )
    pv, pt, nv, nt = (F.col(c) for c in ("__pv", "__pt", "__nv", "__nt"))
    t = F.col("__t")
    value = (
        F.when(pt.isNull(), F.lit(None).cast("double"))
        .when(nt.isNull(), pv)
        .when(nt == pt, pv)
        .otherwise(pv + (nv - pv) * (t - pt) / (nt - pt))
    )
    return withn.where(F.col("__side") == 1).select(
        F.col(on),
        t.alias("grid_ts"),
        value.alias(value_col),
    )
