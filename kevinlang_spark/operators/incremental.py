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


def apply_cdc(
    base: DataFrame,
    log: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Apply an insert/update/delete change log to a snapshot (the CDC
    merge every warehouse sync runs): per key, the HIGHEST-sequence log
    row wins; a delete op removes the key, anything else upserts the log
    row's payload.  ``log`` must carry the same columns as ``base`` plus
    ``seq_col`` and ``op_col``.

    Plan shape: winner election is one ``max_by`` aggregation on the key
    (map-side partial, one shuffle); untouched base rows survive through
    a left-anti join on the same key — co-partitioned with the election
    shuffle, so AQE coalesces them.  Nothing global, no window over the
    whole log, ties on seq broken by op then payload bytes are the
    caller's contract (sequence numbers should be unique per key)."""
    payload = [c for c in base.columns]
    winner = log.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload if c not in key_cols], F.col(op_col)),
            F.col(seq_col),
        ).alias("w")
    )
    survivors = winner.where(F.col(f"w.{op_col}") != delete_op).select(
        *key_cols, *[F.col(f"w.{c}") for c in payload if c not in key_cols]
    )
    untouched = base.join(winner.select(*key_cols), key_cols, "left_anti")
    return untouched.unionByName(survivors)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Reconcile two snapshots of the same table: per-key rows labelled
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` — the audit
    every incremental load runs before promoting a new snapshot.

    ONE full outer join on the key (both sides shuffle by the same key,
    nothing else moves); the change classification is a scan-stage
    expression over null-safe column comparisons, so column count adds
    expression width, not passes.  Per-column difference flags come
    back as a ``changed_cols`` array for drill-down.  NULL-vs-NULL in a
    compared column counts as equal (null-safe <=>), matching what a
    key-preserving reload should report.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) - set(key_cols)
        ]
    o = old.select(
        *[F.col(c).alias(c) for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(c) for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    diff_flags = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    ) if compare_cols else F.array().cast("array<string>")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size("__diff") > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("__diff", diff_flags)
        .select(
            *key_cols,
            status.alias("status"),
            F.when(
                F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(),
                F.col("__diff"),
            ).alias("changed_cols"),
        )
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One-row rollup of ``snapshot_diff``: counts per status — the
    number every reconciliation dashboard actually plots.  The grouped
    count folds map-side; the join output never leaves the executors."""
    d = snapshot_diff(old, new, key_cols, compare_cols)
    return (
        d.groupBy("status")
        .agg(F.count("*").alias("n"))
    )


def schema_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Schema drift report between two snapshots: one row per column
    that was added, removed, or changed type — the metadata companion to
    ``snapshot_diff`` (which compares ROWS).  Pure driver-side metadata
    (schemas are tiny; no data is read), returned as a DataFrame so it
    composes with quality gates and sinks like any other report.

    ``change``: 'added' (only in b), 'removed' (only in a),
    'type_changed' (both, different dataType; nullability changes are
    reported as type_changed too — a NOT NULL promise disappearing is
    exactly the drift an ingestion gate must catch)."""
    fa = {f.name: f for f in a.schema.fields}
    fb = {f.name: f for f in b.schema.fields}
    rows = []
    for name in sorted(fa.keys() | fb.keys()):
        in_a, in_b = name in fa, name in fb
        if in_a and not in_b:
            rows.append((name, "removed", fa[name].dataType.simpleString(), None))
        elif in_b and not in_a:
            rows.append((name, "added", None, fb[name].dataType.simpleString()))
        elif (
            fa[name].dataType != fb[name].dataType
            or fa[name].nullable != fb[name].nullable
        ):
            sa = fa[name].dataType.simpleString() + (
                "" if fa[name].nullable else " not null"
            )
            sb = fb[name].dataType.simpleString() + (
                "" if fb[name].nullable else " not null"
            )
            rows.append((name, "type_changed", sa, sb))
    return a.sparkSession.createDataFrame(
        rows, "column string, change string, old_type string, new_type string"
    )


def join_delta(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Incremental JOIN maintenance: the delta of an inner join under
    inserts to both sides —

        (A∪dA) ⋈ (B∪dB)  −  A ⋈ B   =   dA⋈B  ∪  A⋈dB  ∪  dA⋈dB

    Appending these rows to the stored A⋈B view keeps it exactly equal
    to a full recompute (pytest pins the invariant) without ever
    re-joining the historical sides.

    Scale shape: the whole point at 100 TB is that the three terms each
    touch at most ONE full-size table, always against a delta-sized
    side.  With ``broadcast_deltas`` (default) the delta sides broadcast,
    so no base table is shuffled at all — maintenance cost is two base
    scans + a delta×delta join.  Partition the bases by ingest date (or
    bucket by the join key) and the scans prune further.  Deletes are
    handled upstream as CDC retractions (``apply_cdc``) before the
    bases/deltas reach this algebra."""
    on = [on] if isinstance(on, str) else list(on)
    wrap = F.broadcast if broadcast_deltas else (lambda d: d)
    d1 = wrap(da).join(b_old, on)
    d2 = a_old.join(wrap(db), on)
    d3 = wrap(da).join(db, on)
    return d1.unionByName(d2).unionByName(d3)
