"""Event-stream analytics operators (SCD2, funnels, transitions).

The reference has no temporal operators at all; these are the
warehouse/product-analytics shapes an event table needs at scale.  Every
operator is one key-partitioned window or one grouped aggregation — no
global windows, no driver state, no self-joins on the fact table — so
each is a single key shuffle regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str] | tuple[str, ...],
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change log:
    one row per (key, change) with ``valid_from`` / ``valid_to`` /
    ``is_current``, where ``valid_to`` is the next change's timestamp
    (NULL while current).

    Simultaneous changes (equal key+ts) are collapsed first to the
    max-value row so intervals are well-defined; consecutive rows that
    repeat the same value are NOT collapsed (faithful change history —
    callers can pre-dedup if they want value-change-only rows).  The
    whole build is ONE hash shuffle on the key: the collapse groupBy and
    the ``lead`` window share the key partitioning, so AQE plans them
    into the same exchange.
    """
    vals = list(value_cols)
    # one explicit key-only shuffle: HashPartitioning(key) satisfies BOTH
    # the (key, ts) collapse's clustered requirement and the lead
    # window's — letting groupBy pick its own partitioning would hash on
    # (key, ts) and force a second exchange for the window
    collapsed = (
        changes.select(key, F.col(ts_col).alias("valid_from"), *vals)
        .repartition(F.col(key))
        .groupBy(key, "valid_from")
        .agg(*[F.max(v).alias(v) for v in vals])
    )
    w = Window.partitionBy(key).orderBy("valid_from")
    return collapsed.select(
        key,
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        *vals,
    ).withColumn("is_current", F.col("valid_to").isNull())


def funnel_counts(
    events: DataFrame,
    steps: list[str] | tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel reach: for each step i, the number of users with an
    ordered occurrence of steps[0..i] (step i at-or-after their first
    qualifying step i-1; ties at equal timestamps count as ordered).

    Per-user cumulative-flag windows (rows unbounded-preceding → current)
    mark rows that extend the funnel, then one grouped count-distinct per
    step — a single key shuffle on the user plus a tiny aggregation, no
    per-step self-joins (the classic funnel query joins the fact table
    once per step, which is k full shuffles at scale).
    """
    steps = list(steps)
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.select(user_col, ts_col, type_col, "event_id")
    # qual_i: this row completes an ordered prefix steps[0..i].  The
    # cumulative max over qual_{i-1} (including the current row) makes
    # "at-or-after" exact: a step-i row at the same ts as its step-(i-1)
    # row still qualifies because the window is ordered (ts, event_id)
    # and includes the current row.
    prev = None
    for i, s in enumerate(steps):
        is_step = (F.col(type_col) == s).cast("int")
        qual = is_step if prev is None else is_step * F.max(prev).over(w)
        df = df.withColumn(f"__q{i}", qual)
        prev = F.col(f"__q{i}")
    # per-user reach flags share the window's hash partitioning (no second
    # shuffle), then a scalar sum — avoids the Expand plan that multiple
    # count-distincts would trigger
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"__q{i}").alias(f"__q{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[F.sum(f"__q{i}").alias(f"__n{i}") for i in range(len(steps))]
    )
    # one tiny row out; unpivot to (step, step_name, n_users)
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step"),
                        F.lit(s).alias("step_name"),
                        F.col(f"__n{i}").alias("n_users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.step", "r.step_name", "r.n_users")


def merge_intervals(
    intervals: DataFrame,
    key: str,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Gaps-and-islands: merge overlapping/adjacent intervals per key
    into maximal islands — (key, island_start, island_end, n_merged).

    The classic formulation: an interval starts a new island iff its
    start exceeds the running max of all previous ends (cumulative max
    window, EXCLUSIVE of the current row — an interval contained in its
    predecessor must not break the island).  Island ids are the running
    count of island-breaks; the final rollup groups (key, island).  Both
    windows and the groupBy hash on the key → ONE shuffle total.
    """
    w = Window.partitionBy(key).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_break = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(is_break).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        intervals.withColumn("__island", island)
        .groupBy(key, "__island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count("*").alias("n_merged"),
        )
        .drop("__island")
    )


def time_weighted_avg(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average per key (TWAP): each observation is weighted
    by how long it remained current (until the next observation), i.e.
    ``Σ vᵢ·(tᵢ₊₁-tᵢ) / (t_last - t_first)``.  The plain AVG over-weights
    bursts of rapid updates; TWAP is the metrics/financial answer.

    One lead window and the per-key aggregation share the key hash
    partitioning — ONE shuffle.  Keys with a single observation (no
    holding period) return that value.  Ties at equal timestamps order
    by value so the zero-duration rows are assigned deterministically.
    """
    w = Window.partitionBy(key).orderBy("__t", "__v")
    return (
        df.select(
            key,
            F.col(ts_col).cast("double").alias("__t"),
            F.col(value_col).alias("__v"),
        )
        .withColumn("__dur", F.lead("__t").over(w) - F.col("__t"))
        .groupBy(key)
        .agg(
            F.when(
                F.sum("__dur").isNull() | (F.sum("__dur") == 0),
                F.max("__v"),
            )
            .otherwise(F.sum(F.col("__v") * F.col("__dur")) / F.sum("__dur"))
            .alias("twap"),
            F.count("*").alias("n_obs"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604_800,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by their first-activity
    period (week by default), counted per (cohort_period, period_offset)
    of later activity — the standard growth-analytics rollup.

    Shape: distinct (user, period) and per-user first period both hash
    on the user (shared partitioning), the cohort join keys on the user,
    and the final count shuffles the tiny (cohort, offset) key space.
    Periods are epoch-integer buckets (engine-portable, no calendar
    types in the keys).
    """
    p = (F.col(ts_col).cast("long") / period_seconds).cast("long")
    activity = (
        events.select(F.col(user_col).alias("u"), p.alias("period"))
        .distinct()
    )
    cohort = activity.groupBy("u").agg(F.min("period").alias("cohort_period"))
    return (
        activity.join(cohort, "u")
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count_distinct("u").alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order transition counts between consecutive events per user
    (the Markov-chain / clickstream-path table): rows of
    (prev_type, event_type, n).

    One ``lag`` window per user (single key shuffle, deterministic
    (ts, event_id) ordering) then a map-side-combined count over the
    tiny (prev, next) key space.  Session entry rows (no predecessor)
    appear with prev_type NULL so entry mass is visible.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col("event_id").asc()
    )
    return (
        events.select(
            user_col,
            ts_col,
            "event_id",
            F.col(type_col).alias("event_type"),
        )
        .withColumn("prev_type", F.lag("event_type").over(w))
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )


def time_decayed_agg(
    events: DataFrame,
    ref_ts: str,
    half_life_hours: float = 168.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially time-decayed feature aggregates per key, as of a
    fixed reference instant: ``weight = 0.5 ** (age_hours / half_life)``.

    The feature-store staple ("activity in the last N days, recency
    weighted") computed in ONE scan + ONE key shuffle: the weight is a
    pure scan-stage expression (no window, no self-join, no per-key
    state), and sum/count/mean fold map-side like any mergeable
    aggregate.  ``ref_ts`` is an explicit parameter — never "now" — so
    the output is deterministic and re-runnable (same reason the
    sampling ops hash content instead of calling rand()).

    Returns (key, n_events, decayed_sum, decayed_n, decayed_mean) where
    ``decayed_n`` is the sum of weights (the "effective" event count).
    """
    if half_life_hours <= 0:
        raise ValueError(f"half_life_hours must be > 0 (got {half_life_hours})")
    age_h = (
        F.unix_timestamp(F.lit(ref_ts).cast("timestamp"))
        - F.unix_timestamp(F.col(ts_col))
    ) / 3600.0
    w = F.pow(F.lit(0.5), age_h / F.lit(half_life_hours))
    return (
        events.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(w * F.col(value_col)), 6).alias("decayed_sum"),
            F.round(F.sum(w), 6).alias("decayed_n"),
            F.round(
                F.sum(w * F.col(value_col)) / F.sum(w), 6
            ).alias("decayed_mean"),
        )
    )


def window_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_s: int = 600,
) -> DataFrame:
    """First-arrival dedup within tumbling time windows: one surviving
    event per (keys…, window) — the batch twin of streaming
    ``dedup_stream``, for pipelines that debounce repeated signals
    (retries, double-fires) at rest.

    The winner is ``min(struct(ts, id))`` per group — a mergeable MIN
    aggregation with map-side partials (ONE key shuffle of group rows,
    never a row-level sort window).  The (ts, id) struct ordering makes
    the survivor deterministic under ts ties."""
    win = (F.floor(F.col(ts_col).cast("long") / window_s) * window_s).cast(
        "long"
    )
    first = F.min(F.struct(F.col(ts_col), F.col(id_col))).alias("__f")
    return (
        df.groupBy(*keys, win.alias("win_start"))
        .agg(first, F.count("*").alias("n_dups"))
        .select(
            *keys,
            "win_start",
            F.col("__f")[ts_col].alias(ts_col),
            F.col("__f")[id_col].alias(id_col),
            "n_dups",
        )
    )


def dyadic_smooth(
    df: DataFrame,
    keys: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    horizon: int = 20,
    scale: int = 100,
) -> DataFrame:
    """Per-key sequential EWMA-style smoothing with EXACT, engine-portable
    arithmetic: ``smooth_t = Σ_{i=0..h-1} x_{t-i} / 2^{i+1}`` over the
    trailing ``horizon`` events (newest weighted 1/2, halving per step).

    Floating-point EWMA recurrences normally drift across engines and
    partitionings because summation order differs; here every operation
    is exact: ``x`` is quantized to ``round(x·scale)`` (an integer-valued
    double), and the left fold ``acc ← acc/2 + x/2`` only ever divides
    by two (exact in binary) and adds dyadic rationals whose bit spread
    (value bits + horizon) stays under the 53-bit mantissa — so the
    result is bit-identical on Spark, DuckDB, or a hand calculator,
    independent of partition count.  The weight of the step-``i``-old
    event is 2^-(i+1); mass older than ``horizon`` is dropped (for
    h = 20 that tail is < 1e-6 of total weight).

    Execution: ONE key shuffle for the sort window; the trailing-array
    collect is bounded at ``horizon`` values per row and the fold runs
    in the scan stage.  No recurrence state crosses partitions, so the
    operator scales with rows/key, not table size."""
    xq = F.round(F.coalesce(F.col(value_col), F.lit(0.0)) * scale, 0)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(horizon - 1), 0)
    )
    arr = F.collect_list(xq).over(w)
    fold = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc / 2 + x / 2
    )
    # no ROUND on the output: the fold is exact and the single ÷scale is
    # one correctly-rounded IEEE op on identical inputs, so both engines
    # emit the same double — whereas a decimal ROUND(x, 6) straddles
    # half-way cases differently (Spark rounds the shortest decimal
    # rendering half-up, DuckDB rounds the binary value) and flips
    # hashes exactly on the dyadic .xxxxxx5 boundaries this fold
    # produces
    return df.select(
        *keys,
        F.col(ts_col),
        F.col(id_col),
        (fold / scale).alias("smooth"),
    )


def funnel_latency(
    events: DataFrame,
    step_a: str,
    step_b: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution: for every user whose first
    ``step_b`` event occurs at-or-after their first ``step_a`` event,
    the latency in seconds between the two — summarized as converted-user
    count + exact p25/p50/p75 (one global row).

    Semantics match :func:`funnel_counts`' ordering rule (conversion =
    B at-or-after first A).  Execution: the first-A aggregation and the
    B-after-A join both key on the user, so the whole operator is one
    user-keyed shuffle lineage + a scalar percentile aggregation whose
    input is one latency row per converted user — at 100 TB the
    percentile step sees |users| rows, never |events|."""
    is_a = F.col(type_col) == step_a
    firsts = (
        events.where(is_a)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__a_ts"))
    )
    b_events = events.where(F.col(type_col) == step_b).select(
        user_col, F.col(ts_col).alias("__b_ts")
    )
    lat = (
        b_events.join(firsts, user_col)
        .where(F.col("__b_ts") >= F.col("__a_ts"))
        .groupBy(user_col, "__a_ts")
        .agg(F.min("__b_ts").alias("__b_first"))
        .select(
            (
                F.col("__b_first").cast("double")
                - F.col("__a_ts").cast("double")
            ).alias("latency_s")
        )
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.percentile("latency_s", 0.25), 4).alias("p25_s"),
        F.round(F.percentile("latency_s", 0.5), 4).alias("p50_s"),
        F.round(F.percentile("latency_s", 0.75), 4).alias("p75_s"),
    )


def markov_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conv_type: str = "purchase",
    iterations: int = 12,
) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2016):
    model user journeys as a first-order chain over channels with
    absorbing CONV/NULL states, then credit each channel by how much
    total conversion probability disappears when it is removed — the
    data-driven alternative to position rules
    (``attribution_linear``'s heuristic cousin).

    Distributed work: one user-keyed window pass orders each journey
    (truncated at the first ``conv_type``), emits START→first,
    channel→channel, and last→CONV/NULL transition rows, and one
    grouped count builds the transition table — at most
    (channels+1)² + channels rows, METADATA.  The absorbing-chain
    conversion probability is then a fixed-``iterations`` expansion on
    the driver (same tiny-solve split as PCA/IVF), repeated once per
    removed channel.  Fixed iterations keep the result
    engine-reproducible; K=12 captures paths of ≤12 hops (journeys are
    short).  Returns (channel, conv_base, conv_without,
    removal_effect) rounded 6dp, channels sorted by name."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1 (got {iterations})")
    w = Window.partitionBy("u").orderBy("rn")
    base = events.where(F.col(user_col).isNotNull()).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("c"),
        F.row_number().over(
            Window.partitionBy(F.col(user_col)).orderBy(
                F.col(ts_col), F.col(id_col)
            )
        ).alias("rn"),
    )
    first_conv = base.where(F.col("c") == conv_type).groupBy("u").agg(
        F.min("rn").alias("prn")
    )
    pre = base.join(first_conv, "u", "left").where(
        F.col("prn").isNull() | (F.col("rn") < F.col("prn"))
    )
    nxt = F.lead("c").over(w)
    steps = pre.select(
        "u",
        F.col("c").alias("src"),
        F.coalesce(
            nxt,
            F.when(F.col("prn").isNotNull(), F.lit("CONV")).otherwise(
                F.lit("NULL")
            ),
        ).alias("dst"),
    )
    firsts = (
        pre.withColumn("__mrn", F.min("rn").over(Window.partitionBy("u")))
        .where(F.col("rn") == F.col("__mrn"))
        .select("u", F.lit("START").alias("src"), F.col("c").alias("dst"))
    )
    # users whose FIRST event converts have no pre rows: START → CONV
    direct = first_conv.where(F.col("prn") == 1).select(
        "u", F.lit("START").alias("src"), F.lit("CONV").alias("dst")
    )
    trans = steps.unionByName(firsts).unionByName(direct)
    counts = trans.groupBy("src", "dst").agg(F.count("*").alias("n"))
    rows = counts.collect()

    out_n: dict[str, int] = {}
    p: dict[tuple[str, str], float] = {}
    for r in rows:
        out_n[r["src"]] = out_n.get(r["src"], 0) + r["n"]
    for r in rows:
        p[(r["src"], r["dst"])] = r["n"] / out_n[r["src"]]
    channels = sorted(
        {s for s, _ in p} | {d for _, d in p} - {"START", "CONV", "NULL"}
    )
    channels = [c for c in channels if c not in ("START", "CONV", "NULL")]

    def conv_prob(removed: str | None) -> float:
        x = {
            c: p.get(("START", c), 0.0)
            for c in channels
            if c != removed
        }
        conv = p.get(("START", "CONV"), 0.0)
        for _ in range(iterations):
            conv += sum(x[s] * p.get((s, "CONV"), 0.0) for s in x)
            x = {
                t: sum(x[s] * p.get((s, t), 0.0) for s in x)
                for t in channels
                if t != removed
            }
        return conv

    base_conv = conv_prob(None)
    out_rows = []
    for c in channels:
        cw = conv_prob(c)
        eff = (base_conv - cw) / base_conv if base_conv > 0 else 0.0
        out_rows.append((c, base_conv, cw, eff))
    spark = events.sparkSession
    out = spark.createDataFrame(
        out_rows,
        "channel string, conv_base double, conv_without double, "
        "removal_effect double",
    )
    return out.select(
        "channel",
        F.round("conv_base", 6).alias("conv_base"),
        F.round("conv_without", 6).alias("conv_without"),
        F.round("removal_effect", 6).alias("removal_effect"),
    )
