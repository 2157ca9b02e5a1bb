"""Stream-stream interval join — event attribution (view→click style).

The reference is batch-only (SURVEY §2.7); this extends the streaming
surface with the canonical two-stream join: pair each left event with the
right-side events of the same key that happen within ``within`` AFTER it.
Written against plain DataFrames so the SAME function serves batch
(``spark.read``) and Structured Streaming (``spark.readStream``); in
streaming, watermark both inputs first (``windows.with_watermark``) —
the equi-key plus bounded time-range condition is exactly what Spark's
stream-stream join needs to expire state: rows older than
watermark + ``within`` are dropped from the join buffers.

Scale notes: the join shuffles both sides on the key only; state per key
is bounded by the event rate within ``within``.  Batch-side, Catalyst
plans the same condition as an equi-join with the range as a residual
filter — never a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_pair_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "24 hours",
    suffix: str = "_r",
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on ``key`` where the right event
    lands in [left.ts, left.ts + within].  Right columns are renamed with
    ``suffix`` so the pair row carries both sides unambiguously."""
    r = right.select([F.col(c).alias(f"{c}{suffix}") for c in right.columns])
    cond = (
        (F.col(key) == F.col(f"{key}{suffix}"))
        & (F.col(f"{ts_col}{suffix}") >= F.col(ts_col))
        & (F.col(f"{ts_col}{suffix}") <= F.col(ts_col) + F.expr(f"INTERVAL {within}"))
    )
    return left.join(r, cond)


def attribute_clicks(
    events: DataFrame,
    view_type: str = "view",
    click_type: str = "click",
    within: str = "24 hours",
) -> DataFrame:
    """Attribution pairs: every (view, click) of the same user where the
    click follows the view within ``within``.  Works on a batch frame or
    on two filtered restreams of the same source."""
    views = events.where(F.col("event_type") == view_type)
    clicks = events.where(F.col("event_type") == click_type)
    out = interval_pair_join(views, clicks, within=within)
    return out.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("event_id_r").alias("click_id"),
        F.unix_timestamp("ts").alias("view_ts"),
        F.unix_timestamp("ts_r").alias("click_ts"),
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a static
    dimension table (user profile, model registry, blocklist...).

    Stream-static joins keep NO streaming state — the static side is
    re-resolved per micro-batch, so an updated dimension snapshot is
    picked up on the next batch.  With ``broadcast=True`` (the default;
    correct whenever the dim fits in executor memory) the stream side
    never shuffles: enrichment happens map-side in the scan stage, which
    is the only shape that keeps up with a high-rate stream.  Set
    ``broadcast=False`` for huge dims (shuffled hash join per batch).
    """
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, how)
