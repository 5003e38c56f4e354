"""Stream-stream interval join: click→purchase attribution.

The remaining Structured Streaming join class after the stateful
correlator (arbitrary state), windowed aggregates, and watermarked
dedup: TWO live streams joined on a key within an event-time window.
Spark buffers each side in watermark-bounded state; the time-range
predicate is what lets it EVICT — an unbounded-range stream-stream
join would grow state forever, so the range condition here is load-
bearing, not decoration.

Batch equivalence: the same function applied to batch frames produces
the plain range join (operators/asof.range_join shape) — pinned in
tests so the streaming answer is the batch answer.

Reference provenance: the reference's sequence rules correlate across
time slots via its Mongo in-flight store (alerta.py:358-420); this is
the Spark-native two-stream formulation of that correlation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Join each purchase to every click by the same user in the
    preceding ``window`` (click <= purchase < click + window).

    On streaming inputs both sides get a ``watermark`` and the
    time-range predicate bounds the join state (Spark drops buffered
    rows once the watermark passes their eviction horizon). On batch
    inputs the same expression is a plain range join.

    -> [user_id, click_id, click_ts, purchase_id, purchase_ts,
    delay_us] — one row per (click, purchase) pair in range.
    """
    c = clicks.select(
        F.col(user_col).alias("_cu"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    p = purchases.select(
        F.col(user_col).alias("_pu"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("_cu") == F.col("_pu"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond).select(
        F.col("_cu").alias(user_col),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
            "delay_us"
        ),
    )
