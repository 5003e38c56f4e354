"""Sessionization and funnel analysis over event streams.

Sessionization is the canonical gaps-and-islands computation: events of
one user belong to the same session while consecutive gaps stay under a
threshold. Two implementations with identical semantics:

- :func:`sessionize` — batch, one window shuffle on the user key
  (lag → new-session flag → running sum). Exactly SQL-expressible, so
  the catalog oracle checks it bit-for-bit.
- :func:`session_window_stats` — Spark's native ``F.session_window``
  aggregate, the same operator a ``readStream`` pipeline would use with
  a watermark; batch output is pinned against :func:`sessionize` in
  tests so the streaming path inherits the verified semantics.

Funnel analysis (:func:`funnel_counts`) is the ordered-step conversion
count: for steps A → B → C, a user converts at step i only with an
event matching step i strictly after their step i-1 conversion time.
Each step is one filtered aggregate plus one broadcast join of the
(users × 1 timestamp) frame from the previous step — the corpus-sized
event table is scanned once per step but never shuffled on anything
except the final per-user aggregate, and the carried state is one
timestamp per user.

Reference provenance: the reference's sequence alerts (alerta.py:
310-410) are the *alerting* face of the same ordered-step semantics;
these are the analytics face over the events table.

All timestamp math is integer microseconds (``unix_micros``) — exact
on both engines, no float time arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Integer-µs epoch of a timestamp column; tolerates TIMESTAMP_NTZ
    inputs (naive parquet timestamps) by reading them as UTC instants —
    ``unix_micros`` itself rejects NTZ."""
    c = F.col(ts_col)
    for f in df.schema.fields:
        if f.name == ts_col and f.dataType.typeName() == "timestamp_ntz":
            c = c.cast("timestamp")
    return F.unix_micros(c)


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Tag every event with its session ordinal per key.

    One shuffle (window by ``key_col``); the session ordinal is a
    running sum of new-session flags over (ts, tiebreaker) order —
    deterministic under timestamp ties. Adds ``session_idx``."""
    us = _epoch_us(df, ts_col)
    w = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    run = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return df.withColumn("session_idx", F.sum(is_new).over(run))


def session_stats(
    df: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup: event count, bounds, and duration in exact
    integer microseconds. The window shuffle of :func:`sessionize` is
    already partitioned by ``key_col``, so the following groupBy on
    (key, session_idx) reuses that partitioning — one real exchange
    end-to-end."""
    s = sessionize(df, gap_minutes, ts_col, key_col, tiebreak_col)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).alias("duration_us"),
    )


def session_window_stats(
    df: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """The same sessions via Spark's native session-window aggregate —
    the operator a streaming pipeline uses (with ``withWatermark``
    in front). Window end is last_event + gap by session-window
    definition; ``session_start`` equals :func:`sessionize`'s (pinned
    in tests)."""
    sw = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    return (
        df.groupBy(F.col(key_col), sw)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .drop("session_window")
    )


def funnel_counts(
    df: DataFrame,
    steps: list[tuple[str, Column]],
    ts_col: str = "ts",
    key_col: str = "user_id",
    broadcast_state: bool = True,
) -> DataFrame:
    """Ordered-funnel conversion: per step, the number of users whose
    first qualifying event occurs strictly after their previous step's
    conversion time. Returns (step_idx, step, n_users, conversion) —
    conversion is the fraction of step-1 converters (one IEEE division
    of exact counts).

    Plan: step i is ``filter(p_i)`` → join the previous step's
    (user, t_{i-1}) frame → ``min`` aggregate. The carried state is one
    timestamp per surviving user; with ``broadcast_state`` it rides a
    broadcast join so the events table never shuffles beyond the
    per-user partial aggregate. At hundreds of millions of distinct
    users pass False — the step joins then shuffle on the user key,
    and every stage shares that one partitioning."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    us = _epoch_us(df, ts_col)
    prev: DataFrame | None = None
    tiers: list[tuple[str, DataFrame]] = []
    for name, pred in steps:
        stage = df.where(pred).select(F.col(key_col).alias("_u"), us.alias("_t"))
        if prev is not None:
            carried = F.broadcast(prev) if broadcast_state else prev
            stage = stage.join(
                carried, "_u"
            ).where(F.col("_t") > F.col("_prev_t")).drop("_prev_t")
        reached = stage.groupBy("_u").agg(F.min("_t").alias("_prev_t"))
        tiers.append((name, reached))
        prev = reached

    counts = None
    for i, (name, reached) in enumerate(tiers):
        row = reached.agg(
            F.lit(i + 1).alias("step_idx"),
            F.lit(name).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        counts = row if counts is None else counts.unionByName(row)
    w = W.orderBy("step_idx").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return counts.select(
        "step_idx",
        "step",
        "n_users",
        (
            F.col("n_users").cast("double")
            / F.first("n_users").over(w).cast("double")
        ).alias("conversion"),
    )
