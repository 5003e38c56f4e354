"""Time-series regularization over the event lake.

Metrics pipelines want a VALUE PER KEY PER BUCKET even when nothing
was observed in a bucket — dashboards, joins against other regular
series, and window models all assume a dense time grid. These
operators densify an irregular event stream: per-key calendar grid,
last-observation-carried-forward fill, and an observed/filled flag.

Scale shape: the grid explode is per-key (span/step rows, independent
of event volume); the last-in-bucket cut and the forward-fill window
both run under ONE key-hash exchange (the per-bucket aggregate reuses
the window's clustering). Carried values are COPIES of observed
doubles — no float arithmetic — so results are engine-exact and the
catalog entry is hash-checked.

Reference provenance: no analogue (alertA's Athena queries return
sparse groups; absence is handled by the deadman operator,
alerta.py:238-264). Training-data/analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def resample_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "day",
) -> DataFrame:
    """Per-key dense calendar grid at ``unit`` granularity ('day' or
    'hour') spanning that key's [first, last] observation, with the
    last observed value carried forward into empty buckets.

    Bucket representative = the LAST observation in the bucket under
    the total order (ts, then a stable column tie-break if ts
    collides) — pinned identically in the oracle. Output:
    [key, bucket, value, is_observed]; ``value`` is never NULL (the
    first bucket of a key is always observed).
    """
    if unit not in ("day", "hour"):
        raise ValueError(f"unit must be 'day' or 'hour', got {unit}")
    bucket = F.date_trunc(unit, F.col(ts_col))
    if unit == "day":
        bucket = F.to_date(bucket)

    obs = df.select(
        F.col(key_col).alias("_k"), bucket.alias("bucket"),
        F.col(ts_col).alias("_ts"), F.col(value_col).alias("_v"),
    )
    # last observation per (key, bucket) under (ts) desc; a second
    # monotone column is unnecessary when ts is unique per key — the
    # catalog pins (ts, value) to make the cut total regardless
    w_last = W.partitionBy("_k", "bucket").orderBy(
        F.desc("_ts"), F.desc("_v")
    )
    last_obs = (
        obs.withColumn("_rn", F.row_number().over(w_last))
        .where(F.col("_rn") == 1)
        .select("_k", "bucket", F.col("_v").alias("_obs_v"))
    )

    step = F.expr(f"INTERVAL 1 {unit.upper()}")
    span = obs.groupBy("_k").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = span.select(
        "_k", F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("bucket")
    )

    w_fill = (
        W.partitionBy("_k")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(last_obs, ["_k", "bucket"], "left")
        .select(
            F.col("_k").alias(key_col),
            "bucket",
            F.last("_obs_v", ignorenulls=True).over(w_fill).alias(value_col),
            F.col("_obs_v").isNotNull().alias("is_observed"),
        )
    )


def merge_intervals(
    df: DataFrame,
    start_col: str,
    end_col: str,
    key_col: str = "user_id",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key interval union: merge overlapping-or-touching
    [start, end] intervals into maximal covered spans — the general
    form of sessionization (a fixed gap is the special case where
    every interval has the same length; here an early LONG interval
    can swallow many later short ones, so the island test compares
    each start against the RUNNING MAX of all previous ends, not just
    the previous row's).

    Columns are integer microseconds (cast upstream) so the span
    arithmetic is exact. One exchange: the key-partitioned window and
    the (key, island) aggregate share the same clustering.

    -> [key_col, island, start_us, end_us, n_events, covered_us]
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(start_col, tiebreak_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    tagged = df.withColumn("island", F.sum(is_new).over(run))
    return tagged.groupBy(key_col, "island").agg(
        F.min(start_col).alias("start_us"),
        F.max(end_col).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(end_col) - F.min(start_col)).alias("covered_us"),
    )


def ewma_binary(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_q_col: str,
) -> DataFrame:
    """Exponentially weighted moving average with α = 1/2, computed
    EXACTLY: ewma_t = (x_t + ewma_{t-1}) / 2.

    EWMA's recursion is the textbook non-associative float fold — the
    reason streaming EWMA is usually irreproducible across retries.
    With binary decay it linearizes into an exact integer prefix sum:
    M_1 = x_1, M_t = M_{t-1} + x_t·2^(t-2)  (so M_t = 2^(t-1)·ewma_t),
    which is ONE running window SUM of x·2^(rn-2) — associative,
    order-free, engine-exact — and ewma_t = M_t / 2^(t-1) is a single
    IEEE division of two exactly-converted integers.

    ``value_q_col`` must be an exact BIGINT series (quantize floats
    first); the caller owns the 63-bit budget:
    max|x_q| · 2^(T-2) · T < 2^62 for series length T (e.g. daily
    totals in cents over a month: 2e9 · 2^28 · 30 ≈ 2^64·0.09 — fine).
    For longer horizons, window the series (terms beyond ~50 steps are
    below any practical quantization anyway).

    Adds [rn, ewma]. One key exchange shared by both windows.
    """
    w = W.partitionBy(*key_cols).orderBy(order_col)
    rn = F.row_number().over(w)
    # Runtime guard, not just a docstring contract: Spark's shiftleft
    # masks the shift amount mod 64, so at rn >= 66 the 2^(rn-2) term
    # silently WRAPS (rn=66 shifts by 0) and every later ewma is garbage
    # with no error. Fail loudly at the budget edge instead.
    out = df.withColumn("rn", rn).withColumn(
        "_term",
        F.when(
            F.col("rn") > 60,
            F.raise_error(
                F.lit(
                    "ewma_binary: series longer than 60 steps exceeds the "
                    "63-bit exact budget (shiftleft would wrap); window "
                    "the series per key first"
                )
            ).cast("bigint"),
        )
        .when(F.col("rn") == 1, F.col(value_q_col))
        .otherwise(
            F.col(value_q_col)
            * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(rn - 2 AS INT))")
        ),
    )
    m = F.sum("_term").over(
        W.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return out.withColumn(
        "ewma",
        m.cast("double")
        / F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(rn - 1 AS INT)) AS DOUBLE)"
        ),
    ).drop("_term")


def seasonal_residual(
    df: DataFrame,
    key_cols: list[str],
    hour_col: str,
    value_q_col: str,
    period_hours: int = 168,
) -> DataFrame:
    """Seasonal-naive residuals: x_t − x_{t−period} on a DENSE hourly
    grid (missing hours count as 0 — a silent outage IS the anomaly a
    lag over sparse rows would slide past). The weekly-seasonality
    screen for metric monitoring: residuals near 0 are "same as last
    week", large |residual| is the page.

    Grid: per key one min/max aggregate -> sequence() explode (span
    rows, volume-independent) -> left join the observed totals,
    coalesce 0 -> ONE lag window. All arithmetic exact BIGINT.

    -> [*key_cols, hour_idx, x_q, baseline_q, resid_q] for hours with
    a defined baseline (hour_idx >= period)."""
    w = W.partitionBy(*key_cols).orderBy("hour_idx")
    span = df.groupBy(*key_cols).agg(
        F.min(hour_col).cast("long").alias("_h0"),
        F.max(hour_col).cast("long").alias("_h1"),
    )
    grid = span.select(
        *key_cols,
        F.explode(F.sequence(F.col("_h0"), F.col("_h1"))).alias("hour_idx"),
    )
    obs = df.select(
        *key_cols,
        F.col(hour_col).cast("long").alias("hour_idx"),
        F.col(value_q_col).alias("_x"),
    )
    dense = grid.join(obs, [*key_cols, "hour_idx"], "left").select(
        *key_cols,
        "hour_idx",
        F.coalesce("_x", F.lit(0).cast("long")).alias("x_q"),
    )
    lagged = dense.withColumn(
        "baseline_q", F.lag("x_q", period_hours).over(w)
    )
    return lagged.where(F.col("baseline_q").isNotNull()).select(
        *key_cols,
        "hour_idx",
        "x_q",
        "baseline_q",
        (F.col("x_q") - F.col("baseline_q")).cast("long").alias("resid_q"),
    )
