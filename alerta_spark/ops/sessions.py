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


def _norm_ts(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize a TIMESTAMP_NTZ ``ts_col`` to TIMESTAMP once, at the
    top of every public function in this module, so downstream
    ``unix_micros``/output columns are uniformly zoned.

    NOTE: the NTZ→TIMESTAMP cast interprets the naive wall-clock in the
    SESSION timezone — these functions assume
    ``spark.sql.session.timeZone=UTC`` (alerta_spark.session.get_spark
    pins it; sources/lake.py documents the same requirement). Under a
    non-UTC session zone, naive timestamps would shift across DST
    transitions and distort gap/duration math."""
    for f in df.schema.fields:
        if f.name == ts_col and f.dataType.typeName() == "timestamp_ntz":
            return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def _epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Integer-µs epoch of a timestamp column (inputs already
    normalized by :func:`_norm_ts`)."""
    return F.unix_micros(F.col(ts_col))


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
    df = _norm_ts(df, ts_col)
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
    df = _norm_ts(df, ts_col)
    s = sessionize(df, gap_minutes, ts_col, key_col, tiebreak_col)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
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
    df = _norm_ts(df, ts_col)
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


def funnel_conversion_times(
    df: DataFrame,
    steps: list[tuple[str, Column]],
    ts_col: str = "ts",
    key_col: str = "user_id",
    within_minutes: float | None = None,
) -> DataFrame:
    """Per-user funnel state in ONE corpus scan: for ordered steps
    p_1..p_n, t_i = the first event time matching p_i strictly after
    t_{i-1}. Returns (``key_col``, ``conv_times`` array<long> of µs,
    null where the step was never reached).

    ``within_minutes`` adds a conversion deadline: step i counts only
    if it lands within that long after step i-1's conversion time
    (FIRST-TOUCH semantics — the deadline runs from the first
    qualifying occurrence of the previous step, the standard
    product-analytics convention; a later re-occurrence does not
    reopen the window).

    Plan shape (the 100 TB design): one scan with the any-step
    disjunction pushed to the parquet reader, one shuffle on the user
    key, then a per-user ascending fold (``F.aggregate`` over the
    sorted event list — whole-stage JVM, no Python). Because events
    fold in ascending time order, the first event with flag_i and
    t > acc[i-1] (and under the deadline, if set) IS the step-join
    minimum — identical semantics to the step-join formulation,
    n-times fewer scans. Per-user memory is the user's *matching*
    events only; a funnel over pathologically chatty keys can fall
    back to ``funnel_counts(strategy='shuffle')``.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    df = _norm_ts(df, ts_col)
    n = len(steps)
    us = _epoch_us(df, ts_col)
    any_match = steps[0][1]
    for _, pred in steps[1:]:
        any_match = any_match | pred
    flags = F.array(*[pred.cast("boolean") for _, pred in steps])
    ev = df.where(any_match).select(
        F.col(key_col).alias("_u"), us.alias("_t"), flags.alias("_f")
    )
    per_user = ev.groupBy("_u").agg(
        F.sort_array(F.collect_list(F.struct("_t", "_f"))).alias("_evs")
    )
    init = F.expr(f"array_repeat(CAST(NULL AS BIGINT), {n})")

    def fold(acc, e):
        def slot(i):
            # prereq for step i (0-based): step 0 always armed; step i
            # needs acc[i-1] set and this event strictly after it. The
            # greatest() guard keeps element_at's index >= 1 so the
            # i == 0 branch never evaluates an invalid index.
            prev = F.element_at(acc, F.greatest(i, F.lit(1)))
            after_prev = prev.isNotNull() & (e["_t"] > prev)
            if within_minutes is not None:
                lim = int(within_minutes * 60 * 1_000_000)
                after_prev = after_prev & (e["_t"] <= prev + F.lit(lim))
            armed = (i == F.lit(0)) | after_prev
            cur = F.element_at(acc, i + 1)
            hit = F.coalesce(F.element_at(e["_f"], i + 1), F.lit(False))
            return F.when(cur.isNull() & hit & armed, e["_t"]).otherwise(cur)

        return F.transform(F.sequence(F.lit(0), F.lit(n - 1)), slot)

    return per_user.select(
        F.col("_u").alias(key_col),
        F.aggregate("_evs", init, fold).alias("conv_times"),
    )


def funnel_counts(
    df: DataFrame,
    steps: list[tuple[str, Column]],
    ts_col: str = "ts",
    key_col: str = "user_id",
    broadcast_state: bool = True,
    strategy: str = "fold",
    within_minutes: float | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: per step, the number of users whose
    first qualifying event occurs strictly after their previous step's
    conversion time. Returns (step_idx, step, n_users, conversion) —
    conversion is the fraction of step-1 converters (one IEEE division
    of exact counts).

    ``strategy``:

    - ``'fold'`` (default) — :func:`funnel_conversion_times`: ONE
      corpus scan + one user-key shuffle; step counts come from a
      single aggregate over the per-user conversion-time arrays.
    - ``'joins'`` — the step-chained form: step i is ``filter(p_i)`` →
      join the previous step's (user, t_{i-1}) frame → ``min``
      aggregate; ``broadcast_state`` picks broadcast vs user-key
      shuffle joins. Scans the table once per step PER TIER (the
      carried state re-derives), so it is the verification/fallback
      path — e.g. when per-user matching-event lists would not fit the
      fold's collect_list."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if strategy == "fold":
        conv = funnel_conversion_times(df, steps, ts_col, key_col, within_minutes)
        n = len(steps)
        one = conv.agg(
            *[
                F.count(F.element_at("conv_times", i + 1)).alias(f"_n{i}")
                for i in range(n)
            ]
        )
        # n is tiny: explode the single count row to (step_idx, step,
        # n_users) rows and divide by step 1's count — no window needed.
        rows = F.array(
            *[
                F.struct(
                    F.lit(i + 1).alias("step_idx"),
                    F.lit(name).alias("step"),
                    F.col(f"_n{i}").alias("n_users"),
                )
                for i, (name, _) in enumerate(steps)
            ]
        )
        return one.select(
            F.inline(rows), F.col("_n0").alias("_base")
        ).select(
            "step_idx",
            "step",
            "n_users",
            (F.col("n_users").cast("double") / F.col("_base").cast("double")).alias(
                "conversion"
            ),
        )

    if strategy != "joins":
        raise ValueError(f"unknown funnel strategy: {strategy!r}")
    df = _norm_ts(df, ts_col)
    us = _epoch_us(df, ts_col)
    prev: DataFrame | None = None
    tiers: list[tuple[str, DataFrame]] = []
    for name, pred in steps:
        stage = df.where(pred).select(F.col(key_col).alias("_u"), us.alias("_t"))
        if prev is not None:
            carried = F.broadcast(prev) if broadcast_state else prev
            gate = F.col("_t") > F.col("_prev_t")
            if within_minutes is not None:
                lim = int(within_minutes * 60 * 1_000_000)
                gate = gate & (F.col("_t") <= F.col("_prev_t") + F.lit(lim))
            stage = stage.join(carried, "_u").where(gate).drop("_prev_t")
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
    # bounded by construction: |steps| rows total, so the single-
    # partition window is deliberate; the constant partition key states
    # that intent (Catalyst folds it away — the audited allowlist in
    # tools/window_audit.py is the enforcement)
    w = (
        W.partitionBy(F.lit(0))
        .orderBy("step_idx")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return counts.select(
        "step_idx",
        "step",
        "n_users",
        (
            F.col("n_users").cast("double")
            / F.first("n_users").over(w).cast("double")
        ).alias("conversion"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; for each (cohort_week, week_offset), how many of the
    cohort were active and what fraction that is — the standard
    product-analytics retention triangle.

    All counts are exact integers; ``retention`` is one int/int IEEE
    division, so the whole result is engine-exact. Week bucketing is
    date_trunc('week') (ISO Monday) on both engines.

    Plan: distinct (user, week) one exchange; per-user first week
    reuses the user clustering; the (cohort, offset) rollup and the
    offset-0 cohort-size join are both cohort-sized (weeks², not
    users) — nothing user-sized crosses more than two exchanges."""
    wk = F.to_date(F.date_trunc("week", F.col(ts_col))).alias("wk")
    # uw feeds the first-week aggregate and the activity join;
    # deliberately NOT persisted — (user, week)-sized frame, cheap
    # one-distinct subtree: caching measured cold-worse at local[32]
    # (1.12 -> 1.57 s rep0 ABBA)
    uw = df.select(F.col(user_col).alias("_u"), wk).distinct()
    first = uw.groupBy("_u").agg(F.min("wk").alias("cohort_week"))
    act = (
        uw.join(first, "_u")
        .select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
            "_u",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
    size = act.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return act.join(F.broadcast(size), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double"))
        .alias("retention"),
    )


def km_survival(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    churn_horizon_days: int = 30,
    ln_scale: int = 1_000_000_000,
) -> DataFrame:
    """Kaplan-Meier user-retention curve with right-censoring — the
    churn readout growth_accounting_daily cannot give (it counts state
    transitions; this estimates the SURVIVAL FUNCTION when lifetimes
    are still in progress).

    Lifetime T_u = days between a user's first and last event. A user
    whose last event is more than ``churn_horizon_days`` before the
    dataset's max timestamp CHURNED at T_u; everyone else is censored
    at T_u (still alive — their lifetime only contributes to the risk
    sets). Per distinct lifetime t with at least one churn:

        n_at_risk(t) = #users with T >= t
        d(t)         = churns at exactly t
        S(t)         = Π_{t' <= t} (1 - d/n)

    Engine-exactness: the product is carried as a CUMULATIVE SUM of
    per-term floor(ln((n-d)/n) · ln_scale) BIGINTs — (n-d)/n is one
    IEEE division of exact integers, the quantization is the repo's
    standard fixed-point-ln discipline, and the cumsum is exact — so
    the curve hash-checks; S(t) = exp(survival_lnq / ln_scale).

    Plan: one user aggregate (first/last), a broadcast 1-row max-ts,
    one lifetime aggregate (distinct-T-sized, ≤ observation span in
    days), then the risk-set/cumsum windows over that TINY frame with
    a column-derived constant partition key (single partition,
    deliberate and warning-free). The corpus is scanned once.

    Output: [t_days, n_at_risk, d_churned, survival_lnq, s_lnq_scaled]
    rows where d_churned > 0, ordered by t_days.
    Public algorithm: Kaplan & Meier (1958)."""
    spans = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(ts_col).alias("_first"), F.max(ts_col).alias("_last")
    )
    mx = df.agg(F.max(ts_col).alias("_mx"))
    life = (
        spans.crossJoin(F.broadcast(mx))
        .select(
            F.datediff(
                F.col("_last").cast("date"), F.col("_first").cast("date")
            ).cast("long").alias("t_days"),
            (
                F.col("_last").cast("date")
                <= F.date_sub(F.col("_mx").cast("date"), churn_horizon_days)
            ).alias("_churned"),
        )
    )
    return km_curve(life, "t_days", "_churned", ln_scale)


def km_curve(
    life: DataFrame,
    t_col: str,
    event_col: str,
    ln_scale: int = 1_000_000_000,
) -> DataFrame:
    """The Kaplan-Meier estimator itself, over a prepared
    one-row-per-subject frame [t_col: integer lifetime, event_col:
    TRUE = event observed at t, FALSE = right-censored at t]. See
    :func:`km_survival` for the exactness and plan discipline; this
    entry point lets any framing (churn lifetimes, time-to-conversion
    with an observation window, time-to-failure) reuse the curve."""
    life = life.select(
        F.col(t_col).cast("long").alias("t_days"),
        F.col(event_col).alias("_churned"),
    )
    per_t = life.groupBy("t_days").agg(
        F.count(F.lit(1)).cast("long").alias("_c"),
        F.sum(F.when(F.col("_churned"), 1).otherwise(0))
        .cast("long")
        .alias("d_churned"),
    )
    one = F.pmod(F.col("t_days"), F.lit(1))
    w_desc = W.partitionBy(one).orderBy(F.desc("t_days"))
    w_asc = W.partitionBy(one).orderBy(F.asc("t_days"))
    risked = per_t.select(
        "t_days",
        "d_churned",
        F.sum("_c")
        .over(w_desc.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("n_at_risk"),
    )
    term = (
        F.when(
            (F.col("d_churned") > 0)
            & (F.col("n_at_risk") > F.col("d_churned")),
            F.floor(
                F.log(
                    (F.col("n_at_risk") - F.col("d_churned")).cast("double")
                    / F.col("n_at_risk").cast("double")
                )
                * F.lit(float(ln_scale))
            ).cast("long"),
        )
        # every remaining user churned: S drops to 0 and ln is -inf;
        # pin the sentinel -100·scale (e^-100 ≈ 0) instead of flooring
        # -Infinity — deterministic on both engines
        .when(
            (F.col("d_churned") > 0)
            & (F.col("n_at_risk") == F.col("d_churned")),
            F.lit(-100 * ln_scale).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
    )
    curve = risked.select(
        "t_days",
        "n_at_risk",
        "d_churned",
        F.sum(term)
        .over(w_asc.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("survival_lnq"),
    )
    return (
        curve.where(F.col("d_churned") > 0)
        .select(
            "t_days",
            "n_at_risk",
            "d_churned",
            "survival_lnq",
            (F.col("survival_lnq").cast("double") / F.lit(float(ln_scale)))
            .alias("s_lnq_scaled"),
        )
        .orderBy("t_days")
    )
