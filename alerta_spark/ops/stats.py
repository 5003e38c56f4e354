"""Robust numeric conditioning for training features.

`winsorize` clips a value column to per-group exact percentile bounds
— the standard outlier treatment before a numeric feature enters a
training set (clipping, unlike dropping, keeps the row and its other
columns). Bounds come from one exact-percentile aggregate per group
(small: one row per group), broadcast against the corpus scan, and
the clamp itself is pure codegen `least`/`greatest` — so the corpus
is touched exactly once, map-only after the tiny bounds join, the
same asymmetric shape as decontaminate/temperature_mix.

Exact percentile needs a per-group sort, which is fine for bounded
group counts; at 100 TB with huge groups swap the bounds query for
`percentile_approx` (same downstream plan — the clamp does not care
where the bounds came from).

Cross-engine determinism: Spark `percentile` and DuckDB
`quantile_cont` interpolate identically (`lo + (hi-lo)*frac`), and
the clamp picks one of two already-identical doubles — no new float
math — so the catalog entry is hash-checked.

Reference provenance: no analogue (the reference has no numeric
conditioning surface); training-data extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Clip ``value_col`` to the [lo, hi] exact-percentile band per
    group (or globally with ``group_cols=None``).

    Adds ``{value_col}_w`` (clipped value; NULL stays NULL) and
    ``clipped`` (boolean). One bounds aggregate + broadcast join +
    codegen clamp.
    """
    groups = group_cols or []
    bounds = (
        df.groupBy(*[F.col(g) for g in groups]).agg(
            F.percentile(value_col, F.array(F.lit(lo), F.lit(hi))).alias("_qb")
        )
        .select(
            *groups,
            F.element_at("_qb", 1).alias("_lo_b"),
            F.element_at("_qb", 2).alias("_hi_b"),
        )
    )
    joined = (
        df.join(F.broadcast(bounds), groups)
        if groups
        else df.crossJoin(F.broadcast(bounds))
    )
    v = F.col(value_col)
    clamped = F.least(F.greatest(v, F.col("_lo_b")), F.col("_hi_b"))
    return joined.select(
        *df.columns,
        F.when(v.isNull(), F.lit(None).cast("double"))
        .otherwise(clamped)
        .alias(f"{value_col}_w"),
        F.when(v.isNull(), F.lit(None).cast("boolean"))
        .otherwise((v < F.col("_lo_b")) | (v > F.col("_hi_b")))
        .alias("clipped"),
    )


def ols_trend(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-group simple linear regression y = intercept + slope*x from
    six exact moments in ONE aggregate — the grouped trend line
    (`regr_slope`/`regr_intercept` surface) in bit-reproducible form.

    ``x`` must be an exact-integer expression (a day index, an hour, a
    rank); ``y`` is a double measure. Both engines' streaming double
    aggregation is partition-order-dependent at the ulp, so the moments
    accumulate in DECIMAL/BIGINT (exact, associative, order-free):

        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
        intercept = (Sy - slope*Sx) / n
        r2        = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2))

    Each numerator is assembled exactly in DECIMAL, crosses to DOUBLE
    once, and the final expression is a fixed tree of identical doubles
    on every engine. Groups with zero x-variance yield NULL slope.

    Scale: one partial+final hash aggregate over the fact scan; output
    is one row per group. No window, no second scan.

    Reference provenance: no analogue (the reference has no numeric
    analytics surface); training-data/observability extension.
    """
    xd = x.cast("decimal(6,0)")
    yd = y.cast("decimal(14,6)")
    s = df.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("long")).cast("long").alias("sx"),
        F.sum(yd).cast("decimal(18,6)").alias("sy"),
        F.sum(xd * yd).cast("decimal(24,6)").alias("sxy"),
        F.sum(x.cast("long") * x.cast("long")).cast("long").alias("sxx"),
        F.sum(yd * yd).cast("decimal(28,12)").alias("syy"),
    )
    n8 = F.col("n").cast("decimal(8,0)")
    cov_num = (
        n8 * F.col("sxy")
        - F.col("sx").cast("decimal(12,0)") * F.col("sy")
    ).cast("string").cast("double")
    varx_num = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    vary_num = (
        n8 * F.col("syy") - F.col("sy") * F.col("sy")
    ).cast("string").cast("double")
    slope = F.when(varx_num > 0, cov_num / varx_num)
    syd = F.col("sy").cast("string").cast("double")
    nd = F.col("n").cast("double")
    intercept = (syd - slope * F.col("sx").cast("double")) / nd
    r2 = F.when(
        (varx_num > 0) & (vary_num > 0),
        (cov_num * cov_num) / (varx_num * vary_num),
    )
    return s.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def mann_kendall(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_q_col: str,
) -> DataFrame:
    """Per-group Mann-Kendall trend test, engine-exact: the
    nonparametric 'is this series monotonically trending' screen that
    needs no distribution assumption — the robust complement to
    :func:`ols_trend` (which a single spike can flip).

    S = Σ_{i<j} sign(x_j − x_i) over the series ordered by
    ``order_col`` — an exact BIGINT. The tie-corrected 18·Var(S)
    = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) is also exact BIGINT, so the
    only float is the final z = (S∓1)/sqrt(var18/18): a fixed tree of
    IEEE ops on identical integers on every engine.

    Scale: the pairwise self-join is O(n²) per group — by design this
    runs on PRE-AGGREGATED series (daily/hourly rollups, n ≲ a few
    thousand), where the heavy corpus work is the rollup that produced
    them. Both join sides shuffle once on the group key.

    ``value_q_col`` must be exact integers (quantize first).
    Public algorithm: Mann (1945), Kendall (1975).
    """
    # base feeds both self-join sides, the n count and the tie
    # aggregate — four consumers, each otherwise re-running the
    # caller's rollup (typically a full-corpus aggregate). The series
    # is pre-aggregated (n <= a few thousand per group), so tiny.
    base = df.select(
        *group_cols,
        F.col(order_col).alias("_t"),
        F.col(value_q_col).cast("long").alias("_x"),
    ).persist()
    i, j = base.alias("i"), base.alias("j")
    cond = [F.col(f"i.{g}") == F.col(f"j.{g}") for g in group_cols]
    d = F.col("j._x") - F.col("i._x")
    sgn = F.when(d > 0, 1).when(d < 0, -1).otherwise(0)
    s = (
        i.join(j, cond + [F.col("i._t") < F.col("j._t")])
        .groupBy(*[F.col(f"i.{g}").alias(g) for g in group_cols])
        .agg(F.sum(sgn).cast("long").alias("s"), F.count(F.lit(1)).alias("n_pairs"))
    )
    nrow = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    t = F.col("cnt")
    ties = (
        base.groupBy(*group_cols, "_x")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(*group_cols)
        .agg(F.sum(t * (t - 1) * (2 * t + 5)).cast("long").alias("tie18"))
    )
    n = F.col("n")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie18")).cast("long")
    sd = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("var18") <= 0, F.lit(0.0))
        .when(F.col("s") > 0, (F.col("s") - 1).cast("double") / sd)
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        s.join(nrow, group_cols)
        .join(ties, group_cols)
        .withColumn("var18", var18)
        .select(*group_cols, "n", "s", "var18", z.alias("z"))
    )


def theil_sen(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_q_col: str,
    slope_scale: int = 1_000_000,
) -> DataFrame:
    """Per-group Theil–Sen slope: the MEDIAN of all pairwise slopes
    (x_j − x_i)/(t_j − t_i) — the robust trend estimator with a 29%
    breakdown point (one wild day cannot move it, unlike OLS).

    Engine-exact: each pairwise slope is quantized as
    (dy · slope_scale) div dt — truncating BIGINT division, identical
    in Spark (`div`) and DuckDB (`//`) — and the lower median of
    integers is an exact row_number cut, so the result hash-checks.

    Same O(n²)-per-group contract as :func:`mann_kendall`: run it on
    pre-aggregated series. Output [*group_cols, n_pairs,
    median_slope_q] with slope in value-units × slope_scale per
    order-unit. Public algorithm: Theil (1950), Sen (1968).
    """
    from pyspark.sql import Window as W

    # both self-join sides re-ran the caller's rollup — persist the
    # tiny pre-aggregated series (mann_kendall discipline)
    base = df.select(
        *group_cols,
        F.col(order_col).cast("long").alias("_t"),
        F.col(value_q_col).cast("long").alias("_x"),
    ).persist()
    i, j = base.alias("i"), base.alias("j")
    cond = [F.col(f"i.{g}") == F.col(f"j.{g}") for g in group_cols]
    slope_q = F.expr(
        f"((j._x - i._x) * CAST({slope_scale} AS BIGINT)) div (j._t - i._t)"
    )
    pairs = i.join(j, cond + [F.col("i._t") < F.col("j._t")]).select(
        *[F.col(f"i.{g}").alias(g) for g in group_cols],
        slope_q.alias("slope_q"),
    )
    w = W.partitionBy(*group_cols).orderBy("slope_q")
    wc = W.partitionBy(*group_cols)
    ranked = pairs.select(
        *group_cols,
        "slope_q",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("n_pairs"),
    )
    return ranked.where(
        F.col("_rn") == F.expr("(n_pairs + 1) div 2")
    ).select(*group_cols, "n_pairs", F.col("slope_q").alias("median_slope_q"))


def interarrival_dispersion(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group burstiness of event inter-arrival times: Fano factor
    (variance-to-mean ratio of gaps; 1 = Poisson, >1 = bursty) and the
    Goh–Barabási burstiness B = (σ−μ)/(σ+μ) ∈ (−1, 1).

    Gaps are exact µs integers from a (ts, id)-ordered lag window; the
    three moments accumulate exactly (Σx BIGINT, Σx² DECIMAL(38,0)),
    and fano/B are fixed IEEE trees on those exact integers — the
    VARCHAR hop around DuckDB's rounding decimal→double cast keeps the
    final doubles bit-identical.

    One group-keyed exchange shared by the lag window and the
    aggregate. Output [*group_cols, n_gaps, sum_gap_us, fano, b].
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_cols).orderBy(ts_col, id_col)
    g = df.select(
        *group_cols,
        (F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w))
        .alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    agg = g.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("sum_gap_us"),
        F.sum(
            F.col("gap_us").cast("decimal(19,0)") * F.col("gap_us").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("sumsq"),
    )
    n = F.col("n_gaps").cast("decimal(38,0)")
    var_num = (
        (n * F.col("sumsq")
         - F.col("sum_gap_us").cast("decimal(38,0)")
         * F.col("sum_gap_us").cast("decimal(38,0)"))
        .cast("string").cast("double")
    )
    nd = F.col("n_gaps").cast("double")
    sd_ = F.col("sum_gap_us").cast("double")
    mean = sd_ / nd
    # sample variance: var_num / (n*(n-1)); fano = var/mean
    fano = F.when(
        (F.col("n_gaps") > 1) & (F.col("sum_gap_us") > 0),
        var_num / (nd * (nd - F.lit(1.0))) / mean,
    )
    sigma = F.when(F.col("n_gaps") > 1, F.sqrt(var_num / (nd * (nd - F.lit(1.0)))))
    b = F.when(
        (F.col("n_gaps") > 1) & ((sigma + mean) > 0),
        (sigma - mean) / (sigma + mean),
    )
    return agg.select(
        *group_cols, "n_gaps", "sum_gap_us", fano.alias("fano"), b.alias("b")
    )


def sprt_constants(
    p0: float = 0.3, p1: float = 0.4, alpha: float = 0.05, beta: float = 0.05
) -> dict:
    """Wald SPRT increments/boundaries as quantized-ln BIGINT
    literals (math.log once, embedded identically everywhere the test
    runs — batch catalog query, incremental monitor, oracle SQL)."""
    import math

    q = 1_000_000
    return {
        "w1": math.floor(math.log(p1 / p0) * q),
        "w0": math.floor(math.log((1 - p1) / (1 - p0)) * q),
        "a": math.floor(math.log((1 - beta) / alpha) * q),
        "b": math.floor(math.log(beta / (1 - alpha)) * q),
    }


def sprt_scan(
    df: DataFrame,
    k: dict | None = None,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    x_col: str = "x",
    llr_offset: DataFrame | None = None,
) -> DataFrame:
    """One SPRT pass per key over a 0/1 outcome stream: BIGINT LLR
    cumsum in event order, decision at the first boundary crossing.
    ``llr_offset`` (key, llr0, n0) shifts the cumsum — the resume
    hook the incremental monitor uses so a continued stream decides
    at the same event as a single scan would.

    -> [key, n_total, n_at_decision, llr_q_at_decision, llr_q_final,
        decision]."""
    from pyspark.sql import Window as W

    k = k or sprt_constants()
    w = W.partitionBy(key_col).orderBy(ts_col, id_col)
    run = df.select(
        F.col(key_col),
        F.row_number().over(w).alias("rn"),
        F.sum(
            F.col(x_col) * F.lit(k["w1"])
            + (1 - F.col(x_col)) * F.lit(k["w0"])
        )
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("llr_raw"),
    )
    if llr_offset is not None:
        run = (
            run.join(F.broadcast(llr_offset), key_col, "left")
            .select(
                key_col,
                (F.col("rn") + F.coalesce("n0", F.lit(0))).alias("rn"),
                (F.col("llr_raw") + F.coalesce("llr0", F.lit(0))).alias(
                    "llr_q"
                ),
            )
        )
    else:
        run = run.select(key_col, "rn", F.col("llr_raw").alias("llr_q"))
    crossed = run.select(
        "*",
        (
            (F.col("llr_q") >= F.lit(k["a"]))
            | (F.col("llr_q") <= F.lit(k["b"]))
        ).alias("hit"),
    )
    # ONE aggregate over the cumsum stream instead of three consumers
    # (first-crossing agg, totals agg, at-decision lookup join) — the
    # key-ordered window pass over the corpus runs once, and the two
    # joins disappear. min/max_by ignore NULL ordering keys, so keys
    # that never cross yield NULL n/llr_at_decision exactly like the
    # old left joins.
    hit_rn = F.when(F.col("hit"), F.col("rn"))
    out = crossed.groupBy(key_col).agg(
        F.max("rn").cast("long").alias("n_total"),
        F.min(hit_rn).cast("long").alias("n_at_decision"),
        F.min_by("llr_q", hit_rn).cast("long").alias("llr_q_at_decision"),
        F.max_by("llr_q", "rn").cast("long").alias("llr_q_final"),
    )
    return out.select(
        key_col,
        "n_total",
        "n_at_decision",
        "llr_q_at_decision",
        "llr_q_final",
        F.when(F.col("llr_q_at_decision") >= F.lit(k["a"]), "reject_h0")
        .when(F.col("llr_q_at_decision") <= F.lit(k["b"]), "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


def incremental_sprt_monitor(
    spark,
    store_path: str,
    batch: DataFrame,
    k: dict | None = None,
    **scan_kwargs,
) -> DataFrame:
    """Sequential-testing face of the incremental-store pattern: the
    tiny per-key state (llr total, events seen, first decision) is a
    key-sized OVERWRITE snapshot (unlike the append-only count
    stores, SPRT state is order-dependent, so partials don't merge —
    but the state IS a prefix summary, so resuming with the stored
    (llr0, n0) offset decides at exactly the event a single scan
    would; pinned in test_stats). Keys already decided stay frozen —
    Wald's stopping rule, enforced across batches."""
    from pyspark.errors import AnalysisException

    k = k or sprt_constants()
    key_col = scan_kwargs.get("key_col", "event_type")
    try:
        prev = spark.read.parquet(store_path)
        have = True
    except AnalysisException:
        prev = None
        have = False
    offset = (
        prev.select(
            key_col,
            F.col("llr_q_final").alias("llr0"),
            F.col("n_total").alias("n0"),
        )
        if have
        else None
    )
    scanned = sprt_scan(batch, k, llr_offset=offset, **scan_kwargs)
    if have:
        # frozen keys keep their first decision; undecided keys take
        # the continued scan's result; new keys append
        dec = prev.where(F.col("decision") != "continue")
        merged = scanned.join(
            dec.select(key_col).withColumn("_d", F.lit(1)), key_col, "left"
        ).where(F.col("_d").isNull()).drop("_d").unionByName(dec)
    else:
        merged = scanned
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(store_path)
    return merged


def stream_sprt_monitor(
    spark,
    input_path: str,
    store_path: str,
    checkpoint: str,
    schema,
    k: dict | None = None,
    fmt: str = "json",
    available_now: bool = True,
    **scan_kwargs,
):
    """Streaming face: each arriving micro-batch advances the
    monitors via foreachBatch (X63/X192 pairing). Note the
    batch-boundary semantics: decisions are evaluated on the ordered
    stream WITHIN each batch continuation, identical to one scan when
    batches arrive time-ordered."""
    stream = spark.readStream.format(fmt).schema(schema).load(input_path)

    def _epoch(df, epoch_id):
        incremental_sprt_monitor(spark, store_path, df, k, **scan_kwargs)

    writer = stream.writeStream.foreachBatch(_epoch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
