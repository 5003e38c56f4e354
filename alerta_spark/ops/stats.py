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
