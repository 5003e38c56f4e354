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

from pyspark.sql import DataFrame
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
