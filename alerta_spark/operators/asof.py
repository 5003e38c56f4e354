"""As-of (temporal) join — an operator Spark lacks natively,
composed from built-ins (SURVEY.md steering: composition first, UDF
only if semantics demand it).

``as_of_join(left, right, ...)``: for every left row, attach the most
recent right row with ``right_ts <= left_ts`` (optionally within a
tolerance) for the same key — the classic trades/quotes /
event-enrichment join.

Implementation: the union trick. Tag both sides, union them, and take
``last_value(right payload) IGNORE NULLS`` over a window partitioned by
key and ordered by (ts, side) — one shuffle on the key, no row
explosion, no range cross-product. This scales as a single window sort
per key partition, which survives a 100x scale-up where a naive
inequality join degenerates into a broadcast nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.right_ts <= left.left_ts`` on the same ``on`` key; NULLs
    when no prior right row exists (left outer semantics). With
    ``tolerance`` (e.g. ``'7 days'``), matches older than
    ``left_ts - tolerance`` are discarded.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
                ).alias("_r")
            ).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("_l")
            ).schema["_l"].dataType
        ).alias("_l"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
        ).alias("_r"),
    )

    # right rows sort before left rows at equal ts (side 0 < 1), so a
    # right row AT the left timestamp matches (<= semantics)
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )

    out = unioned.where(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_match",
            F.when(
                F.col("_match._rts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}"),
                F.col("_match"),
            ),
        )
    cols: list[Column] = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    cols.append(F.col("_match._rts").alias(f"{right_ts}{suffix}"))
    cols.extend(
        F.col(f"_match.{c}").alias(c if c not in left.columns else f"{c}{suffix}")
        for c in right_cols
    )
    return out.select(*cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """Interval containment join: left rows whose ``left_ts`` falls in
    ``[right.lower, right.upper)`` for the same key. Expressed as an
    equi-join on the key plus a range residual, so Catalyst executes a
    hash/sort-merge join on the key with the range as a cheap filter —
    NOT a nested-loop over the cross product."""
    r = right.select(
        F.col(on).alias("_k"), *[c for c in right.columns if c != on]
    )
    cond = (
        (left[on] == r["_k"])
        & (left[left_ts] >= r[lower])
        & (left[left_ts] < r[upper])
    )
    return left.join(r, cond, "inner").drop("_k")
