"""Incrementally-maintained time-bucket rollups (continuous aggregates).

A 100 TB events lake cannot re-aggregate history every 15 minutes; the
scale answer is a materialized rollup maintained from deltas:

- store PARTIAL aggregates per (time bucket, dimension) — count, sum,
  min, max are all commutative+associative, so partials combine by a
  second aggregation with no loss;
- a new micro-batch touches only the buckets it contains: combine the
  delta's partials with the stored partials for THOSE buckets and
  dynamically overwrite just those partitions (everything older is
  untouched — write amplification is bounded by the data's lateness,
  i.e. the watermark, not by history size);
- finalize (avg = sum/count, etc.) only at read time.

The reference has no rollup story (every cron run re-scans the lake
window, alerta.py:136-146); this is the Spark-native upgrade for any
aggregate consumed repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket_start"
DIM_COL = "event_type"


def rollup_partials(
    events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Partial aggregates per (time bucket, event_type): the stored
    representation. DECIMAL sum keeps the combine bit-exact regardless
    of merge order."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), bucket).getField("start").alias(BUCKET_COL),
            F.col(DIM_COL),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(20,2)")).alias("sum_value"),
            F.min(ts_col).alias("min_ts"),
            F.max(ts_col).alias("max_ts"),
        )
    )


def combine_partials(*parts: DataFrame) -> DataFrame:
    """Merge partial-aggregate frames (idempotent algebra: count/sum
    add, min/max fold). Union + one re-aggregation — the same shape
    Spark's own partial/final aggregation uses across partitions."""
    it = iter(parts)
    u = next(it)
    for p in it:
        u = u.unionByName(p)
    return u.groupBy(BUCKET_COL, DIM_COL).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_ts").alias("min_ts"),
        F.max("max_ts").alias("max_ts"),
    )


def finalize_rollup(partials: DataFrame) -> DataFrame:
    """Read-time projection over stored partials."""
    return partials.select(
        BUCKET_COL,
        DIM_COL,
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.round(F.col("sum_value").cast("double") / F.col("n"), 6).alias("avg_value"),
        "min_ts",
        "max_ts",
    )


def maintain_rollup(
    spark: SparkSession,
    path: str,
    delta_events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
) -> None:
    """Fold a delta into the stored rollup, rewriting ONLY the buckets
    the delta touches (dynamic partition overwrite). Cost per batch is
    O(delta + affected buckets), independent of history size."""
    import os

    delta = rollup_partials(delta_events, bucket, ts_col, value_col)
    exists = os.path.isdir(path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(path)
    )
    if exists:
        existing = spark.read.parquet(path)
        touched = delta.select(BUCKET_COL).distinct()
        affected = existing.join(F.broadcast(touched), BUCKET_COL, "left_semi")
        merged = combine_partials(affected, delta)
    else:
        merged = delta

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(path)
        )
    finally:
        spark.conf.set(mode_key, prev)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return finalize_rollup(spark.read.parquet(path))


# ---------------------------------------------------------------------------
# Incremental maintenance of an aggregate-over-JOIN view


def join_view_partials(
    delta_orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Partials of the revenue-by-nation JOIN view for one delta batch
    of orders -> [n_name, revenue_d (DECIMAL), n_items].

    Incremental view maintenance for aggregates over joins: when a
    batch of new orders lands, only THOSE orders' lineitems are
    scanned (the delta predicate pushes through the o_orderkey join),
    dims broadcast, and the delta aggregate merges into the stored
    view by addition — O(delta) per refresh instead of re-joining the
    full 100 TB fact history. Sound because (a) the join is key-
    preserving per order (each lineitem matches exactly one order /
    customer / nation row) and (b) the partial measures are DECIMAL
    sums and counts — exact and associative, so any batch split folds
    to the bit-identical view (pinned in test_rollup and by the
    catalog oracle, which recomputes monolithically).
    """
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    return (
        lineitem.join(
            delta_orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .alias("revenue_d"),
            F.count("*").alias("n_items"),
        )
    )


def combine_join_view(*parts: DataFrame) -> DataFrame:
    """Merge join-view partials by addition (exact: DECIMAL + BIGINT)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("n_name").agg(
        F.sum("revenue_d").alias("revenue_d"),
        F.sum("n_items").cast("long").alias("n_items"),
    )


def finalize_join_view(partials: DataFrame) -> DataFrame:
    """One final DOUBLE cast for serving; partials stay DECIMAL."""
    return partials.select(
        "n_name",
        F.col("revenue_d").cast("double").alias("revenue"),
        "n_items",
    )
