"""Point-in-time feature-store snapshot over an event stream.

The table every churn/propensity model trains on: one row per entity
with trailing-window behavioral aggregates AS OF a cutoff instant.
The classic implementation sin is one scan per window per feature;
the Spark-first shape is ONE scan with every (window, feature) pair a
conditional aggregate column — `sum(CASE WHEN ts >= cutoff - w ...)`
— so a 40-feature snapshot costs exactly one exchange on the entity
key, and Catalyst prunes the scan to the referenced columns.

Leakage discipline: every aggregate is bounded by ``ts < cutoff``
(events AT or AFTER the cutoff are the label horizon, never
features). Pair with scd2_point_in_time_join for dimension features;
this op is the behavioral side.

Reference provenance: no analogue; training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: Column | str,
    id_col: str,
) -> DataFrame:
    """Leave-one-out target encoding: each row's category encoded as
    the mean target of the OTHER rows in its category — the standard
    high-cardinality categorical feature that a naive whole-category
    mean would leak (a row would see its own label). All sums/counts
    exact BIGINT window aggregates sharing ONE category exchange; the
    mean is a single final IEEE division. Categories of size 1 emit
    NULL (no peers to average).

    Shape note: NOT a window over the category — a category column
    worth encoding has few distinct values, so partitionBy(cat) makes
    one giant partition per category (the classic window-skew trap at
    100 TB). The per-category totals are a tiny partial-aggregated
    frame broadcast back onto the rows: map-side combine + broadcast
    join, zero row-frame shuffle.

    -> [id_col, cat_col, target(0/1 long), loo_enc double]."""
    t = (
        target_col
        if isinstance(target_col, Column)
        else F.col(target_col)
    ).cast("long")
    # base feeds the category totals and the row-level encode join;
    # deliberately NOT persisted — row-sized frame whose subtree is a
    # scan (+ caller's broadcast join): caching measured cold-worse at
    # local[32] (features_target_encoding_loo rep0 1.68 -> 2.12 s
    # ABBA; the persist serializes what idle cores amortize)
    base = df.select(F.col(id_col), F.col(cat_col), t.alias("target"))
    tot = base.groupBy(cat_col).agg(
        F.sum("target").cast("long").alias("_cat_sum"),
        F.count(F.lit(1)).cast("long").alias("_cat_n"),
    )
    return base.join(F.broadcast(tot), cat_col).select(
        id_col,
        cat_col,
        "target",
        F.when(
            F.col("_cat_n") > 1,
            (F.col("_cat_sum") - F.col("target")).cast("double")
            / (F.col("_cat_n") - 1).cast("double"),
        ).alias("loo_enc"),
    )


def feature_snapshot(
    df: DataFrame,
    cutoff,
    windows_days: list[int] = [7, 30],
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per ``key_col`` with trailing-window features as of
    ``cutoff`` (exclusive). Per window w: event count, exact value sum
    in cents, distinct active days, distinct event types; plus global
    recency (days since last pre-cutoff event) and tenure (days since
    first). All counts exact integers; value sums exact DECIMAL→cents.
    """
    cut = F.lit(cutoff).cast("timestamp")
    base = df.where(F.col(ts_col) < cut)

    def in_w(w: int) -> Column:
        return F.col(ts_col) >= F.date_sub(cut, w)

    aggs: list[Column] = []
    for w in windows_days:
        flag = in_w(w)
        aggs += [
            F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias(f"n_{w}d"),
            F.sum(
                F.when(flag, F.col(value_col).cast("decimal(14,2)")).otherwise(
                    F.lit(0).cast("decimal(14,2)")
                )
            ).cast("decimal(18,2)").alias(f"_v{w}"),
            F.countDistinct(
                F.when(flag, F.col(ts_col).cast("date"))
            ).cast("long").alias(f"active_days_{w}d"),
            F.countDistinct(
                F.when(flag, F.col(type_col))
            ).cast("long").alias(f"n_types_{w}d"),
        ]
    aggs += [
        F.max(ts_col).alias("_last"),
        F.min(ts_col).alias("_first"),
    ]
    snap = base.groupBy(key_col).agg(*aggs)
    out_cols: list[Column] = [F.col(key_col)]
    for w in windows_days:
        out_cols += [
            F.col(f"n_{w}d"),
            (F.col(f"_v{w}") * 100).cast("long").alias(f"value_cents_{w}d"),
            F.col(f"active_days_{w}d"),
            F.col(f"n_types_{w}d"),
        ]
    out_cols += [
        F.datediff(cut.cast("date"), F.col("_last").cast("date"))
        .cast("long")
        .alias("days_since_last"),
        F.datediff(cut.cast("date"), F.col("_first").cast("date"))
        .cast("long")
        .alias("tenure_days"),
    ]
    return snap.select(*out_cols)


def feature_partials(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Mergeable day-grain partials for the incremental feature store:
    one row per (key, day, event_type) with exact count + cent sum.
    Every snapshot feature is an algebra over this grain — counts and
    cents are sums, active_days is countDistinct(day), n_types is
    countDistinct(type), recency/tenure are max/min(day) — so two
    stores built from any split of the input merge by simple
    aggregation, and a daily update touches only the new day's rows
    (O(delta), the X28/X63 append-only discipline)."""
    return df.groupBy(
        F.col(key_col),
        F.col(ts_col).cast("date").alias("day"),
        F.col(type_col).alias("event_type"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col(value_col).cast("decimal(14,2)") * 100).cast("long")
        )
        .cast("long")
        .alias("cents"),
    )


def update_feature_store(
    spark,
    store_path: str,
    batch: DataFrame,
    **partial_kwargs,
) -> int:
    """Append a batch's day-grain partials to the persistent store
    (append-only parquet; reads aggregate, updates never
    read-modify-overwrite — same exactly-once caveat as
    ops/drift.incremental_drift_monitor: a crash between sink writes
    can double-append on redelivery). Returns partial rows written."""
    p = feature_partials(batch, **partial_kwargs).localCheckpoint(
        eager=True
    )
    p.write.mode("append").parquet(store_path)
    return p.count()


def feature_snapshot_from_store(
    spark,
    store_path: str,
    cutoff,
    windows_days: list[int] = [7, 30],
    key_col: str = "user_id",
) -> DataFrame:
    """Point-in-time snapshot served FROM the partial store — same
    output schema and (at day-boundary cutoffs) identical values to
    the batch :func:`feature_snapshot` over the raw events, pinned by
    test_features. Day grain means cutoffs resolve to midnight; the
    trailing windows are day-range filters over partials, so serving
    cost scales with (keys x days x types), not raw event volume."""
    cut = F.lit(cutoff).cast("timestamp")
    cut_day = cut.cast("date")
    store = (
        spark.read.parquet(store_path)
        .groupBy(key_col, "day", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .where(F.col("day") < cut_day)
    )

    aggs = []
    for w in windows_days:
        flag = F.col("day") >= F.date_sub(cut_day, w)
        aggs += [
            F.sum(F.when(flag, F.col("n")).otherwise(0))
            .cast("long")
            .alias(f"n_{w}d"),
            F.sum(F.when(flag, F.col("cents")).otherwise(0))
            .cast("long")
            .alias(f"value_cents_{w}d"),
            F.countDistinct(F.when(flag, F.col("day")))
            .cast("long")
            .alias(f"active_days_{w}d"),
            F.countDistinct(F.when(flag, F.col("event_type")))
            .cast("long")
            .alias(f"n_types_{w}d"),
        ]
    aggs += [F.max("day").alias("_last"), F.min("day").alias("_first")]
    snap = store.groupBy(key_col).agg(*aggs)
    out = [F.col(key_col)]
    for w in windows_days:
        out += [
            F.col(f"n_{w}d"),
            F.col(f"value_cents_{w}d"),
            F.col(f"active_days_{w}d"),
            F.col(f"n_types_{w}d"),
        ]
    out += [
        F.datediff(cut_day, F.col("_last")).cast("long").alias(
            "days_since_last"
        ),
        F.datediff(cut_day, F.col("_first")).cast("long").alias(
            "tenure_days"
        ),
    ]
    return snap.select(*out)


def stream_feature_updates(
    spark,
    input_path: str,
    store_path: str,
    checkpoint: str,
    schema,
    fmt: str = "json",
    available_now: bool = True,
    **partial_kwargs,
):
    """Streaming face: each arriving event-file batch folds into the
    partial store via foreachBatch append — one feature-store
    implementation shared by backfills and the live stream (the
    drift-monitor pairing, X63)."""
    stream = spark.readStream.format(fmt).schema(schema).load(input_path)

    def _epoch(df, epoch_id):
        update_feature_store(spark, store_path, df, **partial_kwargs)

    writer = stream.writeStream.foreachBatch(_epoch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_feature_store(spark, store_path: str) -> int:
    """Offline compaction: rewrite the append-only partials as one
    aggregated (key, day, type) snapshot. Returns row count after."""
    agg = (
        spark.read.parquet(store_path)
        .groupBy("user_id", "day", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .localCheckpoint(eager=True)
    )
    agg.write.mode("overwrite").parquet(store_path)
    return agg.count()
