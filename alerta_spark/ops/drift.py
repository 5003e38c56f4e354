"""Incremental corpus-drift monitoring.

The batch JSD (`ops.text.token_js_divergence`) compares two corpora
you already hold. A live ingestion pipeline instead wants: "how far is
TODAY'S batch from everything accepted so far?" — answered here with a
persistent term-count store and the same exact-integer JSD math.

Store layout (the mergeable-partials pattern, same family as the HLL
rollup in ops/sketches): an append-only parquet of (term, n) partial
counts; reads aggregate with ``groupBy(term).sum`` — so the store
update is a cheap append, never a read-modify-overwrite race, and a
backfill batch and the live stream can feed one store concurrently.
Compact it offline by rewriting the aggregated view when partial
files accumulate.

Exactly-once note (same contract as ops/io.stream_ingest_dedup): the
report append and the store append are two writes; a crash between
them can double-append a batch's counts on re-delivery — drift scores
then weight that batch twice (a bounded bias, not a correctness
failure of the report already written). For stricter semantics stage
both writes behind a manifest.

Reference provenance: no analogue (the reference has no corpus tier);
training-data extension surface, composing X48 (JSD) with the
X28-style persistent-store ingestion pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _term_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from alerta_spark.ops.text import _lm_terms

    return (
        _lm_terms(df, text_col, id_col)
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )


def incremental_drift_monitor(
    spark,
    store_path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    update: bool = True,
    quant: int = 1_000_000_000,
) -> DataFrame:
    """Score a new batch's unigram distribution against the persisted
    baseline store (JSD; 0 = same mix, ln 2 = disjoint), then append
    the batch's counts so the baseline absorbs it.

    Returns the 1-row report
    (n_terms_a, n_terms_b, n_shared_terms, jsd) — side a is the
    baseline, side b the batch. On the FIRST batch (no store yet) the
    report row carries NULL jsd and zero baseline terms; the store is
    still seeded. ``update=False`` scores without absorbing (a pure
    health check)."""
    from pyspark.errors import AnalysisException
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from alerta_spark.ops.text import js_divergence_from_counts

    batch = _term_counts(new_docs, text_col, id_col).localCheckpoint(
        eager=True
    )
    try:
        baseline = (
            spark.read.parquet(store_path)
            .groupBy("term")
            .agg(F.sum("n").alias("_a"))
        )
        report = js_divergence_from_counts(
            baseline, batch.select("term", F.col("n").alias("_b")), quant
        )
    except AnalysisException:  # first batch: store does not exist yet
        schema = StructType(
            [
                StructField("n_terms_a", LongType()),
                StructField("n_terms_b", LongType()),
                StructField("n_shared_terms", LongType()),
                StructField("jsd", DoubleType()),
            ]
        )
        first = batch.agg(F.count(F.lit(1)).alias("n_terms_b")).first()
        report = spark.createDataFrame(
            [(0, first["n_terms_b"], 0, None)], schema
        )
    # Materialize BEFORE the store append: the report's baseline scan
    # is lazy, and refreshByPath after the append would otherwise make
    # a later collect() score the batch against itself.
    report = report.localCheckpoint(eager=True)
    from alerta_spark.ops.dedupe import release_cached

    release_cached()
    if update:
        batch.write.mode("append").parquet(store_path)
    return report


def stream_drift_monitor(
    spark,
    input_path: str,
    store_path: str,
    reports_path: str,
    checkpoint: str,
    schema,
    fmt: str = "json",
    available_now: bool = True,
):
    """Streaming face: each arriving corpus file batch is scored
    against the store, the report row (stamped with the epoch id) is
    appended to ``reports_path``, and the batch is absorbed — one
    drift implementation shared by backfills and the live stream,
    exactly like the dedup-ingest pair in ops/io."""
    stream = spark.readStream.format(fmt).schema(schema).load(input_path)

    def _epoch(df, epoch_id):
        report = incremental_drift_monitor(spark, store_path, df)
        report.withColumn("epoch_id", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(reports_path)

    writer = stream.writeStream.foreachBatch(_epoch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_store(spark, store_path: str) -> int:
    """Rewrite the append-only partial-count store as one aggregated
    (term, n) snapshot — run offline when partial files accumulate.
    Returns the number of distinct terms after compaction.

    The aggregate is materialized (localCheckpoint) before the
    overwrite so the write never scans the path it is replacing."""
    agg = (
        spark.read.parquet(store_path)
        .groupBy("term")
        .agg(F.sum("n").alias("n"))
        .localCheckpoint(eager=True)
    )
    agg.write.mode("overwrite").parquet(store_path)
    return agg.count()
