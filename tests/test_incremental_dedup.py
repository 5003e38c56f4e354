"""Incremental corpus ingestion: batch-over-batch dedup against a
persistent fingerprint store must equal one-shot dedup of the union."""

from __future__ import annotations

from pyspark.sql import Row

from alerta_spark.ops.dedupe import incremental_dedup_ingest


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows]
    )


def test_two_batches_equal_one_shot(spark, tmp_path):
    store = str(tmp_path / "fps")
    b1 = _docs(spark, [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha  beta")])
    b2 = _docs(spark, [(4, "ALPHA beta"), (5, "epsilon"), (6, "epsilon")])

    kept1 = incremental_dedup_ingest(spark, store, b1)
    # batch 1: doc 3 is an exact dup (whitespace) of doc 1
    assert sorted(r.doc_id for r in kept1.collect()) == [1, 2]

    kept2 = incremental_dedup_ingest(spark, store, b2)
    # batch 2: doc 4 dups doc 1 (case) ACROSS batches via the store;
    # doc 6 dups doc 5 within the batch
    assert sorted(r.doc_id for r in kept2.collect()) == [5]

    # store now holds exactly the union's distinct fingerprints
    fps = spark.read.parquet(store)
    assert fps.count() == 3  # alpha-beta, gamma-delta, epsilon


def test_rerun_of_same_batch_adds_nothing(spark, tmp_path):
    store = str(tmp_path / "fps")
    b = _docs(spark, [(1, "one"), (2, "two")])
    assert incremental_dedup_ingest(spark, store, b).count() == 2
    # replay (retry semantics): nothing new survives, store unchanged
    assert incremental_dedup_ingest(spark, store, b).count() == 0
    assert spark.read.parquet(store).count() == 2


def test_bloom_fast_path_is_equivalent_and_idempotent(spark, tmp_path):
    """use_bloom=True produces IDENTICAL survivors (no false
    negatives), maintains the side filter, and stays replay-safe."""
    import os

    exact = str(tmp_path / "exact")
    fast = str(tmp_path / "fast")
    b1 = _docs(spark, [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha  beta")])
    b2 = _docs(spark, [(4, "ALPHA beta"), (5, "epsilon"), (6, "epsilon")])

    for store, flag in ((exact, False), (fast, True)):
        k1 = incremental_dedup_ingest(spark, store, b1, use_bloom=flag)
        k2 = incremental_dedup_ingest(spark, store, b2, use_bloom=flag)
        assert sorted(r.doc_id for r in k1.collect()) == [1, 2]
        assert sorted(r.doc_id for r in k2.collect()) == [5]

    assert os.path.isdir(fast + "_bloom")
    assert spark.read.parquet(fast).count() == 3
    # replay: zero survivors, filter and store unchanged in cardinality
    assert incremental_dedup_ingest(
        spark, fast, b2, use_bloom=True
    ).count() == 0
    assert spark.read.parquet(fast).count() == 3
