"""Incremental + streaming corpus-drift monitor."""

import math

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from alerta_spark.ops.drift import incremental_drift_monitor, stream_drift_monitor

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_incremental_drift_seeds_then_scores(spark, tmp_path):
    store = str(tmp_path / "store")

    # first batch: store seeded, NULL jsd
    r1 = incremental_drift_monitor(
        spark, store, _docs(spark, [(1, "x y z x")])
    ).collect()[0]
    assert r1.jsd is None and r1.n_terms_a == 0 and r1.n_terms_b == 3

    # identical distribution -> jsd ~ 0
    r2 = incremental_drift_monitor(
        spark, store, _docs(spark, [(2, "x y z x")])
    ).collect()[0]
    assert r2.n_shared_terms == 3
    assert abs(r2.jsd) < 1e-8

    # disjoint batch vs the absorbed baseline -> ln 2
    r3 = incremental_drift_monitor(
        spark, store, _docs(spark, [(3, "p q r")])
    ).collect()[0]
    assert r3.n_shared_terms == 0
    assert abs(r3.jsd - math.log(2.0)) < 1e-8

    # update=False is a pure health check: same score twice
    r4 = incremental_drift_monitor(
        spark, store, _docs(spark, [(4, "p q")]), update=False
    ).collect()[0]
    r5 = incremental_drift_monitor(
        spark, store, _docs(spark, [(5, "p q")]), update=False
    ).collect()[0]
    assert r4.jsd == r5.jsd and r4.n_terms_a == r5.n_terms_a


def test_stream_drift_matches_batch_face(spark, tmp_path):
    """Two file waves through the streaming face produce the same
    reports as two calls to the batch face over the same data."""
    import json
    import os

    inp = tmp_path / "in"
    os.makedirs(inp)
    store_s = str(tmp_path / "store_s")
    reports = str(tmp_path / "reports")
    ck = str(tmp_path / "ck")

    def wave(name, rows):
        with open(inp / name, "w") as f:
            for i, t in rows:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        q = stream_drift_monitor(
            spark, str(inp), store_s, reports, ck, SCHEMA
        )
        q.awaitTermination(120)

    wave("a.jsonl", [(1, "x y z x")])
    wave("b.jsonl", [(2, "x y w")])

    got = sorted(
        spark.read.parquet(reports).collect(), key=lambda r: r.epoch_id
    )
    assert len(got) == 2
    assert got[0].jsd is None  # seeding wave

    # batch-face replica over the same two waves
    store_b = str(tmp_path / "store_b")
    incremental_drift_monitor(spark, store_b, _docs(spark, [(1, "x y z x")]))
    expect = incremental_drift_monitor(
        spark, store_b, _docs(spark, [(2, "x y w")])
    ).collect()[0]
    assert got[1].jsd == expect.jsd
    assert got[1].n_shared_terms == expect.n_shared_terms == 2


def test_compact_store_preserves_counts(spark, tmp_path):
    from alerta_spark.ops.drift import compact_store

    store = str(tmp_path / "store_c")
    incremental_drift_monitor(spark, store, _docs(spark, [(1, "x y x")]))
    incremental_drift_monitor(spark, store, _docs(spark, [(2, "x z")]))
    before = {
        (r.term, r.n)
        for r in spark.read.parquet(store)
        .groupBy("term")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    n_terms = compact_store(spark, store)
    after = {(r.term, r.n) for r in spark.read.parquet(store).collect()}
    assert n_terms == 3 and after == before == {("x", 3), ("y", 1), ("z", 1)}
