"""Multi-format corpus reading and streaming ingest-with-dedup."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Row
from pyspark.sql import types as T

from alerta_spark.ops.io import read_corpus, stream_ingest_dedup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_read_corpus_formats_agree(spark, tmp_path):
    rows = [{"doc_id": i, "text": f"document number {i}"} for i in range(10)]
    jl = str(tmp_path / "c.jsonl")
    _write_jsonl(jl, rows)
    cs = str(tmp_path / "c.csv")
    with open(cs, "w") as f:
        f.write("doc_id,text\n")
        for r in rows:
            f.write(f"{r['doc_id']},{r['text']}\n")
    pq = str(tmp_path / "c.parquet")
    spark.createDataFrame([Row(**r) for r in rows]).write.parquet(pq)

    a = read_corpus(spark, jl, schema=SCHEMA)
    b = read_corpus(spark, cs, schema=SCHEMA)
    c = read_corpus(spark, pq)
    want = {(r["doc_id"], r["text"]) for r in rows}
    for df in (a, b, c):
        assert {(r.doc_id, r.text) for r in df.collect()} == want


def test_read_corpus_text_lines(spark, tmp_path):
    p = str(tmp_path / "c.txt")
    with open(p, "w") as f:
        f.write("first line\nsecond line\n")
    df = read_corpus(spark, p)
    assert sorted(r.text for r in df.collect()) == ["first line", "second line"]
    assert df.columns == ["doc_id", "text"]


def test_stream_ingest_dedup_two_waves(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)

    # wave 1: one internal dup (3 dups 1 after normalization)
    _write_jsonl(
        f"{inbox}/w1.jsonl",
        [
            {"doc_id": 1, "text": "alpha beta"},
            {"doc_id": 2, "text": "gamma delta"},
            {"doc_id": 3, "text": "ALPHA   beta"},
        ],
    )
    q = stream_ingest_dedup(spark, inbox, store, out, ckpt, SCHEMA)
    q.awaitTermination(120)

    # wave 2: doc 4 dups doc 1 across waves via the store
    _write_jsonl(
        f"{inbox}/w2.jsonl",
        [
            {"doc_id": 4, "text": "alpha beta"},
            {"doc_id": 5, "text": "epsilon"},
        ],
    )
    q = stream_ingest_dedup(spark, inbox, store, out, ckpt, SCHEMA)
    q.awaitTermination(120)

    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 5]
    assert spark.read.parquet(store).count() == 3


def test_snapshot_diff_classifies_and_ignores_unchanged(spark):
    """added/removed/changed classified exactly; unchanged rows never
    surface; NULL-vs-empty content cannot collide (null tagging)."""
    from alerta_spark.ops.io import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "c", "z"), (4, "d", "w")],
        "doc_id long, text string, extra string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", ""), (5, "e", "v"), (4, "D", "w")],
        "doc_id long, text string, extra string",
    )
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}
