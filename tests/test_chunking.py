"""Chunking, packing, and vocabulary semantics + plan-shape guards."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from alerta_spark.ops.chunking import chunk_documents, pack_sequences
from alerta_spark.ops.text import vocab_top_terms


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source=s) for i, (t, s) in enumerate(rows)]
    )


def test_chunk_exact_windows(spark):
    # 10 tokens, size 4, overlap 1 -> stride 3 -> starts at 0,3,6 ->
    # [t0..t3],[t3..t6],[t6..t9]
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, [(text, "a")]), chunk_size=4, overlap=1
    ).orderBy("chunk_id")
    rows = out.collect()
    assert [r.chunk_text for r in rows] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
    ]
    assert [r.chunk_tokens for r in rows] == [4, 4, 4]


def test_chunk_short_doc_and_ragged_tail(spark):
    out = chunk_documents(
        _docs(spark, [("a b", "s"), ("one two three four five", "s")]),
        chunk_size=3,
        overlap=1,
    )
    by_doc = {
        (r.doc_id, r.chunk_id): r.chunk_text for r in out.collect()
    }
    assert by_doc[(0, 0)] == "a b"  # short doc: one chunk, no padding
    # 5 tokens size 3 stride 2 -> [1-3],[3-5]
    assert by_doc[(1, 0)] == "one two three"
    assert by_doc[(1, 1)] == "three four five"
    assert len(by_doc) == 3


def test_chunk_empty_doc_dropped_and_whitespace_robust(spark):
    out = chunk_documents(
        _docs(spark, [("   ", "s"), ("  x \n y\tz ", "s")]),
        chunk_size=10,
        overlap=0,
    ).collect()
    assert len(out) == 1
    assert out[0].doc_id == 1 and out[0].chunk_text == "x y z"


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [("x", "s")]), chunk_size=4, overlap=4)


def test_chunk_coverage_property(spark):
    """Every token position of every doc is covered by >= 1 chunk and
    consecutive chunks overlap by exactly `overlap` (except a ragged
    final chunk)."""
    texts = [
        (" ".join(f"w{i}" for i in range(n)), "s") for n in (1, 7, 8, 9, 30)
    ]
    out = chunk_documents(
        _docs(spark, texts), chunk_size=8, overlap=3
    ).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, (text, _) in enumerate(texts):
        n = len(text.split())
        chunks = sorted(per_doc[doc_id], key=lambda r: r.chunk_id)
        covered = set()
        for r in chunks:
            start = r.chunk_id * 5  # stride = 8 - 3
            covered.update(range(start, start + r.chunk_tokens))
            assert r.chunk_tokens <= 8
        assert covered == set(range(n))


def test_pack_stream_invariants(spark):
    rows = [(" ".join(["w"] * n), src) for n, src in
            [(5, "a"), (9, "a"), (3, "a"), (120, "b"), (2, "b")]]
    out = pack_sequences(
        _docs(spark, rows), budget=10, shards=1
    ).orderBy("source", "doc_id").collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, docs in by_src.items():
        cum = 0
        for r in docs:
            assert r.offset_in_seq == cum % 10
            assert r.first_seq == cum // 10
            last = cum + max(r.n_tokens - 1, 0)
            assert r.seqs_spanned == last // 10 - cum // 10 + 1
            assert 0 <= r.offset_in_seq < 10
            cum += r.n_tokens
    # the 120-token doc straddles many sequences
    big = next(r for r in out if r.n_tokens == 120)
    assert big.seqs_spanned == 12


def test_pack_md5_sharding_matches_python(spark):
    out = pack_sequences(
        _docs(spark, [("x y z", "s")] * 50), budget=8, shards=4
    ).collect()
    for r in out:
        expect = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4], 16) % 4
        assert r.shard == expect
    assert {r.shard for r in out} == {0, 1, 2, 3}


def test_pack_precomputed_token_col(spark):
    df = _docs(spark, [("ignored", "s")] * 3).withColumn(
        "ntok", F.lit(7)
    )
    out = pack_sequences(
        df, budget=10, shards=1, token_col="ntok"
    ).orderBy("doc_id").collect()
    assert [r.n_tokens for r in out] == [7, 7, 7]
    assert [r.offset_in_seq for r in out] == [0, 7, 4]
    assert [r.first_seq for r in out] == [0, 0, 1]


def test_vocab_counts_and_tiebreak(spark):
    docs = _docs(
        spark,
        [
            ("the cat and the dog", "s"),
            ("the cat runs", "s"),
            ("Dog! dog, CAT?", "s"),
        ],
    )
    out = vocab_top_terms(docs, top_n=3).collect()
    # tf: the=3, cat=3, dog=3, and=1, runs=1 -> top3 by (tf desc, term asc)
    assert [(r.term, r.tf, r.doc_freq) for r in out] == [
        ("cat", 3, 3),
        ("dog", 3, 2),
        ("the", 3, 2),
    ]


def test_chunk_plan_no_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Generate") == 1


def test_pack_plan_single_exchange(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = pack_sequences(docs, shards=2)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_length_buckets_cover_and_order(spark):
    from pyspark.sql import Row

    from alerta_spark.ops.chunking import length_buckets

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * n)) for i, n in enumerate(
            [1, 2, 3, 4, 5, 10, 20, 40, 80, 160, 320, 640]
        )]
    )
    out = length_buckets(df, n_buckets=4).collect()
    # exhaustive: every doc in exactly one bucket
    assert sum(r.n_docs for r in out) == 12
    # buckets ordered by length range, non-overlapping
    rows = sorted(out, key=lambda r: r.bucket)
    for a, b in zip(rows, rows[1:]):
        assert a.max_len <= b.min_len
    # waste in [0, 1); a bucket batched to its max wastes < 100%
    assert all(0.0 <= r.pad_waste < 1.0 for r in rows)


def test_ffd_packing_validity_and_bound(spark):
    """Every bin holds <= budget tokens (oversize bins are dedicated
    singletons); bin count meets the FFD 11/9*OPT+1 bound; rerun is
    identical."""
    from alerta_spark.ops.chunking import pack_sequences_ffd
    import math

    docs = spark.createDataFrame(
        [(i, "s", (i * 37) % 90 + 10) for i in range(200)]
        + [(900, "s", 150)],  # oversize (budget 128)
        "doc_id long, source string, n_tok long",
    )
    out = pack_sequences_ffd(
        docs, budget=128, token_col="n_tok", partition_col="source"
    )
    rows = out.collect()
    assert len(rows) == 201
    fills: dict[tuple, int] = {}
    for r in rows:
        k = (r["source"], r["shard"], r["seq_idx"])
        fills[k] = fills.get(k, 0) + r["n_tokens"]
        if r["oversize"]:
            assert r["n_tokens"] > 128
    for k, tot in fills.items():
        n_docs_in_bin = sum(
            1
            for r in rows
            if (r["source"], r["shard"], r["seq_idx"]) == k
        )
        if tot > 128:
            assert n_docs_in_bin == 1  # dedicated oversize bin
    total = sum(r["n_tokens"] for r in rows if not r["oversize"])
    opt_lb = math.ceil(total / 128)
    n_bins = len({
        (r["source"], r["shard"], r["seq_idx"])
        for r in rows
        if not r["oversize"]
    })
    assert n_bins <= math.ceil(11 / 9 * opt_lb) + 1
    again = {
        (r["doc_id"], r["seq_idx"], r["oversize"])
        for r in pack_sequences_ffd(
            docs, budget=128, token_col="n_tok", partition_col="source"
        ).collect()
    }
    assert again == {(r["doc_id"], r["seq_idx"], r["oversize"]) for r in rows}


def test_ffd_never_splits_and_shards_partition_stream(spark):
    from alerta_spark.ops.chunking import pack_sequences_ffd

    docs = spark.createDataFrame(
        [(i, "a", 60) for i in range(40)],
        "doc_id long, source string, n_tok long",
    )
    out = pack_sequences_ffd(
        docs, budget=128, token_col="n_tok", shards=4
    ).collect()
    # two 60-token docs per 128 bin within each shard
    by_bin: dict[tuple, int] = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_bin[(r["shard"], r["seq_idx"])] = (
            by_bin.get((r["shard"], r["seq_idx"]), 0) + 1
        )
    assert all(c <= 2 for c in by_bin.values())
