"""Decontamination and corpus-composition semantics."""

from __future__ import annotations

import math

from pyspark.sql import Row

from alerta_spark.ops.decontam import contaminated_ids, decontaminate
from alerta_spark.ops.text import corpus_composition


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_overlapping_ngram_is_contaminated(spark):
    train = _df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words about nothing shared here"),
            (3, "tiny"),
        ],
    )
    ev = _df(spark, [(100, "we saw the quick brown fox jumps today")])
    # doc 1 shares the 5-gram "the quick brown fox jumps"; doc 2 none;
    # doc 3 is short (whole-text shingle "tiny", absent from eval)
    bad = sorted(r.doc_id for r in contaminated_ids(train, ev, n=5).collect())
    assert bad == [1]
    kept = sorted(r.doc_id for r in decontaminate(train, ev, n=5).collect())
    assert kept == [2, 3]


def test_short_doc_whole_text_rule(spark):
    # both sides shorter than n: whole text is the single shingle, so
    # identical short docs are contaminated
    train = _df(spark, [(1, "hello world"), (2, "other stuff")])
    ev = _df(spark, [(9, "hello world")])
    assert [r.doc_id for r in contaminated_ids(train, ev, n=5).collect()] == [1]


def test_broadcast_and_shuffle_paths_agree(spark):
    train = _df(
        spark,
        [(i, f"prefix tokens number {i} common boilerplate tail words") for i in range(20)],
    )
    ev = _df(spark, [(99, "number 7 common boilerplate tail words end")])
    a = sorted(r.doc_id for r in decontaminate(train, ev).collect())
    b = sorted(
        r.doc_id for r in decontaminate(train, ev, broadcast_eval=False).collect()
    )
    assert a == b


def test_corpus_composition_shares_sum_to_one(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="web", lang="en", text="a b c"),
            Row(doc_id=2, source="web", lang="de", text="d e"),
            Row(doc_id=3, source="book", lang="en", text="f g h i"),
        ]
    )
    out = {(r.source, r.lang): r for r in corpus_composition(docs).collect()}
    assert len(out) == 3
    assert out[("web", "en")].n_docs == 1
    assert out[("web", "en")].n_tokens == 3
    assert out[("book", "en")].n_chars == 7
    assert math.isclose(sum(r.doc_share for r in out.values()), 1.0)
    assert math.isclose(sum(r.token_share for r in out.values()), 1.0)
    assert math.isclose(out[("book", "en")].token_share, 4 / 9)


def test_decontaminate_embedding_drops_leaked_vectors(spark):
    from alerta_spark.ops.decontam import decontaminate_embedding

    tr = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),   # exact leak of eval 100
            (2, [0.9, 0.1, 0.0]),   # near-leak (cos ~0.994)
            (3, [0.0, 0.0, 1.0]),   # orthogonal -> survives
        ],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = decontaminate_embedding(tr, ev, threshold=0.95)
    rows = {r["vec_id"]: r["max_eval_cos"] for r in out.collect()}
    assert set(rows) == {3}
    assert rows[3] == 0.0
