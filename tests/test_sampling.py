"""Deterministic sampling/splitting: reproducibility, disjointness,
fraction accuracy (ops/sampling.py — training-data extension)."""

import pytest

from alerta_spark.ops.sampling import (
    deterministic_sample,
    hash_split,
    stratified_deterministic_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from alerta_spark.sources.lake import load_table

    return load_table(spark, SF, "documents")


def test_sample_fraction_and_stability(spark, docs):
    total = docs.count()
    s1 = {r["doc_id"] for r in deterministic_sample(docs, 0.3).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(docs, 0.3).select("doc_id").collect()}
    assert s1 == s2  # rerun-stable: same rows, not just same count
    assert 0.15 <= len(s1) / total <= 0.45  # binomial tolerance at n=500
    # a larger fraction with the same salt is a SUPERSET (nested samples)
    s_half = {r["doc_id"] for r in deterministic_sample(docs, 0.5).select("doc_id").collect()}
    assert s1 <= s_half
    # a different salt draws an effectively independent sample
    s_other = {
        r["doc_id"]
        for r in deterministic_sample(docs, 0.3, salt="v2").select("doc_id").collect()
    }
    assert s_other != s1


def test_sample_fraction_bounds(docs):
    assert deterministic_sample(docs, 1.0) is docs
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5)
    assert deterministic_sample(docs, 0.0).count() == 0


def test_hash_split_disjoint_exhaustive_stable(docs):
    out = hash_split(docs, {"train": 0.8, "eval": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) <= {"train", "eval", "test"}
    assert sum(counts.values()) == docs.count()  # exhaustive, disjoint
    assert counts["train"] > counts.get("eval", 0)
    # a specific row's assignment never changes
    one = out.where(out.doc_id == out.select("doc_id").first()["doc_id"])
    a = one.first()["split"]
    b = hash_split(docs, {"train": 0.8, "eval": 0.1, "test": 0.1}).where(
        out.doc_id == one.first()["doc_id"]
    ).first()["split"]
    assert a == b


def test_stratified_sample_per_stratum(spark):
    rows = [(i, "common") for i in range(200)] + [(1000 + i, "rare") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_deterministic_sample(
        df, {"common": 0.1, "rare": 1.0}, strata_col="source"
    )
    from pyspark.sql import functions as F

    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got["rare"] == 20          # keep all scarce data
    assert 5 <= got.get("common", 0) <= 45  # ~10% of 200
    # unlisted strata default to 0
    df2 = df.withColumn("source", df.source)
    out2 = stratified_deterministic_sample(df2, {"rare": 1.0}, strata_col="source")
    assert out2.where(out2.source == "common").count() == 0


def test_shuffled_order_is_permutation_and_epoch_varies(docs):
    from alerta_spark.ops.sampling import shuffled_order

    a = shuffled_order(docs, shards=4, salt="e0").collect()
    # exhaustive: every doc addressed exactly once
    assert len(a) == docs.count()
    assert len({r.doc_id for r in a}) == len(a)
    # (shard, pos) is a proper dense address space per shard
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard
    # deterministic: rerun identical
    b = shuffled_order(docs, shards=4, salt="e0").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a new epoch salt produces a different order
    c = shuffled_order(docs, shards=4, salt="e1").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_sample_k_per_group_exact_counts_and_redraw(spark, docs):
    from pyspark.sql import functions as F

    from alerta_spark.ops.sampling import sample_k_per_group

    picked = sample_k_per_group(docs, "source", k=3, salt="e1")
    counts = {
        r["source"]: r["n"]
        for r in picked.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {s: min(3, n) for s, n in sizes.items()}

    # deterministic: same salt -> same picks; new salt -> a redraw
    again = {r["doc_id"] for r in picked.collect()}
    assert {r["doc_id"] for r in sample_k_per_group(docs, "source", 3, salt="e1").collect()} == again
    other = {r["doc_id"] for r in sample_k_per_group(docs, "source", 3, salt="e2").collect()}
    assert other != again


def test_weighted_sample_prefers_heavy_rows(spark):
    """A-ES property: with extreme weights, every heavy row must make
    the cut before any light row can crowd it out (u^(1/w) -> 1 as
    w -> inf); and the draw is salt-stable."""
    from alerta_spark.ops.sampling import weighted_sample_k

    rows = [(i, 10**9 if i < 10 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = {r.doc_id for r in weighted_sample_k(df, "w", k=20, salt="s1").collect()}
    assert len(picked) == 20
    assert set(range(10)) <= picked  # all heavy rows included

    again = {r.doc_id for r in weighted_sample_k(df, "w", k=20, salt="s1").collect()}
    assert again == picked
    redraw = {r.doc_id for r in weighted_sample_k(df, "w", k=20, salt="s2").collect()}
    assert set(range(10)) <= redraw and redraw != picked

    # zero/negative weights are excluded entirely
    z = spark.createDataFrame([(1, 0), (2, -3), (3, 5)], "doc_id long, w long")
    assert {r.doc_id for r in weighted_sample_k(z, "w", k=3).collect()} == {3}


def test_dsir_ranks_target_like_docs_first(spark):
    """A raw doc written in the target domain's vocabulary must
    outscore raw docs with off-domain vocabulary."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.sampling import dsir_select

    rows = [
        (1, "cat feline whiskers purr cat feline", "tgt"),
        (2, "cat purr feline cat whiskers purr", "tgt"),
        (10, "cat feline purr whiskers", "raw"),
        (11, "stock market bond yield equity", "raw"),
        (12, "bond equity market stock yield", "raw"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = dsir_select(df, F.col("source") == "tgt", k=3).collect()
    assert out[0]["doc_id"] == 10
    assert out[0]["score_q"] > out[1]["score_q"]
    assert {r["doc_id"] for r in out} == {10, 11, 12}


def test_kcenter_coreset_hand_traversal(spark):
    """Farthest-point traversal on a 1-D line 0..9 (embedded in the
    first component): seed=lowest id (x=0), then 9 (d2=81), then the
    4/5 tie -> 4, then the 2/6/7 tie (d2=4) -> 2, then 6."""
    from alerta_spark.ops.sampling import kcenter_coreset

    rows = [(i, [float(i)] + [0.0] * 63) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["rank"], r["vec_id"], r["sel_d2_q"])
        for r in kcenter_coreset(df, k=5).orderBy("rank").collect()
    ]
    m = 1_000_000 * 1_000_000  # quantized d2 units
    assert got == [
        (1, 0, 0),
        (2, 9, 81 * m),
        (3, 4, 16 * m),
        (4, 2, 4 * m),
        (5, 6, 4 * m),
    ]
    # rerun-stable
    again = [
        (r["rank"], r["vec_id"], r["sel_d2_q"])
        for r in kcenter_coreset(df, k=5).orderBy("rank").collect()
    ]
    assert again == got
