"""Fixed-point PageRank: hand-computed ranks, dangling mass, sinks."""

from pyspark.sql import functions as F

from alerta_spark.ops.graph import UNIT, pagerank_fixedpoint


def _ranks(df):
    return {r["id"]: r["rank_fp"] for r in df.collect()}


def test_pagerank_two_cycle_symmetric(spark):
    # a <-> b: perfectly symmetric, ranks stay at UNIT/2 every round
    e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    r = _ranks(pagerank_fixedpoint(e, iters=3))
    half = UNIT // 2
    expected = (15 * half) // 100 + (85 * half) // 100
    assert r == {"a": expected, "b": expected}


def test_pagerank_hub_beats_spokes(spark):
    # star: b,c,d all point at a; a points back at b only
    e = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("d", "a"), ("a", "b")], ["src", "dst"]
    )
    r = _ranks(pagerank_fixedpoint(e, iters=5))
    assert r["a"] > r["b"] > r["c"] == r["d"]


def test_pagerank_dangling_mass_redistributed(spark):
    # a -> b, b is a sink: without dangling handling b's rank would
    # leak out of the system each round. One hand-checked round:
    #   r0 = UNIT//2 each; dangling = r0(b)
    #   r1(v) = 15%*(UNIT//2) + 85%*(contrib + dangling//2)
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    r = _ranks(pagerank_fixedpoint(e, iters=1))
    half = UNIT // 2
    base = (15 * half) // 100
    share = half // 2  # dangling mass spread over n=2
    assert r["a"] == base + (85 * (0 + share)) // 100
    assert r["b"] == base + (85 * (half + share)) // 100


def test_pagerank_total_mass_conserved_approximately(spark):
    # integer floors only ever drop sub-unit remainders: total mass
    # stays within iters * (a few units-per-vertex) of UNIT
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a")],
        ["src", "dst"],
    )
    out = pagerank_fixedpoint(e, iters=4)
    total = out.agg(F.sum("rank_fp")).first()[0]
    assert abs(total - UNIT) < 1000
