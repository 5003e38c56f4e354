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


def test_pagerank_truncates_caller_lineage_and_releases_caches(spark):
    # round-10 pins: (a) the edge set is localCheckpointed, so the
    # returned plan must NOT re-embed the caller's edge-builder
    # subtree (here: a marker window over a source frame) — with a
    # plain persist every round's plan re-embedded it and analyzer
    # time grew with iters; (b) the per-round caches are released —
    # only the final round's ranks frame (and checkpoint blocks) may
    # stay persisted after the returned frame is consumed.
    from pyspark.sql import Window as W

    src = spark.createDataFrame(
        [("u1", "a", 1), ("u1", "b", 2), ("u1", "c", 3), ("u2", "a", 1), ("u2", "c", 2)],
        ["u", "node", "t"],
    )
    w = W.partitionBy("u").orderBy("t")
    edges = (
        src.select(
            F.col("node").alias("src"),
            F.lead("node").over(w).alias("dst"),
        ).where(F.col("dst").isNotNull())
    )
    jsc = spark.sparkContext._jsc.sc()
    n_before = jsc.getPersistentRDDs().size()
    out = pagerank_fixedpoint(edges, iters=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    ranks = {r["id"]: r["rank_fp"] for r in out.collect()}
    assert set(ranks) == {"a", "b", "c"} and all(v > 0 for v in ranks.values())
    # (b): at most the final ranks frame + the checkpointed edge RDD
    # remain persisted from THIS call (intermediate rounds and
    # `vertices` released; earlier tests' final frames persist by
    # design, so pin the delta)
    n_after = jsc.getPersistentRDDs().size()
    assert n_after - n_before <= 2, (n_before, n_after)
