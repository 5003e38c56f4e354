"""Link-analysis operators: fixed-point PageRank over an edge list.

The reference has no graph operator; this extends the engine the same
way dup-clustering (connected components, ``ops/dedupe.py``) does —
iterative algorithms expressed as a bounded number of join+aggregate
rounds, one shuffle per round, no driver-side adjacency.

Determinism design: ranks are carried as **integer fixed-point**
(units of 1e-12). Float PageRank sums per-vertex contributions in
whatever order the engine's aggregation happens to combine them —
bit-identical results across engines (or even across two Spark runs
with different partitioning) are not guaranteed. With integer units,
every round is exact integer math (`div` floor-division + SUM of
longs), so the result is a pure function of the graph: the DuckDB
oracle unrolls the same rounds in SQL and hash-matches exactly.
At lake scale the quantization error (1e-12 per division) is far
below float noise; a production caller that doesn't need cross-run
bit-stability can read `rank = rank_fp / 1e12`.

Scale shape: each round is edges ⋈ ranks (shuffle on vertex id —
pre-partition both on `id` to reuse the exchange) + one aggregate.
Dangling mass is one scalar aggregate broadcast into the update.
Rounds are bounded (`iters`), so no lineage checkpointing is needed
below ~15 rounds; beyond that, apply the localCheckpoint cadence
documented in ``dedupe.dup_clusters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 10**12  # fixed-point scale: 1.0 rank == 1e12 units


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank over a directed edge list -> [id, rank_fp].

    ``rank_fp`` is the rank in 1e-12 units (BIGINT). Per round, for
    every vertex v:

        r'(v) = (100-d)% * UNIT/N  +  d% * (sum_{u->v} r(u) div out(u)
                                            + dangling div N)

    with every division an integer floor-division (`div`), so the
    result is order-independent and engine-independent. Dangling
    vertices (no out-edges) spread their rank over all N vertices.

    All intermediate products fit comfortably in BIGINT:
    damping_pct * sum(contributions) <= 100 * UNIT * 1 = 1e14.
    """
    # localCheckpoint (not just persist — the dup_clusters discipline):
    # the distinct edge set is consumed by the vertex union (twice),
    # the out-degree aggregate, and every round's contribution join.
    # Without materialization each consumer re-runs the CALLER's edge
    # builder (for the transition graph, a full corpus window pass per
    # consumer); with a plain persist every round's plan re-EMBEDS the
    # builder's subtree textually and analyzer time grows with iters.
    # Truncating here bounds each round's plan to edges + one join.
    # Lifetime: checkpoint blocks live OUTSIDE the CacheManager (a
    # Dataset.unpersist here would be a no-op) and are reclaimed by
    # the ContextCleaner once the RDD is unreferenced — i.e. after the
    # returned ranks frame is dropped, not at release_cached() time.
    # The edge set is |types|²-bounded for the catalog callers, so the
    # GC-bound lifetime is a few KB, documented rather than managed.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = vertices.count()  # scalar; broadcast into every round below
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # out-degree is a per-vertex scalar — attach once so every round
    # reuses the same frame instead of re-joining
    ranks = vertices.join(outdeg, vertices["id"] == outdeg["src"], "left").select(
        "id", "outdeg", F.lit(UNIT // n).cast("long").alias("rank_fp")
    ).persist()
    base = ((100 - damping_pct) * (UNIT // n)) // 100

    prev = None
    for _ in range(iters):
        # the dangling aggregate scans every partition of ranks, so
        # this one driver action also materializes the round's cache —
        # the previous round's frame is only released after it, and no
        # separate count() pass runs per round
        dangling = (
            ranks.where(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank_fp"), F.lit(0)).alias("d"))
            .first()["d"]
        )
        if prev is not None:
            prev.unpersist()
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                F.expr("rank_fp div outdeg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            ranks.alias("r")
            .join(contrib.alias("c"), "id", "left")
            .select(
                "id",
                "outdeg",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * (coalesce(contrib, 0)"
                        f" + {dangling} div {n})) div 100"
                    )
                ).cast("long").alias("rank_fp"),
            )
            .persist()
        )
        prev, ranks = ranks, new_ranks

    ranks.count()  # materialize the final round before releasing its parent
    if prev is not None:
        prev.unpersist()
    vertices.unpersist()
    return ranks.select("id", "rank_fp")
