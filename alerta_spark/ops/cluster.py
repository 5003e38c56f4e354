"""Engine-exact k-means (Lloyd's algorithm, fixed-point arithmetic).

Iterative ML training is normally the canonical "rows-only" operator:
float centroid updates accumulate in partition order, so two runs —
let alone two engines — disagree at the ulp, and the disagreement
compounds per iteration. This variant makes every step EXACT integer
arithmetic, so a fixed number of Lloyd iterations is a deterministic
function of the input and the whole loop hash-checks against a SQL
oracle that replays it:

- vectors quantize ONCE to BIGINT fixed-point (floor(x * 2^20));
- distances are exact integer Σ(xq-cq)²; argmin ties break to the
  lowest centroid index;
- centroid updates are integral means (sum div count) — exact,
  order-free, associative.

Quantization changes the result only below the 2^-20 resolution —
immaterial for clustering — and buys bit-reproducibility across
engines, retries, and partitionings, which a 100 TB pipeline needs
for cache reuse and incremental re-clustering.

Scale shape per iteration: distances come from one posexplode + a
BROADCAST centroid join + a codegen'd hash aggregate (aggregation
shape — k×dim literal projection lanes are interpreted higher-order
functions and measured ~2x slower even at k=8), then an argmin
aggregate and one (cluster, dim)-keyed update aggregate; centroids
(k×dim BIGINTs) collect to the driver between iterations — the
standard bounded-state iterative pattern (cf. ops/graph.py PageRank).
Empty clusters simply drop out (both engines derive the same drop).

Reference provenance: no analogue; training-data extension (the
production IVF trainer `ops/similarity._train_centroids` stays
float/rows-only — this is its verifiable twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_pinned(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1 << 20,
) -> DataFrame:
    """Run ``iters`` exact Lloyd rounds from the deterministic seed
    "the k lowest-id vectors" and return per-cluster stats of the
    final assignment: [cluster, n, inertia_q, centroid_digest] where
    inertia_q is the exact integer Σ min-distances of the assignment
    and centroid_digest fingerprints the post-update centroid
    (md5 of comma-joined components in dimension order)."""
    from alerta_spark.ops.dedupe import _persist
    from alerta_spark.ops.similarity import quantize_vec

    if iters < 1:
        # the final stats aggregate reads the last round's assignment;
        # with zero rounds there is none (and `assigned` would be None)
        raise ValueError("kmeans_pinned requires iters >= 1")

    q = _persist(
        df.select(
            F.col(id_col).alias("_id"),
            quantize_vec(vec_col, scale).alias("_xq"),
        )
    )
    seed_rows = (
        q.orderBy("_id").limit(k).select("_id", "_xq").collect()
    )
    cents: list[tuple[int, list[int]]] = [
        (i, list(r["_xq"])) for i, r in enumerate(seed_rows)
    ]

    spark = df.sparkSession
    comp = q.select("_id", F.posexplode("_xq").alias("pos", "x"))

    assigned = None
    for it in range(iters):
        # aggregation shape, not k literal projection lanes: distances
        # via a broadcast centroid join + codegen'd hash aggregate
        # (interpreted higher-order lanes measured ~2x slower even at
        # k=8 — same lesson as the PQ encode)
        cents_df = spark.createDataFrame(
            [
                (int(cid), int(pos), int(c))
                for cid, cvec in cents
                for pos, c in enumerate(cvec)
            ],
            "cluster long, pos int, c long",
        )
        d = (
            comp.join(F.broadcast(cents_df), "pos")
            .groupBy("_id", "cluster")
            .agg(
                F.sum(
                    (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
                ).cast("long").alias("dist")
            )
        )
        best = d.groupBy("_id").agg(
            F.min(F.struct("dist", "cluster")).alias("_m")
        ).select(
            "_id",
            F.col("_m.cluster").alias("cluster"),
            F.col("_m.dist").alias("dist_q"),
        )
        assigned = q.join(best, "_id")
        if it == iters - 1:
            # only the FINAL round's assignment has two consumers (the
            # centroid update below AND the stats aggregate returned);
            # earlier rounds are consumed once, so persisting them is a
            # pure materialization cost
            assigned = _persist(assigned)
        upd = (
            assigned.select(
                "cluster", F.posexplode("_xq").alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(
                # truncating integral div: Spark `div` and DuckDB `//`
                # BOTH truncate toward zero on integers (verified:
                # -7//2 = -3 in DuckDB) — exact and engine-identical
                F.expr("sum(x) div count(*)").cast("long").alias("c")
            )
            .orderBy("cluster", "pos")
            .collect()
        )
        by_cluster: dict[int, list[int]] = {}
        for r in upd:
            by_cluster.setdefault(r["cluster"], []).append(r["c"])
        cents = sorted(by_cluster.items())

    digest = {
        cid: __import__("hashlib").md5(
            ",".join(str(c) for c in cvec).encode()
        ).hexdigest()
        for cid, cvec in cents
    }
    dig_map = F.create_map(
        *[
            x
            for cid, d in digest.items()
            for x in (F.lit(cid).cast("long"), F.lit(d))
        ]
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dist_q").cast("long").alias("inertia_q"),
        )
        .select(
            "cluster",
            "n",
            "inertia_q",
            F.element_at(dig_map, F.col("cluster")).alias("centroid_digest"),
        )
    )


def pca_power_pinned(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Dominant principal direction of an embedding table by TWO
    pinned, unnormalized power-iteration rounds over the exact integer
    Gram matrix — engine-exact end to end, the eigen-analysis
    companion to :func:`kmeans_pinned` (is this embedding space
    collapsing onto one axis? what fraction of energy is the top
    direction eating?).

    Everything is relational aggregation, no linear-algebra library:

      S[i,j] = Σ_v xq_i·xq_j   one (pos,pos)-grouped aggregate over a
                               vec_id self-join (8M tiny rows at d=64)
      v1 = S·1  = row sums     one aggregate
      v2 = S·v1                one join + aggregate, DECIMAL(38,0)

    Skipping the usual per-round normalization is what keeps every
    intermediate an exact integer: xq ≤ 2^20, S ≤ 2^51, v1 ≤ 2^57,
    v2 ≤ 2^114 < 10^38. The direction is reported scale-free as
    v2 / v2[argmax |v2|] and the per-component Rayleigh quotient
    v2/v1 (→ the dominant eigenvalue as iteration converges) — each a
    single IEEE division of identical exact operands on every engine.

    Output: [pos, v1_q, dir_ratio, lambda_est] one row per dimension.
    Public algorithm: power iteration (von Mises & Pollaczek-Geiringer
    1929)."""
    from alerta_spark.ops.similarity import quantize_vec

    q = df.select(
        F.col(id_col).alias("_v"),
        F.posexplode(quantize_vec(vec_col, scale)).alias("pos", "xq"),
    )
    a, b = q.alias("a"), q.alias("b")
    s = (
        a.join(b, F.col("a._v") == F.col("b._v"))
        .groupBy(F.col("a.pos").alias("i"), F.col("b.pos").alias("j"))
        .agg(F.sum(F.col("a.xq") * F.col("b.xq")).cast("long").alias("s"))
    )
    s = s.persist()
    v1 = s.groupBy("j").agg(F.sum("s").cast("long").alias("v1"))
    v2 = (
        s.join(v1.select(F.col("j").alias("i"), F.col("v1").alias("v1_i")), "i")
        .groupBy("j")
        .agg(
            F.sum(F.col("s").cast("decimal(38,0)") * F.col("v1_i"))
            .cast("decimal(38,0)")
            .alias("v2")
        )
    )
    joined = v2.join(v1, "j")
    vmax = (
        joined.orderBy(F.abs(F.col("v2")).desc(), F.col("j").asc())
        .limit(1)
        .select(F.col("v2").alias("vmax"))
    )
    v2d = F.col("v2").cast("string").cast("double")
    return (
        joined.crossJoin(F.broadcast(vmax))
        .select(
            F.col("j").alias("pos"),
            F.col("v1").alias("v1_q"),
            (v2d / F.col("vmax").cast("string").cast("double")).alias(
                "dir_ratio"
            ),
            (v2d / F.col("v1").cast("double")).alias("lambda_est"),
        )
        .orderBy("pos")
    )
