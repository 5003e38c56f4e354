"""Engine-exact k-means: pinned against a pure-Python Lloyd replay."""

from pyspark.sql import functions as F


def _py_kmeans(vecs, k, iters, scale=1 << 20):
    import math

    q = {i: [math.floor(x * scale) for x in v] for i, v in vecs.items()}
    cents = {c: list(q[i]) for c, i in enumerate(sorted(q)[:k])}

    def trunc_div(s, c):
        qt = abs(s) // c
        return qt if s >= 0 else -qt

    assign = {}
    for _ in range(iters):
        assign = {}
        for i, x in q.items():
            best, bd = None, None
            for c in sorted(cents):
                d = sum((a - b) * (a - b) for a, b in zip(x, cents[c]))
                if bd is None or d < bd:
                    best, bd = c, d
            assign[i] = (best, bd)
        newc = {}
        for c in set(b for b, _ in assign.values()):
            members = [q[i] for i in q if assign[i][0] == c]
            newc[c] = [
                trunc_div(sum(col), len(members)) for col in zip(*members)
            ]
        cents = newc
    return assign, cents


def test_kmeans_pinned_matches_python_replay(spark):
    from alerta_spark.ops.cluster import kmeans_pinned

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    out = {r["cluster"]: r for r in kmeans_pinned(emb, k=4, iters=2).collect()}

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    assign, cents = _py_kmeans(vecs, k=4, iters=2)
    import hashlib
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for i, (c, d) in assign.items():
        agg[c][0] += 1
        agg[c][1] += d
    assert set(out) == set(agg)
    for c in agg:
        assert out[c]["n"] == agg[c][0]
        assert out[c]["inertia_q"] == agg[c][1]
        want = hashlib.md5(
            ",".join(str(x) for x in cents[c]).encode()
        ).hexdigest()
        assert out[c]["centroid_digest"] == want


def test_kmeans_pinned_rejects_zero_iters(spark):
    import pytest as _pytest

    from alerta_spark.ops.cluster import kmeans_pinned

    df = spark.range(10).selectExpr(
        "id as vec_id", "array(cast(id as double), 1.0d) as embedding"
    )
    with _pytest.raises(ValueError, match="iters >= 1"):
        kmeans_pinned(df, k=2, iters=0)
