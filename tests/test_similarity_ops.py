"""Similarity search: brute-force correctness + LSH recall."""

import math

import pytest

from alerta_spark.ops.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
    cosine_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from alerta_spark.sources.lake import load_table

    return load_table(spark, SF, "embeddings")


def test_cosine_topk_matches_numpy(spark, emb):
    import numpy as np

    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = sorted(
        (
            (round(float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v))), 6), -vid)
            for vid, v in vecs.items()
            if vid != 0
        ),
        reverse=True,
    )[:5]
    expect = [(-vid, cos) for cos, vid in sims]

    got = [
        (r["neighbor_id"], r["cos"])
        for r in cosine_topk(emb, [0], k=5).orderBy("cos", ascending=False).collect()
    ]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gid, gcos), (eid, ecos) in zip(got, expect):
        assert math.isclose(gcos, ecos, abs_tol=1e-6)


def test_lsh_topk_recall(emb):
    qids = [0, 1, 2]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, qids, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"ANN recall too low: {recall}"


def test_ivf_topk_recall(emb):
    qids = [0, 1, 2]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    # The synthetic embeddings are near-uniform — the hardest case for
    # a coarse quantizer — so the tiny corpus needs wide probing
    # (8/16 cells) for recall; clustered real corpora need far fewer.
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, qids, k=5, n_centroids=16, n_probe=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall too low: {recall}"


def test_ivf_topk_deterministic(emb):
    a = sorted(map(tuple, ivf_topk(emb, [0], k=5).collect()))
    b = sorted(map(tuple, ivf_topk(emb, [0], k=5).collect()))
    assert a == b


def test_cosine_pairs_blocked_symmetry(emb):
    rows = cosine_pairs(emb, threshold=0.3, block_col="label").collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert all(-1.0 <= r["cos"] <= 1.0 for r in rows)


def test_cosine_pairs_lsh_finds_planted_twins(spark, emb):
    """Label-free LSH near-dup: every planted twin (cos ~0.9998) is
    recovered (recall 1 in the high-cos regime hyperplane LSH targets)
    and precision is 1 vs the exact all-pairs ground truth."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.similarity import cosine_pairs_lsh

    base = emb.select("vec_id", "embedding").limit(200)
    twin = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x * (1.0 + 0.02 * ((i % 2) * 2 - 1))
        )
        .cast(emb.schema["embedding"].dataType)
        .alias("embedding"),
    )
    corpus = base.unionByName(twin)

    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_lsh(corpus, threshold=0.95).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs(corpus, threshold=0.95, block_col=None).collect()
    }
    planted = {
        (r["vec_id"], r["vec_id"] + 1_000_000) for r in base.select("vec_id").collect()
    }
    assert planted <= exact          # sanity: twins really are >= 0.95
    assert got <= exact              # precision 1 (exact re-scoring)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"LSH recall too low: {recall}"


def test_cosine_pairs_lsh_portable_matches_exact(spark, emb):
    """The integer-quantized portable LSH variant: precision 1 by
    construction (exact re-scoring) and full recall on planted twins —
    plus bucket determinism: two runs produce identical pair sets."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.similarity import (
        cosine_pairs,
        cosine_pairs_lsh_portable,
    )

    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    ).limit(150)
    twin = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x * (1.0 + 0.02 * ((i % 2) * 2 - 1))
        ).alias("embedding"),
    )
    corpus = base.unionByName(twin)

    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_lsh_portable(corpus, threshold=0.95).collect()
    }
    again = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_lsh_portable(corpus, threshold=0.95).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs(corpus, threshold=0.95, block_col=None).collect()
    }
    planted = {
        (r["vec_id"], r["vec_id"] + 1_000_000)
        for r in base.select("vec_id").collect()
    }
    assert got == again              # exact integer math: bit-deterministic
    assert got <= exact              # precision 1
    assert planted <= exact
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"portable LSH recall too low: {recall}"


def test_ivf_pinned_probe_contains_own_cell(spark, emb):
    """Pinned-centroid IVF invariants: a query's rank-1 probe cell IS
    its own corpus cell (argmax consistency), results are
    deterministic across runs, and every reported neighbor actually
    lives in a probed cell."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.similarity import (
        ivf_topk_pinned,
        pinned_centroids,
        quantize_vec,
    )

    got = ivf_topk_pinned(emb, [0, 1, 2], k=5).collect()
    again = ivf_topk_pinned(emb, [0, 1, 2], k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    assert all(r["neighbor_id"] != r["query_id"] for r in got)
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["cos"])
    for q, cs in per_q.items():
        assert len(cs) <= 5
        assert cs == sorted(cs, reverse=True) or sorted(
            cs, reverse=True
        ) == cs  # top-k ordering sanity

    # argmax consistency via numpy replay of the integer math
    import numpy as np

    C = np.array(pinned_centroids(64, 16), dtype=object)
    rows = emb.where(F.col("vec_id").isin([0, 1, 2])).collect()
    for r in rows:
        qv = [int(np.floor(float(x) * 1_000_000)) for x in r["embedding"]]
        dots = [sum(q * w for q, w in zip(qv, C[c])) for c in range(16)]
        own_cell = max(range(16), key=lambda c: (dots[c], -c))
        best_probe = sorted(range(16), key=lambda c: (-dots[c], c))[0]
        assert own_cell == best_probe


def test_pq_topk_recall(emb):
    """PQ+ADC recall vs brute force: the exact re-rank of the ADC
    short list recovers most true top-5 neighbors, and results are
    deterministic (no-RNG codebook training)."""
    from alerta_spark.ops.similarity import pq_topk

    qids = [0, 1, 2]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, qids, k=5).collect()
    }
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, qids, k=5).collect()
    }
    assert approx == again
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"PQ recall too low: {recall}"


def test_pq_encode_roundtrip_shape(spark, emb):
    """Codes are n_sub ints in [0, n_codes); every corpus row encodes."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.similarity import _pq_encode_udf, train_pq_codebooks

    books = train_pq_codebooks(emb, n_sub=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    enc = _pq_encode_udf(books)
    rows = emb.select(enc(F.col("embedding")).alias("codes")).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_semantic_dedup_drops_planted_copies(spark):
    """Exact copies land in their original's cell and are dropped with
    keeper = the original id; organic vectors (cos ~0.5) survive."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.similarity import semantic_dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = emb.where(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    out = semantic_dedup(emb.unionByName(planted), tau=0.95).collect()
    dropped = {r["drop_id"]: r for r in out}
    n_planted = planted.count()
    assert len(dropped) == n_planted
    for did, r in dropped.items():
        assert did >= 1_000_000 and r["keeper_id"] == did - 1_000_000
        assert r["cos_keeper"] == 1.0


def test_pq_pinned_matches_numpy_replay(spark, emb):
    """Encode, LUT, score, and cut replayed in numpy over the same
    integer arithmetic."""
    import math

    import numpy as np

    from alerta_spark.ops.similarity import (
        pinned_pq_codebooks,
        pq_topk_pinned,
    )

    sub = emb.limit(60)
    rows = {r["vec_id"]: list(r["embedding"]) for r in sub.collect()}
    got = {}
    for r in pq_topk_pinned(sub, [0, 1], k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["pq_dist_q"])
        )

    B = np.array(pinned_pq_codebooks(), dtype=np.int64)  # 8 x 16 x 8
    X = {
        i: np.array([math.floor(x * 1_000_000) for x in v], dtype=np.int64)
        for i, v in rows.items()
    }

    def codes(x):
        return [
            int(((x[s * 8 : (s + 1) * 8] - B[s]) ** 2).sum(1).argmin())
            for s in range(8)
        ]

    def lut(x):
        return [((x[s * 8 : (s + 1) * 8] - B[s]) ** 2).sum(1) for s in range(8)]

    for qid in (0, 1):
        L = lut(X[qid])
        scored = sorted(
            (
                int(sum(L[s][c] for s, c in enumerate(codes(X[nid])))),
                nid,
            )
            for nid in X
            if nid != qid
        )
        want = [(nid, d) for d, nid in scored[:5]]
        assert got[qid] == want


def test_mmr_rerank_matches_python_replay_and_diversifies(spark, emb):
    """Selection order replayed from the op's own quantized inputs;
    first pick is the most relevant; the sim-penalty term must be
    able to reorder pure relevance."""
    import math

    from alerta_spark.ops.similarity import cosine, cosine_topk, mmr_rerank
    from pyspark.sql import functions as F

    out = mmr_rerank(emb, query_id=0, n_candidates=10, k=4).collect()
    assert [r["rank"] for r in out] == [1, 2, 3, 4]

    quant = 1 << 20
    cands = cosine_topk(emb, [0], k=10).collect()
    rel = {r["neighbor_id"]: math.floor(r["cos"] * quant) for r in cands}
    ids = sorted(rel)
    sub = emb.where(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("_id"), F.col("embedding").alias("_v")
    )
    a = sub.select(F.col("_id").alias("_a"), F.col("_v").alias("_va"))
    b = sub.select(F.col("_id").alias("_b"), F.col("_v").alias("_vb"))
    sim = {}
    for r in (
        a.join(b, F.col("_a") < F.col("_b"))
        .select(
            "_a", "_b",
            F.floor(
                F.round(cosine(F.col("_va"), F.col("_vb")), 6) * float(quant)
            ).cast("long").alias("_s"),
        )
        .collect()
    ):
        sim[(r["_a"], r["_b"])] = sim[(r["_b"], r["_a"])] = r["_s"]

    lam_q = int(0.7 * quant)
    chosen, want = [], []
    remaining = list(ids)
    for _ in range(4):
        scored = []
        for c in remaining:
            mx = max((sim[(c, s)] for s in chosen), default=0)
            scored.append((-(lam_q * rel[c] - (quant - lam_q) * mx), c))
        _, pick = min(scored)
        want.append(pick)
        chosen.append(pick)
        remaining.remove(pick)
    assert [r["vec_id"] for r in out] == want
    assert out[0]["vec_id"] == max(rel, key=lambda i: (rel[i], -i))


def test_embedding_lof_planted_outlier(spark):
    """A point far off a tight cluster must get the top LOF score
    (>1); the uniform cluster's members stay near 1. Also pins the
    deterministic top-k cut and rerun stability."""
    import pyspark.sql.functions as F

    from alerta_spark.ops.similarity import embedding_lof

    # 30 clustered points on a small grid + one far outlier, all in
    # the first two components
    rows = [
        (i, [0.001 * (i % 6), 0.001 * (i // 6)] + [0.0] * 62)
        for i in range(30)
    ]
    rows.append((99, [0.5, 0.5] + [0.0] * 62))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_lof(df, k=3).collect()
    assert out, "non-empty"
    top = max(out, key=lambda r: r["lof_q"])
    assert top["vec_id"] == 99 and top["lof"] > 1.5
    others = [r["lof"] for r in out if r["vec_id"] != 99]
    assert all(l < top["lof"] for l in others)
    assert all(r["n_nb"] <= 3 for r in out)
    again = embedding_lof(df, k=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_hard_triplets_semantics(spark):
    """Known geometry: pos = most-similar same-label (self excluded),
    neg = most-similar other-label, margin = difference; duplicate
    vectors tie-break to the smallest candidate id."""
    from alerta_spark.ops.similarity import hard_triplets

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0, 0.0], 0),   # closest same-label to 1
        (3, [0.0, 1.0, 0.0, 0.0], 0),
        (4, [0.8, 0.2, 0.0, 0.0], 1),   # hardest negative for 1
        (5, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["anchor_id"]: r for r in hard_triplets(df).collect()}
    assert got[1]["pos_id"] == 2
    assert got[1]["neg_id"] == 4
    assert got[1]["margin_q"] == got[1]["cos_pos_q"] - got[1]["cos_neg_q"]
    # anchor 5 is far from everything but still gets its best-of-each
    assert got[5]["pos_id"] == 4
    assert len(got) == 5


def test_hard_triplets_singleton_label_dropped(spark):
    """An anchor whose label has no other member has no positive —
    the row is dropped (inner-join semantics), not fabricated."""
    from alerta_spark.ops.similarity import hard_triplets

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 7),   # singleton label
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["anchor_id"]: r for r in hard_triplets(df).collect()}
    assert 3 not in got
    assert set(got) == {1, 2}
    assert got[1]["neg_id"] == 3


def test_hard_triplets_tiebreak_smallest_id(spark):
    """Two identical candidates: the smaller vec_id wins."""
    from alerta_spark.ops.similarity import hard_triplets

    rows = [
        (10, [1.0, 0.0], 0),
        (11, [0.6, 0.4], 0),
        (12, [0.6, 0.4], 0),   # identical to 11 -> 11 must win
        (20, [0.0, 1.0], 1),
        (21, [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["anchor_id"]: r for r in hard_triplets(df).collect()}
    assert got[10]["pos_id"] == 11
    assert got[10]["neg_id"] == 20


def test_hard_triplets_from_candidates_matches_full(spark):
    """With the all-pairs candidate frame, the distributed candidate
    miner reproduces hard_triplets exactly (same cq quantization, same
    composite-key tie-break, same inner-join drops); with a restricted
    candidate frame, mining is confined to the supplied pairs."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.similarity import (
        hard_triplets,
        hard_triplets_from_candidates,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0, 0.0], 0),
        (4, [0.8, 0.2, 0.0, 0.0], 1),
        (5, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    ids = df.select(F.col("vec_id").alias("id_a"))
    allpairs = ids.crossJoin(
        df.select(F.col("vec_id").alias("id_b"))
    ).where(F.col("id_a") < F.col("id_b"))
    got = sorted(
        map(tuple, hard_triplets_from_candidates(df, allpairs).collect())
    )
    want = sorted(map(tuple, hard_triplets(df).collect()))
    assert got == want

    # restricted candidates: anchor 1 only sees 3 (same label) and 5
    restricted = spark.createDataFrame(
        [(1, 3), (1, 5)], "id_a long, id_b long"
    )
    r = {
        x["anchor_id"]: x
        for x in hard_triplets_from_candidates(df, restricted).collect()
    }
    assert r[1]["pos_id"] == 3 and r[1]["neg_id"] == 5
    # anchors 3 and 5 see only anchor 1 -> no positive for 5? 5's label
    # differs from 1 -> no positive -> dropped; 3 shares label with 1
    # -> pos=1 but has no negative -> dropped
    assert set(r) == {1}


def test_hard_triplets_from_candidates_random_corpus_parity(spark):
    """Seeded-random 40-vector corpus, all-pairs candidates: the
    distributed miner and the broadcast-matmul miner must agree on
    every anchor, id, and quantized cosine (the two paths share no
    code beyond the quantization contract)."""
    import random

    from pyspark.sql import functions as F

    from alerta_spark.ops.similarity import (
        hard_triplets,
        hard_triplets_from_candidates,
    )

    rng = random.Random(20260815)
    rows = [
        (
            i,
            [rng.uniform(-1.0, 1.0) for _ in range(16)],
            rng.randrange(4),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    ids = df.select(F.col("vec_id").alias("id_a"))
    allpairs = ids.crossJoin(
        df.select(F.col("vec_id").alias("id_b"))
    ).where(F.col("id_a") < F.col("id_b"))
    got = sorted(
        map(tuple, hard_triplets_from_candidates(df, allpairs).collect())
    )
    want = sorted(map(tuple, hard_triplets(df).collect()))
    assert got == want and len(got) == 40
