"""Similarity search over an embedding column (array<float>).

Two paths:

- cosine_topk: brute-force exact top-k for a (small) query set —
  broadcast the queries, one pass over the corpus, per-query top-k via
  window. Linear in corpus size, embarrassingly parallel: the right
  baseline and the recall oracle.
- lsh_topk: random-hyperplane LSH bucketing (sign bits of fixed
  pseudo-random projections) — candidates only from matching buckets
  (multi-probe over bands), exact cosine re-rank on candidates. The
  scale path when the query set or corpus is huge.

Dot products use zip_with + aggregate in DOUBLE (deterministic
index-order accumulation, matches the DuckDB oracle bit-for-bit after
round(,6)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return (_dot(a, b) / (_norm(a) * _norm(b))).cast("double")


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """L2-normalize the embedding column (cosine == dot thereafter;
    also makes euclidean LSH equivalent to cosine LSH)."""
    v = F.col(vec_col)
    n = _norm(v)
    return df.withColumn(
        vec_col, F.transform(v, lambda x: (x.cast("double") / n))
    )


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Broadcast the query vectors (small) against the corpus — one scan,
    no shuffle of the corpus; the per-query top-k is a window over
    corpus partitions pre-filtered by rank.

    -> [query_id, neighbor_id, cos] deterministic (ties broken by
    neighbor_id asc).
    """
    q = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    corpus = df.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("_cn")
    )
    joined = corpus.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col("query_id")
    )
    # norms once per vector (query norms would otherwise re-derive per
    # corpus row); same float tree as cosine()
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            _dot(F.col("qv"), F.col(vec_col)) / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane weights from a
    splitmix64-style integer hash (public-domain mixing constants)."""
    out = []
    for i in range(dim):
        z = (plane * 1_000_003 + i) & 0xFFFFFFFFFFFFFFFF
        z = (z + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        out.append(((z % 2_000_001) - 1_000_000) / 1_000_000.0)
    return out


def _bucket_udf(dim: int, planes: int, bands: int):
    """All band buckets in one Arrow-batched numpy matmul: X @ W
    (n x dim . dim x bands*planes) then sign-bit packing per band.
    This is the genuinely-numeric case where a vectorized pandas UDF
    beats 48 separate codegen'd dot-product aggregates (~10x measured
    at sf0.1); the hyperplanes are the same deterministic splitmix64
    weights as the column-expression variant."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    W_mat = np.array(
        [_hyperplane(dim, p) for p in range(bands * planes)], dtype=np.float64
    ).T  # dim x (bands*planes)
    pw = 1 << np.arange(planes, dtype=np.int64)

    def _buckets(vecs):
        X = np.vstack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        bits = (X @ W_mat) > 0  # n x bands*planes
        out = []
        for row in bits:
            out.append(
                [int((row[b * planes : (b + 1) * planes] * pw).sum()) for b in range(bands)]
            )
        return pd.Series(out)

    # annotations set explicitly: `from __future__ import annotations`
    # stringifies inline hints, which pyspark's typehint parser rejects
    _buckets.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(_buckets, "array<long>")


def lsh_bucket_col(vec_col: str, dim: int, planes: int, band: int) -> Column:
    """Sign-bit bucket id for one band of `planes` hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        weights = _hyperplane(dim, band * planes + p)
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(w) for w in weights]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, p))
    return bucket


def lsh_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 4,
    bands: int = 12,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing any LSH band
    bucket with the query, re-ranked by exact cosine.

    bands x planes sign-bit buckets: a candidate survives if it matches
    the query's bucket in >= 1 band (multi-probe style recall boost
    without probing). Corpus-side bucket computation is one projection;
    the join is on (band, bucket) — bounded fan-in per bucket.

    -> [query_id, neighbor_id, cos] (same shape as cosine_topk).
    """
    from alerta_spark._ship import ensure_shipped

    ensure_shipped(df.sparkSession)
    buckets = _bucket_udf(dim, planes, bands)

    def bucketed(frame: DataFrame, idalias: str) -> DataFrame:
        return frame.select(
            F.col(id_col).alias(idalias),
            F.col(vec_col).alias(f"{idalias}_vec"),
            F.posexplode(buckets(F.col(vec_col))).alias("band", "bucket"),
        ).select(idalias, f"{idalias}_vec", "band", "bucket")

    qb = bucketed(df.where(F.col(id_col).isin(query_ids)), "query_id")
    cb = bucketed(df, "neighbor_id")
    # cosine BEFORE the dedup: a pair colliding in several bands is
    # re-scored (cheap, compute-local) so the distinct shuffles only
    # (ids, score) — ~24 bytes/row — instead of two 64-dim vectors
    scored = (
        cb.join(
            F.broadcast(qb),
            (cb["band"] == qb["band"])
            & (cb["bucket"] == qb["bucket"])
            & (cb["neighbor_id"] != qb["query_id"]),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("query_id_vec"), F.col("neighbor_id_vec")), 6
            ).alias("cos"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def lsh_topk_portable(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 4,
    bands: int = 12,
    scale: int = 1_000_000,
) -> DataFrame:
    """:func:`lsh_topk` with the PORTABLE integer bucketing of
    :func:`lsh_buckets_portable`: sign bits of exact BIGINT dots
    between floor(x*1e6) components and integer hyperplane numerators,
    so the bucket assignment — the one float-fragile step of
    hyperplane LSH — has a DuckDB twin and the whole candidate
    pipeline (banding, candidate join, exact cosine re-rank, top-k
    cut) is hash-checkable end to end.

    Plan shape (the 100 TB contract): the corpus is scanned once to
    produce the light (id, band, bucket) frame; the 5-query bucket
    list and the candidate id set broadcast back against the corpus
    scan for re-ranking — the corpus itself never shuffles. The
    per-query window is bounded by the candidate fan-in per bucket.

    -> [query_id, neighbor_id, cos] (same shape as cosine_topk).
    """
    from alerta_spark.ops.dedupe import _persist

    b = _persist(
        lsh_buckets_portable(
            df, id_col, vec_col, dim, planes, bands, scale
        ).withColumnRenamed(id_col, "_bid")
    )
    qb = b.where(F.col("_bid").isin(query_ids)).select(
        F.col("_bid").alias("query_id"), "band", "bucket"
    )
    cand = (
        b.join(F.broadcast(qb), ["band", "bucket"])
        .where(F.col("_bid") != F.col("query_id"))
        .select("query_id", F.col("_bid").alias("neighbor_id"))
        .distinct()
    )
    qv = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")
    )
    vecs = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    scored = vecs.join(
        F.broadcast(
            cand.join(qv, cand["query_id"] == qv["_qid"]).drop("_qid")
        ),
        F.col("_vid") == F.col("neighbor_id"),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_v")), 6).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def _train_centroids(
    df: DataFrame,
    n_centroids: int,
    n_train: int,
    id_col: str,
    vec_col: str,
    iters: int = 10,
):
    """Deterministic spherical k-means on a bounded sample.

    The sample is the first `n_train` vectors by id (collected to the
    driver — bounded, independent of corpus size; at 100 TB you train
    on exactly this kind of fixed-size sample). Init = evenly spaced
    sample points; Lloyd iterations on L2-normalized vectors (argmax
    dot == spherical assignment). Fully deterministic: no RNG.
    """
    import numpy as np

    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_train)
        .collect()
    )
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    idx = np.linspace(0, len(X) - 1, n_centroids).astype(int)
    C = X[idx].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def _cell_udf(centroids, n_probe: int):
    """Arrow-batched cell assignment: top-`n_probe` nearest centroids
    per vector (one numpy matmul per batch)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    def _cells(vecs):
        X = np.vstack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.tolist() for row in top])

    _cells.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(_cells, "array<int>")


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    n_train: int = 256,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: corpus
    vectors land in their single nearest-centroid cell; each query
    probes its `n_probe` nearest cells; exact cosine re-ranks the
    candidates.

    Scale path: the cell assignment is a write-once partition key — at
    100 TB you'd persist the corpus bucketed by `cell` and each query
    touches n_probe/n_centroids of the data. Here the probe join is a
    broadcast of the (tiny) exploded query->cell list against the
    cell-assigned corpus: one corpus scan, no corpus shuffle.

    -> [query_id, neighbor_id, cos] (same shape as cosine_topk).
    """
    from alerta_spark._ship import ensure_shipped

    ensure_shipped(df.sparkSession)
    C = _train_centroids(df, n_centroids, n_train, id_col, vec_col)
    corpus_cell = _cell_udf(C, 1)
    query_cells = _cell_udf(C, n_probe)

    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.element_at(corpus_cell(F.col(vec_col)), 1).alias("cell"),
    )
    q = (
        df.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(query_cells(F.col(vec_col))).alias("cell"),
        )
    )
    cand = corpus.join(
        F.broadcast(q),
        (corpus["cell"] == q["cell"]) & (corpus["neighbor_id"] != q["query_id"]),
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def pinned_centroids(dim: int = 64, n_centroids: int = 16) -> list[list[int]]:
    """Deterministic integer centroid directions (splitmix64 weights,
    offset seed space so they never collide with the LSH planes).
    Uniform in [-1e6, 1e6] per component, so centroid norms concentrate
    tightly — raw-dot argmax is a valid spherical assignment."""
    return [_int_hyperplane(dim, 10_000 + c) for c in range(n_centroids)]


def ivf_topk_pinned(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 4,
    scale: int = 1_000_000,
) -> DataFrame:
    """IVF ANN with PINNED integer centroids: the exact-oracle
    companion to :func:`ivf_topk`. Cell assignment is argmax of
    INTEGER dot products between the fixed-point-quantized vector and
    pinned centroid directions (ties → lowest centroid index), queries
    probe their ``n_probe`` best cells by (dot DESC, centroid ASC) —
    every comparison exact BIGINT, so assignment, probing, and the
    candidate set are bit-identical across engines and the whole query
    path is hash-checkable (training stays driver-side in the
    production variant; this pins everything downstream of it).

    Plan shape matches production IVF: cell assignment is MAP-ONLY on
    the corpus row (no shuffle — at 100 TB `cell` is the write-time
    partition key), probes broadcast, exact cosine re-rank on
    candidates.

    -> [query_id, neighbor_id, cos].
    """
    # The centroid matrix is ONE nested-array SQL literal and the
    # 16-lane dot array is computed ONCE into a shared `darr` column
    # (cell = argmax lane, probes = sorted lanes). The previous form
    # built 2×n_centroids separate zip_with lanes each with its own
    # 64-literal array — ~2000 py4j expression-node round trips that
    # cost more DataFrame-BUILD time (4.3s) than the query's own
    # execution. Same bit-identical output, still map-only on the
    # corpus row (no shuffle — at 100 TB `cell` stays the write-time
    # partition key).
    C = pinned_centroids(dim, n_centroids)
    cents_sql = "array(" + ",".join(
        "array(" + ",".join(f"{int(w)}L" for w in row) + ")" for row in C
    ) + ")"
    qv = quantize_vec(vec_col, scale)
    darr = F.transform(
        F.expr(cents_sql),
        lambda c: F.aggregate(
            F.zip_with(qv, c, lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    base = df.select(
        F.col(id_col), F.col(vec_col), darr.alias("darr")
    )
    cell = (
        F.array_position(F.col("darr"), F.array_max("darr")) - 1
    ).cast("long")
    corpus = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        cell.alias("cell"),
    )
    probe_structs = F.sort_array(
        F.zip_with(
            F.col("darr"),
            F.sequence(
                F.lit(0).cast("long"), F.lit(n_centroids - 1).cast("long")
            ),
            lambda d, c: F.struct((-d).alias("nd"), c.alias("cent")),
        )
    )
    probe_cells = F.transform(
        F.slice(probe_structs, 1, n_probe), lambda s: s["cent"]
    )
    q = base.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvv"),
        F.explode(probe_cells).alias("cell"),
    )
    cand = corpus.join(
        F.broadcast(q),
        (corpus["cell"] == q["cell"]) & (corpus["neighbor_id"] != q["query_id"]),
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvv"), F.col("nv")), 6).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_index_write(
    df: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    scale: int = 1_000_000,
) -> None:
    """Write the corpus as a parquet IVF index PARTITIONED BY the
    pinned cell id — the write-once index build: cell assignment is
    map-only (no shuffle; each input partition appends to its cells'
    directories), and every later ANN query prunes the read to its
    probed cells' files (see :func:`ivf_topk_partitioned`). At 100 TB
    this runs once per corpus snapshot and amortizes across all
    queries — the persisted-index counterpart of the in-session
    :func:`ivf_topk_pinned`."""
    out = df.select(
        F.col(id_col),
        F.col(vec_col),
        pinned_cell(vec_col, dim, n_centroids, scale).alias("cell"),
    )
    out.write.mode("overwrite").partitionBy("cell").parquet(index_dir)


def ivf_topk_partitioned(
    spark,
    index_dir: str,
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 4,
    scale: int = 1_000_000,
) -> DataFrame:
    """ANN top-k against the PERSISTED partitioned index: probe cells
    come from the (tiny) query frame, collect driver-side (bounded by
    |queries| x n_probe), and become a STATIC IN-filter on the
    partition column — Catalyst turns it into PartitionFilters, so the
    index read touches only the probed cells' files
    (n_probe/n_centroids of the data; plan-guarded in tests). Scoring
    is the same broadcast-probe exact-cosine re-rank as
    :func:`ivf_topk_pinned`, so results — and the DuckDB oracle — are
    identical. Parquet round-trips float arrays losslessly, so the
    re-ranked cosines match the in-session path bit-for-bit.

    -> [query_id, neighbor_id, cos].
    """
    C = pinned_centroids(dim, n_centroids)
    cents_sql = "array(" + ",".join(
        "array(" + ",".join(f"{int(w)}L" for w in row) + ")" for row in C
    ) + ")"
    qv = quantize_vec(vec_col, scale)
    darr = F.transform(
        F.expr(cents_sql),
        lambda c: F.aggregate(
            F.zip_with(qv, c, lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    qbase = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvv"),
        darr.alias("darr"),
    )
    probe_structs = F.sort_array(
        F.zip_with(
            F.col("darr"),
            F.sequence(
                F.lit(0).cast("long"), F.lit(n_centroids - 1).cast("long")
            ),
            lambda d, c: F.struct((-d).alias("nd"), c.alias("cent")),
        )
    )
    probe_cells = F.transform(
        F.slice(probe_structs, 1, n_probe), lambda s: s["cent"]
    )
    q = qbase.select(
        "query_id", "qvv", F.explode(probe_cells).alias("cell")
    )
    # bounded driver collect (|queries| x n_probe cell ids): the static
    # IN on the raw partition column is what makes the scan prunable
    cells = sorted(
        {int(r["cell"]) for r in q.select("cell").distinct().collect()}
    )
    idx = spark.read.parquet(index_dir).where(F.col("cell").isin(cells))
    corpus = idx.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col("cell").cast("long").alias("cell"),
    )
    cand = corpus.join(
        F.broadcast(q),
        (corpus["cell"] == q["cell"])
        & (corpus["neighbor_id"] != q["query_id"]),
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvv"), F.col("nv")), 6).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def train_pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 8,
    n_codes: int = 16,
    n_train: int = 256,
    iters: int = 10,
):
    """Product-quantization codebooks: split the vector into ``n_sub``
    contiguous subspaces and run deterministic L2 k-means (evenly
    spaced init, Lloyd) per subspace on a bounded driver-side sample —
    the same fixed-size-sample training discipline as IVF. Returns a
    numpy array (n_sub, n_codes, dim/n_sub). No RNG anywhere."""
    import numpy as np

    rows = df.select(id_col, vec_col).orderBy(id_col).limit(n_train).collect()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sd = dim // n_sub
    books = []
    for s in range(n_sub):
        Xs = X[:, s * sd : (s + 1) * sd]
        idx = np.linspace(0, len(Xs) - 1, n_codes).astype(int)
        C = Xs[idx].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = Xs[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C)
    return np.stack(books)


def _pq_encode_udf(books):
    """Arrow-batched PQ encoder: per subspace, argmin L2 code — one
    numpy distance computation per batch per subspace. Map-only; the
    output codes are the ONLY thing the candidate scan ever reads
    (n_sub small ints ≈ 8 bytes vs 256 bytes of float32 vector —
    the ~32x footprint cut is the whole point of PQ at 100 TB)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    B = np.asarray(books, dtype=np.float64)  # n_sub x n_codes x sd
    n_sub, _, sd = B.shape

    def _encode(vecs):
        X = np.vstack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        out = np.empty((len(X), n_sub), dtype=np.int64)
        for s in range(n_sub):
            Xs = X[:, s * sd : (s + 1) * sd]
            d2 = ((Xs[:, None, :] - B[s][None, :, :]) ** 2).sum(-1)
            out[:, s] = d2.argmin(axis=1)
        return pd.Series([row.tolist() for row in out])

    _encode.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(_encode, "array<int>")


def _pq_lut_udf(books):
    """Per-query ADC lookup table, flattened: lut[s*n_codes + c] =
    ||q_s - books[s][c]||^2. Computed once per QUERY row (tiny), so
    the per-candidate score is n_sub JVM array lookups — no float
    vector math in the scan."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    B = np.asarray(books, dtype=np.float64)
    n_sub, n_codes, sd = B.shape

    def _lut(vecs):
        out = []
        for v in vecs:
            q = np.asarray(v, dtype=np.float64)
            lut = np.empty(n_sub * n_codes)
            for s in range(n_sub):
                qs = q[s * sd : (s + 1) * sd]
                lut[s * n_codes : (s + 1) * n_codes] = (
                    (B[s] - qs[None, :]) ** 2
                ).sum(-1)
            out.append(lut.tolist())
        return pd.Series(out)

    _lut.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(_lut, "array<double>")


def pq_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 8,
    n_codes: int = 16,
    n_train: int = 256,
    rerank: int = 64,
) -> DataFrame:
    """Approximate top-k via product quantization with asymmetric
    distance computation (ADC) + exact re-rank:

    1. encode the corpus to ``n_sub`` sub-codes (map-only, once —
       at 100 TB the codes table IS the index you persist: ~32x
       smaller than the vectors);
    2. per query, broadcast a flat ADC lookup table; candidate score =
       sum of ``n_sub`` JVM array lookups over the codes — the scan
       never touches a raw vector;
    3. keep the ``rerank`` best ADC candidates per query, join raw
       vectors back for exact cosine, emit top-k.

    -> [query_id, neighbor_id, cos] (same shape as cosine_topk).
    """
    from alerta_spark._ship import ensure_shipped

    ensure_shipped(df.sparkSession)
    books = train_pq_codebooks(
        df, id_col, vec_col, n_sub, n_codes, n_train
    )
    encode = _pq_encode_udf(books)
    lut_fn = _pq_lut_udf(books)

    codes = df.select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("codes")
    )
    q = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        lut_fn(F.col(vec_col)).alias("lut"),
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            lambda c, s: F.element_at(
                F.col("lut"), (s * n_codes + c + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
    )
    wa = W.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= rerank)
        .select("query_id", "neighbor_id")
    )
    vecs = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    rescored = (
        cand.join(vecs, cand["query_id"] == vecs["_vid"])
        .withColumnRenamed("_v", "qvv")
        .drop("_vid")
        .join(vecs, cand["neighbor_id"] == vecs["_vid"])
        .withColumnRenamed("_v", "nv")
        .drop("_vid")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvv"), F.col("nv")), 6).alias("cos"),
        )
    )
    wk = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold.

    With `block_col`, only intra-block pairs are compared (the standard
    blocked all-pairs — at 100 TB you'd block by an LSH bucket instead;
    pass block_col=None for exact all-pairs on small corpora).

    -> [id_a, id_b, cos] with id_a < id_b.
    """
    # norms once per vector, not per pair (identical float tree to
    # cosine() — sqrt early, multiply in the pair)
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    on = [F.col("id_a") < F.col("id_b")]
    joined = (
        a.join(b, (a["blk"] == b["blk"]) & on[0]) if block_col else a.crossJoin(b).where(on[0])
    )
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def _int_hyperplane(dim: int, plane: int) -> list[int]:
    """Integer numerators of :func:`_hyperplane` (same splitmix64
    derivation, scale 1e6 left implicit): weights in [-1e6, 1e6]."""
    out = []
    for i in range(dim):
        z = (plane * 1_000_003 + i) & 0xFFFFFFFFFFFFFFFF
        z = (z + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        out.append((z % 2_000_001) - 1_000_000)
    return out


def quantize_vec(vec_col: str | Column, scale: int = 1_000_000) -> Column:
    """Fixed-point BIGINT quantization of a float vector:
    ``floor(x * scale)`` per component. floor (not round) so halfway
    ties cannot diverge across engines; float32→double widening and
    the double multiply are bit-identical IEEE on both."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        v, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def lsh_buckets_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 8,
    bands: int = 6,
    scale: int = 1_000_000,
) -> DataFrame:
    """Engine-portable hyperplane LSH buckets: sign bits of INTEGER
    dot products between the fixed-point-quantized vector and integer
    hyperplane numerators. Every step is exact BIGINT math, so the
    bucket assignment — the one part of hyperplane LSH float math
    makes engine-specific (a 1-ulp dot near zero flips a sign bit) —
    has a DuckDB twin and the whole banded pipeline is
    hash-checkable. |qx| <= scale·|x|, |w| <= 1e6, dim 64 ⇒ the dot
    stays far inside int64.

    Implementation is the repo's documented genuinely-numeric case
    (the ahash64 precedent): one Arrow-batched numpy matmul per batch,
    which stays EXACT — floor(x_float64 * scale) reproduces the SQL
    quantization bit-for-bit (float32→float64 is exact, mul/floor are
    single IEEE ops), every product |q·w| <= 6e11 and every 64-term
    partial sum <= 3.9e13 is an integer below 2^53, so the float64
    BLAS accumulation cannot round and the sign bits equal the BIGINT
    oracle's everywhere. The earlier per-plane conditional-sum column
    fold computed the identical buckets but ran ~6x slower at sf0.1
    (interpreted higher-order lambdas outside whole-stage codegen).

    -> [id_col, band, bucket] (bands rows per input row).
    """
    import numpy as np
    import pandas as _pd
    from pyspark.sql.pandas.functions import pandas_udf

    from alerta_spark._ship import ensure_shipped

    ensure_shipped(df.sparkSession)
    total = bands * planes
    Wm = np.array(
        [_int_hyperplane(dim, p) for p in range(total)], dtype=np.float64
    ).T  # dim x total
    bitw = (np.int64(1) << np.arange(planes, dtype=np.int64))

    def _buckets(vecs):
        X = np.vstack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        Q = np.floor(X * float(scale))  # exact integers in float64
        bits = (Q @ Wm > 0).astype(np.int64)
        B = bits.reshape(len(X), bands, planes) @ bitw
        return _pd.Series([row.tolist() for row in B])

    _buckets.__annotations__ = {"vecs": _pd.Series, "return": _pd.Series}
    buckets = pandas_udf(_buckets, "array<long>")

    return df.select(
        F.col(id_col),
        F.posexplode(buckets(F.col(vec_col))).alias("band", "bucket"),
    )


def cosine_pairs_lsh_portable(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 8,
    bands: int = 6,
) -> DataFrame:
    """Embedding near-dup pairs via the PORTABLE integer LSH banding:
    identical plan shape to :func:`cosine_pairs_lsh` (light
    (id, band, bucket) exchange → distinct candidate pairs → vectors
    joined back for exact cosine verification), but the bucketing is
    :func:`lsh_buckets_portable`'s exact BIGINT math, so the catalog
    pins the WHOLE pipeline — banding included — against a DuckDB
    oracle. The numpy/xxhash-free bucketing is slower per row than the
    Arrow matmul variant (it exists for verifiability, like
    dedup_simhash_portable); the candidate-join topology — what
    actually decides 100 TB behavior — is the same.

    -> [id_a, id_b, cos] with id_a < id_b.
    """
    from alerta_spark.ops.dedupe import _persist

    b = _persist(
        lsh_buckets_portable(df, id_col, vec_col, dim, planes, bands)
    ).withColumnRenamed(id_col, "_id")
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    return (
        cand.join(vecs, cand["id_a"] == vecs["_vid"])
        .withColumnRenamed("_v", "va")
        .drop("_vid")
        .join(vecs, cand["id_b"] == vecs["_vid"])
        .withColumnRenamed("_v", "vb")
        .drop("_vid")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 12,
    bands: int = 16,
) -> DataFrame:
    """Embedding near-dup pairs at corpus scale: random-hyperplane LSH
    blocking + exact cosine verification — the scale path
    :func:`cosine_pairs`'s docstring promises (label blocking needs a
    trusted label column; this needs only the vectors).

    A pair at cosine c collides per plane with prob 1 - arccos(c)/pi
    (~0.90 at c=0.95), per band p^planes, overall 1-(1-p^planes)^bands
    (~0.995 at the defaults) — recall pinned against the exact
    operator in tests. Precision is 1: every candidate is re-scored
    with exact cosine before thresholding.

    ``planes`` sets candidate selectivity: a RANDOM pair collides per
    band at ~0.5^planes, so expected false candidates are
    ~n^2/2 * bands/2^planes — at 12 planes a 10k corpus yields ~200k
    exact-cosine re-scores instead of ~3M at 8. Raise planes as the
    corpus grows; recall at the high-cos regime stays ~1.

    Same plan shape as MinHash banding (the shape that survives
    100 TB): explode to LIGHT (id, band, bucket) rows — no vector —
    self-join on (band, bucket) with bounded fan-in per bucket, dedup
    the candidate id pairs, and only then join the vectors back for
    exact scoring. The banding exchange carries ~24 bytes/row instead
    of a vector per band copy (``bands``× the corpus in vector bytes);
    vectors cross the wire exactly twice, once per pair side, and only
    for the candidate set.

    -> [id_a, id_b, cos] with id_a < id_b.
    """
    from alerta_spark._ship import ensure_shipped
    from alerta_spark.ops.dedupe import _persist

    ensure_shipped(df.sparkSession)
    buckets = _bucket_udf(dim, planes, bands)
    # both join sides read the bucketed projection: cache it so the
    # numpy bucketing matmul runs once per corpus, not twice (shared
    # registry with the dedup ops — release via dedupe.release_cached)
    b = _persist(
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(buckets(F.col(vec_col))).alias("band", "bucket"),
        )
    )
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    return (
        cand.join(vecs, cand["id_a"] == vecs["_vid"])
        .withColumnRenamed("_v", "va")
        .drop("_vid")
        .join(vecs, cand["id_b"] == vecs["_vid"])
        .withColumnRenamed("_v", "vb")
        .drop("_vid")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    quant: int = 1 << 20,
) -> DataFrame:
    """Per-label embedding centroid + per-dimension variance — the
    cluster-quality profile behind IVF cell sizing and label-noise
    audits. Output is (label, dim, n, centroid, dim_var): labels x
    dims rows, corpus-size-independent.

    Determinism: float sums over arbitrary row order diverge at the
    ulp, so each component (and its square) is quantized to 1/2^20
    fixed-point BIGINTs; sums are exact; centroid and variance
    (E[x^2] - E[x]^2) emerge from one final double chain. Quantization
    bias on the variance is O(2^-20), orders below any decision
    threshold.

    Plan: posexplode -> ONE (label, dim)-keyed partial aggregate; no
    joins, no windows. At 100 TB the shuffle carries only
    labels x dims x tasks partial rows."""
    qd = float(quant)
    xd = F.col("_x").cast("double")
    xq = F.floor(xd * F.lit(qd)).cast("long")
    xxq = F.floor(xd * xd * F.lit(qd)).cast("long")
    nd = F.col("n").cast("double")
    return (
        df.select(F.col(label_col).alias("label"),
                  F.posexplode(F.col(vec_col)).alias("dim", "_x"))
        .groupBy("label", "dim")
        .agg(
            F.count("*").alias("n"),
            F.sum(xq).alias("_sq"),
            F.sum(xxq).alias("_sqq"),
        )
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            "n",
            (F.col("_sq").cast("double") / F.lit(qd) / nd).alias("centroid"),
            (
                F.col("_sqq").cast("double") / F.lit(qd) / nd
                - (F.col("_sq").cast("double") / F.lit(qd) / nd)
                * (F.col("_sq").cast("double") / F.lit(qd) / nd)
            ).alias("dim_var"),
        )
    )


def hybrid_retrieval(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[int],
    query_vec_id: int,
    recall_k: int = 100,
    k: int = 10,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage hybrid retrieval — the RAG-serving shape: a cheap
    LEXICAL recall stage (BM25 top ``recall_k``) followed by an exact
    embedding-cosine RERANK of just those candidates against the query
    vector. The corpus pays one BM25 pass; the O(dim) cosine work
    touches only ``recall_k`` rows.

    Scale shape: the candidate set is tiny, so it BROADCASTS into the
    embedding join (the embedding corpus never shuffles); the query
    vector is a broadcast single row; the final cut is
    TakeOrderedAndProject. Determinism: BM25's exact-BIGINT ranking +
    the round(cos, 6) discipline of :func:`cosine_topk`, ties on id.

    -> [doc_id, bm25, cos] — top ``k`` by cosine.
    """
    from alerta_spark.ops.text import bm25_topk

    cands = bm25_topk(docs, query_terms, k=recall_k, id_col=id_col).select(
        id_col, "bm25"
    )
    qv = emb.where(F.col(vec_id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qv")
    )
    return (
        emb.join(F.broadcast(cands), F.col(vec_id_col) == F.col(id_col))
        .crossJoin(F.broadcast(qv))
        .select(
            id_col,
            "bm25",
            F.round(cosine(F.col("_qv"), F.col(vec_col)), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def knn_label(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN classification: predict each query vector's label by
    majority vote over its exact cosine top-k neighbors (self
    excluded). Vote ties break on (count DESC, label ASC); the
    neighbor cut itself is the deterministic cosine_topk ranking.

    -> [query_id, pred_label, votes] — one row per query.
    """
    nn = cosine_topk(df, query_ids, k, id_col, vec_col)
    votes = (
        nn.join(
            df.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(label_col).alias("_lbl"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "_lbl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = votes.groupBy("query_id").agg(
        F.min_by(
            F.struct(F.col("_lbl").alias("l"), F.col("votes").alias("v")),
            F.struct((-F.col("votes")).alias("nv"), F.col("_lbl").alias("l")),
        ).alias("_b")
    )
    return best.select(
        "query_id",
        F.col("_b.l").cast("long").alias("pred_label"),
        F.col("_b.v").alias("votes"),
    )


def pinned_cell(
    vec_col: str | Column,
    dim: int = 64,
    n_centroids: int = 16,
    scale: int = 1_000_000,
) -> Column:
    """Map-only cluster assignment against the pinned integer
    centroids: argmax of exact BIGINT dot products (ties -> lowest
    centroid index) — the engine-exact cell id shared by
    ivf_topk_pinned and semantic_dedup. At 100 TB this is the
    write-time partition key."""
    # single nested-array literal + one transform lane (not
    # n_centroids separate zip_with lanes): same bit-identical argmax,
    # ~1000 fewer py4j expression-node round trips at plan-build time
    C = pinned_centroids(dim, n_centroids)
    cents_sql = "array(" + ",".join(
        "array(" + ",".join(f"{int(w)}L" for w in row) + ")" for row in C
    ) + ")"
    qv = quantize_vec(vec_col, scale)
    darr = F.transform(
        F.expr(cents_sql),
        lambda c: F.aggregate(
            F.zip_with(qv, c, lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(darr, F.array_max(darr)) - 1).cast("long")


def semantic_dedup(
    df: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, then drop within-cluster
    semantic duplicates — paraphrase-level redundancy that lexical
    MinHash/Jaccard never sees.

    A vector is DROPPED iff some lower-id vector in the SAME cell has
    cosine >= tau with it (the deterministic min-id-dominator rule —
    the same survivor convention as keep_canonical). Returns the
    dropped rows: [drop_id, cell, keeper_id, cos_keeper] where keeper
    is the smallest dominator and cos_keeper its (round-6) cosine.

    Scale shape: cell assignment is MAP-ONLY (pinned_cell); the
    quadratic cosine verify is confined within cells, so the join cost
    is Σ|cell|² — n_centroids grows with the corpus (√N rule) to keep
    cells bounded, exactly the SemDeDup recipe. One cell-keyed
    exchange + one drop-id aggregate.
    """
    from alerta_spark.ops.dedupe import _persist

    # cell assignment in AGGREGATION shape (posexplode + broadcast
    # centroid join + hash agg + argmax) — the 16 interpreted
    # higher-order dot lanes of pinned_cell are the PQ/kmeans lesson
    # again. Argmax = max(struct(dot, -cent)) so ties still go to the
    # LOWEST centroid index, matching pinned_cell/the oracle exactly.
    spark = df.sparkSession
    C = pinned_centroids(dim, n_centroids)
    cw = spark.createDataFrame(
        [
            (c_, p_, int(w_))
            for c_, wts in enumerate(C)
            for p_, w_ in enumerate(wts)
        ],
        "cent long, pos int, w long",
    )
    comp = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(quantize_vec(vec_col)).alias("pos", "xq"),
    )
    cells = (
        comp.join(F.broadcast(cw), "pos")
        .groupBy("_id", "cent")
        .agg(F.sum(F.col("xq") * F.col("w")).cast("long").alias("dot"))
        .groupBy("_id")
        .agg(F.max(F.struct(F.col("dot"), (-F.col("cent")).alias("nc"))).alias("_m"))
        .select("_id", (-F.col("_m.nc")).cast("long").alias("cell"))
    )

    # norms are computed ONCE per vector here, not per pair — the
    # within-cell join below evaluates |cell|^2/2 cosines and would
    # otherwise re-derive both norms for every pair (3x the aggregate
    # work; measured 7.8s -> ~4s at sf0.1). sqrt-then-multiply keeps
    # the float expression tree identical to cosine()'s.
    assigned = _persist(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_nm"),
        ).join(cells, "_id")
    )
    a = assigned.select(
        F.col("_id").alias("_ka"),
        F.col("_v").alias("_va"),
        F.col("_nm").alias("_na"),
        "cell",
    )
    b = assigned.select(
        F.col("_id").alias("_kb"),
        F.col("_v").alias("_vb"),
        F.col("_nm").alias("_nb"),
        "cell",
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("_ka") < F.col("_kb"))
        .select(
            "cell",
            "_ka",
            "_kb",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("_cos"),
        )
        .where(F.col("_cos") >= F.lit(tau))
    )
    return pairs.groupBy("_kb").agg(
        F.min("cell").alias("cell"),  # constant within the group
        F.min("_ka").cast("long").alias("keeper_id"),
        F.min_by("_cos", "_ka").alias("cos_keeper"),
    ).select(
        F.col("_kb").alias("drop_id"), "cell", "keeper_id", "cos_keeper"
    )


def int8_quantization_report(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1 << 20,
) -> DataFrame:
    """Per-dimension int8 quantization audit: the 4x memory cut every
    large ANN index takes, with its reconstruction error measured
    engine-exactly.

    Codes: code = floor((x - min_d) * 254 / (max_d - min_d)),
    reconstruction x̂ = min_d + (code + 0.5) * (max_d - min_d) / 254.
    Per-dim stats come from ONE posexplode + (pos) aggregate (64
    rows), broadcast back onto a map-only encode pass; the error
    aggregate quantizes each |x - x̂| to fixed-point BIGINT before
    summing (float sums are partition-order ulp-nondeterministic;
    BIGINT sums are exact), crossing to double once for the mean.

    -> 1 row per dimension: [pos, min_x, max_x, n, mean_abs_err,
    max_err_q]. Constant output size regardless of corpus rows.
    """
    comp = df.select(
        F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).select((F.col("pos") + 1).alias("pos"), F.col("x").cast("double").alias("x"))
    stats = comp.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    j = comp.join(F.broadcast(stats), "pos")
    code = F.floor(
        (F.col("x") - F.col("mn")) * F.lit(254.0) / (F.col("mx") - F.col("mn"))
    )
    # the top edge x == max maps to 254; clamp into [0, 253] buckets
    code = F.least(code, F.lit(253.0))
    xhat = F.col("mn") + (code + F.lit(0.5)) * (
        (F.col("mx") - F.col("mn")) / F.lit(254.0)
    )
    err_q = F.floor(F.abs(F.col("x") - xhat) * F.lit(float(quant))).cast(
        "long"
    )
    return (
        j.select("pos", "mn", "mx", err_q.alias("eq"))
        .groupBy("pos")
        .agg(
            F.min("mn").alias("_mn"),
            F.min("mx").alias("_mx"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("eq").cast("long").alias("_seq"),
            F.max("eq").cast("long").alias("max_err_q"),
        )
        .select(
            "pos",
            F.round("_mn", 6).alias("min_x"),
            F.round("_mx", 6).alias("max_x"),
            "n",
            (
                F.col("_seq").cast("double")
                / (F.col("n").cast("double") * F.lit(float(quant)))
            ).alias("mean_abs_err"),
            "max_err_q",
        )
    )


def pinned_pq_codebooks(
    dim: int = 64, n_sub: int = 8, n_codes: int = 16
) -> list[list[list[int]]]:
    """Deterministic integer PQ codebooks (splitmix64 weights, seed
    space above the IVF centroids'): [sub][code] -> sd ints in
    [-1e6, 1e6] — comparable magnitude to quantize_vec(scale=1e6)
    components, so argmin assignment is discriminative."""
    sd = dim // n_sub
    return [
        [_int_hyperplane(sd, 20_000 + s * n_codes + c) for c in range(n_codes)]
        for s in range(n_sub)
    ]


def pq_topk_pinned(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 16,
    scale: int = 1_000_000,
) -> DataFrame:
    """Product-quantization ANN with PINNED integer codebooks: the
    exact-oracle companion to :func:`pq_topk` (same relationship as
    ivf_topk_pinned to ivf_topk). Everything after training is exact
    BIGINT: per-subspace code assignment is argmin of integer L2
    (ties -> lowest code), the per-query ADC lookup table is integer
    distances, and the candidate score is n_sub table lookups summed
    — so encode, LUT, scores, and the top-k cut all hash-check.

    Plan shape matches production PQ: encode is MAP-ONLY on the
    corpus (the 8-byte code row is all the scan ever ships), queries
    + LUTs broadcast, TakeOrdered per query.

    -> [query_id, neighbor_id, pq_dist_q].
    """
    B = pinned_pq_codebooks(dim, n_sub, n_codes)
    sd = dim // n_sub
    qv = quantize_vec(vec_col, scale)

    # AGGREGATION shape, not 128 projection lanes: the per-(sub, code)
    # distances come from ONE posexplode + a broadcast codebook join +
    # a codegen'd hash aggregate. The lane form (16 codes x 8 subs of
    # aggregate(zip_with(...))) is interpreted per element — measured
    # 8.9s at sf0.1 vs ~2s for this shape (the README's MinHash
    # projection-collapse lesson, third occurrence).
    from alerta_spark.ops.dedupe import _persist

    spark = df.sparkSession
    cb_rows = [
        (s_, c_, i_, int(w_))
        for s_ in range(n_sub)
        for c_ in range(n_codes)
        for i_, w_ in enumerate(B[s_][c_])
    ]
    cb = spark.createDataFrame(cb_rows, "sub int, code int, i int, w long")

    comp = df.select(
        F.col(id_col).alias("_id"), F.posexplode(qv).alias("_p", "_x")
    ).select(
        "_id",
        F.expr("_p div " + str(sd)).cast("int").alias("sub"),
        F.expr(f"_p % {sd}").cast("int").alias("i"),
        F.col("_x").alias("_x"),
    )
    d = (
        comp.join(F.broadcast(cb), ["sub", "i"])
        .groupBy("_id", "sub", "code")
        .agg(
            F.sum((F.col("_x") - F.col("w")) * (F.col("_x") - F.col("w")))
            .cast("long")
            .alias("dist")
        )
    )
    # per (id, sub): code = argmin (dist, code); lut = dists in code
    # order — both from sorted collects (deterministic total orders)
    per_sub = d.groupBy("_id", "sub").agg(
        F.min(F.struct("dist", "code")).getField("code").alias("_code"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("code", "dist"))),
            lambda st: st["dist"],
        ).alias("_lut"),
    )
    staged = _persist(
        per_sub.groupBy("_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "_code"))),
                lambda st: st["_code"].cast("long"),
            ).alias("codes"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "_lut"))),
                lambda st: st["_lut"],
            ).alias("lut"),
        )
    )
    corpus = staged.select(
        F.col("_id").alias("neighbor_id"), "codes"
    )
    queries = staged.where(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"), "lut"
    )
    joined = corpus.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    )
    dist = None
    for s in range(n_sub):
        term = F.element_at(
            F.element_at("lut", s + 1),
            (F.element_at("codes", s + 1) + 1).cast("int"),
        )
        dist = term if dist is None else dist + term
    scored = joined.select(
        "query_id", "neighbor_id", dist.cast("long").alias("pq_dist_q")
    )
    w = W.partitionBy("query_id").orderBy(
        F.asc("pq_dist_q"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def mmr_rerank(
    df: DataFrame,
    query_id: int,
    n_candidates: int = 20,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1 << 20,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick k of the top-``n_candidates`` cosine
    neighbors maximizing λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s) — the
    diversity-aware cut between ANN recall and what a RAG prompt
    actually wants.

    Distribution of labor at scale: the corpus-sized work (candidate
    recall via cosine_topk, the |C|² candidate-pair similarity
    matrix) runs in Spark; the greedy loop itself is O(|C|·k) over a
    BOUNDED candidate set and runs driver-side on fixed-point BIGINT
    scores (floor(cos·2^20), ties -> lowest id) — deterministic
    across engines/retries like the other pinned ops, replayed in
    tests against a pure-Python reference.

    -> [rank, vec_id, rel_q, mmr_q] (rank 1-based selection order).
    """
    cands = cosine_topk(df, [query_id], k=n_candidates, id_col=id_col,
                        vec_col=vec_col)
    rel = {
        r["neighbor_id"]: int(
            __import__("math").floor(r["cos"] * quant)
        )
        for r in cands.collect()
    }
    ids = sorted(rel)
    sub = df.where(F.col(id_col).isin(ids)).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    a = sub.select(F.col("_id").alias("_a"), F.col("_v").alias("_va"))
    b = sub.select(F.col("_id").alias("_b"), F.col("_v").alias("_vb"))
    pair_rows = (
        a.join(b, F.col("_a") < F.col("_b"))
        .select(
            "_a",
            "_b",
            F.floor(
                F.round(cosine(F.col("_va"), F.col("_vb")), 6)
                * F.lit(float(quant))
            ).cast("long").alias("_s"),
        )
        .collect()
    )
    sim: dict[tuple[int, int], int] = {}
    for r in pair_rows:
        sim[(r["_a"], r["_b"])] = r["_s"]
        sim[(r["_b"], r["_a"])] = r["_s"]

    lam_q = int(lam * quant)
    selected: list[tuple[int, int, int]] = []  # (id, rel, mmr score)
    chosen: list[int] = []
    remaining = list(ids)
    for _ in range(min(k, len(remaining))):
        best = None
        for cid in remaining:
            max_s = max((sim[(cid, s)] for s in chosen), default=0)
            score = lam_q * rel[cid] - (quant - lam_q) * max_s
            cand = (-score, cid)
            if best is None or cand < best:
                best = cand
        cid = best[1]
        max_s = max((sim[(cid, s)] for s in chosen), default=0)
        selected.append(
            (cid, rel[cid], lam_q * rel[cid] - (quant - lam_q) * max_s)
        )
        chosen.append(cid)
        remaining.remove(cid)

    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (i + 1, cid, r, s)
            for i, (cid, r, s) in enumerate(selected)
        ],
        "rank long, vec_id long, rel_q long, mmr_q long",
    )


def _cell_knn_arrow(base: DataFrame, k: int) -> DataFrame:
    """Per-cell exact kNN via one Arrow kernel per cell: d2(a,b) =
    n2a + n2b - 2·dot over the quantized int64 components, computed as
    a float64 BLAS matmul — EXACT (every n2/dot is an integer < 2.8e14
    < 2^53, and a+b-2c over exact integers cannot round), so the
    emitted (cell, a, b, d2) rows are bit-identical to the BIGINT
    join-path fold. Tie-break (d2 asc, id asc) via stable argsort over
    id-sorted columns. Replaces a Σ|cell|²-row shuffle + interpreted
    per-pair fold with |cells| matmuls; requires a cell's members to
    fit in executor memory — the same √N-centroid sizing rule the
    join path's Σ|cell|² cost already imposes.

    base: [_id, _q, cell] -> [cell, a, b, d2] (<= k rows per point).
    """
    import numpy as np
    import pandas as pd

    from alerta_spark._ship import ensure_shipped

    ensure_shipped(base.sparkSession)
    out_schema = "cell long, a long, b long, d2 long"

    def fn(key, pdf):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(columns=["cell", "a", "b", "d2"])
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy(np.int64)
        Q = np.vstack(
            pdf["_q"].map(lambda v: np.asarray(v, dtype=np.float64))
        )
        n2 = (Q * Q).sum(axis=1)
        D = n2[:, None] + n2[None, :] - 2.0 * (Q @ Q.T)
        np.fill_diagonal(D, np.inf)
        kk = min(k, n - 1)
        # columns are in ascending-id order, so a STABLE argsort on d2
        # breaks ties by smallest id — the join path's (d2, b) order
        idx = np.argsort(D, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(n), kk)
        cols = idx.reshape(-1)
        return pd.DataFrame(
            {
                "cell": np.int64(key[0]),
                "a": ids[rows],
                "b": ids[cols],
                "d2": D[rows, cols].astype(np.int64),
            }
        )

    return base.groupBy("cell").applyInPandas(fn, out_schema)


def embedding_lof(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    scale: int = 1_000_000,
    impl: str = "arrow",
) -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000, public algorithm)
    over an embedding column, cell-confined and engine-exact.

    Density-based outlier score: a point whose local reachability
    density is much lower than its neighbors' gets LOF >> 1 — the
    embedding-space screen for corrupted/off-manifold vectors that a
    plain distance-to-centroid cut misses (it flags points in sparse
    regions RELATIVE to their own neighborhood).

    Exactness discipline: distances are squared-L2 over the
    fixed-point quantized vectors (BIGINT; max of a monotone
    transform == transform of the max, so reach-dist computed in
    d²-space is the squared classic reach-dist — the variant is
    documented, deterministic, and cross-engine exact). lrd ratios
    never materialize as floats: each LOF term is the integral
    division (n_b · den_a · 10^6) div (den_b · n_a) in DECIMAL(38),
    summed as BIGINT, ONE final double division.

    Scale shape: kNN is confined to the pinned-centroid cell (the
    SemDeDup/IVF partition key — map-only assignment, Σ|cell|² pair
    work, √N centroids at 100 TB keeps cells bounded); every later
    join is point-keyed. No global pair join anywhere. Two kNN
    implementations produce bit-identical rows: ``impl="arrow"``
    (default — one BLAS matmul per cell via applyInPandas, exact by
    the <2^53 integer argument; needs a cell to fit in executor
    memory, the same √N sizing rule) and ``impl="join"`` (the salted
    within-cell pair join + BIGINT fold — streams pairs, no per-cell
    materialization).

    -> [vec_id, cell, n_nb, kdist_q, den_q, lof_q, lof] for the
    top-20 LOF scores (ties -> lowest id), integer-ordered cut.
    """
    from alerta_spark.ops.dedupe import _persist

    base = _persist(
        df.select(
            F.col(id_col).alias("_id"),
            quantize_vec(vec_col, scale).alias("_q"),
            pinned_cell(vec_col, dim, n_centroids, scale).alias("cell"),
        )
    )
    if impl == "arrow":
        raw_knn = _cell_knn_arrow(base, k)
    elif impl == "join":
        # SALTED within-cell pair join: n_centroids alone gives too few
        # join keys for a many-core shuffle (16 keys -> 16 live tasks
        # and the hottest cell is the straggler — measured 8.3s vs ~2s
        # at sf0.1/local[32]). The probe side carries salt = id mod S,
        # the build side replicates S ways; output-invisible, bounded
        # x8 duplication of the (tiny) per-row payload.
        n_salt = 8
        a = base.select(
            "cell",
            F.col("_id").alias("a"),
            F.col("_q").alias("qa"),
            (F.col("_id") % n_salt).alias("_salt"),
        )
        b = base.select(
            "cell",
            F.col("_id").alias("b"),
            F.col("_q").alias("qb"),
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(n_salt - 1).cast("long")
                )
            ).alias("_salt"),
        )
        d2 = F.aggregate(
            F.zip_with(
                F.col("qa"), F.col("qb"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        pairs = (
            a.join(b, ["cell", "_salt"])
            .where(F.col("a") != F.col("b"))
            .select("cell", "a", "b", d2.alias("d2"))
        )
        wk = W.partitionBy("a").orderBy(F.asc("d2"), F.asc("b"))
        raw_knn = (
            pairs.withColumn("rn", F.row_number().over(wk))
            .where(F.col("rn") <= k)
            .drop("rn")
        )
    else:
        raise ValueError(f"unknown impl: {impl}")
    # knn is point-sized (<= k rows per point) and feeds FOUR
    # consumers (stats, reach, terms, and transitively den) — persist
    # or the kNN subtree re-evaluates per consumer (measured: the
    # whole query drops 7.9s -> ~2s at sf0.1 on the join path)
    knn = _persist(raw_knn)
    stats = knn.groupBy("a").agg(
        F.max("d2").cast("long").alias("kdist_q"),
        F.count(F.lit(1)).cast("long").alias("n_nb"),
        F.min("cell").alias("cell"),
    )
    # reach(a,b) = max(kdist(b), d2(a,b)); den(a) = sum over neighbors
    reach = knn.join(
        stats.select(F.col("a").alias("b"), F.col("kdist_q").alias("kdist_b")),
        "b",
    ).select("a", "b", F.greatest("kdist_b", "d2").alias("reach_q"))
    den = reach.groupBy("a").agg(F.sum("reach_q").cast("long").alias("den_q"))
    pt = stats.join(den, "a")
    terms = (
        knn.select("a", "b")
        .join(
            pt.select(
                F.col("a").alias("b"),
                F.col("n_nb").alias("n_b"),
                F.col("den_q").alias("den_b"),
            ),
            "b",
        )
        .join(pt.select("a", "n_nb", "den_q", "cell", "kdist_q"), "a")
        .select(
            "a",
            F.expr(
                "CAST(CAST(n_b AS DECIMAL(38,0)) * den_q * 1000000 AS"
                " DECIMAL(38,0)) div (CAST(den_b AS DECIMAL(38,0)) * n_nb)"
            )
            .cast("long")
            .alias("term_q"),
        )
    )
    lof = terms.groupBy("a").agg(F.sum("term_q").cast("long").alias("lof_q"))
    out = (
        pt.join(lof, "a")
        .select(
            F.col("a").alias(id_col),
            F.col("cell"),
            "n_nb",
            "kdist_q",
            "den_q",
            "lof_q",
            (
                F.col("lof_q").cast("double")
                / (F.col("n_nb").cast("double") * F.lit(1000000.0))
            ).alias("lof"),
        )
    )
    # top-20 via orderBy+limit -> TakeOrderedAndProject (per-partition
    # top-20, driver merge of 20-row heaps) — NOT a global row_number
    # window, which would single-partition-shuffle every scored doc.
    return out.orderBy(F.desc("lof_q"), F.asc(id_col)).limit(20)


def hard_triplets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
    max_ref: int = 65_536,
) -> DataFrame:
    """Hardest-positive / hardest-negative mining: for every anchor,
    the most-similar same-label vector and the most-similar
    different-label vector, with the margin between them — the batch
    primitive of metric-learning pipelines.

    Shape: the reference set — the `max_ref` LOWEST-id vectors, an
    EXPLICIT driver-memory cap (TakeOrderedAndProject, never a full
    corpus collect; 65,536 x 64 x 8 B ≈ 32 MB broadcast) — ships as
    one quantized int64 matrix; anchors stream through an
    Arrow-batched numpy kernel doing one integer matmul per batch
    (every |q| <= scale*0.6 and dim=64 keeps each dot < 2^53, so
    int64->float64 is exact and the cosine is the same IEEE
    sqrt/div/floor sequence the SQL oracle runs). Ranking tie-breaks
    by smallest candidate id via an order-preserving composite key
    (cq * 2^32 - id).

    Capped-reference semantics: when the corpus fits under `max_ref`
    the result is exact all-pairs mining (the oracle's form); beyond
    it, the hardest pos/neg come from the fixed lowest-id memory bank
    — the standard bounded-negative-pool regime of metric-learning
    batches. At full corpus scale the candidate set instead comes
    from the LSH/IVF generators (lsh_topk / ivf_topk), for which this
    is the exact within-batch form; anchors always stream
    distributed, so driver memory stays O(max_ref) regardless of
    corpus size.

    -> [anchor_id, pos_id, neg_id, cos_pos_q, cos_neg_q, margin_q]
    """
    import logging

    import numpy as np

    from alerta_spark._ship import ensure_shipped

    spark = df.sparkSession
    ensure_shipped(spark)

    rows = (
        df.select(id_col, label_col, vec_col)
        .orderBy(id_col)
        .limit(max_ref + 1)
        .collect()
    )
    if len(rows) > max_ref:
        # the semantic switch from exact all-pairs to capped-bank
        # mining must be OBSERVABLE, not silent (callers with corpora
        # over the cap would otherwise believe they got the exact form)
        logging.getLogger(__name__).warning(
            "hard_triplets: corpus exceeds max_ref=%d; mining against "
            "the %d lowest-%s memory bank, not exact all-pairs "
            "(use the production embedding_triplet_mining blocked "
            "form / LSH-IVF candidate generators for full-corpus "
            "mining)",
            max_ref,
            max_ref,
            id_col,
        )
        rows = rows[:max_ref]
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    labels = np.array([r[1] for r in rows], dtype=np.int64)
    # floor(x * scale): float32 -> float64 is exact, mul/floor IEEE
    Q = np.floor(
        np.array([r[2] for r in rows], dtype=np.float64) * scale
    ).astype(np.int64)
    n2 = (Q * Q).sum(axis=1)  # < 2^53: exact in int64 AND float64
    sb = np.sqrt(n2.astype(np.float64))
    bc = spark.sparkContext.broadcast((ids, labels, Q, n2, sb))

    out_schema = (
        "anchor_id long, pos_id long, neg_id long, "
        "cos_pos_q long, cos_neg_q long, margin_q long"
    )

    def mine(batches):
        import pandas as pd

        cids, clabels, CQ, cn2, csb = bc.value
        neg_inf = np.int64(-(1 << 62))
        for pdf in batches:
            if not len(pdf):
                continue
            aid = pdf["anchor_id"].to_numpy(dtype=np.int64)
            A = np.floor(
                np.vstack(
                    pdf["vec"].map(
                        lambda v: np.asarray(v, dtype=np.float64)
                    )
                )
                * scale
            ).astype(np.int64)
            alab = pdf["lab"].to_numpy(dtype=np.int64)
            an2 = (A * A).sum(axis=1)
            sa = np.sqrt(an2.astype(np.float64))
            # float64 matmul takes the BLAS path (int64 matmul is a
            # naive loop, ~50x slower at 10x scale); it stays EXACT:
            # every product (< 3.5e11) and 64-term partial sum
            # (< 2.3e13) is an integer below 2^53, so accumulation
            # order cannot round
            dots = A.astype(np.float64) @ CQ.T.astype(np.float64)
            cq = np.floor(
                dots / (sa[:, None] * csb[None, :]) * scale
            ).astype(np.int64)
            # composite key: primary cq desc, tie-break smallest id.
            # |cq| <= scale so cq << 32 dominates any id < 2^32.
            key = (cq << np.int64(32)) - cids[None, :]
            same = alab[:, None] == clabels[None, :]
            self_mask = aid[:, None] == cids[None, :]
            pos_key = np.where(same & ~self_mask, key, neg_inf)
            neg_key = np.where(~same, key, neg_inf)
            pi = np.argmax(pos_key, axis=1)
            ni = np.argmax(neg_key, axis=1)
            r = np.arange(len(aid))
            # an anchor whose label has no OTHER member (or no
            # different-label vector exists) has an all-masked key row;
            # argmax would return a bogus index 0 — drop it, exactly as
            # the SQL form's inner join does
            ok = (pos_key[r, pi] > neg_inf) & (neg_key[r, ni] > neg_inf)
            yield pd.DataFrame(
                {
                    "anchor_id": aid[ok],
                    "pos_id": cids[pi[ok]],
                    "neg_id": cids[ni[ok]],
                    "cos_pos_q": cq[r[ok], pi[ok]],
                    "cos_neg_q": cq[r[ok], ni[ok]],
                    "margin_q": cq[r[ok], pi[ok]] - cq[r[ok], ni[ok]],
                }
            )

    anchors = df.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("lab"),
        F.col(vec_col).alias("vec"),
    )
    return anchors.mapInPandas(mine, out_schema)


def hard_triplets_from_candidates(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Fully DISTRIBUTED triplet mining from a candidate-pair frame —
    the corpus-scale form :func:`hard_triplets`'s docstring prescribes:
    candidates come from a blocking generator (LSH buckets, IVF cells,
    :func:`pinned_cell` equality), so NOTHING broadcasts and NOTHING
    collects; work is Σ|block|², driver memory O(1).

    Each directed pair joins the quantized vectors by id and gets the
    exact integer cosine cq = floor(dot / (|a|·|b|) · 1e6): the BIGINT
    dot of floor(x·1e6) components stays < 2^53, so the double
    division and floor are the same IEEE sequence the numpy matmul in
    :func:`hard_triplets` and the SQL oracle run. Hardest positive /
    negative per anchor are max_by aggregations on the UNIQUE
    composite key cq·2^32 − cand_id (primary: cosine desc, tie-break:
    smallest candidate id — hard_triplets' convention). Anchors
    lacking a positive or a negative among their candidates drop,
    exactly as the oracle's inner join does.

    ``candidates``: DataFrame[id_a, id_b] undirected pairs (each is
    mined in both directions).

    -> [anchor_id, pos_id, neg_id, cos_pos_q, cos_neg_q, margin_q]
    """
    from alerta_spark.ops.dedupe import _persist

    # persisted: the quantized frame feeds BOTH pair sides — without it
    # each side re-scans the corpus (the plan showed 12 file scans)
    q = _persist(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).alias("_lab"),
            quantize_vec(vec_col, scale).alias("_q"),
        ).withColumn(
            "_n2",
            F.aggregate(
                F.transform(F.col("_q"), lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    )
    und = candidates.select(
        F.col("id_a").alias("anchor_id"), F.col("id_b").alias("cand_id")
    ).unionByName(
        candidates.select(
            F.col("id_b").alias("anchor_id"), F.col("id_a").alias("cand_id")
        )
    )
    a = q.select(
        F.col("_id").alias("anchor_id"),
        F.col("_lab").alias("_lab_a"),
        F.col("_q").alias("_qa"),
        F.col("_n2").alias("_n2a"),
    )
    b = q.select(
        F.col("_id").alias("cand_id"),
        F.col("_lab").alias("_lab_b"),
        F.col("_q").alias("_qb"),
        F.col("_n2").alias("_n2b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("_qa"), F.col("_qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cq = F.floor(
        dot.cast("double")
        / (F.sqrt(F.col("_n2a").cast("double")) * F.sqrt(F.col("_n2b").cast("double")))
        * F.lit(float(scale))
    ).cast("long")
    scored = (
        und.join(a, "anchor_id")
        .join(b, "cand_id")
        .select(
            "anchor_id",
            "cand_id",
            (F.col("_lab_a") == F.col("_lab_b")).alias("_same"),
            cq.alias("_cq"),
        )
        .withColumn(
            "_k", F.col("_cq") * F.lit(1 << 32).cast("long") - F.col("cand_id")
        )
    )
    pos = (
        scored.where(F.col("_same"))
        .groupBy("anchor_id")
        .agg(
            F.max_by("cand_id", "_k").alias("pos_id"),
            F.max_by("_cq", "_k").alias("cos_pos_q"),
        )
    )
    neg = (
        scored.where(~F.col("_same"))
        .groupBy("anchor_id")
        .agg(
            F.max_by("cand_id", "_k").alias("neg_id"),
            F.max_by("_cq", "_k").alias("cos_neg_q"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "pos_id",
        "neg_id",
        "cos_pos_q",
        "cos_neg_q",
        (F.col("cos_pos_q") - F.col("cos_neg_q")).alias("margin_q"),
    )
