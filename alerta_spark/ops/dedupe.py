"""Deduplication operators for training-data pipelines.

Five tiers, each a different cost/recall point, all shuffle-aware:

- exact_dedup          hash-groupBy on a content digest (1 shuffle)
- ngram_jaccard_pairs  EXACT shingle-Jaccard via an inverted-index
                       self-join (the oracle-checkable ground truth)
- minhash_lsh_pairs    MinHash signatures + LSH banding: candidate
                       generation is O(docs x bands), verification only
                       on collided pairs — the 100 TB scale path
- simhash_near_dups    64-bit SimHash + pigeonhole banding for
                       hamming-distance near-dups
- embedding near-dup   see similarity.cosine_pairs (cosine >= tau)

Skew notes: the inverted-index join salts nothing but *caps* stop-
shingles (a shingle appearing in more than `max_doc_freq` docs can be
dropped — standard practice, off by default to preserve exactness);
LSH band buckets are (band_id, band_hash) keyed so hot buckets split
across partitions naturally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alerta_spark.ops.text import normalize_text, tokenize


def shingles(col: Column | str, n: int = 5) -> Column:
    """n-gram (word) shingles as array<string>; documents shorter than
    n tokens yield their whole text as one shingle.

    NOTE: array-valued form for small inputs/tests. In pipelines use
    :func:`shingle_rows` — the slice-inside-transform lambda here
    re-evaluates the tokenize subtree per shingle, which is a 3-4x
    slowdown at scale."""
    toks = tokenize(col)
    k = F.size(toks)
    return F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def shingle_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """DISTINCT (id, shingle) rows via posexplode + window leads: each
    token is produced and read exactly once; the n-gram is a concat of
    n-1 leads over the per-doc position order. One shuffle (window by
    doc id) — and every downstream consumer (minhash, inverted index,
    verification sets) starts from these rows. Documents shorter than
    n tokens contribute their whole text as one shingle (parity with
    :func:`shingles`)."""
    from pyspark.sql import Window as W

    tok = df.select(
        F.col(id_col).alias("_id"), F.posexplode(tokenize(text_col)).alias("pos", "tok")
    )
    w = W.partitionBy("_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, n)]
    out = tok.select(
        "_id",
        "pos",
        F.concat_ws(" ", F.col("tok"), *leads).alias("shingle"),
        F.lead("tok", n - 1).over(w).alias("_last"),
        F.count(F.lit(1)).over(W.partitionBy("_id")).alias("_n"),
    )
    return (
        out.where(
            F.col("_last").isNotNull() | ((F.col("_n") < n) & (F.col("pos") == 0))
        )
        .select("_id", "shingle")
        .distinct()
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by normalized-content digest.

    -> [keep_id, dup_count, dup_ids] one row per distinct content;
    keep_id = min id (deterministic survivor). Single hash shuffle on
    the digest — no skew risk beyond genuinely identical content.
    """
    digest = F.md5(normalize_text(text_col)).alias("digest")
    return (
        df.select(digest, F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
    )


_CACHED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    """persist + register for :func:`release_cached`. The operators
    return LAZY frames whose plans read these caches, so they must
    outlive the call — the caller owns the lifetime and releases after
    its consuming action."""
    _CACHED.append(df.persist())
    return df


def release_cached(blocking: bool = False) -> int:
    """Unpersist every frame the dedup operators cached. Call after
    the consuming action (e.g. once pairs are written); a long-lived
    driver that skips this accumulates storage memory across runs.
    Returns the number of frames released."""
    n = 0
    while _CACHED:
        try:
            _CACHED.pop().unpersist(blocking)
        except Exception:
            pass
        n += 1
    return n


def _shingle_index(
    df: DataFrame, text_col: str, id_col: str, n: int, max_doc_freq: int | None
) -> DataFrame:
    """(id, shingle) inverted index over DISTINCT shingles per doc.

    The cap must itself be skew-proof: counting doc-freq is a partial
    (map-side combined) aggregate, so a mega-hot shingle never piles
    onto one task; the hot set (df > cap) is tiny BY CONSTRUCTION
    (<= distinct-shingle-rows / cap survive the filter... in practice a
    handful of boilerplate strings), so it broadcasts and the index is
    filtered MAP-SIDE — hot rows are dropped before any shuffle keyed
    by shingle, which is exactly where they would have skewed. (A
    window count over `shingle` would re-create the skew: window
    partitions can't be split by AQE.)"""
    idx = shingle_rows(df, text_col, id_col, n)
    if max_doc_freq is not None:
        idx = _persist(idx)  # freq branch + anti-join branch: compute once
        hot = (
            idx.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_doc_freq)
            .select("shingle")
        )
        idx = idx.join(F.broadcast(hot), "shingle", "left_anti")
    return idx


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.8,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """n-gram Jaccard similarity pairs >= threshold.

    Inverted-index self-join: |A∩B| = count of shared shingles,
    |A∪B| = |A|+|B|-|A∩B|. Cost is sum over shingles of df(s)^2, so one
    boilerplate shingle shared by d documents makes a d^2 join bucket —
    a skew bomb at web scale. `max_doc_freq` therefore defaults ON:
    shingles appearing in more than that many documents are dropped from
    BOTH the index and the per-doc set sizes (so Jaccard is exact over
    the capped shingle sets — self-consistent, not an unbounded error).
    Pass ``max_doc_freq=None`` for the uncapped exact ground truth on
    corpora known to be skew-free.

    -> [id_a, id_b, jaccard] with id_a < id_b.
    """
    # the index feeds three plan branches (a-side, b-side, sizes);
    # persist it so shingle construction runs once, not three times —
    # at lake scale this materialization would be a checkpoint table
    idx = _persist(_shingle_index(df, text_col, id_col, n, max_doc_freq))
    sizes = idx.groupBy("_id").agg(F.count(F.lit(1)).alias("_size"))

    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_size").alias("size_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            (F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))).cast(
                "double"
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 64,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: sig[i] = min over shingles of
    xxhash64(i, shingle).

    Shape matters at scale: explode to (doc, shingle) rows FIRST so the
    shingle construction runs exactly once per shingle, then take the 64
    per-lane mins as ONE hash aggregate (partial min map-side, so the
    shuffle carries one 64-long row per doc per partition, not the
    shingles). The tempting pure-projection form — 64 ×
    array_min(transform(shingles, hash_i)) — re-evaluates the shingle
    expression once per lane after Catalyst's projection collapse
    (measured 40x slower at sf0.1).

    `shingle_df` lets callers supply pre-materialized
    :func:`shingle_rows` output so the shingle pipeline is built once
    and shared across consumers.
    """
    ex = (
        shingle_df
        if shingle_df is not None
        else shingle_rows(df, text_col, id_col, n)
    )
    lanes = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return (
        ex.groupBy("_id")
        .agg(*lanes)
        .select(
            "_id",
            F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("signature"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    verify: bool = True,
) -> DataFrame:
    """Approximate Jaccard near-dup pairs via MinHash + LSH banding.

    bands=16 x rows=4 over 64 hashes -> collision prob at j=0.8 is
    1-(1-0.8^4)^16 ≈ 0.9996 (high recall at the threshold). Candidates
    come from banding (groupBy (band, band_hash)); `verify=True`
    re-checks candidates with EXACT shingle Jaccard so precision is 1
    and the only approximation is missed recall.

    -> [id_a, id_b, jaccard] (jaccard = exact when verify, else
    signature estimate).
    """
    rows_per_band = num_hashes // bands
    # one shingle materialization feeds BOTH the signature aggregate
    # and the exact-Jaccard verification sets — at lake scale this
    # persist is a checkpoint table written once per corpus snapshot
    idx = shingle_rows(df, text_col, id_col, n)
    if verify:
        idx = _persist(idx)
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes, shingle_df=idx)
    banded = sigs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("signature", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")

    # the self-join below reads `banded` twice; without a persist each
    # side re-runs the whole shingle -> 64-lane min signature aggregate
    # (the most expensive stage in the pipeline). The banded frame is
    # tiny — `bands` rows of three longs per doc — so caching it costs
    # O(docs) memory and halves the signature work.
    banded = _persist(banded)
    l, r = banded.alias("l"), banded.alias("r")
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

    if not verify:
        return cand

    # verify candidates with exact jaccard over distinct shingle sets
    # (from the same persisted shingle rows as the signatures) — but
    # ONLY for docs that appear in a candidate pair: the semi-join
    # below shrinks the collect_list aggregate from corpus-size to
    # candidate-size, which at 100 TB is the difference between
    # re-aggregating every document's shingles and touching just the
    # suspected near-dups
    cand = _persist(cand)
    cand_ids = (
        cand.select(F.col("id_a").alias("_id"))
        .unionByName(cand.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    sets_ = (
        idx.join(cand_ids, "_id", "left_semi")
        .groupBy("_id")
        .agg(F.collect_list("shingle").alias("sh"))
    )
    sa = sets_.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sets_.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    n_bits: int = 64,
) -> DataFrame:
    """SimHash over whitespace tokens: bit i is 1 iff the sum of
    (+1/-1) contributions of token-hash bit i over all tokens is
    positive.

    ``hash_fn='xxhash64'`` (default) is the production path — one JVM
    hash per token. ``hash_fn='md5'`` derives a 60-bit hash from the
    md5 hex prefix (pass ``n_bits=60``): slower, but engine-portable,
    which is what lets the catalog pin the WHOLE simhash pipeline
    against an exact cross-engine oracle (the algorithm is identical;
    only the token-hash primitive changes).

    Same explode-then-aggregate shape as minhash_signatures: hash each
    token once, then n_bits partial-aggregated bit sums — not n_bits
    re-walks of the token array."""
    if hash_fn == "xxhash64":
        h = F.xxhash64("_t")
    elif hash_fn == "md5":
        h = F.conv(F.substring(F.md5("_t"), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    ex = df.select(
        F.col(id_col).alias("_id"), F.explode(tokenize(text_col)).alias("_t")
    ).select("_id", h.alias("_h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(n_bits)
    ]
    agg = ex.groupBy("_id").agg(*bit_sums)
    sig = None
    for i in range(n_bits):
        bit = (
            F.when(F.col(f"_b{i}") > 0, F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select("_id", sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
    n_bits: int = 64,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole banding: split the signature bits into (max_hamming+1)
    chunks; any pair within the distance budget collides on at least
    one chunk, so the blocked join has PERFECT recall (the catalog
    exploits this: the md5-portable variant is oracle-checked against
    all-pairs ground truth and must match exactly); hamming is
    verified exactly on collisions via bit_count(xor).
    """
    chunks = max_hamming + 1
    width = n_bits // chunks
    sigs = simhash_signatures(df, text_col, id_col, hash_fn, n_bits)
    banded = sigs.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select("_id", "simhash", "cc.chunk", "cc.key")

    # the self-join reads `banded` twice; without a persist each side
    # re-runs tokenize -> per-token hash -> the 64-lane bit-sum
    # aggregate (the expensive stage — doubly so on the md5-portable
    # path). chunks rows of four scalars per doc, so the cache is tiny.
    banded = _persist(banded)
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.expr("bit_count(l.simhash ^ r.simhash)").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    driver_edges_max: int = 1_000_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every document
    in a transitive dup group gets the group's min id as cluster_id
    (the survivor to keep). -> [doc_id, cluster_id].

    Two regimes. The symmetrized edge list is checkpointed either way
    (see below), so counting it is free; up to ``driver_edges_max``
    edges (near-dup pair sets are tiny relative to their corpus — the
    whole point of dedup is that dups are the minority) the components
    come from ONE collect + exact union-find on the driver, replacing
    2+ full join jobs per propagation round with zero (measured ~5s ->
    ~0.3s on a 250-pair graph; union-find is also EXACT transitive
    closure, where capped min-label rounds under-merge any component
    whose diameter exceeds ``max_iters``). Beyond the cap, the
    distributed loop below runs unchanged:

    Iterative min-label propagation: each round every vertex takes the
    min of its own label and its neighbors' labels; converges in
    O(component diameter) rounds — near-dup clusters are shallow (a
    dup of a dup of X is usually a dup of X), so a handful of rounds
    closes 100 TB-scale graphs. Each round is one self-contained
    shuffle join; frames are persisted per round and released after.

    Lineage is truncated with ``localCheckpoint`` every few rounds:
    although every round's cache is materialized, the LOGICAL plan
    still chains through all previous rounds, and analyzer time (and
    plan size) grows per iteration — the standard iterative-algorithm
    hazard. The checkpoint stores to executor-local disk (same cost
    class as the persist it replaces); an executor loss mid-run means
    recomputing the run, which is acceptable for a bounded-round batch
    job and documented here deliberately.
    """
    # localCheckpoint (not just persist): edges arrive carrying the
    # WHOLE candidate-join lineage (q-gram aggregates, prefix joins),
    # and every propagation round re-embeds that subtree in the labels
    # plan — at 10x corpus scale the analyzer tree alone OOMed the
    # driver before any data moved. Truncating here bounds every
    # round's plan to edges + k label rounds regardless of caller.
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if edges.count() <= driver_edges_max:
        from pyspark.sql import types as T

        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.collect():
            s, d = r["src"], r["dst"]
            parent.setdefault(s, s)
            parent.setdefault(d, d)
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rd] = rs
        comp_min: dict = {}
        for v in parent:
            root = find(v)
            if root not in comp_min or v < comp_min[root]:
                comp_min[root] = v
        id_type = edges.schema["src"].dataType
        return edges.sparkSession.createDataFrame(
            [(v, comp_min[find(v)]) for v in parent],
            T.StructType(
                [
                    T.StructField("doc_id", id_type),
                    T.StructField("cluster_id", id_type),
                ]
            ),
        )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    for i in range(max_iters):
        prop = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), "label")
        )
        new_labels = (
            labels.select("id", "label")
            .unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
        if (i + 1) % 3 == 0:
            # truncate the logical lineage (see docstring); the frame
            # is already materialized by the `changed` count
            labels = labels.localCheckpoint()
    # the returned frame reads the final round's cache; register it so
    # release_cached() frees it once the caller has consumed the result
    _CACHED.append(labels)
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def keep_canonical(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the deduplicated corpus: drop every transitive-dup
    cluster member except the canonical (min-id) survivor.

    ``clusters`` is ``dup_clusters`` output (doc_id, cluster_id); rows
    with cluster_id == doc_id are the survivors, rows with cluster_id
    < doc_id the drops. Unclustered documents (no near-dup at all)
    survive by absence. One anti-join keyed on ``id_col`` — the drop
    list is typically a small fraction of the corpus, so AQE picks a
    broadcast anti-join when it fits and a shuffle anti-join when a
    dup-heavy corpus makes it big; no forced broadcast here."""
    drops = clusters.where(F.col("cluster_id") < F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(drops, id_col, "left_anti")


def incremental_dedup_ingest(
    spark,
    store_path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_bloom: bool = False,
    bloom_prefix_len: int = 5,
    bloom_k: int = 4,
    output_path: str | None = None,
) -> DataFrame:
    """Batch-over-batch corpus ingestion: dedup a new batch against a
    persistent fingerprint store (parquet of distinct content digests),
    return the surviving new documents, and append their digests.

    The daily-crawl maintenance op: instead of re-deduping the whole
    corpus per increment, each batch costs one within-batch shuffle on
    the digest plus one anti-join against a digest-only column scan of
    the store. Replaying the same batch yields zero survivors (retry-
    idempotent). At 100 TB, bucket the store by digest so the anti-join
    is co-located; the store never holds text, only 32-byte digests.
    Within a batch the min-id row per digest survives (deterministic).

    ``use_bloom=True`` maintains a Bloom filter of the store's digests
    alongside it (``store_path + "_bloom"``) and probes it FIRST:
    definitely-new rows (the vast majority of a healthy crawl) skip
    the store anti-join entirely; only maybe-seen rows pay it. The
    filter is ceil(16^prefix_len/60) BIGINT words — KBs against a
    store of billions — and merges by bit_or, so the maintenance is
    an O(batch) overwrite. No false negatives, so the result is
    IDENTICAL to the exact path (pinned in tests); size the bit space
    (``bloom_prefix_len``) to the expected store cardinality to keep
    the maybe-seen minority small.

    ``output_path``: when the survivors feed a corpus sink, pass it
    HERE so the output append happens before the digest append (see
    the crash-ordering comment at the write site) -- composing the two
    writes outside this function in the other order loses data on a
    crash between them.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import Window as W

    batch = new_docs.withColumn("_digest", F.md5(normalize_text(text_col)))
    w = W.partitionBy("_digest").orderBy(id_col)
    firsts = (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    bloom_path = store_path.rstrip("/") + "_bloom"
    bloom = None
    if use_bloom:
        from alerta_spark.ops.sketches import bloom_build, bloom_probe

        try:
            bloom = spark.read.parquet(bloom_path)
        except AnalysisException:
            bloom = None
    try:
        store = spark.read.parquet(store_path).select("digest")
        if bloom is not None:
            probed = bloom_probe(
                bloom,
                firsts.select(F.col("_digest")),
                "_digest",
                k=bloom_k,
                prefix_len=bloom_prefix_len,
            )
            firsts = firsts.join(probed, "_digest")
            definite_new = firsts.where(~F.col("maybe_member")).drop(
                "maybe_member"
            )
            suspects = firsts.where(F.col("maybe_member")).drop(
                "maybe_member"
            )
            kept = definite_new.unionByName(
                suspects.join(
                    store, suspects["_digest"] == store["digest"], "left_anti"
                )
            )
        else:
            kept = firsts.join(
                store, firsts["_digest"] == store["digest"], "left_anti"
            )
    except AnalysisException:  # first batch: store does not exist yet
        kept = firsts
    # Truncate lineage BEFORE appending: the append's refreshByPath
    # invalidates any *cached* plan that scans store_path, so a plain
    # persist would silently recompute against the post-append store
    # and filter the batch's own survivors out. localCheckpoint
    # materializes to executor storage with no path dependency. (At
    # cluster scale with executor churn, write the survivors to their
    # output location first and derive the digest append from that
    # file instead.)
    kept = kept.localCheckpoint(eager=True)
    if output_path is not None:
        # crash-ordering: survivors land in their OUTPUT location
        # before their digests land in the store. A crash between the
        # two re-delivers the batch and re-emits the same survivors
        # (at-least-once output -- duplicates are downstream-dedupable
        # by the very digests this op maintains); the reverse order
        # turns the same crash into silent PERMANENT loss, because
        # redelivery anti-joins against the already-appended digests
        # to zero survivors that were never written anywhere.
        kept.drop("_digest").write.mode("append").parquet(output_path)
    kept.select(F.col("_digest").alias("digest")).write.mode(
        "append"
    ).parquet(store_path)
    if use_bloom:
        from alerta_spark.ops.sketches import bloom_build

        delta = bloom_build(
            kept.select("_digest"),
            "_digest",
            k=bloom_k,
            prefix_len=bloom_prefix_len,
        )
        merged = (
            delta
            if bloom is None
            else delta.unionByName(bloom)
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
        ).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(bloom_path)
    return kept.drop("_digest")


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the
    MOSS algorithm — public): hash every character k-gram of the
    normalized text, slide a window of ``w`` consecutive hashes, keep
    each window's minimum — guaranteeing every match of length
    >= k + w - 1 shares a fingerprint while storing ~2/(w+1) of the
    hashes. The selected (position, fingerprint) set is the
    plagiarism/near-dup index a lake builds once per snapshot.

    Determinism: with ``hash_fn='md5'`` (default) the k-gram hash is
    the first 15 hex chars of md5 — engine-identical, 60-bit, what
    lets the catalog oracle replay the whole pipeline.
    ``hash_fn='xxhash64'`` is the cheaper JVM-hash production path
    (same algorithm, no DuckDB twin — the simhash split). Window
    minima compare (hash, pos) structs lexicographically, so
    equal-content hash ties break on the leftmost position
    identically everywhere.

    Plan: ONE doc-keyed exchange of the RAW documents (placed BEFORE
    the ~L-per-doc k-gram fan-out, so the shuffle moves document
    bytes, not exploded hash rows — and hashing parallelizes even
    when the input arrives in few large files), then Generate + md5
    + the position window and distinct all pipeline inside that same
    partitioning with no further exchange. Fingerprint rows are
    ~2/(w+1) of characters — the downstream near-dup join consumes
    them exactly like the shingle index."""
    from pyspark.sql import Window as W

    from alerta_spark.ops.text import normalize_text

    kg = F.expr(
        f"transform(sequence(1, greatest(length(_norm) - {k - 1}, 0)), "
        f"p -> struct(p AS pos, substring(_norm, p, {k}) AS kg))"
    )
    # explicit partition count: the pre-fan-out frame is small by
    # construction (raw docs), so AQE would coalesce it back to one
    # partition and serialize the ~L-per-doc hashing that follows
    rows = (
        df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
        .select(
            F.col(id_col).alias("_id"), normalize_text(text_col).alias("_norm")
        )
        .select("_id", F.length("_norm").alias("_len"), F.explode(kg).alias("g"))
        .select(
            "_id",
            "_len",
            F.col("g.pos").alias("pos"),
            (
                F.xxhash64("g.kg")
                if hash_fn == "xxhash64"
                else F.conv(F.substring(F.md5("g.kg"), 1, 15), 16, 10).cast(
                    "long"
                )
            ).alias("h"),
        )
    )
    win = W.partitionBy("_id").orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        rows.withColumn("_m", F.min(F.struct("h", "pos")).over(win))
        # only full windows select (window starts fitting w hashes)
        .where(F.col("pos") <= F.col("_len") - F.lit(k - 1) - F.lit(w - 1))
        .select(
            F.col("_id").alias(id_col),
            F.col("_m.pos").alias("pos"),
            F.col("_m.h").alias("fp"),
        )
        .distinct()
    )
    return sel


def winnow_near_dup_pairs(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_fp_freq: int | None = 1000,
    max_fp_frac: float | None = None,
) -> DataFrame:
    """Near-dup pairs by Jaccard over winnowing fingerprint SETS — the
    same inverted-index shape as :func:`ngram_jaccard_pairs`, but the
    index is the winnowed ~2/(w+1)-density character-level print set,
    so it catches partial overlap (shared passages) that word-shingle
    Jaccard dilutes. ``max_fp_freq`` caps boilerplate prints exactly
    like the hot-shingle cap: map-side broadcast anti-join BEFORE any
    fp-keyed shuffle, self-consistent set sizes.

    When ``max_fp_frac`` is set the drop threshold is
    min(floor(frac * n_docs), max_fp_freq): the fraction governs small
    corpora (2% of 500 docs caps boilerplate at 10), while the
    ABSOLUTE cap bounds candidate fan-in at scale. The two must
    compose — measured on the 10x replicated corpus
    (tools/scale_bench.py), a frac-only cap admits floor(0.02·50k)
    = 1000-document posting lists whose pairwise fan-out is
    quadratic: 690M candidate pairs vs 17M under a constant cap, for
    identical output pairs (ultra-common prints only ever witness
    boilerplate overlap). Candidate generation must stay O(n·cap),
    never O(n·(frac·n)). Both thresholds are computed in-plan with an
    integer-exact floor boundary.

    -> [id_a, id_b, fp_jaccard] with id_a < id_b."""
    fps = winnow_fingerprints(df, k, w, text_col, id_col).select(
        F.col(id_col).alias("_id"), "fp"
    ).distinct()
    fps = _persist(fps)
    if max_fp_frac is not None:
        n_docs = df.select(
            F.countDistinct(F.col(id_col)).alias("_nd")
        )
        thresh = F.floor(
            F.col("_nd").cast("double") * F.lit(max_fp_frac)
        )
        if max_fp_freq is not None:
            thresh = F.least(thresh, F.lit(int(max_fp_freq)).cast("long"))
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .crossJoin(F.broadcast(n_docs))
            .where(F.col("_df") > thresh)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
        fps = _persist(fps)
    elif max_fp_freq is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_fp_freq)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
        fps = _persist(fps)
    sizes = fps.groupBy("_id").agg(F.count(F.lit(1)).alias("_size"))
    a, b = fps.alias("a"), fps.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_size").alias("size_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "fp_jaccard",
            (
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).cast("double"),
        )
        .where(F.col("fp_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("fp_jaccard", 6).alias("fp_jaccard"))
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """n-gram Jaccard pairs >= threshold via PREFIX FILTERING (the
    PPJoin/AllPairs candidate generation): under any consistent global
    token order, two sets with Jaccard >= t MUST share a token within
    each one's first ``|d| - ceil(t*|d|) + 1`` tokens — so only that
    prefix is indexed. At t=0.8 the inverted index shrinks ~5x vs the
    full-index formulation in :func:`ngram_jaccard_pairs`, and the
    join cost (sum of df^2 over indexed tokens) shrinks quadratically;
    rare-first ordering makes the surviving buckets the smallest ones.

    The global order is (corpus doc-freq ASC, shingle ASC) — applied
    per document with a JVM ``sort_array`` over (freq, shingle)
    structs, so NO global rank window (which would be a
    single-partition sort) is ever materialized.

    Verification is exact: candidates join back their full sorted
    shingle arrays and the Jaccard is computed with
    ``array_intersect`` — same output contract as
    ngram_jaccard_pairs(max_doc_freq=None): [id_a, id_b, jaccard].
    """
    import math

    idx = _persist(shingle_rows(df, text_col, id_col, n))
    freq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
    with_f = idx.join(freq, "shingle")
    per_doc = _persist(
        with_f.groupBy("_id").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_f"), F.col("shingle")))
            ).alias("_ord")
        )
    )
    L = F.size("_ord")
    prefix_len = L - F.ceil(L * F.lit(float(threshold))).cast("int") + 1
    prefix = per_doc.select(
        "_id",
        F.explode(
            F.transform(
                F.slice("_ord", 1, prefix_len), lambda s: s["shingle"]
            )
        ).alias("shingle"),
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sets = per_doc.select(
        "_id",
        F.transform("_ord", lambda s: s["shingle"]).alias("_set"),
    )
    sa = sets.select(F.col("_id").alias("id_a"), F.col("_set").alias("_sa"))
    sb = sets.select(F.col("_id").alias("id_b"), F.col("_set").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    jac = inter / (F.size("_sa") + F.size("_sb") - inter)
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac.cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def fuzzy_pairs_levenshtein(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    max_edits: int = 2,
    q: int = 3,
) -> DataFrame:
    """Edit-distance near-dup pairs over a SHORT key column (titles,
    URLs, product names — the record-linkage fuzzy join): all pairs
    with levenshtein <= ``max_edits``, without the quadratic all-pairs
    scan.

    Candidate generation is the LOSSLESS q-gram prefix filter
    (Gravano et al. / the Ed-Join family): one edit destroys at most
    ``q`` positional q-grams, so strings within ``k`` edits differ in
    at most k*q gram occurrences each way — their gram multisets
    overlap in all but k*q elements. Under ANY global total order on
    gram occurrences, two such multisets must then share an element
    among each one's FIRST k*q+1 elements; ordering by ascending
    corpus frequency makes those prefix elements the RAREST, so index
    buckets stay small. Candidates additionally satisfy the length
    band |len_a - len_b| <= k (an edit changes length by <= 1); only
    survivors pay the exact ``levenshtein`` verify — the filter is
    output-invisible (the oracle is the all-pairs definition).

    Plan: gram fan-out (bounded by key length), one gram-frequency
    aggregate joined back (AQE splits hot grams), a per-key JVM
    array_sort cut to k*q+1 prefix elements (never a rank window),
    the prefix-element self-join, and the verify on distinct pairs.
    Keys shorter than ``q`` chars have no grams and are excluded
    (filter inputs or lower q).

    -> [id_a, id_b, edits]
    """
    if max_edits < 0:
        raise ValueError(f"max_edits must be >= 0, got {max_edits}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    prefix_len = max_edits * q + 1
    s = df.select(
        F.col(id_col).alias("_id"), F.col(key_col).alias("_s")
    ).where(F.length("_s") >= q)
    grams = s.select(
        "_id",
        "_s",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(_s) - {q} + 1),"
                f" i -> substring(_s, i, {q}))"
            )
        ).alias("_p", "_g"),
    )
    # occurrence index makes the multiset element (_g, _occ) — the
    # prefix principle needs multiset semantics, not set
    occ = _persist(
        grams.groupBy("_id", "_s", "_g")
        .agg(F.count("*").alias("_c"))
        .select(
            "_id",
            "_s",
            "_g",
            F.explode(F.expr("sequence(1, int(_c))")).alias("_occ"),
        )
    )
    # corpus gram frequency DELIBERATELY stays groupBy + join-back, not
    # a count-window over (_g, _occ): the aggregate partial-combines
    # map-side and the join is AQE-skew-splittable, while a window
    # partition holds EVERY key sharing a hot gram (think the "htt"
    # gram of a URL key column) in one task — a 100 TB straggler.
    # test_plans pins Window out of this plan for exactly that reason.
    dfreq = occ.groupBy("_g", "_occ").agg(F.count("*").alias("_df"))
    prefix = (
        occ.join(dfreq, ["_g", "_occ"])
        .groupBy("_id", "_s")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct("_df", "_g", "_occ"))
                ),
                1,
                prefix_len,
            ).alias("_pre")
        )
        .select(
            "_id",
            "_s",
            F.explode("_pre").alias("_e"),
        )
        .select("_id", "_s", F.col("_e._g").alias("_g"), F.col("_e._occ").alias("_occ"))
    )
    # the candidate self-join reads `prefix` twice; unpersisted, each
    # side re-ran grams -> occurrence aggregate -> frequency window ->
    # prefix cut. At most prefix_len short rows per key — tiny cache.
    prefix = _persist(prefix)
    a = prefix.select(
        F.col("_id").alias("id_a"),
        F.col("_s").alias("_sa"),
        "_g",
        "_occ",
    )
    b = prefix.select(
        F.col("_id").alias("id_b"),
        F.col("_s").alias("_sb"),
        "_g",
        "_occ",
    )
    cand = (
        a.join(b, ["_g", "_occ"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(F.length("_sa") - F.length("_sb"))
                <= F.lit(max_edits)
            )
        )
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    return (
        cand.withColumn("edits", F.levenshtein("_sa", "_sb").cast("long"))
        .where(F.col("edits") <= max_edits)
        .select("id_a", "id_b", "edits")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_anchors: bool = True,
) -> DataFrame:
    """Substring-containment dedup: (inner_id, outer_id) pairs where
    the whole normalized text of `inner` occurs inside `outer` —
    quote-inclusion / mirror-with-banner duplicates that Jaccard at
    0.8 misses when the outer doc is much longer.

    Candidate generation is a LOSSLESS rare-anchor probe, the X85
    q-gram idea lifted to shingles: if norm(inner) ⊆ norm(outer) then
    inner's INTERIOR tokens (first and last dropped — the boundary
    tokens may fuse with outer text at a non-whitespace seam) appear
    as a consecutive token run of outer, so EVERY interior n-shingle
    of inner is in outer's shingle set. Probing the inverted index at
    inner's globally RAREST interior shingle (min doc-freq, shingle
    lexical tie-break) therefore finds every true pair while touching
    the smallest possible posting list; exact `contains` verification
    runs only on candidates. Inner docs need >= n+2 tokens to own an
    interior shingle — shorter docs are out of scope (the op's
    documented eligibility rule; the oracle applies the same filter).

    Scale: outer-side index = the shared shingle_rows frame (one
    corpus scan + one doc-keyed window); doc-freq is a partial
    aggregate; with ``broadcast_anchors`` the distinct anchor-shingle
    set map-side filters the index BEFORE the probe join, so no hot
    posting list ever shuffles (set it False when the inner pool is
    itself lake-sized). Verification joins text for candidate ids
    only. Pairs with equal text keep the (min_id, max_id) orientation.
    """
    norm = normalize_text(F.col(text_col))
    docs = _persist(
        df.select(
            F.col(id_col).alias("_id"),
            norm.alias("_t"),
            F.size(tokenize(F.col(text_col))).alias("_ntok"),
        )
    )
    index = _persist(shingle_rows(df, text_col, id_col, n))
    doc_freq = index.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )

    inner = docs.where(F.col("_ntok") >= n + 2)
    interior = inner.select(
        F.col("_id"),
        F.array_join(
            F.slice(F.split(F.col("_t"), " "), 2, F.col("_ntok") - 2), " "
        ).alias("text"),
    )
    interior_shingles = shingle_rows(interior, "text", "_id", n)
    # anchors feeds TWO consumers (the broadcast anchor-set filter and
    # the probe join) — persist or each consumer re-runs the interior
    # tokenize/shingle pass AND the doc-freq join (measured ~2.4s per
    # recompute at sf0.1). One row per eligible inner doc — tiny.
    anchors = _persist(
        interior_shingles.join(doc_freq, "shingle")
        .groupBy("_id")
        .agg(F.min(F.struct("_df", "shingle")).alias("_a"))
        .select(F.col("_id").alias("_inner"), F.col("_a.shingle").alias("shingle"))
    )

    probe_index = index
    if broadcast_anchors:
        probe_index = index.join(
            F.broadcast(anchors.select("shingle").distinct()), "shingle"
        )
    cands = (
        anchors.join(probe_index, "shingle")
        .where(F.col("_inner") != F.col("_id"))
        .select(F.col("_inner"), F.col("_id").alias("_outer"))
        .distinct()
    )
    verified = (
        cands.join(
            docs.select(
                F.col("_id").alias("_inner"), F.col("_t").alias("_it")
            ),
            "_inner",
        )
        .join(
            docs.select(
                F.col("_id").alias("_outer"), F.col("_t").alias("_ot")
            ),
            "_outer",
        )
        .where(
            (F.instr(F.col("_ot"), F.col("_it")) > 0)
            & (
                (F.length("_it") < F.length("_ot"))
                | (
                    (F.col("_it") == F.col("_ot"))
                    & (F.col("_inner") < F.col("_outer"))
                )
            )
        )
    )
    return verified.select(
        F.col("_inner").alias("inner_id"),
        F.col("_outer").alias("outer_id"),
        F.length("_it").cast("long").alias("inner_len"),
        F.length("_ot").cast("long").alias("outer_len"),
    )
