"""Document chunking and sequence packing for training pipelines,
over the ``documents`` table (doc_id, text, lang, source, n_chars).

Two standard LLM-pretraining data transforms, both expressed as pure
Spark column operations (whole-stage codegen, no Python UDF):

- **chunk_documents** — sliding fixed-size token windows with overlap
  (long-document splitting for context-limited training, embedding
  indexing, retrieval corpora). Tokenize once per document, explode a
  chunk-index ``sequence``, ``slice`` the carried token array. One
  Generate, zero shuffles: scales linearly with input splits.

- **pack_sequences** — concat-and-split packing: documents are laid
  out as a contiguous token stream and cut at fixed ``budget``
  boundaries (exactly how pretraining batches are packed). Bin ids
  fall out of a running token sum, so the whole op is one window over
  ``(partition_col, shard)`` streams. ``shards`` splits each
  partition's stream into md5-derived sub-streams: packing does not
  need global contiguity, so sharding bounds the sequential-scan
  length per task — the knob that keeps one giant source from
  serializing at 100 TB.

Reference provenance: the reference has no chunking tier (it caps
result sets at 1000 rows, alerta.py:168-209); these extend the
training-data surface alongside ops/sampling and ops/text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def ws_tokens(col: Column | str) -> Column:
    """Case-preserving whitespace tokens (array<string>), empty
    strings from leading/trailing whitespace dropped. Matches DuckDB's
    ``list_filter(string_split_regex(text, '\\s+'), t -> t <> '')``
    exactly — the oracle relies on this."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into token windows of ``chunk_size`` with
    ``overlap`` tokens shared between consecutive windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)``
    (0-based, stride = chunk_size - overlap); the last chunk may be
    short. Documents with zero tokens produce zero chunks. Output:
    (id_col, chunk_id, chunk_tokens, chunk_text).

    Plan shape: Project(tokenize once) -> Generate(sequence of chunk
    ids) -> Project(slice). The token array is computed below the
    Generate and carried through it, so tokenization runs once per
    document, not once per chunk (the shingle lesson: lambda bodies
    re-evaluate outer expression trees)."""
    if overlap < 0 or overlap >= chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}"
        )
    stride = chunk_size - overlap
    n = F.size(F.col("_toks"))
    n_chunks = (
        F.when(n <= chunk_size, F.lit(1))
        .otherwise(F.ceil((n - chunk_size) / F.lit(float(stride))) + 1)
        .cast("int")
    )
    sized = (
        df.select(id_col, ws_tokens(text_col).alias("_toks"))
        .where(F.size("_toks") >= 1)
        .withColumn("_n_chunks", n_chunks)
    )
    exploded = sized.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_n_chunks") - 1)).alias("_cid"),
    )
    chunk = F.slice("_toks", F.col("_cid") * stride + 1, chunk_size)
    return exploded.select(
        id_col,
        F.col("_cid").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def _md5_shard(key: Column, shards: int) -> Column:
    """16-bit md5 prefix mod ``shards`` — deterministic, uniform, and
    bit-identical in DuckDB (``CAST('0x'||substring(md5(k),1,4) AS
    INTEGER) % shards``), unlike Spark's ``hash()``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")
        % shards
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    partition_col: str = "source",
    shards: int = 1,
    token_col: str | None = None,
) -> DataFrame:
    """Concat-and-split sequence packing: within each ``(partition_col,
    shard)`` stream ordered by ``id_col``, documents occupy consecutive
    token offsets; training sequences are the ``budget``-sized cuts of
    that stream.

    Output per document: (id_col, partition_col, shard, n_tokens,
    first_seq, offset_in_seq, seqs_spanned) — first_seq is the sequence
    index where the document starts, offset_in_seq its token offset
    inside it, seqs_spanned how many sequences it straddles. All
    integer arithmetic (``div``/``%``), so the result is exact at any
    cumulative-sum magnitude (no double rounding past 2^53).

    One shuffle (hash on (partition, shard)) + one in-partition sort.
    The running sum is inherently sequential per stream; ``shards``
    bounds stream length so a skewed source still parallelizes.

    ``token_col``: use a precomputed token count instead of
    tokenizing ``text_col``."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    n_tokens = (
        F.col(token_col).cast("long")
        if token_col
        else F.size(ws_tokens(text_col)).cast("long")
    )
    shard = (
        _md5_shard(F.col(id_col), shards) if shards > 1 else F.lit(0)
    ).cast("long")
    base = df.select(
        id_col,
        F.col(partition_col).alias("_part"),
        shard.alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        W.partitionBy("_part", "shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = base.withColumn(
        "_cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    first_seq = F.expr(f"_cum_before div {budget}")
    return cum.select(
        id_col,
        F.col("_part").alias(partition_col),
        "shard",
        "n_tokens",
        first_seq.alias("first_seq"),
        (F.col("_cum_before") % budget).alias("offset_in_seq"),
        (
            F.expr(f"(_cum_before + greatest(n_tokens - 1, 0L)) div {budget}")
            - first_seq
            + 1
        ).alias("seqs_spanned"),
    )


def length_buckets(
    df: DataFrame,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batching report: assign every document to a
    token-length quantile bucket and measure the padding waste of
    batching each bucket to its max length — the standard
    sequence-bucketing transform that keeps pad-token waste low when
    forming fixed-shape training batches.

    Scale shape: bucket EDGES come from one exact-percentile aggregate
    (a few doubles), broadcast back over a map-only comparison — NOT a
    global ntile window (which would single-partition the corpus).
    Waste = 1 - sum(len)/(n_docs * max_len) per bucket: exact integer
    sums, one IEEE division.

    -> [bucket, n_docs, min_len, max_len, sum_tokens, pad_waste]"""
    from alerta_spark.ops.text import tokenize

    lens = df.select(
        F.col(id_col).alias("_id"), F.size(tokenize(text_col)).alias("_len")
    )
    pcts = [i / n_buckets for i in range(1, n_buckets)]
    edges = lens.agg(
        F.percentile("_len", F.array(*[F.lit(p) for p in pcts])).alias("_edges")
    )
    with_edges = lens.crossJoin(F.broadcast(edges))
    bucket = F.lit(1)
    for i in range(len(pcts)):
        bucket = bucket + F.when(
            F.col("_len").cast("double") > F.element_at("_edges", i + 1), 1
        ).otherwise(0)
    return (
        with_edges.select("_id", "_len", bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_len").cast("long").alias("min_len"),
            F.max("_len").cast("long").alias("max_len"),
            F.sum("_len").cast("long").alias("sum_tokens"),
        )
        .withColumn(
            "pad_waste",
            F.lit(1.0)
            - F.col("sum_tokens").cast("double")
            / (F.col("n_docs") * F.col("max_len")).cast("double"),
        )
        .orderBy("bucket")
    )


def pack_sequences_ffd(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    partition_col: str = "source",
    shards: int = 1,
    token_col: str | None = None,
) -> DataFrame:
    """First-fit-decreasing sequence packing: whole documents into
    ``budget``-token bins — the no-split companion to
    :func:`pack_sequences` for pipelines that forbid cross-document
    attention (no document straddles two training sequences; padding
    waste is the price, FFD keeps it near-optimal: <= 11/9 OPT + 1
    bins, the classic Johnson bound).

    Per (partition, shard) stream: sort by (n_tokens DESC, id ASC) and
    first-fit each doc into the earliest bin with room. Docs longer
    than ``budget`` get a dedicated bin flagged ``oversize`` (the
    training pipeline truncates those). Deterministic: same input ->
    same bins, any executor, any retry.

    This is an inherently sequential per-stream fold, so it is the
    documented applyInPandas case (same rationale as apply_bpe): ONE
    shuffle on (partition, shard), a Python loop bounded by the shard's
    doc count — ``shards`` caps stream length exactly as in
    pack_sequences, so a skewed source still parallelizes.

    -> [id_col, partition_col, shard, n_tokens, seq_idx, oversize]
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    n_tokens = (
        F.col(token_col).cast("long")
        if token_col
        else F.size(ws_tokens(text_col)).cast("long")
    )
    shard = (
        _md5_shard(F.col(id_col), shards) if shards > 1 else F.lit(0)
    ).cast("long")
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(partition_col).cast("string").alias("_part"),
        shard.alias("shard"),
        n_tokens.alias("n_tokens"),
    )

    def pack(pdf):
        pdf = pdf.sort_values(
            ["n_tokens", "_id"], ascending=[False, True]
        )
        remaining: list[int] = []
        seq_idx: list[int] = []
        oversize: list[bool] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget:
                seq_idx.append(len(remaining))
                remaining.append(0)
                oversize.append(True)
                continue
            oversize.append(False)
            for b, cap in enumerate(remaining):
                if cap >= n:
                    remaining[b] = cap - n
                    seq_idx.append(b)
                    break
            else:
                seq_idx.append(len(remaining))
                remaining.append(budget - n)
        out = pdf.copy()
        out["seq_idx"] = seq_idx
        out["oversize"] = oversize
        return out

    packed = base.groupBy("_part", "shard").applyInPandas(
        pack,
        schema="_id long, _part string, shard long, n_tokens long, "
        "seq_idx long, oversize boolean",
    )
    return packed.select(
        F.col("_id").alias(id_col),
        F.col("_part").alias(partition_col),
        "shard",
        "n_tokens",
        "seq_idx",
        "oversize",
    )
