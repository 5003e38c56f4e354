"""Corpus materialization: write training shards a dataloader can
consume.

The last step of every pipeline in this repo (clean -> dedup -> split
-> pack) is a write, and at 100 TB the write layout decides both the
job's shuffle cost and the dataloader's read pattern:

- partition by low-cardinality routing columns (``split``, ``lang``)
  so consumers prune whole directories;
- bound shard size with ``maxRecordsPerFile`` (Spark splits task
  output at the limit — no extra shuffle) so dataloader workers get
  uniform units;
- order rows *within* shards by a stable key so reruns produce
  byte-stable files (checksummable) and similar rows co-locate for
  compression;
- route rows to tasks with ``repartition(num_shards, key)`` — a hash
  shuffle that also caps concurrent output files per partition
  directory (small-files control), the thing a naive
  ``df.write.partitionBy`` gets wrong when 32k tasks each open a file
  per partition value.

Reference provenance: the reference's only sink is a Mongo upsert per
alert (alerta.py:168-209); shard writing is part of the training-data
extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    shard_key: str = "doc_id",
    num_shards: int | None = None,
    max_records_per_file: int = 100_000,
    fmt: str = "parquet",
    compression: str = "zstd",
) -> None:
    """Write ``df`` as deterministic training shards under ``path``.

    ``num_shards`` controls the shuffle fan-in (defaults to the
    session's shuffle partitions); each task writes one file chain per
    partition value it holds, split every ``max_records_per_file``
    rows. Rows are hash-routed by ``shard_key`` and sorted within
    tasks by (shard_key, full-row digest) — the digest tiebreaker
    makes the in-file order TOTAL even when shard_key is not unique
    (duplicate ids, or a coarse key like 'lang'), so the same input
    produces the same shard BYTES on every rerun; a key-only sort left
    tie order to upstream task-completion timing and silently broke
    the diffable/checksummable property this writer promises.

    The tiebreak digest hashes EACH column value to a fixed-width
    token first (NULL vs value disambiguated by distinct prefixes),
    then concatenates the tokens separator-free — a raw
    separator-joined concat was ambiguous for values containing the
    separator byte, leaving in-file order nondeterministic for exactly
    those rows. The internal sort column name is suffixed until it
    collides with no user column, so a column literally named like it
    survives the write."""
    out = df
    if num_shards is not None:
        out = out.repartition(num_shards, F.col(shard_key))
    else:
        out = out.repartition(F.col(shard_key))
    # 'v'+value vs bare 'n' for NULL: distinct prefixes mean NULL never
    # hashes equal to any real value; md5 per column yields fixed
    # 32-hex tokens whose concatenation needs no separator.
    tiebreak = F.md5(
        F.concat(
            *[
                F.md5(
                    F.coalesce(
                        F.concat(F.lit("v"), F.col(c).cast("string")),
                        F.lit("n"),
                    )
                )
                for c in df.columns
            ],
        )
    )
    tb = "__alerta_tb"
    while tb in df.columns:
        tb += "_"
    out = (
        out.withColumn(tb, tiebreak)
        .sortWithinPartitions(shard_key, tb)
        .drop(tb)
    )
    writer = (
        out.write.mode("overwrite")
        .format(fmt)
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_training_shards(
    spark, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read shards back; partition columns come back as columns and
    partition filters prune directories (guarded by
    tests/test_plans.py::test_partitioned_layout_prunes)."""
    return spark.read.format(fmt).load(path)


_EXT_FMT = {
    ".parquet": "parquet",
    ".jsonl": "json",
    ".json": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".txt": "text",
    ".orc": "orc",
}


def read_corpus(
    spark,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Read a document corpus from any of the common interchange
    formats (parquet/orc/jsonl/csv/raw text) behind one call.

    ``fmt=None`` infers from the path extension. Schema discipline at
    scale: pass ``schema`` explicitly for json/csv — without it Spark
    runs a full inference pass over the data (a second read of 100 TB).
    csv defaults to header=true; text produces a single ``text`` column
    (one doc per line) with a generated ``doc_id``.
    """
    if fmt is None:
        import os as _os

        ext = _os.path.splitext(path.rstrip("/"))[1].lower()
        fmt = _EXT_FMT.get(ext, "parquet")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "false" if schema else "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(path)
    if fmt == "text":
        df = df.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("value").alias("text"),
        )
    return df


def stream_ingest_dedup(
    spark,
    input_path: str,
    store_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    fmt: str = "json",
    available_now: bool = True,
):
    """Continuously ingest arriving corpus files, dedup each micro-batch
    against the persistent fingerprint store, and append survivors to
    ``out_path`` — the streaming face of
    :func:`alerta_spark.ops.dedupe.incremental_dedup_ingest`, so batch
    backfills and the live stream share ONE dedup implementation and
    one store.

    Delivery note: the file source + checkpoint give each input file
    to exactly one epoch; within an epoch the output append and the
    store digest append are two writes, ordered OUTPUT FIRST (inside
    incremental_dedup_ingest via ``output_path``). A crash between
    them re-delivers the batch and re-emits the same survivors —
    at-least-once OUTPUT, dedupable downstream by the digests this op
    maintains. The reverse order (digests first, output second — how
    this function originally composed the two calls) turns the same
    crash into silent permanent loss: redelivery anti-joins against
    the already-appended digests to zero survivors that were never
    written anywhere. ``available_now`` drains what exists then stops
    (batch-style run of the same streaming graph); pass False for a
    continuous micro-batch trigger.
    """
    from alerta_spark.ops.dedupe import incremental_dedup_ingest

    stream = spark.readStream.format(fmt).schema(schema).load(input_path)

    def _epoch(df, _epoch_id):
        incremental_dedup_ingest(spark, store_path, df, output_path=out_path)

    writer = stream.writeStream.foreachBatch(_epoch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
) -> DataFrame:
    """Add ``_zkey``: the Morton (Z-order) interleave of the given
    numeric columns, normalized to ``bits``-bit fixed-point via
    broadcast min/max stats — the lakehouse multi-dimensional
    clustering key (public technique; Delta/Iceberg OPTIMIZE ZORDER).

    Rows close in Z-key are close in EVERY listed dimension, so
    sorting files by ``_zkey`` gives parquet min/max footer stats that
    skip files for predicates on ANY of the columns — a single-column
    sort only skips for its leading column. Normalization stats come
    from one tiny aggregate (a driver ``first()`` of 2*len(cols)
    numbers — bounded, documented); key construction is pure codegen
    bit arithmetic, map-only."""
    n = len(cols)
    if n * bits > 63:
        # shiftleft on LongType masks the shift count to 6 bits, so
        # positions past 63 would silently WRAP onto low bits and the
        # key would stop being a Morton interleave — degrade precision
        # instead (every column still gets equal bits)
        bits = 63 // n
    stats_row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in cols],
    ).first()
    scaled = []
    for c in cols:
        # None stats (empty frame / all-NULL column): constants keep
        # the plan valid — NULL inputs produce a NULL _zkey, empty
        # frames write empty output, neither crashes float()
        mn_raw = stats_row[f"_mn_{c}"]
        mx_raw = stats_row[f"_mx_{c}"]
        mn = float(mn_raw) if mn_raw is not None else 0.0
        mx = float(mx_raw) if mx_raw is not None else 0.0
        span = (mx - mn) or 1.0
        q = F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                (F.col(c).cast("double") - F.lit(mn))
                / F.lit(span)
                * F.lit(float((1 << bits) - 1))
            ).cast("long"),
        )
        scaled.append(q)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(scaled):
            z = z.bitwiseXOR(
                F.shiftleft(
                    F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return df.withColumn("_zkey", z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Write parquet clustered by the Z-order of ``cols``:
    range-partition on ``_zkey`` (so files tile the space-filling
    curve) and sort within each file (so row groups tile it too).
    Readers then skip files/row-groups from footer min/max stats for
    predicates on any clustered column."""
    out = zorder_key(df, cols, bits)
    (
        out.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two corpus snapshots: which documents were added, removed,
    or changed between versions — the pre-flight of every incremental
    pipeline run (process only `added`+`changed`; tombstone `removed`).

    Content equality is by md5 over the concatenated content columns
    (NULL-tagged so (NULL,'x') never collides with ('x',NULL)), so the
    full outer join carries ONE digest per side instead of the row
    bodies — at 100 TB the shuffle moves ~48 bytes/row no matter how
    wide the documents are, and unchanged rows (the overwhelming
    majority between adjacent snapshots) are filtered before any
    downstream work.

    -> [id_col, change] with change in ('added', 'removed', 'changed').

    Content columns must exist in BOTH snapshots: deriving them from
    one side alone either crashed on a column the other side lacks or
    silently ignored a dropped column on both sides (documents whose
    content changed only there would read 'unchanged' and be skipped
    by the incremental pipeline). Schema evolution between snapshots
    needs an explicit ``content_cols`` naming the comparable set.
    """
    cols = content_cols or [c for c in new.columns if c != id_col]
    missing = [
        (c, side)
        for c in cols
        for side, d in (("old", old), ("new", new))
        if c not in d.columns
    ]
    if missing:
        raise ValueError(
            "snapshot_diff content columns absent from a snapshot: "
            + ", ".join(f"{c} (missing in {side})" for c, side in missing)
            + " — pass content_cols with the columns common to both"
        )

    def digest(df: DataFrame) -> DataFrame:
        tagged = [
            F.concat(
                F.when(F.col(c).isNull(), F.lit("\x00N")).otherwise(F.lit("\x01V")),
                F.coalesce(F.col(c).cast("string"), F.lit("")),
            )
            for c in cols
        ]
        return df.select(
            F.col(id_col), F.md5(F.concat_ws("\x02", *tagged)).alias("_dg")
        )

    o = digest(old).withColumnRenamed("_dg", "_dg_old")
    n = digest(new).withColumnRenamed("_dg", "_dg_new")
    j = o.join(n, id_col, "full_outer")
    return j.select(
        id_col,
        F.when(F.col("_dg_old").isNull(), F.lit("added"))
        .when(F.col("_dg_new").isNull(), F.lit("removed"))
        .when(F.col("_dg_old") != F.col("_dg_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    ).where(F.col("change") != "unchanged")
