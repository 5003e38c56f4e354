"""Sketch-backed distinct-count rollups (Apache DataSketches HLL).

`ops/rollup.py` maintains count/sum/min/max partials incrementally
because those are commutative+associative. COUNT DISTINCT is not —
unless the stored partial is a sketch: Spark's built-in DataSketches
HLL surface (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`, Spark >= 3.5) makes distinct-count partials
mergeable with bounded error and CONSTANT memory per (bucket, dim)
row. That is the 100 TB story: a year of per-hour per-type distinct
users is a few KB per row of sketch state, maintained O(delta) per
micro-batch, never re-scanning history; exact re-aggregation would
shuffle every historical user id on every refresh.

Merge determinism: HLL register merge is a pointwise max — commutative
and associative — so any delta split/ordering produces the SAME
registers, and the incremental estimate equals the monolithic one
bit-for-bit (pinned in tests). The estimate itself is engine-specific
(the catalog entry is rows-only); the exact-count companion query is
the oracle-checked twin.

Reference: the reference re-counts distincts per cron scan
(alerta.py:136-146 re-runs the full window query); there is no
incremental surface to cite — this is a pure scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket_start"
DIM_COL = "event_type"


def distinct_partials(
    events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """HLL sketch of distinct ``key_col`` per (time bucket, dim) — the
    stored partial. One partial+final aggregate; the sketch binary is
    ~2^lg_k bytes regardless of cardinality."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), bucket).getField("start").alias(BUCKET_COL),
            F.col(DIM_COL),
        )
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("hll"))
    )


def combine_distinct_partials(*parts: DataFrame) -> DataFrame:
    """Merge sketch frames: union + one hll_union_agg — identical
    algebra shape to rollup.combine_partials, now for distincts."""
    it = iter(parts)
    u = next(it)
    for p in it:
        u = u.unionByName(p)
    return u.groupBy(BUCKET_COL, DIM_COL).agg(
        F.hll_union_agg(F.col("hll")).alias("hll")
    )


def finalize_distinct(partials: DataFrame) -> DataFrame:
    """Read-time estimate projection."""
    return partials.select(
        BUCKET_COL,
        DIM_COL,
        F.hll_sketch_estimate(F.col("hll")).alias("n_distinct"),
    )


def maintain_distinct_rollup(
    spark: SparkSession,
    path: str,
    delta_events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> None:
    """Fold a delta's sketches into the stored rollup, rewriting ONLY
    the buckets the delta touches (dynamic partition overwrite) —
    O(delta + affected buckets), independent of history size."""
    import os

    delta = distinct_partials(delta_events, bucket, ts_col, key_col)
    exists = os.path.isdir(path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(path)
    )
    if exists:
        existing = spark.read.parquet(path)
        touched = delta.select(BUCKET_COL).distinct()
        affected = existing.join(F.broadcast(touched), BUCKET_COL, "left_semi")
        merged = combine_distinct_partials(affected, delta)
    else:
        merged = delta

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
    finally:
        spark.conf.set(mode_key, prev)


def read_distinct_rollup(spark: SparkSession, path: str) -> DataFrame:
    return finalize_distinct(spark.read.parquet(path))


# ---------------------------------------------------------------------------
# Count-min sketch (CMS): fixed-size frequency summaries


def cms_build(
    items: DataFrame,
    item_col: str = "term",
    depth: int = 3,
    prefix_len: int = 3,
    salt: str = "cms",
) -> DataFrame:
    """Build a count-min sketch over an item stream ->
    [depth, bucket, cnt].

    Classic CMS: ``depth`` independent hash rows x ``16^prefix_len``
    buckets; an item's count is added to one bucket per row. Hashing
    is the first ``prefix_len`` hex chars of md5(item || salt || row)
    — a pure row function, identical in every engine and on every
    retry (the same discipline as ops/sampling's md5 bands).

    Scale shape: one Expand (depth rows per item instance) -> partial
    count -> ONE shuffle on (depth, bucket). The sketch is
    depth * 16^prefix_len rows TOTAL regardless of input size — the
    constant-memory frequency summary you keep per corpus shard and
    merge by adding cnt (commutative/associative, so incremental
    maintenance is exact; see test_sketches). Estimates only ever
    OVERcount (collisions add), never undercount.
    """
    rows = F.explode(
        F.array(*[F.lit(d) for d in range(depth)])
    ).alias("depth")
    it = items.select(F.col(item_col).cast("string").alias("_i")).select(
        "_i", rows
    )
    bucket = F.substring(
        F.md5(
            F.concat(F.col("_i"), F.lit(salt), F.col("depth").cast("string"))
        ),
        1,
        prefix_len,
    )
    return (
        it.select("depth", bucket.alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    candidates: DataFrame,
    item_col: str = "term",
    depth: int = 3,
    prefix_len: int = 3,
    salt: str = "cms",
) -> DataFrame:
    """Probe a count-min sketch: per candidate item, min over the
    sketch's depth rows of the hashed bucket's count -> adds
    ``cms_tf`` to the candidates frame.

    The sketch is tiny (depth * 16^prefix_len rows) so the probe is a
    broadcast join — candidates never shuffle. Items that hash to an
    absent bucket (never seen, row dropped) estimate 0 via coalesce.
    """
    probes = candidates.select(
        "*",
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("_d"),
    ).withColumn(
        "_b",
        F.substring(
            F.md5(
                F.concat(
                    F.col(item_col).cast("string"),
                    F.lit(salt),
                    F.col("_d").cast("string"),
                )
            ),
            1,
            prefix_len,
        ),
    )
    joined = probes.join(
        F.broadcast(cms),
        (probes["_d"] == cms["depth"]) & (probes["_b"] == cms["bucket"]),
        "left",
    )
    keys = [c for c in candidates.columns]
    return (
        joined.groupBy(*keys)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_tf")
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter: fixed-size SET MEMBERSHIP summaries (the companion to
# CMS's frequency estimates). Use case at 100 TB: the fast-path probe
# in front of the incremental-dedup digest store — a few KB of bits
# answer "definitely new" for most documents, and only the
# maybe-seen minority pays the exact anti-join against the store.


def _bloom_positions(item: F.Column, k: int, prefix_len: int, salt: str):
    """k md5-derived bit positions in [0, 16^prefix_len) — the same
    engine-portable hex-prefix hashing as cms_build, so DuckDB can
    reproduce every bit."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(item, F.lit(salt), F.lit(str(i)))),
                1,
                prefix_len,
            ),
            16,
            10,
        ).cast("long")
        for i in range(k)
    ]


def bloom_build(
    items: DataFrame,
    item_col: str,
    k: int = 4,
    prefix_len: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter -> [word, bits]: m = 16^prefix_len bits
    packed 60 per BIGINT word, k set bits per item.

    One Expand (k rows per item) -> partial bit_or -> ONE shuffle on
    word; the filter is ceil(m/60) rows TOTAL regardless of input
    size. Merge = bit_or by word (commutative/associative), so shard
    filters union losslessly — same incremental algebra as cms_build.
    No false negatives by construction; false-positive rate ~
    (1 - e^(-k*n/m))^k.
    """
    pos = F.explode(
        F.array(*_bloom_positions(F.col(item_col).cast("string"), k, prefix_len, salt))
    ).alias("_pos")
    ex = items.select(pos)
    return (
        ex.select(
            F.floor(F.col("_pos") / 60).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 60 AS INT))").alias("_m"),
        )
        .groupBy("word")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    candidates: DataFrame,
    item_col: str,
    k: int = 4,
    prefix_len: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Probe a Bloom filter: adds boolean ``maybe_member`` to the
    candidates frame (true iff ALL k bits are set — never a false
    negative).

    The filter is tiny, so the probe is a broadcast join on word —
    candidates fan out k rows each and never shuffle beyond the final
    per-key all-bits conjunction."""
    probes = candidates.select(
        "*",
        F.posexplode(
            F.array(
                *_bloom_positions(F.col(item_col).cast("string"), k, prefix_len, salt)
            )
        ).alias("_i", "_pos"),
    ).select(
        "*",
        F.floor(F.col("_pos") / 60).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 60 AS INT))").alias("_m"),
    )
    joined = probes.join(F.broadcast(bloom), "word", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseAND(F.col("_m"))
        != 0
    )
    keys = list(candidates.columns)
    return joined.select(*keys, hit.alias("_h")).groupBy(*keys).agg(
        F.min("_h").alias("maybe_member")
    )


# ---------------------------------------------------------------------------
# Portable HLL: an HyperLogLog whose REGISTERS are engine-reproducible
# (md5 hex-prefix bucketing + leading-zero rank, like cms_build/bloom),
# so unlike the DataSketches surface above the whole sketch — every
# register, the exact harmonic sum, and the estimate — hash-checks
# against a SQL oracle. The estimate's harmonic sum Σ 2^-M[j] is
# accumulated as the EXACT integer Σ 2^(53-M[j]) (M <= 53, so every
# term is an exact BIGINT and the sum is order-free), crossing to
# float exactly once; the small-range linear-counting branch looks its
# ln(m/V) up from a shared literal table (V has only m possible
# values) so no engine evaluates a transcendental.


HLL_M = 256  # 2-hex-char buckets; registers rank a 52-bit suffix
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_rho(sub: F.Column) -> F.Column:
    """1-based position of the first 1-bit in the 52-bit value spelled
    by 13 hex chars: 4 * (leading zero nibbles) + (zero bits in the
    first nonzero nibble) + 1; 53 when all zero."""
    z = F.length(F.regexp_extract(sub, "^0*", 0))
    nib = sub.substr(z + F.lit(1), F.lit(1))
    nib_lz = (
        F.when(nib == "1", 3)
        .when(nib.isin("2", "3"), 2)
        .when(nib.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(z == 13, F.lit(53)).otherwise(4 * z + nib_lz + 1).cast("long")


def hll_build(
    items: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    salt: str = "hll",
) -> DataFrame:
    """Registers [*group_cols, bucket (2 hex chars), mreg]: at most
    HLL_M rows per group regardless of input size. ONE partial+final
    max aggregate; merge of shard sketches = max by bucket
    (commutative/associative — any split of the input produces
    identical registers)."""
    groups = group_cols or []
    h = F.md5(F.concat(F.col(item_col).cast("string"), F.lit(salt)))
    return (
        items.select(
            *groups,
            F.substring(h, 1, 2).alias("bucket"),
            _hll_rho(F.substring(h, 3, 13)).alias("_rho"),
        )
        .groupBy(*groups, "bucket")
        .agg(F.max("_rho").alias("mreg"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Lossless shard union: pointwise register max."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "mreg"]
    return out.groupBy(*keys).agg(F.max("mreg").alias("mreg"))


def hll_estimate(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Estimate rows [*group_cols, n_buckets, v_zero, s_exact,
    n_distinct_est]: the standard HLL estimator with bit-reproducible
    arithmetic — s_exact = Σ 2^(53-M[j]) (+ 2^53 per empty register)
    is an exact BIGINT, the raw estimate is one literal/SUM division,
    and the V>0 small-range branch indexes a literal m*ln(m/V) table."""
    import math

    groups = group_cols or []
    agg = registers.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("_present"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mreg AS INT))")
        ).cast("long").alias("_s_present"),
    )
    m = HLL_M
    v = (F.lit(m).cast("long") - F.col("_present")).alias("v_zero")
    s_exact = (
        F.col("_s_present")
        + (F.lit(m) - F.col("_present")) * F.lit(1 << 53).cast("long")
    ).alias("s_exact")
    lin = F.array(*[F.lit(m * math.log(m / vv)) for vv in range(1, m + 1)])
    base = agg.select(*groups, v, s_exact)
    raw = F.lit(HLL_ALPHA * m * m * float(1 << 53)) / F.col("s_exact").cast(
        "double"
    )
    est = F.when(
        (F.col("v_zero") > 0) & (raw <= F.lit(2.5 * m)),
        F.element_at(lin, F.col("v_zero").cast("int")),
    ).otherwise(raw)
    return base.select(
        *groups,
        F.lit(m).cast("long").alias("n_buckets"),
        "v_zero",
        "s_exact",
        est.alias("n_distinct_est"),
    )


def duckdb_hll_sql(
    item_expr: str,
    from_clause: str,
    group_cols: list[str] | None = None,
    salt: str = "hll",
) -> str:
    """The oracle twin of hll_build+hll_estimate, generated from the
    SAME constants so both engines share every literal."""
    import math

    groups = group_cols or []
    gsel = (", ".join(groups) + "," ) if groups else ""
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    m = HLL_M
    # quoted + ::DOUBLE[]: a bare 17-digit literal parses as DECIMAL
    # and DuckDB's DECIMAL->DOUBLE cast double-rounds (1 ulp off the
    # correctly-rounded strtod Spark's lit() uses); VARCHAR->DOUBLE
    # parses exactly.
    lin = ", ".join("'" + repr(m * math.log(m / vv)) + "'" for vv in range(1, m + 1))
    return f"""
    WITH h AS (
      SELECT {gsel} md5(CAST({item_expr} AS VARCHAR) || '{salt}') AS hh
      {from_clause}
    ),
    r AS (
      SELECT {gsel} substr(hh, 1, 2) AS bucket,
             CAST(CASE WHEN length(regexp_extract(substr(hh, 3, 13), '^0*')) = 13
                  THEN 53
                  ELSE 4 * length(regexp_extract(substr(hh, 3, 13), '^0*'))
                       + (CASE substr(substr(hh, 3, 13),
                               length(regexp_extract(substr(hh, 3, 13), '^0*')) + 1, 1)
                          WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                          WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                          WHEN '7' THEN 1 ELSE 0 END) + 1 END AS BIGINT) AS rho
      FROM h
    ),
    reg AS (
      SELECT {gsel} bucket, max(rho) AS mreg FROM r GROUP BY {gsel} bucket
    ),
    agg AS (
      SELECT {gsel} CAST(count(*) AS BIGINT) AS present,
             CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mreg AS INT)) AS BIGINT)
               AS s_present
      FROM reg {gby}
    )
    SELECT {gsel} CAST({m} AS BIGINT) AS n_buckets,
           CAST({m} - present AS BIGINT) AS v_zero,
           CAST(s_present + ({m} - present) * (CAST(1 AS BIGINT) << 53)
                AS BIGINT) AS s_exact,
           CASE WHEN ({m} - present) > 0
                 AND {HLL_ALPHA * m * m * float(1 << 53)!r}
                     / CAST(s_present + ({m} - present)
                            * (CAST(1 AS BIGINT) << 53) AS DOUBLE)
                     <= {2.5 * m!r}
                THEN ([{lin}]::DOUBLE[])[{m} - present]
                ELSE {HLL_ALPHA * m * m * float(1 << 53)!r}
                     / CAST(s_present + ({m} - present)
                            * (CAST(1 AS BIGINT) << 53) AS DOUBLE)
           END AS n_distinct_est
    FROM agg
    """


# ---------------------------------------------------------------------------
# Histogram quantile sketch: the QUANTILE member of the mergeable
# family (CMS = frequency, Bloom = membership, HLL = distinct). A
# fixed-width histogram over quantized values is a constant-size,
# bit_or/sum-mergeable summary whose quantile estimates carry a HARD
# error bound (one bucket width) — and unlike t-digest/KLL, every
# count and every estimate is exact integer arithmetic, so the whole
# sketch hash-checks.


def histogram_build(
    items: DataFrame,
    value_q_col: str,
    shift: int = 7,
) -> DataFrame:
    """-> [bucket, cnt]: bucket = value_q >> shift (non-negative
    BIGINT values; bucket width 2^shift quantization units). ONE
    partial+final count aggregate; merge of shard histograms = sum by
    bucket (commutative/associative)."""
    return (
        items.select(
            F.shiftright(F.col(value_q_col), shift).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    probes_pct: list[int],
    shift: int = 7,
) -> DataFrame:
    """Quantile estimates from the histogram: for each probe q% the
    estimate is the UPPER EDGE of the first bucket whose cumulative
    count reaches ceil(q/100 * n) — within 2^shift units of the true
    q-quantile by construction. All integer: the rank threshold is
    ceil of an exact product, the cumulative count a window sum.

    -> [q_pct, rank_k, est_q] (est_q in quantization units)."""
    from pyspark.sql import Window as W

    total = hist.agg(F.sum("cnt").cast("long").alias("_n"))
    # one probe row per q% by an in-row explode of the 1-row total —
    # the former per-probe union re-ran the histogram aggregate once
    # per probe (ceil(p*n/100) stays exact integer arithmetic)
    probes = total.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).cast("long").alias("q_pct"),
                        F.expr(f"(({p} * _n) + 99) div 100")
                        .cast("long")
                        .alias("rank_k"),
                    )
                    for p in probes_pct
                ]
            )
        ).alias("_p")
    ).select("_p.*")
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            # single-partition on purpose: the frame is histogram-sized
            # (bounded by the value domain, not the data). The partition
            # key must be column-DERIVED — a bare lit() is constant-
            # folded out of the window spec and WindowExec then warns
            # as if no partitioning were intended.
            W.partitionBy(F.pmod(F.col("bucket"), F.lit(1)))
            .orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    # tiny frames: the global-window cum runs over the bucket-count
    # rows (bounded by the histogram domain, not the data), and the
    # probe join is a broadcast; deliberate single-partition window.
    joined = cum.join(
        F.broadcast(probes), F.col("cum") >= F.col("rank_k")
    ).groupBy("q_pct", "rank_k").agg(F.min("bucket").alias("_b"))
    return joined.select(
        "q_pct",
        "rank_k",
        F.expr(f"((_b + 1) << {shift}) - 1").cast("long").alias("est_q"),
    )


def maintain_hll_portable_rollup(
    spark: SparkSession,
    path: str,
    delta_events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    dim_col: str = "event_type",
) -> None:
    """Incremental per-(day, dim) distinct rollup over PORTABLE HLL
    registers: fold a delta's registers into the store with pointwise
    max, rewriting only the days the delta touches (dynamic partition
    overwrite) — O(delta + affected days), independent of history.

    Because max is IDEMPOTENT (not just commutative/associative like
    the count stores' sums), replaying a delta is harmless by algebra
    — no dedup ledger needed for at-least-once ingestion. Estimates
    come from hll_estimate over the stored registers and are exactly
    the one-shot estimates (pinned in tests)."""
    import os

    day = F.col(ts_col).cast("date").alias("day")
    delta = hll_build(
        delta_events.select(day, F.col(dim_col), F.col(key_col)),
        key_col,
        ["day", dim_col],
    )
    exists = os.path.isdir(path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(path)
    )
    if exists:
        existing = spark.read.parquet(path)
        touched = delta.select("day").distinct()
        affected = existing.join(F.broadcast(touched), "day", "left_semi")
        merged = hll_merge(affected, delta)
    else:
        merged = delta

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set(mode_key, prev)


def read_hll_portable_rollup(
    spark: SparkSession, path: str, dim_col: str = "event_type"
) -> DataFrame:
    return hll_estimate(spark.read.parquet(path), ["day", dim_col])


def stream_hll_distinct_monitor(
    spark: SparkSession,
    input_path: str,
    store_path: str,
    checkpoint: str,
    schema,
    ts_col: str = "ts",
    key_col: str = "user_id",
    dim_col: str = "event_type",
    fmt: str = "json",
    available_now: bool = True,
):
    """Streaming face of the portable-HLL distinct rollup: each
    arriving event-file batch folds its registers into the store via
    maintain_hll_portable_rollup — ONE implementation shared by
    backfills and the live stream (the drift-monitor pattern). Since
    register max is idempotent, a replayed micro-batch after a
    checkpoint rollback cannot corrupt the store — stronger than the
    count stores' exactly-once requirement."""
    stream = spark.readStream.format(fmt).schema(schema).load(input_path)

    def _epoch(df, epoch_id):
        maintain_hll_portable_rollup(
            spark, store_path, df, ts_col=ts_col,
            key_col=key_col, dim_col=dim_col,
        )

    writer = stream.writeStream.foreachBatch(_epoch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_histogram_rollup(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    value_q_col: str,
    shift: int = 7,
) -> None:
    """Append a delta's histogram partials to the store. Counts are
    additive (commutative/associative), so the store is APPEND-ONLY —
    no read-modify-write, any ingestion order converges to the same
    totals (the X63 drift-store algebra, here for value
    distributions). Read with read_histogram_rollup; compact offline
    by rewriting the aggregate."""
    histogram_build(delta, value_q_col, shift).write.mode("append").parquet(
        path
    )


def read_histogram_rollup(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.parquet(path)
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def stream_histogram_monitor(
    spark: SparkSession,
    input_path: str,
    store_path: str,
    checkpoint: str,
    schema,
    value_expr: str = "CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)",
    shift: int = 7,
    fmt: str = "json",
    available_now: bool = True,
):
    """Streaming face: each arriving batch appends its histogram
    partials; quantile estimates over the store stay within one
    bucket width of truth at any point in the stream."""
    stream = spark.readStream.format(fmt).schema(schema).load(input_path)

    def _epoch(df, epoch_id):
        maintain_histogram_rollup(
            spark,
            store_path,
            df.selectExpr(f"{value_expr} AS vq"),
            "vq",
            shift,
        )

    writer = stream.writeStream.foreachBatch(_epoch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_histogram_rollup(spark: SparkSession, path: str) -> int:
    """Rewrite the append-only histogram store as one aggregated
    (bucket, cnt) snapshot — offline, when partial files accumulate.
    Returns bucket count after compaction. Totals are preserved
    exactly (sum is the merge operator)."""
    agg = read_histogram_rollup(spark, path).localCheckpoint(eager=True)
    agg.write.mode("overwrite").parquet(path)
    return agg.count()
