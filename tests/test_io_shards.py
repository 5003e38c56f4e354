"""Shard-writer determinism and layout guarantees."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from alerta_spark.ops.io import read_training_shards, write_training_shards
from alerta_spark.ops.sampling import hash_split


def _corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return hash_split(docs, {"train": 0.8, "eval": 0.2})


def test_shards_roundtrip_and_partition_layout(spark, tmp_path):
    path = str(tmp_path / "corpus")
    df = _corpus(spark)
    write_training_shards(
        df, path, partition_by=["split"], num_shards=4,
        max_records_per_file=50,
    )
    # hive-style partition dirs exist
    assert os.path.isdir(os.path.join(path, "split=train"))
    assert os.path.isdir(os.path.join(path, "split=eval"))
    # every data file respects the shard size cap
    for f in glob.glob(f"{path}/split=*/*.parquet"):
        n = spark.read.parquet(f).count()
        assert n <= 50, f
    back = read_training_shards(spark, path)
    assert back.count() == df.count()
    assert sorted(back.columns) == sorted(df.columns)


def test_shards_rerun_is_byte_stable(spark, tmp_path):
    """Same input -> identical shard contents (file-by-file row sets),
    the property that makes corpus versions diffable."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _corpus(spark)
    for path in (a, b):
        write_training_shards(
            df, path, partition_by=["split"], num_shards=2,
            max_records_per_file=100,
        )

    def fingerprint(path):
        out = {}
        for f in sorted(glob.glob(f"{path}/split=*/*.parquet")):
            rel = os.path.relpath(f, path)
            rows = tuple(
                r.doc_id
                for r in spark.read.parquet(f).select("doc_id").collect()
            )
            out[rel.split("/")[0] + "/" + rel.split("-")[1]] = rows
        return out

    assert fingerprint(a) == fingerprint(b)


def test_shards_partition_filter_prunes(spark, tmp_path):
    path = str(tmp_path / "corpus")
    write_training_shards(
        _corpus(spark), path, partition_by=["split"], num_shards=2
    )
    plan = (
        read_training_shards(spark, path)
        .where(F.col("split") == "eval")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters" in scan and "split" in scan.split("PartitionFilters")[1][:80]


def test_zorder_skips_files_on_second_dimension(spark, tmp_path):
    """256x256 grid clustered by Z-order vs by a single-column sort:
    a predicate selective ONLY on the second dimension must intersect
    far fewer files under Z-order (the min/max footer-stats skipping
    a lakehouse reader performs). File ranges are measured directly
    (per-file min/max of each column), so the assertion tests the
    layout itself, not reader internals."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.io import write_zordered

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(grid, zpath, ["x", "y"], n_files=64, bits=8)
    (
        grid.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def files_touching(path, ylo, yhi):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("y").alias("ymin"), F.max("y").alias("ymax"))
            .collect()
        )
        return sum(1 for r in per_file if r.ymax >= ylo and r.ymin < yhi), len(per_file)

    z_hit, z_total = files_touching(zpath, 0, 16)     # y in [0, 16)
    l_hit, l_total = files_touching(lpath, 0, 16)
    # x-sorted layout: y spans every file -> no skipping possible
    assert l_hit == l_total
    # z-order: the y-stripe touches a small fraction of files
    assert z_hit < z_total / 2, (z_hit, z_total)
    # row parity: both layouts hold the full grid
    assert spark.read.parquet(zpath).count() == 256 * 256


def test_shards_byte_stable_with_duplicate_shard_keys(spark, tmp_path):
    """Non-unique shard_key: the in-file order must still be total
    (full-row digest tiebreak) — a key-only sort left tie order to
    task-completion timing and broke rerun byte-stability."""
    from alerta_spark.ops.io import write_training_shards

    df = spark.createDataFrame(
        [(i % 7, f"text {i}") for i in range(200)], "doc_id long, text string"
    ).repartition(8)

    def fingerprint(p):
        out = {}
        for f in sorted(glob.glob(os.path.join(p, "*.parquet"))):
            part = os.path.basename(f).split("-")[1]
            rows = tuple(
                (r["doc_id"], r["text"])
                for r in spark.read.parquet(f).collect()
            )
            out[part] = rows
        return out

    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(df, p1, num_shards=4)
    write_training_shards(df, p2, num_shards=4)
    assert fingerprint(p1) == fingerprint(p2)


def test_zorder_empty_and_allnull_inputs(spark, tmp_path):
    """Empty frames and all-NULL clustering columns must not crash the
    stats float() — degenerate keys, valid write."""
    from alerta_spark.ops.io import write_zordered, zorder_key

    empty = spark.createDataFrame([], "x long, y long")
    write_zordered(empty, str(tmp_path / "z0"), ["x", "y"])
    assert spark.read.parquet(str(tmp_path / "z0")).count() == 0
    nulls = spark.createDataFrame([(1, None), (2, None)], "x long, y long")
    out = zorder_key(nulls, ["x", "y"])
    assert out.count() == 2  # NULL y -> NULL key rows, no crash


def test_zorder_bits_auto_reduce_past_64(spark):
    """5 columns x 16 bits would shift past 63 (Spark masks shift
    counts mod 64, wrapping high bits onto low ones) — bits must
    auto-reduce so the key stays a true Morton interleave."""
    from alerta_spark.ops.io import zorder_key

    df = spark.createDataFrame(
        [(1, 2, 3, 4, 5), (100, 90, 80, 70, 60)],
        "a long, b long, c long, d long, e long",
    )
    rows = zorder_key(df, ["a", "b", "c", "d", "e"]).collect()
    # 5 cols * 12 bits = 60 <= 63: keys are distinct and ordered
    assert rows[0]["_zkey"] != rows[1]["_zkey"]


def test_snapshot_diff_schema_mismatch_is_loud(spark):
    import pytest

    from alerta_spark.ops.io import snapshot_diff

    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="missing in old"):
        snapshot_diff(old, new)
    # explicit common columns work
    assert snapshot_diff(old, new, content_cols=["text"]).count() == 0


def test_shards_preserve_user_tiebreak_named_column(spark, tmp_path):
    """A user column literally named like the internal sort column must
    survive the write with its values intact (the old writer silently
    overwrote then dropped it)."""
    path = str(tmp_path / "tb")
    df = spark.createDataFrame(
        [(1, "a", "keep1"), (2, "b", "keep2")],
        "doc_id long, text string, __alerta_tb string",
    )
    write_training_shards(df, path, num_shards=1)
    back = read_training_shards(spark, path)
    assert "__alerta_tb" in back.columns
    assert {r["__alerta_tb"] for r in back.collect()} == {"keep1", "keep2"}


def test_shards_tiebreak_unambiguous_for_separator_bytes(spark, tmp_path):
    """Distinct rows whose values embed control bytes must land in a
    deterministic relative order: per-column hashing removes the
    separator ambiguity ('a\\x02' + 'b' vs 'a' + '\\x02b' concatenated
    identically under the old separator join)."""
    path_a, path_b = str(tmp_path / "a"), str(tmp_path / "b")
    rows = [(1, "a\x02", "b"), (1, "a", "\x02b"), (1, "c", "d")]
    # two logically-identical inputs built in different input orders
    df_a = spark.createDataFrame(rows, "doc_id long, x string, y string")
    df_b = spark.createDataFrame(
        rows[::-1], "doc_id long, x string, y string"
    )
    for df, path in ((df_a, path_a), (df_b, path_b)):
        write_training_shards(df, path, num_shards=1)

    def ordered(path):
        import glob as _g

        (f,) = _g.glob(f"{path}/*.parquet")
        return [(r["x"], r["y"]) for r in spark.read.parquet(f).collect()]

    assert ordered(path_a) == ordered(path_b)
