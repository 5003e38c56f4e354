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
