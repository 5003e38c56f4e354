"""Right-to-be-forgotten: subject rows gone, everything else intact,
untouched partition files never rewritten."""

import glob
import os

from pyspark.sql import functions as F


def test_forget_users_rewrites_only_touched_partitions(spark, tmp_path, events):
    from alerta_spark.ops.privacy import forget_users

    lake = str(tmp_path / "lake")
    ev = events.withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(lake)

    # pick two subjects active on only SOME days
    subjects = [
        r["user_id"]
        for r in ev.groupBy("user_id").count().orderBy("user_id").limit(2).collect()
    ]
    touched_days = {
        r["day"]
        for r in ev.where(F.col("user_id").isin(subjects))
        .select("day").distinct().collect()
    }
    all_days = {r["day"] for r in ev.select("day").distinct().collect()}
    untouched = sorted(all_days - touched_days)

    before_files = {
        d: sorted(
            (os.path.basename(f), os.path.getmtime(f))
            for f in glob.glob(f"{lake}/day={d}/*.parquet")
        )
        for d in all_days
    }
    want_kept = ev.where(~F.col("user_id").isin(subjects))
    want_rows = {
        tuple(r) for r in want_kept.select("event_id", "user_id").collect()
    }
    n_drop = ev.where(F.col("user_id").isin(subjects)).count()

    audit = forget_users(spark, lake, subjects)
    assert (
        audit["partitions_rewritten"] + audit["partitions_deleted"]
        == len(touched_days)
    )
    assert audit["rows_dropped"] == n_drop

    after = spark.read.parquet(lake)
    assert after.where(F.col("user_id").isin(subjects)).count() == 0
    got_rows = {
        tuple(r) for r in after.select("event_id", "user_id").collect()
    }
    assert got_rows == want_rows

    # untouched partitions: same files, same mtimes (never rewritten)
    if untouched:
        for d in untouched:
            now_files = sorted(
                (os.path.basename(f), os.path.getmtime(f))
                for f in glob.glob(f"{lake}/day={d}/*.parquet")
            )
            assert now_files == before_files[d]

    # idempotent: forgetting again touches nothing
    audit2 = forget_users(spark, lake, subjects)
    assert audit2["partitions_rewritten"] == 0 and audit2["rows_dropped"] == 0


def test_forget_users_deletes_all_subject_partition(spark, tmp_path):
    """A partition where EVERY row belongs to subjects has no surviving
    rows, so dynamic overwrite alone would leave its old files on disk —
    the engine must delete the partition directory and the audit must
    reflect on-disk reality."""
    from alerta_spark.ops.privacy import forget_users

    lake = str(tmp_path / "lake2")
    rows = [
        (1, 7, "d1"), (2, 7, "d1"),          # d1: only subject 7
        (3, 7, "d2"), (4, 8, "d2"),          # d2: mixed
        (5, 9, "d3"),                         # d3: untouched
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, day string"
    ).write.mode("overwrite").partitionBy("day").parquet(lake)

    audit = forget_users(spark, lake, [7])
    assert audit["rows_dropped"] == 3
    assert audit["partitions_deleted"] == 1
    assert audit["partitions_rewritten"] == 1
    assert not os.path.isdir(f"{lake}/day=d1")  # gone from disk

    after = spark.read.parquet(lake)
    assert after.where(F.col("user_id") == 7).count() == 0
    got = {tuple(r) for r in after.select("event_id", "user_id").collect()}
    assert got == {(4, 8), (5, 9)}

    # degenerate: forgetting the ONLY remaining user of every partition
    audit2 = forget_users(spark, lake, [8, 9])
    assert audit2["partitions_deleted"] == 2 and audit2["partitions_rewritten"] == 0
    assert not os.path.isdir(f"{lake}/day=d2") and not os.path.isdir(f"{lake}/day=d3")


def test_forget_users_preserves_null_user_rows(spark, tmp_path):
    """~isin() is NULL (not true) for a NULL user id: anonymous rows
    in touched partitions used to be silently DELETED and counted as
    subject rows in the audit."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.privacy import forget_users

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "d1", "a"), (None, "d1", "b"), (2, "d2", "c"), (None, "d2", "d")],
        "user_id long, day string, payload string",
    )
    df.write.partitionBy("day").parquet(lake)
    audit = forget_users(spark, lake, [1], partition_col="day")
    out = spark.read.parquet(lake)
    assert audit["rows_dropped"] == 1
    # the anonymous rows survive — in the rewritten partition too
    kept = {(r["user_id"], r["payload"]) for r in out.collect()}
    assert kept == {(None, "b"), (2, "c"), (None, "d")}


def test_forget_users_null_partition_actually_deleted(spark, tmp_path):
    """Subject rows in the NULL partition (__HIVE_DEFAULT_PARTITION__)
    used to survive while the audit attested a deletion: isin([None])
    matches nothing and 'day=None' is not the dir Spark wrote."""
    from alerta_spark.ops.privacy import forget_users

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, None, "x"), (2, "d1", "y")],
        "user_id long, day string, payload string",
    )
    df.write.partitionBy("day").parquet(lake)
    audit = forget_users(spark, lake, [1], partition_col="day")
    out = spark.read.parquet(lake)
    assert [r["user_id"] for r in out.collect()] == [2]
    assert audit["partitions_deleted"] == 1 and audit["rows_dropped"] == 1
