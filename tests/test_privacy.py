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
    assert audit["partitions_rewritten"] == len(touched_days)
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
