"""Right-to-be-forgotten over a partitioned parquet lake.

GDPR/CCPA deletion on an immutable lake is a REWRITE, and at 100 TB
the only acceptable shape is: find the partitions that actually hold
the subject's rows, rewrite ONLY those with an anti-join, leave every
other file untouched (byte-identical, no recompute, no re-upload).
Deleting a handful of users must cost O(their partitions), not a lake
scan-and-rewrite.

Plan: one scan with partition pruning to find touched partition
values (subject ids broadcast), then a dynamic-partition-overwrite of
the anti-joined touched slice. The rewritten frame is materialized
(localCheckpoint) before the overwrite so the write never reads the
path it replaces (the compact_store discipline). Returns an audit
dict — a deletion you cannot attest to a regulator did not happen.

Reference provenance: no analogue (the reference's lake is Athena-
managed); compliance extension, pairs with privacy_k_anonymity.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def forget_users(
    spark: SparkSession,
    lake_path: str,
    user_ids: list[int],
    user_col: str = "user_id",
    partition_col: str = "day",
) -> dict:
    """Delete every row of ``user_ids`` from the ``partition_col``-
    partitioned parquet lake at ``lake_path``, rewriting only touched
    partitions. Returns {"partitions_rewritten", "rows_dropped",
    "rows_kept_in_rewritten"}."""
    lake = spark.read.parquet(lake_path)
    subjects = F.col(user_col).isin([int(u) for u in user_ids])

    touched_vals = [
        r[0]
        for r in lake.where(subjects).select(partition_col).distinct().collect()
    ]
    if not touched_vals:
        return {
            "partitions_rewritten": 0,
            "partitions_deleted": 0,
            "rows_dropped": 0,
            "rows_kept_in_rewritten": 0,
        }

    # NULL handling, twice over. (1) The touched-partition predicate:
    # isin([...None...]) can never match a NULL partition value (SQL
    # NULL semantics), so subject rows living in
    # __HIVE_DEFAULT_PARTITION__ would survive while the audit claimed
    # a deletion — the exact compliance failure this module exists to
    # prevent. (2) The keep predicate: ~isin(subjects) is NULL (not
    # true) for a NULL user id, and where(NULL) DROPS the row — every
    # anonymous event in a touched partition would be silently
    # deleted and counted as a subject row in rows_dropped.
    non_null_vals = [v for v in touched_vals if v is not None]
    part_pred = F.col(partition_col).isin(non_null_vals)
    if None in touched_vals:
        part_pred = part_pred | F.col(partition_col).isNull()
    slice_df = lake.where(part_pred)
    n_before = slice_df.count()
    kept = slice_df.where(
        ~subjects | F.col(user_col).isNull()
    ).localCheckpoint(eager=True)
    n_kept = kept.count()

    # Dynamic partitionOverwriteMode only replaces partitions PRESENT in
    # the written frame. A touched partition whose every row belongs to a
    # subject has no surviving rows, is absent from `kept`, and its old
    # files would silently survive — a deletion attested but not
    # performed. Those partitions must be deleted explicitly.
    surviving = {
        r[0] for r in kept.select(partition_col).distinct().collect()
    }
    emptied_vals = [v for v in touched_vals if v not in surviving]

    if surviving:
        mode_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(mode_key, "static")
        spark.conf.set(mode_key, "dynamic")
        try:
            kept.write.mode("overwrite").partitionBy(partition_col).parquet(
                lake_path
            )
        finally:
            spark.conf.set(mode_key, prev)

    if emptied_vals:
        # Hadoop FileSystem delete works uniformly across local/HDFS/S3A.
        # Partition dir naming matches Spark's writer for scalar values
        # (day=2024-01-01); exotic values needing escaping should use an
        # escaped partition column upstream.
        jvm = spark._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for v in emptied_vals:
            # Spark writes NULL partition values to the Hive default
            # dir — deleting "day=None" would be a silent no-op and a
            # false deletion attestation
            dirname = "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)
            p = jvm.org.apache.hadoop.fs.Path(
                f"{lake_path}/{partition_col}={dirname}"
            )
            fs = p.getFileSystem(hconf)
            fs.delete(p, True)

    return {
        "partitions_rewritten": len(touched_vals) - len(emptied_vals),
        "partitions_deleted": len(emptied_vals),
        "rows_dropped": n_before - n_kept,
        "rows_kept_in_rewritten": n_kept,
    }
