"""Bucketed table layout for co-located (shuffle-free) joins.

At 100 TB the dominant cost of a fact-fact join (e.g. orders ⋈
lineitem on orderkey) is the shuffle of both sides. Writing both
tables bucketed by the join key — same column, same bucket count —
makes the join key-co-located on disk: Spark reads matching buckets
pair-wise and the SortMergeJoin runs with NO Exchange on either side.
This is the standing answer to "is there a shuffle here that becomes
the bottleneck at 100×?" for repeated joins on a stable key.

The reference has no storage layout story at all (Athena owns it —
SURVEY.md §2.1 S1); this is the Spark-native replacement, and the
write is a one-time cost amortized over every subsequent join/agg on
the key (aggregations on the bucket key skip their shuffle too).

Uses ``saveAsTable`` (bucket metadata lives in the session catalog —
works with the default in-memory catalog; persistent across sessions
with a Hive metastore or a lakehouse table format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write `df` hash-bucketed (and optionally sorted) by `key`.

    Sorting within buckets lets SortMergeJoin skip its per-task sort as
    well — the join degenerates to a streaming merge of pre-sorted
    bucket files.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
