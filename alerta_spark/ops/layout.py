"""Data-layout optimization: Z-order (Morton) clustering keys.

At 100 TB the scan cost of a selective query is decided before it
runs — by which files hold the matching rows and how tight their
parquet min/max zone maps are. Sorting by one column gives perfect
skipping on that column and none on any other; interleaving the bits
of two (or k) quantized columns gives a single sort key whose runs
are small in EVERY interleaved dimension — the Delta/Iceberg
`OPTIMIZE ZORDER BY` idea on plain parquet:

    df.withColumn("z", zorder_key([x, y]))
      .repartitionByRange("z").sortWithinPartitions("z")
      .write.parquet(...)

Every bit operation is exact BIGINT shift/mask, identical in Spark
and DuckDB, so the key — and the per-bucket span report that proves
the clustering works — is hash-checked against the oracle.

The inputs must be NON-NEGATIVE integers that fit ``bits`` bits:
ranks, day/minute offsets, or scaled measures. Quantization choice is
the caller's (it is part of the layout's contract, like a partition
spec).

Reference provenance: no analogue (the reference delegates storage
layout to Athena); pure scale extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave: bit b of column i lands at position
    b*len(cols) + i. Pure codegen (shift/mask/sum), no shuffle."""
    k = len(cols)
    terms = []
    for i, c in enumerate(cols):
        lc = c.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(lc, b).bitwiseAND(F.lit(1).cast("long")),
                    b * k + i,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_layout_report(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 16,
    bucket_shift: int = 26,
) -> DataFrame:
    """Split the z-keyspace into fixed-width buckets (bucket =
    z >> bucket_shift — data-independent, so bucket boundaries are a
    property of the layout, not the sample) and report each bucket's
    row count and x/y min/max — exactly the zone-map spans a file
    written from that bucket would advertise. Tight spans on BOTH
    columns are the point of the interleave."""
    z = zorder_key([x, y], bits)
    return (
        df.select(
            x.cast("long").alias("_x"),
            y.cast("long").alias("_y"),
            F.shiftright(z, bucket_shift).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("_x").alias("min_x"),
            F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"),
            F.max("_y").alias("max_y"),
        )
    )
