"""Skew-resistant top-k per group (A5 at scale).

A single ranking window (`row_number() OVER (PARTITION BY key)`) puts
EVERY row of a group into one task — a hot key (one user emitting 10%
of a 100 TB stream) turns into one straggler task holding the whole
group. The standard fix is salted two-phase top-k:

- phase 1: rank within (key, salt) where salt spreads a group over
  `salt_buckets` tasks; keep each salt's local top-k (a group's true
  top-k is always a subset of the union of its per-salt top-k's);
- phase 2: rank the survivors — at most k x salt_buckets rows per key
  — and keep the global top-k.

Same answer as the single window (proved by the shared oracle in the
catalog), bounded task size regardless of key skew. Identical salting
applies to any per-group selection (the reference's event_sample_count
capture, alerta.py:406,455).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def topk_per_group_salted(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str | Column],
    k: int,
    salt_buckets: int = 8,
) -> DataFrame:
    """Deterministic top-k rows per key under an explicit total order,
    computed in two salted phases. `order_cols` must be a total order
    (tie-broken) for the result to be unique."""
    salt = (F.xxhash64(*order_cols) % salt_buckets).alias("_salt")
    w1 = W.partitionBy(*key_cols, "_salt").orderBy(*order_cols)
    local = (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = W.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        local.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
