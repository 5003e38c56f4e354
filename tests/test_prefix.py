"""Distributed prefix-sum primitive (ops/prefix.py).

Pins that global_rank_cumsum is value-identical to the one-partition
row_number + running-sum window it replaces, for every total ordering,
and that its plan never range-shuffles into a single-partition window
over the input frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from alerta_spark.ops.prefix import global_rank_cumsum


def _reference(df, order_by, val_col):
    one = F.pmod(F.lit(7), F.lit(1))
    w = W.partitionBy(one).orderBy(*order_by)
    return df.select(
        *df.columns,
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum(val_col)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
    )


@pytest.fixture(scope="module")
def frame(spark):
    # 5000 rows, heavy ties on v (21 distinct values), unique id
    return (
        spark.range(5000)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.col("id") * 37 + 11, F.lit(21)).alias("v"),
            (F.pmod(F.col("id") * 13, F.lit(997)) + 1).alias("x"),
        )
        .repartition(8)
        .cache()
    )


def test_matches_single_partition_window_asc(frame):
    order = [F.asc("v"), F.asc("k")]
    got = {
        r["k"]: (r["rnk"], r["cum"])
        for r in global_rank_cumsum(frame, order, "x").collect()
    }
    want = {
        r["k"]: (r["rnk"], r["cum"])
        for r in _reference(frame, order, "x").collect()
    }
    assert got == want


def test_matches_single_partition_window_desc(frame):
    order = [F.desc("x"), F.asc("k")]
    got = {
        r["k"]: (r["rnk"], r["cum"])
        for r in global_rank_cumsum(frame, order, "x").collect()
    }
    want = {
        r["k"]: (r["rnk"], r["cum"])
        for r in _reference(frame, order, "x").collect()
    }
    assert got == want


def test_rank_only_mode(frame):
    order = [F.asc("v"), F.asc("k")]
    out = global_rank_cumsum(frame, order, None, rank_col="r")
    assert "cum" not in out.columns
    ranks = sorted(r["r"] for r in out.collect())
    assert ranks == list(range(1, 5001))


def test_plan_has_no_single_partition_window_over_input(frame):
    out = global_rank_cumsum(frame, [F.asc("v"), F.asc("k")], "x")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the input frame goes through a range exchange, never a
    # SinglePartition one; the only SinglePartition exchange allowed
    # is the per-partition-totals offset frame (bounded by the
    # partition count)
    assert "rangepartitioning" in plan.lower()
    assert plan.count("Exchange SinglePartition") <= 1


def test_empty_frame(spark):
    df = spark.range(0).select(
        F.col("id").alias("k"), F.col("id").alias("x")
    )
    assert global_rank_cumsum(df, [F.asc("k")], "x").count() == 0
