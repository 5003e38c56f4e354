"""Golden-record survivorship: per-attribute latest-non-null pick,
single-exchange plan."""

from pyspark.sql import functions as F


def test_golden_record_picks_latest_non_null_per_attr(spark):
    from alerta_spark.ops.records import golden_record

    rows = [
        # key, ord, tie, a, b
        (1, 10, 1, "a1", None),
        (1, 20, 2, None, "b1"),
        (1, 30, 3, "a2", None),   # latest a
        (2, 10, 1, None, None),   # key with no attr values at all
        (3, 10, 1, "x", "y"),
        (3, 10, 2, "x2", None),   # same ord: tiebreak decides
    ]
    df = spark.createDataFrame(rows, ["k", "o", "t", "a", "b"])
    out = {
        r["k"]: r
        for r in golden_record(
            df, "k", F.col("o"), F.col("t"),
            {"a": F.col("a"), "b": F.col("b")},
        ).collect()
    }
    assert out[1]["a"] == "a2" and out[1]["b"] == "b1"
    assert out[1]["n_rows"] == 3
    assert out[2]["a"] is None and out[2]["b"] is None
    assert out[3]["a"] == "x2" and out[3]["b"] == "y"


def test_golden_record_single_exchange(spark):
    """All attributes must resolve in ONE key aggregate: exactly one
    Exchange in the plan however many attrs are requested."""
    from alerta_spark.ops.records import golden_record

    df = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.col("id").alias("o"),
        F.col("id").alias("t"),
        F.col("id").cast("string").alias("a"),
        F.col("id").cast("string").alias("b"),
        F.col("id").cast("string").alias("c"),
    )
    plan = (
        golden_record(
            df, "k", F.col("o"), F.col("t"),
            {n: F.col(n) for n in ("a", "b", "c")},
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
