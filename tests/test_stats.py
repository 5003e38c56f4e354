"""Winsorization: bound math, null passthrough, flag correctness."""

from pyspark.sql import functions as F


def test_winsorize_global_and_grouped(spark):
    from alerta_spark.ops.stats import winsorize

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("a", None)],
        "g string, value double",
    )
    out = winsorize(df, "value", ["g"], lo=0.10, hi=0.90).collect()
    by_val = {r["value"]: r for r in out}
    # p10 of 1..100 (interpolated over 101 rows incl null? nulls are
    # ignored by percentile) = 1 + 99*0.10 = 10.9; p90 = 90.1
    assert abs(by_val[1.0]["value_w"] - 10.9) < 1e-9
    assert by_val[1.0]["clipped"] is True
    assert abs(by_val[100.0]["value_w"] - 90.1) < 1e-9
    assert by_val[50.0]["value_w"] == 50.0
    assert by_val[50.0]["clipped"] is False
    nulls = [r for r in out if r["value"] is None]
    assert len(nulls) == 1
    assert nulls[0]["value_w"] is None and nulls[0]["clipped"] is None


def test_winsorize_broadcast_plan(spark):
    """The bounds join must be a broadcast (tiny per-group frame), not
    a shuffle of the corpus."""
    from alerta_spark.ops.stats import winsorize

    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("double").alias("value"),
    )
    plan = (
        winsorize(df, "value", ["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ols_trend_matches_closed_form(spark):
    """Known line y = 3 + 2x with one outlier-free group and a
    constant-x group (NULL slope)."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.stats import ols_trend

    rows = [("a", x, 3.0 + 2.0 * x) for x in range(10)]
    rows += [("b", 5, float(v)) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {
        r["g"]: r
        for r in ols_trend(df, ["g"], F.col("x"), F.col("y")).collect()
    }
    assert abs(out["a"]["slope"] - 2.0) < 1e-12
    assert abs(out["a"]["intercept"] - 3.0) < 1e-12
    assert abs(out["a"]["r2"] - 1.0) < 1e-12
    assert out["b"]["slope"] is None and out["b"]["r2"] is None
