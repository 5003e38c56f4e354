"""Key-skew profiler: exact counts, hot-key detection, NULL-key row."""

from pyspark.sql import functions as F


def test_skew_report_hot_and_null_keys(spark):
    from alerta_spark.ops.profile import skew_report

    rows = (
        [("hot",)] * 60
        + [("warm",)] * 30
        + [(None,)] * 8
        + [("k1",), ("k2",)]
    )
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, "k", top_n=3).collect()
    assert [r["key"] for r in got] == ["hot", "warm", None]
    assert [r["cnt"] for r in got] == [60, 30, 8]
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert abs(got[0]["share_of_total"] - 0.6) < 1e-12
    # mean key size = 100/5 = 20 rows -> hot ratio 3.0
    assert abs(got[0]["ratio_to_mean"] - 3.0) < 1e-12


def test_skew_report_plan_uses_take_ordered(spark):
    """The top-N cut must be TakeOrderedAndProject (scale-safe), not a
    global sort or an all-keys window."""
    from alerta_spark.ops.profile import skew_report

    df = spark.range(1000).select((F.col("id") % 7).alias("k"))
    plan = skew_report(df, "k", top_n=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
