"""As-of / range join semantics."""

from datetime import datetime

from pyspark.sql import functions as F

from alerta_spark.operators.asof import as_of_join, range_join


def _t(s):
    return datetime.fromisoformat(s)


def test_asof_picks_latest_prior(spark):
    trades = spark.createDataFrame(
        [("A", _t("2026-01-01 10:00:05"), 1),
         ("A", _t("2026-01-01 10:00:59"), 2),
         ("B", _t("2026-01-01 10:00:30"), 3)],
        "sym string, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [("A", _t("2026-01-01 10:00:00"), 100.0),
         ("A", _t("2026-01-01 10:00:30"), 101.0),
         ("B", _t("2026-01-01 10:01:00"), 50.0)],
        "sym string, ts timestamp, px double",
    )
    out = as_of_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="ts",
        right_cols=["px"],
    ).orderBy("trade_id").collect()
    assert [r["px"] for r in out] == [100.0, 101.0, None]


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([("A", _t("2026-01-01 10:00:00"))], "k string, ts timestamp")
    right = spark.createDataFrame([("A", _t("2026-01-01 10:00:00"), 7)], "k string, ts timestamp, v int")
    out = as_of_join(left, right, "k", "ts", "ts", ["v"]).first()
    assert out["v"] == 7


def test_asof_tolerance(spark):
    left = spark.createDataFrame([("A", _t("2026-01-02 00:00:00"))], "k string, ts timestamp")
    right = spark.createDataFrame([("A", _t("2026-01-01 00:00:00"), 7)], "k string, ts timestamp, v int")
    ok = as_of_join(left, right, "k", "ts", "ts", ["v"], tolerance="2 DAYS").first()
    assert ok["v"] == 7
    stale = as_of_join(left, right, "k", "ts", "ts", ["v"], tolerance="12 HOURS").first()
    assert stale["v"] is None


def test_range_join_bounds(spark):
    left = spark.createDataFrame(
        [("A", _t("2026-01-01 00:00:00")), ("A", _t("2026-01-08 00:00:00"))],
        "k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", _t("2026-01-01 00:00:00"), _t("2026-01-08 00:00:00"), "w1")],
        "k string, lo timestamp, hi timestamp, win string",
    )
    out = range_join(left, right, "k", "ts", "lo", "hi").collect()
    # half-open interval: start included, end excluded
    assert len(out) == 1 and out[0]["ts"] == _t("2026-01-01 00:00:00")
