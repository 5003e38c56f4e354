"""Time-series densification semantics."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from alerta_spark.ops.timeseries import resample_ffill


def _ev(spark, rows):
    base = dt.datetime(2026, 1, 1, 6, 30)
    return spark.createDataFrame(
        [
            Row(user_id=u, ts=base + dt.timedelta(days=d, minutes=m), value=float(v))
            for (u, d, m, v) in rows
        ]
    )


def test_ffill_fills_gaps_and_flags(spark):
    ev = _ev(
        spark,
        [
            (1, 0, 0, 10.0),   # day 0
            (1, 3, 0, 40.0),   # day 3 (days 1-2 are gaps)
            (2, 5, 0, 7.0),    # single-day user
        ],
    )
    out = {
        (r.user_id, str(r.bucket)): (r.value, r.is_observed)
        for r in resample_ffill(ev).collect()
    }
    assert out[(1, "2026-01-01")] == (10.0, True)
    assert out[(1, "2026-01-02")] == (10.0, False)   # carried
    assert out[(1, "2026-01-03")] == (10.0, False)   # carried
    assert out[(1, "2026-01-04")] == (40.0, True)
    assert out[(2, "2026-01-06")] == (7.0, True)
    assert len(out) == 5  # no grid beyond each key's span


def test_ffill_last_in_bucket_wins(spark):
    ev = _ev(spark, [(1, 0, 0, 1.0), (1, 0, 60, 2.0), (1, 1, 0, 3.0)])
    out = {str(r.bucket): r.value for r in resample_ffill(ev).collect()}
    assert out["2026-01-01"] == 2.0  # later ts wins within the bucket
    assert out["2026-01-02"] == 3.0


def test_ffill_hourly_unit(spark):
    ev = _ev(spark, [(1, 0, 0, 5.0), (1, 0, 150, 6.0)])  # 06:30 and 09:00
    rows = resample_ffill(ev, unit="hour").collect()
    assert len(rows) == 4  # 06:00, 07:00, 08:00, 09:00
    assert [r.value for r in sorted(rows, key=lambda r: r.bucket)] == [5.0, 5.0, 5.0, 6.0]


def test_merge_intervals_running_max_swallows_short_events(spark):
    """A long early interval must swallow later short ones — the case
    a lag-only gap test over-splits."""
    from alerta_spark.ops.timeseries import merge_intervals

    df = spark.createDataFrame(
        [
            # key 1: [0,100] swallows [10,20] and [30,40]; [150,160] apart
            (1, 1, 0, 100),
            (1, 2, 10, 20),
            (1, 3, 30, 40),
            (1, 4, 150, 160),
            # key 2: touching intervals merge ([0,10] + [10,20])
            (2, 5, 0, 10),
            (2, 6, 10, 20),
        ],
        "user_id long, event_id long, s long, e long",
    )
    out = {
        (r["user_id"], r["island"]): (
            r["start_us"], r["end_us"], r["n_events"], r["covered_us"]
        )
        for r in merge_intervals(df, "s", "e").collect()
    }
    assert out == {
        (1, 1): (0, 100, 3, 100),
        (1, 2): (150, 160, 1, 10),
        (2, 1): (0, 20, 2, 20),
    }


def test_zorder_key_matches_python_morton(spark):
    """Bit-interleave semantics pinned against a Python reference."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.layout import zorder_key

    def morton(x, y, bits=16):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == morton(r["x"], r["y"])


def test_ewma_binary_matches_recursion(spark):
    """The linearized prefix-sum form must equal the textbook
    recursion ewma_t = (x_t + ewma_{t-1}) / 2 exactly."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.timeseries import ewma_binary

    xs = [100, 300, 50, 1200, 0, 7]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], ["g", "t", "x"]
    )
    out = {
        r["rn"]: r["ewma"]
        for r in ewma_binary(df, ["g"], "t", "x").collect()
    }
    e = None
    for i, x in enumerate(xs, start=1):
        e = float(x) if e is None else (x + e) / 2.0
        assert out[i] == e


def test_seasonal_residual_surfaces_outage_hours(spark):
    """A missing hour on the dense grid must appear as a NEGATIVE
    residual (-last week's value), not be skipped."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.timeseries import seasonal_residual

    rows = [("a", h, 100) for h in (0, 1, 2)]            # base period
    rows += [("a", 3, 110), ("a", 5, 90)]                # hour 4 missing
    df = spark.createDataFrame(rows, ["g", "h", "x"])
    out = {
        r["hour_idx"]: r
        for r in seasonal_residual(df, ["g"], "h", "x", period_hours=3).collect()
    }
    assert out[3]["resid_q"] == 10
    assert out[4]["x_q"] == 0 and out[4]["resid_q"] == -100  # outage hour
    assert out[5]["resid_q"] == -10


def test_ewma_binary_guards_long_series(spark):
    """shiftleft wraps mod 64, so past the exact budget the EWMA would be
    silently wrong — the op must raise instead of emitting garbage."""
    import pytest as _pytest

    from alerta_spark.ops.timeseries import ewma_binary

    # vq=1 keeps every multiply below the ANSI overflow check, so
    # without the guard the shift itself would wrap SILENTLY — exactly
    # the failure mode under test (large vq already trips ANSI
    # ARITHMETIC_OVERFLOW before the wrap).
    df = spark.range(70).select(
        F.lit("k").alias("k"), F.col("id").alias("t"),
        F.lit(1).cast("bigint").alias("vq"),
    )
    with _pytest.raises(Exception, match="63-bit|budget|wrap"):
        ewma_binary(df, ["k"], "t", "vq").collect()

    # at/below the budget the exact recursion still holds
    ok = ewma_binary(
        spark.range(60).select(
            F.lit("k").alias("k"), F.col("id").alias("t"),
            F.lit(1).cast("bigint").alias("vq"),
        ),
        ["k"], "t", "vq",
    ).orderBy("rn").collect()
    assert len(ok) == 60
    expect = None
    for r in ok:
        expect = 1.0 if expect is None else (1 + expect) / 2
        assert r["ewma"] == expect
