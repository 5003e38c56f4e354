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


def test_mann_kendall_hand_computed(spark):
    """Strictly increasing series -> S = n(n-1)/2, no ties; a flat
    series -> S = 0 with full tie correction (var18 = 0 for all-equal
    values of any length)."""
    from alerta_spark.ops.stats import mann_kendall

    rows = [("up", t, t * 10) for t in range(5)]          # S = 10
    rows += [("flat", t, 7) for t in range(4)]            # S = 0, all tied
    df = spark.createDataFrame(rows, ["g", "t", "xq"])
    out = {r["g"]: r for r in mann_kendall(df, ["g"], "t", "xq").collect()}
    up = out["up"]
    assert up["s"] == 10 and up["n"] == 5
    # var18 = n(n-1)(2n+5) = 5*4*15 = 300; z = (S-1)/sqrt(300/18)
    assert up["var18"] == 300
    import math
    assert abs(up["z"] - 9 / math.sqrt(300 / 18)) < 1e-12
    flat = out["flat"]
    # tie18 = 4*3*13 = 156 = n(n-1)(2n+5) -> var18 = 0, z = 0
    assert flat["s"] == 0 and flat["var18"] == 0 and flat["z"] == 0.0


def test_theil_sen_robust_to_outlier(spark):
    """y = 2x with one wild point: OLS would move, the pairwise-slope
    median stays at 2 (x 1e6 quantization)."""
    from alerta_spark.ops.stats import theil_sen

    rows = [("a", t, 2 * t) for t in range(9)]
    rows.append(("a", 9, 1000))                           # outlier
    df = spark.createDataFrame(rows, ["g", "t", "xq"])
    out = theil_sen(df, ["g"], "t", "xq").collect()
    assert len(out) == 1
    assert out[0]["n_pairs"] == 45
    assert out[0]["median_slope_q"] == 2_000_000


def test_interarrival_dispersion_poisson_vs_regular(spark):
    """Perfectly regular gaps -> variance 0 -> fano 0, B = -1;
    moments verified against numpy on a bursty series."""
    import numpy as np
    from pyspark.sql import functions as F

    from alerta_spark.ops.stats import interarrival_dispersion

    base = 1_700_000_000_000_000  # µs epoch
    regular = [base + i * 1_000_000 for i in range(10)]
    bursty = [base]
    for g in [1, 1, 1, 60, 1, 1, 120, 1, 1]:              # µs-scaled below
        bursty.append(bursty[-1] + g * 1_000_000)
    rows = [(1, i, t) for i, t in enumerate(regular)]
    rows += [(2, i, t) for i, t in enumerate(bursty)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "us"]).select(
        "user_id", "event_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    out = {
        r["user_id"]: r
        for r in interarrival_dispersion(df, ["user_id"]).collect()
    }
    r1 = out[1]
    assert r1["n_gaps"] == 9 and r1["fano"] == 0.0 and r1["b"] == -1.0
    r2 = out[2]
    gaps = np.diff(np.array(bursty, dtype=np.float64))
    var = gaps.var(ddof=1)
    mean = gaps.mean()
    assert abs(r2["fano"] - var / mean) / (var / mean) < 1e-12
    assert abs(r2["b"] - (gaps.std(ddof=1) - mean) / (gaps.std(ddof=1) + mean)) < 1e-12


def _sprt_events(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=i), "t%d" % key, x)
            for i, (key, x) in enumerate(rows)
        ],
        "event_id long, ts timestamp, event_type string, x int",
    )


def test_sprt_scan_decides_at_first_crossing(spark):
    from alerta_spark.ops.stats import sprt_constants, sprt_scan

    k = sprt_constants()
    # key t1: all successes -> llr climbs by w1 each event; crossing at
    # the first rn where rn*w1 >= a (computable closed-form)
    import math

    need = math.ceil(k["a"] / k["w1"])
    rows = [(1, 1)] * (need + 3) + [(2, 0)] * 5
    out = {
        r["event_type"]: r
        for r in sprt_scan(_sprt_events(spark, rows), k).collect()
    }
    t1 = out["t1"]
    assert t1["decision"] == "reject_h0"
    assert t1["n_at_decision"] == need
    assert t1["llr_q_at_decision"] == need * k["w1"]
    assert t1["n_total"] == need + 3
    # key t2: 5 failures is not enough to accept H0 (|w0| small), so
    # the monitor continues
    assert out["t2"]["decision"] == "continue"
    assert out["t2"]["n_at_decision"] is None


def test_sprt_scan_accept_h0_lower_boundary(spark):
    """The accept_h0 (lower-boundary) face: enough failures drive the
    LLR to b — pins the fused single-aggregate form on the third
    decision branch (first crossing index, at-decision LLR, and a
    trailing tail that must not move the frozen decision point)."""
    import math

    from alerta_spark.ops.stats import sprt_constants, sprt_scan

    k = sprt_constants()
    need = math.ceil(k["b"] / k["w0"])  # both negative -> positive n
    rows = [(1, 0)] * (need + 4)
    out = {
        r["event_type"]: r
        for r in sprt_scan(_sprt_events(spark, rows), k).collect()
    }
    t1 = out["t1"]
    assert t1["decision"] == "accept_h0"
    assert t1["n_at_decision"] == need
    assert t1["llr_q_at_decision"] == need * k["w0"]
    assert t1["n_total"] == need + 4
    assert t1["llr_q_final"] == (need + 4) * k["w0"]


def test_incremental_sprt_matches_single_scan(spark, tmp_path):
    """Two time-ordered batches through the store == one scan, and a
    decided key stays frozen even if later data would re-cross."""
    from alerta_spark.ops.stats import (
        incremental_sprt_monitor,
        sprt_constants,
        sprt_scan,
    )

    k = sprt_constants()
    import math

    need = math.ceil(k["a"] / k["w1"])
    rows = [(1, 1)] * (need + 5) + [(2, 0), (2, 1)] * 10
    df = _sprt_events(spark, rows).orderBy("ts")
    store = str(tmp_path / "sprt")
    half = df.count() // 2
    b1 = df.orderBy("ts", "event_id").limit(half)
    b2 = df.join(b1.select("event_id"), "event_id", "left_anti")
    incremental_sprt_monitor(spark, store, b1, k)
    got = {
        r["event_type"]: r
        for r in incremental_sprt_monitor(spark, store, b2, k).collect()
    }
    want = {
        r["event_type"]: r for r in sprt_scan(df, k).collect()
    }
    for key in want:
        assert got[key]["decision"] == want[key]["decision"], key
        assert got[key]["n_at_decision"] == want[key]["n_at_decision"], key
