"""Sessionization and funnel semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from alerta_spark.sources.lake import load_events
from alerta_spark.ops.sessions import (
    funnel_counts,
    session_stats,
    session_window_stats,
    sessionize,
)


def _ev(spark, rows):
    base = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                user_id=u,
                event_type=t,
                ts=base + dt.timedelta(minutes=m),
            )
            for i, (u, m, t) in enumerate(rows)
        ]
    )


def test_gap_splits_sessions(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "click"),
            (1, 10, "click"),
            (1, 50, "click"),  # 40-min gap -> new session
            (2, 0, "click"),
        ],
    )
    s = sessionize(ev, gap_minutes=30)
    got = {(r.user_id, r.event_id): r.session_idx for r in s.collect()}
    assert got[(1, 0)] == 1 and got[(1, 1)] == 1 and got[(1, 2)] == 2
    assert got[(2, 3)] == 1

    stats = {
        (r.user_id, r.session_idx): r for r in session_stats(ev, 30).collect()
    }
    assert stats[(1, 1)].n_events == 2
    assert stats[(1, 1)].duration_us == 10 * 60 * 1_000_000
    assert stats[(1, 2)].n_events == 1


def test_native_session_window_agrees(spark):
    """F.session_window (the streaming operator) produces the same
    (user, session_start, n_events) partitioning as the window-based
    batch sessionize on real data."""
    ev = load_events(spark, "/root/testdata/sf0.001")
    a = {
        (r.user_id, r.session_start, r.n_events)
        for r in session_stats(ev, 30).select(
            "user_id", "session_start", "n_events"
        ).collect()
    }
    b = {
        (r.user_id, r.session_start, r.n_events)
        for r in session_window_stats(ev, 30).select(
            "user_id", "session_start", "n_events"
        ).collect()
    }
    assert a == b and len(a) > 0


def test_session_stats_single_exchange(spark):
    ev = load_events(spark, "/root/testdata/sf0.001")
    plan = (
        session_stats(ev, 30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_funnel_strict_ordering(spark):
    ev = _ev(
        spark,
        [
            # user 1: full ordered funnel
            (1, 0, "signup"),
            (1, 5, "view"),
            (1, 9, "purchase"),
            # user 2: purchase BEFORE view -> converts only to view
            (2, 0, "signup"),
            (2, 3, "purchase"),
            (2, 7, "view"),
            # user 3: never signs up -> not even step 1
            (3, 1, "view"),
            (3, 2, "purchase"),
        ],
    )
    steps = [
        ("signup", F.col("event_type") == "signup"),
        ("view", F.col("event_type") == "view"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    got = {r.step: (r.n_users, r.conversion) for r in funnel_counts(ev, steps).collect()}
    assert got["signup"] == (2, 1.0)
    assert got["view"] == (2, 1.0)
    assert got["purchase"][0] == 1
    assert abs(got["purchase"][1] - 0.5) < 1e-12


def test_funnel_strategies_agree(spark):
    """The single-scan fold (default), broadcast step-joins, and
    shuffled step-joins are three physical strategies for one
    semantics — identical output on real data."""
    ev = load_events(spark, "/root/testdata/sf0.001")
    steps = [
        ("signup", F.col("event_type") == "signup"),
        ("view", F.col("event_type") == "view"),
    ]
    a = sorted(map(tuple, funnel_counts(ev, steps).collect()))
    b = sorted(map(tuple, funnel_counts(ev, steps, strategy="joins").collect()))
    c = sorted(
        map(
            tuple,
            funnel_counts(
                ev, steps, broadcast_state=False, strategy="joins"
            ).collect(),
        )
    )
    assert a == b == c


def test_funnel_fold_strict_ordering_matches_joins(spark):
    """The fold must enforce strict step ordering exactly like the
    join formulation on the synthetic out-of-order case."""
    ev = _ev(
        spark,
        [
            (1, 0, "signup"),
            (1, 5, "view"),
            (1, 9, "purchase"),
            (2, 0, "signup"),
            (2, 3, "purchase"),
            (2, 7, "view"),
        ],
    )
    steps = [
        ("signup", F.col("event_type") == "signup"),
        ("view", F.col("event_type") == "view"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    a = sorted(map(tuple, funnel_counts(ev, steps).collect()))
    b = sorted(map(tuple, funnel_counts(ev, steps, strategy="joins").collect()))
    assert a == b


def test_funnel_fold_matches_joins_randomized(spark):
    """200 random users with adversarial event structure (duplicate
    timestamps, same-instant multi-step matches, missing steps,
    interleaved order): the fold and join strategies must agree
    user-for-user, not just in aggregate. Seeded -> reproducible."""
    import random

    from alerta_spark.ops.sessions import funnel_conversion_times

    rng = random.Random(20260813)
    types = ["signup", "view", "purchase", "noise"]
    rows = []
    for u in range(200):
        for _ in range(rng.randint(0, 12)):
            # minute granularity with heavy collisions to exercise ties
            rows.append((u, rng.randint(0, 30), rng.choice(types)))
    ev = _ev(spark, rows)
    steps = [
        ("signup", F.col("event_type") == "signup"),
        ("view", F.col("event_type") == "view"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    a = sorted(map(tuple, funnel_counts(ev, steps).collect()))
    b = sorted(map(tuple, funnel_counts(ev, steps, strategy="joins").collect()))
    assert a == b

    # per-user conversion times vs an independent python reference
    conv = {
        r.user_id: list(r.conv_times)
        for r in funnel_conversion_times(ev, steps).collect()
    }
    by_user = {}
    for r in ev.select("user_id", "ts", "event_type").collect():
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    import datetime as _dt

    for u, evs in by_user.items():
        evs.sort()
        t = [None, None, None]
        for ts, et in evs:
            us = int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
            for i, name in enumerate(["signup", "view", "purchase"]):
                prereq = (t[i - 1] is not None and us > t[i - 1]) if i else True
                if t[i] is None and et == name and prereq:
                    t[i] = us
        if u in conv:
            assert conv[u] == t, (u, conv[u], t)
        else:
            assert all(x is None for x in t), (u, t)


def test_funnel_within_deadline_semantics(spark):
    """Step counts only when it lands within the window after the
    previous step's FIRST qualifying event; fold and join strategies
    agree under the deadline."""
    ev = _ev(
        spark,
        [
            # user 1 converts view at +5min (inside 10-min window)
            (1, 0, "signup"),
            (1, 5, "view"),
            # user 2's view lands at +30min -> outside the window
            (2, 0, "signup"),
            (2, 30, "view"),
            # user 3: early view before signup doesn't count; the one
            # after signup is outside the window
            (3, 1, "view"),
            (3, 2, "signup"),
            (3, 40, "view"),
        ],
    )
    steps = [
        ("signup", F.col("event_type") == "signup"),
        ("view", F.col("event_type") == "view"),
    ]
    got = {
        r.step: r.n_users
        for r in funnel_counts(ev, steps, within_minutes=10).collect()
    }
    assert got == {"signup": 3, "view": 1}

    a = sorted(map(tuple, funnel_counts(ev, steps, within_minutes=10).collect()))
    b = sorted(
        map(
            tuple,
            funnel_counts(
                ev, steps, within_minutes=10, strategy="joins"
            ).collect(),
        )
    )
    assert a == b

    # no deadline -> user 2 and 3 convert too
    loose = {r.step: r.n_users for r in funnel_counts(ev, steps).collect()}
    assert loose == {"signup": 3, "view": 3}


def test_km_curve_hand_computed(spark):
    """Textbook KM: subjects with lifetimes/events
    (1,e)(2,c)(3,e)(3,e)(4,c)(5,e): risk sets 6,4,2 at t=1,3,5;
    S(1)=5/6, S(3)=5/6*2/4, S(5)=0 (terminal n==d sentinel)."""
    import math

    from alerta_spark.ops.sessions import km_curve

    life = spark.createDataFrame(
        [(1, True), (2, False), (3, True), (3, True), (4, False), (5, True)],
        "t long, ev boolean",
    )
    rows = {r["t_days"]: r for r in km_curve(life, "t", "ev").collect()}
    assert set(rows) == {1, 3, 5}
    assert rows[1]["n_at_risk"] == 6 and rows[1]["d_churned"] == 1
    assert rows[3]["n_at_risk"] == 4 and rows[3]["d_churned"] == 2
    assert rows[5]["n_at_risk"] == 1 and rows[5]["d_churned"] == 1
    q = 1_000_000_000
    t1 = math.floor(math.log(5 / 6) * q)
    t3 = math.floor(math.log(2 / 4) * q)
    assert rows[1]["survival_lnq"] == t1
    assert rows[3]["survival_lnq"] == t1 + t3
    assert rows[5]["survival_lnq"] == t1 + t3 - 100 * q  # S -> 0 sentinel
    # censored-only times never emit a curve row
    assert 2 not in rows and 4 not in rows


def test_km_survival_churn_framing(spark):
    """The churn wrapper: user A active till the end (censored), user
    B quiet for 40 days before the dataset edge (churned)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from alerta_spark.ops.sessions import km_survival

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base), ("a", base + dt.timedelta(days=60)),      # censored
        ("b", base), ("b", base + dt.timedelta(days=20)),      # churned @20
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = km_survival(df, churn_horizon_days=30).collect()
    assert len(out) == 1
    r = out[0]
    assert r["t_days"] == 20 and r["d_churned"] == 1 and r["n_at_risk"] == 2
