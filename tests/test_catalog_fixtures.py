"""Handcrafted-fixture pins for catalog operators whose semantics
deserve a closed-form check beyond the DuckDB oracle: the oracle
proves Spark==SQL on the synthetic corpus; these prove both match the
intended MATH on journeys small enough to verify by hand."""

from __future__ import annotations

import datetime

import pytest


def _write_events(spark, path, rows):
    """rows: (event_id, minute_offset, user_id, event_type, value)."""
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (
                eid,
                base + datetime.timedelta(minutes=mo),
                uid,
                et,
                float(val),
                "{}",
            )
            for eid, mo, uid, et, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_markov_removal_hand_computed(spark, tmp_path):
    """Two deterministic journey shapes:
      - 60 users: click -> purchase
      - 40 users: view  -> (session end)
    Chain: start -> click (p=.6) -> purchase (p=1); start -> view
    (p=.4) -> null. P_conv = 0.6. Removing click kills ALL conversion
    (removal effect 1.0, full attribution share); removing view
    changes nothing (effect 0.0). Fixed-point at 1e6 is exact here."""
    from alerta_spark.plans.catalog import attribution_markov_removal

    rows = []
    eid = 0
    for u in range(60):
        rows.append((eid, 0, u, "click", 1.0)); eid += 1
        rows.append((eid, 1, u, "purchase", 5.0)); eid += 1
    for u in range(60, 100):
        rows.append((eid, 0, u, "view", 1.0)); eid += 1
    _write_events(spark, str(tmp_path), rows)

    got = {
        r["channel"]: r
        for r in attribution_markov_removal(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"click", "view", "signup", "error"}
    full = got["click"]["conv_full_q"]
    assert full == 600000  # P_conv = 0.6 exactly, 1e6 fixed-point
    assert got["click"]["conv_removed_q"] == 0
    assert got["click"]["removal_effect"] == pytest.approx(1.0)
    assert got["click"]["attribution_share"] == pytest.approx(1.0)
    assert got["view"]["conv_removed_q"] == full
    assert got["view"]["removal_effect"] == pytest.approx(0.0)


def test_peak_concurrency_hand_computed(spark, tmp_path):
    """Three sessions: u1 00:00-00:10, u2 00:05-00:15, u3 00:12-00:20
    -> concurrency peaks at 2 (first reached at 00:05), never 3."""
    from alerta_spark.plans.catalog import sessions_peak_concurrency_daily

    rows = [
        (1, 0, 1, "click", 1.0),
        (2, 10, 1, "view", 1.0),
        (3, 5, 2, "click", 1.0),
        (4, 15, 2, "view", 1.0),
        (5, 12, 3, "click", 1.0),
        (6, 20, 3, "view", 1.0),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = sessions_peak_concurrency_daily(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["peak_concurrency"] == 2
    base = datetime.datetime(2024, 1, 1, 0, 5)
    assert r["peak_at_us"] == int(base.timestamp() * 1_000_000)


def test_position_u_credit_conservation(spark, tmp_path):
    """Every purchase distributes exactly 10000 bp across its touches
    regardless of journey length (1, 2, and 5-touch journeys)."""
    from alerta_spark.plans.catalog import attribution_position_u

    rows = [
        # user 1: single touch -> 10000 to click
        (1, 0, 1, "click", 1.0),
        (2, 30, 1, "purchase", 9.0),
        # user 2: two touches -> 5000/5000
        (3, 0, 2, "view", 1.0),
        (4, 10, 2, "click", 1.0),
        (5, 30, 2, "purchase", 9.0),
        # user 3: five touches -> 4000 + 666+667+667 + 4000
        (6, 0, 3, "click", 1.0),
        (7, 5, 3, "view", 1.0),
        (8, 10, 3, "view", 1.0),
        (9, 15, 3, "signup", 1.0),
        (10, 20, 3, "click", 1.0),
        (11, 30, 3, "purchase", 9.0),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = attribution_position_u(spark, str(tmp_path)).collect()
    total = sum(r["credit_bp"] for r in out)
    assert total == 3 * 10000
    assert sum(r["credit_share"] for r in out) == pytest.approx(1.0)


def test_greedy_source_cover_tolerates_null_sources(spark, tmp_path):
    """A NULL source is uncoverable in both regimes; it must not crash
    the fast path's sorted()/int(mask) (None vs str was unorderable)
    nor be picked. Distinct texts per source keep the coverage math
    obvious: each named source covers only its own shingles."""
    from alerta_spark.plans.catalog import corpus_greedy_source_cover

    rows = []
    for i, src in enumerate(["web", "wiki", None, "web", None]):
        words = " ".join(f"tok{i}_{j}" for j in range(8))
        rows.append((i, words, "en", src, len(words)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = corpus_greedy_source_cover(spark, str(tmp_path)).collect()
    picked = [r["source"] for r in out]
    assert None not in picked
    assert set(picked) <= {"web", "wiki"}
    assert len(picked) == 2  # both named sources add positive gain
