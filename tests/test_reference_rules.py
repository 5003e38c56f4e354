"""Parity proof: the reference's OWN shipped alert files
(/root/reference/alerts/*.yml, read-only) load, compile, and execute
unmodified — a user can point this engine at their existing alertA
rule directory."""

import json

import pytest

from pyspark.sql import functions as F

from alerta_spark.dialect import trino_to_spark
from alerta_spark.engine import Engine
from alerta_spark.rules import load_rules

REF_ALERTS = "/root/reference/alerts/*.yml"


@pytest.fixture(scope="module")
def ref_rules():
    rules = load_rules(REF_ALERTS)
    # the reference ships two alert files: an_alert.yml (threshold) and
    # multiple_risky_logins.yml (2-slot sequence with cross-slot template)
    assert len(rules) == 2
    return rules


def _cloudtrail_events(spark, n_logins=3):
    """Events shaped like the reference's cloudtrail/onelogin feeds
    (columns: event_id, ts, source, details-json)."""
    rows = []
    for i in range(n_logins):
        rows.append(
            {
                "event_id": i,
                "ts": f"2026-01-01 0{i}:00:00",
                "source": "cloudtrail",
                "details": json.dumps(
                    {
                        "eventname": "ConsoleLogin",
                        "useridentity": {"arn": "arn:aws:iam::1:user/alice"},
                        "recipientaccountid": "111",
                        "sourceipaddress": "10.0.0.1",
                    }
                ),
            }
        )
    for i, score in enumerate(("95", "91")):
        rows.append(
            {
                "event_id": 100 + i,
                "ts": f"2026-01-01 1{i}:00:00",
                "source": "onelogin",
                "details": json.dumps(
                    {
                        "user_name": "bob",
                        "risk_score": score,
                        "risk_reasons": "Geo velocity",
                        "sourceipaddress": "10.0.0.2",
                    }
                ),
            }
        )
    df = spark.createDataFrame(rows)
    return df.withColumn("ts", F.to_timestamp("ts")).select(
        "event_id", "ts", "source", "details"
    )


def test_reference_criteria_all_compile(spark, ref_rules):
    """Every criteria string in every reference rule (including every
    sequence slot) translates to a Spark expression that resolves
    against a cloudtrail-shaped frame."""
    df = _cloudtrail_events(spark)
    n_checked = 0
    for rule in ref_rules:
        crits = []
        if rule.get("criteria"):
            crits.append(rule["criteria"])
        for slot in rule.get("slots", []) or []:
            if slot.get("criteria"):
                crits.append(slot["criteria"])
        for crit in crits:
            # templated conjuncts resolve per in-flight alert; compile
            # the static remainder like the engine does
            from alerta_spark.streaming.correlator import _static_criteria

            sql = trino_to_spark(_static_criteria({"criteria": crit})) or "true"
            df.where(F.expr(sql)).count()  # resolves + executes
            n_checked += 1
    assert n_checked >= 3  # threshold criteria + two sequence slots


def test_reference_threshold_rule_fires_verbatim(spark, ref_rules, tmp_path):
    """an_alert.yml (aws_console_login) runs unmodified: fires per arn
    with the reference's mustache summary + event snippets."""
    rules = [r for r in ref_rules if r["alert_name"] == "aws_console_login"]
    assert rules
    engine = Engine(spark, str(tmp_path / "store"))
    engine.run_once(_cloudtrail_events(spark), rules)
    alerts = [a for a in engine.alerts.docs() if a["alert_name"] == "aws_console_login"]
    assert len(alerts) == 1
    a = alerts[0]
    assert a["metadata"]["value"] == "arn:aws:iam::1:user/alice"
    assert a["metadata"]["count"] == 3
    assert "3 console logins" in a["summary"]
    assert "arn:aws:iam::1:user/alice to account 111" in a["summary"]


def test_reference_sequence_rule_advances_verbatim(spark, ref_rules, tmp_path):
    """multiple_risky_logins.yml (2-slot sequence with a cross-slot
    template in slot 1) runs unmodified: slot 0 fills on the first
    risky login, slot 1's templated criteria then matches the SAME
    user and completes the sequence."""
    rules = [r for r in ref_rules if r["alert_name"] == "multiple_risky_logins"]
    assert rules
    engine = Engine(spark, str(tmp_path / "store"))
    # run 1: one risky login -> slot 0 fills (reference cron model:
    # each run fills the first unfilled slot; a single batch can't
    # double-fill because F9 dedups captured events)
    ev = _cloudtrail_events(spark)
    engine.run_once(ev.where(F.col("event_id") == 100), rules)
    inflight = [
        d for d in engine.inflight.docs() if d["alert_name"] == "multiple_risky_logins"
    ]
    assert inflight and inflight[0]["slots"][0].get("triggered")
    # run 2: a NEW risky login by the same user satisfies slot 1's
    # cross-slot-templated criteria -> sequence completes
    engine.run_once(ev.where(F.col("event_id") == 101), rules)
    done = [
        a for a in engine.alerts.docs() if a["alert_name"] == "multiple_risky_logins"
    ]
    assert done, "sequence should complete on bob's two risky logins"
    assert "bob" in done[0]["summary"]
