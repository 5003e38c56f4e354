"""Threshold-trigger semantics, mirroring the reference's golden test
(tests/test_alerts.py:204-238: asserts rendered summary substrings)."""

from pyspark.sql import functions as F

from alerta_spark.operators.threshold import threshold_alerts

CLOUDTRAIL_RULE = {
    "alert_name": "aws_console_login",
    "alert_type": "threshold",
    "criteria": "source='cloudtrail' AND json_extract_scalar(details,'$.eventname') = 'ConsoleLogin'",
    "severity": "INFO",
    "summary": "{{metadata.count}} ConsoleLogin by {{metadata.value}}",
    "event_snippet": "from {{details.sourceipaddress}}",
    "event_sample_count": 5,
    "threshold": 1,
    "aggregation_key": "details.useridentity.type",
    "category": "authentication",
    "tags": ["login", "aws"],
}


def test_golden_cloudtrail_summary(cloudtrail_events):
    alerts = threshold_alerts(
        cloudtrail_events, CLOUDTRAIL_RULE, id_col="event_id", ts_col="ts"
    ).collect()
    assert len(alerts) == 1
    a = alerts[0]
    assert "ConsoleLogin by Root" in a["summary"]
    assert "from 6.9.9.93" in a["summary"]
    assert a["metadata"]["value"] == "Root"
    assert a["metadata"]["count"] == 2
    assert a["triggered"] is True
    assert a["tags"] == ["login", "aws"]
    assert len(a["events"]) == 2


def test_below_threshold_no_alert(cloudtrail_events):
    rule = dict(CLOUDTRAIL_RULE, threshold=5)
    assert threshold_alerts(cloudtrail_events, rule).count() == 0


def test_per_group_fanout(events):
    """One alert per aggregation-key value crossing the threshold
    (alerta.py:438-459)."""
    rule = {
        "alert_name": "any",
        "criteria": "event_type='purchase'",
        "threshold": 1,
        "aggregation_key": "user_id",
        "summary": "u={{metadata.value}}",
    }
    alerts = threshold_alerts(events, rule)
    n_groups = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert alerts.count() == n_groups


def test_missing_key_contributes_nothing(cloudtrail_events):
    rule = dict(CLOUDTRAIL_RULE, aggregation_key="details.not_a_key")
    assert threshold_alerts(cloudtrail_events, rule).count() == 0


def test_sample_cap_orders_by_ts(events):
    rule = {
        "alert_name": "cap",
        "criteria": "event_type='purchase'",
        "threshold": 1,
        "aggregation_key": "user_id",
        "summary": "",
        "event_snippet": "{{event_id}}",
        "event_sample_count": 1,
    }
    a = threshold_alerts(events, rule).orderBy("metadata.value").first()
    first_event = a["events"][0]
    # sample snippet must reference the earliest event in the group
    assert a["summary"].strip() == str(first_event["event_id"])


def test_malformed_criteria_raises_parse_error(events):
    """A syntactically broken criteria must fail loudly at plan time
    (the ENGINE swallows it per reference semantics — engine.py — but
    the operator itself surfaces the ParseException)."""
    import pytest
    from pyspark.errors import ParseException

    from alerta_spark.operators.threshold import threshold_alerts

    rule = {
        "alert_name": "broken",
        "criteria": "event_type === 'x' AND (",
        "aggregation_key": "user_id",
        "threshold": 1,
    }
    with pytest.raises(ParseException):
        threshold_alerts(events, rule).collect()


def test_dotted_key_to_missing_json_field_yields_no_alerts(events):
    """Aggregation key pointing into a JSON path that never exists:
    every group key is NULL -> contributes nothing, no crash."""
    from alerta_spark.operators.threshold import threshold_alerts

    rule = {
        "alert_name": "ghost_key",
        "criteria": "event_type='purchase'",
        "aggregation_key": "props.does_not_exist",
        "threshold": 1,
    }
    assert threshold_alerts(events, rule).count() == 0


def test_empty_criteria_matches_all_rows(events):
    """An empty criteria string is 'match everything' (reference
    parity: an absent criteria scans the whole window)."""
    from alerta_spark.operators.threshold import threshold_alerts

    rule = {
        "alert_name": "all",
        "criteria": "",
        "aggregation_key": "event_type",
        "threshold": 1,
    }
    fired = threshold_alerts(events, rule)
    assert fired.count() == events.select("event_type").distinct().count()


def test_fused_rules_match_sequential(events):
    """N rules in one pass must fire exactly the groups the per-rule
    path fires — names, values, counts, and collected event ids."""
    from alerta_spark.operators.threshold import (
        threshold_alerts,
        threshold_alerts_fused,
    )

    rules = [
        {
            "alert_name": "big_purchases",
            "criteria": "event_type='purchase' AND CAST(json_extract_scalar(props,'$.k') AS INTEGER) > 50",
            "aggregation_key": "user_id",
            "threshold": 2,
        },
        {
            "alert_name": "errors_by_user",
            "criteria": "event_type='error'",
            "aggregation_key": "user_id",
            "threshold": 3,
        },
        {
            "alert_name": "all_by_type",
            "criteria": "",
            "aggregation_key": "event_type",
            "threshold": 1,
        },
    ]
    fused = {
        (r.alert_name, r.value): (r["count"], tuple(e.event_id for e in r.events))
        for r in threshold_alerts_fused(events, rules).collect()
    }
    seq = {}
    for rule in rules:
        for r in threshold_alerts(events, rule).collect():
            seq[(rule["alert_name"], r.metadata.value)] = (
                r.metadata["count"],
                tuple(e.event_id for e in r.events),
            )
    assert fused == seq and len(fused) > 0


def test_fused_rules_single_scan_single_exchange(events):
    from alerta_spark.operators.threshold import threshold_alerts_fused

    rules = [
        {"alert_name": "a", "criteria": "event_type='purchase'",
         "aggregation_key": "user_id", "threshold": 1},
        {"alert_name": "b", "criteria": "event_type='error'",
         "aggregation_key": "user_id", "threshold": 1},
    ]
    plan = (
        threshold_alerts_fused(events, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_hot_key_capped_before_collect(spark):
    """Skew guard: a key with >> max_events rows keeps an EXACT count but
    never materializes more than max_events rows in any aggregation
    buffer — the rank-cap happens before collect_list (plan-guarded:
    row_number window feeds the aggregate, and the executed plan carries
    no slice-after-collect)."""
    from alerta_spark.operators.threshold import grouped_events, threshold_alerts_fused

    n_hot = 5000
    df = spark.range(n_hot + 3).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < n_hot, "hot").otherwise("cold").alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    out = {
        r["value"]: r
        for r in grouped_events(df, "user_id", max_events=10).collect()
    }
    assert out["hot"]["count"] == n_hot  # exact, not capped
    assert len(out["hot"]["events"]) == 10  # capped
    assert [e.event_id for e in out["hot"]["events"]] == list(range(10))  # first by (ts,id)
    assert out["cold"]["count"] == 3 and len(out["cold"]["events"]) == 3

    plan = (
        grouped_events(df, "user_id", max_events=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "row_number()" in plan, plan
    assert "slice(" not in plan, plan  # no collect-then-slice

    # fused path: same guard, same exactness
    rules = [
        {"alert_name": "a", "criteria": "", "aggregation_key": "user_id",
         "threshold": 1}
    ]
    fused = {
        r["value"]: r
        for r in threshold_alerts_fused(df, rules, max_events=10).collect()
    }
    assert fused["hot"]["count"] == n_hot and len(fused["hot"]["events"]) == 10


def test_fused_rules_with_colliding_names_stay_separate(events):
    """Two rules sharing an alert_name (e.g. both defaulting to
    'unnamed') must not cross-contaminate: rule_idx is the slice key,
    so each fired group belongs to exactly one rule."""
    from alerta_spark.operators.threshold import (
        threshold_alerts,
        threshold_alerts_fused,
    )

    rules = [
        {
            # no alert_name -> shell default
            "criteria": "event_type='purchase'",
            "aggregation_key": "user_id",
            "threshold": 2,
        },
        {
            "criteria": "event_type='error'",
            "aggregation_key": "user_id",
            "threshold": 3,
        },
    ]
    fused = threshold_alerts_fused(events, rules).collect()
    by_idx = {}
    for r in fused:
        by_idx.setdefault(r["rule_idx"], set()).add((r["value"], r["count"]))
    for i, rule in enumerate(rules):
        seq = {
            (r.metadata.value, r.metadata["count"])
            for r in threshold_alerts(events, rule).collect()
        }
        assert by_idx.get(i, set()) == seq, f"rule {i} slice diverged"
