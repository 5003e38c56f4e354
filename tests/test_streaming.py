"""Structured Streaming semantics: sequence correlator, windowed
threshold, watermark dedup (SURVEY.md §2.7 T1-T7)."""

import json

import pytest

from pyspark.sql import functions as F

from alerta_spark.streaming.correlator import (
    sequence_correlator,
    streaming_dedup,
    streaming_threshold_alerts,
)

RULE = {
    "alert_name": "risky_seq",
    "alert_type": "sequence",
    "lifespan": "7 days",
    "slots": [
        {
            "alert_name": "s1",
            "alert_type": "threshold",
            "criteria": "source='onelogin' AND CAST(json_extract_scalar(details,'$.risk_score') as INTEGER)>80",
            "aggregation_key": "details.user_name",
            "threshold": 2,
        },
        {
            "alert_name": "s2",
            "alert_type": "threshold",
            "criteria": "source='onelogin' AND json_extract_scalar(details,'$.user_name')='{{slots.0.events.0.details.user_name}}'",
            "aggregation_key": "details.user_name",
            "threshold": 1,
        },
    ],
}


def _events(spark, rows):
    data = [
        {
            "event_id": i,
            "ts": f"2026-01-01 {h:02d}:00:00",
            "source": "onelogin",
            "details": json.dumps(d),
        }
        for i, (h, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(data)
    return df.withColumn("ts", F.to_timestamp("ts")).select(
        "event_id", "ts", "source", "details"
    )


def _run_stream(spark, events_df, builder, name):
    """Round-trip a batch frame through a real file-source stream."""
    import tempfile

    src = tempfile.mkdtemp(prefix="stream_src_")
    ck = tempfile.mkdtemp(prefix="stream_ck_")
    events_df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events_df.schema).parquet(src)
    out = builder(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_sequence_correlator_completes_per_key(spark):
    risky = lambda u, score=95: {"risk_score": str(score), "user_name": u}  # noqa: E731
    ev = _events(
        spark,
        [
            (0, risky("alice")),
            (1, risky("alice")),   # slot0 threshold=2 reached
            (2, risky("alice")),   # slot1 threshold=1 -> complete
            (3, risky("bob")),     # bob: only 1 slot0 match -> incomplete
            (4, risky("carol", score=10)),  # never matches slot0
        ],
    )
    out = _run_stream(
        spark,
        ev,
        lambda s: sequence_correlator(s, RULE, "details.user_name"),
        "seq_out",
    ).collect()
    done = {r["correlation_value"]: r for r in out}
    assert "alice" in done and done["alice"]["expired"] is False
    assert list(done["alice"]["slot_counts"]) == [2, 1]
    assert "bob" not in done and "carol" not in done


def test_sequence_correlator_batch_mode_same_result(spark):
    """The correlator is mode-agnostic: batch input gives the same
    completed sequences (timeout-driven paths aside)."""
    risky = lambda u: {"risk_score": "95", "user_name": u}  # noqa: E731
    ev = _events(spark, [(0, risky("a")), (1, risky("a")), (2, risky("a"))])
    rows = sequence_correlator(ev, RULE, "details.user_name").collect()
    assert len(rows) == 1 and rows[0]["correlation_value"] == "a"


def test_streaming_threshold_windowed(spark):
    ev = _events(
        spark,
        [
            (0, {"risk_score": "95", "user_name": "u1"}),
            (0, {"risk_score": "96", "user_name": "u1"}),
            (5, {"risk_score": "97", "user_name": "u1"}),  # different window
        ],
    )
    rule = {
        "alert_name": "risky_hour",
        "criteria": "CAST(json_extract_scalar(details,'$.risk_score') as INTEGER)>80",
        "aggregation_key": "details.user_name",
        "threshold": 2,
    }
    got = _run_stream(
        spark,
        ev,
        lambda s: streaming_threshold_alerts(s, rule, window="1 hour"),
        "thr_out",
    ).collect()
    assert len(got) == 1
    assert got[0]["metadata"]["count"] == 2


def test_streaming_dedup(spark):
    ev = _events(spark, [(0, {"x": 1}), (1, {"x": 2})])
    dup = ev.union(ev)
    got = _run_stream(spark, dup, lambda s: streaming_dedup(s), "dedup_out")
    assert got.count() == 2
