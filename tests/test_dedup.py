"""Dedup anti-joins vs alert history incl. sequence slots
(reference: tests/test_alerts.py:114-181)."""

from pyspark.sql import functions as F

from alerta_spark.operators.dedup import alerted_event_ids, remove_previously_alerted


_ALERTS_SCHEMA = (
    "alert_name string, "
    "events array<struct<event_id:string>>, "
    "slots array<struct<events:array<struct<event_id:string>>>>"
)


def _alerts_df(spark):
    return spark.createDataFrame(
        [
            ("a1", [("1",), ("2",)], []),
            ("seq", [], [([("3",)],), ([("4",), ("5",)],)]),
        ],
        schema=_ALERTS_SCHEMA,
    )


def test_ids_from_events_and_slots(spark):
    ids = alerted_event_ids(_alerts_df(spark))
    got = sorted(r["alerted_event_id"] for r in ids.collect())
    assert got == ["1", "2", "3", "4", "5"]


def test_anti_join_removes_all_alerted(spark):
    events = spark.createDataFrame(
        [{"event_id": str(i), "x": i} for i in range(8)]
    )
    out = remove_previously_alerted(events, alerted_event_ids(_alerts_df(spark)))
    got = sorted(r["event_id"] for r in out.collect())
    assert got == ["0", "6", "7"]


def test_plan_has_no_forced_broadcast(spark):
    """The alert history is UNBOUNDED by construction (the reference
    probes all prior alerts), so the anti-join must not carry a
    mandatory broadcast hint — AQE broadcasts a small id set at
    runtime and degrades gracefully past the limit, where a hint would
    hard-fail. Guard: no ResolvedHint in the analyzed plan (runtime
    strategy stays the optimizer's choice)."""
    events = spark.createDataFrame([{"event_id": "1"}])
    out = remove_previously_alerted(events, alerted_event_ids(_alerts_df(spark)))
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    # semantics unchanged: the join is still the left_anti equi-join
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in physical


def test_mostcommon_order(events):
    from alerta_spark.operators.mostcommon import most_common

    rows = most_common(events, "event_type").collect()
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    total = sum(counts)
    assert total == events.where(F.col("event_type").isNotNull()).count()


def test_slot_ids_survive_an_unfilled_null_slot(spark):
    """Spark's flatten returns NULL for the whole row when ANY nested
    array is NULL: one unfilled slot (events=NULL) used to erase every
    captured id on the document, letting captured events re-fire."""
    df = spark.createDataFrame(
        [("seq", [], [([("7",), ("8",)],), (None,)])],
        schema=_ALERTS_SCHEMA,
    )
    got = sorted(r["alerted_event_id"] for r in alerted_event_ids(df).collect())
    assert got == ["7", "8"]
