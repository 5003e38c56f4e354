"""Alert-history / in-flight dedup as broadcast anti-joins.

The reference suppresses re-alerting by probing Mongo once per
candidate event (``remove_previously_alerted`` alerta.py:38-57,
``remove_inflight_events`` alerta.py:60-73) — O(N) network round
trips. The Spark-native design is a single ``left_anti`` equi-join
against the distinct set of already-alerted event ids, broadcast to
every executor (the alerted-id set is tiny relative to the scan).

Alerted ids live in two places in an alert document: ``events[]`` and
``slots[].events[]`` (sequence alerts) — both are covered, mirroring
the reference's ``$or``/``$elemMatch`` Mongo query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def alerted_event_ids(alerts: DataFrame, id_field: str = "event_id") -> DataFrame:
    """Distinct event ids captured in prior alerts.

    -> DataFrame[alerted_event_id: string]
    """
    parts = []
    cols = set(alerts.columns)
    if "events" in cols:
        parts.append(
            alerts.select(F.explode(F.col(f"events.{id_field}")).alias("_id")).select(
                F.col("_id").cast("string").alias("alerted_event_id")
            )
        )
    if "slots" in cols:
        parts.append(
            alerts.select(
                F.explode(
                    F.flatten(F.transform("slots", lambda s: s["events"][id_field]))
                ).alias("_id")
            ).select(F.col("_id").cast("string").alias("alerted_event_id"))
        )
    if not parts:
        raise ValueError("alerts frame has neither 'events' nor 'slots'")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("alerted_event_id").isNotNull()).distinct()


def remove_previously_alerted(
    events: DataFrame, alerted_ids: DataFrame, id_col: str = "event_id"
) -> DataFrame:
    """Drop events already captured by an alert (broadcast anti-join)."""
    ids = F.broadcast(alerted_ids.select(F.col("alerted_event_id")))
    return events.join(
        ids, events[id_col].cast("string") == ids["alerted_event_id"], "left_anti"
    )
