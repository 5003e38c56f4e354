"""Deadman (absence) alert trigger.

Rebuild of ``determine_deadman_trigger`` (alerta.py:358-410): fire when
a group's event count is <= threshold, INCLUDING when the scan returns
nothing at all — the empty-input case synthesizes a zero-count group
``(aggregation_key, 0)`` (alerta.py:384-386) so the alert still fires.

Spark shape: the same grouped aggregate as threshold, HAVING count <=
T, unioned with a literal default row that survives only when the
aggregate is empty (left_anti against the aggregate's first row — a
tiny driver-free existence check; the aggregate output is bounded by
group cardinality, not scan size).

Note the reference's synthesized meta-event (alerta.py:372-382) never
reaches ``alert["events"]`` because its details lack the aggregation
key, so the faithful output is an empty events array.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alerta_spark.operators.threshold import (
    apply_criteria,
    assemble_alerts,
    grouped_events,
)
from alerta_spark.rules import deadman_shell


def deadman_alerts(
    df: DataFrame,
    params: dict[str, Any],
    id_col: str = "event_id",
    ts_col: str = "ts",
    max_events: int = 1000,
) -> DataFrame:
    """One alert row per group with count <= threshold; if no group
    exists at all, a synthesized (aggregation_key, 0) row fires.

    No dedup on the deadman path (reference parity, alerta.py:413-425).
    """
    p = deadman_shell(params)
    ev = apply_criteria(df, p["criteria"])
    grouped = grouped_events(ev, p["aggregation_key"], id_col, ts_col, max_events)

    events_type = grouped.schema["events"].dataType
    spark = df.sparkSession
    synthesized = spark.range(1).select(
        F.lit(str(p["aggregation_key"])).alias("value"),
        F.lit(0).cast("long").alias("count"),
        # empty array directly (as deadman_alerts_fused builds it) —
        # a NULL-then-coalesce indirection implied a NULL-surviving
        # path that never existed
        F.array().cast(events_type).alias("events"),
    )
    # keep the synthesized row only when the aggregate produced nothing
    marker = grouped.select(F.lit(1).alias("_one")).limit(1)
    synthesized = synthesized.join(marker, F.lit(True), "left_anti")

    fired = grouped.where(F.col("count") <= int(p["threshold"])).unionByName(
        synthesized
    )
    return assemble_alerts(fired, p, ev.schema)


def deadman_alerts_fused(
    df: DataFrame,
    rules: list[dict[str, Any]],
    id_col: str = "event_id",
    ts_col: str = "ts",
    max_events: int = 1000,
) -> DataFrame:
    """N deadman (absence) rules in ONE corpus scan — the fusion
    symmetry of threshold_alerts_fused: shared (rule, key) tagged
    aggregate, HAVING count <= each rule's threshold, and the
    empty-input synthesis done PER RULE (a rule whose criteria matched
    nothing anywhere still fires its (aggregation_key, 0) row, found
    by anti-joining the tiny rule list against the rule_idxs present
    in the aggregate — bounded by |rules|, never scan-sized).

    Returns [rule_idx, alert_name, value, count, events] (rule_idx is
    the unambiguous slice key — alert_names can collide); per-rule
    equivalence with :func:`deadman_alerts` is pytest-pinned.
    """
    from alerta_spark.operators.threshold import fused_grouped
    from alerta_spark.rules import deadman_shell

    shells = [deadman_shell(r) for r in rules]
    grouped = fused_grouped(df, shells, id_col, ts_col, max_events)
    thresholds = F.array(*[F.lit(int(p["threshold"])) for p in shells])
    names = F.array(*[F.lit(p["alert_name"]) for p in shells])
    events_type = grouped.schema["events"].dataType

    fired = grouped.where(
        F.col("count") <= F.element_at(thresholds, F.col("rule_idx") + 1)
    ).select("rule_idx", "value", "count", "events")

    spark = df.sparkSession
    all_rules = spark.createDataFrame(
        [(i, str(p["aggregation_key"])) for i, p in enumerate(shells)],
        "rule_idx int, agg_key string",
    )
    present = grouped.select("rule_idx").distinct()
    synthesized = (
        all_rules.join(present, "rule_idx", "left_anti")
        .select(
            "rule_idx",
            F.col("agg_key").alias("value"),
            F.lit(0).cast("long").alias("count"),
            F.array().cast(events_type).alias("events"),
        )
    )
    return (
        fired.unionByName(synthesized)
        .select(
            "rule_idx",
            F.element_at(names, F.col("rule_idx") + 1).alias("alert_name"),
            "value",
            "count",
            "events",
        )
    )
