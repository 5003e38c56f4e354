"""Threshold alert trigger as one declarative DataFrame plan.

Rebuild of the reference path (alerta.py:428-478):
criteria scan (S1/F1-F6) → dedup anti-join (F8) → group-count on the
aggregation key (A1) → HAVING count >= threshold (A2) → per-group
event collection (A4/F7) + top-k sample (A5) → metadata struct (A6)
→ mustache summary + snippet rendering (C7).

One lazy plan per rule: Catalyst pushes the criteria into the parquet
scan, the group-count is a partial+final hash aggregate, rendering is
a codegen'd ``concat`` (no Python in the hot path). The per-group
event list is capped (``max_events_per_alert``) so a hot key cannot
OOM an executor at 100 TB — the reference caps implicitly via its
``limit 1000`` scan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from alerta_spark.dialect import trino_to_spark
from alerta_spark.paths import path_col
from alerta_spark.rules import threshold_shell
from alerta_spark.templates import template_col


def apply_criteria(df: DataFrame, criteria: str) -> DataFrame:
    """F1-F4/C1-C3: run a Trino-dialect WHERE fragment over the frame."""
    if not criteria:
        return df
    return df.where(F.expr(trino_to_spark(criteria)))


def _sort_cmp(a: Column, b: Column) -> Column:
    return (
        F.when(a["_o1"] < b["_o1"], F.lit(-1))
        .when(a["_o1"] > b["_o1"], F.lit(1))
        .when(a["_o2"] < b["_o2"], F.lit(-1))
        .when(a["_o2"] > b["_o2"], F.lit(1))
        .otherwise(F.lit(0))
    )


def grouped_events(
    df: DataFrame,
    aggregation_key: str,
    id_col: str = "event_id",
    ts_col: str = "ts",
    max_events: int = 1000,
) -> DataFrame:
    """A1+A4: group by the dotted key; count + ordered event collection.

    -> DataFrame[value: string, count: long, events: array<struct>]
    Events are ordered deterministically by (ts, id) and capped at
    `max_events` per group (skew guard).

    Shape: row_number over a (key) window caps each group BEFORE the
    collect, so a hot key never materializes more than ``max_events``
    rows in any aggregation buffer — the window sort spills to disk
    (UnsafeExternalSorter), collect_list buffers do not. The exact
    ``count`` rides the same exchange as a whole-partition window
    count, so the plan still has exactly one shuffle on the key.
    """
    key = path_col(df, aggregation_key).cast("string")
    event = F.struct(*[F.col(c) for c in df.columns])
    w_rank = Window.partitionBy("_k").orderBy(F.col("_o1").asc(), F.col("_o2").asc())
    w_all = Window.partitionBy("_k")
    ranked = (
        df.where(key.isNotNull())
        .select(
            key.alias("_k"),
            F.col(ts_col).alias("_o1"),
            F.col(id_col).alias("_o2"),
            event.alias("_e"),
        )
        .select(
            "*",
            F.row_number().over(w_rank).alias("_rn"),
            F.count(F.lit(1)).over(w_all).alias("_total"),
        )
    )
    tagged = F.struct(F.col("_o1"), F.col("_o2"), F.col("_e").alias("e"))
    return (
        ranked.where(F.col("_rn") <= max_events)
        .groupBy(F.col("_k").alias("value"))
        .agg(
            F.max("_total").alias("count"),
            F.array_sort(F.collect_list(tagged), _sort_cmp).alias("_tagged"),
        )
        .withColumn("events", F.expr("transform(_tagged, x -> x.e)"))
        .drop("_tagged")
    )


def assemble_alerts(
    fired: DataFrame,
    params: dict[str, Any],
    events_schema,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Turn fired groups [value, count, events] into alert documents.

    Renders ``summary`` then appends ``" " + event_snippet`` per sampled
    event (first ``event_sample_count``), exactly the reference's
    enrichment loop (alerta.py:453-458).

    ``carry`` names extra input columns to pass through UNCHANGED
    alongside the alert document (e.g. the multi-templated resume's
    composite join key) — they are routing metadata, not part of the
    document, so callers serializing the document must exclude them.
    """
    k = int(params.get("event_sample_count", 3) or 0)
    alert = fired.select(
        F.lit(params["alert_name"]).alias("alert_name"),
        F.lit(params["alert_type"]).alias("alert_type"),
        F.lit(params.get("severity", "INFO")).alias("severity"),
        F.lit(params.get("category", "general")).alias("category"),
        F.array([F.lit(t) for t in params.get("tags", [])]).cast("array<string>").alias("tags"),
        F.lit(params.get("criteria", "")).alias("criteria"),
        F.lit(params.get("aggregation_key", "")).alias("aggregation_key"),
        F.lit(int(params.get("threshold", 1))).alias("threshold"),
        F.lit(True).alias("triggered"),
        F.struct(
            F.col("value").alias("value"), F.col("count").alias("count")
        ).alias("metadata"),
        F.col("events"),
        F.lit(str(params.get("utctimestamp", ""))).alias("utctimestamp"),
        *[F.col(c) for c in carry],
    )
    # summary template renders against the whole alert DOCUMENT —
    # carry columns are routing metadata, not document fields
    import pyspark.sql.types as T

    doc_cols = [c for c in alert.columns if c not in carry]
    root = F.struct(*[F.col(c) for c in doc_cols])
    doc_schema = T.StructType([alert.schema[c] for c in doc_cols])
    summary = template_col(str(params.get("summary", "")), root, doc_schema)
    snippet_tmpl = str(params.get("event_snippet", "") or "")
    if k > 0:
        snips = F.transform(
            F.slice(F.col("events"), 1, k),
            lambda e: F.concat(F.lit(" "), template_col(snippet_tmpl, e, events_schema)),
        )
        summary = F.concat(summary, F.array_join(snips, ""))
    return alert.withColumn("summary", summary)


def threshold_alerts(
    df: DataFrame,
    params: dict[str, Any],
    alerted_ids: DataFrame | None = None,
    id_col: str = "event_id",
    ts_col: str = "ts",
    max_events: int = 1000,
) -> DataFrame:
    """Full threshold rule: one alert row per aggregation-key group
    whose event count >= threshold (per-group fan-out, alerta.py:438).
    """
    p = threshold_shell(params)
    ev = apply_criteria(df, p["criteria"])
    if alerted_ids is not None:
        from alerta_spark.operators.dedup import remove_previously_alerted

        ev = remove_previously_alerted(ev, alerted_ids, id_col=id_col)
    grouped = grouped_events(ev, p["aggregation_key"], id_col, ts_col, max_events)
    fired = grouped.where(F.col("count") >= int(p["threshold"]))
    return assemble_alerts(fired, p, ev.schema)


def threshold_alerts_fused(
    df: DataFrame,
    rules: list[dict[str, Any]],
    id_col: str = "event_id",
    ts_col: str = "ts",
    max_events: int = 1000,
) -> DataFrame:
    """N threshold rules in ONE pass — the scale upgrade over the
    reference's per-rule loop (alerta.py:481-515 re-scans the window
    for every rule; at 100 TB that is N corpus scans).

    Every rule's criteria and aggregation key are evaluated as columns
    in a single projection; a row emits one (rule_idx, key) struct per
    matching rule, exploded and aggregated by (rule_idx, value) — so
    the whole rule set costs ONE corpus scan and ONE exchange, with
    the criteria disjunction eligible for scan pushdown. Returns
    [rule_idx, alert_name, value, count, events] rows for every fired
    group (rendering stays per-rule: feed each slice to
    assemble_alerts). ``rule_idx`` is the unambiguous slice key — two
    rules may share an alert_name (e.g. both defaulting to 'unnamed'),
    and a name-keyed slice would emit each such group once PER rule
    with the wrong params for half of them.

    Equivalence with the sequential path is pytest-pinned
    (tests/test_threshold.py)."""
    shells = [threshold_shell(r) for r in rules]
    grouped = fused_grouped(df, shells, id_col, ts_col, max_events)
    thresholds = F.array(*[F.lit(int(p["threshold"])) for p in shells])
    names = F.array(*[F.lit(p["alert_name"]) for p in shells])
    return (
        grouped.where(
            F.col("count") >= F.element_at(thresholds, F.col("rule_idx") + 1)
        )
        .select(
            "rule_idx",
            F.element_at(names, F.col("rule_idx") + 1).alias("alert_name"),
            "value",
            "count",
            "events",
        )
    )


def fused_grouped(
    df: DataFrame,
    shells: list[dict[str, Any]],
    id_col: str = "event_id",
    ts_col: str = "ts",
    max_events: int = 1000,
    extra_preds: list[Column | None] | None = None,
    probe: DataFrame | None = None,
    composite_keys: list[list[str] | None] | None = None,
) -> DataFrame:
    """The shared one-scan/one-exchange core of rule fusion: evaluate
    every rule's criteria + aggregation key as columns, explode one
    (rule_idx, value) struct per matching rule, aggregate by
    (rule_idx, value) -> [rule_idx, value, count, events].

    ``composite_keys[i]`` (optional) replaces shell i's aggregation
    key with a COMPOSITE of several event paths, rendered as the JSON
    array string of the components (``paths.composite_key_col``;
    doc-side twin ``sequence_frames._composite_value`` — Jackson-
    parity hand encoder, NOT json.dumps, see the helper docstrings;
    byte parity test-pinned). The multi-templated
    sequence resume probes on this key: a slot criteria pinning N
    captured values groups by the N-tuple, so each captured composite
    yields exactly one group. NULL in any component nulls the key
    (the equality conjuncts it stands for cannot match NULL).

    ``extra_preds[i]`` (optional) is AND-ed onto shell i's criteria as
    a Column — callers with value-carrying predicates (the sequence
    resume's captured-value IN probe) build them with Column ops so
    captured values never round-trip through the SQL parser (a
    backslash in a string literal would be eaten as an escape).

    ``probe`` (optional) is the FRAME form of the same candidate cut:
    a DataFrame[rule_idx int, value string] semi-joined (broadcast)
    against the exploded rows BEFORE the window/aggregate — the
    per-rule captured values never pass through the driver or the
    plan as literals, so there is no plan-size cap on probe
    cardinality (in-flight state is bounded by rule x correlation
    values, well inside broadcast range)."""
    preds = [
        F.expr(trino_to_spark(p["criteria"]) or "true") if p["criteria"] else F.lit(True)
        for p in shells
    ]
    if extra_preds is not None:
        preds = [
            (p & e) if e is not None else p for p, e in zip(preds, extra_preds)
        ]
    from alerta_spark.paths import composite_key_col

    def _key(i: int, p: dict[str, Any]) -> Column:
        paths = composite_keys[i] if composite_keys is not None else None
        if paths is None:
            return path_col(df, p["aggregation_key"]).cast("string")
        return composite_key_col(df, paths)

    keys = [_key(i, p) for i, p in enumerate(shells)]
    matches = F.array(
        *[
            F.when(
                pred & key.isNotNull(),
                F.struct(F.lit(i).alias("rule_idx"), key.alias("value")),
            )
            for i, (pred, key) in enumerate(zip(preds, keys))
        ]
    )
    event = F.struct(*[F.col(c) for c in df.columns])
    tagged = df.select(
        F.col(ts_col).alias("_o1"),
        F.col(id_col).alias("_o2"),
        event.alias("e"),
        F.explode(F.filter(matches, lambda m: m.isNotNull())).alias("m"),
    )
    # Same hot-key guard as grouped_events: rank-cap per (rule, key)
    # BEFORE collecting, exact count from the whole-partition window —
    # one shuffle on (rule_idx, value), no unbounded agg buffer. The
    # keys are projected to plain columns FIRST so the window's output
    # partitioning satisfies the aggregate's requirement (grouping on
    # m.rule_idx directly re-extracts the field and costs a second
    # exchange).
    flat = tagged.select(
        F.col("m.rule_idx").alias("rule_idx"),
        F.col("m.value").alias("value"),
        "_o1",
        "_o2",
        "e",
    )
    if probe is not None:
        flat = flat.join(
            F.broadcast(
                probe.select(
                    F.col("rule_idx").cast("int").alias("rule_idx"),
                    F.col("value").cast("string").alias("value"),
                ).distinct()
            ),
            ["rule_idx", "value"],
            "left_semi",
        )
    w_rank = Window.partitionBy("rule_idx", "value").orderBy(
        F.col("_o1").asc(), F.col("_o2").asc()
    )
    w_all = Window.partitionBy("rule_idx", "value")
    ranked = flat.select(
        "*",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_total"),
    )
    row = F.struct(F.col("_o1"), F.col("_o2"), F.col("e"))
    grouped = (
        ranked.where(F.col("_rn") <= max_events)
        .groupBy("rule_idx", "value")
        .agg(
            F.max("_total").alias("count"),
            F.array_sort(F.collect_list(row), _sort_cmp).alias("_tagged"),
        )
        .withColumn("events", F.expr("transform(_tagged, x -> x.e)"))
        .drop("_tagged")
    )
    return grouped
