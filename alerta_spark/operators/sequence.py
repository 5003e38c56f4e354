"""Sequence correlation — the reference's flagship stateful operator,
batch mode (T3-T5 in SURVEY.md §2.7; reference alerta.py:210-317).

Semantics per micro-batch run:

1. resume every in-flight alert: find its first slot without
   ``triggered``; render the slot's criteria against the alert state
   (cross-slot templating like
   ``...='{{slots.0.events.0.details.user_name}}'``); evaluate the
   slot as a threshold (with F8/F9 dedup) or deadman trigger; on fire,
   write the filled slot back and upsert state.
2. start rules with a fresh shell the same way.
3. completed sequences (every slot has events) emit an alert and drop
   state; expired state (past ``expiration``) is reaped.

Scale notes. The heavy work — the slot scan + trigger — is a Spark
plan per (rule, slot); state documents are one per correlation value
and tiny, so driver-side orchestration over them is not a data-volume
bottleneck. The fan-out optimization for many in-flight alerts of the
same rule is implemented in :func:`slot_criteria_values`: alerts
waiting on the same slot differ only in their templated values, so one
scan with an IN-set/semi-join serves all of them. The fully
distributed version (state in Spark's state store, no driver loop) is
streaming/correlator.py.
"""

from __future__ import annotations

import json
from copy import deepcopy
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame

from alerta_spark.operators.deadman import deadman_alerts
from alerta_spark.operators.threshold import threshold_alerts
from alerta_spark.rules import sequence_shell, utcnow
from alerta_spark.state import DocStore
from alerta_spark.templates import render_py


def first_unfilled_slot(doc: dict[str, Any]) -> tuple[int | None, dict | None]:
    """First slot lacking 'triggered' (reference: utils/helpers.py:96-113
    via alerta.py:283-285)."""
    for i, slot in enumerate(doc.get("slots") or []):
        if "triggered" not in slot:
            return i, slot
    return None, None


def alerts_df_to_docs(alerts: DataFrame) -> list[dict[str, Any]]:
    """Collect an alert DataFrame as JSON documents (events included).

    Only called on *alert* frames — already aggregated, one row per
    fired group — never on raw event scans.
    """
    return [json.loads(s) for s in alerts.toJSON().collect()]


def process_sequence_alert(
    events_df: DataFrame,
    doc: dict[str, Any],
    inflight_store: DocStore,
    alert_store: DocStore,
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> None:
    """Advance one in-flight (or fresh) sequence alert by at most one
    slot (reference: alerta.py:274-317)."""
    doc = sequence_shell(doc)
    index, slot = first_unfilled_slot(doc)
    if slot is None:
        return

    # cross-slot templating: values captured by earlier slots become
    # literals in this slot's criteria (alerta.py:291)
    criteria = render_py(str(slot.get("criteria", "")), doc)
    params = dict(slot, criteria=criteria)

    fired_docs: list[dict[str, Any]] = []
    if slot.get("alert_type", "threshold") == "threshold":
        # F9 then F8 dedup, mirroring alerta.py:300-301
        dedup_ids = inflight_store.alerted_ids().unionByName(
            alert_store.alerted_ids()
        )
        fired = threshold_alerts(
            events_df, params, alerted_ids=dedup_ids, id_col=id_col, ts_col=ts_col
        )
        fired_docs = alerts_df_to_docs(fired)
    elif slot.get("alert_type") == "deadman":
        fired = deadman_alerts(events_df, params, id_col=id_col, ts_col=ts_col)
        fired_docs = alerts_df_to_docs(fired)

    # per-group fan-out: a FRESH rule (no _id) spawns one in-flight doc
    # per fired group; a RESUMED doc keeps its _id, so multiple fired
    # groups replace the same doc and the last one wins (reference
    # behavior: save_inflight_alert per group on the same _id,
    # alerta.py:304-316)
    updates = []
    for fired_doc in fired_docs:
        inflight = deepcopy(doc)
        inflight["slots"][index] = fired_doc
        updates.append(inflight)
    inflight_store.upsert_many(updates)


def create_sequence_alerts(inflight_store: DocStore, alert_store: DocStore) -> int:
    """Emit alerts for fully-slotted sequences, drop their state
    (reference: alerta.py:218-237). Returns number emitted.

    Batched: one append to the alerts table + one state overwrite for
    any number of completions (the reference pays two Mongo round-trips
    per completed sequence)."""
    completed, remaining = [], []
    for doc in inflight_store.docs():
        slots = doc.get("slots") or []
        if slots and all("events" in s for s in slots):
            doc = dict(doc)
            doc["summary"] = render_py(str(doc.get("summary", "")), doc)
            completed.append(doc)
        else:
            remaining.append(doc)
    if completed:
        alert_store.append(completed)
        inflight_store.overwrite(remaining)
    return len(completed)


def expire_sequence_alerts(inflight_store: DocStore, now: datetime | None = None) -> int:
    """Reap state past its expiration (reference: alerta.py:240-248)."""
    now = now or utcnow()
    kept, dropped = [], 0
    for doc in inflight_store.docs():
        exp = doc.get("expiration")
        try:
            exp_dt = datetime.fromisoformat(str(exp)) if exp else None
            if exp_dt is not None and exp_dt.tzinfo is None:
                exp_dt = exp_dt.replace(tzinfo=timezone.utc)
        except ValueError:
            exp_dt = None
        if exp_dt is not None and exp_dt < now:
            dropped += 1
        else:
            kept.append(doc)
    if dropped:
        inflight_store.overwrite(kept)
    return dropped


import re as _re

# templated equality conjunct shapes we can turn into a join key:
#   json_extract_scalar(col,'$.path') = '{{tmpl}}'
#   CAST(col AS STRING) = '{{tmpl}}'
#   col = '{{tmpl}}'
_TMPL_EQ = [
    (
        _re.compile(
            r"^\s*json_extract_scalar\(\s*(\w+)\s*,\s*'\$\.([\w.]+)'\s*\)\s*=\s*'\{\{([^{}]+)\}\}'\s*$",
            _re.IGNORECASE,
        ),
        lambda m: (f"{m.group(1)}.{m.group(2)}", m.group(3).strip()),
    ),
    (
        _re.compile(
            r"^\s*CAST\(\s*(\w+)\s+AS\s+\w+\s*\)\s*=\s*'\{\{([^{}]+)\}\}'\s*$",
            _re.IGNORECASE,
        ),
        lambda m: (m.group(1), m.group(2).strip()),
    ),
    (
        _re.compile(r"^\s*(\w+)\s*=\s*'\{\{([^{}]+)\}\}'\s*$"),
        lambda m: (m.group(1), m.group(2).strip()),
    ),
]


def compile_templated_criteria(criteria: str) -> tuple[str, str, str] | None:
    """Split a slot criteria into (static_conjuncts, event_key_path,
    state_template_path) when exactly one conjunct is a templated
    equality of a supported shape; None -> caller falls back to
    per-document rendering (SURVEY.md §7.4-1)."""
    from alerta_spark.streaming.correlator import _split_top_and
    from alerta_spark.templates import template_vars

    if not template_vars(criteria):
        return None
    conjuncts = [c.strip() for c in _split_top_and(criteria)]
    templated = [c for c in conjuncts if template_vars(c)]
    if len(templated) != 1:
        return None
    for rx, extract in _TMPL_EQ:
        m = rx.match(templated[0])
        if m:
            key_path, tmpl_path = extract(m)
            static = " AND ".join(c for c in conjuncts if not template_vars(c))
            return static, key_path, tmpl_path
    return None


def process_sequence_slot_batched(
    events_df: DataFrame,
    docs: list[dict[str, Any]],
    slot_index: int,
    inflight_store: DocStore,
    alert_store: DocStore,
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> list[dict[str, Any]] | None:
    """Advance MANY in-flight alerts waiting on the same slot with ONE
    Spark job: the templated equality becomes a semi-join of the slot
    scan against the captured state values, and fired groups route back
    to their documents by value. Returns the docs it could not batch
    (caller processes those per-document), or None when the slot shape
    is not batchable at all.

    Requires the slot's aggregation_key to equal the equality's event
    key path (true for the reference corpus: both key on the templated
    field), so one grouped aggregate serves every document.
    """
    from pyspark.sql import functions as F

    from alerta_spark.paths import path_col
    from alerta_spark.templates import _lookup

    slot = docs[0]["slots"][slot_index]
    if slot.get("alert_type", "threshold") != "threshold":
        return None
    compiled = compile_templated_criteria(str(slot.get("criteria", "")))
    if compiled is None:
        return None
    static, key_path, tmpl_path = compiled
    if str(slot.get("aggregation_key", "")) != key_path:
        return None

    value_to_doc: dict[str, dict] = {}
    leftover: list[dict] = []
    for doc in docs:
        v = _lookup(doc, [p for p in tmpl_path.split(".") if p])
        if v is None:
            leftover.append(doc)
        else:
            value_to_doc[str(v)] = doc

    if not value_to_doc:
        return leftover

    key = path_col(events_df, key_path).cast("string")
    candidates = events_df.where(key.isin(list(value_to_doc)))
    dedup_ids = inflight_store.alerted_ids().unionByName(alert_store.alerted_ids())
    params = dict(slot, criteria=static)
    fired = threshold_alerts(
        candidates, params, alerted_ids=dedup_ids, id_col=id_col, ts_col=ts_col
    )

    updates = []
    for fired_doc in alerts_df_to_docs(fired):
        doc = value_to_doc.get(str(fired_doc["metadata"]["value"]))
        if doc is None:
            continue
        inflight = deepcopy(sequence_shell(doc))
        inflight["slots"][slot_index] = fired_doc
        updates.append(inflight)
    inflight_store.upsert_many(updates)
    return leftover


def _filter_slice_events(slice_, extra_ids, thr: int, id_col: str):
    """Intra-pass F9 replay shared by the fused start/resume paths:
    drop events captured by EARLIER groups this pass from the
    collected sample, recompute the count exactly whenever the
    collection cap was not hit, re-apply the threshold.

    Shape: explode the (fired-groups-only, tiny) slice, broadcast
    anti-join on event id, regroup preserving the original (ts, id)
    array order via the carried position. A literal-array
    `array_contains` here is O(|captured ids|) PER EVENT — after one
    rule captures ~100k events the later rules' filters dominated the
    whole fused pass (measured 55s vs 21s sequential at sf0.1 x 10
    rules); the hash anti-join makes membership O(1)."""
    if not extra_ids:
        return slice_
    spark = slice_.sparkSession
    ids_df = spark.createDataFrame(
        [(x,) for x in sorted(extra_ids)], "alerted_event_id string"
    )
    return _filter_slice_events_frame(
        slice_, ids_df, thr, id_col, hint_broadcast=True
    )


def _filter_slice_events_frame(
    slice_, ids_df, thr: int, id_col: str, hint_broadcast: bool = False
):
    """Frame-based form of :func:`_filter_slice_events`: the captured
    ids arrive as DataFrame[alerted_event_id] instead of a driver set —
    the fused THRESHOLD pass builds them as a plan over the persisted
    fired frame (its emission never collects, so there is no driver
    set to pass), while the sequence paths (which collect fired docs
    anyway, for slot state) wrap their driver sets.

    ``hint_broadcast`` is set only by the driver-set wrapper: a set
    that already fits in driver memory is always broadcastable, while
    a plan-derived id frame is bounded by (fired groups x event cap) —
    unbounded in corpus size — so its join strategy stays AQE's call."""
    from pyspark.sql import functions as F

    ex = slice_.select(
        "value",
        "count",
        F.size("events").alias("_n0"),
        F.posexplode("events").alias("_pos", "_e"),
    )
    probe = F.broadcast(ids_df) if hint_broadcast else ids_df
    kept = ex.join(
        probe,
        ex["_e"][id_col].cast("string") == ids_df["alerted_event_id"],
        "left_anti",
    )
    regrouped = kept.groupBy("value", "count", "_n0").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("_pos").alias("p"), F.col("_e").alias("e"))
                )
            ),
            lambda x: x["e"],
        ).alias("events")
    )
    return regrouped.select(
        "value",
        F.when(
            F.col("count") == F.col("_n0"),
            F.size("events").cast("long"),
        )
        .otherwise(F.col("count"))
        .alias("count"),
        "events",
    ).where((F.col("count") >= thr) & (F.size("events") > 0))


def sequence_slots_fused_frame(
    events_df: DataFrame,
    slot_shells: list[dict[str, Any]],
    id_col: str = "event_id",
    ts_col: str = "ts",
    extra_preds: list | None = None,
) -> DataFrame:
    """The one-scan conditional-aggregate core of sequence-rule
    fusion: every fusable slot's criteria + aggregation key evaluated
    as columns of a single events projection, exploded and aggregated
    by (rule_idx, value) — N sequence rules cost ONE corpus scan and
    ONE exchange, exactly the :func:`~alerta_spark.operators.
    threshold.fused_grouped` shape threshold rules already use.
    Exposed separately so tests can plan-guard the single-scan
    property. -> [rule_idx, value, count, events]. ``extra_preds``
    passes per-slot Column predicates through to
    :func:`~alerta_spark.operators.threshold.fused_grouped` (the
    resume path's captured-value IN probes)."""
    from alerta_spark.operators.threshold import fused_grouped

    return fused_grouped(
        events_df, slot_shells, id_col, ts_col, extra_preds=extra_preds
    )


def sequence_resume_fused(
    events_df: DataFrame,
    groups: dict[tuple[str, int], list[dict[str, Any]]],
    inflight_store: DocStore,
    alert_store: DocStore,
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> tuple[list[tuple[tuple[str, int], list[dict]]], list[dict]]:
    """Advance MANY (rule, slot) groups of in-flight sequence alerts
    with ONE events scan — the cross-RULE fusion of
    :func:`process_sequence_slot_batched` (which already collapses the
    per-document fan-out within one group to one scan, but still costs
    one scan per group): each fusable group evaluates ``static`` as its
    criteria plus a Column-built probe
    ``path_col(key_path).cast("string").isin(<captured values>)`` —
    the *same* key column and isin the batched path uses, built with
    Column ops (never a SQL string literal, so captured values with
    backslashes or quotes probe exactly) — and all groups share one
    conditional-aggregate scan (:func:`sequence_slots_fused_frame`
    via ``extra_preds``). Fired groups route back to their documents
    by captured value; alert docs are assembled with the same
    (static-criteria) shell the batched path uses, so the written
    documents are identical.

    Returns ``(unfused_groups, stray_docs)``: groups whose slot shape
    isn't fusable (deadman slots, multi-templated criteria, key !=
    aggregation key, criteria that fail to parse) for the caller's
    per-group batched path, plus documents whose template value is
    missing for the per-document path.

    Intra-pass F9 replay: as in :func:`sequence_starts_fused`, events
    captured by earlier groups THIS pass are filtered from later
    groups' samples driver-side. Fusable groups process before
    unfused ones, so when groups' captures overlap ACROSS the
    fused/unfused boundary the pass order (not the result of any
    single group) can differ from the strict dict-order loop — same
    accepted divergence class as the fused threshold pass.
    """
    from pyspark.sql import functions as F

    from alerta_spark.dialect import trino_to_spark
    from alerta_spark.operators.dedup import remove_previously_alerted
    from alerta_spark.operators.threshold import assemble_alerts
    from alerta_spark.paths import path_col
    from alerta_spark.rules import threshold_shell
    from alerta_spark.templates import _lookup

    fusable: list[tuple[int, dict, Any, dict]] = []
    unfused: list[tuple[tuple[str, int], list[dict]]] = []
    stray: list[dict] = []
    for (name, idx), docs in groups.items():
        slot = docs[0]["slots"][idx]
        crit = str(slot.get("criteria", ""))
        compiled = compile_templated_criteria(crit)
        if (
            slot.get("alert_type", "threshold") != "threshold"
            or compiled is None
            or str(slot.get("aggregation_key", "")) != compiled[1]
        ):
            unfused.append(((name, idx), docs))
            continue
        static, key_path, tmpl_path = compiled
        value_to_doc: dict[str, dict] = {}
        group_stray: list[dict] = []
        for doc in docs:
            v = _lookup(doc, [p for p in tmpl_path.split(".") if p])
            if v is None:
                group_stray.append(doc)
            else:
                value_to_doc[str(v)] = doc
        stray.extend(group_stray)
        if not value_to_doc:
            continue
        try:
            # docs are assembled with the batched path's shell
            # (criteria = static only) so written documents are
            # byte-identical to it
            p_asm = threshold_shell(dict(slot, criteria=static))
            if static:
                # plan-time parse + resolve check; no job runs
                events_df.where(F.expr(trino_to_spark(static))).schema
            # the captured values probe the SAME compiled key column
            # the batched path semi-joins on — Column ops, not a SQL
            # literal, so backslashes/quotes in values never hit the
            # parser (and CAST-shaped templated conjuncts can't
            # diverge on non-canonical values)
            probe = (
                path_col(events_df, key_path)
                .cast("string")
                .isin(sorted(value_to_doc))
            )
        except Exception:
            unfused.append(((name, idx), docs))
            continue
        fusable.append((idx, p_asm, probe, value_to_doc))
    if not fusable:
        return unfused, stray

    dedup_ids = inflight_store.alerted_ids().unionByName(
        alert_store.alerted_ids()
    )
    ev = remove_previously_alerted(events_df, dedup_ids, id_col=id_col)
    grouped = sequence_slots_fused_frame(
        ev,
        [p for _, p, _, _ in fusable],
        id_col,
        ts_col,
        extra_preds=[pr for _, _, pr, _ in fusable],
    ).persist()
    try:
        extra_ids: set[str] = set()
        all_updates: list[dict] = []
        for i, (idx, p_asm, _probe, value_to_doc) in enumerate(fusable):
            thr = int(p_asm["threshold"])
            slice_ = grouped.where(
                (F.col("rule_idx") == i) & (F.col("count") >= thr)
            ).select("value", "count", "events")
            slice_ = _filter_slice_events(slice_, extra_ids, thr, id_col)
            fired_docs = alerts_df_to_docs(
                assemble_alerts(slice_, p_asm, ev.schema)
            )
            for fired_doc in fired_docs:
                doc = value_to_doc.get(str(fired_doc["metadata"]["value"]))
                if doc is None:
                    continue
                inflight = deepcopy(sequence_shell(doc))
                inflight["slots"][idx] = fired_doc
                all_updates.append(inflight)
                for evd in fired_doc.get("events") or []:
                    eid = evd.get(id_col)
                    if eid is not None:
                        extra_ids.add(str(eid))
        # ONE state write for the whole pass (a rewrite per rule made
        # N rules cost N table swaps; nothing between rules reads the
        # store — the F9 intra-pass interaction is the driver-side
        # extra_ids replay, and the dedup snapshot was taken above)
        inflight_store.upsert_many(all_updates)
    finally:
        grouped.unpersist()
    return unfused, stray


def sequence_starts_fused(
    events_df: DataFrame,
    rules: list[dict[str, Any]],
    inflight_store: DocStore,
    alert_store: DocStore,
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> list[dict[str, Any]]:
    """Start N fresh sequence rules with ONE events scan (the fusion
    upgrade the threshold/deadman families already have): each rule's
    first unfilled slot — template-free threshold slots only — joins
    one conditional-aggregate scan; fired groups spawn the same
    in-flight documents :func:`process_sequence_alert` writes, in the
    same per-rule order. Returns the rules it could NOT fuse (deadman
    slots, templated slot criteria, or criteria that fail to
    parse/resolve) — the caller runs those through the faithful
    per-rule path.

    Dedup: the store-level F8/F9 anti-join set is snapshotted once
    and applied inside the single scan; the SEQUENTIAL loop's
    intra-pass interaction — rule k's dedup also hides events captured
    by rules 1..k-1 of the same pass — is replayed driver-side over
    the persisted (tiny, post-aggregation) grouped frame, so alert
    documents match the per-rule loop exactly (pytest-pinned in
    tests/test_sequence.py). The one documented divergence: a group
    that hit the 1000-event collection cap AND overlaps an earlier
    rule's capture keeps the scan-time count (the uncollected tail is
    not re-checkable without a second scan).
    """
    from pyspark.sql import functions as F

    from alerta_spark.dialect import trino_to_spark
    from alerta_spark.operators.dedup import remove_previously_alerted
    from alerta_spark.operators.threshold import assemble_alerts
    from alerta_spark.paths import path_col
    from alerta_spark.rules import threshold_shell
    from alerta_spark.templates import template_vars

    fusable: list[tuple[dict, int, dict]] = []
    leftover: list[dict] = []
    for rule in rules:
        doc = sequence_shell(deepcopy(rule))
        idx, slot = first_unfilled_slot(doc)
        if slot is None:
            continue
        crit = str(slot.get("criteria", ""))
        if (
            slot.get("alert_type", "threshold") != "threshold"
            or template_vars(crit)
        ):
            leftover.append(rule)
            continue
        try:
            p = threshold_shell(dict(slot))
            if p["criteria"]:
                # plan-time parse + resolve check; no job runs
                events_df.where(
                    F.expr(trino_to_spark(p["criteria"]))
                ).schema
            path_col(events_df, p["aggregation_key"])
        except Exception:
            leftover.append(rule)
            continue
        fusable.append((doc, idx, p))
    if not fusable:
        return leftover

    dedup_ids = inflight_store.alerted_ids().unionByName(
        alert_store.alerted_ids()
    )
    ev = remove_previously_alerted(events_df, dedup_ids, id_col=id_col)
    grouped = sequence_slots_fused_frame(
        ev, [p for _, _, p in fusable], id_col, ts_col
    ).persist()
    try:
        extra_ids: set[str] = set()
        all_updates: list[dict] = []
        for i, (doc, idx, p) in enumerate(fusable):
            thr = int(p["threshold"])
            # dedup only ever REMOVES events, so a group passing the
            # threshold post-dedup necessarily passes pre-dedup — the
            # scan-side filter is a lossless candidate cut
            slice_ = grouped.where(
                (F.col("rule_idx") == i) & (F.col("count") >= thr)
            ).select("value", "count", "events")
            # intra-pass F9 (sequential-loop semantics): drop events
            # captured by EARLIER rules this pass
            slice_ = _filter_slice_events(slice_, extra_ids, thr, id_col)
            fired_docs = alerts_df_to_docs(
                assemble_alerts(slice_, p, ev.schema)
            )
            for fired_doc in fired_docs:
                inflight = deepcopy(doc)
                inflight["slots"][idx] = fired_doc
                all_updates.append(inflight)
                for evd in fired_doc.get("events") or []:
                    eid = evd.get(id_col)
                    if eid is not None:
                        extra_ids.add(str(eid))
        # ONE state write for the whole pass (see sequence_resume_fused)
        inflight_store.upsert_many(all_updates)
    finally:
        grouped.unpersist()
    return leftover
