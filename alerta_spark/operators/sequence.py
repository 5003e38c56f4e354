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
