"""Measure the STREAMING correlator's in-flight-cardinality axis: batch
duration, state-store rows, and emitted completions as the number of
correlation KEYS grows 1x/3x/10x.

Why this axis: the batch engine has measured emission/sequence/payload
curves (tools/alert_scale_bench.py), but the streaming correlator
(streaming/correlator.py sequence_correlator) kept only correctness
pins — and streaming scale bugs hide exactly in state-size behavior
(round 7's find: an id-keyed dropDuplicates that NEVER evicted state).
This instrument records how the state store and batch time respond to
key cardinality so a regression in either shows up as an exponent, not
an anecdote.

Corpus shape per scale g: g correlation keys, each with two slot-0
matching events (slot-0 threshold 2); EVEN keys get a third event that
fires slot 1 -> half the keys complete (emit + state cleared), half
remain in-flight (state rows after the drain == g/2). Events are
generated DISTRIBUTED (spark.range -> explode), written to parquet,
and replayed through a real file-source stream under
trigger(availableNow) into a memory sink.

Usage:  python tools/streaming_scale_bench.py [--keys 2000,6000,20000]
Merges results into SCALE_BENCH.json under engine_streaming_correlator
(same merge discipline as the other scale tools — never clobber).
"""

from __future__ import annotations

import json
import math
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent

RULE = {
    "alert_name": "scale_seq",
    "alert_type": "sequence",
    "lifespan": "7 days",
    "slots": [
        {
            "alert_name": "s1",
            "alert_type": "threshold",
            "criteria": (
                "source='onelogin' AND CAST(json_extract_scalar("
                "details,'$.risk_score') as INTEGER)>80"
            ),
            "aggregation_key": "details.user_name",
            "threshold": 2,
        },
        {
            "alert_name": "s2",
            "alert_type": "threshold",
            "criteria": (
                "source='onelogin' AND json_extract_scalar("
                "details,'$.user_name')="
                "'{{slots.0.events.0.details.user_name}}'"
            ),
            "aggregation_key": "details.user_name",
            "threshold": 1,
        },
    ],
}


# COMPOSITE axis (round 11): the round-10 BUILD commits added
# composite correlation keys (a slot whose templated criteria pin TWO
# captured paths keys state by the composite of both) with correctness
# pins but no scale axis. This rule's slot 1 templates user_name AND
# tenant, so the correlator must key by the composite pair — the
# measurement shows whether the composite rendering (JSON-array string
# key) changes the state-size/batch-time curve vs the single-key axis.
COMPOSITE_RULE = {
    "alert_name": "scale_seq_composite",
    "alert_type": "sequence",
    "lifespan": "7 days",
    "slots": [
        {
            "alert_name": "s1",
            "alert_type": "threshold",
            "criteria": (
                "source='onelogin' AND CAST(json_extract_scalar("
                "details,'$.risk_score') as INTEGER)>80"
            ),
            "aggregation_key": "details.user_name",
            "threshold": 2,
        },
        {
            "alert_name": "s2",
            "alert_type": "threshold",
            "criteria": (
                "source='onelogin' AND json_extract_scalar("
                "details,'$.user_name')="
                "'{{slots.0.events.0.details.user_name}}' AND "
                "json_extract_scalar(details,'$.tenant')="
                "'{{slots.0.events.0.details.tenant}}'"
            ),
            "aggregation_key": "details.user_name",
            "threshold": 1,
        },
    ],
}


def _events(spark, keys: int, with_tenant: bool = False):
    """keys x {2,3} onelogin events, one distinct user per key,
    generated distributed. Even keys carry the third (completing)
    event; odd keys stay in-flight after slot 0 fills. With
    ``with_tenant`` each key also carries a per-key tenant field (the
    second component of the composite correlation key)."""
    from pyspark.sql import functions as F

    base = spark.range(keys).select(F.col("id").alias("k"))
    n_ev = F.when(F.col("k") % 2 == 0, F.lit(3)).otherwise(F.lit(2))
    ex = base.select(
        "k", F.explode(F.sequence(F.lit(0), n_ev - 1)).alias("j")
    )
    fields = [
        F.concat(F.lit("u"), F.col("k").cast("string")).alias("user_name"),
        F.lit("95").alias("risk_score"),
    ]
    if with_tenant:
        fields.append(
            F.concat(F.lit("t"), F.col("k").cast("string")).alias("tenant")
        )
    details = F.to_json(F.struct(*fields))
    return ex.select(
        (F.col("k") * 3 + F.col("j")).alias("event_id"),
        F.expr(
            "timestamp'2026-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, 0, 0, k * 3 + j)"
        ).alias("ts"),
        F.lit("onelogin").alias("source"),
        details.alias("details"),
    )


def _drain(spark, events_df, name: str, rule=None, corr_key=None):
    """File-source -> sequence_correlator -> memory sink under
    availableNow; returns (wall_sec, progresses).

    Spark does not self-terminate an availableNow query while un-fired
    state timers remain armed (the 7-day lifespan arms one per key), so
    the drain stops on the idle signal — but only AFTER the cumulative
    input-row count reaches the corpus size: a zero-input progress
    observed before the data batches commit must not end the
    measurement early (it would silently merge a partial drain into
    SCALE_BENCH.json)."""
    from alerta_spark.streaming.correlator import sequence_correlator

    expected = events_df.count()
    src = tempfile.mkdtemp(prefix="sb_src_")
    ck = tempfile.mkdtemp(prefix="sb_ck_")
    events_df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events_df.schema).parquet(src)
    out = sequence_correlator(
        stream, rule or RULE, corr_key or "details.user_name"
    )
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 600
    while q.isActive and time.time() < deadline:
        q.awaitTermination(2)
        lp = q.lastProgress
        seen = sum(p.numInputRows for p in q.recentProgress)
        if lp and lp["numInputRows"] == 0 and seen >= expected:
            q.stop()
            break
    q.awaitTermination(30)
    wall = round(time.perf_counter() - t0, 3)
    return wall, [json.loads(p.json) for p in q.recentProgress]


def main() -> None:
    key_scales = [2000, 6000, 20000]
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a.startswith("--keys="):
            key_scales = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a == "--keys" and i + 1 < len(args):
            key_scales = [int(x) for x in args[i + 1].split(",")]

    import os

    from alerta_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "") or str(os.cpu_count() or 8)
    spark = get_spark(
        "alerta-streaming-scale-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    import resource

    def _rss_mb() -> float:
        return round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        )

    axes = [
        ("engine_streaming_correlator", None, None, False),
        # composite correlation key (two templated paths -> state keyed
        # by the JSON-array rendering of both): the round-10 composite
        # commits' missing scale axis
        (
            "engine_streaming_correlator_composite@extreme",
            COMPOSITE_RULE,
            ["details.user_name", "details.tenant"],
            True,
        ),
    ]
    only = [a.split("=", 1)[1] for a in args if a.startswith("--axis=")]
    if only:
        axes = [x for x in axes if any(o in x[0] for o in only)]
    results: dict[str, dict] = {}
    # warm: JVM, file-stream machinery, python workers
    _drain(spark, _events(spark, 50), "sb_warm")

    for key, rule, corr_key, with_tenant in axes:
        results[key] = {}
        for g in key_scales:
            qname = f"sb_{key.split('@')[0][-9:]}_{g}".replace("-", "_")
            wall, progs = _drain(
                spark,
                _events(spark, g, with_tenant=with_tenant),
                qname,
                rule=rule,
                corr_key=corr_key,
            )
            emitted = spark.sql(
                f"SELECT count(*) c FROM {qname}"
            ).collect()[0]["c"]
            # last progress that actually processed rows carries the
            # state operator's row count after commit
            state_rows, batch_ms = None, None
            for p in progs:
                if p.get("numInputRows", 0) > 0 and p.get("stateOperators"):
                    state_rows = p["stateOperators"][0].get("numRowsTotal")
                    batch_ms = p.get("batchDuration")
            results[key][str(g)] = {
                "sec": wall,
                "batch_ms": batch_ms,
                "emitted": int(emitted),
                "state_rows_after": state_rows,
                "keys": g,
                "driver_rss_mb": _rss_mb(),
            }
            print(
                f"{key} keys={g:<7} wall={wall:>7.2f}s batch={batch_ms}ms "
                f"emitted={emitted} state_rows={state_rows} rss={_rss_mb()}MB"
            )

        lo, hi = str(key_scales[0]), str(key_scales[-1])
        r = results[key]
        if lo != hi and lo in r and hi in r and r[lo]["sec"] > 0:
            span = math.log(int(hi) / int(lo))
            r["time_exponent"] = round(
                math.log(r[hi]["sec"] / r[lo]["sec"]) / span, 2
            )
            if r[lo]["state_rows_after"]:
                r["state_rows_exponent"] = round(
                    math.log(
                        max(r[hi]["state_rows_after"], 1)
                        / r[lo]["state_rows_after"]
                    )
                    / span,
                    2,
                )

        import datetime as _dt

        r["measured_at"] = _dt.datetime.now(_dt.timezone.utc).isoformat(
            timespec="seconds"
        )
    out_path = REPO / "SCALE_BENCH.json"
    record = {"base": "synthetic alert-cardinality corpus", "results": {}}
    if out_path.exists():
        record = json.loads(out_path.read_text())
        record.setdefault("results", {})
    record["results"].update(results)
    out_path.write_text(json.dumps(record, indent=1))
    print(f"wrote {out_path}")
    print(
        f"{key:<28} time_exp={r.get('time_exponent')} "
        f"state_rows_exp={r.get('state_rows_exponent')}"
    )


if __name__ == "__main__":
    main()
