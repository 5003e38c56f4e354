"""Checkpoint routing for the alerting tier.

Engine passes truncate lineage on small fired/state frames before
store writes (scan errors must surface inside the per-rule swallow,
store errors outside it — see engine.run_once). ``localCheckpoint``
is the right default: executor-local blocks, no configuration, same
cost class as a persist. Its documented hazard is cluster-only —
blocks are UNREPLICATED, so losing an executor between the checkpoint
and the store write fails the pass (recoverable: the next cron tick
replays, and F8 dedup makes the replay idempotent).

Deployments that cannot tolerate a failed pass opt into RELIABLE
checkpointing with two standard Spark knobs::

    spark.sparkContext.setCheckpointDir("hdfs://.../alerta-ckpt")
    spark.conf.set("spark.alerta.reliableCheckpoint", "true")

Every alerting-tier truncation then routes through ``DataFrame
.checkpoint`` (persisted to the fault-tolerant checkpoint dir, so the
frame survives executor loss). The conf is read per call — it is
runtime-settable and scoped to the session, so tests and mixed
workloads can flip it without touching process-global state. An
explicit conf (not dir-presence sniffing) because a checkpoint dir
configured for some other consumer must not silently change the
engine's durability/latency trade.

Analytics ops (``ops/dedupe.dup_clusters`` etc.) deliberately stay on
``localCheckpoint``: they are bounded-round batch jobs whose docstrings
document recompute-on-loss as acceptable; durability there buys
nothing a retry doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.alerta.reliableCheckpoint"


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint()`` when the
    session opts in via ``spark.alerta.reliableCheckpoint=true``,
    ``localCheckpoint()`` otherwise (the local-mode/default path)."""
    spark = df.sparkSession
    if str(spark.conf.get(RELIABLE_CONF, "false")).lower() == "true":
        if spark.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                f"{RELIABLE_CONF}=true requires a checkpoint directory: "
                "call spark.sparkContext.setCheckpointDir(<fault-tolerant "
                "path>) before running the engine"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
