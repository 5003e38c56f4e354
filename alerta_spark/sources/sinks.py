"""Alert / state sinks.

The reference persists alerts and in-flight sequence state to MongoDB
(save_alert alerta.py:76-89, save_inflight_alert alerta.py:92-111).
Here both are parquet tables (Delta-shaped API: append for alerts,
read-modify-write for the small state table). The alerts table doubles
as the dedup input for the next run (F8), so every write must carry
``events[].event_id`` (and ``slots[].events[].event_id``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alerta_spark.rules import generate_meteor_id


def save_alerts(alerts: DataFrame, path: str) -> None:
    """S7: append finished alerts, stamping id + epoch like the
    reference (meteor _id, utctimestamp, utcepoch; alerta.py:76-89)."""
    stamped = alerts
    if "_id" not in alerts.columns:
        stamped = stamped.withColumn(
            "_id", F.lower(F.substring(F.replace(F.expr("uuid()"), F.lit("-"), F.lit("")), 1, 24))
        )
    if "utcepoch" not in alerts.columns:
        src = F.col("utctimestamp") if "utctimestamp" in alerts.columns else F.current_timestamp()
        stamped = stamped.withColumn("utcepoch", F.unix_timestamp(F.to_timestamp(src)))
    stamped.write.mode("append").parquet(path)


def stream_alerts(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    query_name: str = "alerts_sink",
    available_now: bool = True,
):
    """S7 under Structured Streaming: persist alert rows from a
    streaming frame (streaming_threshold_alerts / sequence_correlator
    output) into the alerts table via ``foreachBatch`` -> append.

    The checkpoint makes batch ids stable across restarts; parquet
    append itself is not transactional, so a crash between write and
    checkpoint commit can duplicate one micro-batch — the reference has
    the same at-least-once storage semantics (Mongo insert + eventid
    dedup on the next scan, alerta.py:38-57), and F8's anti-join
    absorbs duplicates downstream. On a transactional table format the
    same foreachBatch body becomes exactly-once.

    Returns the started StreamingQuery (caller awaits termination).
    """
    writer = (
        stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .foreachBatch(lambda batch, _id: save_alerts(batch, path))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def load_alerts(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return None
    return spark.read.parquet(path)


def new_id() -> str:
    return generate_meteor_id()
