"""SparkSession factory tuned for the engine.

Local-mode testing uses local[N]; the same config block is what we'd
ship to a 1000-executor cluster (AQE on, sensible shuffle partitioning,
Arrow enabled for the pandas-UDF slow path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "alerta_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata parquet carries TIMESTAMP(NANOS); read as long and
        # convert in the source layer (see sources.lake.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # reliable-checkpoint mode (ckpt.py) writes checkpoint files
        # every engine pass; without the cleaner Spark never deletes
        # them and the dir grows per tick. Context-start conf, so it
        # must be set HERE, not at runtime.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # WindowExec's "No Partition Defined" warning cannot be silenced
    # per-site on Spark 4.x: Catalyst folds constant partition keys
    # (partitionBy(F.lit(0))) out of the window spec before the check
    # runs. Every unpartitioned window in this repo is a deliberate,
    # bounded-domain frame (distinct-cents / day / hour / 24-row /
    # num_partitions spines — each commented at the site), and the
    # enforcement mechanism is tools/window_audit.py + the allowlist
    # pin in tests/test_plans.py, which catch ACCIDENTAL global
    # windows far more reliably than a log line ever did. So the
    # logger drops to ERROR here, once, with this paper trail.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 logging backend: keep the warning, not a crash
    return spark
