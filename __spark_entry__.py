"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship threshold-alert query at sf0.001.
``queries()`` / ``oracle_sql()`` expose the operator catalog
(alerta_spark/plans/catalog.py) — one entry per implemented operator
from SURVEY.md §2, each with equivalent DuckDB SQL where the semantics
are SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from alerta_spark.plans import catalog  # noqa: E402


def _prepare(spark: SparkSession) -> None:
    # testdata parquet carries TIMESTAMP(NANOS); the source layer
    # converts, but the session must read them as longs first.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # ship the package to executors: the driver may run this module
    # from any cwd, and Python workers (pandas UDF paths) need to
    # import alerta_spark. MUST go through the package's single
    # shipping guard — a second addPyFile of the same archive NAME
    # crashes the app if the source tree changed on disk in between
    # ("exists and does not match contents"), so exactly one zip may
    # ever be added per JVM application.
    from alerta_spark._ship import ensure_shipped

    ensure_shipped(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the big_purchases threshold rule end-to-end
    (criteria scan → group-count → HAVING → event collection → mustache
    render) on /root/testdata/sf0.001."""
    _prepare(spark)
    from alerta_spark.operators.threshold import threshold_alerts
    from alerta_spark.sources.lake import load_events

    ev = load_events(spark, "/root/testdata/sf0.001")
    alerts = threshold_alerts(ev, catalog.BIG_PURCHASES_RULE)
    # project a stable, array-free schema for the smoke check
    from pyspark.sql import functions as F

    return alerts.select(
        "alert_name",
        "severity",
        "category",
        F.col("metadata.value").alias("agg_value"),
        F.col("metadata.count").alias("n_events"),
        "summary",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name, fn in catalog.queries().items():
        def wrapped(spark, sf_dir, _fn=fn):
            _prepare(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
