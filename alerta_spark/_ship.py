"""Executor package shipping.

Operators built on pandas UDFs / applyInPandas reference this package
from closures, so executor Python workers must be able to import
``alerta_spark`` regardless of the driver's cwd or PYTHONPATH. Every
such operator calls :func:`ensure_shipped` once; it zips the package
and registers it via ``SparkContext.addPyFile`` (a no-op after the
first call per session).
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[str] = set()


def ensure_shipped(spark: SparkSession) -> None:
    # Key on the JVM application id, not id(sparkContext): the Python
    # wrapper can be re-created (and a CPython id() re-used) within one
    # JVM app, and a second addPyFile crashes if the package source
    # changed on disk in between ("exists and does not match").
    key = spark.sparkContext.applicationId
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_base = Path(tempfile.mkdtemp(prefix="alerta_spark_pkg_")) / "alerta_spark"
    archive = shutil.make_archive(
        str(zip_base), "zip", root_dir=str(pkg_dir.parent), base_dir=pkg_dir.name
    )
    spark.sparkContext.addPyFile(archive)
    _SHIPPED_SESSIONS.add(key)
