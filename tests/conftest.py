from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Dev-sandbox protobuf shim (tools/pyshim/sitecustomize.py): makes the
# transformWithStateInPandas protocol importable where no protobuf
# distribution is installable. Two delivery channels, both no-ops when a
# real protobuf exists: (1) execute it here for the DRIVER process;
# (2) prepend it to PYTHONPATH BEFORE the spark fixture launches the
# JVM, so Spark's Python WORKERS (separate processes) auto-import it as
# their sitecustomize.
_PYSHIM = Path(__file__).resolve().parent.parent / "tools" / "pyshim"
try:
    _spec = importlib.util.spec_from_file_location(
        "_alerta_pbshim", _PYSHIM / "sitecustomize.py"
    )
    _mod = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    os.environ["PYTHONPATH"] = (
        str(_PYSHIM) + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
except Exception:
    pass

from alerta_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("alerta-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def events(spark):
    from alerta_spark.sources.lake import load_events

    return load_events(spark, SF_DIR)


@pytest.fixture()
def cloudtrail_events(spark):
    """Golden fixture shaped like the reference's cloudtrail sample
    (tests/samples/sample_cloudtrail_login_no_mfa.json): two root
    ConsoleLogin events, JSON-string payload."""
    import json

    rows = []
    for i, ip in enumerate(["6.9.9.93", "6.9.9.93"]):
        rows.append(
            {
                "event_id": i,
                "ts": f"2026-01-01 00:0{i}:00",
                "source": "cloudtrail",
                "details": json.dumps(
                    {
                        "eventname": "ConsoleLogin",
                        "useridentity": {"type": "Root", "arn": "arn:aws:iam::123:root"},
                        "sourceipaddress": ip,
                        "recipientaccountid": "123456789012",
                    }
                ),
            }
        )
    df = spark.createDataFrame(rows)
    from pyspark.sql import functions as F

    return df.withColumn("ts", F.to_timestamp("ts")).select(
        "event_id", "ts", "source", "details"
    )
