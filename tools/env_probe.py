"""Probe the sandbox for the OPTIONAL dependencies the repo defers on.

COVERAGE.md's "Deferred infrastructure" section claims two seams are
environment-blocked, not skipped by choice:

- ``delta-spark`` (+ its jars): would upgrade the DocStore parquet
  write-then-swap to ACID MERGE INTO / OPTIMIZE (SURVEY §2.1 S7/S8).
- ``Pillow``: would activate the real image decoders behind
  ops/multimodal.py's probe seam (fake-decoder plumbing is tested).

Run this each round; if a probe flips to AVAILABLE the corresponding
deferral in COVERAGE.md is stale and the original done-criteria
reactivate. Exit code 0 always (informational).

Usage: python tools/env_probe.py
"""

from __future__ import annotations

import importlib.util
import json
from datetime import datetime, timezone


def probe() -> dict[str, object]:
    out: dict[str, object] = {
        "probed_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    for mod, why in (
        ("delta", "delta-spark python bindings (ACID store upgrade)"),
        ("pyspark", "baseline sanity"),
        ("PIL", "Pillow (real multimodal decoders)"),
    ):
        out[mod] = {
            "available": importlib.util.find_spec(mod) is not None,
            "why_it_matters": why,
        }
    # delta needs the JVM jars too, not just the python package
    try:
        from importlib.metadata import version

        out["delta"]["version"] = version("delta-spark")  # type: ignore[index]
    except Exception:
        pass
    return out


def main() -> int:
    result = probe()
    print(json.dumps(result, indent=1))
    missing = [
        k
        for k, v in result.items()
        if isinstance(v, dict) and not v.get("available")
    ]
    print(
        f"deferred-infrastructure probe: missing={missing or 'none'} — "
        "if a previously-missing module is now available, reactivate "
        "the matching COVERAGE.md deferral."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
