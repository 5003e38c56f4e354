"""Find catalog queries whose PHYSICAL plan contains an unpartitioned
ordered Window (the WindowExec single-partition warning source).

This audit — not the log line — is the repo's enforcement mechanism
for the "no accidental global windows" rule: Spark 4.1's Catalyst
folds constant partition keys (`partitionBy(F.lit(0))`) out of the
window spec, so the WindowExec warning cannot be silenced per-site;
instead every unpartitioned window must be on this tool's audited
bounded-domain allowlist (tests/test_plans.py pins it).

A `Window` node prints as
    Window [exprs], [partitionCols], [orderCols]   (partitioned+ordered)
    Window [exprs], [partitionCols]                (partition-only)
    Window [exprs], [orderCols]                    (UNPARTITIONED)
— three top-level bracket groups when partitioned+ordered; with two
groups, the node is unpartitioned iff the second group is an ORDER
spec (contains ASC/DESC).

Usage: python tools/window_audit.py [query ...]   (default: all)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def top_level_groups(line: str) -> list[str]:
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in line:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


def is_unpartitioned(line: str) -> bool:
    groups = top_level_groups(line)
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        g = groups[1]
        return " ASC" in g or " DESC" in g
    return False


def main() -> int:
    from alerta_spark.plans import catalog
    from alerta_spark.session import get_spark

    spark = get_spark("window-audit", master="local[4]", shuffle_partitions=4)
    qs = catalog.queries()
    names = sys.argv[1:] or list(qs)
    bad: dict[str, list[str]] = {}
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: PLAN ERROR {exc}", file=sys.stderr)
            continue
        hits = []
        for ln in plan.splitlines():
            s = ln.lstrip(" :+-")
            if s.startswith("Window ") and is_unpartitioned(s):
                hits.append(ln.strip()[:120])
        # WindowGroupLimit nodes print differently; the Window node is
        # the one WindowExec warns about
        if hits:
            bad[name] = hits
    for name, hits in sorted(bad.items()):
        print(f"{name}:")
        for h in hits:
            print(f"  {h}")
    print(f"{len(bad)} queries with unpartitioned Window nodes")
    return 1 if bad else 0


if __name__ == "__main__":
    main()
