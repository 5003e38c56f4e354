"""Canary-normalized per-round bench history (round-9 verdict item 4).

BENCH_r{N}.json records only the headline JSON line (raw seconds, no
per-query detail), so cross-round tables needed prose to de-noise host
swings. The per-query detail DOES survive — ``BENCH_DETAIL.json`` is
committed by every driver round commit — so this tool replays the
round-9 canary normalization backward: for each ``round N:`` commit it
reads that round's committed detail, computes the canary host factor
(median current/r02 ratio over bench.py's pinned CANARY_R02 set) and
prints one table row: raw total, host factor, normalized total, and
the normalized geomean vs the previous round on shared queries.

Rounds whose detail predates the full canary set (r01-r02: fewer
queries) normalize over whatever canaries exist, with the count shown;
a factor over <6 canaries is printed in parentheses (advisory).

Usage:  python tools/bench_history.py  [--json]
"""

from __future__ import annotations

import json
import math
import re
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import CANARY_R02  # noqa: E402  (pinned r02 canary seconds)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=Path(__file__).resolve().parent.parent,
        capture_output=True, text=True, check=True,
    ).stdout


def _round_commits() -> list[tuple[int, str]]:
    """(round, sha) for every driver round commit, ascending."""
    out = []
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+):", subj)
        if m:
            out.append((int(m.group(1)), sha))
    return sorted(out)


def _detail_at(sha: str) -> dict | None:
    try:
        return json.loads(_git("show", f"{sha}:BENCH_DETAIL.json"))
    except (subprocess.CalledProcessError, ValueError):
        return None


def _host_factor(timings: dict[str, float]) -> tuple[float, int]:
    ratios = [
        timings[n] / r
        for n, r in CANARY_R02.items()
        if n in timings and timings[n] > 0
    ]
    if not ratios:
        return 1.0, 0
    ratios.sort()
    mid = len(ratios) // 2
    med = (
        ratios[mid]
        if len(ratios) % 2
        else (ratios[mid - 1] + ratios[mid]) / 2
    )
    return round(med, 4), len(ratios)


def _geomean(vals: list[float]) -> float:
    return math.exp(sum(math.log(v) for v in vals) / len(vals))


def main() -> None:
    as_json = "--json" in sys.argv
    rows = []
    prev_norm: dict[str, float] | None = None
    for rnd, sha in _round_commits():
        detail = _detail_at(sha)
        if not detail:
            continue
        q = {
            k: float(v)
            for k, v in (detail.get("queries") or {}).items()
            if isinstance(v, (int, float)) and v > 0
        }
        if not q:
            continue
        hf, n_canary = _host_factor(q)
        norm = {k: v / hf for k, v in q.items()}
        raw_total = round(sum(q.values()), 1)
        norm_total = round(sum(norm.values()), 1)
        vs_prev = None
        if prev_norm:
            shared = [
                norm[k] / prev_norm[k]
                for k in norm
                if k in prev_norm and prev_norm[k] > 0
            ]
            if shared:
                vs_prev = round(_geomean(shared), 3)
        rows.append(
            {
                "round": rnd,
                "sha": sha[:9],
                "n_queries": len(q),
                "raw_sec": raw_total,
                "host_factor": hf,
                "n_canaries": n_canary,
                "normalized_sec": norm_total,
                "geomean_vs_prev_normalized": vs_prev,
            }
        )
        prev_norm = norm
    if as_json:
        print(json.dumps(rows, indent=2))
        return
    print(
        f"{'round':>5} {'sha':>9} {'queries':>7} {'raw s':>8} "
        f"{'host':>7} {'norm s':>8} {'vs prev (geomean, norm)':>24}"
    )
    for r in rows:
        hf = (
            f"{r['host_factor']:.2f}"
            if r["n_canaries"] >= 6
            else f"({r['host_factor']:.2f})"
        )
        vp = (
            f"{r['geomean_vs_prev_normalized']:.3f}"
            if r["geomean_vs_prev_normalized"] is not None
            else "-"
        )
        print(
            f"{r['round']:>5} {r['sha']:>9} {r['n_queries']:>7} "
            f"{r['raw_sec']:>8.1f} {hf:>7} {r['normalized_sec']:>8.1f} "
            f"{vp:>24}"
        )
    print(
        "\nhost = canary median current/r02 (parenthesized when <6 "
        "canaries exist in that round's detail); norm = raw / host; "
        "vs prev = normalized per-query geomean over queries shared "
        "with the previous round."
    )


if __name__ == "__main__":
    main()
