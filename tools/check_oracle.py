"""Local stand-in for the driver's t2 correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle on the same
parquet, compares row count, column names, and an order-insensitive
value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # FULL precision, no rounding: the driver's canonicalizer is
        # strict, so any engine ulp divergence must FAIL here too —
        # local green has to predict driver green. Queries must produce
        # bit-identical floats on both sides (exact-decimal accumulate,
        # single final cast/division).
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def table_hash(rows, columns) -> str:
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in idx) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    from alerta_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:35s} rows-only: {len(srows)} rows")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = table_hash([[r[c] for c in scols] for r in srows], scols)
        dh = table_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"{name:35s} {status}  rows {len(srows)}/{len(drows)} "
            f"cols={'=' if ok_cols else 'X'} hash={'=' if ok_hash else 'X'}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"   spark cols: {scols}\n   duck  cols: {dcols}")
            if ok_cols and not ok_hash:
                sset = {tuple(norm_cell(r[c]) for c in sorted(scols)) for r in srows}
                dset = {
                    tuple(norm_cell(r[dcols.index(c)]) for c in sorted(dcols))
                    for r in drows
                }
                print(f"   spark-only: {list(sset - dset)[:3]}")
                print(f"   duck-only : {list(dset - sset)[:3]}")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
