"""Time individual catalog queries with the bench methodology.

Usage: python tools/qtime.py [--reps N] [--plan DIR] query [query ...]

Same timed region as bench.py (construction + noop write), same
session config, same warm-up. --plan DIR additionally writes each
query's ``explain("formatted")`` to DIR/<name>.txt (captured on a
separate, untimed construction so the explain cost never pollutes the
timing). Reps run back-to-back; all reps print so cache warm-up
effects stay visible.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = sys.argv[1:]
    reps = 1
    plan_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--plan":
            plan_dir = Path(args[i + 1])
            plan_dir.mkdir(parents=True, exist_ok=True)
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from alerta_spark.plans import catalog
    from alerta_spark.session import get_spark

    # optional conf overrides for A/B config experiments:
    #   SPARK_GRAFT_EXTRA_CONF="spark.a=b;spark.c=d"
    extra = {}
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark(
        "alerta-qtime",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra or None,
    )
    qs = catalog.queries()
    # same warm-up as bench.py
    qs["s1_criteria_scan"](spark, sf_dir).count()
    spark.range(100).select(
        F.pandas_udf(lambda s: s + 1, "long")(F.col("id"))
    ).count()

    for name in names:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            continue
        if plan_dir is not None:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plan_dir / f"{name}.txt").write_text(txt)
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}#{r}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"{name} rep{r}: {dt:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
