"""Randomized strategy-equivalence tests: many generated cases folded
into ONE Spark job each, compared against a plain-Python reference
(the funnel-equivalence pattern — cheaper than per-example hypothesis
rounds with a JVM in the loop)."""

import random

from pyspark.sql import functions as F


def test_golden_record_random_equivalence(spark):
    """200 random multi-case tables: per (case, key), each attr must
    equal the latest-non-null pick of a Python fold."""
    from alerta_spark.ops.records import golden_record

    rng = random.Random(42)
    rows = []
    for case in range(50):
        for key in range(rng.randint(1, 3)):
            for t in range(rng.randint(1, 6)):
                rows.append(
                    (
                        case,
                        key,
                        t,
                        rng.choice([None, f"a{rng.randint(0, 9)}"]),
                        rng.choice([None, None, rng.randint(0, 99)]),
                    )
                )
    df = spark.createDataFrame(
        rows, "case long, k long, o long, a string, b long"
    )
    got = {
        (r["case"], r["k"]): (r["n_rows"], r["a"], r["b"])
        for r in golden_record(
            df.withColumn("ck", F.struct("case", "k")),
            "ck",
            F.col("o"),
            F.col("o"),
            {"a": F.col("a"), "b": F.col("b")},
        )
        .select("ck.case", "ck.k", "n_rows", "a", "b")
        .collect()
    }
    want = {}
    for case, k, o, a, b in rows:
        n, la, lb, oa, ob = want.get((case, k), (0, None, None, -1, -1))
        n += 1
        if a is not None and o >= oa:
            la, oa = a, o
        if b is not None and o >= ob:
            lb, ob = b, o
        want[(case, k)] = (n, la, lb, oa, ob)
    assert got == {k: (n, a, b) for k, (n, a, b, _, _) in want.items()}


def test_containment_random_equivalence(spark):
    """Random word-soup corpora with planted substrings and fused
    seams, disjoint vocab per case so cases cannot cross-match; the
    lossless-probe result must equal the quadratic definition."""
    from alerta_spark.ops.dedupe import containment_pairs
    from alerta_spark.ops.text import normalize_text

    rng = random.Random(7)
    rows = []
    doc_id = 0
    for case in range(20):
        vocab = [f"c{case}w{i}" for i in range(12)]
        docs = []
        for _ in range(rng.randint(2, 5)):
            docs.append(" ".join(rng.choices(vocab, k=rng.randint(3, 12))))
        # plant: embed doc 0 inside a longer doc, sometimes fused
        inner = docs[0]
        pad = " ".join(rng.choices(vocab, k=4))
        sep = "" if rng.random() < 0.5 else " "
        docs.append(pad + sep + inner + sep + pad)
        for d in docs:
            rows.append((doc_id, d))
            doc_id += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    n = 3
    got = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(df, n=n).collect()
    }
    norm = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", normalize_text(F.col("text")).alias("t")
        ).collect()
    }
    want = set()
    for bi, bt in norm.items():
        if len(bt.split(" ")) < n + 2:
            continue
        for ai, at in norm.items():
            if ai == bi or bt not in at:
                continue
            if len(bt) < len(at) or (bt == at and bi < ai):
                want.add((bi, ai))
    assert got == want and len(want) > 0


def test_concurrent_catalog_queries_one_session(spark):
    """Four catalog queries submitted from concurrent threads against
    ONE session (the multi-tenant/scheduler reality) produce exactly
    their serial results — no cross-query state bleed."""
    from concurrent.futures import ThreadPoolExecutor

    from alerta_spark.plans.catalog import queries

    qs = queries()
    names = [
        "a1_mostcommon",
        "agg_rollup",
        "users_rfm_scores",
        "events_markov_transitions",
    ]
    sf = "/root/testdata/sf0.001"

    def run(name):
        return name, {tuple(map(str, r)) for r in qs[name](spark, sf).collect()}

    serial = dict(run(n) for n in names)
    with ThreadPoolExecutor(max_workers=4) as ex:
        concurrent = dict(ex.map(run, names))
    assert concurrent == serial
