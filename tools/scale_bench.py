"""Measure (don't assert) how the superlinear-risk dedup family scales.

Everything in the repo is proven correct at sf0.01 and timed at sf0.1;
this harness adds the missing empirical scale axis: replicate the sf0.1
`documents`/`embeddings` tables Nx and record wall time, output rows,
and (where the op exposes it) candidate-pair counts at 1x / 3x / 10x,
then fit a log-log growth exponent per operator.

Replicas are made DISTINCT, not copied: each replica's text goes
through a per-replica letter rotation (a Caesar-style `translate`),
which preserves token lengths, whitespace/punct structure, and document
sizes while producing disjoint shingle sets — so the corpus grows
without manufacturing artificial 10x duplicate clusters (a copied
corpus would measure hot-key pathology, not scaling). Replica 0 is the
original, so every planted dup pair survives in each replica's rotated
form too (rotation is a bijection on tokens: near-dup relations are
preserved WITHIN a replica, broken ACROSS replicas — exactly the
structure a 10x-bigger real corpus has).

Usage:  python tools/scale_bench.py [--scales 1,3,10]
Writes SCALE_BENCH.json and prints one summary line per op.
Scaled parquet is cached under .scale/x{N}/ (gitignored).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
BASE_SF = "/root/testdata/sf0.1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"

FAMILY = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_containment",
    "dedup_winnow_pairs",
    "dedup_fuzzy_levenshtein",
    "dedup_semantic_clusters",
    # round-4 widening: the other families with superlinear risk or
    # headline cost — exact dedup (linear reference point), brute ANN
    # (O(corpus) per query vector), inverted-index retrieval, tf-idf
    # (corpus-sized vocab join), and the entity-resolution capstone
    # (fuzzy join + iterative label propagation, slowest bench query)
    "dedup_exact",
    "similarity_cosine_topk",
    "text_bm25_topk",
    "text_tfidf_top_terms",
    "pipeline_entity_resolution",
    # round-4 widening 2: the user-keyed event family — sessionization
    # (user exchange + ordered fold), deadline funnels, the bounded
    # range-join attribution, the conditional-aggregate feature
    # snapshot, and the 7d sliding-distinct window (the heaviest
    # window shape in the catalog)
    "sessionize_events",
    "funnel_signup_view_purchase",
    "attribution_time_decay",
    "features_user_snapshot",
    "rolling_7d_active_users",
    # round-4 widening 3: the new embedding/text ops with quadratic
    # risk — LOF (Σ|cell|² pair work at FIXED n_centroids: expected
    # exponent ~2 here, the √N-centroids rule is the scale mitigation
    # the docstring prescribes), k-center (k linear passes), and the
    # source-overlap posting join (pairs bounded by #sources²)
    "embedding_lof_outliers",
    "sample_kcenter_coreset",
    "corpus_source_overlap_matrix",
    # round-4 widening 4: the session-4 additions with quadratic or
    # shuffle-shape risk — triplet mining (round 9: the production
    # name now routes to the BLOCKED pinned-cell plan — distributed
    # max_by, no broadcast/collect; the demoted broadcast form
    # measured exponent 1.31 and lives on as the explicit
    # embedding_triplet_mining_broadcast alias),
    # Markov removal (sessionize + fixed 65-step chain solve on a
    # 1-row frame: expect ~linear), and the sweep-line concurrency on
    # the distributed prefix-sum primitive (expect ~linear)
    "embedding_triplet_mining",
    "attribution_markov_removal",
    "sessions_peak_concurrency_daily",
    # round-5 widening: the integer-exact LSH paths promoted to the
    # production names (banded self-join with quadratic risk in hot
    # buckets — the 12-plane banding is the mitigation), and the
    # capped-reference triplet miner (expect ~linear once the 65536
    # reference cap binds at 3x/10x)
    "dedup_embedding_lsh",
    "similarity_lsh_topk",
    # round-7 widening: the new regime-switch fast paths. Greedy
    # source cover collects pattern-mask counts bounded by source
    # COMBINATIONS (sources stay 20 at every replica scale, so the
    # collected rows must stay ~flat while the shingle corpus grows
    # 10x — the row that proves the driver term is corpus-size-
    # independent). BPE's vocab grows with the rotated replicas but
    # measured flat through x10 (still under driver_vocab_max — the
    # synthetic vocab is small); the driver->distributed regime seam
    # is pinned by the equivalence test, not this curve.
    "corpus_greedy_source_cover",
    "bpe_learn_merges_pinned",
    # round-10 widening: the other iterative driver-round ops after
    # the redundant-materialization fold (one action per round, parent
    # cache released after the round's own argmax/aggregate) — pinned
    # Lloyd rounds over replicated embeddings (expect ~linear in the
    # distance/update aggregates) and fixed-point PageRank whose edge
    # builder is a corpus window pass but whose per-round work is
    # |types|²-bounded after the round-10 edge-set localCheckpoint
    # (expect ~the window pass's exponent, rounds flat)
    "clustering_kmeans_pinned",
    "graph_pagerank_transitions",
    # round-11 widening: the six round-10 changes kept DESPITE a
    # measured local cost, on an at-scale argument (verdict item 1) —
    # the salted top-3 window (straggler fix whose salt adds a local
    # phase) and the five tiny-frame persists that each trade one
    # extra local materialization for a saved corpus pass. These rows
    # turn that argument into a measurement: if the kept shape's 10x
    # time is above the reverted shape's, the keep was wrong.
    "recs_als_rank1_pinned",
    "corpus_temperature_mix",
    "abtest_stratified_rates",
    "survival_logrank_abtest",
    "stats_cramers_v",
    "stats_ljung_box_daily",
]


def ensure_scaled(spark, n: int) -> str:
    """Materialize the Nx corpus under .scale/x{n} (idempotent)."""
    from pyspark.sql import functions as F

    out = REPO / ".scale" / f"x{n}"
    # v2 marker: v1 dirs lack the replicated events table
    if (out / "_OK").exists() and (out / "events.parquet").exists():
        return str(out)
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1

    reps = []
    for r in range(n):
        rot = ALPHA[r:] + ALPHA[:r]
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * max_doc)).alias("doc_id"),
                F.translate("text", ALPHA, rot).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    scaled_docs = reps[0]
    for d in reps[1:]:
        scaled_docs = scaled_docs.unionByName(d)
    scaled_docs.write.mode("overwrite").parquet(str(out / "documents.parquet"))

    # embeddings: deterministic per-replica perturbation of one dim +
    # renorm keeps vectors unit-ish and breaks cross-replica near-dups
    ereps = []
    for r in range(n):
        v = F.transform(
            "embedding",
            lambda x, i: F.when(
                i == F.lit(r % 8), x + F.lit(0.37 + 0.11 * r)
            ).otherwise(x),
        )
        nrm = F.sqrt(
            F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
        )
        ereps.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * max_vec)).alias("vec_id"),
                F.transform(v, lambda x: (x / nrm).cast("float")).alias(
                    "embedding"
                ),
                "label",
            )
        )
    scaled_emb = ereps[0]
    for e in ereps[1:]:
        scaled_emb = scaled_emb.unionByName(e)
    scaled_emb.write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )
    # events: shift user_id/event_id per replica so the user population
    # grows linearly with identical per-user behavior (the structure a
    # 10x-bigger event lake has); ts/value/props untouched so window
    # spans and value distributions are preserved
    ev = spark.read.parquet(f"{BASE_SF}/events.parquet")
    bounds = ev.agg(
        F.max("user_id").alias("mu"), F.max("event_id").alias("me")
    ).collect()[0]
    max_user, max_ev = bounds["mu"] + 1, bounds["me"] + 1
    vreps = []
    for r in range(n):
        vreps.append(
            ev.select(
                (F.col("event_id") + F.lit(r * max_ev)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(r * max_user)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    scaled_ev = vreps[0]
    for v in vreps[1:]:
        scaled_ev = scaled_ev.unionByName(v)
    scaled_ev.write.mode("overwrite").parquet(str(out / "events.parquet"))
    (out / "_OK").write_text("ok")
    return str(out)


def main() -> None:
    scales = [1, 3, 10]
    only: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))

    from alerta_spark.plans import catalog
    from alerta_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "") or str(os.cpu_count() or 8)
    spark = get_spark(
        "alerta-scale-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = catalog.queries()
    family = [n for n in FAMILY if not only or n in only]
    results: dict[str, dict] = {name: {} for name in family}

    # warm the JVM, parquet reader, and Python-worker pool so the first
    # measured op doesn't absorb session startup (it skewed the x1
    # baseline by ~2x and produced a bogus negative growth exponent)
    warm_dir = ensure_scaled(spark, scales[0])
    from alerta_spark.ops.dedupe import release_cached

    qs[family[0]](spark, warm_dir).count()
    release_cached()

    for n in scales:
        sf_dir = ensure_scaled(spark, n)
        for name in family:
            from alerta_spark.ops.dedupe import release_cached

            release_cached()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            rows = df.count()
            dt = round(time.perf_counter() - t0, 3)
            release_cached()
            results[name][str(n)] = {"sec": dt, "out_rows": rows}
            print(f"x{n:<3} {name:<28} {dt:>8.2f}s  rows={rows}")

    # log-log growth exponent between the smallest and largest scale
    lo, hi = str(scales[0]), str(scales[-1])
    import math

    for name, r in results.items():
        if lo != hi and lo in r and hi in r and r[lo]["sec"] > 0:
            ratio = r[hi]["sec"] / r[lo]["sec"]
            r["time_exponent"] = round(
                math.log(ratio) / math.log(int(hi) / int(lo)), 2
            )
            base_rows = r[lo]["out_rows"]
            if base_rows > 0:
                r["rows_exponent"] = round(
                    math.log(max(r[hi]["out_rows"], 1) / base_rows)
                    / math.log(int(hi) / int(lo)),
                    2,
                )

    import datetime as _dt

    stamp = _dt.datetime.now(_dt.timezone.utc).isoformat(timespec="seconds")
    for r in results.values():
        r["measured_at"] = stamp
    out_path = REPO / "SCALE_BENCH.json"
    merged = results
    if out_path.exists():
        # ALWAYS merge into the existing record: a full-family run
        # must not clobber measurements other writers own (the engine
        # alert-cardinality rows from tools/alert_scale_bench.py live
        # in the same file). But within the keys THIS writer owns
        # (every non-engine_* family), a full-family run prunes rows
        # the current code no longer benches — a renamed/removed
        # family must not misrepresent the tree as still measured.
        prior = json.loads(out_path.read_text()).get("results", {})
        if set(results) >= set(FAMILY):  # full-family run
            prior = {
                k: v
                for k, v in prior.items()
                if k.startswith("engine_") or k in results
            }
        prior.update(results)
        merged = prior
    out_path.write_text(json.dumps({"base": BASE_SF, "results": merged}, indent=1))
    print(f"wrote {out_path}")
    for name, r in results.items():
        print(
            f"{name:<28} time_exp={r.get('time_exponent')} "
            f"rows_exp={r.get('rows_exponent')}"
        )


if __name__ == "__main__":
    main()
