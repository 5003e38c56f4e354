"""Dedup operator semantics + LSH recall vs the exact ground truth."""

import pytest

from alerta_spark.ops.dedupe import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from alerta_spark.sources.lake import load_table

    return load_table(spark, SF, "documents")


def test_exact_dedup_finds_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello   World"),
            (2, "hello world"),  # same after normalization
            (3, "something else"),
        ],
        "doc_id long, text string",
    )
    rows = {r["keep_id"]: r for r in exact_dedup(df).collect()}
    assert rows[1]["dup_count"] == 2 and rows[1]["dup_ids"] == [1, 2]
    assert rows[3]["dup_count"] == 1


def test_ngram_jaccard_exact_pair(spark):
    base = "a b c d e f g h i j k l m n o p q r s t"
    df = spark.createDataFrame(
        [(1, base), (2, base + " u"), (3, "z y x w v u t s r q p o n m l")],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(df, n=5, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.9
    assert (1, 3) not in pairs


def test_ngram_jaccard_hot_shingle_cap_bounds_bucket(spark):
    """A boilerplate shingle shared by EVERY doc must not create a
    quadratic join bucket: with the cap on, the hot shingle is dropped
    from index AND sizes, so unrelated docs produce no pairs while true
    near-dups (sharing many uncapped shingles) still match."""
    boiler = "this message is confidential please do not distribute"
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{boiler} unique{i} filler{i} words{i} here{i} now{i}")
            for i in range(20)]
    rows += [(100, f"{boiler} {dup}"), (101, f"{boiler} {dup} extra")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, n=5, threshold=0.5, max_doc_freq=10)
        .collect()
    }
    # the 20 boilerplate-only docs share ONLY capped shingles -> no pairs
    assert all(a >= 100 for a, _ in capped), capped
    # the genuine near-dup pair survives on its uncapped shingles
    assert (100, 101) in capped

    # uncapped ground truth: the boilerplate shingle links everything;
    # the capped run must emit strictly fewer candidate pairs
    uncapped = ngram_jaccard_pairs(
        df, n=5, threshold=0.0, max_doc_freq=None
    ).count()
    capped_all = ngram_jaccard_pairs(
        df, n=5, threshold=0.0, max_doc_freq=10
    ).count()
    assert capped_all < uncapped


def test_minhash_lsh_recall_vs_exact(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, n=5, threshold=0.8).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, n=5, threshold=0.8).collect()
    }
    assert exact, "testdata should contain planted near-dups"
    # verification step guarantees precision == 1
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_simhash_symmetric_and_thresholded(docs):
    rows = simhash_near_dups(docs, max_hamming=3).collect()
    assert all(r["hamming"] <= 3 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)
    # near-identical docs should collide
    assert len(rows) > 0


def test_simhash_identical_docs_zero_distance(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    rows = simhash_near_dups(df).collect()
    assert len(rows) == 1 and rows[0]["hamming"] == 0


def test_dup_clusters_transitive(spark):
    from alerta_spark.ops.dedupe import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 5), (9, 8)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 8, 9: 8}


def test_dup_clusters_regimes_equivalent(spark):
    # the driver union-find fast path and the distributed min-label
    # loop must agree; driver_edges_max=0 forces the distributed
    # regime. Mix of a chain (diameter 4), a star, string-typed ids,
    # and a self-contained pair.
    from alerta_spark.ops.dedupe import dup_clusters

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
         ("x", "p"), ("x", "q"), ("x", "r"), ("m", "n")],
        "id_a string, id_b string",
    )
    fast = {
        r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()
    }
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(pairs, driver_edges_max=0).collect()
    }
    assert fast == dist
    assert fast["e"] == "a" and fast["x"] == "p" and fast["n"] == "m"


def test_keep_canonical_survivors(spark):
    from alerta_spark.ops.dedupe import dup_clusters, keep_canonical

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    # clusters {1,2,3,4} and {5,6}; 0,7,8,9 unclustered
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 5)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id
        for r in keep_canonical(docs, dup_clusters(pairs)).collect()
    )
    assert kept == [0, 1, 5, 7, 8, 9]


def test_winnow_guarantee_and_density(spark):
    """Winnowing's contract: any shared substring of length >= k+w-1
    yields a shared fingerprint between the two documents; density is
    well under 1 fingerprint per character."""
    from pyspark.sql import Row

    from alerta_spark.ops.dedupe import winnow_fingerprints

    shared = "identical plagiarized passage of text"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"alpha beta {shared} gamma delta"),
            Row(doc_id=2, text=f"unrelated opening words {shared} and a tail"),
            Row(doc_id=3, text="completely different content here entirely"),
        ]
    )
    fps = winnow_fingerprints(df, k=8, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # docs 1 and 2 share the passage -> must share >= 1 fingerprint
    assert by_doc[1] & by_doc[2]
    # doc 3 shares nothing long with doc 1
    assert not (by_doc[1] & by_doc[3])
    # density: ~2/(w+1) of positions, never more than 1 per position
    n_chars = len(f"alpha beta {shared} gamma delta")
    assert 0 < len(by_doc[1]) < n_chars * 0.8


def test_prefix_filter_matches_full_index_and_shrinks(spark):
    """The PPJoin lemma in practice: prefix-filtered pairs == the
    full-inverted-index formulation (uncapped) at the same threshold,
    while indexing strictly fewer (token, doc) rows."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.dedupe import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
        release_cached,
        shingle_rows,
    )
    from alerta_spark.sources.lake import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = sorted(
        map(tuple, ngram_jaccard_pairs(docs, max_doc_freq=None).collect())
    )
    pref = sorted(map(tuple, prefix_jaccard_pairs(docs).collect()))
    assert full == pref and len(pref) > 0

    # index-size claim: at t=0.8 the prefix index is a small fraction
    n_full = shingle_rows(docs, "text", "doc_id", 5).count()
    # reconstruct the prefix row count the operator indexes
    idx = shingle_rows(docs, "text", "doc_id", 5)
    freq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
    per_doc = (
        idx.join(freq, "shingle")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("L"))
        .select(
            (F.col("L") - F.ceil(F.col("L") * 0.8).cast("int") + 1).alias("p")
        )
    )
    n_prefix = per_doc.agg(F.sum("p")).first()[0]
    release_cached()
    assert n_prefix < 0.45 * n_full, (n_prefix, n_full)


def test_fuzzy_levenshtein_filter_is_output_invisible(spark):
    """q-gram count filter finds exactly the all-pairs edit<=k set,
    including cross-length edits and excluding just-over-threshold."""
    from alerta_spark.ops.dedupe import fuzzy_pairs_levenshtein

    df = spark.createDataFrame(
        [
            (1, "warehouse"),
            (2, "warehouze"),      # 1 substitution
            (3, "wareouse"),       # 1 deletion
            (4, "warehouse12"),    # 2 insertions -> edits=2 vs doc 1
            (5, "completely off"),
        ],
        "doc_id long, k string",
    )
    got = {
        (r["id_a"], r["id_b"], r["edits"])
        for r in fuzzy_pairs_levenshtein(df, key_col="k", max_edits=2).collect()
    }
    assert got == {(1, 2, 1), (1, 3, 1), (2, 3, 2), (1, 4, 2)}


def test_containment_pairs_lossless_vs_definition(spark):
    """Planted containments — including a no-whitespace seam where the
    inner doc's boundary words fuse with outer text (the case the
    interior-shingle argument exists for) — match the definitional
    quadratic exactly."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.dedupe import containment_pairs
    from alerta_spark.ops.text import normalize_text

    inner = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, inner),                                   # eligible inner (8 toks)
        (2, "prefix words here " + inner + " and trailing text tail"),
        (3, "XX" + inner + "YY junk padding words here"),  # fused seam
        (4, "unrelated content entirely different words all over here"),
        (5, "tiny doc"),                              # ineligible (<7 toks)
        (6, inner),                                   # exact twin of 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(df, n=3).collect()
    }
    norm = df.select(
        F.col("doc_id"), normalize_text(F.col("text")).alias("t"),
        F.size(F.split(normalize_text(F.col("text")), " ")).alias("k"),
    ).collect()
    want = set()
    for b in norm:
        if b["k"] < 5:  # n + 2
            continue
        for a in norm:
            if a["doc_id"] == b["doc_id"] or b["t"] not in a["t"]:
                continue
            if len(b["t"]) < len(a["t"]) or (
                b["t"] == a["t"] and b["doc_id"] < a["doc_id"]
            ):
                want.add((b["doc_id"], a["doc_id"]))
    assert got == want
    assert (1, 2) in got and (1, 3) in got and (1, 6) in got
    assert all(i != 5 for i, _ in got)


def test_winnow_hot_cap_composes_frac_and_abs(spark):
    """The hot-print drop threshold is min(floor(frac*n_docs),
    max_fp_freq): candidate fan-in must stay O(n*cap) as the corpus
    grows (a frac-only cap admits floor(frac*n)-long posting lists —
    measured 690M candidate pairs at 10x vs 17M; see BASELINE.md).
    Here: 30 docs sharing one boilerplate sentence; with frac=0.5 the
    frac threshold (15) would keep the print, the absolute cap (5)
    must win and drop it."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.dedupe import winnow_near_dup_pairs

    boiler = "this exact boilerplate sentence appears in every document "
    rows = [(i, boiler + f"unique tail number {i} " * 3) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    frac_only = winnow_near_dup_pairs(
        df, threshold=0.2, max_fp_frac=0.5, max_fp_freq=None
    ).count()
    composed = winnow_near_dup_pairs(
        df, threshold=0.2, max_fp_frac=0.5, max_fp_freq=5
    ).count()
    # boilerplate prints (df=30 > 15) dropped either way; prints with
    # 5 < df <= 15 only drop under the composed cap
    assert composed <= frac_only
    # and with the absolute cap at play no posting list longer than 5
    # survives: every remaining pair's overlap comes from rare prints
    abs_only = winnow_near_dup_pairs(
        df, threshold=0.2, max_fp_freq=5
    ).count()
    assert composed == abs_only
