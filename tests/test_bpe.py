"""BPE tokenizer training (ops/bpe.py): exact-merge verification on a
hand-computable corpus, determinism, and round-trip properties."""

from pyspark.sql import Row

from alerta_spark.ops.bpe import apply_bpe, learn_bpe


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_learn_bpe_matches_hand_computation(spark):
    # corpus: "low" x5, "lowest" x2 (the Sennrich paper's toy shape).
    # Round 1 pairs: (l,o) 7, (o,w) 7, (w,</w>) 5, (w,e) 2, (e,s) 2,
    # (s,t) 2, (t,</w>) 2 -> tie (l,o)/(o,w) 7 breaks on pair string:
    # (l,o) < (o,w).
    docs = _docs(spark, ["low low low low low", "lowest lowest"])
    merges = learn_bpe(docs, num_merges=3)
    assert [(a, b) for a, b, _ in merges] == [
        ("l", "o"),      # 7
        ("lo", "w"),     # 7 after merge 1
        ("low", "</w>"), # 5
    ]
    assert [n for _, _, n in merges] == [7, 7, 5]


def test_learn_bpe_deterministic_across_runs(spark):
    docs = _docs(
        spark,
        [
            "the cat sat on the mat",
            "the cats sat on the mats",
            "a cat and a mat and a hat",
        ],
    )
    m1 = learn_bpe(docs, num_merges=10)
    m2 = learn_bpe(docs, num_merges=10)
    assert m1 == m2 and len(m1) > 0


def test_learn_bpe_regimes_equivalent(spark):
    # the driver fast path (vocab collected once) and the distributed
    # per-round loop must produce byte-identical merge tables —
    # driver_vocab_max=0 forces the distributed regime
    docs = _docs(
        spark,
        [
            "the cat sat on the mat",
            "the cats sat on the mats",
            "a cat and a mat and a hat",
        ],
    )
    fast = learn_bpe(docs, num_merges=10)
    dist = learn_bpe(docs, num_merges=10, driver_vocab_max=0)
    assert fast == dist and len(fast) > 0


def test_apply_bpe_roundtrip_and_greedy_overlap(spark):
    docs = _docs(spark, ["low lowest", "aaa"])
    merges = learn_bpe(docs, num_merges=5, min_pair_freq=1)
    out = {r.doc_id: r.bpe_tokens for r in apply_bpe(docs, merges).collect()}
    # every word's tokens concatenate back to word + marker
    for did, text in [(0, "low lowest"), (1, "aaa")]:
        toks = out[did]
        joined = "".join(toks).replace("</w>", " ").strip().split(" ")
        assert joined == text.split(" "), (did, toks)


def test_apply_bpe_unmerged_chars_pass_through(spark):
    docs = _docs(spark, ["zzz qqq"])
    # merges learned from a DIFFERENT corpus -> nothing applies
    other = _docs(spark, ["low low"])
    merges = learn_bpe(other, num_merges=2, min_pair_freq=1)
    out = apply_bpe(docs, merges).collect()[0].bpe_tokens
    assert out == ["z", "z", "z", "</w>", "q", "q", "q", "</w>"]


def test_learn_bpe_distributed_releases_round_caches(spark):
    # round-10 pin: the distributed loop releases every round's word
    # cache (the pre-checkpoint persist used to leak each 5th round).
    # Only the localCheckpoint block RDDs may remain persisted after
    # the call returns (merges is a plain list — nothing lazy reads
    # the caches afterwards). 10 merges -> at most 2 checkpoints.
    docs = _docs(
        spark,
        [
            "the cat sat on the mat",
            "the cats sat on the mats",
            "a cat and a mat and a hat",
        ],
    )
    jsc = spark.sparkContext._jsc.sc()
    n_before = jsc.getPersistentRDDs().size()
    merges = learn_bpe(docs, num_merges=10, driver_vocab_max=0)
    assert len(merges) > 0
    n_after = jsc.getPersistentRDDs().size()
    assert n_after - n_before <= 2, (n_before, n_after)
