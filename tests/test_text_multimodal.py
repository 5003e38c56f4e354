"""Text analysis + multimodal plumbing."""

import pytest

from alerta_spark.ops.multimodal import (
    FEATURE_DIM,
    attach_fake_media,
    extract_features,
    media_summary,
    sample_frames,
)
from alerta_spark.ops.text import language_id, quality_score, token_stats


@pytest.fixture(scope="module")
def docs(spark):
    from alerta_spark.sources.lake import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents")


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "Hello, world! 42 times")], "doc_id long, text string")
    r = token_stats(df).first()
    assert r["n_tokens"] == 4
    # hello , world ! 42 times
    assert r["n_bpe_tokens"] == 6


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog"),
            (2, "der hund und die katze ist nicht da"),
            (3, "el perro y la casa de que los gatos"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_quality_score_bounds(docs):
    rows = quality_score(docs).collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)


def test_media_pipeline(docs):
    media = attach_fake_media(docs)
    summ = media_summary(media).collect()
    assert len(summ) == 1 and summ[0]["kind"] == "image"
    assert summ[0]["n"] == docs.count()

    feats = extract_features(media).collect()
    assert len(feats) == docs.count()
    assert all(len(r["features"]) == FEATURE_DIM for r in feats)
    assert all(0.0 <= x <= 1.0 for r in feats for x in r["features"])
    # deterministic: same input -> same features
    again = extract_features(media).collect()
    assert {r["doc_id"]: r["features"] for r in feats} == {
        r["doc_id"]: r["features"] for r in again
    }


def test_real_decoder_probe_seam(docs, spark):
    """decoder='real' probes for Pillow: raises NotImplementedError
    when it is absent (this sandbox), and actually decodes when it is
    present (cluster with codecs) — both sides of the seam pinned."""
    from alerta_spark.ops.multimodal import pil_available, resize_images

    media = attach_fake_media(docs)
    if not pil_available():
        with pytest.raises(NotImplementedError):
            extract_features(media, decoder="real")
        with pytest.raises(NotImplementedError):
            resize_images(media, decoder="real")
        return
    # Pillow present: run the real path on a real 1-px PNG
    import base64

    from pyspark.sql import functions as F

    png = base64.b64decode(
        b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGNg"
        b"YGBgAAAABQABh6FO1AAAAABJRU5ErkJggg=="
    )
    one = spark.createDataFrame([(1, png)], "doc_id long, data binary").select(
        "doc_id",
        F.struct(
            F.col("data"),
            F.struct(
                F.lit("image").alias("kind"),
                F.lit("png").alias("format"),
                F.lit(1).alias("width"),
                F.lit(1).alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    feats = extract_features(one, decoder="real").collect()
    assert len(feats) == 1 and len(feats[0]["features"]) == FEATURE_DIM
    out = resize_images(one, decoder="real", target=(8, 8)).collect()
    assert out[0]["media"]["meta"]["format"] == "png"
    assert out[0]["media"]["meta"]["width"] == 8


def test_frame_sampling(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, b"xx")], "doc_id long, data binary").select(
        "doc_id",
        F.struct(
            F.col("data"),
            F.struct(
                F.lit("video").alias("kind"),
                F.lit("fake").alias("format"),
                F.lit(0).alias("width"),
                F.lit(0).alias("height"),
                F.lit(3500).alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    frames = sample_frames(df, every_ms=1000).collect()
    assert [r["frame_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_resize_images_plumbing(docs):
    from alerta_spark.ops.multimodal import resize_images

    media = attach_fake_media(docs.limit(20))
    out = resize_images(media, target=(224, 224)).collect()
    assert len(out) == 20
    assert all(r["media"]["meta"]["width"] == 224 for r in out)
    assert all(r["media"]["meta"]["format"] == "fake-resized" for r in out)
    assert all(len(r["media"]["data"]) == 128 for r in out)


def test_token_entropy_degenerate_vs_diverse(spark):
    import math

    from pyspark.sql import Row

    from alerta_spark.ops.text import token_entropy

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam spam spam"),
            Row(doc_id=2, text="one two three four five six"),
        ]
    )
    got = {r.doc_id: r for r in token_entropy(df).collect()}
    # all-identical tokens -> H = 0; all-distinct n tokens -> H = ln(n)
    assert abs(got[1].entropy) < 1e-6
    assert abs(got[2].entropy - math.log(6)) < 1e-6
    assert got[1].n_distinct == 1 and got[2].n_distinct == 6
    assert got[1].n_tokens == 6 and got[2].n_tokens == 6


def test_unigram_nll_rare_tokens_score_higher(spark):
    from pyspark.sql import Row

    from alerta_spark.ops.text import unigram_nll
    from alerta_spark.ops.dedupe import release_cached

    common = "the quick brown fox " * 5
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=common),
            Row(doc_id=2, text=common),
            Row(doc_id=3, text="zyzzyva qoph xylyl kvetch"),
        ]
    )
    got = {r.doc_id: r.mean_nll for r in unigram_nll(df).collect()}
    release_cached()
    # docs made of corpus-frequent tokens are more likely under the
    # corpus LM than the all-rare-token doc
    assert got[1] == got[2] < got[3]


def test_unigram_nll_matches_closed_form(spark):
    import math

    from pyspark.sql import Row

    from alerta_spark.ops.text import unigram_nll
    from alerta_spark.ops.dedupe import release_cached

    # corpus: "a a a b" -> p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame([Row(doc_id=1, text="a a a b")])
    got = unigram_nll(df).collect()[0]
    release_cached()
    expect = -(3 * math.log(3 / 4) + 1 * math.log(1 / 4)) / 4
    assert abs(got.mean_nll - expect) < 1e-6
    assert got.n_tokens == 4


def test_clean_lines_rules(spark):
    """Line gate semantics: short lines drop, banned-substring lines
    drop, empty docs drop, counts reconcile."""
    from alerta_spark.ops.text import clean_lines

    df = spark.createDataFrame(
        [
            (1, "one two three\nshort line\nbad slow line here"),
            (2, "tiny"),
            (3, "alpha beta gamma\ndelta epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in clean_lines(
            df, min_words=3, banned_substrings=("slow",), min_lines_kept=1
        ).collect()
    }
    assert got[1]["clean_text"] == "one two three"
    assert got[1]["n_lines_kept"] == 1 and got[1]["n_lines_dropped"] == 2
    assert 2 not in got  # only line too short -> doc dropped
    assert got[3]["n_lines_kept"] == 2 and got[3]["n_lines_dropped"] == 0


def test_chunk_into_lines_partitions_words(spark):
    from alerta_spark.ops.text import chunk_into_lines

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(19)))], "doc_id long, text string"
    )
    out = chunk_into_lines(df, words_per_line=8).collect()[0]["text"]
    lines = out.split("\n")
    assert [len(l.split(" ")) for l in lines] == [8, 8, 3]
    assert " ".join(out.replace("\n", " ").split(" ")) == " ".join(
        f"w{i}" for i in range(19)
    )


def test_bm25_matches_closed_form(spark):
    """Hand-computed BM25 (k1=1.2, b=0.75, halves-cleared idf) on a
    3-doc corpus: ranking AND scores must match to quantization
    error (2 query terms * 1e-6 per fixed-point step)."""
    import math

    from alerta_spark.ops.text import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "spark spark join filter"),  # tf(spark)=2, tf(join)=1, dl=4
            (2, "spark scan scan"),          # tf(spark)=1, dl=3
            (3, "scan sort merge"),          # no query terms, dl=3
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bm25_topk(df, ["spark", "join"], k=10).collect()}
    assert 3 not in got and set(got) == {1, 2}

    N, T = 3, 10
    def idf(dfreq):
        return math.log((2 * N - 2 * dfreq + 1) / (2 * dfreq + 1))

    def part(tf, dl, dfreq):
        return idf(dfreq) * tf * 2.2 / (tf + 0.3 + 0.9 * (dl * N) / T)

    exp1 = part(2, 4, 2) + part(1, 4, 1)
    exp2 = part(1, 3, 2)
    assert got[1].n_terms_matched == 2 and got[2].n_terms_matched == 1
    assert abs(got[1].bm25 - exp1) < 3e-6, (got[1].bm25, exp1)
    assert abs(got[2].bm25 - exp2) < 3e-6, (got[2].bm25, exp2)
    assert got[1].bm25 > got[2].bm25


def test_jsd_identical_zero_disjoint_ln2(spark):
    """JSD(P, P) = 0; fully disjoint vocabularies = ln 2. The
    fixed-point quantization must not perturb either identity beyond
    n_terms/quant."""
    import math

    from alerta_spark.ops.dedupe import release_cached
    from alerta_spark.ops.text import token_js_divergence

    a = spark.createDataFrame(
        [(1, "x y z x"), (2, "y z w")], "doc_id long, text string"
    )
    same = token_js_divergence(a, a).collect()[0]
    assert same.n_terms_a == same.n_terms_b == same.n_shared_terms == 4
    assert abs(same.jsd) < 1e-8

    b = spark.createDataFrame([(3, "p q r p q")], "doc_id long, text string")
    disj = token_js_divergence(a, b).collect()[0]
    release_cached()
    assert disj.n_shared_terms == 0
    assert abs(disj.jsd - math.log(2.0)) < 1e-8


def test_jsd_matches_closed_form_overlapping(spark):
    """Hand-computed JSD on an overlapping pair (P: a=3/4, b=1/4;
    Q: b=1/2, c=1/2)."""
    import math

    from alerta_spark.ops.dedupe import release_cached
    from alerta_spark.ops.text import token_js_divergence

    A = spark.createDataFrame([(1, "aa aa aa bb")], "doc_id long, text string")
    B = spark.createDataFrame([(2, "bb cc")], "doc_id long, text string")
    got = token_js_divergence(A, B).collect()[0]
    release_cached()

    P = {"aa": 3 / 4, "bb": 1 / 4}
    Q = {"bb": 1 / 2, "cc": 1 / 2}
    terms = set(P) | set(Q)
    jsd = 0.0
    for t in terms:
        p, q = P.get(t, 0.0), Q.get(t, 0.0)
        m = (p + q) / 2
        if p:
            jsd += 0.5 * p * math.log(p / m)
        if q:
            jsd += 0.5 * q * math.log(q / m)
    assert abs(got.jsd - jsd) < 1e-7, (got.jsd, jsd)
    assert (got.n_terms_a, got.n_terms_b, got.n_shared_terms) == (2, 2, 1)


def test_bigram_nll_matches_closed_form(spark):
    """Corpus [a,b,a,b,a,c] -> bigrams (a,b),(b,a),(a,b),(b,a),(a,c):
    c(ab)=2, c(ba)=2, c(ac)=1; contexts a=3, b=2. Hand-computed NLL."""
    import math

    from alerta_spark.ops.dedupe import release_cached
    from alerta_spark.ops.text import bigram_nll

    df = spark.createDataFrame([(1, "a b a b a c")], "doc_id long, text string")
    got = bigram_nll(df).collect()[0]
    release_cached()
    expect = -(
        2 * math.log(2 / 3) + 2 * math.log(2 / 2) + 1 * math.log(1 / 3)
    ) / 5
    assert got.n_bigrams == 5
    assert abs(got.mean_nll - expect) < 1e-6, (got.mean_nll, expect)


def test_bigram_nll_order_sensitivity(spark):
    """The property unigram NLL lacks: a doc whose transitions follow
    the corpus patterns scores LOWER than one with the same unigram
    mix but scrambled order."""
    from alerta_spark.ops.dedupe import release_cached
    from alerta_spark.ops.text import bigram_nll

    rows = [(i, "the cat sat on the mat") for i in range(1, 9)]
    rows.append((9, "mat the on sat cat the"))  # same tokens, shuffled
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.mean_nll for r in bigram_nll(df).collect()}
    release_cached()
    assert got[9] > got[1]


def test_ahash_near_dups_match_bruteforce(spark):
    """Banding candidates + hamming verify == brute-force all-pairs
    hamming <= 6 (the pigeonhole guarantee: <=6 differing bits across
    4 bands leaves at least one band identical). Near-dup docs (e.g.
    whitespace variants) must collide where exact digests differ."""
    from pyspark.sql import functions as F

    from alerta_spark.ops.multimodal import (
        ahash64,
        attach_fake_media,
        media_ahash_near_dups,
    )
    from alerta_spark.sources.lake import load_table

    base_docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # synthesize guaranteed near-dups: one-word edits of real docs
    variants = base_docs.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+", "zzz").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    docs = attach_fake_media(base_docs.unionByName(variants))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in media_ahash_near_dups(docs).collect()
    }
    sigs = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", ahash64(F.col("media")["data"].cast("string")).alias("h")
        ).collect()
    }
    ids = sorted(sigs)
    expect = {
        (a, b, bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= 6
    }
    assert got == expect and len(expect) > 0

    # perceptual property: a small edit keeps the hash close; the
    # exact digest changes completely
    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = base.replace("lazy", "hazy")
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    hs = {
        r.doc_id: r.h
        for r in df.select("doc_id", ahash64(F.col("text")).alias("h")).collect()
    }
    assert bin((hs[1] ^ hs[2]) & (2**64 - 1)).count("1") <= 6


def test_line_df_dedup_semantics(spark):
    from alerta_spark.ops.text import line_df_dedup

    # 'boiler' appears in 3 docs (df=3 > 2) -> dropped everywhere,
    # including its indented variant (trim-normalized df key).
    # 'rare' appears in 2 docs (df=2, not > 2) -> kept.
    # Blank lines are never dropped. Doc 4 is pure boilerplate ->
    # reduced to nothing and dropped from the output.
    df = spark.createDataFrame(
        [
            (1, "boiler\ncontent one\n\nrare"),
            (2, "  boiler  \ncontent two\nrare"),
            (3, "boiler\ncontent three"),
            (4, "boiler"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in line_df_dedup(df, max_doc_freq=2).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["clean_text"] == "content one\n\nrare"
    assert out[1]["n_lines_kept"] == 3
    assert out[1]["n_lines_dropped"] == 1
    assert out[2]["clean_text"] == "content two\nrare"
    assert out[3]["clean_text"] == "content three"


def test_phrase_search_consecutive_only(spark):
    from alerta_spark.ops.text import phrase_search

    df = spark.createDataFrame(
        [
            (1, "big table value here table value end"),  # 2 occurrences
            (2, "table here value"),                      # both terms, not adjacent
            (3, "value table"),                           # wrong order
            (4, "the table value"),                       # 1 occurrence
            (5, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(df, "table value").collect()
    }
    assert got == {1: 2, 4: 1}
    # 3-term phrase with a repeated token
    df2 = spark.createDataFrame(
        [(1, "go go go stop go go"), (2, "go stop go")],
        "doc_id long, text string",
    )
    got2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(df2, "go go").collect()
    }
    assert got2 == {1: 3}
