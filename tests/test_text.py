

def test_rake_keyphrases_scores(spark):
    """Hand-checked RAKE on a two-phrase corpus: 'deep learning' twice
    and 'learning' alone once => freq(learning)=3, degree(learning)=5
    (2+2+1), freq(deep)=2, degree(deep)=4; score is quantized
    degree*1e6 DIV freq; phrase score is the word sum."""
    from alerta_spark.ops.text import rake_keyphrases

    docs = spark.createDataFrame(
        [
            (1, "deep learning is the deep learning."),
            (2, "learning, of course."),
        ],
        "doc_id long, text string",
    )
    out = {r["phrase"]: r for r in rake_keyphrases(docs, k=10).collect()}
    # words: deep (freq 2, degree 4 -> 2000000), learning (freq 3,
    # degree 2+2+1=5 -> 1666666), course (freq 1, degree 1 -> 1000000)
    assert out["deep learning"]["score_q"] == 2000000 + 1666666
    assert out["deep learning"]["phrase_freq"] == 2
    assert out["learning"]["score_q"] == 1666666
    assert out["course"]["score_q"] == 1000000
    # stopwords ('is', 'the', 'of') never appear inside phrases
    assert all(
        w not in ("is", "the", "of")
        for p in out
        for w in p.split(" ")
    )


def test_unigram_nll_totals_matches_mean(spark):
    """nll_total_q/(1e9*n) must equal unigram_nll's mean_nll exactly
    (same quantized machinery, division deferred vs applied)."""
    from alerta_spark.ops.text import unigram_nll, unigram_nll_totals
    from alerta_spark.sources.lake import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    mean = {
        r["doc_id"]: r["mean_nll"] for r in unigram_nll(docs).collect()
    }
    tot = unigram_nll_totals(docs).collect()
    assert len(tot) == len(mean)
    for r in tot:
        recon = (r["nll_total_q"] / 1e9) / r["n_tokens"]
        assert recon == mean[r["doc_id"]], r["doc_id"]
