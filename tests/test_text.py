

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
