"""Text-analysis operators for training-data pipelines, over the
``documents`` table (doc_id, text, lang, source, n_chars).

All of these are pure column expressions (whole-stage codegen, no
Python in the hot path) and embarrassingly parallel — no shuffle at
all, so they scale linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """lower + collapse whitespace — the canonical form used by exact
    dedup and fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(normalize_text(col), " ")


def bpe_ish_tokens(col: Column | str) -> Column:
    """A BPE-ish regex tokenization: words, numbers, and single
    punctuation marks as separate tokens (GPT-2-style pre-tokenizer
    shape, public regex idiom)."""
    return F.regexp_extract_all(
        _c(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens +
    char counts, per document."""
    toks = tokenize(text_col)
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(bpe_ish_tokens(text_col)).alias("n_bpe_tokens"),
        F.length(_c(text_col)).alias("n_chars_measured"),
    )


# Tiny public stopword markers per language — enough for an n-gram/
# stopword-ratio heuristic language ID (the standard trick; see e.g.
# the langid literature). Deterministic and SQL-expressible.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "los", "una", "es"],
    "fr": ["le", "la", "les", "des", "est", "une", "et"],
}


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def language_cols(text_col: str | Column = "text") -> tuple[Column, Column]:
    """(lang_pred, lang_score) column pair over ``text_col`` — the
    column form of :func:`language_id`, for composing the prediction
    into an existing projection WITHOUT a self-join on the doc key
    (adjacent projections collapse in Catalyst, so the resulting plan
    is identical to language_id's two-stage select)."""
    toks = tokenize(text_col)
    langs = sorted(LANG_MARKERS)
    scores = {code: _marker_hits(toks, LANG_MARKERS[code]) for code in langs}
    best = F.greatest(*[scores[code] for code in langs])
    pick = F.when(best <= 0, F.lit("und"))
    for code in langs:  # asc order => deterministic tie-break
        pick = pick.when(scores[code] == best, F.lit(code))
    return pick, best


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-marker hit counts per language,
    argmax with deterministic tie-break (language code asc); 'und'
    (undetermined) when nothing matches."""
    pick, best = language_cols(text_col)
    return df.select(
        "doc_id", pick.alias("lang_pred"), best.alias("lang_score")
    )


# quality heuristics: public-knowledge features (Gopher/C4-style
# filters): token count, mean word length, stopword ratio, digit and
# punctuation character ratios.
_STOPWORDS = LANG_MARKERS["en"] + ["that", "it", "for", "on", "with", "as"]


def quality_cols(text_col: str | Column = "text") -> dict[str, Column]:
    """The final (rounded) quality columns of :func:`quality_score`,
    keyed by output name — the column form, for composing a subset of
    the features into an existing projection without a self-join."""
    t = _c(text_col)
    toks = tokenize(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    mean_word_len = (
        F.when(n_tokens > 0, (F.length(normalize_text(text_col)) - (n_tokens - 1)) / n_tokens)
        .otherwise(F.lit(0.0))
        .cast("double")
    )
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    stop_ratio = (
        F.when(n_tokens > 0, F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))) / n_tokens)
        .otherwise(F.lit(0.0))
        .cast("double")
    )
    digit_ratio = (
        F.when(n_chars > 0, (n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))) / n_chars)
        .otherwise(F.lit(0.0))
        .cast("double")
    )
    punct_ratio = (
        F.when(n_chars > 0, (n_chars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))) / n_chars)
        .otherwise(F.lit(0.0))
        .cast("double")
    )
    len_ok = F.when((n_tokens >= 10) & (n_tokens <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    stop_signal = F.least(stop_ratio * F.lit(10.0), F.lit(1.0))
    score = (
        F.lit(0.25) * len_ok
        + F.lit(0.25) * word_len_ok
        + F.lit(0.3) * stop_signal
        + F.lit(0.2) * (F.lit(1.0) - F.least(digit_ratio + punct_ratio, F.lit(1.0)))
    )
    return {
        "n_tokens": n_tokens,
        "mean_word_len": F.round(mean_word_len, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "digit_ratio": F.round(digit_ratio, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite [0,1] score.

    score = 0.25*len_ok + 0.25*word_len_ok + 0.3*stopword_signal
          + 0.2*(1 - symbol_noise)
    with every feature a deterministic ratio (matches the oracle SQL
    bit-for-bit since all math is double on both sides).
    """
    cols = quality_cols(text_col)
    return df.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of the normalized text (stable
    across engines) + Spark's xxhash64 (cheap 64-bit content key for
    joins/bucketing at scale)."""
    norm = normalize_text(text_col)
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xxh64"),
    )


# Conservative, engine-portable PII patterns (identical semantics in
# Java regex and DuckDB's RE2): email, dotted-quad IPv4, US-style
# 7-digit phone tail. Redaction before training is a standard lake
# hygiene pass; patterns are intentionally simple and auditable —
# swap in org-specific ones at deploy time.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{4}\b",
}


def repetition_stats(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style intra-document repetition signals: per document,
    the fraction of duplicate token n-grams and the share of the single
    most frequent n-gram — the standard filters for boilerplate and
    degenerate (looping) text. Documents with fewer than ``n`` tokens
    emit no row (they have no n-gram).

    Shape: posexplode + (n-1) window leads (each token produced and
    read once — no per-element lambda re-tokenization), then two
    aggregations that REUSE the window's hash partitioning on the doc
    id (grouping keys (_id, g) and (_id) are both clustered by _id), so
    the whole op is ONE exchange. Fractions are a single IEEE division
    of exact integer counts — bit-identical across engines."""
    from pyspark.sql import Window as W

    tok = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokenize(text_col)).alias("pos", "tok"),
    )
    w = W.partitionBy("_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, n)]
    ng = tok.select(
        "_id",
        F.concat_ws(" ", F.col("tok"), *leads).alias("g"),
        leads[-1].alias("_last"),
    ).where(F.col("_last").isNotNull())
    counts = ng.groupBy("_id", "g").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c")
    distinct = F.count(F.lit(1))
    top = F.max("c")
    return (
        counts.groupBy("_id")
        .agg(
            total.alias("total_ngrams"),
            distinct.alias("distinct_ngrams"),
            top.alias("top_ngram_count"),
        )
        .select(
            F.col("_id").alias(id_col),
            "total_ngrams",
            "distinct_ngrams",
            "top_ngram_count",
            (
                (F.col("total_ngrams") - F.col("distinct_ngrams"))
                / F.col("total_ngrams")
            ).alias("dup_ngram_frac"),
            (F.col("top_ngram_count") / F.col("total_ngrams")).alias(
                "top_ngram_frac"
            ),
        )
    )


def vocab_top_terms(
    df: DataFrame,
    top_n: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary: top-N terms by total frequency, with document
    frequency (the tf/df pair every tokenizer-training and IDF pipeline
    starts from). Terms are lowercase [a-z0-9] runs — identical to
    DuckDB's ``string_split_regex(lower(text), '[^a-z0-9]+')``.

    Plan shape: Generate(explode) -> partial count -> one shuffle on
    term -> TakeOrderedAndProject. ``countDistinct(id)`` rides the same
    aggregate (Expand), so doc frequency costs no extra shuffle. The
    (tf DESC, term ASC) sort makes the top-N cut deterministic under
    ties. Integer outputs only — exact across engines."""
    c = _c(text_col)
    term = F.explode(
        F.filter(
            F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != F.lit("")
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"), term.alias("term"))
        .groupBy("term")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("_id").alias("doc_freq"),
        )
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(top_n)
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", token: str = "[PII]"
) -> DataFrame:
    """Redact PII spans and count them per category — one map-only
    projection (no shuffle, no UDF): ``regexp_count`` per pattern plus
    chained ``regexp_replace``. Order matters: email first so its
    domain dots are not half-eaten by the ipv4 pattern."""
    redacted = _c(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(F.regexp_count(_c(text_col), F.lit(pat)).alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select(
        "doc_id",
        redacted.alias("text_redacted"),
        *counts,
    )


def corpus_composition(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus composition report: per-(source, lang) document, token,
    and character counts plus each stratum's share of the corpus — the
    numbers a training-data card publishes and a mix-rebalance
    (``stratified_deterministic_sample``) takes as input.

    One partial-aggregated shuffle on the grouping key does all the
    counting; the share divisions ride a single-partition window over
    the tiny aggregated frame (|strata| rows, never the corpus).
    Shares are one IEEE division of two exact BIGINTs — deterministic
    across engines."""
    from pyspark.sql import Window as W

    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokenize(text_col))).alias("n_tokens"),
        F.sum(F.length(text_col)).alias("n_chars"),
    )
    # corpus totals as a broadcast 1-row cross-join instead of an
    # unpartitioned window (WindowExec warns on every run and its
    # single-partition pass is a smell even on tiny frames). The
    # strata aggregate is persisted so BOTH branches read the cached
    # |strata|-row frame — the corpus is scanned exactly once (without
    # the persist, column pruning specializes each branch's partial
    # aggregate and exchange reuse cannot kick in -> two full scans).
    from alerta_spark.ops.dedupe import _persist

    g = _persist(g)
    totals = g.agg(
        F.sum("n_docs").alias("_total_docs"),
        F.sum("n_tokens").alias("_total_tokens"),
    )
    return g.crossJoin(F.broadcast(totals)).select(
        *group_cols,
        "n_docs",
        "n_tokens",
        "n_chars",
        (F.col("n_docs").cast("double") / F.col("_total_docs")).alias("doc_share"),
        (F.col("n_tokens").cast("double") / F.col("_total_tokens")).alias(
            "token_share"
        ),
    )


def _lm_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per token INSTANCE: (doc id, term). Same lowercase
    [a-z0-9]-run tokenization as :func:`vocab_top_terms` so the LM
    vocabulary and the tf/df report describe the same token stream."""
    term = F.explode(
        F.filter(
            F.split(F.lower(_c(text_col)), "[^a-z0-9]+"), lambda t: t != F.lit("")
        )
    )
    return df.select(F.col(id_col).alias("_id"), term.alias("term"))


def unigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000_000,
) -> DataFrame:
    """CCNet-style corpus-LM quality score: per document, the mean
    negative log-likelihood of its tokens under the corpus's own
    unigram model (-1/n * Σ ln(c_t / N)). Low = stereotypical fluent
    text, high = rare-token noise — the standard pretraining
    perplexity-filter signal, with the corpus itself as the LM.

    Cross-engine determinism: a float Σ ln p over arbitrary row order
    diverges at the ulp between engines, so each term's log-count is
    QUANTIZED once (floor(ln(c) * quant) — a per-row double op on
    identical inputs) and the per-document sum runs on exact BIGINTs.
    The one final expression (n*lnN_q - Σq)/quant/n is two IEEE ops on
    identical operands. Quantization error ≤ n/quant nats — 1e-9 per
    token — irrelevant to any filtering decision and the price of a
    hashable cross-engine gate.

    Plan: explode -> one term-keyed count aggregate (map-side partial;
    the vocabulary frame is persisted because it feeds both the join
    and the 1-row total) -> term-keyed join back to token instances
    (AQE splits hot-term skew) -> one doc-keyed sum. The corpus text is
    scanned once per side of the join lineage; at lake scale the vocab
    frame is the natural checkpoint table."""
    from alerta_spark.ops.dedupe import _persist

    toks = _lm_terms(df, text_col, id_col)
    vocab = _persist(toks.groupBy("term").agg(F.count("*").alias("_c")))
    total = vocab.agg(F.sum("_c").alias("_n_corpus"))
    q = F.floor(F.log(F.col("_c").cast("double")) * F.lit(float(quant))).cast(
        "long"
    )
    scored = (
        toks.join(vocab.select("term", q.alias("_q")), "term")
        .groupBy("_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("_q").alias("_sq"))
    )
    lnN_q = F.floor(
        F.log(F.col("_n_corpus").cast("double")) * F.lit(float(quant))
    ).cast("long")
    return scored.crossJoin(F.broadcast(total)).select(
        F.col("_id").alias(id_col),
        "n_tokens",
        (
            (
                (F.col("n_tokens") * lnN_q - F.col("_sq")).cast("double")
                / F.lit(float(quant))
            )
            / F.col("n_tokens").cast("double")
        ).alias("mean_nll"),
    )


def unigram_nll_totals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000_000,
) -> DataFrame:
    """The exact-integer face of :func:`unigram_nll`: per document,
    the TOTAL quantized NLL (nll_total_q = n·qln(N) − Σ qln(c_t),
    nano-nats x n) and the token count, WITHOUT the final float
    division — so downstream consumers (tier cuts, weighted sums) can
    compare means by integer cross-multiplication (nll_q < T·n)
    instead of materializing a per-doc float. Same plan shape as
    unigram_nll."""
    from alerta_spark.ops.dedupe import _persist

    toks = _lm_terms(df, text_col, id_col)
    vocab = _persist(toks.groupBy("term").agg(F.count("*").alias("_c")))
    total = vocab.agg(F.sum("_c").alias("_n_corpus"))
    q = F.floor(F.log(F.col("_c").cast("double")) * F.lit(float(quant))).cast(
        "long"
    )
    scored = (
        toks.join(vocab.select("term", q.alias("_q")), "term")
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("_q").cast("long").alias("_sq"),
        )
    )
    lnN_q = F.floor(
        F.log(F.col("_n_corpus").cast("double")) * F.lit(float(quant))
    ).cast("long")
    return scored.crossJoin(F.broadcast(total)).select(
        F.col("_id").alias(id_col),
        "n_tokens",
        (F.col("n_tokens") * lnN_q - F.col("_sq"))
        .cast("long")
        .alias("nll_total_q"),
    )


def token_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000_000,
) -> DataFrame:
    """Per-document Shannon entropy of the document's OWN token
    distribution: H = ln(n) - (1/n) Σ c_t ln(c_t). Near-zero entropy
    means degenerate repetition (the keyboard-mash and looping-
    generation failure mode); high entropy tracks lexical diversity —
    a standard corpus-quality feature next to the Gopher repetition
    fractions.

    Same fixed-point discipline as :func:`unigram_nll` — and EVERY ln
    is quantized, including the final ln(n): JVM Math.log and C libm
    log legitimately differ by 1 ulp on some inputs (observed on
    ln(74)), so the whole entropy numerator n*lnq(n) - Σ c*lnq(c) is
    assembled in exact BIGINTs and cast to double exactly once. Two
    aggregates — (doc, term) counts, then per-doc sums — each with
    map-side partials."""
    toks = _lm_terms(df, text_col, id_col)
    counts = toks.groupBy("_id", "term").agg(F.count("*").alias("_c"))
    cq = (
        F.col("_c")
        * F.floor(F.log(F.col("_c").cast("double")) * F.lit(float(quant))).cast(
            "long"
        )
    ).alias("_cq")
    per_doc = counts.select("_id", "_c", cq).groupBy("_id").agg(
        F.sum("_c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum("_cq").alias("_scq"),
    )
    n_d = F.col("n_tokens").cast("double")
    ln_n_q = F.floor(F.log(n_d) * F.lit(float(quant))).cast("long")
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        (
            (F.col("n_tokens") * ln_n_q - F.col("_scq")).cast("double")
            / F.lit(float(quant))
            / n_d
        ).alias("entropy"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000_000,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf — the
    keyword-extraction / retrieval-weighting primitive. Returns
    (id, term, rank, tfidf) with rank 1..k per doc.

    tf = c/n (per-doc term share), idf = ln(N/df) with the ln quantized
    to fixed-point (the same 1-ulp JVM-vs-libm hazard as unigram_nll);
    the ranking key c * idf_q is an exact BIGINT, so ordering — and
    therefore the top-k cut — is identical across engines, with ties
    broken on the term string. The emitted tfidf value is one exact
    division chain on identical operands.

    Plan: (doc, term) count aggregate -> term-keyed df aggregate joined
    back (both map-side partial-aggregated) -> broadcast N -> one
    per-doc window for the rank. Four exchanges, all key-partitioned;
    nothing corpus-sized crosses the driver."""
    from pyspark.sql import Window as W

    from alerta_spark.ops.dedupe import _persist

    toks = _lm_terms(df, text_col, id_col)
    counts = _persist(
        toks.groupBy("_id", "term").agg(F.count("*").alias("_c"))
    )
    docfreq = counts.groupBy("term").agg(F.count("*").alias("_df"))
    ndocs = counts.select("_id").distinct().agg(
        F.count("*").alias("_n_docs")
    )
    idf_q = F.floor(
        F.log(F.col("_n_docs").cast("double") / F.col("_df").cast("double"))
        * F.lit(float(quant))
    ).cast("long")
    # doc length as a sum-window over the _id partitioning the rank
    # window below already establishes (doc-bounded partitions, skew-
    # safe) — one aggregate exchange + one join fewer than the old
    # groupBy(_id)+join-back pair; same exact BIGINT sum row-for-row
    scored = (
        counts.join(docfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "_id",
            "term",
            "_c",
            F.sum("_c").over(W.partitionBy("_id")).alias("_n"),
            (F.col("_c") * idf_q).alias("_score_q"),
        )
    )
    w = W.partitionBy("_id").orderBy(F.desc("_score_q"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            "term",
            F.col("rank").cast("long").alias("rank"),
            (
                (F.col("_score_q").cast("double") / F.lit(float(quant)))
                / F.col("_n").cast("double")
            ).alias("tfidf"),
        )
    )


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    banned_substrings: tuple[str, ...] = (),
    min_lines_kept: int = 1,
) -> DataFrame:
    """C4-style line-level cleaning: drop lines with fewer than
    ``min_words`` single-space-separated words or containing any
    banned substring (boilerplate markers: 'lorem ipsum',
    'javascript', cookie notices, ...), then drop documents with
    fewer than ``min_lines_kept`` surviving lines.

    Pure codegen (split → filter lambda → array_join): map-only, no
    shuffle, no Python — the shape every doc-level gate in this repo
    uses. Input is expected whitespace-normalized within lines (one
    space between words), as produced by normalize_text or the
    tokenizing chunkers.

    -> [id_col, clean_text, n_lines_kept, n_lines_dropped].
    """
    lines = F.split(F.col(text_col), "\n")

    def line_ok(ln: Column) -> Column:
        ok = F.size(F.split(ln, " ")) >= min_words
        for b in banned_substrings:
            ok = ok & ~ln.contains(b)
        return ok

    keep = F.filter(lines, line_ok)
    return (
        df.select(
            F.col(id_col),
            F.array_join(keep, "\n").alias("clean_text"),
            F.size(keep).cast("long").alias("n_lines_kept"),
            (F.size(lines) - F.size(keep)).cast("long").alias("n_lines_dropped"),
        )
        .where(F.col("n_lines_kept") >= min_lines_kept)
    )


# Small public English stopword list for RAKE phrase boundaries
# (Rose et al. 2010's method uses any stopword lexicon; this is the
# usual high-frequency core, deterministic and regex-embeddable).
RAKE_STOPWORDS: list[str] = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "were", "be", "on", "for", "with", "as", "that", "it",
    "at", "by", "this", "from", "but", "not", "have", "has",
]


def rake_keyphrases(
    df: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    max_words: int = 4,
    k: int = 20,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal runs between stopwords/punctuation; each word scores
    degree/freq over ALL phrase occurrences (degree = sum of the
    lengths of phrases it appears in); a phrase scores the sum of its
    words' scores. Cross-engine exactness: the per-word ratio is
    quantized to BIGINT via integral division (degree·1e6 DIV freq)
    BEFORE the phrase sum, so no float accumulation order exists.

    Scale shape: two corpus scans' worth of map-side splitting, one
    vocab-sized word aggregate, one phrase aggregate, one join on the
    word key — no quadratic anywhere; phrase/vocab frames are
    token-sized, not corpus-sized.

    -> top-k [phrase, n_words, phrase_freq, score_q] by score desc.
    """
    sw = stopwords or RAKE_STOPWORDS
    pat = r"\b(?:%s)\b" % "|".join(sw)
    s = F.regexp_replace(F.lower(_c(text_col)), "[^a-z0-9 ]+", "|")
    s = F.regexp_replace(s, pat, "|")
    # ph feeds the word stats AND the phrase counts: persist the
    # phrase rows or both re-run the two corpus regexes + explode
    ph = (
        df.select(F.explode(F.split(s, r"\|")).alias("p"))
        .select(F.trim(F.regexp_replace("p", " +", " ")).alias("phrase"))
        .where(
            (F.col("phrase") != "")
            & (F.size(F.split("phrase", " ")) <= max_words)
        )
        .persist()
    )
    pw = ph.select(
        "phrase",
        F.size(F.split("phrase", " ")).cast("long").alias("plen"),
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    wq = (
        pw.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("degree"),
        )
        .select(
            "w",
            F.expr(
                "(degree * CAST(1000000 AS BIGINT)) div freq"
            ).alias("sq"),
        )
    )
    dp = ph.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("phrase_freq")
    )
    dpw = dp.select(
        "phrase", F.explode(F.split("phrase", " ")).alias("w")
    )
    ps = (
        dpw.join(wq, "w")
        .groupBy("phrase")
        .agg(F.sum("sq").cast("long").alias("score_q"))
    )
    return (
        ps.join(dp, "phrase")
        .select(
            "phrase",
            F.size(F.split("phrase", " ")).cast("long").alias("n_words"),
            "phrase_freq",
            "score_q",
        )
        .orderBy(F.desc("score_q"), F.asc("phrase"))
        .limit(k)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000,
    score_quant: int = 1_000_000,
) -> DataFrame:
    """BM25 top-k document retrieval for a bag of query terms — the
    classic lexical-retrieval primitive (k1=1.2, b=0.75), the scorer
    behind every "find me training docs about X" probe and the hard
    baseline for the ANN ops in ops/similarity.

    Scale shape — the inverted-index probe: the corpus is tokenized
    ONCE into a single map-side-combined per-doc aggregate carrying dl
    plus the |Q| query-term tfs, so only one (doc, dl, tf_1..tf_|Q|)
    row per doc per partition ever shuffles; the posting view is a
    |Q|-way explode of that doc-sized frame filtered to tf > 0, so
    only |Q|-term rows reach the scoring join. The
    final cut is ``orderBy(...).limit(k)`` — Spark's
    TakeOrderedAndProject, per-partition heaps merged on the driver,
    never a single-partition global window.

    Cross-engine determinism (the fixed-point discipline of
    :func:`unigram_nll`): idf = ln((2N - 2df + 1)/(2df + 1))
    (the standard +0.5-smoothed form with the halves cleared) is
    quantized once per query term from exact BIGINTs; each
    (doc, term) partial score

        (idf_q/quant) * tf * 2.2 / (tf + 0.3 + 0.9 * (dl*N)/T)

    is an identical elementwise IEEE chain on exact integer inputs on
    both engines, quantized to ``score_quant`` fixed-point, and the
    per-document total is summed in exact BIGINTs — so the ranking key
    (and therefore the top-k cut, tie-broken on id) is engine-exact.
    dl*N stays below 2^53 for any realistic doc length and corpus;
    beyond that, pre-divide dl by a constant.
    """
    from alerta_spark.ops.dedupe import _persist

    toks = _lm_terms(df, text_col, id_col)
    # ONE corpus tokenization pass (r10): dl and the |Q| query-term
    # tfs come out of a single map-side-combined per-doc aggregate —
    # the old shape tokenized once for doclen (feeding totals AND the
    # scoring join) and again for the IN-filtered posting counts.
    # The shuffle still carries one (doc, dl, tf_1..tf_|Q|) row per
    # doc per partition; the posting view below is a |Q|-way explode
    # of the persisted doc-sized frame, so "only |Q|-term rows reach
    # the scoring join" survives the fusion.
    terms = list(dict.fromkeys(query_terms))
    per_doc = _persist(
        toks.groupBy("_id").agg(
            F.count("*").alias("_dl"),
            *[
                F.sum(
                    F.when(F.col("term") == F.lit(t), 1).otherwise(0)
                ).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
    )
    totals = per_doc.agg(
        F.count("*").alias("_n_docs"), F.sum("_dl").alias("_t_corpus")
    )
    qcounts = (
        per_doc.select(
            "_id",
            "_dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.col(f"_tf{i}").alias("_tf"),
                        )
                        for i, t in enumerate(terms)
                    ]
                )
            ).alias("_e"),
        )
        .select(
            "_id", "_dl", F.col("_e.term").alias("term"), F.col("_e._tf").alias("_tf")
        )
        .where(F.col("_tf") > 0)
    )
    docfreq = (
        qcounts.groupBy("term")
        .agg(F.count("*").alias("_df"))
        .crossJoin(F.broadcast(totals.select("_n_docs")))
    )
    idf_q = F.floor(
        F.log(
            (2 * F.col("_n_docs") - 2 * F.col("_df") + 1).cast("double")
            / (2 * F.col("_df") + 1).cast("double")
        )
        * F.lit(float(quant))
    ).cast("long")
    ratio = (F.col("_dl") * F.col("_n_docs")).cast("double") / F.col(
        "_t_corpus"
    ).cast("double")
    tf_d = F.col("_tf").cast("double")
    part = (
        (F.col("_idf_q").cast("double") / F.lit(float(quant)))
        * (tf_d * F.lit(2.2))
        / (tf_d + (F.lit(0.3) + F.lit(0.9) * ratio))
    )
    scored = (
        qcounts.join(F.broadcast(docfreq.select("term", idf_q.alias("_idf_q"))), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "_id",
            F.floor(part * F.lit(float(score_quant))).cast("long").alias("_pq"),
        )
    )
    doc_scores = scored.groupBy("_id").agg(
        F.count("*").alias("n_terms_matched"), F.sum("_pq").alias("_sq")
    )
    return (
        doc_scores.orderBy(F.desc("_sq"), F.asc("_id"))
        .limit(k)
        .select(
            F.col("_id").alias(id_col),
            F.col("n_terms_matched").cast("long").alias("n_terms_matched"),
            (F.col("_sq").cast("double") / F.lit(float(score_quant))).alias(
                "bm25"
            ),
        )
    )


def token_js_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000_000,
) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    two corpora — the drift monitor between train and eval splits, two
    snapshot dates, or two sources (0 = identical mix, ln 2 ≈ 0.693 =
    disjoint vocabularies). One row out:
    (n_terms_a, n_terms_b, n_shared_terms, jsd).

    Every log argument is a ratio of exact integers — with P = a/A,
    Q = b/B, M = (P+Q)/2:  p/m = 2aB/(aB + bA)  — so each per-term
    ln is quantized from identical BIGINT inputs (absent terms fall
    out naturally: b=0 gives arg exactly 2), the Σ a·lnq accumulates
    as exact BIGINTs, and JSD emerges from one final double chain on
    identical operands. a·B stays below 2^63 up to ~3e9-token sides;
    beyond that, pre-scale the counts.

    Plan: one term-count aggregate per side, a term-keyed full outer
    join (vocab-sized, never corpus-sized), one partial-aggregated
    global sum to a single row.
    """
    def counts(df: DataFrame, side: str) -> DataFrame:
        return (
            _lm_terms(df, text_col, id_col)
            .groupBy("term")
            .agg(F.count("*").alias(side))
        )

    return js_divergence_from_counts(
        counts(df_a, "_a"), counts(df_b, "_b"), quant=quant
    )


def js_divergence_from_counts(
    ca: DataFrame,
    cb: DataFrame,
    quant: int = 1_000_000_000,
) -> DataFrame:
    """JSD from two pre-aggregated term-count frames — the entry point
    the incremental/streaming drift monitor uses (its baseline side is
    a persisted count store, not a corpus). ``ca``/``cb`` are
    (term, _a) and (term, _b); same math and guarantees as
    :func:`token_js_divergence`."""
    from alerta_spark.ops.dedupe import _persist
    # persisted: feeds both the totals row and the scored pass — the
    # vocab-sized frame is the natural checkpoint, not the corpus scans
    joined = _persist(
        ca.join(cb, "term", "full_outer").select(
            F.coalesce(F.col("_a"), F.lit(0)).alias("_a"),
            F.coalesce(F.col("_b"), F.lit(0)).alias("_b"),
        )
    )

    def lnq(num, den):
        return F.floor(
            F.log(num.cast("double") / den.cast("double")) * F.lit(float(quant))
        ).cast("long")

    # totals A and B ride along exactly via window-free global sums:
    # aggregate everything in ONE pass (sums of a, b, and the two
    # weighted quantized-ln terms need A and B first, so two stages).
    totals = joined.agg(
        F.sum("_a").alias("_ta"), F.sum("_b").alias("_tb")
    )
    with_tot = joined.crossJoin(F.broadcast(totals))
    den = F.col("_a") * F.col("_tb") + F.col("_b") * F.col("_ta")
    wa = F.when(
        F.col("_a") > 0,
        F.col("_a") * lnq(2 * F.col("_a") * F.col("_tb"), den),
    ).otherwise(F.lit(0))
    wb = F.when(
        F.col("_b") > 0,
        F.col("_b") * lnq(2 * F.col("_b") * F.col("_ta"), den),
    ).otherwise(F.lit(0))
    agg = with_tot.groupBy("_ta", "_tb").agg(
        F.sum((F.col("_a") > 0).cast("long")).alias("n_terms_a"),
        F.sum((F.col("_b") > 0).cast("long")).alias("n_terms_b"),
        F.sum(((F.col("_a") > 0) & (F.col("_b") > 0)).cast("long")).alias(
            "n_shared_terms"
        ),
        F.sum(wa).alias("_swa"),
        F.sum(wb).alias("_swb"),
    )
    qd = F.lit(float(quant))
    return agg.select(
        "n_terms_a",
        "n_terms_b",
        "n_shared_terms",
        (
            F.col("_swa").cast("double")
            / (F.lit(2.0) * F.col("_ta").cast("double") * qd)
            + F.col("_swb").cast("double")
            / (F.lit(2.0) * F.col("_tb").cast("double") * qd)
        ).alias("jsd"),
    )


def chunk_into_lines(
    df: DataFrame,
    text_col: str = "text",
    words_per_line: int = 8,
) -> DataFrame:
    """Rewrite single-line text as newline-separated lines of
    ``words_per_line`` words — a deterministic 'liner' for corpora
    without layout (and the fixture generator for line-level ops over
    the synthetic documents table). Map-only codegen."""
    toks = F.split(F.col(text_col), " ")
    n = words_per_line
    nlines = F.ceil(F.size(toks) / F.lit(float(n))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.array_join(F.slice(toks, i * n + 1, n), " "),
    )
    return df.withColumn(text_col, F.array_join(lines, "\n"))


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000_000,
) -> DataFrame:
    """Bigram-LM fluency score: per document, the mean negative
    log-likelihood of its token transitions under the corpus's own
    MLE bigram model, -1/(n-1) Σ ln(c(w_{i-1}w_i) / c(w_{i-1}·)) —
    the stronger cousin of :func:`unigram_nll` (word-order sensitivity:
    shuffled text scores high even when its unigram mix is typical).
    Documents with fewer than 2 tokens emit no row.

    Cross-engine determinism: each distinct bigram's ln(c_pair/c_ctx)
    is a ratio of exact BIGINTs quantized once on the (vocab-sized)
    pair frame; per-document accumulation is exact; one final double
    chain. Same discipline as every ln in this module.

    Plan: bigram construction is MAP-ONLY (zip_with over two slices of
    the token array — no window, no shuffle), then one pair-count
    aggregate (persisted: feeds the context rollup and the instance
    join), a tiny ctx aggregate, a pair-keyed join back to instances
    (AQE splits hot-pair skew), and one doc-keyed sum."""
    from alerta_spark.ops.dedupe import _persist

    toks = F.filter(
        F.split(F.lower(_c(text_col)), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    inst = df.select(
        F.col(id_col).alias("_id"), F.explode(pairs).alias("pg")
    )
    pv = _persist(inst.groupBy("pg").agg(F.count("*").alias("_cp")))
    cv = pv.groupBy(F.split(F.col("pg"), " ")[0].alias("_w1")).agg(
        F.sum("_cp").alias("_cc")
    )
    qv = F.floor(
        F.log(F.col("_cp").cast("double") / F.col("_cc").cast("double"))
        * F.lit(float(quant))
    ).cast("long")
    scored_vocab = pv.join(
        cv, F.split(F.col("pg"), " ")[0] == F.col("_w1")
    ).select("pg", qv.alias("_qv"))
    per_doc = inst.join(scored_vocab, "pg").groupBy("_id").agg(
        F.count("*").alias("n_bigrams"), F.sum("_qv").alias("_sq")
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        (
            (-F.col("_sq")).cast("double")
            / F.lit(float(quant))
            / F.col("n_bigrams").cast("double")
        ).alias("mean_nll"),
    )


def nb_class_scores(
    df: DataFrame,
    label_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000,
) -> DataFrame:
    """Full per-(document, class) quantized Naive-Bayes log-score
    table — the training half of `naive_bayes_source` without the
    argmax, exposed so consumers that need the whole score matrix
    (confident-learning label-noise screens, calibration readouts)
    don't retrain. Semantics and exactness identical to
    `naive_bayes_source` (which is now its argmax).

    -> [_id, _cls, _score] (score quantized x`quant`, exact BIGINT).
    """
    from alerta_spark.ops.dedupe import _persist

    toks = _lm_terms(df, text_col, id_col)
    # class priors from doc counts
    priors = df.groupBy(F.col(label_col).alias("_cls")).agg(
        F.count(F.lit(1)).alias("_docs")
    )
    n_docs = df.count()
    # per-(class, term) token counts — training
    labeled = toks.join(
        df.select(F.col(id_col).alias("_id"), F.col(label_col).alias("_cls")),
        "_id",
    )
    ct = _persist(
        labeled.groupBy("_cls", "term").agg(F.count(F.lit(1)).alias("_ctc"))
    )
    vocab_n = ct.select("term").distinct().count()
    class_tot = ct.groupBy("_cls").agg(F.sum("_ctc").alias("_tc"))

    def lnq(num, den):
        return F.floor(
            F.log(num.cast("double") / den.cast("double")) * F.lit(float(quant))
        ).cast("long")

    # full (class x distinct term) likelihood table incl. unseen terms
    classes = priors.select("_cls")
    full = (
        ct.select("term").distinct().crossJoin(F.broadcast(classes))
        .join(ct, ["_cls", "term"], "left")
        .join(F.broadcast(class_tot), "_cls")
        .select(
            "_cls",
            "term",
            lnq(
                F.coalesce(F.col("_ctc"), F.lit(0)) + F.lit(1),
                F.col("_tc") + F.lit(vocab_n),
            ).alias("_lq"),
        )
    )
    prior_q = priors.select(
        "_cls", lnq(F.col("_docs"), F.lit(n_docs)).alias("_pq")
    )
    # fan out DISTINCT (doc, term) counts -- not token instances -- to
    # the class dimension: the xN_classes join input shrinks from corpus
    # token count to distinct (doc, term) pairs
    dtc = toks.groupBy("_id", "term").agg(F.count("*").alias("_n"))
    return (
        dtc.join(full, "term")
        .groupBy("_id", "_cls")
        .agg(F.sum(F.col("_n") * F.col("_lq")).alias("_sl"))
        .join(F.broadcast(prior_q), "_cls")
        .select("_id", "_cls", (F.col("_sl") + F.col("_pq")).alias("_score"))
    )


def naive_bayes_source(
    df: DataFrame,
    label_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000,
) -> DataFrame:
    """Multinomial Naive Bayes trained on the corpus's own labels and
    applied back to every document — the classic source/domain
    classifier as a pure DataFrame train+predict loop (no MLlib, no
    Python): score(d, c) = lnq P(c) + Σ_t lnq P(t|c) with add-one
    smoothing, argmax with label-asc tie-break.

    Every probability is a ratio of exact BIGINTs (class doc counts /
    N; (c_tc + 1) / (T_c + V)), so each lnq is quantized once on the
    (class x term) vocab frame, per-document scores accumulate as
    exact BIGINTs, and the argmax — one (doc)-keyed min_by on the
    (negated score, label) struct — is engine-identical.

    Two bounded driver-side scalars (corpus doc count, vocab size)
    are computed eagerly — each is one aggregate job returning one
    number, the NB smoothing constants.

    Plan: one (label, term) count aggregate + tiny per-class totals
    broadcast; the scoring join fans each token instance out to
    n_classes rows (bounded small multiplier), one doc-keyed argmax
    aggregate. -> [doc_id, pred_source, best_score].
    """
    scored = nb_class_scores(df, label_col, text_col, id_col, quant)
    # argmax with label-ASC tie-break: min_by over the struct
    # (negated score, label) — struct comparison is lexicographic, so
    # the minimum is the highest score, then the smallest label.
    best = scored.groupBy("_id").agg(
        F.min_by(
            F.struct(F.col("_cls").alias("c"), F.col("_score").alias("s")),
            F.struct((-F.col("_score")).alias("ns"), F.col("_cls").alias("c")),
        ).alias("_b")
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.col("_b.c").alias("pred_" + label_col),
        (F.col("_b.s").cast("double") / F.lit(float(quant))).alias("best_score"),
    )


def line_df_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 2,
) -> DataFrame:
    """CCNet-style cross-corpus line deduplication: drop every line
    whose trimmed form appears in more than ``max_doc_freq`` DISTINCT
    documents (site chrome, cookie banners, license headers — the
    boilerplate that survives document-level dedup because the rest of
    each page differs), then reassemble the documents.

    Complements :func:`clean_lines` (per-doc local filters — no corpus
    statistics) and ``corpus_boilerplate_shingles`` (reports frequent
    shingles, doesn't remove them). Reference analogue: none — this is
    the standard web-corpus cleaning pass (CCNet / RefinedWeb publish
    the recipe).

    Plan for 100 TB: one posexplode fan-out (bounded by lines/doc), a
    line-hash aggregate whose OUTPUT is only the frequent lines (tiny:
    df > max_doc_freq survivors), broadcast back as a left_anti join
    (map-side drop — the corpus-sized line stream never shuffles on
    the line key twice), then ONE doc-keyed exchange to reassemble.
    Same asymmetric shape as the hot-shingle cap in ngram_jaccard.

    Blank lines are never dropped (they carry layout, not content).
    A document whose every line is frequent boilerplate reduces to
    nothing and is dropped from the output entirely (the desired
    pipeline behavior — nothing left to train on).
    -> [id_col, clean_text, n_lines_kept, n_lines_dropped].
    """
    lines = F.split(F.col(text_col), "\n")
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.size(lines).alias("_total"),
        F.posexplode(lines).alias("_pos", "_line"),
    ).withColumn("_norm", F.trim(F.col("_line")))
    frequent = (
        ex.where(F.col("_norm") != "")
        .groupBy("_norm")
        .agg(F.count_distinct(F.col("_id")).alias("_df"))
        .where(F.col("_df") > max_doc_freq)
        .select("_norm")
    )
    kept = ex.join(F.broadcast(frequent), "_norm", "left_anti")
    return (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_line"))
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_lines_kept"),
            (F.first("_total") - F.count(F.lit(1))).alias("n_lines_dropped"),
        )
        .select(
            F.col("_id").alias(id_col),
            "clean_text",
            "n_lines_kept",
            "n_lines_dropped",
        )
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-phrase search: docs where the whitespace-normalized
    token stream contains ``phrase``'s tokens CONSECUTIVELY, with the
    occurrence count.

    The scale story (vs a regex/LIKE scan): only rows whose token is
    one of the |Q| phrase terms leave the scan — the filter sits below
    the per-doc aggregate, so the shuffle carries query-term hits, not
    the corpus token stream (the same posting-list discipline as
    bm25_topk; this is the positional-index probe). The consecutive
    check is a JVM higher-order-function expression over each doc's
    collected (pos, term) hits — no Python, no second scan.

    -> [id_col, n_occurrences], only matching docs (count >= 1).
    """
    terms = phrase.split()
    if not terms:
        raise ValueError("phrase must contain at least one token")
    for t in terms:
        if "'" in t:
            raise ValueError(f"phrase token {t!r} contains a quote")
    toks = tokenize(text_col)
    hits = (
        df.select(F.col(id_col).alias("_id"), F.posexplode(toks).alias("_pos", "_t"))
        .where(F.col("_t").isin(terms))
        .groupBy("_id")
        .agg(F.collect_list(F.struct("_pos", "_t")).alias("_hits"))
    )
    anchor = f"filter(_hits, h -> h._t = '{terms[0]}')"
    conds = " and ".join(
        f"exists(_hits, h{j} -> h{j}._t = '{t}' and h{j}._pos = h._pos + {j})"
        for j, t in enumerate(terms[1:], start=1)
    )
    count_expr = (
        f"size(filter({anchor}, h -> {conds}))" if conds else f"size({anchor})"
    )
    return (
        hits.select(
            F.col("_id").alias(id_col),
            F.expr(count_expr).cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") >= 1)
    )
