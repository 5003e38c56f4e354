"""Deterministic sampling and dataset splitting for training-data
pipelines.

Spark's ``df.sample``/``sampleBy``/``randomSplit`` draw from a
per-task RNG: a retried or re-scheduled task can emit a DIFFERENT
subset, and two runs over the same lake disagree — which at training
scale means silent train/test leakage across pipeline versions. These
operators instead band the md5 of a stable key: membership is a pure
function of the row, so every rerun, every engine (md5 is identical
in Spark and DuckDB — the oracle checks these exactly), and every
retry agrees.

All map-only: no shuffle, no RNG state, fully pushdown-friendly
(the predicate is a string comparison on a hash prefix).

Reference provenance: the reference has no sampling tier (its engine
processes alert batches, alerta.py:168-209 caps at 1000 rows); these
are part of the training-data extension surface, same family as
ops/dedupe and ops/text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of hash space; banding resolution 1/2^32
_SPACE = 16**8


def _threshold(fraction: float) -> str:
    """Lexical threshold for an 8-hex-char bucket. 'g' sorts after
    every hex digit, so fraction >= 1.0 keeps everything (a 9-char
    '100000000' would lexically EXCLUDE buckets starting a-f)."""
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _SPACE), "08x")


def _bucket(key: Column, salt: str) -> Column:
    """The first 8 hex chars of md5(key || salt) — an 8-char lowercase
    hex string, uniform over the 32-bit space, identical across
    engines."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by md5(key) prefix band.

    Deterministic: the same (key, salt) is always in or always out —
    stable under task retry, cluster resize, and engine choice.
    Different ``salt`` values draw independent samples (use a new salt
    per epoch to rotate subsets WITHOUT storing state)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return df
    return df.where(_bucket(F.col(key_col), salt) < F.lit(_threshold(fraction)))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative
    md5-prefix bands (e.g. ``{"train": .8, "eval": .1, "test": .1}``).

    The deterministic analogue of ``randomSplit``: splits are disjoint,
    cover every row, and a row's split never changes across reruns —
    the property that prevents train/test leakage when a pipeline is
    re-executed. Adds a ``split`` column."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = _bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = bucket < F.lit(_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def temperature_mix(
    df: DataFrame,
    source_col: str,
    weight_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-based source rebalancing — the multilingual-LM data
    mix (sample source s with probability proportional to w_s^alpha,
    alpha < 1 flattens the distribution so low-resource sources are
    upweighted relative to their share).

    Per-source totals ``w_s = sum(weight_col)`` (token counts) are
    aggregated exactly (one tiny partial-agg shuffle), scaled to
    ``q_s = w_s^alpha / sum_t w_t^alpha``, and converted to a per-doc
    keep probability ``min(1, budget_frac * N * q_s / n_s)`` targeting
    ``budget_frac * N`` docs overall. Membership is the same md5-band
    pure-row predicate as `deterministic_sample`, so the mix is stable
    under retries and identical across engines.

    Scale shape: the per-source plan is a handful of rows — broadcast
    joined back, so the pass over the corpus stays map-only. For
    ``alpha=0.5`` the scaling uses IEEE sqrt (bit-identical across
    engines — the catalog oracle relies on this); other alphas use
    ``pow``, which is libm-dependent and therefore not oracle-exact.

    Reference provenance: no counterpart (the reference has no
    sampling tier); training-data extension surface.
    """
    if not 0.0 < budget_frac <= 1.0:
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")
    w = F.col("_w").cast("double")
    scaled = F.sqrt(w) if alpha == 0.5 else F.pow(w, F.lit(float(alpha)))
    # NOT persisted (round 11): AQE stage reuse dedupes the totals
    # shuffle map side for the denominator aggregate and the plan
    # projection, and the re-executed reduce is DIMENSION-scale
    # (|sources| rows after map-side partial agg) — near-free at any
    # corpus size. Cold x10 A/B: plain wins 0.581 vs 0.639s
    # (min-of-4).
    totals = (
        df.groupBy(source_col)
        .agg(
            F.sum(F.col(weight_col)).cast("bigint").alias("_w"),
            F.count(F.lit(1)).alias("_n"),
        )
        .withColumn("_sw", scaled)
    )
    # denominator: few-source sum of doubles — accumulate in DECIMAL so
    # the result doesn't depend on aggregation order (engine-portable)
    glob = totals.agg(
        F.sum(F.col("_sw").cast("decimal(28,10)")).cast("double").alias("_denom"),
        F.sum("_n").cast("bigint").alias("_total_n"),
    )
    keep_p = F.least(
        F.lit(1.0),
        F.lit(float(budget_frac))
        * F.col("_total_n").cast("double")
        * (F.col("_sw") / F.col("_denom"))
        / F.col("_n").cast("double"),
    )
    plan = (
        totals.crossJoin(F.broadcast(glob))
        .withColumn("_keep_p", keep_p)
        .select(source_col, "_keep_p")
    )
    u = F.conv(_bucket(F.col(key_col), salt), 16, 10).cast("bigint").cast(
        "double"
    ) / F.lit(float(_SPACE))
    return (
        df.join(F.broadcast(plan), source_col)
        .where(u < F.col("_keep_p"))
        .drop("_keep_p")
    )


def stratified_deterministic_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """``sampleBy`` made deterministic: per-stratum keep fractions via
    the same md5 banding (e.g. downsample boilerplate-heavy sources,
    keep all of scarce ones — the standard training-mix rebalance).
    Strata not listed keep ``default_fraction``."""
    bucket = _bucket(F.col(key_col), salt)
    thresh = None
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1]")
        t = F.lit(_threshold(frac))
        cond = F.col(strata_col).cast("string") == str(stratum)
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        thresh.otherwise(F.lit(_threshold(default_fraction)))
        if thresh is not None
        else F.lit(_threshold(default_fraction))
    )
    return df.where(bucket < thresh)


def shuffled_order(
    df: DataFrame,
    id_col: str = "doc_id",
    shards: int = 8,
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle for training order: every row gets
    a (shard, pos) address under a pseudo-random permutation keyed by
    md5(id || salt). Same corpus + same salt -> identical order on any
    engine, any partitioning, any retry — the reshuffle between
    training epochs is just a new salt.

    Scale shape: the shard assignment is map-only (md5 band of the full
    hash); positions are per-shard window ranks, so the one exchange is
    hash-partitioned by shard and each window sorts only corpus/shards
    rows — no global single-partition sort. Downstream shard writers
    consume (shard, pos) directly as (file, offset)."""
    from pyspark.sql import Window as W

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(shards)
    ).alias("shard")
    out = df.select(F.col(id_col), shard, h.alias("_h"))
    w = W.partitionBy("shard").orderBy("_h", id_col)
    return out.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "",
    salt_buckets: int = 8,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen deterministically:
    the k smallest md5(key || salt) values within each group — the
    distributed, rerun-stable analogue of per-group reservoir sampling
    (a uniform hash induces a uniform random-order rank, but unlike a
    reservoir the pick is a pure row function: identical across
    engines, retries, and partitionings; a new ``salt`` redraws).

    Scale shape: delegates to the two-phase salted top-k
    (operators/topk.py) — a hot group spreads over ``salt_buckets``
    tasks in phase 1 and only k x salt_buckets survivors per group
    reach the final rank, so no single task ever holds a whole group.
    """
    from alerta_spark.operators.topk import topk_per_group_salted

    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return topk_per_group_salted(
        df.withColumn("_h", h),
        [group_col],
        [F.col("_h"), F.col(key_col)],
        k,
        salt_buckets=salt_buckets,
    ).drop("_h")


def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "",
    quant: int = 1_000_000_000,
) -> DataFrame:
    """Weighted sampling without replacement, made deterministic: the
    Efraimidis-Spirakis A-ES scheme (rank by u^(1/w), u uniform) with
    u derived from md5(key || salt) instead of an RNG — inclusion
    probabilities follow the weights (quality-proportional corpus
    picks), yet the draw is a pure row function: identical across
    engines, retries, and partitionings; a new ``salt`` redraws.

    Cross-engine determinism: u = (h+1)/2^32 from the 32-bit md5
    prefix, ln(u) quantized to fixed-point once per row (exact BIGINT),
    and the ranking key lnq(u)/w is ONE IEEE division on identical
    operands — ties broken on the key column. Rows with weight <= 0
    are excluded (A-ES gives them rank -inf anyway).

    Scale shape: map-only scoring + a global top-k via
    ``orderBy().limit(k)`` — TakeOrderedAndProject's per-partition
    heaps, never a sort of the corpus.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    # u in (0, 1]; ln(u) in [-22.18, 0]
    lnq_u = F.floor(
        F.log((h + 1).cast("double") / F.lit(float(_SPACE)))
        * F.lit(float(quant))
    ).cast("long")
    score = lnq_u.cast("double") / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_es_score", score)
        .orderBy(F.desc("_es_score"), F.asc(key_col))
        .limit(k)
        .drop("_es_score")
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1 << 20,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    rank RAW-pool documents by unigram importance weight toward a
    TARGET domain and keep the top k.

    log-weight(d) = Σ_w n_w(d) · [ln p̂_target(w) − ln p̂_raw(w)] with
    add-one smoothing; each per-term λ_w = ln of a RATIO OF EXACT
    BIGINTS ((c_t+1)(T_r+V) / (c_r+1)(T_t+V)), fixed-point-quantized
    (floor·2^20) so both engines agree bit-for-bit, and the document
    score Σ n_w λ_w is exact BIGINT arithmetic throughout. Ties break
    on id.

    Shape at 100 TB: one doc-term aggregate over the corpus; term
    stats are vocab-sized (two grouped counts + one 1-row total frame
    broadcast); λ joins doc-terms on term (AQE broadcasts when vocab
    is small); final per-doc score is a second doc-keyed aggregate +
    TakeOrdered(k). The corpus text is scanned ONCE.
    """
    from alerta_spark.ops.text import tokenize

    terms = docs.select(
        F.col(id_col),
        is_target.alias("_tgt"),
        F.explode(
            F.filter(tokenize(F.col(text_col)), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    # doc_terms feeds the term-stats branch AND the final scoring
    # join — without persist each consumer re-runs the corpus
    # tokenize+explode+aggregate (the single promised corpus scan
    # would run twice). Aggregated (doc, term) rows, far smaller
    # than the token stream.
    doc_terms = terms.groupBy(id_col, "_tgt", "term").agg(
        F.count(F.lit(1)).cast("long").alias("n_w")
    ).persist()
    # stats is vocab-sized and feeds totals + lam
    stats = doc_terms.groupBy("term").agg(
        F.sum(F.when(F.col("_tgt"), F.col("n_w")).otherwise(0))
        .cast("long")
        .alias("c_t"),
        F.sum(F.when(~F.col("_tgt"), F.col("n_w")).otherwise(0))
        .cast("long")
        .alias("c_r"),
    ).persist()
    totals = stats.agg(
        F.sum("c_t").cast("long").alias("t_t"),
        F.sum("c_r").cast("long").alias("t_r"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    lam = stats.crossJoin(F.broadcast(totals)).select(
        "term",
        F.floor(
            F.log(
                ((F.col("c_t") + 1) * (F.col("t_r") + F.col("v"))).cast(
                    "double"
                )
                / ((F.col("c_r") + 1) * (F.col("t_t") + F.col("v"))).cast(
                    "double"
                )
            )
            * F.lit(float(quant))
        )
        .cast("long")
        .alias("lam_q"),
    )
    scored = (
        doc_terms.where(~F.col("_tgt"))
        .join(lam, "term")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("n_w") * F.col("lam_q")).cast("long").alias("score_q"),
            F.sum("n_w").cast("long").alias("n_tokens"),
        )
    )
    return scored.orderBy(F.col("score_q").desc(), F.col(id_col)).limit(k)


def negative_samples(
    df: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor row, ``k`` pseudo-random OTHER rows chosen by
    md5(anchor || slot || salt) mod n over a rank-indexed corpus —
    rerun/engine-stable (the md5 discipline of
    :func:`shuffled_order`), so a resumed training job regenerates
    byte-identical pairs. Self-collisions re-roll to (pick+1) mod n,
    guaranteeing anchor != negative for n >= 2.

    Scale shape: the rank index is one window over the corpus frame
    (md5-banded exchange via shuffled_order's shard trick would also
    work; here ranks must be GLOBAL and dense, so the window runs over
    a column-derived constant partition — the index is (id, rank),
    2 columns, and the two pick joins shuffle on the dense rank, a
    perfectly uniform key). Fan-out is exactly k rows per anchor.

    -> [anchor_id, slot, neg_id]."""
    from pyspark.sql import Window as W

    one = F.pmod(F.length(F.col("_nid").cast("string")), F.lit(1))
    wr = W.partitionBy(one).orderBy("_nid")
    # idx feeds the n count and both pick joins; deliberately NOT
    # persisted — id-sized frame whose subtree is one distinct + one
    # rank window: caching measured cold-worse at local[32]
    # (1.32 -> 1.73 s rep0 ABBA)
    idx = df.select(F.col(id_col).alias("_nid")).distinct().select(
        "_nid", (F.row_number().over(wr) - 1).cast("long").alias("_r")
    )
    n = idx.agg(F.count(F.lit(1)).cast("long").alias("_n"))

    anchors = (
        df.select(F.col(id_col).alias("anchor_id"))
        .distinct()
        .crossJoin(F.broadcast(n))
        .select(
            "anchor_id",
            "_n",
            F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("slot"),
        )
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("slot").cast("string"),
                    F.lit(":"),
                    F.lit(salt),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    picked = anchors.select(
        "anchor_id",
        "slot",
        "_n",
        F.pmod(h, F.col("_n")).alias("_p1"),
    ).withColumn("_p2", F.pmod(F.col("_p1") + 1, F.col("_n")))
    j1 = idx.select(F.col("_r").alias("_p1"), F.col("_nid").alias("_c1"))
    j2 = idx.select(F.col("_r").alias("_p2"), F.col("_nid").alias("_c2"))
    return (
        picked.join(j1, "_p1")
        .join(j2, "_p2")
        .select(
            "anchor_id",
            "slot",
            F.when(F.col("_c1") == F.col("anchor_id"), F.col("_c2"))
            .otherwise(F.col("_c1"))
            .alias("neg_id"),
        )
    )


def kcenter_coreset(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal, public 2-approximation): seed at the lowest id, then k-1
    rounds each adding the point FARTHEST from the current set — the
    diversity-maximizing data-selection rule (cover the embedding
    space with k exemplars; the complement of dedup: keep the spread,
    not the mode).

    Engine-exact: distances are squared-L2 over fixed-point quantized
    vectors (BIGINT), argmax ties break on lowest id, so the chosen
    set is bit-stable across engines/retries.

    Distribution of labor (the kmeans/IVF discipline): the corpus
    keeps a persisted running min-distance column; each round ships
    ONE chosen vector back as a literal expression (a single 1-row
    collect), updates min-dist map-only, and takes the next argmax
    via TakeOrdered — k bounded driver rounds, no pair join, no
    corpus shuffle anywhere.

    -> [rank, vec_id, sel_d2_q] (sel_d2_q = squared distance to the
    previously-chosen set at selection time; 0 for the seed).
    """
    from alerta_spark.ops.dedupe import _persist

    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        ),
    )
    cur = _persist(
        df.select(F.col(id_col).alias("_id"), q.alias("_q")).withColumn(
            "_mind2", F.lit(None).cast("long")
        )
    )
    seed = cur.orderBy("_id").limit(1).collect()[0]
    chosen: list[tuple[int, int, int]] = [(1, seed["_id"], 0)]
    last_vec = list(seed["_q"])
    for r in range(2, k + 1):
        lit_arr = "array(" + ",".join(f"{int(w)}L" for w in last_vec) + ")"
        d2_new = F.expr(
            f"aggregate(zip_with(_q, {lit_arr}, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        nxt = _persist(
            cur.select(
                "_id",
                "_q",
                F.when(F.col("_mind2").isNull(), d2_new)
                .otherwise(F.least("_mind2", d2_new))
                .alias("_mind2"),
            )
        )
        # the argmax TakeOrdered scans every partition, so this one
        # action both materializes nxt's cache and serves the
        # selection — no separate count() pass per round; the parent
        # cache is released only once nxt is fully materialized
        top = (
            nxt.orderBy(F.desc("_mind2"), F.asc("_id")).limit(1).collect()[0]
        )
        cur.unpersist()
        cur = nxt
        chosen.append((r, top["_id"], int(top["_mind2"])))
        last_vec = list(top["_q"])
    spark = df.sparkSession
    return spark.createDataFrame(
        chosen, "rank long, vec_id long, sel_d2_q long"
    )
