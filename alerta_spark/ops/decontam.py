"""Benchmark / eval-set decontamination for training corpora.

The standard pre-training hygiene step: a training document that shares
any word n-gram with an evaluation document is "contaminated" and must
be dropped (the n-gram-overlap rule used by GPT-3/PaLM/Llama data
cards, typically n in 8..13; parameterized here).

Shape at 100 TB: the eval side is small (benchmarks are a few MB) and
the train side is the corpus, so the plan is asymmetric by design —

- build the eval set's DISTINCT shingle set once (tiny);
- ``broadcast`` it and ``left_semi``-join the train shingle stream
  against it: the corpus-sized side never shuffles, contamination
  detection is map-side;
- one ``distinct`` on the (small) hit set of contaminated doc ids,
  then a broadcast ``left_anti`` back onto the corpus.

With ``broadcast_eval=False`` the same plan falls back to a shuffle
semi-join for eval sets too large to broadcast (e.g. decontaminating
against another corpus — then it's really cross-corpus dedup and the
MinHash path in :mod:`alerta_spark.ops.dedupe` is the better tool).

Reference provenance: no analogue in the reference (alertA delegates
all scanning to Athena); this is part of the training-data extension
surface mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alerta_spark.ops.dedupe import shingle_rows


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Ids of train docs sharing at least one word ``n``-gram with any
    eval doc. Returns a 1-column DataFrame named ``id_col``."""
    ev = shingle_rows(eval_df, text_col, id_col, n).select("shingle").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = shingle_rows(train, text_col, id_col, n).join(ev, "shingle", "left_semi")
    return hits.select(F.col("_id").alias(id_col)).distinct()


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training rows with every contaminated document removed."""
    bad = contaminated_ids(train, eval_df, text_col, id_col, n, broadcast_eval)
    return train.join(F.broadcast(bad) if broadcast_eval else bad, id_col, "left_anti")


def containment_report(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Graded leakage report: for every (train doc, eval doc) pair
    sharing word n-grams, the CONTAINMENT |S_train ∩ S_eval| / |S_eval|
    — the fraction of the eval doc already present in training. The
    finer-grained companion to :func:`contaminated_ids` (binary
    any-overlap): containment 1.0 = the eval doc is fully embedded in
    a training doc; the usual report threshold is well below that.

    Same asymmetric 100 TB shape as decontaminate: the eval shingle
    index (with eval doc ids) broadcasts, the corpus-sized train
    shingle stream joins map-side, and only MATCHED (train, eval,
    shingle) rows enter the pair aggregate.

    -> [train_id, eval_id, shared, eval_size, containment],
    containment = one int/int IEEE division (engine-exact).
    """
    ev = shingle_rows(eval_df, text_col, id_col, n).select(
        F.col("_id").alias("eval_id"), "shingle"
    )
    ev_sizes = ev.groupBy("eval_id").agg(F.count(F.lit(1)).alias("eval_size"))
    ev_side = F.broadcast(ev) if broadcast_eval else ev
    hits = (
        shingle_rows(train, text_col, id_col, n)
        .withColumnRenamed("_id", "train_id")
        .join(ev_side, "shingle")
    )
    pairs = hits.groupBy("train_id", "eval_id").agg(
        F.count(F.lit(1)).alias("shared")
    )
    return (
        pairs.join(F.broadcast(ev_sizes), "eval_id")
        .withColumn(
            "containment",
            F.col("shared").cast("double") / F.col("eval_size").cast("double"),
        )
        .where(F.col("containment") >= threshold)
        .select("train_id", "eval_id", "shared", "eval_size", "containment")
    )


def decontaminate_embedding(
    train_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Embedding-space decontamination: drop train vectors whose
    cosine to ANY eval vector reaches ``threshold`` — the semantic
    companion to the n-gram rule (catches paraphrased leakage that
    shares no exact shingle; same recipe as the Llama-3 / GSM8k
    contamination studies, embedding-similarity thresholding).

    Same asymmetric shape as :func:`decontaminate`: the eval side is
    tiny and BROADCASTS; the corpus-sized train side never shuffles —
    the cosine fan-out (|train| x |eval| rows) collapses map-side via
    partial-aggregate max before the one id-keyed exchange.

    -> surviving train rows + their ``max_eval_cos`` (diagnostic;
    round(6) so the column is engine-portable; NULL = the vector was
    never within any eval pair's reach, i.e. eval side empty).
    """
    from alerta_spark.ops.similarity import _dot, _norm

    # norms hoisted OUT of the |train| x |eval| fan-out: each side's
    # norm is computed once per VECTOR (the pair loop would re-derive
    # both per pair — 3x the interpreted-HOF work; the semantic-dedup
    # lesson). sqrt-then-multiply keeps the float tree identical to
    # cosine()'s, so the round-6 outputs are unchanged.
    ev = eval_emb.select(
        F.col(id_col).alias("_eid"),
        F.col(vec_col).alias("_ev"),
        _norm(F.col(vec_col)).alias("_en"),
    )
    pairs = train_emb.select(
        F.col(id_col).alias("_tid"),
        F.col(vec_col).alias("_tv"),
        _norm(F.col(vec_col)).alias("_tn"),
    ).join(F.broadcast(ev) if broadcast_eval else ev)
    mx = pairs.groupBy("_tid").agg(
        F.round(
            F.max(
                _dot(F.col("_tv"), F.col("_ev"))
                / (F.col("_tn") * F.col("_en"))
            ),
            6,
        ).alias("max_eval_cos")
    )
    return (
        train_emb.join(
            mx, train_emb[id_col] == mx["_tid"], "left"
        )
        .where(
            F.col("max_eval_cos").isNull()
            | (F.col("max_eval_cos") < threshold)
        )
        .drop("_tid")
    )
