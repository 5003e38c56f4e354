"""Query catalog: every implemented operator as a (spark_fn, oracle_sql) pair.

Each entry exercises one operator family from SURVEY.md §2 over the
driver's testdata tables. ``spark_fn(spark, sf_dir) -> DataFrame`` runs
the engine's native implementation; ``oracle`` is the equivalent ANSI
SQL DuckDB runs on the same parquet (None for ops whose semantics are
not SQL-expressible — the driver then records a rows-only check).

Determinism rules (the driver hash-compares values order-insensitively
but exactly):
- money aggregates run in DECIMAL then cast to DOUBLE (both engines
  produce the bit-identical result; double SUM order would not);
- rendered strings avoid scientific-notation doubles;
- arrays/samples are ordered by explicit (ts, id) tie-broken keys.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from alerta_spark.operators.dedup import remove_previously_alerted
from alerta_spark.operators.deadman import deadman_alerts
from alerta_spark.operators.mostcommon import most_common
from alerta_spark.operators.threshold import apply_criteria, threshold_alerts
from alerta_spark.sources.lake import load_table, time_window

QUERIES: dict[str, dict[str, Any]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = {"fn": fn, "oracle": oracle}
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec["fn"] for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec["oracle"]
        for name, spec in QUERIES.items()
        if spec["oracle"] is not None
    }


# ---------------------------------------------------------------------------
# Rules used by the catalog queries (over the `events` table; `props`
# is the JSON payload standing in for the reference's `details`).
# ---------------------------------------------------------------------------

BIG_PURCHASES_RULE = {
    "alert_name": "big_purchases",
    "alert_type": "threshold",
    "criteria": "event_type='purchase' AND CAST(json_extract_scalar(props,'$.k') AS INTEGER) > 50",
    "threshold": 3,
    "aggregation_key": "user_id",
    "summary": "User {{metadata.value}} made {{metadata.count}} big purchases",
    "event_snippet": "id {{event_id}} value {{value}} k={{props.k}}",
    "event_sample_count": 2,
    "severity": "WARNING",
    "category": "fraud",
    "tags": ["purchase"],
    "utctimestamp": "2026-01-01T00:00:00+00:00",
}

ABSENT_EVENTS_RULE = {
    "alert_name": "missing_heartbeat",
    "alert_type": "deadman",
    "criteria": "event_type='heartbeat'",
    "threshold": 0,
    "aggregation_key": "user_id",
    "summary": "Expected events missing: {{metadata.value}} count {{metadata.count}}",
    "utctimestamp": "2026-01-01T00:00:00+00:00",
}


# ---------------------------------------------------------------------------
# §2.1/§2.2 — scan + criteria surface (S1, S4, F1-F4, C1-C3)
# ---------------------------------------------------------------------------

_CRITERIA = (
    "event_type='purchase' AND CAST(json_extract_scalar(props,'$.k') AS INTEGER) > 50 "
    "AND position('0' IN json_extract_scalar(props,'$.k')) = 0"
)


@register(
    "s1_criteria_scan",
    oracle="""
    SELECT event_id, user_id, event_type,
           json_extract_string(props, '$.k') AS k
    FROM events
    WHERE event_type='purchase'
      AND CAST(json_extract_string(props,'$.k') AS INTEGER) > 50
      AND position('0' IN json_extract_string(props,'$.k')) = 0
    """,
)
def s1_criteria_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino-dialect criteria evaluated natively (json_extract_scalar →
    get_json_object shim; CAST and position(IN) verbatim).
    Reference: alerta.py:114-161; alerts/*.yml criteria."""
    ev = load_table(spark, sf_dir, "events")
    return apply_criteria(ev, _CRITERIA).select(
        "event_id",
        "user_id",
        "event_type",
        F.get_json_object("props", "$.k").alias("k"),
    )


@register(
    "f5_time_window",
    oracle="""
    WITH anchor AS (SELECT max(ts) AS m FROM events)
    SELECT event_type, count(*) AS n
    FROM events, anchor
    WHERE ts >= date_trunc('hour', anchor.m) - INTERVAL 1 HOUR AND ts <= anchor.m
    GROUP BY event_type
    """,
)
def f5_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's current+previous-hour hop window (alerta.py:136-146)
    as a prunable timestamp range filter."""
    ev = load_table(spark, sf_dir, "events")
    return time_window(ev, "ts", hours=2).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "f6_order_limit",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events ORDER BY ts, event_id LIMIT 1000
    """,
)
def f6_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row cap (alerta.py:147) made deterministic with an explicit sort."""
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy("ts", "event_id").limit(1000).select(
        "event_id", "user_id", "event_type"
    )


# ---------------------------------------------------------------------------
# §2.4 — aggregations (A1-A6)
# ---------------------------------------------------------------------------


@register(
    "a1_mostcommon",
    oracle="""
    SELECT event_type AS value, count(*) AS count
    FROM events WHERE event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def a1_mostcommon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mostCommon: group-count along a key path (utils/mostcommon.py:40-56)."""
    ev = load_table(spark, sf_dir, "events")
    return most_common(ev, "event_type")


@register(
    "a1_mostcommon_json_path",
    oracle="""
    SELECT json_extract_string(props,'$.k') AS value, count(*) AS count
    FROM events WHERE json_extract_string(props,'$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def a1_mostcommon_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mostCommon with a dotted path into the JSON payload (the
    reference's aggregation_key='details.x' shape)."""
    ev = load_table(spark, sf_dir, "events")
    return most_common(ev, "props.k")


@register(
    "a2_threshold_trigger",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS value, count(*) AS count
    FROM events
    WHERE event_type='purchase' AND CAST(json_extract_string(props,'$.k') AS INTEGER) > 50
    GROUP BY 1 HAVING count(*) >= 3
    """,
)
def a2_threshold_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold trigger groups (count >= T; alerta.py:438-439)."""
    ev = load_table(spark, sf_dir, "events")
    alerts = threshold_alerts(ev, BIG_PURCHASES_RULE)
    return alerts.select(
        F.col("metadata.value").alias("value"), F.col("metadata.count").alias("count")
    )


@register(
    "a3_deadman_trigger",
    oracle="""
    WITH fired AS (
      SELECT CAST(user_id AS VARCHAR) AS value, count(*) AS count
      FROM events WHERE event_type='heartbeat'
      GROUP BY 1 HAVING count(*) <= 0
    )
    SELECT * FROM fired
    UNION ALL
    SELECT 'user_id' AS value, CAST(0 AS BIGINT) AS count
    WHERE NOT EXISTS (
      SELECT 1 FROM events WHERE event_type='heartbeat' AND user_id IS NOT NULL
    )
    """,
)
def a3_deadman_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadman (absence) trigger incl. empty-input zero-count synthesis
    (alerta.py:358-410, 384-386)."""
    ev = load_table(spark, sf_dir, "events")
    alerts = deadman_alerts(ev, ABSENT_EVENTS_RULE)
    return alerts.select(
        F.col("metadata.value").alias("value"), F.col("metadata.count").alias("count")
    )


@register(
    "c7_threshold_alert_render",
    oracle="""
    WITH ev AS (
      SELECT * FROM events
      WHERE event_type='purchase' AND CAST(json_extract_string(props,'$.k') AS INTEGER) > 50
    ),
    ranked AS (
      SELECT CAST(user_id AS VARCHAR) AS gval,
             ' id ' || CAST(event_id AS VARCHAR) || ' value ' || CAST(value AS VARCHAR)
                    || ' k=' || json_extract_string(props,'$.k') AS snip,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM ev
    ),
    g AS (
      SELECT gval, count(*) AS n,
             string_agg(snip, '' ORDER BY rn) FILTER (WHERE rn <= 2) AS snips
      FROM ranked GROUP BY gval HAVING count(*) >= 3
    )
    SELECT gval AS agg_value, n AS n_events,
           'User ' || gval || ' made ' || CAST(n AS VARCHAR) || ' big purchases'
             || coalesce(snips, '') AS summary
    FROM g
    """,
)
def c7_threshold_alert_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full alert assembly: metadata + mustache summary + per-sample
    event snippets, rendered as codegen'd concat (alerta.py:453-458)."""
    ev = load_table(spark, sf_dir, "events")
    alerts = threshold_alerts(ev, BIG_PURCHASES_RULE)
    return alerts.select(
        F.col("metadata.value").alias("agg_value"),
        F.col("metadata.count").alias("n_events"),
        F.col("summary"),
    )


@register(
    "a5_topk_per_group",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 2
    """,
)
def a5_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k sample per group (alerta.py:406,455) as a ranking window."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("event_id", "user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# §2.2 F8/F9 + §2.3 J1 — dedup anti-join
# ---------------------------------------------------------------------------


@register(
    "f8_dedup_antijoin",
    oracle="""
    SELECT e.event_id, e.user_id
    FROM events e
    WHERE e.event_type = 'error'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'error'
          AND p.ts < (SELECT min(ts) + INTERVAL 12 HOUR FROM events)
          AND CAST(p.event_id AS VARCHAR) = CAST(e.event_id AS VARCHAR)
      )
    """,
)
def f8_dedup_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup vs alert history as a broadcast left_anti join
    (remove_previously_alerted, alerta.py:38-57). The 'already alerted'
    set here is a deterministic stand-in: error events from the first
    12 hours of the dataset."""
    ev = load_table(spark, sf_dir, "events")
    lo = ev.select((F.min("ts") + F.expr("INTERVAL 12 HOURS")).alias("cut"))
    prior = (
        ev.crossJoin(F.broadcast(lo))
        .where((F.col("event_type") == "error") & (F.col("ts") < F.col("cut")))
        .select(F.col("event_id").cast("string").alias("alerted_event_id"))
    )
    cand = ev.where(F.col("event_type") == "error")
    return remove_previously_alerted(cand, prior).select("event_id", "user_id")


# ---------------------------------------------------------------------------
# General relational surface at scale (scan/agg/join/window/sort) over
# the TPC-H-ish tables — the capabilities Athena provided the reference.
# ---------------------------------------------------------------------------


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (1 - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy grouped aggregate (pushdown + partial agg). DECIMAL
    accumulation keeps the result bit-identical to the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(20,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "join_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2)) * (1 - CAST(l.l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join: fact-fact shuffle join on orderkey, broadcast of
    the small dims (customer at tested SFs, nation always)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "semi_join_building_orders",
    oracle="""
    SELECT o.o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS total
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
    )
    GROUP BY o.o_orderstatus
    """,
)
def semi_join_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a broadcast left_semi join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(20,2)"))
            .cast("double")
            .alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data pipeline extensions (SURVEY.md §7.2-9): text analysis
# over `documents`, dedup (exact → LSH), similarity over `embeddings`,
# multimodal plumbing. DuckDB normalization mirrors
# alerta_spark.ops.text.normalize_text.
# ---------------------------------------------------------------------------

_DUCK_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_DUCK_TOKS = f"string_split({_DUCK_NORM}, ' ')"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_DUCK_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex tokens (pure codegen,
    no shuffle)."""
    from alerta_spark.ops.text import token_stats

    return token_stats(load_table(spark, sf_dir, "documents"))


def _duck_marker_count(markers: list[str]) -> str:
    inlist = ", ".join(f"''{m}''" for m in markers).replace("''", "'")
    return f"len(list_filter({_DUCK_TOKS}, t -> t IN ({inlist})))"


@register(
    "text_language_id",
    oracle=None,  # set below — built programmatically from LANG_MARKERS
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker heuristic language ID (argmax, deterministic
    tie-break)."""
    from alerta_spark.ops.text import language_id

    return language_id(load_table(spark, sf_dir, "documents"))


def _lang_oracle() -> str:
    from alerta_spark.ops.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_cols = ",\n           ".join(
        f"{_duck_marker_count(LANG_MARKERS[code])} AS score_{code}" for code in langs
    )
    best = f"greatest({', '.join('score_' + c for c in langs)})"
    case = " ".join(f"WHEN score_{c} = best THEN '{c}'" for c in langs)
    return f"""
    WITH scored AS (
      SELECT doc_id,
           {score_cols}
      FROM documents
    ), b AS (SELECT *, {best} AS best FROM scored)
    SELECT doc_id,
           CASE WHEN best <= 0 THEN 'und' {case} END AS lang_pred,
           best AS lang_score
    FROM b
    """


QUERIES["text_language_id"]["oracle"] = _lang_oracle()


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             len({_DUCK_TOKS}) AS n_tokens,
             length(text) AS n_chars,
             length({_DUCK_NORM}) AS n_norm_chars
      FROM documents
    ), f AS (
      SELECT doc_id, n_tokens,
        CASE WHEN n_tokens > 0 THEN (n_norm_chars - (n_tokens - 1)) / n_tokens::DOUBLE ELSE 0.0 END AS mean_word_len,
        CASE WHEN n_tokens > 0 THEN len(list_filter({_DUCK_TOKS}, x -> x IN ('the','of','and','to','in','is','a','that','it','for','on','with','as'))) / n_tokens::DOUBLE ELSE 0.0 END AS stopword_ratio,
        CASE WHEN n_chars > 0 THEN (n_chars - length(regexp_replace(text, '[0-9]', '', 'g'))) / n_chars::DOUBLE ELSE 0.0 END AS digit_ratio,
        CASE WHEN n_chars > 0 THEN (n_chars - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))) / n_chars::DOUBLE ELSE 0.0 END AS punct_ratio
      FROM t
    )
    SELECT doc_id, n_tokens,
           round(mean_word_len, 6) AS mean_word_len,
           round(stopword_ratio, 6) AS stopword_ratio,
           round(digit_ratio, 6) AS digit_ratio,
           round(punct_ratio, 6) AS punct_ratio,
           round(0.25 * (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
               + 0.25 * (CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
               + 0.3 * least(stopword_ratio * 10.0, 1.0)
               + 0.2 * (1.0 - least(digit_ratio + punct_ratio, 1.0)), 6) AS quality_score
    FROM f
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality features + composite score."""
    from alerta_spark.ops.text import quality_score

    return quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, md5({_DUCK_NORM}) AS fp_md5
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text; engine-portable)."""
    from alerta_spark.ops.text import fingerprint

    return fingerprint(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "fp_md5"
    )


@register(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_DUCK_NORM}) AS digest,
           min(doc_id) AS keep_id,
           count(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups by content digest (one hash shuffle)."""
    from alerta_spark.ops.dedupe import exact_dedup

    return exact_dedup(load_table(spark, sf_dir, "documents")).select(
        "digest", "keep_id", "dup_count"
    )


_DUCK_SHINGLES = (
    f"CASE WHEN len({_DUCK_TOKS}) >= 5 THEN "
    f"list_distinct([array_to_string(({_DUCK_TOKS})[i:i+4], ' ') "
    f"for i in range(1, len({_DUCK_TOKS}) - 3)]) "
    f"ELSE [array_to_string({_DUCK_TOKS}, ' ')] END"
)


@register(
    "dedup_ngram_jaccard",
    # Oracle replicates the hot-shingle cap (doc_freq <= 1000) so the
    # check is exact over the SAME capped shingle sets the Spark side
    # uses — the cap is part of the operator contract, not a fudge.
    oracle=f"""
    WITH s AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS sh FROM documents),
    kept AS (SELECT sh FROM s GROUP BY sh HAVING count(*) <= 1000),
    idx AS (SELECT s.doc_id, s.sh FROM s JOIN kept USING (sh)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM idx GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b, i::DOUBLE / (sa.sz + sb.sz - i) AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
    )
    SELECT id_a, id_b, round(j, 6) AS jaccard
    FROM pairs WHERE j >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-gram-shingle Jaccard >= 0.8 pairs via inverted-index self-join
    with the hot-shingle cap ON (doc_freq <= 1000) — the pipeline-facing
    configuration that bounds the worst join bucket at web scale. The
    uncapped exact ground truth remains available via
    ``ngram_jaccard_pairs(..., max_doc_freq=None)``."""
    from alerta_spark.ops.dedupe import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=5, threshold=0.8,
        max_doc_freq=1000,
    )


@register(
    "dedup_minhash_lsh",
    # The oracle is the EXACT uncapped Jaccard ground truth. Valid as a
    # hash check because the operator is deterministic (fixed xxhash64
    # banding), precision is always 1 (exact verification step), and
    # recall on this corpus is exactly 1 — verified at sf0.001 AND
    # sf0.01. On a corpus where banding missed a pair this row would
    # fail loudly, which is the honest outcome.
    oracle=f"""
    WITH s AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) AS j
      FROM s a JOIN s b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, round(j, 6) AS jaccard
    FROM pairs WHERE j >= 0.8
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH banding (16x4) candidates, verified with exact
    Jaccard — the 100 TB dedup path. Also tested against the exact
    operator in tests/test_dedupe_ops.py (recall check)."""
    from alerta_spark.ops.dedupe import minhash_lsh_pairs

    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), n=5, threshold=0.8
    )


@register("dedup_simhash", oracle=None)  # hash-function specific: rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dups (hamming <= 3) via pigeonhole banding."""
    from alerta_spark.ops.dedupe import simhash_near_dups

    return simhash_near_dups(load_table(spark, sf_dir, "documents"))


_DUCK_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_DUCK_COS}, 6) AS cos
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({_DUCK_COS}, 6) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine >= tau) blocked by label —
    at web scale the block key is an LSH bucket instead."""
    from alerta_spark.ops.similarity import cosine_pairs

    return cosine_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4, block_col="label"
    )


@register("dedup_embedding_lsh", oracle=None)  # approximate: rows-only
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH blocking +
    exact cosine verification — the label-free scale path (the blocked
    variant above needs a trusted label).

    Hyperplane LSH is a HIGH-threshold tool (collision prob per plane
    is 1 - arccos(c)/pi, so selectivity collapses below ~0.9); the
    synthetic embeddings' organic pairs top out near cos 0.48, so this
    query plants deterministic near-copies (one mildly perturbed twin
    per original, cos ~0.9998) and finds them at threshold 0.95 — the
    regime the operator exists for. Recall/precision vs the exact
    operator pinned in tests/test_similarity_ops.py."""
    from alerta_spark.ops.similarity import cosine_pairs_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    twin = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (1.0 + 0.02 * ((i % 2) * 2 - 1)),
        )
        .cast(emb.schema["embedding"].dataType)
        .alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(twin)
    return cosine_pairs_lsh(corpus, threshold=0.95)


_PLSH_DIM, _PLSH_PLANES, _PLSH_BANDS = 64, 8, 6


def _plsh_weight_values() -> str:
    from alerta_spark.ops.similarity import _int_hyperplane

    return ",\n      ".join(
        "({}, [{}])".format(
            p, ", ".join(str(w) for w in _int_hyperplane(_PLSH_DIM, p))
        )
        for p in range(_PLSH_BANDS * _PLSH_PLANES)
    )


@register(
    "dedup_embedding_lsh_portable",
    # The integer-quantized hyperplane LSH twin of dedup_embedding_lsh:
    # floor(x*1e6) BIGINT components x integer hyperplane numerators
    # make every sign bit exact on both engines, so the oracle replays
    # the ENTIRE banded pipeline (bucketing included) — the step float
    # math keeps engine-specific in the production variant. Corpus =
    # embeddings + one mildly perturbed twin per vector (cos ~0.9998),
    # the high-cos regime hyperplane LSH exists for.
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    idx AS (SELECT unnest(generate_series(1, {_PLSH_DIM})) AS pos),
    bcomp AS (SELECT vec_id, pos, v[pos] AS x FROM e, idx),
    comp AS (
      SELECT vec_id, pos, x FROM bcomp
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, pos,
             x * (1.0 + 0.02 * (((pos - 1) % 2) * 2 - 1)) AS x
      FROM bcomp
    ),
    q AS (
      SELECT vec_id, pos, CAST(floor(x * 1000000.0) AS BIGINT) AS c
      FROM comp
    ),
    w AS (
      SELECT plane, pos, wts[pos] AS wv
      FROM (VALUES {{W_VALUES}}) pw(plane, wts), idx
    ),
    dots AS (
      SELECT vec_id, plane, sum(c * wv) AS d
      FROM q JOIN w USING (pos) GROUP BY vec_id, plane
    ),
    sigs AS (
      SELECT vec_id, plane // {_PLSH_PLANES} AS band,
             sum(CASE WHEN d > 0
                 THEN CAST(1 AS BIGINT) << (plane % {_PLSH_PLANES})
                 ELSE 0 END) AS bucket
      FROM dots GROUP BY vec_id, plane // {_PLSH_PLANES}
    ),
    cand AS (
      SELECT DISTINCT s1.vec_id AS id_a, s2.vec_id AS id_b
      FROM sigs s1 JOIN sigs s2
        ON s1.band = s2.band AND s1.bucket = s2.bucket
       AND s1.vec_id < s2.vec_id
    ),
    vl AS (
      SELECT vec_id, list(x ORDER BY pos) AS v FROM comp GROUP BY vec_id
    )
    SELECT c.id_a, c.id_b, round({_DUCK_COS}, 6) AS cos
    FROM cand c
    JOIN vl a ON c.id_a = a.vec_id
    JOIN vl b ON c.id_b = b.vec_id
    WHERE round({_DUCK_COS}, 6) >= 0.95
    """.replace("{W_VALUES}", _plsh_weight_values()),
)
def dedup_embedding_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH embedding near-dups with exact BIGINT bucketing
    (floor(x*1e6) fixed point x integer weights): same banded-join
    topology as the production dedup_embedding_lsh, every step
    engine-portable, the whole pipeline hash-checked."""
    from alerta_spark.ops.similarity import cosine_pairs_lsh_portable

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    twin = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            * (
                F.lit(1.0)
                + F.lit(0.02) * ((i % 2) * 2 - 1).cast("double")
            ),
        ).alias("embedding"),
    )
    corpus = base.unionByName(twin)
    return cosine_pairs_lsh_portable(
        corpus,
        threshold=0.95,
        dim=_PLSH_DIM,
        planes=_PLSH_PLANES,
        bands=_PLSH_BANDS,
    )


_TOPK_QUERY_IDS = [0, 1, 2, 3, 4]


@register(
    "similarity_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id IN (0,1,2,3,4)),
    scored AS (
      SELECT q.query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(a.v, q.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.v, q.v))), 6) AS cos
      FROM e a, q WHERE a.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 10
    """,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for 5 query vectors: broadcast
    queries x one corpus scan + per-query window."""
    from alerta_spark.ops.similarity import cosine_topk

    return cosine_topk(
        load_table(spark, sf_dir, "embeddings"), _TOPK_QUERY_IDS, k=10
    )


@register("similarity_lsh_topk", oracle=None)  # approximate: rows-only
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketed ANN top-10, exact re-rank on
    candidates (recall vs brute force checked in tests)."""
    from alerta_spark.ops.similarity import lsh_topk

    return lsh_topk(load_table(spark, sf_dir, "embeddings"), _TOPK_QUERY_IDS, k=10)


@register("similarity_ivf_topk", oracle=None)  # approximate: rows-only
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-10: deterministic spherical k-means cells,
    n_probe-cell candidate fetch, exact cosine re-rank (recall vs
    brute force checked in tests). At scale the cell id is the corpus
    partition key — each query reads n_probe/n_centroids of the data."""
    from alerta_spark.ops.similarity import ivf_topk

    return ivf_topk(load_table(spark, sf_dir, "embeddings"), _TOPK_QUERY_IDS, k=10)


@register("similarity_pq_topk", oracle=None)  # approximate: rows-only
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-10: corpus encoded to 8 sub-codes
    (map-only, ~32x smaller than the vectors — the persisted index at
    100 TB), per-query broadcast ADC lookup tables score candidates
    with 8 JVM array lookups each (no vector math in the scan), exact
    cosine re-rank on the short list. Recall vs brute force pinned in
    tests/test_similarity_ops.py; codebook training is deterministic
    bounded-sample k-means, so the result is rerun-stable."""
    from alerta_spark.ops.similarity import pq_topk

    return pq_topk(load_table(spark, sf_dir, "embeddings"), _TOPK_QUERY_IDS, k=10)


def _ivf_centroid_values() -> str:
    from alerta_spark.ops.similarity import pinned_centroids

    return ",\n      ".join(
        "({}, [{}])".format(c, ", ".join(str(w) for w in wts))
        for c, wts in enumerate(pinned_centroids(64, 16))
    )


@register(
    "similarity_ivf_pinned",
    # The IVF query path with pinned integer centroids: assignment =
    # argmax of exact BIGINT dots (ties -> lowest centroid), probes =
    # top-4 cells by (dot DESC, cent ASC), exact cosine re-rank. The
    # oracle replays assignment + probing + candidates bit-for-bit —
    # the production entry (driver-trained k-means) stays rows-only;
    # this one hash-checks everything downstream of training.
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    idx AS (SELECT unnest(generate_series(1, 64)) AS pos),
    comp AS (SELECT vec_id, pos, v[pos] AS x FROM e, idx),
    q AS (
      SELECT vec_id, pos, CAST(floor(x * 1000000.0) AS BIGINT) AS c
      FROM comp
    ),
    w AS (
      SELECT cent, pos, wts[pos] AS wv
      FROM (VALUES {{C_VALUES}}) cw(cent, wts), idx
    ),
    dots AS (
      SELECT vec_id, cent, sum(c * wv) AS d
      FROM q JOIN w USING (pos) GROUP BY vec_id, cent
    ),
    ranked AS (
      SELECT vec_id, cent,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d DESC, cent ASC) AS rn
      FROM dots
    ),
    corpus AS (SELECT vec_id AS neighbor_id, cent AS cell
               FROM ranked WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cent AS cell
               FROM ranked WHERE rn <= 4 AND vec_id IN (0,1,2,3,4)),
    cand AS (
      SELECT p.query_id, c.neighbor_id
      FROM probes p JOIN corpus c
        ON p.cell = c.cell AND c.neighbor_id != p.query_id
    ),
    scored AS (
      SELECT query_id, neighbor_id, round({_DUCK_COS}, 6) AS cos
      FROM cand
      JOIN e a ON cand.query_id = a.vec_id
      JOIN e b ON cand.neighbor_id = b.vec_id
    )
    SELECT query_id, neighbor_id, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 10
    """.replace("{C_VALUES}", _ivf_centroid_values()),
)
def similarity_ivf_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 with pinned integer centroids: map-only exact
    BIGINT cell assignment (cell = the 100 TB write-partition key),
    broadcast probes, exact cosine re-rank — hash-checked end to end."""
    from alerta_spark.ops.similarity import ivf_topk_pinned

    return ivf_topk_pinned(
        load_table(spark, sf_dir, "embeddings"), _TOPK_QUERY_IDS, k=10
    )


@register(
    "multimodal_media_summary",
    oracle="""
    SELECT 'image' AS kind, 'fake' AS format,
           count(*) AS n,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    """,
)
def multimodal_media_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column plumbing: typed metadata projection +
    byte stats without decoding (the pre-flight query before a decode
    pass over 100 TB)."""
    from alerta_spark.ops.multimodal import attach_fake_media, media_summary

    docs = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return media_summary(docs)


@register("pipeline_clean_corpus", oracle=None)  # oracle set below
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end preprocessing flow as ONE Spark plan: quality
    gate -> language filter -> exact-dedup survivors -> deterministic
    train/eval/test split, reported as per-split corpus stats. Every
    stage is an operator from this catalog, composed — Catalyst fuses
    the quality/language maps into the scan and the whole flow costs
    two shuffles (dedup digest group, final split aggregate)."""
    from alerta_spark.ops.dedupe import exact_dedup
    from alerta_spark.ops.sampling import hash_split
    from alerta_spark.ops.text import language_id, quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "n_tokens", "quality_score")
    lang = language_id(docs).select("doc_id", "lang_pred")
    keep = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    cleaned = (
        q.join(lang, "doc_id")
        .where((F.col("quality_score") >= 0.5) & (F.col("lang_pred") == "en"))
        .join(keep, "doc_id", "left_semi")
    )
    return (
        hash_split(cleaned, {"train": 0.8, "eval": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("quality_score").alias("min_quality"),
        )
    )


def _pipeline_oracle() -> str:
    quality_sql = QUERIES["text_quality_score"]["oracle"]
    lang_sql = _lang_oracle()
    return f"""
    WITH q AS ({quality_sql}),
    l AS ({lang_sql}),
    keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5({_DUCK_NORM})),
    cleaned AS (
      SELECT q.doc_id, q.n_tokens, q.quality_score
      FROM q JOIN l ON q.doc_id = l.doc_id
      WHERE q.quality_score >= 0.5 AND l.lang_pred = 'en'
        AND q.doc_id IN (SELECT doc_id FROM keep)
    ),
    assigned AS (
      SELECT *,
        CASE
          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'eval'
          ELSE 'test'
        END AS split
      FROM cleaned
    )
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(quality_score) AS min_quality
    FROM assigned GROUP BY split
    """


QUERIES["pipeline_clean_corpus"]["oracle"] = _pipeline_oracle()


@register(
    "sample_deterministic",
    oracle="""
    SELECT doc_id
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'epoch1'), 1, 8) < '33333333'
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~20% reproducible corpus sample by md5-prefix band: membership
    is a pure row function — stable under task retry and identical
    across engines (rand()-based sample() is neither). '33333333' =
    floor(0.2 * 16^8) in hex."""
    from alerta_spark.ops.sampling import deterministic_sample

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, 0.2, salt="epoch1").select("doc_id")


@register(
    "split_train_eval_test",
    oracle="""
    WITH assigned AS (
      SELECT doc_id,
        CASE
          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'eval'
          ELSE 'test'
        END AS split
      FROM documents
    )
    SELECT split, count(*) AS n, min(doc_id) AS min_id
    FROM assigned GROUP BY split
    """,
)
def split_train_eval_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/eval/test split via cumulative
    md5-prefix bands (hash_split): disjoint, exhaustive, and a row's
    split NEVER changes across pipeline re-runs — the anti-leakage
    property randomSplit lacks under retries."""
    from alerta_spark.ops.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, {"train": 0.8, "eval": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id"))
    )


@register(
    "chunk_documents",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
      FROM documents
    ), sized AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE CAST(ceil((len(toks) - 32) / CAST(24 AS DOUBLE)) AS INTEGER) + 1
             END AS n_chunks
      FROM toks WHERE len(toks) >= 1
    ), ex AS (
      SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM sized
    )
    SELECT doc_id, chunk_id,
           len(list_slice(toks, chunk_id*24 + 1, chunk_id*24 + 32)) AS chunk_tokens,
           array_to_string(list_slice(toks, chunk_id*24 + 1, chunk_id*24 + 32), ' ') AS chunk_text
    FROM ex
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking (size 32, overlap 8): the
    long-document split every context-limited trainer and embedding
    indexer needs. Tokenize once -> explode chunk ids -> slice; zero
    shuffles."""
    from alerta_spark.ops.chunking import chunk_documents as chunk

    docs = load_table(spark, sf_dir, "documents")
    return chunk(docs, chunk_size=32, overlap=8)


@register(
    "pack_sequences",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 2 AS shard,
             CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT *,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t
    )
    SELECT doc_id, source, CAST(shard AS BIGINT) AS shard, n_tokens,
           CAST(cum_before // 256 AS BIGINT) AS first_seq,
           CAST(cum_before % 256 AS BIGINT) AS offset_in_seq,
           CAST(((cum_before + CASE WHEN n_tokens > 0 THEN n_tokens - 1 ELSE 0 END) // 256)
             - (cum_before // 256) + 1 AS BIGINT) AS seqs_spanned
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing (budget 256 tokens, 2 md5
    shards per source): documents laid out as contiguous token streams,
    cut at budget boundaries — the pretraining batch-packing transform.
    One hash shuffle + one in-partition running sum; pure integer
    arithmetic so it is exact at any scale."""
    from alerta_spark.ops.chunking import pack_sequences as pack

    docs = load_table(spark, sf_dir, "documents")
    return pack(docs, budget=256, shards=2)


@register(
    "text_repetition_stats",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents
    ), ng AS (
      SELECT doc_id,
             [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              for i in generate_series(1, len(t) - 2)] AS gs
      FROM toks WHERE len(t) >= 3
    ), occ AS (
      SELECT doc_id, unnest(gs) AS g FROM ng
    ), counts AS (
      SELECT doc_id, g, count(*) AS c FROM occ GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS total_ngrams,
           count(*) AS distinct_ngrams,
           CAST(max(c) AS BIGINT) AS top_ngram_count,
           (CAST(sum(c) AS BIGINT) - count(*)) / CAST(sum(c) AS BIGINT) AS dup_ngram_frac,
           CAST(max(c) AS BIGINT) / CAST(sum(c) AS BIGINT) AS top_ngram_frac
    FROM counts GROUP BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-3-gram fraction and
    top-3-gram share per document. One exchange (window partitioning
    reused by both aggregations); exact integer counts, single IEEE
    division."""
    from alerta_spark.ops.text import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, n=3)


@register(
    "vocab_top_terms",
    oracle="""
    WITH terms AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    )
    SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS doc_freq
    FROM terms
    GROUP BY term
    ORDER BY tf DESC, term ASC
    LIMIT 200
    """,
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-200 terms by total frequency with doc
    frequency riding the same aggregate — the tf/df base for tokenizer
    training and IDF. One shuffle; deterministic (tf DESC, term ASC)
    cut."""
    from alerta_spark.ops.text import vocab_top_terms as vocab

    docs = load_table(spark, sf_dir, "documents")
    return vocab(docs, top_n=200)


@register(
    "decontaminate_train_split",
    # Oracle replays the full composition: the md5 split band
    # (0.8 -> floor(0.8 * 16^8) = 'cccccccc', hash_split semantics),
    # 5-gram shingles over BOTH sides, and the overlap rule. Exact —
    # shingling and banding are engine-identical string/hash ops.
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, lang, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' AS is_train
      FROM documents
    ),
    ev AS (
      SELECT DISTINCT unnest({_DUCK_SHINGLES}) AS sh
      FROM assigned WHERE NOT is_train
    ),
    tr AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES}) AS sh
      FROM assigned WHERE is_train
    ),
    bad AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev USING (sh))
    SELECT a.doc_id, a.lang
    FROM assigned a
    WHERE a.is_train AND a.doc_id NOT IN (SELECT doc_id FROM bad)
    """,
)
def decontaminate_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination composed with the deterministic split:
    hash_split documents 80/20, then drop every train doc sharing any
    5-gram with the eval side (the GPT-3/Llama data-card hygiene rule).
    Plan shape: the corpus-sized train shingle stream never shuffles —
    the eval shingle set is broadcast and the semi/anti joins are
    map-side; only the tiny contaminated-id set aggregates."""
    from alerta_spark.ops.decontam import decontaminate
    from alerta_spark.ops.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, {"train": 0.8, "eval": 0.2})
    train = split.where(F.col("split") == "train")
    ev = split.where(F.col("split") == "eval")
    return decontaminate(train, ev, n=5).select("doc_id", "lang")


@register(
    "corpus_composition_stats",
    oracle=f"""
    WITH g AS (
      SELECT source, lang, count(*) AS n_docs,
             CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS n_tokens,
             CAST(sum(length(text)) AS BIGINT) AS n_chars
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, n_docs, n_tokens, n_chars,
           CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER () AS DOUBLE)
             AS doc_share,
           CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE)
             AS token_share
    FROM g
    """,
)
def corpus_composition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card composition report per (source, lang): doc/token/char
    counts and corpus shares. One partial-agg shuffle; share divisions
    ride a window over the |strata|-row aggregate, one IEEE division
    each (cross-engine exact)."""
    from alerta_spark.ops.text import corpus_composition

    return corpus_composition(load_table(spark, sf_dir, "documents"))


@register(
    "sessionize_events",
    # Gaps-and-islands replica; all time math in integer microseconds
    # (epoch_us / unix_micros agree: both truncate the parquet ns
    # values toward zero for positive timestamps). Session bounds are
    # emitted as epoch-µs BIGINTs, not timestamps, so the ns-vs-µs
    # printing difference between the engines can't touch the hash.
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS pus
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts, us,
             CASE WHEN pus IS NULL OR us - pus > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ),
    sess AS (
      SELECT user_id, us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events,
           CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(max(us) AS BIGINT) AS session_end_us,
           CAST(max(us) - min(us) AS BIGINT) AS duration_us
    FROM sess GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization of the events stream: per-session
    event counts, bounds, duration. One exchange total — the groupBy
    reuses the sessionize window's hash partitioning on user_id."""
    from alerta_spark.ops.sessions import session_stats

    ev = load_table(spark, sf_dir, "events")
    s = session_stats(ev, gap_minutes=30)
    return s.select(
        "user_id",
        "session_idx",
        "n_events",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "duration_us",
    )


@register(
    "funnel_signup_view_purchase",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
      GROUP BY e.user_id
    ),
    c AS (
      SELECT 1 AS step_idx, 'signup' AS step, count(*) AS n FROM s1
      UNION ALL SELECT 2, 'view', count(*) FROM s2
      UNION ALL SELECT 3, 'purchase', count(*) FROM s3
    )
    SELECT step_idx, step, n AS n_users,
           CAST(n AS DOUBLE) / CAST(first_value(n) OVER (ORDER BY step_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS DOUBLE) AS conversion
    FROM c
    """,
)
def funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup → view → purchase funnel with strict event-order
    semantics (each step's first qualifying event must follow the
    previous step's). Carried state is one timestamp per user,
    broadcast at every step."""
    from alerta_spark.ops.sessions import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(
        ev,
        [
            ("signup", F.col("event_type") == "signup"),
            ("view", F.col("event_type") == "view"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
    )


@register(
    "sample_stratified_rebalance",
    # thresholds are floor(frac * 16^8) in hex, exactly what
    # ops/sampling._threshold computes: en 0.25 -> '40000000',
    # de/es/fr keep-all -> 'g' sorts after every hex digit,
    # zh 0.5 -> '80000000'. Unlisted langs keep default 0.0 -> ''.
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 8) <
          CASE lang
            WHEN 'en' THEN '40000000'
            WHEN 'zh' THEN '80000000'
            WHEN 'de' THEN 'g'
            WHEN 'es' THEN 'g'
            WHEN 'fr' THEN 'g'
            ELSE ''
          END
    """,
)
def sample_stratified_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalance: downsample the over-represented strata
    (en 25%, zh 50%), keep all of the scarce ones — deterministic
    sampleBy via per-stratum md5 thresholds, map-only and pushdown-
    friendly. Same banding as sample_deterministic, so membership is
    retry- and engine-stable."""
    from alerta_spark.ops.sampling import stratified_deterministic_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_deterministic_sample(
        docs,
        {"en": 0.25, "zh": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0},
        strata_col="lang",
        salt="mix1",
    ).select("doc_id", "lang")


@register(
    "multimodal_features",
    # The fake decoder is sha256-based and therefore SQL-expressible:
    # feature[i] = uint16(digest[2i:2i+2]) / 65535.0. DuckDB's
    # sha256(VARCHAR) hashes the same UTF-8 bytes attach_fake_media
    # encodes, so the Arrow decode path gets a full value-hash check.
    oracle="""
    WITH f AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             sha256(text) AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           unnest(generate_series(0, 15)) AS feat_idx,
           unnest([(('0x' || substr(h, 4*i + 1, 4))::BIGINT) / 65535.0
                   for i in generate_series(0, 15)]) AS feat_value
    FROM f
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode+feature-extract (decode stubbed
    deterministically; Spark-side plumbing is the real thing)."""
    from alerta_spark.ops.multimodal import attach_fake_media, extract_features

    docs = attach_fake_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(docs)
    # Flatten the feature vector to (doc_id, feat_idx, feat_value) rows so
    # the output is hashable by the driver canonicalizer; the operator
    # keeps its array-native schema for pipeline consumers.
    return feats.select(
        "doc_id",
        "n_bytes",
        F.posexplode("features").alias("feat_idx", "feat_value"),
    )


# ---------------------------------------------------------------------------
# §2.7 — stateful sequence correlation (T3-T5). The general ordered
# per-key state machine is not SQL-expressible, but THIS catalog
# instance (2 threshold slots, fixed thresholds) is — so the entry
# carries a full hash-checked oracle; general semantics (deadman slots,
# expiry, streaming) are covered by tests/test_streaming.py.
# ---------------------------------------------------------------------------

SEQ_EVENTS_RULE = {
    "alert_name": "purchase_then_error",
    "alert_type": "sequence",
    "lifespan": "30 days",
    "slots": [
        {
            "alert_name": "big_buys",
            "alert_type": "threshold",
            "criteria": "event_type='purchase' AND CAST(json_extract_scalar(props,'$.k') AS INTEGER) > 80",
            "aggregation_key": "user_id",
            "threshold": 2,
        },
        {
            "alert_name": "then_error",
            "alert_type": "threshold",
            "criteria": "event_type='error'",
            "aggregation_key": "user_id",
            "threshold": 1,
        },
    ],
}


@register(
    "t3_sequence_correlator",
    # A fixed 2-slot threshold sequence IS SQL-expressible, so the
    # flagship stateful operator gets a full hash-checked oracle: slot 0
    # completes at its 2nd matching event per key (in (ts, eid-string)
    # order — the correlator sorts _eid as a string); slot 1 is the
    # first matching event STRICTLY after that anchor. Slot counts stop
    # at the threshold (events are tested only against the current
    # slot), so a completed state is always [2,1]; samples are the slot-0
    # matches plus the completing event (sample cap 3).
    oracle="""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS corr,
             CAST(event_id AS VARCHAR) AS eid, ts,
             (event_type = 'purchase'
              AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 80) AS m0,
             (event_type = 'error') AS m1
      FROM events WHERE user_id IS NOT NULL
    ),
    p AS (
      SELECT corr, eid, ts,
             row_number() OVER (PARTITION BY corr ORDER BY ts, eid) AS rn
      FROM ev WHERE m0
    ),
    anchor AS (
      SELECT corr,
             max(CASE WHEN rn = 1 THEN eid END) AS s1,
             max(CASE WHEN rn = 2 THEN eid END) AS s2,
             max(CASE WHEN rn = 2 THEN ts END) AS ats
      FROM p WHERE rn <= 2 GROUP BY corr
      HAVING count(*) = 2
    ),
    err AS (
      SELECT e.corr, e.eid,
             row_number() OVER (PARTITION BY e.corr ORDER BY e.ts, e.eid) AS rn
      FROM ev e JOIN anchor a ON e.corr = a.corr
      WHERE e.m1 AND (e.ts > a.ats OR (e.ts = a.ats AND e.eid > a.s2))
    )
    SELECT a.corr AS correlation_value,
           'purchase_then_error' AS alert_name,
           '[2,1]' AS slot_counts,
           to_json([a.s1, a.s2, er.eid]) AS sample_event_ids
    FROM anchor a
    JOIN (SELECT corr, eid FROM err WHERE rn = 1) er ON a.corr = er.corr
    """,
)
def t3_sequence_correlator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence correlation keyed by user: 2 big purchases then an
    error. applyInPandasWithState on streams; identical one-pass
    partition-level mapInPandas on batch (reference:
    alerta.py:274-317)."""
    from alerta_spark.streaming.correlator import sequence_correlator

    ev = load_table(spark, sf_dir, "events")
    # Array columns are serialized to JSON at the catalog boundary so the
    # result is hashable row-by-row (driver canonicalizer requirement);
    # the operator itself stays array-native.
    return sequence_correlator(ev, SEQ_EVENTS_RULE, "user_id").select(
        "correlation_value",
        "alert_name",
        F.to_json("slot_counts").alias("slot_counts"),
        F.to_json("sample_event_ids").alias("sample_event_ids"),
    )


# ---------------------------------------------------------------------------
# §2.5 extended relational surface — window functions, set ops, grouping
# sets, pivot, distinct/approx aggregates, session windows. The
# reference delegated this whole surface to Athena/Trino; a user
# switching engines needs it native.
# ---------------------------------------------------------------------------


@register(
    "w_running_agg_lag",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER w AS rn,
           lag(event_id) OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           CAST(sum(CAST(value AS DECIMAL(20,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           CAST(sum(CAST(value AS DECIMAL(20,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w_running_agg_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: ranking, lag/lead, running sum, moving average
    with explicit frames."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        # Sum exact decimals (associative, engine-independent), then one
        # cast to DOUBLE — a double running sum differs at the ulp across
        # engines (DuckDB uses segment-tree sliding aggregation) and a
        # DECIMAL-typed output canonicalizes differently in the driver.
        F.sum(F.col("value").cast("decimal(20,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_value"),
        # Sliding-frame float avg diverges between engines at the ulp level
        # (sliding-window aggregation algorithms differ), so: sum exact
        # decimals, one decimal->double cast, one IEEE division — bit-
        # deterministic on both sides.
        (
            F.sum(F.col("value").cast("decimal(20,2)"))
            .over(w.rowsBetween(-2, W.currentRow))
            .cast("double")
            / F.count("value").over(w.rowsBetween(-2, W.currentRow))
        ).alias("moving_avg"),
    )


@register(
    "set_ops_union_except_intersect",
    oracle="""
    WITH purchases AS (SELECT user_id FROM events WHERE event_type='purchase'),
         errors AS (SELECT user_id FROM events WHERE event_type='error'),
         signups AS (SELECT user_id FROM events WHERE event_type='signup')
    SELECT 'purchase_or_error' AS grp, count(*) AS n FROM (
      SELECT * FROM purchases UNION SELECT * FROM errors)
    UNION ALL
    SELECT 'purchase_minus_signup' AS grp, count(*) AS n FROM (
      SELECT * FROM purchases EXCEPT SELECT * FROM signups)
    UNION ALL
    SELECT 'purchase_and_error' AS grp, count(*) AS n FROM (
      SELECT * FROM purchases INTERSECT SELECT * FROM errors)
    """,
)
def set_ops_union_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / EXCEPT / INTERSECT (distinct semantics)."""
    ev = load_table(spark, sf_dir, "events")
    sel = lambda t: ev.where(F.col("event_type") == t).select("user_id")  # noqa: E731
    p, e, s = sel("purchase"), sel("error"), sel("signup")

    def one(name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("grp"), "n"
        )

    return (
        one("purchase_or_error", p.union(e).distinct())
        .unionByName(one("purchase_minus_signup", p.subtract(s)))
        .unionByName(one("purchase_and_error", p.intersect(e)))
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(20,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "agg_cube_distinct",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE + multiple COUNT(DISTINCT) (expand + two-phase agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (count per status column)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "window_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def window_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window aggregate (the hypertable-rollup shape;
    streaming-compatible via F.window)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("win"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("hour_start"), "event_type", "n", "total_value")
    )


@register(
    "session_windows_per_user",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) via F.session_window — native
    streaming-capable sessionization (oracle: gaps-and-islands SQL)."""
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


@register(
    "t2_hop_window_counts",
    oracle="""
    WITH hops AS (
      SELECT event_type,
             unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS hop_start
      FROM events
    )
    SELECT hop_start, event_type, count(*) AS n
    FROM hops GROUP BY hop_start, event_type
    """,
)
def t2_hop_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 hopping (sliding) windows: 1h windows every 30min — each
    event lands in exactly two epoch-aligned hops (alerta.py's
    overlapping 15-min cron scans, as a native window; streaming uses
    the identical expression). Oracle: each hop start enumerated per
    event."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("hop_start"), "event_type", "n")
    )


@register(
    "c15_json_keys",
    oracle="""
    SELECT event_id, unnest(json_keys(props)) AS key FROM events
    """,
)
def c15_json_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6/C15 keypath enumeration (reference dict walkers,
    utils/dict_helpers.py enum_keys) over JSON payloads: one row per
    (event, top-level key), JVM-side json_object_keys — schema
    discovery over a schemaless payload column at scan speed."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.explode(F.json_object_keys("props")).alias("key")
    )


@register("agg_approx_quantiles", oracle=None)  # sketch-based: rows-only
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (KLL/HLL-style sketches): percentile_approx
    + approx_count_distinct — the constant-memory path for 100 TB
    profiling."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("value_pcts"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )
    # Explode the percentile array to (event_type, pct, pct_value) rows —
    # hashable by the driver canonicalizer (arrays are not).
    pcts = F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
    return agg.select(
        "event_type",
        "approx_users",
        F.posexplode("value_pcts").alias("pct_idx", "pct_value"),
    ).select(
        "event_type",
        "approx_users",
        F.element_at(pcts, F.col("pct_idx") + 1).alias("pct"),
        "pct_value",
    )


@register(
    "agg_exact_percentiles",
    # Exact interpolated percentiles: Spark `percentile` and DuckDB
    # `quantile_cont` both sort and interpolate lo + (hi-lo)*frac —
    # deterministic on both engines (unlike the sketch-based approx
    # entry, which stays rows-only alongside).
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, [0.25, 0.5, 0.75, 0.9, 0.99]) AS qs
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           -- the bare literal list is DECIMAL(3,2) in DuckDB ('0.50')
           unnest([CAST(0.25 AS DOUBLE), 0.5, 0.75, 0.9, 0.99]) AS pct,
           unnest(qs) AS pct_value
    FROM q
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile profile per event type (25/50/75/90/99): the
    oracle-checkable companion to agg_approx_quantiles. Exact
    percentile needs a per-group sort, so it is the small-group /
    verification path; the approx sketch is the 100 TB path."""
    ev = load_table(spark, sf_dir, "events")
    pcts = [0.25, 0.5, 0.75, 0.9, 0.99]
    pcts_arr = F.array(*[F.lit(p) for p in pcts])
    agg = ev.groupBy("event_type").agg(
        F.percentile("value", pcts_arr).alias("qs")
    )
    return agg.select(
        "event_type", F.posexplode("qs").alias("pct_idx", "pct_value")
    ).select(
        "event_type",
        F.element_at(pcts_arr, F.col("pct_idx") + 1).alias("pct"),
        "pct_value",
    )


# ---------------------------------------------------------------------------
# §2.6 scalar functions + §2.2 plugin routing + A3 expected-set deadman —
# the remaining oracle-checkable inventory items.
# ---------------------------------------------------------------------------


@register(
    "c8_timestamp_coercion",
    oracle="""
    WITH v(raw) AS (VALUES ('1700000000'), ('1700000000000'),
                           ('1700000000000000'), ('1700000000000000000'),
                           ('2023-11-14T22:13:20'), ('not a time'))
    SELECT raw,
      CASE
        WHEN TRY_CAST(raw AS DOUBLE) IS NOT NULL THEN
          CASE
            WHEN TRY_CAST(raw AS HUGEINT) < 100000000000 THEN to_timestamp(TRY_CAST(raw AS DOUBLE))::TIMESTAMP
            WHEN TRY_CAST(raw AS HUGEINT) < 100000000000000 THEN make_timestamp((TRY_CAST(raw AS HUGEINT) * 1000)::BIGINT)
            WHEN TRY_CAST(raw AS HUGEINT) < 100000000000000000 THEN make_timestamp(TRY_CAST(raw AS HUGEINT)::BIGINT)
            ELSE make_timestamp((TRY_CAST(raw AS HUGEINT) / 1000)::BIGINT)
          END
        ELSE TRY_CAST(raw AS TIMESTAMP)
      END AS coerced
    FROM v
    """,
)
def c8_timestamp_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toUTC epoch-magnitude heuristic (utils/dates.py:38-85): one
    expression classifies s/ms/us/ns epochs and ISO strings."""
    from alerta_spark.functions.scalars import to_utc

    df = spark.createDataFrame(
        [
            ("1700000000",),
            ("1700000000000",),
            ("1700000000000000",),
            ("1700000000000000000",),
            ("2023-11-14T22:13:20",),
            ("not a time",),
        ],
        "raw string",
    )
    return df.select("raw", to_utc(F.col("raw")).alias("coerced"))


@register(
    "c16_ip_validation",
    oracle=r"""
    SELECT event_id,
           concat('10.0.', CAST(user_id AS VARCHAR), '.', CAST(event_id % 300 AS VARCHAR)) AS ip,
           regexp_matches(concat('10.0.', CAST(user_id AS VARCHAR), '.', CAST(event_id % 300 AS VARCHAR)),
             '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$') AS valid_v4
    FROM events
    """,
)
def c16_ip_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_ipv4 as a pure rlike (utils/helpers.py:44-74) — octets > 255
    (event_id % 300) correctly rejected."""
    from alerta_spark.functions.scalars import is_ipv4

    ev = load_table(spark, sf_dir, "events")
    ip = F.concat(
        F.lit("10.0."),
        F.col("user_id").cast("string"),
        F.lit("."),
        (F.col("event_id") % 300).cast("string"),
    )
    return ev.select("event_id", ip.alias("ip"), is_ipv4(ip).alias("valid_v4"))


@register(
    "c17_cloudtrail_filenames",
    oracle=r"""
    SELECT event_id,
           CASE WHEN event_id % 3 = 0
                THEN concat(CAST(user_id AS VARCHAR), '_cloudtrail_', event_type, '.json.gz')
                WHEN event_id % 3 = 1
                THEN concat('cloudtrail_', event_type, '.json.gz')
                ELSE concat(CAST(user_id AS VARCHAR), '_', event_type, '.log')
           END AS fname,
           regexp_matches(
             CASE WHEN event_id % 3 = 0
                  THEN concat(CAST(user_id AS VARCHAR), '_cloudtrail_', event_type, '.json.gz')
                  WHEN event_id % 3 = 1
                  THEN concat('cloudtrail_', event_type, '.json.gz')
                  ELSE concat(CAST(user_id AS VARCHAR), '_', event_type, '.log')
             END, '(?i)\d+_cloudtrail_.+.json.gz$') AS is_ct
    FROM events
    """,
)
def c17_cloudtrail_filenames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17 `is_cloudtrail` filename predicate (utils/helpers.py:10,
    39-41) over synthesized filenames: only `<digits>_cloudtrail_*.
    json.gz` forms pass (the un-prefixed variant correctly rejected)."""
    from alerta_spark.functions.scalars import is_cloudtrail

    ev = load_table(spark, sf_dir, "events")
    fname = (
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("_cloudtrail_"),
                F.col("event_type"),
                F.lit(".json.gz"),
            ),
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(F.lit("cloudtrail_"), F.col("event_type"), F.lit(".json.gz")),
        )
        .otherwise(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("_"),
                F.col("event_type"),
                F.lit(".log"),
            )
        )
    )
    return ev.select(
        "event_id", fname.alias("fname"), is_cloudtrail(fname).alias("is_ct")
    )


@register(
    "c16_cidr_membership",
    oracle="""
    WITH ips AS (
      SELECT event_id,
             concat('10.', CAST(user_id % 256 AS VARCHAR), '.',
                    CAST(event_id % 256 AS VARCHAR), '.',
                    CAST((event_id // 7) % 300 AS VARCHAR)) AS ip
      FROM events
    )
    SELECT event_id, ip,
           CASE WHEN NOT regexp_matches(ip,
             '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$')
             THEN FALSE
             ELSE (CAST(split_part(ip,'.',1) AS BIGINT)*16777216
                 + CAST(split_part(ip,'.',2) AS BIGINT)*65536
                 + CAST(split_part(ip,'.',3) AS BIGINT)*256
                 + CAST(split_part(ip,'.',4) AS BIGINT))
                  BETWEEN 167772160 AND 184549375  -- 10.0.0.0/8
           END AS in_net
    FROM ips
    """,
)
def c16_cidr_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR membership (reference is_ip accepts `10.0.0.0/8` via
    netaddr, utils/helpers.py:44-61): pure-codegen dotted-quad ->
    uint32 BETWEEN range test; malformed octets (>=256) are FALSE,
    not NULL."""
    from alerta_spark.functions.scalars import in_cidr

    ev = load_table(spark, sf_dir, "events")
    ip = F.concat(
        F.lit("10."),
        (F.col("user_id") % 256).cast("string"),
        F.lit("."),
        (F.col("event_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("event_id") / 7).cast("long") % 300).cast("string"),
    )
    return ev.select(
        "event_id", ip.alias("ip"), in_cidr(ip, "10.0.0.0/8").alias("in_net")
    )


@register(
    "f11_plugin_routing",
    oracle="""
    SELECT event_id, event_type,
           (event_type IN ('purchase', 'error')) AS routed
    FROM events
    """,
)
def f11_plugin_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plugin routing predicate: registration-token overlap with the
    event's token set (utils/plugins.py:78-93) as arrays_overlap."""
    ev = load_table(spark, sf_dir, "events")
    reg = F.array(F.lit("purchase"), F.lit("error"))
    tokens = F.array(F.col("event_type"))
    return ev.select(
        "event_id", "event_type", F.arrays_overlap(tokens, reg).alias("routed")
    )


@register(
    "a3_deadman_expected_keys",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND ts >= (SELECT max(ts) - INTERVAL 24 HOUR FROM events)
    )
    SELECT c.c_custkey AS expected_key
    FROM customer c
    LEFT JOIN active a ON a.user_id = c.c_custkey
    WHERE a.user_id IS NULL AND c.c_custkey < 150
    """,
)
def a3_deadman_expected_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable deadman variant: absence per EXPECTED key via left-anti
    join against the active set — the outer-join generalization of the
    reference's single synthesized zero row (alerta.py:384-386)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 150)
    cut = ev.select((F.max("ts") - F.expr("INTERVAL 24 HOURS")).alias("cut"))
    active = (
        ev.crossJoin(F.broadcast(cut))
        .where((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("cut")))
        .select("user_id")
        .distinct()
    )
    return cust.join(
        active, cust["c_custkey"] == active["user_id"], "left_anti"
    ).select(F.col("c_custkey").alias("expected_key"))


@register(
    "s4_variant_payload",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
    """,
)
def s4_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload via Spark 4 VariantType: parse_json once,
    typed variant_get access — the native schema-on-read path for the
    reference's `details` column (SURVEY.md §1.3)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return ev.select("event_id", k.alias("k_int")).where(k.isNotNull())


@register(
    "sql_api_passthrough",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(json_extract_string(props,'$.k') AS INTEGER) BETWEEN 10 AND 90
    GROUP BY event_type
    """,
)
def sql_api_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw Spark SQL surface: users of the reference write Trino
    SQL; here the same statement (dialect-shimmed) runs via spark.sql
    over a temp view — proving criteria can be arbitrary SQL, not just
    compiled DataFrame calls."""
    from alerta_spark.dialect import trino_to_spark

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    sql = trino_to_spark(
        """
        SELECT event_type,
               count(*) AS n,
               count(DISTINCT user_id) AS n_users,
               CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value
        FROM events_v
        WHERE CAST(json_extract_scalar(props,'$.k') AS INTEGER) BETWEEN 10 AND 90
        GROUP BY event_type
        """
    )
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# Temporal joins — as-of (latest prior match) and range containment —
# composed from built-ins, oracle-checked against DuckDB's native
# ASOF JOIN / inequality join.
# ---------------------------------------------------------------------------


@register(
    "asof_join_latest_order",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey, o.o_orderdate
    FROM events e
    ASOF LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event enriched with the user's most recent
    order at event time. Union + last_value-ignore-nulls window — one
    key shuffle, no range cross-product (operators/asof.py)."""
    from alerta_spark.operators.asof import as_of_join

    ev = load_table(spark, sf_dir, "events")
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
        )
    )
    out = as_of_join(
        ev.select("event_id", "user_id", "ts"),
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey"],
    )
    return out.select(
        "event_id", "user_id", "ts", "o_orderkey",
        F.col("o_orderdate_right").alias("o_orderdate"),
    )


@register(
    "range_join_orders_followup",
    oracle="""
    SELECT a.o_orderkey AS first_order, count(*) AS n_followups
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND b.o_orderdate >= a.o_orderdate
     AND b.o_orderdate < a.o_orderdate + INTERVAL 30 DAY
     AND a.o_orderkey != b.o_orderkey
    GROUP BY a.o_orderkey
    """,
)
def range_join_orders_followup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: follow-up orders by the same customer within 30
    days — equi-join on the key with a range residual (hash join + a
    cheap filter, NOT a nested loop over the cross product)."""
    from alerta_spark.operators.asof import range_join

    orders = load_table(spark, sf_dir, "orders")
    windows = orders.select(
        "o_custkey",
        F.col("o_orderkey").alias("first_order"),
        F.col("o_orderdate").alias("win_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("win_end"),
    )
    followups = range_join(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        windows,
        on="o_custkey",
        left_ts="o_orderdate",
        lower="win_start",
        upper="win_end",
    ).where(F.col("o_orderkey") != F.col("first_order"))
    return followups.groupBy("first_order").agg(
        F.count(F.lit(1)).alias("n_followups")
    )


# ---------------------------------------------------------------------------
# Subquery surface — correlated scalar, IN + HAVING, NOT EXISTS, and a
# top-k join (TPC-H Q3/Q17/Q18/Q22 shapes). The reference delegated all
# of this to Athena/Trino; a user switching engines writes these
# directly. Each Spark plan is the decorrelated scale shape: the
# subquery becomes a pre-aggregated (broadcastable) join input instead
# of a per-row probe.
# ---------------------------------------------------------------------------


@register(
    "tpch_q4_late_ship_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS decorrelation): orders with any line
    shipped >30 days after order date, counted per priority. The
    correlated EXISTS compiles to one left-semi join on the order key
    with the lateness predicate as a join condition — no per-row
    subquery execution (testdata lacks commit/receipt dates, so the
    lateness predicate is shipdate-based)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2)) * (1 - CAST(l.l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact-fact join ->
    grouped revenue -> global top-10 (TakeOrderedAndProject, no full
    sort at scale). Deterministic tie-break on l_orderkey."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a region-pruned dim chain and a
    customer-supplier co-nation constraint. The dim chain
    (region->nation->supplier) broadcasts; only the lineitem-orders
    fact-fact join shuffles — the join order Catalyst should and does
    pick once the selective region filter is declared first."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(dim),
            (li.l_suppkey == dim.s_suppkey)
            & (c.c_nationkey == dim.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))
                    * CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-aggregate with three pushable range
    predicates — the canonical pushdown/pruning probe (every filter
    reaches the parquet scan; ReadSchema is 4 columns). No shuffle but
    the final single-row partial-agg merge."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, global
    top-20 — selective fact filters on both sides of the fact-fact
    join, broadcast dims, TakeOrderedAndProject instead of a full sort.
    Deterministic tie-break on c_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_priority_mix",
    oracle="""
    SELECT l.l_returnflag,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: testdata lineitem has no l_shipmode,
    so the group key is l_returnflag): fact-fact join + conditional
    aggregation (CASE inside sum). Integer outputs — exact everywhere."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    WITH agg AS (
      SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                           THEN CAST(l.l_extendedprice AS DECIMAL(20,2))
                                * (1 - CAST(l.l_discount AS DECIMAL(20,2)))
                           ELSE 0 END) AS DOUBLE) AS promo_revenue,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS total_revenue
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
        AND l.l_shipdate < TIMESTAMP '1997-09-01'
    )
    SELECT promo_revenue, total_revenue,
           100.0 * promo_revenue / total_revenue AS promo_pct
    FROM agg
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dim join + conditional revenue ratio.
    Both sums accumulate in DECIMAL and cast to double ONCE; the pct is
    a single IEEE division of two bit-identical doubles, so the float
    output still hash-matches across engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(20,2)")))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(20,2))
               * (1 - CAST(l.l_discount AS DECIMAL(20,2))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship
    year. The two nation dims broadcast onto supplier/customer; the
    disjunctive pair filter lands on the broadcast-joined columns
    before the fact-fact shuffle, so only qualifying lineitems reach
    the orders join."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    sd = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("snk"),
    ).select("s_suppkey", "supp_nation")
    cd = c.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))),
        c.c_nationkey == F.col("cnk"),
    ).select("c_custkey", "cust_nation")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(sd), li.l_suppkey == sd.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cd), o.o_custkey == cd.c_custkey)
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH volumes AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(20,2))
               * (1 - CAST(l.l_discount AS DECIMAL(20,2))) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM volumes GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share of a part segment inside a
    customer region, by order year. Every dim (part filter, supplier
    nation, customer nation→region) broadcasts; the single real
    exchange is lineitem⋈orders. Both sums accumulate DECIMAL and the
    share is one IEEE division — hash-exact across engines."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    sd = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("snk"),
    ).select("s_suppkey", "supp_nation")
    cd = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sd), li.l_suppkey == sd.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cd), o.o_custkey == cd.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
                    F.lit(0).cast("decimal(20,2)")
                )
            )
            .cast("double")
            .alias("nat"),
            F.sum(vol).cast("double").alias("tot"),
        )
    )
    return agg.select(
        "o_year", (F.col("nat") / F.col("tot")).alias("mkt_share")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(20,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 5 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 40
           AND l.l_quantity >= 10 AND l.l_quantity <= 45)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. The
    per-table halves of each conjunct (brand+size on part, quantity on
    lineitem) can't individually be pushed below the join without
    changing semantics, but the OR's table-local envelopes CAN — Spark
    derives `brand IN (…)` / quantity-range envelope filters below the
    join, and the residual disjunction evaluates on the joined row.
    Part side broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 5)
        & (F.col("l_quantity") <= 30)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(10, 40)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 45)
    )
    return j.where(cond).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "subquery_correlated_small_qty",
    oracle="""
    SELECT count(*) AS n_small,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS total_extprice
    FROM lineitem l
    WHERE CAST(l.l_quantity AS DECIMAL(20,2)) * 5 *
          (SELECT count(*) FROM lineitem i WHERE i.l_partkey = l.l_partkey)
        < (SELECT sum(CAST(i.l_quantity AS DECIMAL(20,2)))
           FROM lineitem i WHERE i.l_partkey = l.l_partkey)
    """,
)
def subquery_correlated_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (qty < 0.2 * per-part
    avg) decorrelated into one per-part aggregate joined back to the
    fact — one shuffle on l_partkey instead of a per-row probe. The
    predicate is rearranged to exact DECIMAL arithmetic
    (qty*5*cnt < sum) so both engines agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(per_part, "l_partkey")
        .where(dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sq"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum(dec("l_extendedprice")).cast("double").alias("total_extprice"),
        )
    )


@register(
    "subquery_in_large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(20,2))) > 300
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
    """,
)
def subquery_in_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN (grouped HAVING subquery) as a left_semi
    join against the aggregated key set — the qualifying-orderkey side
    is tiny after HAVING, so it broadcasts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .where(F.col("sq") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
    )


@register(
    "subquery_not_exists_idle_rich",
    oracle="""
    WITH stats AS (
      SELECT sum(CAST(c_acctbal AS DECIMAL(20,2))) AS s, count(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment, count(*) AS n_custs,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(20,2))) AS DOUBLE) AS total_bal
    FROM customer c, stats
    WHERE CAST(c.c_acctbal AS DECIMAL(20,2)) * stats.n > stats.s
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY c.c_mktsegment
    """,
)
def subquery_not_exists_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar aggregate (broadcast single-row
    cross join, exact bal*n > sum DECIMAL compare — no float-boundary
    flakiness) + NOT EXISTS as a left_anti join on the filtered orders
    key set."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    stats = c.where(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .where(dec("c_acctbal") * F.col("n") > F.col("s"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


@register(
    "f10_dict_match",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE event_type = 'purchase'
      AND json_extract_string(props, '$.k') = '69'
    """,
)
def f10_dict_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 dict subset match (utils/dict_helpers.py:63-76): a query
    dict {'event_type': 'purchase', 'props': {'k': 69}} compiled to an
    AND of path-column equalities (codegen, no UDF)."""
    from alerta_spark.paths import dict_match

    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        dict_match(ev, {"event_type": "purchase", "props": {"k": 69}})
    ).select("event_id", "event_type")


@register(
    "c9_date_parts",
    oracle="""
    SELECT strftime(ts, '%Y') AS year, strftime(ts, '%m') AS month,
           strftime(ts, '%d') AS day, strftime(ts, '%H') AS hour,
           count(*) AS n
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
)
def c9_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 get_date_parts (utils/dates.py:13-35): zero-padded
    year/month/day/hour partition strings — the lake partition key
    derivation, here as a rollup over the events table."""
    from alerta_spark.functions.scalars import date_parts

    ev = load_table(spark, sf_dir, "events")
    p = date_parts(F.col("ts"))
    return (
        ev.select(p.alias("p"))
        .groupBy("p.year", "p.month", "p.day", "p.hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "rollup_incremental_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS sum_value,
           round(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) / count(*), 6) AS avg_value,
           min(ts) AS min_ts, max(ts) AS max_ts
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_incremental_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained hourly rollup (ops/rollup.py): two
    disjoint deltas aggregated to PARTIALS, combined, finalized — the
    oracle is the monolithic GROUP BY over all events, proving the
    combine algebra is lossless (what makes O(delta) maintenance of a
    100 TB continuous aggregate sound)."""
    from alerta_spark.ops.rollup import (
        combine_partials,
        finalize_rollup,
        rollup_partials,
    )

    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    return finalize_rollup(
        combine_partials(rollup_partials(a), rollup_partials(b))
    )


@register(
    "stats_winsorize_values",
    # Clip to per-type exact [p01, p99]: quantile_cont and Spark
    # `percentile` interpolate identically; the clamp picks one of two
    # already-identical doubles — no new float math anywhere.
    oracle="""
    WITH b AS (
      SELECT event_type, quantile_cont(value, [0.01, 0.99]) AS q
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN e.value IS NULL THEN NULL
                ELSE least(greatest(e.value, q[1]), q[2]) END AS value_w,
           CASE WHEN e.value IS NULL THEN NULL
                ELSE e.value < q[1] OR e.value > q[2] END AS clipped
    FROM events e JOIN b USING (event_type)
    """,
)
def stats_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip event values to the per-type exact p01/p99
    band — bounds aggregate broadcast over one map-only corpus pass."""
    from alerta_spark.ops.stats import winsorize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return winsorize(ev, "value", ["event_type"], lo=0.01, hi=0.99)


@register(
    "profile_key_skew",
    oracle="""
    WITH c AS (
      SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
      FROM events GROUP BY CAST(user_id AS VARCHAR)
    ),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM c),
    r AS (
      SELECT key, CAST(cnt AS BIGINT) AS cnt,
             row_number() OVER (ORDER BY cnt DESC, key ASC NULLS FIRST) AS rank
      FROM c
    )
    SELECT key, cnt, CAST(rank AS BIGINT) AS rank,
           CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share_of_total,
           CAST(cnt AS DOUBLE)
             / (CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE)) AS ratio_to_mean
    FROM r, t WHERE rank <= 10
    """,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle pre-flight: top-10 heaviest join/agg keys with share of
    all rows and ratio to the mean key size (NULL keys first-class) —
    the numbers that pick between plain shuffle, salting, and AQE
    skew-join. One aggregate + broadcast totals + TakeOrdered cut."""
    from alerta_spark.ops.profile import skew_report

    return skew_report(load_table(spark, sf_dir, "events"), "user_id", top_n=10)


@register(
    "text_clean_lines",
    # Deterministic liner (8 words per line) + C4-style line gate:
    # keep lines with >= 6 words and no 'slow' marker; drop docs with
    # zero surviving lines. Both engines run the same split/chunk/
    # filter/join pipeline in their native list lambdas.
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    lined AS (
      SELECT doc_id,
             list_transform(
               range(0, CAST(ceil(len(tk) / 8.0) AS BIGINT)),
               i -> array_to_string(tk[i*8+1 : i*8+8], ' ')
             ) AS lines
      FROM toks
    ),
    cleaned AS (
      SELECT doc_id, lines,
             list_filter(
               lines,
               ln -> len(string_split(ln, ' ')) >= 6
                     AND ln NOT LIKE '%slow%'
             ) AS keep
      FROM lined
    )
    SELECT doc_id,
           array_to_string(keep, chr(10)) AS clean_text,
           CAST(len(keep) AS BIGINT) AS n_lines_kept,
           CAST(len(lines) - len(keep) AS BIGINT) AS n_lines_dropped
    FROM cleaned
    WHERE len(keep) >= 1
    """,
)
def text_clean_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level corpus cleaning (C4/Gopher style): deterministic
    8-word liner, then drop short (<6 words) or marker-bearing lines
    and docs left empty — map-only codegen, zero shuffles."""
    from alerta_spark.ops.text import chunk_into_lines, clean_lines

    docs = load_table(spark, sf_dir, "documents")
    lined = chunk_into_lines(docs, words_per_line=8)
    return clean_lines(
        lined, min_words=6, banned_substrings=("slow",), min_lines_kept=1
    )


@register(
    "corpus_snapshot_diff",
    # Deterministic second snapshot: drop doc_id%7==0 (removed),
    # append a marker to text for doc_id%5==0 (changed), add doc_id+
    # 100000 twins for doc_id%11==0 (added). The oracle diffs content
    # semantically (IS DISTINCT FROM); the Spark op compares one
    # null-tagged md5 digest per side — same answer, ~48 bytes/row
    # through the 100 TB shuffle instead of the row bodies.
    oracle="""
    WITH newsnap AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' [v2]' ELSE text END AS text,
             lang, source, n_chars
      FROM documents WHERE doc_id % 7 != 0
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change
    FROM documents o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL
       OR o.text IS DISTINCT FROM n.text
       OR o.lang IS DISTINCT FROM n.lang
       OR o.source IS DISTINCT FROM n.source
       OR o.n_chars IS DISTINCT FROM n.n_chars
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (added/removed/changed) between two corpus
    versions via digest-only full outer join — the incremental
    pipeline pre-flight."""
    from alerta_spark.ops.io import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    changed = docs.where(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
        ).otherwise(F.col("text")),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    new = changed.unionByName(added)
    return snapshot_diff(
        docs, new, content_cols=["text", "lang", "source", "n_chars"]
    )


@register(
    "agg_distinct_users_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
           event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily distinct users per event type — the oracle-checked
    companion to the HLL-sketch rollup (which is rows-only: the
    DataSketches estimate has no DuckDB twin). At 100 TB the exact
    form shuffles every (day, type, user) triple once; the sketch form
    in ops/sketches.py never re-shuffles history."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("DAY", F.col("ts")).alias("bucket_start"),
        "event_type",
    ).agg(F.countDistinct("user_id").alias("n_distinct"))


@register("agg_distinct_users_daily_hll", oracle=None)  # sketch: rows-only
def agg_distinct_users_daily_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-merged HLL distinct-count rollup: two disjoint
    deltas sketched separately then hll_union_agg-combined — the
    constant-memory, O(delta)-maintenance form of the exact query
    above. Register merge is pointwise max (commutative+associative),
    so the incremental estimate equals the monolithic one bit-for-bit;
    estimate-vs-exact error bounds pinned in tests/test_sketches.py."""
    from alerta_spark.ops.sketches import (
        combine_distinct_partials,
        distinct_partials,
        finalize_distinct,
    )

    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    return finalize_distinct(
        combine_distinct_partials(
            distinct_partials(a, bucket="1 day"),
            distinct_partials(b, bucket="1 day"),
        )
    )


@register(
    "a5_topk_per_group_salted",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 2
    """,
)
def a5_topk_per_group_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 top-k per group, skew-resistant: salted two-phase ranking
    (operators/topk.py) — SAME oracle as a5_topk_per_group, proving the
    salted decomposition returns the identical rows while bounding the
    per-task group size under key skew."""
    from alerta_spark.operators.topk import topk_per_group_salted

    ev = load_table(spark, sf_dir, "events")
    return topk_per_group_salted(
        ev, ["user_id"], ["ts", "event_id"], k=2
    ).select("event_id", "user_id", "event_type")


@register(
    "text_redact_pii",
    oracle=r"""
    WITH spiked AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
             '.7 or 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
             '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[PII]', 'g'),
             '\b\d{3}[-.]\d{4}\b', '[PII]', 'g') AS text_redacted,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
           len(regexp_extract_all(text, '\b\d{3}[-.]\d{4}\b')) AS n_phone
    FROM spiked
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (training-data hygiene): documents spiked with
    deterministic synthetic PII, then redacted + counted per category
    in one map-only projection (ops/text.redact_pii)."""
    from alerta_spark.ops.text import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    spiked = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 or 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("text"),
    )
    return redact_pii(spiked)


@register(
    "dedup_clusters",
    oracle=None,  # set below (needs _DUCK_SHINGLES)
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters over exact n-gram-Jaccard pairs:
    iterative min-label propagation (connected components), cluster_id
    = component min id (the kept survivor). Oracle: DuckDB recursive
    CTE computing the same closure."""
    from alerta_spark.ops.dedupe import dup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=5, threshold=0.8
    )
    return dup_clusters(pairs)


@register("dedup_keep_canonical")
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup cut: near-dup pairs -> transitive clusters
    -> keep the min-id survivor per cluster + every unclustered doc.
    This is the frame a training pipeline actually writes out. One
    anti-join after clustering; oracle = recursive-CTE closure +
    NOT IN (set below, shares the pairs CTE with dedup_clusters)."""
    from alerta_spark.ops.dedupe import (
        dup_clusters,
        keep_canonical,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=5, threshold=0.8)
    return keep_canonical(docs, dup_clusters(pairs)).select(
        "doc_id", "source", "lang"
    )


def _clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE s AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
    )
    SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
    """


QUERIES["dedup_clusters"]["oracle"] = _clusters_oracle()


def _keep_canonical_oracle() -> str:
    return f"""
    WITH RECURSIVE s AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
    ),
    labels AS (
      SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    )
    SELECT d.doc_id, d.source, d.lang
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM labels WHERE cluster_id < doc_id)
    """


QUERIES["dedup_keep_canonical"]["oracle"] = _keep_canonical_oracle()


# ---------------------------------------------------------------------------
# §2.5 round-3 relational widening — the remaining TPC-H shapes the
# testdata schema supports (no partsupp/c_phone/receiptdate, so Q2,
# Q11, Q16, Q20-22 are out of reach; Q13/Q15/Q18 and an adapted Q9
# close out the join/agg plan-shape families), plus exact-moment
# statistics and histogram profiling for the 100 TB data-audit tier.
# ---------------------------------------------------------------------------


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — outer join
    with an ON-clause filter (NOT a WHERE, which would turn it inner),
    then a two-level aggregation. The first groupBy reuses the join's
    hash partitioning on c_custkey (no extra exchange); the second is
    a near-trivial shuffle over distinct counts. All-integer outputs.
    At scale the left join's NULL-heavy build side is the classic skew
    spot — AQE skew-join splits it; counts stay exact regardless."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             -- DECIMAL(12,2) inputs (the TPC-H column width): a (20,2)
             -- product overflows DuckDB's 38-digit limit and silently
             -- degrades to DOUBLE, shifting the sum by a cent. Keep the
             -- exact scale-4 sum: a scale-REDUCING decimal cast truncates
             -- in DuckDB but rounds half-up in Spark (.1794 -> .17 vs .18).
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier by quarterly revenue — an
    aggregate view consumed twice (per-supplier revenue AND its global
    max). The view is computed once; the 1-row max is broadcast back
    (no second scan, no driver collect). Revenue compared in
    DECIMAL(20,2) — exact equality, no float max ties."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    dec = lambda col: F.col(col).cast("decimal(12,2)")  # noqa: E731
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 170
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — an aggregated HAVING
    subquery feeding a semi-join on the fact table, then re-aggregation
    with dimension context. The heavy lineitem aggregate runs ONCE and
    serves as both the filter and (via the semi-joined re-scan) the
    summed quantity; orders/customer broadcast. l_quantity is
    integral-valued, so sum-then-BIGINT is exact in any order.
    Global top-100 via TakeOrderedAndProject, not a full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 170)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(big.select("l_orderkey"), "l_orderkey", "left_semi")
        .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q9_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(extract(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(20,2)))) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table in testdata, so
    profit omits the supplycost term): product-line profit by supplier
    nation and order year — the widest join tree in the suite (4 dims
    around lineitem). Filtered part, supplier, and nation broadcast;
    orders is the single fact-fact shuffle. Money in DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    dec = lambda col: F.col(col).cast("decimal(20,2)")  # noqa: E731
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "tpch_q2_min_cost_supplier",
    # Q2 shape adapted to this testdata (no partsupp table): the
    # supplier offering the minimum observed unit price per part in a
    # region, via a correlated-min — expressed as a window min so the
    # per-(part,supplier) aggregate is computed ONCE (the classic
    # aggregate-view-consumed-twice decorrelation). Unit price is one
    # per-row IEEE division; min is order-independent -> cross-engine
    # exact.
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey, n.n_name, s.s_name,
             CAST(s.s_acctbal AS DOUBLE) AS s_acctbal,
             min(CAST(l.l_extendedprice AS DOUBLE)
                 / CAST(l.l_quantity AS DOUBLE)) AS unit_price
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND l.l_quantity > 0
      GROUP BY l.l_partkey, l.l_suppkey, n.n_name, s.s_name, s.s_acctbal
    ),
    ranked AS (
      SELECT *, min(unit_price) OVER (PARTITION BY l_partkey) AS best_price
      FROM cost
    )
    SELECT p.p_partkey, p.p_brand, c.s_name, c.n_name, c.s_acctbal,
           c.unit_price
    FROM ranked c JOIN part p ON p.p_partkey = c.l_partkey
    WHERE c.unit_price = c.best_price AND p.p_size <= 10
    ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within a region.
    The correlated min-subquery decorrelates into ONE aggregate + a
    window min over the part key — no self-join, no second scan of the
    aggregate lineage. Dims broadcast; one fact shuffle to the
    (part, supplier) grain, reused by the window."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )
    cost = (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("l_partkey", "l_suppkey", "n_name", "s_name", "s_acctbal")
        .agg(
            F.min(
                F.col("l_extendedprice").cast("double")
                / F.col("l_quantity").cast("double")
            ).alias("unit_price")
        )
    )
    w = W.partitionBy("l_partkey")
    ranked = cost.withColumn("best_price", F.min("unit_price").over(w))
    return (
        ranked.where(F.col("unit_price") == F.col("best_price"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "unit_price",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11_important_parts",
    # Q11 shape without partsupp: parts whose revenue exceeds a fixed
    # fraction of TOTAL revenue — a group aggregate HAVING against a
    # global scalar. The per-part frame is persisted so the totals
    # branch reads the cache instead of re-scanning the fact table;
    # the scalar rides a broadcast cross-join. Revenue sums are exact
    # DECIMAL; the threshold compare happens in DOUBLE with a margin
    # (values quantized at 1e-4) far above any ulp.
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS v
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, CAST(v AS DOUBLE) AS part_value
    FROM rev
    WHERE CAST(v AS DOUBLE) > 0.0006 * (SELECT CAST(sum(v) AS DOUBLE) FROM rev)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups filtered against a scalar derived from
    the SAME aggregate (value > fraction of total). The aggregate is
    cached (it is |parts|-sized, not fact-sized) and consumed by both
    the row stream and the 1-row total, which then broadcasts — one
    fact scan, one shuffle, no second pass."""
    from alerta_spark.ops.dedupe import _persist

    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(12,2)")  # noqa: E731
    rev = _persist(
        li.groupBy("l_partkey").agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
                "v"
            )
        )
    )
    total = rev.agg(F.sum("v").cast("double").alias("_tv"))
    return (
        rev.crossJoin(F.broadcast(total))
        .where(F.col("v").cast("double") > F.lit(0.0006) * F.col("_tv"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q16_supplier_cnt_by_part_attr",
    # Q16 shape via lineitem as the part-supplier bridge (no partsupp
    # table): distinct supplier count per (brand, type, size) bucket,
    # excluding an unwanted-supplier set via NOT IN (compiled to a
    # broadcast anti-join). Pure integer outputs.
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 7, 10, 13)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%9'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_cnt_by_part_attr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each part
    bucket, minus a blocklisted supplier set. The part filter broadcasts
    into the fact scan; the blocklist is a broadcast LEFT ANTI join
    (never a shuffled NOT IN); one shuffle for the distinct-count
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13))
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%9"))
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_bulk_part_suppliers",
    # Q20 shape: suppliers in one nation who shipped a bulk quantity
    # of any part matching a name filter in a window year — the nested
    # IN-subquery chain becomes a semi-join onto an aggregated
    # (supplier, part) HAVING set. Quantity sums in DECIMAL (a double
    # sum's accumulation order diverges across engines at the HAVING
    # boundary).
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%gear%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(CAST(l.l_quantity AS DECIMAL(12,2))) > 50
      )
    ORDER BY s.s_name
    """,
)
def tpch_q20_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the qualifying (supplier, part, qty) aggregate
    is computed once over the date+name-pruned fact slice, reduced to a
    distinct supplier set, and semi-joined into the (tiny, broadcast)
    nation-filtered supplier dim — the fact table never joins the dim
    directly."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    bulk = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_q"))
        .where(F.col("_q") > 50)
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(bulk, "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_supplier",
    # Q21 shape (testdata has no commit/receipt dates, so "late" is
    # shipdate > orderdate + 60 days): for finalized orders with >= 2
    # suppliers, count per supplier the orders where THEY were the only
    # late one. The two correlated EXISTS become window counts over the
    # per-(order, supplier) lateness aggregate — one pass, no
    # self-joins.
    oracle="""
    WITH ol AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    w AS (
      SELECT l_suppkey, is_late,
             count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             sum(is_late) OVER (PARTITION BY l_orderkey) AS n_late
      FROM ol
    )
    SELECT s.s_name, count(*) AS numwait
    FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
    WHERE w.is_late = 1 AND w.n_supp >= 2 AND w.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    orders. EXISTS/NOT EXISTS decorrelate into two window counts over
    one per-(order, supplier) aggregate: the fact joins orders once,
    aggregates once, windows once — three exchanges total and zero
    self-joins of lineitem (the textbook plan re-scans it twice)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        1,
    ).otherwise(0)
    ol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    w = W.partitionBy("l_orderkey")
    flagged = ol.select(
        "l_suppkey",
        "is_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("is_late").over(w).alias("n_late"),
    )
    return (
        flagged.where(
            (F.col("is_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), flagged.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "tpch_q17_small_qty_revenue",
    # Q17 shape (testdata part has no p_container; the brand predicate
    # alone selects the part family). The correlated 0.2*avg(quantity)
    # threshold is division-free: qty < sum/(5*cnt) <=> qty*5*cnt < sum
    # (positive operands), so both engines compare exact DECIMALs and
    # the only float is the final avg_yearly division.
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS sq,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                    ) AS BIGINT) AS total_cents,
           count(*) AS n_lines,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                         ) AS BIGINT) // 7 AS BIGINT) AS avg_yearly_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * pq.cnt < pq.sq
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    part family. The correlated per-part average becomes ONE grouped
    aggregate on l_partkey joined back to the scan (shared shuffle
    key); the part-family filter broadcasts. Division-free threshold
    compare keeps everything exact DECIMAL until the final integer
    div."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    pq = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("sq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    fam = part.where(F.col("p_brand") == "Brand#23").select("p_partkey")
    total = F.sum(dec("l_extendedprice") * 100).cast("long")
    return (
        li.join(F.broadcast(fam), li["l_partkey"] == fam["p_partkey"])
        .join(pq, "l_partkey")
        .where(dec("l_quantity") * 5 * F.col("cnt") < F.col("sq"))
        .agg(
            total.alias("total_cents"),
            F.count(F.lit(1)).alias("n_lines"),
            total.cast("long").alias("_t"),
        )
        .select(
            "total_cents",
            "n_lines",
            F.expr("_t div 7").cast("long").alias("avg_yearly_cents"),
        )
    )


@register(
    "tpch_q22_global_sales_opportunity",
    # Q22 shape (testdata customer has no c_phone; country grouping is
    # the nation name). Above-average-positive-balance compare is
    # division-free: bal > total/n <=> bal*n > total. NOT EXISTS
    # (orders) is a left_anti join.
    oracle="""
    WITH posavg AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS total,
             count(*) AS n
      FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0
    )
    SELECT n.n_name AS cntrycode,
           count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100) AS BIGINT)
             AS totacctbal_cents
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN posavg
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * posavg.n > posavg.total
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    ORDER BY cntrycode
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no RECENT orders (the
    reference query's "no orders in 7 years" window, cut at
    2000-01-01 for this data's 1995-2001 span), by country.
    The global positive-balance average is a 1-row broadcast cross
    join (division-free compare), NOT EXISTS is a broadcast-able
    left_anti on o_custkey, nation dim broadcasts — the customer scan
    shuffles once, for the final country aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    posavg = cust.where(dec("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("total"), F.count(F.lit(1)).alias("n")
    )
    return (
        cust.crossJoin(F.broadcast(posavg))
        .where(dec("c_acctbal") * F.col("n") > F.col("total"))
        .join(
            orders.where(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ).select("o_custkey"),
            cust["c_custkey"] == orders["o_custkey"],
            "left_anti",
        )
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal") * 100).cast("long").alias(
                "totacctbal_cents"
            ),
        )
        .orderBy("cntrycode")
    )


@register(
    "text_unigram_nll",
    # Fixed-point discipline: ln(count) is quantized per TERM
    # (floor(ln(c)*1e9) — identical per-row doubles on both engines),
    # the per-document accumulation is exact BIGINT, and the final
    # (n*lnN_q - Σq)/1e9/n is two IEEE ops on identical operands. A
    # plain float Σ ln p would diverge at the ulp with row order.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    vocab AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_corpus FROM vocab),
    q AS (
      SELECT term,
             CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000) AS BIGINT) AS qv
      FROM vocab
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           (CAST(count(*) * (SELECT CAST(floor(ln(CAST(n_corpus AS DOUBLE))
                                              * 1000000000) AS BIGINT) FROM tot)
                 - CAST(sum(q.qv) AS BIGINT) AS DOUBLE) / 1000000000.0)
             / CAST(count(*) AS DOUBLE) AS mean_nll
    FROM toks t JOIN q USING (term)
    GROUP BY t.doc_id
    """,
)
def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM quality score: per-document mean negative
    log-likelihood under the corpus's own unigram distribution — the
    perplexity-filter signal of large-corpus pipelines, here with the
    corpus itself as the LM (no external model file)."""
    from alerta_spark.ops.text import unigram_nll

    return unigram_nll(load_table(spark, sf_dir, "documents"))


@register(
    "text_token_entropy",
    # Same fixed-point trick as text_unigram_nll — the per-doc
    # Σ c·ln(c) accumulates as exact BIGINTs.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    counts AS (
      SELECT doc_id, term, count(*) AS c FROM toks GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           -- every ln quantized (libm vs JVM log differ by 1 ulp on
           -- some inputs); numerator assembled in exact BIGINTs
           CAST(CAST(sum(c) AS BIGINT)
                  * CAST(floor(ln(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE))
                               * 1000000000) AS BIGINT)
                - CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000)
                                    AS BIGINT)) AS BIGINT) AS DOUBLE)
             / 1000000000.0
             / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS entropy
    FROM counts GROUP BY doc_id
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the document's own token
    distribution: near-zero = degenerate repetition, high = lexical
    diversity. Companion signal to the Gopher repetition fractions."""
    from alerta_spark.ops.text import token_entropy

    return token_entropy(load_table(spark, sf_dir, "documents"))


@register(
    "a2_threshold_fused_rules",
    oracle="""
    SELECT 'big_purchases' AS alert_name,
           CAST(user_id AS VARCHAR) AS value, count(*) AS count
    FROM events
    WHERE event_type = 'purchase'
      AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
      AND user_id IS NOT NULL
    GROUP BY user_id HAVING count(*) >= 2
    UNION ALL
    SELECT 'errors_by_user', CAST(user_id AS VARCHAR), count(*)
    FROM events
    WHERE event_type = 'error' AND user_id IS NOT NULL
    GROUP BY user_id HAVING count(*) >= 3
    """,
)
def a2_threshold_fused_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule fusion: N threshold rules in ONE corpus scan + ONE exchange
    (the reference's main loop re-scans per rule — N scans at 100 TB).
    Plan-guarded in tests; per-rule equivalence pytest-pinned."""
    from alerta_spark.operators.threshold import threshold_alerts_fused

    ev = load_table(spark, sf_dir, "events")
    rules = [
        {
            "alert_name": "big_purchases",
            "criteria": "event_type='purchase' AND CAST(json_extract_scalar(props,'$.k') AS INTEGER) > 50",
            "aggregation_key": "user_id",
            "threshold": 2,
        },
        {
            "alert_name": "errors_by_user",
            "criteria": "event_type='error'",
            "aggregation_key": "user_id",
            "threshold": 3,
        },
    ]
    return threshold_alerts_fused(ev, rules).select(
        "alert_name", "value", "count"
    )


_SIMHASH_BITS = 60
_SIMHASH_BSUMS = ",\n             ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
    for i in range(_SIMHASH_BITS)
)
_SIMHASH_SIG = "\n             + ".join(
    f"(CASE WHEN b{i} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END << {i})"
    for i in range(_SIMHASH_BITS)
)


@register(
    "dedup_simhash_portable",
    # The md5-portable simhash variant vs the ALL-PAIRS ground truth:
    # pigeonhole banding has perfect recall at max_hamming=3 over 4
    # chunks, so the blocked Spark result must EQUAL the exhaustive
    # oracle — making the whole simhash pipeline hash-checkable (the
    # xxhash64 production entry stays rows-only: its hash primitive
    # has no DuckDB twin).
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_DUCK_NORM}, ' ')) AS t
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) AS h
      FROM toks
    ),
    bsums AS (
      SELECT doc_id,
             {_SIMHASH_BSUMS}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (
      SELECT doc_id,
             {_SIMHASH_SIG} AS s
      FROM bsums
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    """,
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups (hamming <= 3) with the engine-portable
    60-bit md5 token hash: identical algorithm to dedup_simhash, but
    every step has a DuckDB twin, so the pigeonhole-banded result is
    hash-checked against exhaustive all-pairs ground truth."""
    from alerta_spark.ops.dedupe import simhash_near_dups

    return simhash_near_dups(
        load_table(spark, sf_dir, "documents"),
        max_hamming=3,
        hash_fn="md5",
        n_bits=60,
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "dedup_winnow_fingerprints",
    # Winnowing (MOSS): min hash per sliding window of w=4 consecutive
    # k=8-gram hashes. Hash = first 15 md5 hex chars as a 60-bit
    # BIGINT (engine-identical); minima compare (h, pos) structs so
    # equal-content ties break on the leftmost position everywhere.
    oracle=r"""
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, length(t) AS L, t,
             unnest(generate_series(1, greatest(length(t) - 7, 0))) AS p
      FROM n
    ),
    hashed AS (
      SELECT doc_id, L, p,
             CAST('0x' || substring(md5(substring(t, p, 8)), 1, 15) AS BIGINT)
               AS h
      FROM pos
    ),
    sel AS (
      SELECT doc_id, L, p,
             min({'h': h, 'p': p}) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
      FROM hashed
    )
    SELECT DISTINCT doc_id, CAST(m.p AS BIGINT) AS pos, CAST(m.h AS BIGINT) AS fp
    FROM sel WHERE p <= L - 7 - 3
    """,
)
def dedup_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint index over the corpus (k=8, w=4): every
    match of length >= 11 chars shares a fingerprint while storing
    ~2/(w+1) of the k-gram hashes — the plagiarism-detection-grade
    near-dup index, one doc-keyed exchange."""
    from alerta_spark.ops.dedupe import winnow_fingerprints

    return winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), k=8, w=4
    ).select("doc_id", "pos", "fp")


@register(
    "dedup_winnow_pairs",
    # Jaccard over winnowed fingerprint SETS; the oracle replays the
    # winnow selection (same CTE as dedup_winnow_fingerprints) and the
    # pair join exactly, including the COMPOSED hot-print cap
    # min(floor(2% of docs), 200): the fraction governs small corpora,
    # the absolute bound keeps candidate fan-in O(n*cap) at scale
    # (measured: frac-only admits 690M candidates at 10x vs 17M;
    # identical floor boundary on both engines).
    oracle=r"""
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, length(t) AS L, t,
             unnest(generate_series(1, greatest(length(t) - 7, 0))) AS p
      FROM n
    ),
    hashed AS (
      SELECT doc_id, L, p,
             CAST('0x' || substring(md5(substring(t, p, 8)), 1, 15) AS BIGINT)
               AS h
      FROM pos
    ),
    sel AS (
      SELECT doc_id, L, p,
             min({'h': h, 'p': p}) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
      FROM hashed
    ),
    fps AS (
      SELECT DISTINCT doc_id, m.h AS fp FROM sel WHERE p <= L - 7 - 3
    ),
    capped AS (
      SELECT * FROM fps
      WHERE fp NOT IN (
        SELECT fp FROM fps GROUP BY fp
        HAVING count(*) > least(floor(
          CAST(0.02 AS DOUBLE)
          * (SELECT count(DISTINCT doc_id) FROM documents)
        ), 200)
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM capped a JOIN capped b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS fp_jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
    """,
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by Jaccard over winnowing fingerprint sets —
    character-level partial-overlap detection (shared passages) that
    word-shingle Jaccard dilutes. Same inverted-index + hot-cap
    discipline as the shingle path."""
    from alerta_spark.ops.dedupe import winnow_near_dup_pairs

    return winnow_near_dup_pairs(
        load_table(spark, sf_dir, "documents"),
        k=8,
        w=4,
        threshold=0.5,
        max_fp_frac=0.02,
        max_fp_freq=200,
    )


@register(
    "text_tfidf_top_terms",
    # Ranking key c*idf_q is an exact BIGINT (idf's ln quantized — the
    # JVM-vs-libm 1-ulp hazard), so the per-doc top-5 cut is identical
    # across engines; ties break on the term string.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    counts AS (
      SELECT doc_id, term, count(*) AS c FROM toks GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS dfr FROM counts GROUP BY term),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM counts),
    dlen AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY doc_id
    ),
    scored AS (
      SELECT c.doc_id, c.term, l.n,
             c.c * CAST(floor(ln(CAST(n_docs AS DOUBLE) / CAST(d.dfr AS DOUBLE))
                              * 1000000000) AS BIGINT) AS score_q
      FROM counts c
      JOIN dfreq d USING (term)
      CROSS JOIN nd
      JOIN dlen l USING (doc_id)
    ),
    ranked AS (
      SELECT doc_id, term, n, score_q,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_q DESC, term ASC) AS rnk
      FROM scored
    )
    SELECT doc_id, term, CAST(rnk AS BIGINT) AS rank,
           (CAST(score_q AS DOUBLE) / 1000000000.0) / CAST(n AS DOUBLE)
             AS tfidf
    FROM ranked WHERE rnk <= 5
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by tf-idf — keyword
    extraction / retrieval weighting over the corpus's own statistics."""
    from alerta_spark.ops.text import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=5)


@register(
    "corpus_length_buckets",
    # Bucket edges are exact interpolated percentiles (Spark
    # `percentile` == DuckDB `quantile_cont`, proven bit-identical by
    # agg_exact_percentiles); assignment is a map-only comparison
    # against the broadcast edges — never a global ntile window.
    oracle=f"""
    WITH lens AS (
      SELECT doc_id, len({{toks}}) AS l FROM documents
    ),
    e AS (
      SELECT quantile_cont(l, [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])
               AS edges
      FROM lens
    ),
    b AS (
      SELECT l,
             1 {{cases}} AS bucket
      FROM lens, e
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(min(l) AS BIGINT) AS min_len,
           CAST(max(l) AS BIGINT) AS max_len,
           CAST(sum(l) AS BIGINT) AS sum_tokens,
           1.0 - CAST(CAST(sum(l) AS BIGINT) AS DOUBLE)
                 / CAST(count(*) * CAST(max(l) AS BIGINT) AS DOUBLE)
             AS pad_waste
    FROM b GROUP BY bucket ORDER BY bucket
    """.replace("{toks}", _DUCK_TOKS).replace(
        "{cases}",
        " ".join(
            f"+ (CASE WHEN CAST(l AS DOUBLE) > edges[{i}] THEN 1 ELSE 0 END)"
            for i in range(1, 8)
        ),
    ),
)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing for batch formation: 8 quantile
    buckets over token length + the padding waste of batching each
    bucket to its max — the pad-efficiency report that decides
    bucketed-batching parameters for training."""
    from alerta_spark.ops.chunking import length_buckets

    return length_buckets(load_table(spark, sf_dir, "documents"), n_buckets=8)


@register(
    "corpus_shuffled_order",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || 'epoch0') AS hh
      FROM documents
    )
    SELECT doc_id,
           CAST(CAST('0x' || substring(hh, 1, 8) AS BIGINT) % 8 AS BIGINT)
             AS shard,
           CAST(row_number() OVER (
             PARTITION BY CAST('0x' || substring(hh, 1, 8) AS BIGINT) % 8
             ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
    FROM h
    """,
)
def corpus_shuffled_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: md5-keyed (shard, pos) addresses —
    the training-order permutation that is retry/engine-stable and
    re-rolls with a new salt per epoch. Map-only shard assignment +
    one shard-partitioned window (no global sort)."""
    from alerta_spark.ops.sampling import shuffled_order

    docs = load_table(spark, sf_dir, "documents")
    return shuffled_order(docs, shards=8, salt="epoch0")


@register("bpe_learn_merges", oracle=None)  # iterative algorithm: rows-only
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training over the corpus (10 merges): ONE corpus
    word-frequency aggregate, then vocab-table-only rounds — pair
    counts are freq-weighted sums, merges are JVM-side array folds.
    Deterministic (ties break on the pair string), so the merge table
    is retrain-stable; exact merges are pinned against a hand-computed
    corpus in tests/test_bpe.py. Driver check is rows-only (the
    iterative loop is not SQL-expressible)."""
    from alerta_spark.ops.bpe import learn_bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(docs, num_merges=10)
    return spark.createDataFrame(
        [(i, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "merge_rank INT, left STRING, right STRING, pair_freq BIGINT",
    )


def _bpe_pinned_oracle(rounds: int) -> str:
    """Unroll ``rounds`` BPE merge rounds as DuckDB CTEs — the
    kmeans/PQ precedent (X98/X107) applied to iterative tokenizer
    training. Each round: freq-weighted adjacent-pair count -> top-1
    (n DESC, a, b) with the min_pair_freq=2 stop folded in as a WHERE
    (an empty top row empties every later round, mirroring the
    learner's early stop) -> greedy left-to-right rewrite. The greedy
    fold is expressed relationally: overlapping matches only occur in
    runs of identical symbols, so gaps-and-islands (grp = i - rn) +
    odd parity rank picks exactly the merges the sequential algorithm
    takes; position i+1 of a selected merge is dropped via an
    anti-join on (word, i-1)."""
    sql = ["""WITH words AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(list_filter(
          string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''
        )) AS word
        FROM documents
      ) GROUP BY word
    ), s0 AS MATERIALIZED (
      SELECT word, freq,
             list_append(
               list_transform(generate_series(1, length(word)),
                              i -> substr(word, i, 1)),
               '</w>') AS syms
      FROM words
    )"""]
    for r in range(1, rounds + 1):
        p = f"s{r-1}"
        sql.append(f""", p{r} AS MATERIALIZED (
      SELECT struct_extract(z, 1) AS a, struct_extract(z, 2) AS b,
             sum(freq) AS n FROM (
        SELECT freq,
               unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS z
        FROM {p} WHERE len(syms) >= 2
      ) GROUP BY 1, 2
    ), m{r} AS MATERIALIZED (
      SELECT a, b, n FROM p{r} WHERE n >= 2
      ORDER BY n DESC, a ASC, b ASC LIMIT 1
    ), f{r} AS MATERIALIZED (
      SELECT e.word, e.freq, e.i, e.syms[e.i] AS sym,
             CASE WHEN e.i < len(e.syms)
                       AND e.syms[e.i] = m.a AND e.syms[e.i + 1] = m.b
                  THEN 1 ELSE 0 END AS mt
      FROM (
        SELECT word, freq, syms,
               unnest(generate_series(1, len(syms))) AS i
        FROM {p}
      ) e, m{r} m
    ), g{r} AS MATERIALIZED (
      SELECT word, freq, i, sym, mt,
             CASE WHEN mt = 1 THEN
               row_number() OVER (PARTITION BY word, grp ORDER BY i)
             END AS k
      FROM (
        SELECT *, i - row_number() OVER (PARTITION BY word, mt ORDER BY i)
                 AS grp
        FROM f{r}
      )
    ), sel{r} AS MATERIALIZED (
      SELECT word, i FROM g{r} WHERE mt = 1 AND (k % 2) = 1
    ), s{r} AS MATERIALIZED (
      SELECT word, freq, list(out_sym ORDER BY i) AS syms FROM (
        SELECT f.word, f.freq, f.i,
               CASE WHEN sh.i IS NOT NULL
                    THEN f.sym || (SELECT b FROM m{r})
                    ELSE f.sym END AS out_sym
        FROM f{r} f
        LEFT JOIN sel{r} sh ON f.word = sh.word AND f.i = sh.i
        LEFT JOIN sel{r} sp ON f.word = sp.word AND f.i = sp.i + 1
        WHERE sp.i IS NULL
      ) GROUP BY word, freq
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT {r - 1} AS merge_rank, a AS \"left\", b AS \"right\", "
        f"CAST(n AS BIGINT) AS pair_freq FROM m{r}"
        for r in range(1, rounds + 1)
    )
    sql.append(
        f"\n    SELECT * FROM (\n      {unions}\n    ) ORDER BY merge_rank"
    )
    return "".join(sql)


@register("bpe_learn_merges_pinned", oracle=_bpe_pinned_oracle(8))
def bpe_learn_merges_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X37 hash-checked twin of bpe_learn_merges: 8 pinned merge
    rounds, DuckDB oracle replays the full algorithm via unrolled CTEs
    (see _bpe_pinned_oracle). Proves the distributed trainer — the one
    corpus aggregate, the freq-weighted pair counts, the deterministic
    tie-break, AND the greedy overlapping-run fold — against an
    independent relational replay, not just a pytest pin."""
    from alerta_spark.ops.bpe import learn_bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(docs, num_merges=8)
    return spark.createDataFrame(
        [(i, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "merge_rank INT, left STRING, right STRING, pair_freq BIGINT",
    )


@register(
    "agg_stats_moments",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sxd,
             CAST(sum(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DECIMAL(24,12)) AS sxxd
      FROM events
      GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(sxd AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
           -- variance numerator computed EXACTLY in decimal (widths sized
           -- to stay under both engines' 38-digit cap), then ONE cast to
           -- double, one divide, one sqrt -> bit-identical across engines
           -- DECIMAL(19,6) widening forces DuckDB's INT128 multiply path
           -- (an (18,6)x(18,6) product overflows its int64 fast path).
           -- The VARCHAR hop matters: DuckDB's direct wide-decimal->double
           -- cast double-rounds (int128 -> double, / 1e12 -> double) and
           -- lands 1 ulp off the correctly-rounded value Spark produces;
           -- its string->double parse is correctly rounded.
           sqrt(CAST(CAST(CAST(n AS DECIMAL(10,0)) * sxxd
                     - CAST(sxd AS DECIMAL(19,6)) * CAST(sxd AS DECIMAL(19,6)) AS VARCHAR) AS DOUBLE)
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS stddev_value
    FROM s
    ORDER BY event_type
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-moment statistics per group: mean + sample stddev computed
    from DECIMAL-accumulated Σx and Σx² (built-in stddev_samp streams
    doubles in partition order — nondeterministic at the ulp across
    runs AND engines; the two-moment formulation costs one extra
    column in the same single aggregate and is bit-reproducible).
    The final sqrt/divide runs on identical doubles on both engines."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(18,6)")
    nd = F.col("n").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).cast("decimal(18,6)").alias("sxd"),
            F.sum(x * x).cast("decimal(24,12)").alias("sxxd"),
        )
        .select(
            "event_type",
            "n",
            (F.col("sxd").cast("double") / nd).alias("mean_value"),
            # n*sxx - sx*sx carried exactly in decimal; a single cast to
            # double then divide+sqrt is evaluation-order-proof across
            # engines (the all-double form differs at the ulp).
            F.sqrt(
                (
                    F.col("n").cast("decimal(10,0)") * F.col("sxxd")
                    - F.col("sxd") * F.col("sxd")
                ).cast("double")
                / (nd * (nd - F.lit(1).cast("double")))
            ).alias("stddev_value"),
        )
        .orderBy("event_type")
    )


@register(
    "anomaly_zscore_events",
    # Population stats per event_type via the proven exact-moments
    # pattern (decimal sums, VARCHAR hop around DuckDB's wide-decimal
    # cast), broadcast back over a map-only per-row z-score — the
    # SOC-style outlier sweep in one scan + one tiny aggregate.
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sxd,
             CAST(sum(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DECIMAL(24,12)) AS sxxd
      FROM events GROUP BY event_type
    ),
    stats AS (
      SELECT event_type,
             CAST(sxd AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v,
             sqrt(CAST(CAST(CAST(n AS DECIMAL(10,0)) * sxxd
                   - CAST(sxd AS DECIMAL(19,6)) * CAST(sxd AS DECIMAL(19,6))
                   AS VARCHAR) AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS sd_v
      FROM s
    )
    SELECT e.event_id, e.event_type, CAST(e.value AS DOUBLE) AS value,
           (CAST(e.value AS DOUBLE) - st.mean_v) / st.sd_v AS zscore
    FROM events e JOIN stats st USING (event_type)
    WHERE abs((CAST(e.value AS DOUBLE) - st.mean_v) / st.sd_v) > 3.0
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3): population mean/stddev from
    one exact-moments aggregate (the agg_stats_moments discipline),
    broadcast back over a map-only score — the anomaly sweep a
    security pipeline runs before thresholding, one corpus scan."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(18,6)")
    nd = F.col("n").cast("double")
    stats = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).cast("decimal(18,6)").alias("sxd"),
            F.sum(x * x).cast("decimal(24,12)").alias("sxxd"),
        )
        .select(
            "event_type",
            (F.col("sxd").cast("double") / nd).alias("mean_v"),
            F.sqrt(
                (
                    F.col("n").cast("decimal(10,0)") * F.col("sxxd")
                    - F.col("sxd") * F.col("sxd")
                ).cast("double")
                / (nd * (nd - F.lit(1).cast("double")))
            ).alias("sd_v"),
        )
    )
    z = (F.col("value").cast("double") - F.col("mean_v")) / F.col("sd_v")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            F.col("value").cast("double").alias("value"),
            z.alias("zscore"),
        )
    )


@register(
    "agg_histogram_value_buckets",
    oracle="""
    SELECT GREATEST(LEAST(CAST(floor(value / 25.0) AS INTEGER) + 1, 21), 0)
             AS bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def agg_histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram profiling: fixed-width binning (width_bucket
    semantics over [0, 525) in 21 bins, expressed as explicit floor
    arithmetic so both engines evaluate the identical double
    expression) + per-bin count and DECIMAL-exact sum. One partial-agg
    shuffle of at most n_bins rows per task — the constant-memory
    distribution profile you run before choosing filter thresholds
    at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.greatest(
        F.least(F.floor(F.col("value") / F.lit(25.0)).cast("int") + F.lit(1), F.lit(21)),
        F.lit(0),
    ).alias("bucket")
    return (
        ev.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("bucket")
    )


@register(
    "w_first_last_nth_events",
    # first/last/nth value window surface under an explicit total
    # order and a full-partition frame (last_value under the default
    # frame is the famous footgun — pinned explicit here).
    oracle="""
    SELECT event_id, user_id,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id) OVER w AS last_event,
           nth_value(event_id, 2) OVER w AS second_event,
           epoch_us(ts) - first_value(epoch_us(ts)) OVER w AS since_first_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w_first_last_nth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value under an explicit
    full-partition frame (the default RANGE..CURRENT ROW frame makes
    last_value return the current row — the classic window footgun
    this entry pins shut) plus a time-since-first derivation."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
        F.nth_value("event_id", 2).over(w).alias("second_event"),
        (
            F.unix_micros("ts") - F.first(F.unix_micros("ts")).over(w)
        ).alias("since_first_us"),
    )


@register(
    "agg_bool_conditional_surface",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
             AS n_errors,
           bool_or(event_type = 'purchase') AS ever_purchased,
           bool_and(value < 200) AS always_under_200,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def agg_bool_conditional_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate surface: count_if-style filtered
    count, bool_or / bool_and (any/every), and per-group exact
    distinct — one hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.bool_or(F.col("event_type") == "purchase").alias("ever_purchased"),
        F.bool_and(F.col("value") < 200).alias("always_under_200"),
        F.count_distinct("event_type").alias("n_types"),
    )


@register(
    "corpus_datacard",
    # One wide row of dataset-card facts, every field a formula the
    # catalog already pins elsewhere (token counts, exact dedup, md5
    # split bands, exact percentile): all 1-row side frames broadcast.
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source, lang,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '')) AS n_tok
      FROM (SELECT doc_id, source, lang,
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text
            FROM documents)
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             quantile_cont(n_tok, 0.5) AS p50_tokens
      FROM t
    ),
    dup AS (
      SELECT CAST(count(*) AS BIGINT) AS n_unique FROM (
        SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        FROM documents GROUP BY 1)
    ),
    tr AS (
      SELECT CAST(count(*) AS BIGINT) AS n_train FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
    )
    SELECT n_docs, total_tokens, n_sources, n_langs, p50_tokens,
           CAST(n_docs - n_unique AS BIGINT) AS n_exact_dups,
           CAST(n_docs - n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE)
             AS dup_rate,
           n_train,
           CAST(n_train AS DOUBLE) / CAST(n_docs AS DOUBLE) AS train_share
    FROM base, dup, tr
    """,
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card as ONE query: corpus size, token mass, source/
    language cardinalities, median length, exact-dup rate, and the
    train-split share — each field a formula another catalog entry
    already pins, composed via broadcast 1-row frames. The summary a
    training run stamps into its provenance log."""
    from alerta_spark.ops.dedupe import exact_dedup
    from alerta_spark.ops.sampling import deterministic_sample
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(tokenize("text"), lambda x: x != F.lit("")))
    base = docs.select(n_tok.alias("n_tok"), "source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.percentile("n_tok", F.lit(0.5)).alias("p50_tokens"),
    )
    uniq = exact_dedup(docs).agg(F.count(F.lit(1)).alias("n_unique"))
    train = deterministic_sample(docs, 0.8).agg(
        F.count(F.lit(1)).alias("n_train")
    )
    return (
        base.crossJoin(F.broadcast(uniq))
        .crossJoin(F.broadcast(train))
        .select(
            "n_docs",
            "total_tokens",
            "n_sources",
            "n_langs",
            "p50_tokens",
            (F.col("n_docs") - F.col("n_unique")).alias("n_exact_dups"),
            (
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
            "n_train",
            (F.col("n_train").cast("double") / F.col("n_docs").cast("double")).alias(
                "train_share"
            ),
        )
    )


@register(
    "more_like_this_doc",
    # Composition capstone: the query terms are doc 0's tf-idf top-5
    # (exact-BIGINT ranked, term tie-break — so both engines pick the
    # SAME terms), fed into the BM25 pipeline over the rest of the
    # corpus. Dynamic query terms enter the oracle as IN (SELECT ...).
    oracle="""
    WITH toks0 AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    counts AS (
      SELECT doc_id, term, count(*) AS c FROM toks0 GROUP BY doc_id, term
    ),
    dfreq0 AS (SELECT term, count(*) AS dfr FROM counts GROUP BY term),
    nd0 AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM counts),
    qterms AS (
      SELECT term FROM (
        SELECT c.term,
               row_number() OVER (ORDER BY
                 c.c * CAST(floor(ln(CAST(n_docs AS DOUBLE)
                                     / CAST(d.dfr AS DOUBLE)) * 1000000000)
                            AS BIGINT) DESC, c.term ASC) AS rnk
        FROM counts c JOIN dfreq0 d USING (term) CROSS JOIN nd0
        WHERE c.doc_id = 0
      ) WHERE rnk <= 5
    ),
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id != 0),
    toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM corpus
    ),
    doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS t_corpus FROM doclen),
    qc AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN (SELECT term FROM qterms)
      GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term,
             CAST(floor(ln(CAST(2 * (SELECT n_docs FROM tot)
                                  - 2 * count(*) + 1 AS DOUBLE)
                           / CAST(2 * count(*) + 1 AS DOUBLE))
                        * 1000000) AS BIGINT) AS idf_q
      FROM qc GROUP BY term
    ),
    parts AS (
      SELECT qc.doc_id,
             CAST(floor(
               (CAST(idf_q AS DOUBLE) / 1000000.0)
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + (0.3 + 0.9 * (CAST(dl * (SELECT n_docs FROM tot) AS DOUBLE)
                                  / CAST((SELECT t_corpus FROM tot) AS DOUBLE))))
               * 1000000.0) AS BIGINT) AS pq
      FROM qc JOIN dfreq USING (term) JOIN doclen USING (doc_id)
    )
    SELECT doc_id, count(*) AS n_terms_matched,
           CAST(CAST(sum(pq) AS BIGINT) AS DOUBLE) / 1000000.0 AS bm25
    FROM parts GROUP BY doc_id
    ORDER BY CAST(sum(pq) AS BIGINT) DESC, doc_id ASC
    LIMIT 10
    """,
)
def more_like_this_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this retrieval: document 0's tf-idf top-5 terms
    become the BM25 query over the rest of the corpus — the
    related-documents feature as a composition of two pinned
    operators. The 5-term collect is a bounded driver action (like
    the IVF centroid sample), documented and tiny."""
    from alerta_spark.ops.text import bm25_topk, tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    qterms = [
        r["term"]
        for r in tfidf_top_terms(docs, k=5)
        .where(F.col("doc_id") == 0)
        .orderBy("rank")
        .collect()
    ]
    from alerta_spark.ops.dedupe import release_cached

    release_cached()
    return bm25_topk(docs.where(F.col("doc_id") != 0), qterms, k=10)


@register(
    "gap_percentiles_by_type",
    # Inter-arrival gaps are exact µs integer differences; the
    # percentile is the pinned exact-interpolation pair (Spark
    # `percentile` == DuckDB `quantile_cont`).
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    q AS (
      SELECT event_type,
             quantile_cont(gap_us, [0.5, 0.9, 0.99]) AS qs,
             count(gap_us) AS n_gaps
      FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           unnest([CAST(0.5 AS DOUBLE), 0.9, 0.99]) AS pct,
           unnest(qs) AS gap_us_pct
    FROM q
    """,
)
def gap_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival latency profile: p50/p90/p99 of the gap between
    consecutive events per type — the SLA/heartbeat-tuning numbers
    (e.g. picking a deadman window from data). One type-keyed window
    shared with the percentile aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    ).where(F.col("gap_us").isNotNull())
    pcts = [0.5, 0.9, 0.99]
    pa = F.array(*[F.lit(p) for p in pcts])
    agg = g.groupBy("event_type").agg(
        F.percentile("gap_us", pa).alias("qs"),
        F.count("gap_us").alias("n_gaps"),
    )
    return agg.select(
        "event_type",
        "n_gaps",
        F.posexplode("qs").alias("_i", "gap_us_pct"),
    ).select(
        "event_type",
        "n_gaps",
        F.element_at(pa, F.col("_i") + 1).alias("pct"),
        "gap_us_pct",
    )


@register(
    "dedup_pair_evidence",
    # Explainability for the near-dup report: per qualifying pair, the
    # 3 lexicographically-smallest shared shingles — deterministic
    # evidence columns, assembled from the same capped index.
    oracle=f"""
    WITH s AS (SELECT doc_id, unnest({{SH}}) AS sh FROM documents),
    kept AS (SELECT sh FROM s GROUP BY sh HAVING count(*) <= 1000),
    idx AS (SELECT s.doc_id, s.sh FROM s JOIN kept USING (sh)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM idx GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS i,
             array_to_string(list_sort(list(a.sh))[1:3], ' | ') AS evidence
      FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard,
           evidence
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.id_a
    JOIN sizes sb ON sb.doc_id = inter.id_b
    WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8
    """.replace("{SH}", _DUCK_SHINGLES),
)
def dedup_pair_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs WITH evidence: each >=0.8-Jaccard pair carries
    its 3 smallest shared shingles — the reviewer-facing 'why were
    these merged' column every dedup pipeline audit asks for. Same
    capped inverted index as dedup_ngram_jaccard; the evidence is one
    extra collect+sort inside the existing intersection aggregate."""
    from alerta_spark.ops.dedupe import _persist, _shingle_index

    docs = load_table(spark, sf_dir, "documents")
    idx = _persist(_shingle_index(docs, "text", "doc_id", 5, 1000))
    sizes = idx.groupBy("_id").agg(F.count(F.lit(1)).alias("_size"))
    a, b = idx.alias("a"), idx.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("_i"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list(F.col("a.shingle"))), 1, 3),
                " | ",
            ).alias("evidence"),
        )
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_size").alias("_sa"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_size").alias("_sb"))
    jac = F.col("_i") / (F.col("_sa") + F.col("_sb") - F.col("_i"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(jac >= 0.8)
        .select(
            "id_a",
            "id_b",
            F.round(jac.cast("double"), 6).alias("jaccard"),
            "evidence",
        )
    )


@register(
    "session_bounce_rate_daily",
    # The sessionize islands rolled up to a per-day bounce rate: a
    # session belongs to the day of its first event; bounce = exactly
    # one event. Rates are one int/int division.
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS pus
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts, us,
             CASE WHEN pus IS NULL OR us - pus > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ),
    sess AS (
      SELECT user_id, ts, us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_idx
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_idx,
             CAST(date_trunc('day', min(ts)) AS DATE) AS day,
             count(*) AS n_events
      FROM sess GROUP BY user_id, session_idx
    )
    SELECT day, count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS bounce_rate
    FROM per_session GROUP BY day
    """,
)
def session_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-min-gap sessions with exactly
    one event, attributed to the day the session started — built on
    the SAME single-exchange sessionizer the catalog already pins,
    plus one day-sized rollup."""
    from alerta_spark.ops.sessions import session_stats

    ev = load_table(spark, sf_dir, "events")
    s = session_stats(ev, 30)
    per = s.select(
        F.to_date(F.date_trunc("day", "session_start")).alias("day"),
        "n_events",
    )
    return per.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounces"),
        (
            F.sum((F.col("n_events") == 1).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("bounce_rate"),
    )


@register(
    "audience_overlap_venn",
    oracle="""
    WITH flags AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase'
                  AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 97
                  THEN 1 ELSE 0 END) AS a,
             max(CASE WHEN event_type = 'error'
                  AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 97
                  THEN 1 ELSE 0 END) AS b,
             max(CASE WHEN event_type = 'signup'
                  AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 97
                  THEN 1 ELSE 0 END) AS c
      FROM events GROUP BY user_id
    )
    SELECT CAST(a * 4 + b * 2 + c AS BIGINT) AS cell,
           a = 1 AS in_purchase, b = 1 AS in_error, c = 1 AS in_signup,
           count(*) AS n_users
    FROM flags GROUP BY a, b, c
    """,
)
def audience_overlap_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-overlap (Venn) analysis: every user folded to three
    membership bits (purchaser / errorer / signup) in ONE user-keyed
    aggregate, then the 8 intersection cells counted — the audience-
    overlap question answered without N² pairwise intersect scans."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    seg = lambda t: F.max(  # noqa: E731
        ((F.col("event_type") == t) & (k > 97)).cast("int")
    )
    flags = ev.groupBy("user_id").agg(
        seg("purchase").alias("a"), seg("error").alias("b"), seg("signup").alias("c")
    )
    return flags.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(
        (F.col("a") * 4 + F.col("b") * 2 + F.col("c")).cast("long").alias("cell"),
        (F.col("a") == 1).alias("in_purchase"),
        (F.col("b") == 1).alias("in_error"),
        (F.col("c") == 1).alias("in_signup"),
        "n_users",
    )


@register(
    "multimodal_ahash_signature",
    # The full 64-bit perceptual hash per document, hash-checked: the
    # oracle rebuilds every cell sum/count with the SAME integer cell
    # index ((i-1)*64)//n and the same exact cross-multiplied
    # threshold; bit 63 enters as the two's-complement sign weight.
    oracle="""
    WITH sig AS (
      SELECT doc_id, length(text) AS n,
             [ascii(text[i]) for i in range(1, length(text) + 1)] AS o
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN n = 0 THEN 0 ELSE CAST(list_sum([
        CASE WHEN
          COALESCE(list_sum([o[i] for i in range(1, n + 1)
                             if ((i - 1) * 64) // n = j]), 0) * n
          > list_sum(o) * len([i for i in range(1, n + 1)
                               if ((i - 1) * 64) // n = j])
        THEN CASE WHEN j = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                  ELSE CAST(power(2, j) AS BIGINT) END
        ELSE 0 END
        for j in range(0, 64)
      ]) AS BIGINT) END AS ahash
    FROM sig
    """,
)
def multimodal_ahash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash of every document's media bytes (fake
    decoder = the text's char stream): 64 mean-threshold bits built in
    ONE fold with exact integer comparisons — the image near-dup key,
    map-only and engine-exact end to end."""
    from alerta_spark.ops.multimodal import ahash64, attach_fake_media

    docs = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        ahash64(F.col("media")["data"].cast("string")).alias("ahash"),
    )


@register(
    "attribution_click_purchase",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, click_id, click_ts, purchase_id, purchase_ts,
           epoch_us(purchase_ts) - epoch_us(click_ts) AS delay_us
    FROM c JOIN p ON c.user_id = p.user_id
      AND purchase_ts >= click_ts
      AND purchase_ts < click_ts + INTERVAL 1 HOUR
    """,
)
def attribution_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution (1-hour window): the batch face of
    the stream-stream interval join in streaming/attribution.py — the
    time-range predicate that bounds streaming join state is the same
    expression that makes this a range join in batch."""
    from alerta_spark.streaming.attribution import attribute_purchases

    ev = load_table(spark, sf_dir, "events")
    return attribute_purchases(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )


@register(
    "cdc_merge_snapshot",
    # MERGE INTO semantics (insert/update/delete) as a full outer
    # join + case — the lakehouse upsert without a table format. The
    # change batch is derived deterministically from the base table so
    # the gate is self-contained.
    oracle="""
    WITH changes AS (
      SELECT doc_id, 'U' AS op, upper(text) AS new_text
      FROM documents WHERE doc_id < 10
      UNION ALL
      SELECT doc_id, 'D', NULL FROM documents
      WHERE doc_id >= 10 AND doc_id < 20
      UNION ALL
      SELECT doc_id + 10000, 'I', 'inserted doc ' || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id < 5
    )
    SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
           CASE WHEN c.op = 'U' THEN c.new_text
                WHEN c.op = 'I' THEN c.new_text
                ELSE b.text END AS text,
           CASE WHEN c.op IS NULL THEN 'kept'
                WHEN c.op = 'U' THEN 'updated'
                ELSE 'inserted' END AS merge_action
    FROM documents b FULL OUTER JOIN changes c USING (doc_id)
    WHERE c.op IS DISTINCT FROM 'D'
    """,
)
def cdc_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert + delete) emulated on plain parquet: one
    full outer join on the key, matched-update / matched-delete /
    not-matched-insert resolved by a case — the CDC apply step. At
    scale, bucket both sides by the key (sources/bucketed) so the
    merge join is co-located and shuffle-free."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = load_table(spark, sf_dir, "documents")
    changes = (
        d.where(F.col("doc_id") < 10)
        .select("doc_id", F.lit("U").alias("op"), F.upper("text").alias("new_text"))
        .unionByName(
            d.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
                "doc_id", F.lit("D").alias("op"), F.lit(None).cast("string").alias("new_text")
            )
        )
        .unionByName(
            d.where(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 10000).alias("doc_id"),
                F.lit("I").alias("op"),
                F.concat(F.lit("inserted doc "), F.col("doc_id").cast("string")).alias("new_text"),
            )
        )
    )
    merged = base.join(changes, "doc_id", "full_outer")
    return merged.where(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        "doc_id",
        F.when(F.col("op").isin("U", "I"), F.col("new_text"))
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(F.col("op").isNull(), "kept")
        .when(F.col("op") == "U", "updated")
        .otherwise("inserted")
        .alias("merge_action"),
    )


@register(
    "skyline_value_recency",
    # The oracle is the DEFINITIONAL quadratic NOT EXISTS; the Spark
    # side is the efficient 2D-skyline plan (sort + running max under
    # one window) — the hash gate proves the optimization correct.
    oracle="""
    SELECT e.event_id, e.event_type,
           CAST(e.value AS DOUBLE) AS value, epoch_us(e.ts) AS t_us
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM events o
      WHERE o.event_type = e.event_type
        AND o.value >= e.value AND epoch_us(o.ts) >= epoch_us(e.ts)
        AND (o.value > e.value OR epoch_us(o.ts) > epoch_us(e.ts))
    )
    """,
)
def skyline_value_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier per event type over (value, recency): the rows
    no other row beats on both dimensions — the multi-criteria 'best
    offers' query. The 2D skyline needs NO quadratic self-join:
    aggregate to distinct (type, value) -> max ts, sort values DESC,
    and keep values whose max-ts strictly exceeds the running max over
    all strictly-higher values (a ROWS frame over the DISTINCT value
    frame, so value ties never leak in); rows then rejoin and survive
    only at their value's max ts. One aggregate + one value-count-
    sized window + a broadcast-back join."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.unix_micros("ts").alias("t_us"),
    )
    g = ev.groupBy("event_type", "value").agg(F.max("t_us").alias("_vmax"))
    w = (
        W.partitionBy("event_type")
        .orderBy(F.desc("value"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sky_vals = (
        g.withColumn("_bh", F.max("_vmax").over(w))
        .where(F.col("_bh").isNull() | (F.col("_vmax") > F.col("_bh")))
        .select("event_type", "value", "_vmax")
    )
    return (
        ev.join(F.broadcast(sky_vals), ["event_type", "value"])
        .where(F.col("t_us") == F.col("_vmax"))
        .select("event_id", "event_type", "value", "t_us")
    )


@register(
    "anomaly_robust_mad",
    # Robust (median/MAD) outliers: both medians are exact
    # interpolated percentiles (Spark `percentile` == DuckDB
    # `quantile_cont`, the agg_exact_percentiles pin); the modified
    # z-score is a fixed double chain on identical operands.
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med_v
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             any_value(m.med_v) AS med_v,
             quantile_cont(abs(CAST(e.value AS DOUBLE) - m.med_v), 0.5) AS mad_v
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, CAST(e.value AS DOUBLE) AS value,
           0.6745 * (CAST(e.value AS DOUBLE) - s.med_v) / s.mad_v AS robust_z
    FROM events e JOIN mad s USING (event_type)
    WHERE abs(0.6745 * (CAST(e.value AS DOUBLE) - s.med_v) / s.mad_v) > 3.5
    """,
)
def anomaly_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier sweep: modified z-score via median/MAD
    (|0.6745·(x-med)/MAD| > 3.5) — immune to the outliers that
    inflate stddev and mask each other in the plain z-score sweep
    (anomaly_zscore_events). Two grouped exact-percentile aggregates
    broadcast back over a map-only score."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med_v")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med_v").alias("med_v"),
            F.percentile(
                F.abs(F.col("value").cast("double") - F.col("med_v")),
                F.lit(0.5),
            ).alias("mad_v"),
        )
    )
    z = (
        F.lit(0.6745)
        * (F.col("value").cast("double") - F.col("med_v"))
        / F.col("mad_v")
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .where(F.abs(z) > 3.5)
        .select(
            "event_id",
            "event_type",
            F.col("value").cast("double").alias("value"),
            z.alias("robust_z"),
        )
    )


@register(
    "text_pmi_term_pairs",
    # PMI = ln(n_both * N / (n_a * n_b)) — a ratio of exact BIGINTs
    # quantized once per pair; the top-20 cut ranks on the quantized
    # BIGINT with a pair tie-break.
    oracle="""
    WITH dt AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  t -> t <> '')) AS term
        FROM documents
      )
    ),
    ndocs AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
    df AS (SELECT term, count(*) AS d FROM dt GROUP BY term HAVING count(*) >= 5),
    kept AS (SELECT dt.doc_id, dt.term FROM dt JOIN df USING (term)),
    pairs AS (
      SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_both
      FROM kept a JOIN kept b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    scored AS (
      SELECT term_a, term_b, n_both, da.d AS n_a, db.d AS n_b,
             CAST(floor(ln(CAST(n_both * (SELECT n FROM ndocs) AS DOUBLE)
                           / CAST(da.d * db.d AS DOUBLE)) * 1000000000)
                  AS BIGINT) AS pmi_q
      FROM pairs
      JOIN df da ON da.term = pairs.term_a
      JOIN df db ON db.term = pairs.term_b
    )
    SELECT term_a, term_b, n_both, n_a, n_b,
           CAST(pmi_q AS DOUBLE) / 1000000000.0 AS pmi
    FROM scored
    ORDER BY pmi_q DESC, term_a ASC, term_b ASC
    LIMIT 20
    """,
)
def text_pmi_term_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 term pairs by pointwise mutual
    information over document co-occurrence (min support 5 on both
    terms and the pair). The support filter applies BEFORE the per-doc
    pair fan-out — the quadratic blow-up guard; at web scale also cap
    per-doc distinct terms."""
    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("term"),
        )
        .distinct()
    )
    ndocs = dt.select("doc_id").distinct().count()
    dfreq = (
        dt.groupBy("term")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") >= 5)
    )
    kept = dt.join(F.broadcast(dfreq.select("term")), "term")
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= 5)
    )
    da = F.broadcast(
        dfreq.select(F.col("term").alias("term_a"), F.col("d").alias("n_a"))
    )
    db = F.broadcast(
        dfreq.select(F.col("term").alias("term_b"), F.col("d").alias("n_b"))
    )
    pmi_q = F.floor(
        F.log(
            (F.col("n_both") * F.lit(ndocs)).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        )
        * F.lit(1e9)
    ).cast("long")
    return (
        pairs.join(da, "term_a")
        .join(db, "term_b")
        .withColumn("_pq", pmi_q)
        .orderBy(F.desc("_pq"), F.asc("term_a"), F.asc("term_b"))
        .limit(20)
        .select(
            "term_a",
            "term_b",
            "n_both",
            "n_a",
            "n_b",
            (F.col("_pq").cast("double") / F.lit(1e9)).alias("pmi"),
        )
    )


@register(
    "dedup_prefix_jaccard",
    # Same result contract as the uncapped inverted-index formulation;
    # the oracle is the plain exact all-shared-token computation — the
    # prefix filter must be output-invisible (a pure candidate-
    # generation optimization).
    oracle=f"""
    WITH s AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS sh FROM documents),
    sizes AS (SELECT doc_id, count(*) AS sz FROM s GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b, i::DOUBLE / (sa.sz + sb.sz - i) AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
    )
    SELECT id_a, id_b, round(j, 6) AS jaccard
    FROM pairs WHERE j >= 0.8
    """,
)
def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered Jaccard pairs (t=0.8): only each
    document's rare-first prefix is indexed — the index and its df²
    join cost shrink ~(1-t)x/quadratically vs the full inverted index,
    with exact verification on candidates. The hash gate proves the
    prefix filter is output-invisible."""
    from alerta_spark.ops.dedupe import prefix_jaccard_pairs

    return prefix_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "scd2_user_state_intervals",
    # Gaps-and-islands by VALUE CHANGE (the SCD2 build): island id =
    # running count of change points; interval bounds are exact µs.
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS t,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    marked AS (
      SELECT user_id, event_type, t,
             CAST(sum(CASE WHEN prev_type IS NULL
                             OR prev_type <> event_type THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
      FROM o
    )
    SELECT user_id, CAST(island AS BIGINT) AS version,
           any_value(event_type) AS state,
           min(t) AS valid_from_us, max(t) AS last_seen_us,
           count(*) AS n_events
    FROM marked
    GROUP BY user_id, island
    """,
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: collapse each user's event stream into
    versioned state intervals (a new version whenever the event_type
    changes) — the slowly-changing-dimension construction every
    warehouse needs. One user-keyed exchange shared by the lag window,
    the island running count, and the interval aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("t"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    wi = (
        W.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    marked = o.select(
        "user_id",
        "event_type",
        "t",
        F.sum(
            F.when(
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type")),
                1,
            ).otherwise(0)
        )
        .over(wi)
        .cast("long")
        .alias("island"),
    )
    return marked.groupBy("user_id", F.col("island").alias("version")).agg(
        F.any_value("event_type").alias("state"),
        F.min("t").alias("valid_from_us"),
        F.max("t").alias("last_seen_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "embedding_knn_label",
    # Neighbor cut = the proven cosine_topk ranking (round 6dp, id
    # tie-break); vote argmax = (count DESC, label ASC) window.
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id IN (0,1,2,3,4)),
    scored AS (
      SELECT q.query_id, a.vec_id AS neighbor_id, a.label,
             round(list_dot_product(a.v, q.v) /
                   (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(q.v, q.v))), 6) AS cos
      FROM e a, q WHERE a.vec_id != q.query_id
    ),
    nn AS (
      SELECT query_id, label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= 10
    ),
    votes AS (
      SELECT query_id, label, count(*) AS votes
      FROM nn GROUP BY query_id, label
    )
    SELECT query_id, CAST(label AS BIGINT) AS pred_label, votes FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, label ASC) AS rn
      FROM votes
    ) WHERE rn = 1
    """,
)
def embedding_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the embedding corpus: majority label
    of the exact cosine top-10 for 5 query vectors — the second
    DataFrame-native ML loop (with text_naive_bayes_source), built on
    the broadcast-queries/one-corpus-scan cosine_topk plan."""
    from alerta_spark.ops.similarity import knn_label

    return knn_label(
        load_table(spark, sf_dir, "embeddings"), _TOPK_QUERY_IDS, k=10
    )


@register("text_langid_confusion", oracle=None)  # oracle set below
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a query: confusion matrix of the
    heuristic language ID against the table's ground-truth ``lang``
    labels, plus each cell's share of its true-label row count (one
    int/int division) — the accuracy report you run before trusting a
    filter built on lang_pred."""
    from alerta_spark.ops.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    pred = language_id(docs).select("doc_id", "lang_pred")
    joined = docs.select("doc_id", "lang").join(pred, "doc_id")
    cell = joined.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = joined.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    return cell.join(F.broadcast(tot), "lang").select(
        "lang",
        "lang_pred",
        "n",
        (F.col("n").cast("double") / F.col("n_true").cast("double")).alias(
            "share_of_true"
        ),
    )


def _langid_confusion_oracle() -> str:
    return f"""
    WITH pred AS ({_lang_oracle()}),
    joined AS (
      SELECT d.lang, p.lang_pred FROM documents d JOIN pred p USING (doc_id)
    ),
    cell AS (SELECT lang, lang_pred, count(*) AS n FROM joined GROUP BY 1, 2),
    tot AS (SELECT lang, count(*) AS n_true FROM joined GROUP BY lang)
    SELECT cell.lang, lang_pred, n,
           CAST(n AS DOUBLE) / CAST(n_true AS DOUBLE) AS share_of_true
    FROM cell JOIN tot USING (lang)
    """


QUERIES["text_langid_confusion"]["oracle"] = _langid_confusion_oracle()


@register(
    "corpus_boilerplate_shingles",
    # Observability face of the hot-shingle cap: the exact shingles the
    # dedup index drops (df > cap), ranked by document frequency.
    oracle=f"""
    WITH s AS (SELECT doc_id, unnest({{SH}}) AS sh FROM documents),
    freq AS (SELECT sh, count(*) AS doc_freq FROM s GROUP BY sh)
    SELECT sh AS shingle, doc_freq
    FROM freq WHERE doc_freq > 1
    ORDER BY doc_freq DESC, sh ASC
    LIMIT 25
    """.replace("{SH}", _DUCK_SHINGLES),
)
def corpus_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate discovery: the highest-document-frequency 5-gram
    shingles (df > 1 at this synthetic sf; raise with corpus scale) —
    exactly the rows the skew cap in
    dedup_ngram_jaccard would drop, surfaced as a report so the cap
    threshold is chosen from data, not guessed. One partial-agg
    shuffle + TakeOrdered."""
    from alerta_spark.ops.dedupe import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    return (
        shingle_rows(docs, "text", "doc_id", 5)
        .groupBy(F.col("shingle"))
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .where(F.col("doc_freq") > 1)
        .orderBy(F.desc("doc_freq"), F.asc("shingle"))
        .limit(25)
    )


@register(
    "text_naive_bayes_source",
    # Full NB train+predict as SQL: every probability a ratio of exact
    # BIGINTs, lnq quantized on the (class x term) table, per-doc sums
    # exact, argmax via window with (score DESC, label ASC).
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    priors AS (SELECT source AS cls, count(*) AS docs FROM documents GROUP BY source),
    ndocs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    labeled AS (
      SELECT t.doc_id, d.source AS cls, t.term
      FROM toks t JOIN documents d USING (doc_id)
    ),
    ct AS (SELECT cls, term, count(*) AS ctc FROM labeled GROUP BY cls, term),
    vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM ct),
    ctot AS (SELECT cls, CAST(sum(ctc) AS BIGINT) AS tc FROM ct GROUP BY cls),
    terms AS (SELECT DISTINCT term FROM ct),
    lik AS (
      SELECT p.cls, t.term,
             CAST(floor(ln(
               CAST(COALESCE(ct.ctc, 0) + 1 AS DOUBLE)
               / CAST(ctot.tc + (SELECT v FROM vocab) AS DOUBLE))
               * 1000000) AS BIGINT) AS lq
      FROM terms t CROSS JOIN priors p
      JOIN ctot ON ctot.cls = p.cls
      LEFT JOIN ct ON ct.cls = p.cls AND ct.term = t.term
    ),
    pq AS (
      SELECT cls, CAST(floor(ln(CAST(docs AS DOUBLE)
                 / CAST((SELECT n FROM ndocs) AS DOUBLE)) * 1000000) AS BIGINT)
               AS pqv
      FROM priors
    ),
    scored AS (
      SELECT tk.doc_id, l.cls, CAST(sum(l.lq) AS BIGINT) AS sl
      FROM toks tk JOIN lik l USING (term)
      GROUP BY tk.doc_id, l.cls
    ),
    fin AS (
      SELECT s.doc_id, s.cls, s.sl + p.pqv AS score,
             row_number() OVER (PARTITION BY s.doc_id
                                ORDER BY s.sl + p.pqv DESC, s.cls ASC) AS rn
      FROM scored s JOIN pq p ON p.cls = s.cls
    )
    SELECT doc_id, cls AS pred_source,
           CAST(score AS DOUBLE) / 1000000.0 AS best_score
    FROM fin WHERE rn = 1
    """,
)
def text_naive_bayes_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes source classifier, trained on the
    corpus's own labels and applied back — a complete ML train+predict
    loop in pure DataFrame ops with an exact cross-engine gate
    (add-one smoothing, fixed-point log-probabilities, min_by
    argmax)."""
    from alerta_spark.ops.text import naive_bayes_source

    return naive_bayes_source(load_table(spark, sf_dir, "documents"))


@register(
    "abtest_conversion_z",
    # Two-proportion z-test from exact integer counts; every division
    # and the sqrt run on identical operands in one fixed expression
    # tree — the textbook pooled-variance form, engine-exact.
    oracle="""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || 'exp1'), 1, 8)
                       < '80000000' THEN 'A' ELSE 'B' END AS arm
      FROM events
    ),
    conv AS (SELECT DISTINCT user_id FROM events
             WHERE event_type = 'purchase'
               AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 97),
    s AS (
      SELECT arm, count(*) AS n,
             CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM assign a LEFT JOIN conv c USING (user_id)
      GROUP BY arm
    ),
    wide AS (
      SELECT
        (SELECT n FROM s WHERE arm = 'A') AS na,
        (SELECT x FROM s WHERE arm = 'A') AS xa,
        (SELECT n FROM s WHERE arm = 'B') AS nb,
        (SELECT x FROM s WHERE arm = 'B') AS xb
    )
    SELECT na, xa, nb, xb,
           CAST(xa AS DOUBLE) / CAST(na AS DOUBLE) AS p_a,
           CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE) AS p_b,
           (CAST(xa AS DOUBLE) / CAST(na AS DOUBLE)
            - CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE))
           / sqrt(
               (CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE))
               * (1.0 - CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE))
               * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))
             ) AS z
    FROM wide
    """,
)
def abtest_conversion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically split 50/50 by
    md5 band (the hash_split discipline — assignment survives reruns),
    per-arm high-value-purchase conversion, and the pooled two-proportion
    z-statistic from exact counts. User-sized data in two exchanges;
    the z emerges from one fixed double chain."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.concat(F.col("user_id").cast("string"), F.lit("exp1"))), 1, 8)
        < "80000000",
        "A",
    ).otherwise("B")
    assign = ev.select("user_id").distinct().withColumn("arm", arm)
    conv = (
        ev.where(
            (F.col("event_type") == "purchase")
            & (F.get_json_object("props", "$.k").cast("int") > 97)
        )
        .select("user_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    s = (
        assign.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("long").alias("x"),
        )
    )
    a = s.where(F.col("arm") == "A").select(
        F.col("n").alias("na"), F.col("x").alias("xa")
    )
    b = s.where(F.col("arm") == "B").select(
        F.col("n").alias("nb"), F.col("x").alias("xb")
    )
    wide = a.crossJoin(F.broadcast(b))
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    xad, xbd = F.col("xa").cast("double"), F.col("xb").cast("double")
    pool = (F.col("xa") + F.col("xb")).cast("double") / (
        F.col("na") + F.col("nb")
    ).cast("double")
    return wide.select(
        "na",
        "xa",
        "nb",
        "xb",
        (xad / nad).alias("p_a"),
        (xbd / nbd).alias("p_b"),
        (
            (xad / nad - xbd / nbd)
            / F.sqrt(
                pool * (F.lit(1.0) - pool) * (F.lit(1.0) / nad + F.lit(1.0) / nbd)
            )
        ).alias("z"),
    )


@register(
    "trending_terms_snapshot",
    # Snapshot-over-snapshot lift from exact counts with +1 smoothing;
    # the ranking key is the quantized ratio (BIGINT) with a term
    # tie-break, so the top-20 cut is engine-identical.
    oracle="""
    WITH toks AS (
      SELECT CASE WHEN doc_id < 250 THEN 0 ELSE 1 END AS half,
             unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))
               AS term
      FROM documents
    ),
    c AS (
      SELECT term,
             CAST(count(*) FILTER (WHERE half = 0) AS BIGINT) AS c_old,
             CAST(count(*) FILTER (WHERE half = 1) AS BIGINT) AS c_new
      FROM toks GROUP BY term
    ),
    r AS (
      SELECT term, c_old, c_new,
             CAST(floor(CAST(c_new + 1 AS DOUBLE) / CAST(c_old + 1 AS DOUBLE)
                        * 1000000) AS BIGINT) AS lift_q
      FROM c
    )
    SELECT term, c_old, c_new,
           CAST(lift_q AS DOUBLE) / 1000000.0 AS lift
    FROM r
    ORDER BY lift_q DESC, term ASC
    LIMIT 20
    """,
)
def trending_terms_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-term report between two corpus snapshots (old half vs
    new half): +1-smoothed count lift, top-20 — the what-changed probe
    that pairs with corpus_snapshot_diff. One term aggregate + a
    TakeOrdered cut on a quantized ratio."""
    docs = load_table(spark, sf_dir, "documents")
    half = F.when(F.col("doc_id") < 250, 0).otherwise(1)
    toks = docs.select(
        half.alias("half"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    c = toks.groupBy("term").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("c_old"),
        F.count(F.when(F.col("half") == 1, 1)).alias("c_new"),
    )
    lift_q = F.floor(
        (F.col("c_new") + 1).cast("double")
        / (F.col("c_old") + 1).cast("double")
        * F.lit(1e6)
    ).cast("long")
    return (
        c.withColumn("_lq", lift_q)
        .orderBy(F.desc("_lq"), F.asc("term"))
        .limit(20)
        .select(
            "term",
            "c_old",
            "c_new",
            (F.col("_lq").cast("double") / F.lit(1e6)).alias("lift"),
        )
    )


@register(
    "hybrid_retrieval_rerank",
    # Stage 1 = the text_bm25_topk pipeline at recall_k=100 (exact
    # BIGINT ranking); stage 2 = round(cos,6) rerank of candidates
    # against the query vector; both cuts tie-broken on id.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS t_corpus FROM doclen),
    qc AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('spark', 'join', 'vector')
      GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term,
             CAST(floor(ln(CAST(2 * (SELECT n_docs FROM tot)
                                  - 2 * count(*) + 1 AS DOUBLE)
                           / CAST(2 * count(*) + 1 AS DOUBLE))
                        * 1000000) AS BIGINT) AS idf_q
      FROM qc GROUP BY term
    ),
    parts AS (
      SELECT qc.doc_id,
             CAST(floor(
               (CAST(idf_q AS DOUBLE) / 1000000.0)
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + (0.3 + 0.9 * (CAST(dl * (SELECT n_docs FROM tot) AS DOUBLE)
                                  / CAST((SELECT t_corpus FROM tot) AS DOUBLE))))
               * 1000000.0) AS BIGINT) AS pq
      FROM qc JOIN dfreq USING (term) JOIN doclen USING (doc_id)
    ),
    cands AS (
      SELECT doc_id,
             CAST(CAST(sum(pq) AS BIGINT) AS DOUBLE) / 1000000.0 AS bm25
      FROM parts GROUP BY doc_id
      ORDER BY CAST(sum(pq) AS BIGINT) DESC, doc_id ASC
      LIMIT 100
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT v FROM e WHERE vec_id = 0)
    SELECT c.doc_id, c.bm25,
           round(list_dot_product(e.v, qv.v)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(qv.v, qv.v))), 6) AS cos
    FROM cands c JOIN e ON e.vec_id = c.doc_id, qv
    ORDER BY cos DESC, c.doc_id ASC
    LIMIT 10
    """,
)
def hybrid_retrieval_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval (the RAG-serving shape): BM25
    lexical recall (top-100) broadcast into an exact cosine rerank
    against query vector 0 — the embedding corpus never shuffles and
    O(dim) work touches only the candidates."""
    from alerta_spark.ops.similarity import hybrid_retrieval

    return hybrid_retrieval(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        ["spark", "join", "vector"],
        query_vec_id=0,
        recall_k=100,
        k=10,
    )


@register(
    "agg_corr_value_hour",
    # Pearson r from five exact-decimal moments (built-in corr()
    # streams doubles — ulp-nondeterministic across engines); both
    # covariance and variance numerators assembled exactly, the wide-
    # decimal -> double casts routed through VARCHAR (DuckDB's direct
    # cast double-rounds), then one sqrt + one division.
    oracle="""
    WITH s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sx,
             CAST(sum(EXTRACT(hour FROM ts)) AS BIGINT) AS sy,
             CAST(sum(CAST(value AS DECIMAL(18,6))
                      * CAST(EXTRACT(hour FROM ts) AS DECIMAL(4,0)))
                  AS DECIMAL(24,6)) AS sxy,
             CAST(sum(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DECIMAL(24,12)) AS sxx,
             CAST(sum(EXTRACT(hour FROM ts) * EXTRACT(hour FROM ts)) AS BIGINT)
               AS syy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(CAST(CAST(n AS DECIMAL(10,0)) * sxy
                 - CAST(sx AS DECIMAL(19,6)) * CAST(sy AS DECIMAL(12,0))
                 AS VARCHAR) AS DOUBLE)
           / sqrt(
               CAST(CAST(CAST(n AS DECIMAL(10,0)) * sxx
                     - CAST(sx AS DECIMAL(19,6)) * CAST(sx AS DECIMAL(19,6))
                     AS VARCHAR) AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)
             ) AS corr_value_hour
    FROM s ORDER BY event_type
    """,
)
def agg_corr_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between event value and hour-of-day per
    event type, from five exact-decimal/integer moments in ONE
    aggregate — the bit-reproducible form of corr() (which streams
    doubles in partition order and drifts at the ulp)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(18,6)")
    y = F.hour("ts")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("decimal(18,6)").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * y.cast("decimal(4,0)")).cast("decimal(24,6)").alias("sxy"),
        F.sum(x * x).cast("decimal(24,12)").alias("sxx"),
        F.sum(y * y).cast("long").alias("syy"),
    )
    cov_num = (
        F.col("n").cast("decimal(10,0)") * F.col("sxy")
        - F.col("sx").cast("decimal(19,6)") * F.col("sy").cast("decimal(12,0)")
    ).cast("double")
    varx_num = (
        F.col("n").cast("decimal(10,0)") * F.col("sxx")
        - F.col("sx").cast("decimal(19,6)") * F.col("sx").cast("decimal(19,6)")
    ).cast("double")
    vary_num = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        "event_type",
        "n",
        (cov_num / F.sqrt(varx_num * vary_num)).alias("corr_value_hour"),
    ).orderBy("event_type")


def _benford_expected() -> list[float]:
    import math

    return [math.log10(1 + 1 / d) for d in range(1, 10)]


@register(
    "anomaly_benford_digits",
    # Digit shares are count/total divisions; the TVD is a FIXED-ORDER
    # 9-term expression tree of identical doubles (never an aggregate
    # over digit rows, whose order would differ) — engine-exact.
    oracle=(
        lambda b=_benford_expected(): f"""
    WITH d AS (
      SELECT event_type,
             CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS dig
      FROM events WHERE value >= 1
    ),
    c AS (
      SELECT event_type, count(*) AS n,
             {", ".join(f"count(*) FILTER (WHERE dig = {i}) AS c{i}" for i in range(1, 10))}
      FROM d GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE) AS d1_share,
           0.5 * ({" + ".join(
               f"abs(CAST(c{i} AS DOUBLE) / CAST(n AS DOUBLE) - {b[i-1]!r})"
               for i in range(1, 10)
           )}) AS benford_tvd
    FROM c
    """
    )(),
)
def anomaly_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance per event type: total-variation
    distance between the observed leading-digit distribution and
    Benford's law — the classic fabricated-numbers screen. One
    conditional aggregate; the 9-term TVD is a fixed expression tree,
    not an aggregation over digit rows."""
    b = _benford_expected()
    ev = load_table(spark, sf_dir, "events").where(F.col("value") >= 1)
    dig = F.substring(
        F.floor(F.col("value")).cast("long").cast("string"), 1, 1
    ).cast("int")
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.count(F.when(dig == i, 1)).alias(f"c{i}") for i in range(1, 10)
    ]
    c = ev.groupBy("event_type").agg(*aggs)
    nd = F.col("n").cast("double")
    tvd = F.lit(0.5) * sum(
        (
            F.abs(F.col(f"c{i}").cast("double") / nd - F.lit(b[i - 1]))
            for i in range(2, 10)
        ),
        F.abs(F.col("c1").cast("double") / nd - F.lit(b[0])),
    )
    return c.select(
        "event_type",
        "n",
        (F.col("c1").cast("double") / nd).alias("d1_share"),
        tvd.alias("benford_tvd"),
    )


@register(
    "path_top_user_journeys",
    # The journey string is built from an explicitly ordered (ts,
    # event_id) list on both engines; the top-20 cut ranks on exact
    # counts with a string tie-break.
    oracle="""
    WITH j AS (
      SELECT user_id,
             array_to_string(
               list(event_type ORDER BY ts, event_id)[1:8], '>') AS journey
      FROM events GROUP BY user_id
    )
    SELECT journey, count(*) AS n_users
    FROM j GROUP BY journey
    ORDER BY n_users DESC, journey ASC
    LIMIT 20
    """,
)
def path_top_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: each user's first 8 events as an ordered
    'a>b>c' journey string, top-20 most common journeys — the
    navigation-pattern report. One user-keyed aggregate (collect +
    sort + slice, all JVM array ops) + one journey-keyed count +
    TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    journey = F.array_join(
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            1,
            8,
        ),
        ">",
    )
    return (
        ev.groupBy("user_id")
        .agg(journey.alias("journey"))
        .groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("journey"))
        .limit(20)
    )


@register(
    "changepoint_cusum_daily",
    # Daily means quantized to 1e-9 fixed-point; the CUSUM running sum
    # is an INTEGER window sum (exact under any sliding-aggregation
    # algorithm — the w_running_agg_lag float hazard cannot occur);
    # one final double division per row.
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS s
      FROM events GROUP BY day
    ),
    q AS (
      SELECT day,
             CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000000)
                  AS BIGINT) AS mq
      FROM d
    ),
    tot AS (SELECT CAST(sum(mq) AS BIGINT) AS mu_num,
                   CAST(count(*) AS BIGINT) AS nd FROM q)
    SELECT day,
           CAST(mq AS DOUBLE) / 1000000000.0 AS daily_mean,
           CAST(CAST(sum(mq * nd - mu_num) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS DOUBLE)
             / (CAST(nd AS DOUBLE) * 1000000000.0) AS cusum
    FROM q, tot
    """,
)
def changepoint_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point trace: cumulative deviation of the daily
    mean from the period mean — the standard drift/level-shift
    detector; the |cusum| peak marks the most likely change day.
    Day-sized data only after one exact-decimal daily aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(18,6)").alias("s"),
    )
    q = d.select(
        "day",
        F.floor(
            F.col("s").cast("double") / F.col("n").cast("double") * F.lit(1e9)
        )
        .cast("long")
        .alias("mq"),
    )
    tot = q.agg(
        F.sum("mq").alias("mu_num"), F.count(F.lit(1)).alias("nd")
    )
    w = (
        W.partitionBy(F.lit(0))
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # day-count-sized frame: the single-partition window is deliberate
    return q.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("mq").cast("double") / F.lit(1e9)).alias("daily_mean"),
        (
            F.sum(F.col("mq") * F.col("nd") - F.col("mu_num"))
            .over(w)
            .cast("double")
            / (F.col("nd").cast("double") * F.lit(1e9))
        ).alias("cusum"),
    )


@register(
    "funnel_within_24h",
    # First-touch deadline: each step must land within 24h of the
    # PREVIOUS step's first qualifying time — t bounds are exact µs
    # integers on both engines.
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t
        AND epoch_us(e.ts) <= s1.t + 86400000000
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
        AND epoch_us(e.ts) <= s2.t + 86400000000
      GROUP BY e.user_id
    ),
    c AS (
      SELECT 1 AS step_idx, 'signup' AS step, count(*) AS n FROM s1
      UNION ALL SELECT 2, 'view', count(*) FROM s2
      UNION ALL SELECT 3, 'purchase', count(*) FROM s3
    )
    SELECT step_idx, step, n AS n_users,
           CAST(n AS DOUBLE) / CAST(first_value(n) OVER (ORDER BY step_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS DOUBLE) AS conversion
    FROM c
    """,
)
def funnel_within_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline funnel: signup → view → purchase where each step must
    convert within 24h of the previous one (first-touch window) —
    same single-scan fold as the unconstrained funnel, one extra
    comparison per slot."""
    from alerta_spark.ops.sessions import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(
        ev,
        [
            ("signup", F.col("event_type") == "signup"),
            ("view", F.col("event_type") == "view"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        within_minutes=24 * 60,
    )


@register(
    "rolling_7d_active_users",
    # Exact sliding distinct: explode each (user, day) into the 7
    # target days it contributes to, then one distinct + count — never
    # a per-day rescan or a sliding set union.
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
                FROM events),
    contrib AS (
      SELECT DISTINCT user_id, d + CAST(o AS INTEGER) AS target_day
      FROM ud, (SELECT unnest(generate_series(0, 6)) AS o)
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM ud)
    SELECT target_day, count(*) AS active_users_7d
    FROM contrib, bounds
    WHERE target_day BETWEEN lo AND hi
    GROUP BY target_day
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling distinct users per day — the sliding
    distinct no window frame can express exactly. Each (user, day)
    fans out to the <=7 days it contributes to (bounded fan-out), one
    distinct + one count aggregate; days outside the observed range
    are clipped so the curve has no synthetic ramp-out tail."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    bounds = ud.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "d",
        )
        .select("user_id", F.date_add(F.col("d"), F.col("o")).alias("target_day"))
        .distinct()
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .where(F.col("target_day").between(F.col("lo"), F.col("hi")))
        .groupBy("target_day")
        .agg(F.count(F.lit(1)).alias("active_users_7d"))
    )


@register(
    "timeseries_ffill_daily",
    # Carried values are copies of observed doubles (no arithmetic);
    # the last-in-bucket cut is pinned to ORDER BY ts DESC, value DESC
    # on both engines — fully hash-exact.
    oracle="""
    WITH obs AS (
      SELECT user_id AS k, CAST(date_trunc('day', ts) AS DATE) AS bucket,
             ts, value
      FROM events
    ),
    last_obs AS (
      SELECT k, bucket, value FROM (
        SELECT k, bucket, value,
               row_number() OVER (PARTITION BY k, bucket
                                  ORDER BY ts DESC, value DESC) AS rn
        FROM obs
      ) WHERE rn = 1
    ),
    span AS (SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY k),
    grid AS (
      SELECT k, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                            CAST(hi AS TIMESTAMP),
                                            INTERVAL 1 DAY)) AS DATE) AS bucket
      FROM span
    )
    SELECT g.k AS user_id, g.bucket,
           last_value(l.value IGNORE NULLS) OVER (
             PARTITION BY g.k ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           l.value IS NOT NULL AS is_observed
    FROM grid g LEFT JOIN last_obs l ON g.k = l.k AND g.bucket = l.bucket
    """,
)
def timeseries_ffill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: per-user daily grid with
    last-observation-carried-forward — the regularization every
    metrics join and window model assumes. Grid size is span/step per
    key (event-volume independent); fill + bucket-cut share one
    key-hash exchange."""
    from alerta_spark.ops.timeseries import resample_ffill

    return resample_ffill(load_table(spark, sf_dir, "events"))


@register(
    "sample_weighted_topk",
    # A-ES weighted sampling with hash-derived uniforms: ln(u)
    # quantized from exact BIGINTs, ranking key = ONE IEEE division,
    # ties on doc_id — the k-cut is engine-identical.
    oracle="""
    WITH scored AS (
      SELECT doc_id, n_chars,
             CAST(floor(ln(
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'w1'), 1, 8))
                    AS BIGINT) + 1 AS DOUBLE) / 4294967296.0)
               * 1000000000) AS BIGINT) AS lnq
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars
    FROM scored
    ORDER BY CAST(lnq AS DOUBLE) / CAST(n_chars AS DOUBLE) DESC, doc_id ASC
    LIMIT 25
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis with md5-derived uniforms): 25 docs drawn
    with probability proportional to length — the quality- or
    size-proportional corpus pick, rerun-stable. Map-only scoring +
    TakeOrderedAndProject."""
    from alerta_spark.ops.sampling import weighted_sample_k

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_k(docs, "n_chars", k=25, salt="w1").select(
        "doc_id", "n_chars"
    )


@register(
    "profile_column_stats",
    oracle="""
    WITH src AS (
      SELECT user_id, event_type, value,
             json_extract_string(props, '$.k') AS props_k
      FROM events
    ),
    wide AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z1,
             CAST(count(DISTINCT user_id) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z2,
             CAST(count(DISTINCT event_type) AS BIGINT) AS d2,
             CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z3,
             CAST(count(DISTINCT value) AS BIGINT) AS d3,
             CAST(sum(CASE WHEN props_k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z4,
             CAST(count(DISTINCT props_k) AS BIGINT) AS d4
      FROM src
    )
    SELECT 'user_id' AS column, n AS n_rows, z1 AS n_null,
           CAST(z1 AS DOUBLE) / CAST(n AS DOUBLE) AS null_rate, d1 AS n_distinct
    FROM wide
    UNION ALL SELECT 'event_type', n, z2, CAST(z2 AS DOUBLE) / CAST(n AS DOUBLE), d2 FROM wide
    UNION ALL SELECT 'value', n, z3, CAST(z3 AS DOUBLE) / CAST(n AS DOUBLE), d3 FROM wide
    UNION ALL SELECT 'props_k', n, z4, CAST(z4 AS DOUBLE) / CAST(n AS DOUBLE), d4 FROM wide
    """,
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality pre-flight: per column (including a derived JSON
    path), row/NULL/exact-distinct counts in one scan — the profile
    you read before choosing join keys and filter thresholds."""
    from alerta_spark.ops.profile import column_profile

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").alias("props_k"),
    )
    return column_profile(ev, ["user_id", "event_type", "value", "props_k"])


@register(
    "events_cooccurrence_lift",
    # lift = (n_both * n_users) / (n_a * n_b): exact-integer products
    # (bounded by users^2 < 2^53 here; cast products once) and ONE
    # double division — engine-exact.
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
    tc AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both, ta.n_t AS n_a, tb.n_t AS n_b,
           CAST(n_both * (SELECT n_users FROM tot) AS DOUBLE)
             / CAST(ta.n_t * tb.n_t AS DOUBLE) AS lift
    FROM pairs
    JOIN tc ta ON ta.event_type = pairs.type_a
    JOIN tc tb ON tb.event_type = pairs.type_b
    """,
)
def events_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types: for each type pair, do
    the same users do both more than independence predicts? The
    distinct-first plan bounds the user self-join fan-out to
    (#types per user)^2 regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    tot = ev.agg(F.count_distinct("user_id").alias("n_users"))
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = F.broadcast(tc.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")))
    tb = F.broadcast(tc.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")))
    return (
        pairs.join(ta, "type_a")
        .join(tb, "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                (F.col("n_both") * F.col("n_users")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


@register(
    "split_leakage_containment",
    oracle=f"""
    WITH tr AS (SELECT doc_id, text FROM documents
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'),
    te AS (SELECT doc_id, text FROM documents
           WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= 'e6666666'),
    si AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS shingle
           FROM (SELECT doc_id, text FROM tr) AS documents(doc_id, text)),
    se AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS shingle
           FROM (SELECT doc_id, text FROM te) AS documents(doc_id, text)),
    sz AS (SELECT doc_id AS eval_id, count(*) AS eval_size FROM se GROUP BY 1),
    inter AS (
      SELECT si.doc_id AS train_id, se.doc_id AS eval_id, count(*) AS shared
      FROM si JOIN se USING (shingle) GROUP BY 1, 2
    )
    SELECT train_id, eval_id, shared, eval_size,
           CAST(shared AS DOUBLE) / CAST(eval_size AS DOUBLE) AS containment
    FROM inter JOIN sz USING (eval_id)
    WHERE CAST(shared AS DOUBLE) / CAST(eval_size AS DOUBLE) >= 0.5
    """,
)
def split_leakage_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train->test leakage report: per cross-split doc pair, the
    fraction of the test doc's 5-gram set already present in a train
    doc (containment = 1.0 -> verbatim leak). Asymmetric plan: test
    shingle index broadcasts, the train stream joins map-side."""
    from alerta_spark.ops.decontam import containment_report
    from alerta_spark.ops.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, {"train": 0.8, "eval": 0.1, "test": 0.1})
    return containment_report(
        split.where(F.col("split") == "train"),
        split.where(F.col("split") == "test"),
        threshold=0.5,
    )


@register(
    "cohort_retention_weekly",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    first AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY user_id),
    act AS (
      SELECT cohort_week,
             CAST((wk - cohort_week) // 7 AS BIGINT) AS week_offset,
             count(*) AS n_active
      FROM uw JOIN first USING (user_id)
      GROUP BY cohort_week, week_offset
    ),
    sz AS (SELECT cohort_week, n_active AS cohort_size FROM act
           WHERE week_offset = 0)
    SELECT a.cohort_week, a.week_offset, a.n_active, sz.cohort_size,
           CAST(a.n_active AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE)
             AS retention
    FROM act a JOIN sz USING (cohort_week)
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: exact integer counts, one
    int/int division — the product-analytics staple, user-sized data
    confined to two exchanges."""
    from alerta_spark.ops.sessions import cohort_retention

    return cohort_retention(load_table(spark, sf_dir, "events"))


@register(
    "embedding_label_centroids",
    # Component sums quantized to 1/2^20 fixed-point BIGINTs (float
    # sums over arbitrary order diverge at the ulp); centroid and
    # E[x^2]-E[x]^2 variance from one final double chain.
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    idx AS (SELECT unnest(generate_series(1, 64)) AS pos),
    comp AS (
      SELECT label, pos - 1 AS dim,
             CAST(floor(v[pos] * 1048576) AS BIGINT) AS xq,
             CAST(floor(v[pos] * v[pos] * 1048576) AS BIGINT) AS xxq
      FROM e, idx
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
           count(*) AS n,
           CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) / 1048576.0
             / CAST(count(*) AS DOUBLE) AS centroid,
           CAST(CAST(sum(xxq) AS BIGINT) AS DOUBLE) / 1048576.0
               / CAST(count(*) AS DOUBLE)
             - (CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) / 1048576.0
                / CAST(count(*) AS DOUBLE))
             * (CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) / 1048576.0
                / CAST(count(*) AS DOUBLE)) AS dim_var
    FROM comp GROUP BY label, dim
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + per-dimension variance over the embedding
    corpus: posexplode -> one (label, dim) partial aggregate; output
    is labels x dims regardless of corpus size."""
    from alerta_spark.ops.similarity import label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroids(emb).withColumn("label", F.col("label").cast("long"))


@register(
    "text_bigram_nll",
    # Each distinct bigram's ln(c_pair/c_ctx) quantized once from exact
    # BIGINTs; per-doc sums exact; one final double chain — the
    # unigram_nll discipline applied to transitions.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    inst AS (
      SELECT doc_id,
             unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS pg
      FROM toks WHERE len(t) >= 2
    ),
    pv AS (SELECT pg, count(*) AS cp FROM inst GROUP BY pg),
    cv AS (SELECT split_part(pg, ' ', 1) AS w1, CAST(sum(cp) AS BIGINT) AS cc
           FROM pv GROUP BY w1),
    q AS (
      SELECT pg, CAST(floor(ln(CAST(cp AS DOUBLE) / CAST(cc AS DOUBLE))
                            * 1000000000) AS BIGINT) AS qv
      FROM pv JOIN cv ON split_part(pv.pg, ' ', 1) = cv.w1
    )
    SELECT i.doc_id, count(*) AS n_bigrams,
           CAST(-CAST(sum(q.qv) AS BIGINT) AS DOUBLE) / 1000000000.0
             / CAST(count(*) AS DOUBLE) AS mean_nll
    FROM inst i JOIN q USING (pg)
    GROUP BY i.doc_id
    """,
)
def text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency: mean NLL of each document's token
    transitions under the corpus's own bigram model — word-order
    sensitive where unigram NLL is not. Bigrams built map-only
    (zip_with over array slices), one pair aggregate + vocab-sized
    joins; no window, no per-step rescan."""
    from alerta_spark.ops.text import bigram_nll

    return bigram_nll(load_table(spark, sf_dir, "documents"))


@register(
    "agg_cube_event_day",
    # gid bit order pinned: first grouping column = MSB in Spark's
    # grouping_id(); DuckDB side computes GROUPING(a)*2 + GROUPING(b)
    # to match. Sums are exact decimals with one final double cast.
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS gid,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    """,
)
def agg_cube_event_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE over (event_type, day) with grouping_id: all four
    aggregation granularities in ONE pass — Spark expands the grouping
    sets before the hash aggregate (map-side partials per set), no
    4x rescan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.cube("event_type", F.to_date("ts").alias("day")).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@register(
    "w_rank_suite_events",
    # rank/dense_rank/percent_rank/cume_dist run over ORDER BY value
    # (tie/peer-group semantics exercised); row_number/ntile need a
    # total order so they add event_id. percent_rank and cume_dist are
    # one int/int IEEE division on both engines.
    oracle="""
    SELECT event_id, event_type,
           rank()         OVER wv AS rnk,
           dense_rank()   OVER wv AS drnk,
           percent_rank() OVER wv AS prank,
           cume_dist()    OVER wv AS cdist,
           row_number()   OVER wt AS rn,
           ntile(4)       OVER wt AS quartile
    FROM events
    WINDOW wv AS (PARTITION BY event_type ORDER BY value),
           wt AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def w_rank_suite_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window surface: rank, dense_rank,
    percent_rank, cume_dist under peer groups; row_number and ntile
    under an explicit total order. One event_type-keyed exchange
    shared by both window specs."""
    ev = load_table(spark, sf_dir, "events")
    wv = W.partitionBy("event_type").orderBy("value")
    wt = W.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.rank().over(wv).cast("long").alias("rnk"),
        F.dense_rank().over(wv).cast("long").alias("drnk"),
        F.percent_rank().over(wv).alias("prank"),
        F.cume_dist().over(wv).alias("cdist"),
        F.row_number().over(wt).cast("long").alias("rn"),
        F.ntile(4).over(wt).cast("long").alias("quartile"),
    )


@register(
    "pivot_event_type_daily",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY day
    """,
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): daily counts per event type as columns.
    The pivot value list is PINNED — an unpinned pivot runs an extra
    distinct-scan job to discover values and makes the output schema
    data-dependent, both wrong at 100 TB."""
    kinds = ["click", "error", "purchase", "signup", "view"]
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day", *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds]
    )


@register(
    "corpus_drift_jsd",
    # Every ln argument is a ratio of exact BIGINTs (p/m = 2aB/(aB+bA)),
    # quantized once per term; weighted sums accumulate as BIGINTs; the
    # final JSD is one double chain on identical operands — hashable at
    # full float precision.
    oracle="""
    WITH a_docs AS (
      SELECT doc_id, text FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
    ),
    b_docs AS (
      SELECT doc_id, text FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= 'e6666666'
    ),
    ca AS (
      SELECT term, count(*) AS na FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  t -> t <> '')) AS term FROM a_docs
      ) GROUP BY term
    ),
    cb AS (
      SELECT term, count(*) AS nb FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  t -> t <> '')) AS term FROM b_docs
      ) GROUP BY term
    ),
    j AS (
      SELECT COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
      FROM ca FULL OUTER JOIN cb USING (term)
    ),
    tot AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
            FROM j),
    s AS (
      SELECT
        CAST(sum(CASE WHEN na > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_a,
        CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_b,
        CAST(sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_shared_terms,
        CAST(sum(CASE WHEN na > 0 THEN na * CAST(floor(ln(
              CAST(2 * na * tb AS DOUBLE) / CAST(na * tb + nb * ta AS DOUBLE))
              * 1000000000) AS BIGINT) ELSE 0 END) AS BIGINT) AS swa,
        CAST(sum(CASE WHEN nb > 0 THEN nb * CAST(floor(ln(
              CAST(2 * nb * ta AS DOUBLE) / CAST(na * tb + nb * ta AS DOUBLE))
              * 1000000000) AS BIGINT) ELSE 0 END) AS BIGINT) AS swb,
        ANY_VALUE(ta) AS ta, ANY_VALUE(tb) AS tb
      FROM j, tot
    )
    SELECT n_terms_a, n_terms_b, n_shared_terms,
           CAST(swa AS DOUBLE) / (2.0 * CAST(ta AS DOUBLE) * 1000000000.0)
             + CAST(swb AS DOUBLE) / (2.0 * CAST(tb AS DOUBLE) * 1000000000.0)
             AS jsd
    FROM s
    """,
)
def corpus_drift_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-test distribution drift: Jensen-Shannon divergence of
    the two splits' unigram distributions — the shift monitor you run
    before trusting an eval score. Vocab-sized term join, exact-BIGINT
    accumulation, one row out."""
    from alerta_spark.ops.sampling import hash_split
    from alerta_spark.ops.text import token_js_divergence

    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, {"train": 0.8, "eval": 0.1, "test": 0.1})
    return token_js_divergence(
        split.where(F.col("split") == "train"),
        split.where(F.col("split") == "test"),
    )


@register(
    "sample_k_per_group",
    # The oracle is the PLAIN single-window formulation; the Spark side
    # runs the skew-safe two-phase salted variant — the hash gate
    # proves the two-phase cut is exactly the top-k-by-hash answer.
    oracle="""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || 'pick1'), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 3
    """,
)
def sample_k_per_group_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling (3 docs per source): uniform
    by md5 rank, rerun- and engine-stable, computed via the two-phase
    salted top-k so a hot group never lands in one task."""
    from alerta_spark.ops.sampling import sample_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    return sample_k_per_group(docs, "source", k=3, salt="pick1").select(
        "doc_id", "source"
    )


@register(
    "text_bm25_topk",
    # BM25 with the repo's fixed-point discipline: idf quantized from
    # exact BIGINTs, each (doc, term) partial score an identical
    # elementwise IEEE chain on exact integer inputs quantized to
    # fixed-point, per-doc totals summed as BIGINTs so the top-k cut
    # (tie-broken on doc_id) is engine-exact.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS t_corpus FROM doclen),
    qc AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('spark', 'join', 'vector')
      GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term,
             CAST(floor(ln(CAST(2 * (SELECT n_docs FROM tot)
                                  - 2 * count(*) + 1 AS DOUBLE)
                           / CAST(2 * count(*) + 1 AS DOUBLE))
                        * 1000000) AS BIGINT) AS idf_q
      FROM qc GROUP BY term
    ),
    parts AS (
      SELECT qc.doc_id,
             CAST(floor(
               (CAST(idf_q AS DOUBLE) / 1000000.0)
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + (0.3 + 0.9 * (CAST(dl * (SELECT n_docs FROM tot) AS DOUBLE)
                                  / CAST((SELECT t_corpus FROM tot) AS DOUBLE))))
               * 1000000.0) AS BIGINT) AS pq
      FROM qc JOIN dfreq USING (term) JOIN doclen USING (doc_id)
    )
    SELECT doc_id, count(*) AS n_terms_matched,
           CAST(CAST(sum(pq) AS BIGINT) AS DOUBLE) / 1000000.0 AS bm25
    FROM parts GROUP BY doc_id
    ORDER BY CAST(sum(pq) AS BIGINT) DESC, doc_id ASC
    LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (top-10 for a 3-term query): the
    inverted-index probe — query-term filter BEFORE the posting
    aggregate so only |Q|-term rows shuffle, full stream touched only
    by one doc-length aggregate, top-k via TakeOrderedAndProject
    (never a global single-partition window)."""
    from alerta_spark.ops.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "join", "vector"], k=10)


@register(
    "corpus_temperature_mix",
    oracle="""
    WITH totals AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS w, count(*) AS n
      FROM documents GROUP BY source
    ),
    scaled AS (
      SELECT source, sqrt(CAST(w AS DOUBLE)) AS sw, n FROM totals
    ),
    overall AS (
      -- (CTE was previously named "glob" — a DuckDB reserved word that
      -- made the oracle unparseable)
      SELECT CAST(sum(CAST(sw AS DECIMAL(28,10))) AS DOUBLE) AS denom,
             CAST(sum(n) AS BIGINT) AS total_n
      FROM scaled
    ),
    plan AS (
      SELECT source,
             LEAST(CAST(1.0 AS DOUBLE),
                   0.5 * CAST(total_n AS DOUBLE) * (sw / denom)
                   / CAST(n AS DOUBLE)) AS keep_p
      FROM scaled, overall
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN plan p USING (source)
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix1'), 1, 8))
               AS BIGINT) / 4294967296.0 < p.keep_p
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (alpha=0.5, half-budget): the
    multilingual-LM rebalance that samples each source proportional to
    sqrt of its token mass. Per-source plan broadcast back over a
    map-only md5-band membership test — deterministic across retries
    and engines (sqrt is IEEE-exact; the tiny cross-source sum
    accumulates in DECIMAL)."""
    from alerta_spark.ops.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mix(
        docs, "source", "n_chars", alpha=0.5, budget_frac=0.5, salt="mix1"
    ).select("doc_id", "source")


@register(
    "graph_pagerank_transitions",
    # 3 unrolled fixed-point rounds; every division is integer floor
    # (DuckDB // == Spark div for non-negative operands) and every SUM
    # is cast back to BIGINT (DuckDB window/agg SUM returns HUGEINT),
    # so both engines compute the identical integers.
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    e AS (SELECT DISTINCT src, dst FROM seq WHERE dst IS NOT NULL),
    v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
    r0 AS (
      SELECT v.id, od.outdeg, 1000000000000 // nn.n AS rank_fp
      FROM v LEFT JOIN od ON v.id = od.src CROSS JOIN nn
    ),
    r1 AS (
      SELECT r.id, r.outdeg,
             (15 * (1000000000000 // nn.n)) // 100
             + (85 * (COALESCE(c.contrib, 0)
                      + (SELECT CAST(COALESCE(SUM(rank_fp), 0) AS BIGINT)
                         FROM r0 WHERE outdeg IS NULL) // nn.n)) // 100
               AS rank_fp
      FROM r0 r
      LEFT JOIN (SELECT e.dst AS id,
                        CAST(SUM(p.rank_fp // p.outdeg) AS BIGINT) AS contrib
                 FROM e JOIN r0 p ON e.src = p.id GROUP BY e.dst) c
        ON r.id = c.id
      CROSS JOIN nn
    ),
    r2 AS (
      SELECT r.id, r.outdeg,
             (15 * (1000000000000 // nn.n)) // 100
             + (85 * (COALESCE(c.contrib, 0)
                      + (SELECT CAST(COALESCE(SUM(rank_fp), 0) AS BIGINT)
                         FROM r1 WHERE outdeg IS NULL) // nn.n)) // 100
               AS rank_fp
      FROM r1 r
      LEFT JOIN (SELECT e.dst AS id,
                        CAST(SUM(p.rank_fp // p.outdeg) AS BIGINT) AS contrib
                 FROM e JOIN r1 p ON e.src = p.id GROUP BY e.dst) c
        ON r.id = c.id
      CROSS JOIN nn
    ),
    r3 AS (
      SELECT r.id, r.outdeg,
             (15 * (1000000000000 // nn.n)) // 100
             + (85 * (COALESCE(c.contrib, 0)
                      + (SELECT CAST(COALESCE(SUM(rank_fp), 0) AS BIGINT)
                         FROM r2 WHERE outdeg IS NULL) // nn.n)) // 100
               AS rank_fp
      FROM r2 r
      LEFT JOIN (SELECT e.dst AS id,
                        CAST(SUM(p.rank_fp // p.outdeg) AS BIGINT) AS contrib
                 FROM e JOIN r2 p ON e.src = p.id GROUP BY e.dst) c
        ON r.id = c.id
      CROSS JOIN nn
    )
    SELECT id, CAST(rank_fp AS BIGINT) AS rank_fp FROM r3
    """,
)
def graph_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (distinct
    consecutive per-user transitions), 3 fixed-point rounds.

    The iterative-algorithm representative alongside dup_clusters'
    label propagation: each round is one join + one aggregate, ranks
    carried as integer 1e-12 units so the result is bit-identical
    across engines and runs (see ops/graph.py docstring). The edge
    builder is one window pass over events."""
    from alerta_spark.ops.graph import pagerank_fixedpoint

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .distinct()
    )
    return pagerank_fixedpoint(edges, iters=3)


@register(
    "sketch_cms_heavy_hitters",
    # CMS is usually engine-specific; this one is md5-bucketed so the
    # whole sketch — build AND probe — is a pure integer function of
    # the corpus, exactly replicable in SQL. cms_tf >= tf always
    # (collisions only ever ADD).
    oracle="""
    WITH terms AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    cms AS (
      SELECT d.depth,
             substr(md5(t.term || 'cms' || CAST(d.depth AS VARCHAR)), 1, 3)
               AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM terms t CROSS JOIN (SELECT unnest([0, 1, 2]) AS depth) d
      GROUP BY 1, 2
    ),
    top20 AS (
      SELECT term, CAST(count(*) AS BIGINT) AS tf
      FROM terms GROUP BY term
      ORDER BY tf DESC, term ASC LIMIT 20
    )
    SELECT t.term, t.tf, CAST(MIN(c.cnt) AS BIGINT) AS cms_tf
    FROM top20 t
    JOIN cms c
      ON c.bucket = substr(md5(t.term || 'cms'
                               || CAST(c.depth AS VARCHAR)), 1, 3)
    GROUP BY t.term, t.tf
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency summary, probed for the exact top-20
    corpus terms: (term, exact tf, CMS estimate). depth=3 x 4096
    buckets — a constant-size mergeable summary of an unbounded term
    stream; the estimate only ever overcounts. The md5 bucketing makes
    build+probe engine-exact, so unlike most sketches this one is
    hash-checked, not rows-only (cf. agg_distinct_users_daily_hll)."""
    from alerta_spark.ops.sketches import cms_build, cms_estimate
    from alerta_spark.ops.text import vocab_top_terms as vocab

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("term")
    )
    cms = cms_build(terms, depth=3, prefix_len=3)
    top = vocab(docs, top_n=20).select("term", "tf")
    return cms_estimate(cms, top, depth=3, prefix_len=3)


@register(
    "mv_join_incremental_revenue",
    # oracle recomputes the view monolithically; the Spark side folds
    # three md5-banded order deltas through partial->combine->finalize,
    # proving the join-view maintenance algebra is lossless.
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(20,2)))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def mv_join_incremental_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate-over-JOIN view: revenue by
    nation, refreshed from three disjoint order deltas. Each refresh
    joins ONLY the delta's lineitems (O(delta), dims broadcast) and
    merges by exact DECIMAL addition — the monolithic oracle proves
    the fold is lossless. Complements rollup_incremental_hourly
    (single-table) with the join-view case every warehouse MV needs."""
    from alerta_spark.ops.rollup import (
        combine_join_view,
        finalize_join_view,
        join_view_partials,
    )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    band = F.substring(
        F.md5(F.col("o_orderkey").cast("string")), 1, 1
    )
    deltas = [
        o.where(band < F.lit("6")),
        o.where((band >= F.lit("6")) & (band < F.lit("b"))),
        o.where(band >= F.lit("b")),
    ]
    parts = [join_view_partials(d, li, c, n) for d in deltas]
    return finalize_join_view(combine_join_view(*parts))


@register(
    "dedup_frequent_lines",
    # The synthetic documents have no layout, so the query PLANTS the
    # boilerplate regime the operator exists for (same pattern as
    # dedup_embedding_lsh's twins): a per-source header line (df=25
    # docs at sf0.01) and a global footer (df=500), around the doc's
    # own words re-lined 8 per row. The oracle replicates the
    # synthesis and the df>2 drop rule monolithically.
    oracle="""
    WITH base AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks,
             CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT) AS nl
      FROM documents
    ),
    lines AS (
      SELECT doc_id, 0 AS pos,
             '== ' || source || ' terms of service ==' AS line
      FROM base
      UNION ALL
      SELECT doc_id, pos,
             array_to_string(
               list_slice(toks, (pos - 1) * 8 + 1, (pos - 1) * 8 + 8), ' ')
      FROM (
        SELECT doc_id, toks, unnest(generate_series(1, nl)) AS pos
        FROM base
      )
      UNION ALL
      SELECT doc_id, nl + 1, 'all rights reserved' FROM base
    ),
    freq AS (
      SELECT trim(line) AS norm FROM lines WHERE trim(line) <> ''
      GROUP BY 1 HAVING count(DISTINCT doc_id) > 2
    ),
    kept AS (
      SELECT * FROM lines WHERE trim(line) NOT IN (SELECT norm FROM freq)
    ),
    tot AS (SELECT doc_id, count(*) AS total FROM lines GROUP BY 1)
    SELECT k.doc_id,
           string_agg(k.line, chr(10) ORDER BY k.pos) AS clean_text,
           CAST(count(*) AS BIGINT) AS n_lines_kept,
           CAST(any_value(t.total) - count(*) AS BIGINT) AS n_lines_dropped
    FROM kept k JOIN tot t ON k.doc_id = t.doc_id
    GROUP BY k.doc_id
    """,
)
def dedup_frequent_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X81 cross-corpus line dedup (CCNet-style): drop lines whose
    trimmed form appears in > max_doc_freq DISTINCT docs, reassemble.
    Frequent-line set is tiny -> broadcast anti-join (map-side drop);
    one doc-keyed exchange to reassemble."""
    from alerta_spark.ops.text import chunk_into_lines, line_df_dedup

    docs = load_table(spark, sf_dir, "documents")
    lined = chunk_into_lines(docs.select("doc_id", "source", "text"))
    planted = lined.withColumn(
        "text",
        F.concat(
            F.lit("== "), F.col("source"), F.lit(" terms of service ==\n"),
            F.col("text"),
            F.lit("\nall rights reserved"),
        ),
    )
    return line_df_dedup(planted, max_doc_freq=2)


@register(
    "sketch_bloom_dedup_probe",
    # Bloom filter over the train split's doc digests, probed with the
    # whole corpus; is_member is the exact truth carried alongside so
    # the no-false-negative guarantee is visible in the output (every
    # is_member row MUST be maybe_member). md5-hex-prefix hashing makes
    # every bit engine-reproducible, so all 1093 filter words and every
    # membership verdict hash-match.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, md5({_DUCK_NORM}) AS dg,
             md5(doc_id || 'bloomsplit') AS band
      FROM documents
    ),
    train AS (SELECT dg FROM d WHERE substring(band, 1, 1) < '8'),
    pos AS (
      SELECT dg,
             CAST('0x' || substring(md5(dg || 'bloom' || g.i), 1, 4) AS BIGINT)
               AS p
      FROM train, (SELECT unnest(generate_series(0, 3)) AS i) g
    ),
    bloom AS (
      SELECT CAST(floor(p / 60.0) AS BIGINT) AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 60 AS INT)) AS bits
      FROM pos GROUP BY 1
    ),
    probe AS (
      SELECT doc_id,
             CAST('0x' || substring(md5(dg || 'bloom' || g.i), 1, 4) AS BIGINT)
               AS p
      FROM d, (SELECT unnest(generate_series(0, 3)) AS i) g
    ),
    verdict AS (
      SELECT probe.doc_id,
             min(CASE WHEN coalesce(b.bits, 0)
                          & (CAST(1 AS BIGINT) << CAST(p % 60 AS INT)) <> 0
                      THEN 1 ELSE 0 END) = 1 AS maybe_member
      FROM probe
      LEFT JOIN bloom b ON CAST(floor(p / 60.0) AS BIGINT) = b.word
      GROUP BY 1
    )
    SELECT v.doc_id, v.maybe_member,
           d.dg IN (SELECT dg FROM train) AS is_member
    FROM verdict v JOIN d ON v.doc_id = d.doc_id
    """,
)
def sketch_bloom_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X82 Bloom-filter membership: the constant-size fast path in
    front of the incremental-dedup digest store — 'definitely new'
    docs skip the exact anti-join; only maybe-seen docs pay it.
    Filter = ceil(16^4/60) BIGINT words, broadcast at probe time."""
    from alerta_spark.ops.sketches import bloom_build, bloom_probe
    from alerta_spark.ops.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.md5(normalize_text("text")).alias("dg"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit("bloomsplit"))
        ).alias("band"),
    )
    train = d.where(F.substring("band", 1, 1) < "8").select("dg")
    bloom = bloom_build(train, "dg")
    probed = bloom_probe(bloom, d.select("doc_id", "dg"), "dg")
    member = train.distinct().withColumn("is_member", F.lit(True))
    return (
        probed.join(d.select("doc_id", "dg"), "doc_id")
        .join(F.broadcast(member), "dg", "left")
        .select(
            "doc_id",
            "maybe_member",
            F.coalesce("is_member", F.lit(False)).alias("is_member"),
        )
    )


@register(
    "decontaminate_embedding_cos",
    # Semantic decontamination regime planted like dedup_embedding_lsh:
    # eval = every 37th vector (eval benchmarks are small relative to
    # the corpus — the asymmetry the broadcast plan exists for);
    # train = the rest PLUS exact copies of half the eval set under
    # new ids (leakage). The copies hit
    # max_eval_cos=1.0 and are dropped; organic train vectors top out
    # ~0.5 and survive with their diagnostic column intact.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ev AS (SELECT vec_id, v FROM e WHERE vec_id % 37 = 0),
    tr AS (
      SELECT vec_id, v FROM e WHERE vec_id % 37 <> 0
      UNION ALL
      SELECT vec_id + 1000000, v FROM ev WHERE vec_id % 74 = 0
    ),
    mx AS (
      SELECT t.vec_id,
             round(max(list_dot_product(t.v, ev.v)
                       / (sqrt(list_dot_product(t.v, t.v))
                          * sqrt(list_dot_product(ev.v, ev.v)))), 6)
               AS max_eval_cos
      FROM tr t, ev GROUP BY 1
    )
    SELECT vec_id, max_eval_cos FROM mx WHERE max_eval_cos < 0.95
    """,
)
def decontaminate_embedding_cos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X83 embedding-space decontamination: drop train vectors within
    cosine 0.95 of ANY eval vector (paraphrase-level leakage the
    n-gram rule misses). Eval side broadcasts; the corpus side's
    |train| x |eval| cosine fan-out collapses map-side (partial max)
    before one id-keyed exchange."""
    from alerta_spark.ops.decontam import decontaminate_embedding

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.where(F.col("vec_id") % 37 == 0)
    planted = ev.where(F.col("vec_id") % 74 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    train = emb.where(F.col("vec_id") % 37 != 0).unionByName(planted)
    out = decontaminate_embedding(
        train.select("vec_id", "embedding"),
        ev.select("vec_id", "embedding"),
        threshold=0.95,
    )
    return out.select("vec_id", "max_eval_cos")


@register("pack_sequences_ffd", oracle=None)  # sequential fold: rows-only
def pack_sequences_ffd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X85 first-fit-decreasing packing (no-split companion to
    pack_sequences): whole docs into 256-token bins per (source,
    shard) stream. Inherently a sequential per-stream fold -> no SQL
    oracle; validity, the 11/9*OPT+1 bound, determinism, and shard
    parallelization are pinned in tests/test_chunking.py."""
    from alerta_spark.ops.chunking import pack_sequences_ffd

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences_ffd(docs, budget=256, shards=2)


@register(
    "dedup_fuzzy_levenshtein",
    # Keys are URL-like slugs (https://<source>/<md5-prefix>) — the
    # high-entropy short-key regime edit-distance joins exist for
    # (the word-soup text's 375-gram vocabulary is the DEGENERATE
    # case where no gram is selective; realistic keys are not). Typo
    # twins planted (doc_id % 20 == 0 -> char 20 replaced by '#',
    # id+10000). The oracle is the ALL-PAIRS definition — proving the
    # q-gram prefix filter output-invisible.
    oracle="""
    WITH base AS (
      SELECT doc_id,
             'https://' || source || '/'
               || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS k
      FROM documents
    ),
    keys AS (
      SELECT doc_id, k FROM base
      UNION ALL
      SELECT doc_id + 10000,
             substring(k, 1, 19) || '#' || substring(k, 21)
      FROM base WHERE doc_id % 20 = 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.k, b.k) AS BIGINT) AS edits
    FROM keys a JOIN keys b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.k, b.k) <= 2
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X85 record-linkage fuzzy join: levenshtein<=2 pairs over short
    URL-like keys via the lossless q-gram prefix filter (rarest
    k*q+1 gram occurrences indexed per key), exact verify only on
    candidate survivors."""
    from alerta_spark.ops.dedupe import fuzzy_pairs_levenshtein

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("/"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
        ).alias("k"),
    )
    twins = base.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(
            F.substring("k", 1, 19), F.lit("#"), F.substring("k", 21, 64)
        ).alias("k"),
    )
    keys = base.unionByName(twins)
    return fuzzy_pairs_levenshtein(keys, key_col="k", max_edits=2)


@register(
    "text_phrase_search",
    # The oracle is the DEFINITION: count token positions p with
    # ts[p]='table' and ts[p+1]='value' — token semantics, so
    # overlapping-substring pitfalls of a LIKE count can't bite.
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents),
    pos AS (
      SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS p
      FROM toks
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM pos WHERE ts[p] = 'table' AND ts[p + 1] = 'value'
    GROUP BY doc_id
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X87 positional phrase search: only query-term token rows leave
    the scan (posting-list probe); consecutiveness checked JVM-side
    over each doc's collected hits."""
    from alerta_spark.ops.text import phrase_search

    docs = load_table(spark, sf_dir, "documents")
    return phrase_search(docs, "table value")


@register(
    "intervals_user_activity",
    # Interval = [ts, ts + floor(value*1e6) us] (value doubles as a
    # duration in seconds): merging needs the RUNNING-MAX-of-ends
    # island test — a long early event swallows later short ones, so
    # a lag-only gap test (plain sessionize) would over-split. floor
    # of the double product is engine-identical; all span arithmetic
    # is exact BIGINT microseconds.
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e
      FROM events
    ),
    flag AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
               OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS is_new
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS island
      FROM flag
    )
    SELECT user_id, island,
           min(s) AS start_us, max(e) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           max(e) - min(s) AS covered_us
    FROM isl GROUP BY user_id, island
    """,
)
def intervals_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X87 per-user interval union over the event lake (value = event
    duration in seconds). One exchange: window + aggregate share the
    user clustering."""
    from alerta_spark.ops.timeseries import merge_intervals

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * 1_000_000).cast("long")
        ).alias("e"),
    )
    return merge_intervals(ev, "s", "e", tiebreak_col="event_id")


@register(
    "trend_ols_daily_value",
    # The regr_slope/regr_intercept surface in bit-reproducible form:
    # built-in regression aggregates stream doubles (partition-order
    # ulp drift), so the six moments accumulate in DECIMAL/BIGINT and
    # cross to DOUBLE once (VARCHAR hop around DuckDB's double-rounding
    # decimal cast); slope/intercept/r2 are fixed expression trees.
    oracle="""
    WITH s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(date_diff('day', DATE '2024-01-01', ts)) AS BIGINT)
               AS sx,
             CAST(sum(CAST(value AS DECIMAL(14,6))) AS DECIMAL(18,6)) AS sy,
             CAST(sum(CAST(date_diff('day', DATE '2024-01-01', ts)
                           AS DECIMAL(6,0))
                      * CAST(value AS DECIMAL(14,6))) AS DECIMAL(24,6))
               AS sxy,
             CAST(sum(date_diff('day', DATE '2024-01-01', ts)
                      * date_diff('day', DATE '2024-01-01', ts)) AS BIGINT)
               AS sxx,
             CAST(sum(CAST(value AS DECIMAL(14,6))
                      * CAST(value AS DECIMAL(14,6))) AS DECIMAL(28,12))
               AS syy
      FROM events GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxy
                   - CAST(sx AS DECIMAL(12,0)) * CAST(sy AS DECIMAL(19,6))
                   AS VARCHAR) AS DOUBLE)
               AS cov_num,
             CAST(n * sxx - sx * sx AS DOUBLE) AS varx_num,
             CAST(CAST(CAST(n AS DECIMAL(8,0)) * syy
                   - CAST(sy AS DECIMAL(19,6)) * CAST(sy AS DECIMAL(19,6))
                   AS VARCHAR) AS DOUBLE) AS vary_num,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
             CAST(sx AS DOUBLE) AS sxd,
             CAST(n AS DOUBLE) AS nd
      FROM s
    )
    SELECT event_type, n,
           CASE WHEN varx_num > 0 THEN cov_num / varx_num END AS slope,
           (syd - (CASE WHEN varx_num > 0 THEN cov_num / varx_num END) * sxd)
             / nd AS intercept,
           CASE WHEN varx_num > 0 AND vary_num > 0
                THEN (cov_num * cov_num) / (varx_num * vary_num) END AS r2
    FROM m ORDER BY event_type
    """,
)
def trend_ols_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X88 per-group trend line: OLS of event value on day index per
    event type — six exact moments in ONE partial+final aggregate (no
    window, no second scan). The drift-direction companion to the
    Pearson entry; slope sign is the 'is this metric degrading' readout
    a monitoring pipeline wants per key at 100 TB."""
    from alerta_spark.ops.stats import ols_trend

    ev = load_table(spark, sf_dir, "events")
    return ols_trend(
        ev,
        ["event_type"],
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")),
        F.col("value"),
    ).orderBy("event_type")


def _hll_oracle() -> str:
    from alerta_spark.ops.sketches import duckdb_hll_sql

    inner = duckdb_hll_sql("user_id", "FROM events", ["event_type"])
    return f"""
    WITH est AS ({inner}),
    ex AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.n_buckets, e.v_zero, e.s_exact,
           e.n_distinct_est, x.n_exact,
           e.n_distinct_est / CAST(x.n_exact AS DOUBLE) AS est_ratio
    FROM est e JOIN ex x ON e.event_type = x.event_type
    ORDER BY e.event_type
    """


@register("sketch_hll_distinct_users", oracle=_hll_oracle())
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X89 portable HyperLogLog: per-type distinct-user estimate whose
    ENTIRE sketch hash-checks — md5 hex-prefix buckets, leading-zero
    ranks, the harmonic sum carried as the exact BIGINT Σ 2^(53-M[j]),
    and a literal-table linear-counting branch (no transcendental is
    ever evaluated by an engine). The mergeable, constant-memory
    distinct-count the DataSketches entry provides, now with the
    register algebra itself under the correctness gate; the exact
    count rides along for the honest error ratio. Merge = register
    max (pinned in tests: shard union == one-shot).
    Reference: the reference re-counts distincts per scan
    (alerta.py:136-146); sketches are the 100 TB replacement."""
    from alerta_spark.ops.sketches import hll_build, hll_estimate

    ev = load_table(spark, sf_dir, "events")
    est = hll_estimate(
        hll_build(ev, "user_id", ["event_type"]), ["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return (
        est.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_buckets",
            "v_zero",
            "s_exact",
            "n_distinct_est",
            "n_exact",
            (F.col("n_distinct_est") / F.col("n_exact").cast("double")).alias(
                "est_ratio"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "dsir_select_target_domain",
    # Mirror of ops/sampling.dsir_select: every probability is a ratio
    # of exact BIGINTs, every ln fixed-point-quantized (floor * 2^20),
    # doc scores pure BIGINT — the whole selection is engine-exact
    # including the top-k cut (ties break on doc_id).
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, (source = 'src0') AS tgt,
             unnest(list_filter({_DUCK_TOKS}, t -> t <> '')) AS term
      FROM documents
    ),
    dt AS (
      SELECT doc_id, tgt, term, CAST(count(*) AS BIGINT) AS n_w
      FROM toks GROUP BY 1, 2, 3
    ),
    st AS (
      SELECT term,
             CAST(sum(CASE WHEN tgt THEN n_w ELSE 0 END) AS BIGINT) AS c_t,
             CAST(sum(CASE WHEN NOT tgt THEN n_w ELSE 0 END) AS BIGINT) AS c_r
      FROM dt GROUP BY term
    ),
    tot AS (
      SELECT CAST(sum(c_t) AS BIGINT) AS t_t,
             CAST(sum(c_r) AS BIGINT) AS t_r,
             CAST(count(*) AS BIGINT) AS v
      FROM st
    ),
    lam AS (
      SELECT term,
             CAST(floor(ln(CAST((c_t + 1) * (t_r + v) AS DOUBLE)
                           / CAST((c_r + 1) * (t_t + v) AS DOUBLE))
                        * 1048576.0) AS BIGINT) AS lam_q
      FROM st CROSS JOIN tot
    )
    SELECT d.doc_id,
           CAST(sum(d.n_w * l.lam_q) AS BIGINT) AS score_q,
           CAST(sum(d.n_w) AS BIGINT) AS n_tokens
    FROM dt d JOIN lam l USING (term)
    WHERE NOT d.tgt
    GROUP BY d.doc_id
    ORDER BY score_q DESC, doc_id LIMIT 50
    """,
)
def dsir_select_target_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X90 DSIR data selection (importance resampling toward a target
    domain): rank the raw pool (source != src0) by unigram importance
    weight toward src0's distribution, keep the top 50. One corpus
    scan; term stats vocab-sized; score arithmetic exact BIGINT."""
    from alerta_spark.ops.sampling import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    return dsir_select(docs, F.col("source") == "src0", k=50)


@register(
    "dedup_containment",
    # The oracle is the DEFINITION (all-pairs position() probe); the
    # Spark side goes through the lossless rare-anchor shingle filter,
    # so a green hash proves the filter output-invisible — the same
    # proof shape as dedup_prefix_jaccard / dedup_fuzzy_levenshtein.
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DUCK_NORM} AS t FROM documents)
    SELECT b.doc_id AS inner_id, a.doc_id AS outer_id,
           CAST(length(b.t) AS BIGINT) AS inner_len,
           CAST(length(a.t) AS BIGINT) AS outer_len
    FROM d a JOIN d b ON a.doc_id <> b.doc_id
    WHERE len(string_split(b.t, ' ')) >= 7
      AND position(b.t IN a.t) > 0
      AND (length(b.t) < length(a.t)
           OR (b.t = a.t AND b.doc_id < a.doc_id))
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X91 substring-containment dedup: docs whose whole (normalized)
    text is embedded in another doc — the quote-inclusion duplicates
    a Jaccard threshold misses when the container is much longer.
    Lossless rarest-interior-shingle probe + exact verify; the
    all-pairs oracle proves no pair is lost."""
    from alerta_spark.ops.dedupe import containment_pairs

    return containment_pairs(load_table(spark, sf_dir, "documents"), n=5)


@register(
    "dedup_semantic_clusters",
    # SemDeDup with the pinned-centroid cell assignment replayed
    # bit-for-bit (exact BIGINT argmax dots, as similarity_ivf_pinned)
    # and exact copies of every 20th vector planted under +1M ids —
    # identical vectors land in identical cells and hit cos 1.0, so
    # the drop set is engine-exact at round-6 cosine.
    oracle="""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    e AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + 1000000, v FROM base WHERE vec_id % 20 = 0
    ),
    idx AS (SELECT unnest(generate_series(1, 64)) AS pos),
    q AS (
      SELECT vec_id, pos, CAST(floor(v[pos] * 1000000.0) AS BIGINT) AS c
      FROM e, idx
    ),
    w AS (
      SELECT cent, pos, wts[pos] AS wv
      FROM (VALUES {C_VALUES}) cw(cent, wts), idx
    ),
    dots AS (
      SELECT vec_id, cent, sum(c * wv) AS d
      FROM q JOIN w USING (pos) GROUP BY vec_id, cent
    ),
    cells AS (
      SELECT vec_id, cent AS cell FROM (
        SELECT vec_id, cent,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cent ASC) AS rn
        FROM dots
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT ca.cell, ca.vec_id AS ka, cb.vec_id AS kb,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      FROM cells ca JOIN cells cb
        ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
      JOIN e a ON ca.vec_id = a.vec_id
      JOIN e b ON cb.vec_id = b.vec_id
    )
    SELECT kb AS drop_id, CAST(min(cell) AS BIGINT) AS cell,
           CAST(min(ka) AS BIGINT) AS keeper_id,
           min_by(cos, ka) AS cos_keeper
    FROM pairs WHERE cos >= 0.95
    GROUP BY kb
    """.replace("{C_VALUES}", _ivf_centroid_values()),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X92 SemDeDup semantic dedup: map-only pinned-centroid cluster
    assignment confines the quadratic cosine verify within cells
    (Σ|cell|² work, √N centroids at scale); a vector is dropped iff a
    lower-id cell-mate has cosine >= 0.95. Exact copies of every 20th
    vector are planted under +1M ids — the paraphrase-leakage regime
    the operator exists for (organic pairs top out ~0.5)."""
    from alerta_spark.ops.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.where(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    return semantic_dedup(emb.unionByName(planted), tau=0.95)


def _zorder_duck_expr(xe: str, ye: str, bits: int = 16) -> str:
    terms = []
    for i, e in enumerate((xe, ye)):
        for b in range(bits):
            # fully parenthesized: DuckDB binds + tighter than <<
            terms.append(f"(((({e}) >> {b}) & 1) << {b * 2 + i})")
    return " + ".join(terms)


@register(
    "layout_zorder_spans",
    # Morton key = exact BIGINT shift/mask interleave, bucket = fixed
    # right-shift of the keyspace (data-independent boundaries); the
    # per-bucket min/max rows ARE the parquet zone maps a writer
    # clustered by z would produce — all-integer, engine-exact.
    oracle=f"""
    WITH q AS (
      SELECT user_id AS x,
             CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts)
                  AS BIGINT) AS y
      FROM events
    ),
    z AS (
      SELECT x, y,
             ({_zorder_duck_expr('x', 'y')}) >> 26 AS bucket
      FROM q
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           min(x) AS min_x, max(x) AS max_x,
           min(y) AS min_y, max(y) AS max_y
    FROM z GROUP BY bucket
    """,
)
def layout_zorder_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X93 Z-order layout: interleave (user_id, minute-offset) bits
    into one Morton key and report per-keyspace-bucket zone-map spans
    — the data-skipping layout (OPTIMIZE ZORDER) for scans selective
    on either column. Key is pure codegen; one aggregate."""
    from alerta_spark.ops.layout import zorder_layout_report

    ev = load_table(spark, sf_dir, "events")
    d = F.unix_micros("ts") - F.unix_micros(
        F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    # exact integer minutes: subtract the remainder first so the /
    # is a ratio of exact multiples (never a fractional double)
    minutes = ((d - d % 60_000_000) / F.lit(60_000_000)).cast("long")
    return zorder_layout_report(ev, F.col("user_id"), minutes)


@register("bpe_encode_corpus", oracle=None)  # greedy merge loop: rows-only
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X94 BPE tokenizer applied at corpus scale: learn 30 merges
    (corpus-once word-freq aggregate, vocab-only JVM merge rounds),
    then encode every document with the Arrow-batched greedy encoder
    (per-batch word cache — each distinct word pays the merge loop
    once per batch). Map-only after the tiny merge-table broadcast.
    Rows-only like bpe_learn_merges (the greedy loop is iterative);
    encode semantics are pinned in tests/test_bpe.py against hand
    computation. Output flattened for the driver canonicalizer."""
    from alerta_spark.ops.bpe import apply_bpe, learn_bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(docs, num_merges=30)
    enc = apply_bpe(docs, merges)
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.md5(F.array_join("bpe_tokens", " ")).alias("tokens_digest"),
    )


@register(
    "privacy_k_anonymity",
    # Pure exact-count arithmetic (the ppm share is an integral div,
    # never a float) — engine-exact by construction.
    oracle="""
    WITH c AS (
      SELECT source, lang,
             CAST(n_chars // 100 AS BIGINT) AS len_bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2, 3
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM documents)
    SELECT source, lang, len_bucket, n,
           CAST((n * 1000000) // tot AS BIGINT) AS share_e6
    FROM c CROSS JOIN t WHERE n < 5
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X95 k-anonymity screen: quasi-identifier combos (source, lang,
    100-char length bucket) with group size < 5 — the re-identifiable
    rows a release policy generalizes or suppresses. One combo-keyed
    aggregate + broadcast total; group cardinality bounded by the
    quasi-identifier domain, not the corpus."""
    from alerta_spark.ops.profile import k_anonymity_report

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", F.expr("n_chars div 100").cast("long").alias("len_bucket")
    )
    return k_anonymity_report(docs, ["source", "lang", "len_bucket"], k=5)


@register(
    "records_golden_user_profile",
    # Definitional oracle: one row_number window per attribute over
    # the rows where that attribute is present. The Spark side folds
    # all attributes into ONE aggregate — a green hash proves the
    # single-exchange struct-max formulation equals the per-attribute
    # window semantics.
    oracle="""
    WITH pk AS (
      SELECT user_id, json_extract_string(props, '$.k') AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    er AS (
      SELECT user_id, value AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'error'
    ),
    ck AS (
      SELECT user_id, epoch_us(ts) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'click'
    ),
    base AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
      FROM events GROUP BY user_id
    )
    SELECT b.user_id, b.n_rows,
           pk.v AS last_purchase_k,
           er.v AS last_error_value,
           ck.v AS last_click_us
    FROM base b
    LEFT JOIN pk ON b.user_id = pk.user_id AND pk.rn = 1
    LEFT JOIN er ON b.user_id = er.user_id AND er.rn = 1
    LEFT JOIN ck ON b.user_id = ck.user_id AND ck.rn = 1
    """,
)
def records_golden_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X96 golden-record survivorship: per-user profile where each
    attribute keeps the value of the latest row that HAS it (attrs
    live on different event types, so every column survives from a
    different row). All attributes resolve in ONE key aggregate —
    one exchange total vs the oracle's window-per-attribute."""
    from alerta_spark.ops.records import golden_record

    ev = load_table(spark, sf_dir, "events")
    return golden_record(
        ev,
        "user_id",
        F.unix_micros("ts"),
        F.col("event_id"),
        {
            "last_purchase_k": F.when(
                F.col("event_type") == "purchase",
                F.get_json_object("props", "$.k"),
            ),
            "last_error_value": F.when(
                F.col("event_type") == "error", F.col("value")
            ),
            "last_click_us": F.when(
                F.col("event_type") == "click", F.unix_micros("ts")
            ),
        },
    )


@register(
    "embedding_int8_quant_report",
    # Codes and reconstructions are identical IEEE expression trees on
    # both engines; the error aggregate is fixed-point BIGINT (float
    # sums would drift with partition order), one double crossing for
    # the mean.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    idx AS (SELECT unnest(generate_series(1, 64)) AS pos),
    comp AS (SELECT vec_id, pos, v[pos] AS x FROM e, idx),
    st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM comp GROUP BY pos),
    enc AS (
      SELECT c.pos, st.mn, st.mx,
             CAST(floor(abs(c.x - (st.mn + (least(floor((c.x - st.mn) * 254.0
                                 / (st.mx - st.mn)), 253.0) + 0.5)
                           * ((st.mx - st.mn) / 254.0))) * 1048576.0)
                  AS BIGINT) AS eq
      FROM comp c JOIN st USING (pos)
    )
    SELECT pos, round(min(mn), 6) AS min_x, round(min(mx), 6) AS max_x,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(eq) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 1048576.0) AS mean_abs_err,
           CAST(max(eq) AS BIGINT) AS max_err_q
    FROM enc GROUP BY pos
    """,
)
def embedding_int8_quant_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X97 int8 embedding quantization audit: per-dimension min/max
    scale, mean/max reconstruction error — the 4x-memory ANN-index cut
    measured engine-exactly (errors fixed-point-quantized before the
    sum). Per-dim stats broadcast onto a map-only encode; output is 64
    rows regardless of corpus size."""
    from alerta_spark.ops.similarity import int8_quantization_report

    return int8_quantization_report(load_table(spark, sf_dir, "embeddings"))


def _hll_daily_oracle() -> str:
    from alerta_spark.ops.sketches import duckdb_hll_sql

    inner = duckdb_hll_sql(
        "user_id",
        "FROM (SELECT CAST(ts AS DATE) AS day, event_type, user_id FROM events)",
        ["day", "event_type"],
    )
    return f"""
    WITH est AS ({inner}),
    ex AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY 1, 2
    )
    SELECT e.day, e.event_type, e.v_zero, e.s_exact,
           e.n_distinct_est, x.n_exact
    FROM est e JOIN ex x
      ON e.day = x.day AND e.event_type = x.event_type
    """


@register("rollup_distinct_daily_hll_portable", oracle=_hll_daily_oracle())
def rollup_distinct_daily_hll_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X89b the sketch-powered incremental distinct rollup, fully
    under the gate: per-(day, event_type) portable-HLL registers +
    estimates, with the exact distinct count riding along. Where
    agg_distinct_users_daily_hll (DataSketches) is rows-only by
    necessity, every register and estimate here hash-checks; since
    merge = register max (pinned in tests), per-micro-batch partials
    maintain this rollup O(delta) — the mergeable-store algebra of
    X28/X63 applied to COUNT DISTINCT."""
    from alerta_spark.ops.sketches import hll_build, hll_estimate

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type", "user_id"
    )
    est = hll_estimate(
        hll_build(ev, "user_id", ["day", "event_type"]),
        ["day", "event_type"],
    )
    exact = ev.groupBy("day", "event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return est.join(exact, ["day", "event_type"]).select(
        "day", "event_type", "v_zero", "s_exact", "n_distinct_est", "n_exact"
    )


def _kmeans_oracle(k: int = 8, iters: int = 2) -> str:
    rounds = []
    prev = "c0"
    for i in range(1, iters + 1):
        rounds.append(f"""
    d{i} AS (
      SELECT q.vec_id, c.cent,
             sum((q.xq - c.cq) * (q.xq - c.cq)) AS dist
      FROM q JOIN {prev} c USING (pos) GROUP BY 1, 2
    ),
    a{i} AS (
      SELECT vec_id, cent AS cluster, dist FROM (
        SELECT vec_id, cent, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cent ASC) AS rn
        FROM d{i}
      ) WHERE rn = 1
    ),
    c{i} AS (
      SELECT a.cluster AS cent, q.pos,
             CAST(sum(q.xq) // count(*) AS BIGINT) AS cq
      FROM a{i} a JOIN q ON a.vec_id = q.vec_id GROUP BY 1, 2
    )""")
        prev = f"c{i}"
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    idx AS (SELECT unnest(generate_series(1, 64)) AS pos),
    q AS (
      SELECT vec_id, pos, CAST(floor(v[pos] * 1048576.0) AS BIGINT) AS xq
      FROM e, idx
    ),
    seed AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cent
      FROM (SELECT DISTINCT vec_id FROM q ORDER BY vec_id LIMIT {k})
    ),
    c0 AS (
      SELECT s.cent, q.pos, q.xq AS cq
      FROM seed s JOIN q ON s.vec_id = q.vec_id
    ),{",".join(rounds)},
    dig AS (
      SELECT cent, md5(string_agg(CAST(cq AS VARCHAR), ',' ORDER BY pos))
               AS centroid_digest
      FROM c{iters} GROUP BY cent
    )
    SELECT a.cluster, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(a.dist) AS BIGINT) AS inertia_q,
           min(g.centroid_digest) AS centroid_digest
    FROM a{iters} a JOIN dig g ON a.cluster = g.cent
    GROUP BY a.cluster
    """


@register("clustering_kmeans_pinned", oracle=_kmeans_oracle())
def clustering_kmeans_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X98 engine-exact k-means: 2 Lloyd rounds in fixed-point BIGINT
    arithmetic (quantize once, exact integer distances, floor-div
    centroid means, lowest-index tie-break) — iterative ML training
    whose every centroid component hash-checks against a SQL replay.
    Per iteration: map-only assignment (k x dim literal expressions,
    no shuffle) + ONE (cluster, dim) aggregate; k x dim centroids
    collect to the driver between rounds (the bounded-state iterative
    pattern, cf. PageRank)."""
    from alerta_spark.ops.cluster import kmeans_pinned

    return kmeans_pinned(
        load_table(spark, sf_dir, "embeddings"), k=8, iters=2
    )


@register(
    "trend_ewma_daily_value",
    # EWMA(α=1/2) linearized to an exact integer prefix sum:
    # M_t = M_{t-1} + x_t*2^(t-2) = 2^(t-1)*ewma_t — the one decay
    # for which the classic non-associative float fold becomes
    # order-free BIGINT arithmetic; one IEEE division at the end.
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT)
               AS x_cents
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, day, x_cents,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS rn
      FROM d
    ),
    m AS (
      SELECT event_type, day, x_cents, rn,
             sum(CASE WHEN rn = 1 THEN x_cents
                      ELSE x_cents * (CAST(1 AS BIGINT) << CAST(rn - 2 AS INT))
                 END)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS mm
      FROM r
    )
    SELECT event_type, day, x_cents, rn,
           CAST(mm AS DOUBLE)
             / CAST(CAST(1 AS BIGINT) << CAST(rn - 1 AS INT) AS DOUBLE)
             AS ewma
    FROM m
    """,
)
def trend_ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X99 exact EWMA smoothing of daily value totals per event type
    (α=1/2): the recursive float fold rewritten as one exact-BIGINT
    running window sum + one final division — reproducible across
    engines, retries, and partitionings. One key exchange."""
    from alerta_spark.ops.timeseries import ewma_binary

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(14,2)")) * 100)
        .cast("long")
        .alias("x_cents")
    )
    return ewma_binary(daily, ["event_type"], "day", "x_cents")


@register(
    "sketch_histogram_quantiles",
    # All-integer sketch (bucket counts, ceil-rank thresholds, bucket
    # edges) + the definitional k-th-smallest exact companion; err_q
    # is bounded by one bucket width (128 cents) by construction.
    oracle="""
    WITH v AS (
      SELECT event_id,
             CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS vq
      FROM events
    ),
    h AS (
      SELECT vq >> 7 AS bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    probes AS (
      SELECT q_pct, CAST(((q_pct * n) + 99) // 100 AS BIGINT) AS rank_k
      FROM (SELECT unnest([50, 90, 99]) AS q_pct) q CROSS JOIN t
    ),
    cum AS (
      SELECT bucket, cnt,
             sum(cnt) OVER (ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM h
    ),
    est AS (
      SELECT p.q_pct, p.rank_k, min(c.bucket) AS b
      FROM cum c JOIN probes p ON c.cum >= p.rank_k
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT vq, row_number() OVER (ORDER BY vq, event_id) AS rn FROM v
    )
    SELECT e.q_pct, e.rank_k,
           CAST(((e.b + 1) << 7) - 1 AS BIGINT) AS est_q,
           r.vq AS exact_q,
           CAST(((e.b + 1) << 7) - 1 - r.vq AS BIGINT) AS err_q
    FROM est e JOIN ranked r ON r.rn = e.rank_k
    """,
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X100 histogram quantile sketch + sketch-guided exact refine:
    p50/p90/p99 of event value (cents) from a constant-size, shard-
    mergeable (sum-by-bucket) histogram — estimate error hard-bounded
    by one bucket width — then the EXACT k-th smallest recovered by
    sorting ONLY the one bucket the sketch points at (rank offset =
    cumulative count below it): the 100 TB exact-quantile pattern, no
    global sort anywhere. Completes the mergeable-sketch family
    (CMS frequency / Bloom membership / HLL distinct / histogram
    quantile)."""
    from alerta_spark.ops.sketches import histogram_build, histogram_quantiles

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        (F.col("value").cast("decimal(14,2)") * 100).cast("long").alias("vq"),
    )
    hist = histogram_build(v, "vq", shift=7).persist()
    est = histogram_quantiles(hist, [50, 90, 99], shift=7).withColumn(
        "_b", F.expr("(est_q + 1 - (1 << 7)) >> 7")
    )
    below = hist.alias("h").join(
        F.broadcast(est.alias("e")), F.col("h.bucket") < F.col("e._b")
    ).groupBy("q_pct").agg(F.sum("cnt").cast("long").alias("_below"))
    probes = est.join(below, "q_pct", "left").select(
        "q_pct",
        "rank_k",
        "est_q",
        "_b",
        F.coalesce("_below", F.lit(0)).cast("long").alias("_below"),
    )
    in_bucket = v.join(
        F.broadcast(probes),
        F.shiftright(F.col("vq"), 7) == F.col("_b"),
    )
    w = W.partitionBy("q_pct").orderBy("vq", "event_id")
    exact = (
        in_bucket.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == F.col("rank_k") - F.col("_below"))
        .select("q_pct", "rank_k", "est_q", F.col("vq").alias("exact_q"))
    )
    return exact.select(
        "q_pct",
        "rank_k",
        "est_q",
        "exact_q",
        (F.col("est_q") - F.col("exact_q")).cast("long").alias("err_q"),
    )


@register(
    "pipeline_entity_resolution",
    # The record-linkage capstone: X85's all-pairs fuzzy-match
    # definition -> recursive-CTE transitive closure (dedup_clusters'
    # oracle shape) -> per-attribute latest-non-null survivorship
    # (X96's definitional windows). Twins arrive "later" (higher
    # ingest id) with a typo key and NO lang — the golden record must
    # take the key from the newest member and the lang from the
    # oldest, which only a per-attribute pick gets right.
    oracle="""
    WITH RECURSIVE base AS (
      SELECT doc_id,
             'https://' || source || '/'
               || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS k,
             lang
      FROM documents
    ),
    recs AS (
      SELECT doc_id, k, lang FROM base
      UNION ALL
      SELECT doc_id + 10000,
             substring(k, 1, 19) || '#' || substring(k, 21),
             CAST(NULL AS VARCHAR)
      FROM base WHERE doc_id % 20 = 0
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM recs a JOIN recs b ON a.doc_id < b.doc_id
      WHERE levenshtein(a.k, b.k) <= 2
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    m AS (
      SELECT r.doc_id, coalesce(c.cluster_id, r.doc_id) AS cluster_id,
             r.k, r.lang
      FROM recs r LEFT JOIN comp c ON r.doc_id = c.doc_id
    ),
    kk AS (
      SELECT cluster_id, k,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY doc_id DESC) AS rn
      FROM m WHERE k IS NOT NULL
    ),
    ll AS (
      SELECT cluster_id, lang,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY doc_id DESC) AS rn
      FROM m WHERE lang IS NOT NULL
    ),
    g AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_rows
      FROM m GROUP BY cluster_id
    )
    SELECT g.cluster_id, g.n_rows, kk.k AS key_latest,
           ll.lang AS lang_surviving
    FROM g
    LEFT JOIN kk ON g.cluster_id = kk.cluster_id AND kk.rn = 1
    LEFT JOIN ll ON g.cluster_id = ll.cluster_id AND ll.rn = 1
    """,
)
def pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X101 entity-resolution capstone: fuzzy edit-distance matching
    (lossless q-gram filter) -> transitive dup clusters (min-label
    propagation) -> golden-record survivorship per entity, all inside
    one composed plan. Late-arriving typo twins carry no lang: the
    golden record takes the NEWEST key but the OLDEST (only) lang —
    per-attribute survivorship in ONE key aggregate (X96)."""
    from alerta_spark.ops.dedupe import dup_clusters, fuzzy_pairs_levenshtein
    from alerta_spark.ops.records import golden_record

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("/"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
        ).alias("k"),
        "lang",
    )
    twins = base.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(
            F.substring("k", 1, 19), F.lit("#"), F.substring("k", 21, 64)
        ).alias("k"),
        F.lit(None).cast("string").alias("lang"),
    )
    recs = base.unionByName(twins)
    pairs = fuzzy_pairs_levenshtein(recs, key_col="k", max_edits=2)
    clusters = dup_clusters(pairs.select("id_a", "id_b"))
    member = recs.join(clusters, "doc_id", "left").select(
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        "doc_id",
        "k",
        "lang",
    )
    return golden_record(
        member,
        "cluster_id",
        F.col("doc_id"),
        F.col("doc_id"),
        {"key_latest": F.col("k"), "lang_surviving": F.col("lang")},
    )


@register(
    "anomaly_seasonal_residual",
    # Dense grid (generate_series per key span) + one lag window; all
    # exact BIGINT cents — the top-20 cut is on integers.
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts)
                  AS BIGINT) AS hour_idx,
             CAST(sum(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT)
               AS x_cents
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT event_type, min(hour_idx) AS h0, max(hour_idx) AS h1
      FROM h GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1)) AS hour_idx
      FROM span
    ),
    dense AS (
      SELECT g.event_type, g.hour_idx,
             coalesce(h.x_cents, 0) AS x_q
      FROM grid g LEFT JOIN h
        ON g.event_type = h.event_type AND g.hour_idx = h.hour_idx
    ),
    lagged AS (
      SELECT event_type, hour_idx, x_q,
             lag(x_q, 168) OVER (PARTITION BY event_type
                                 ORDER BY hour_idx) AS baseline_q
      FROM dense
    )
    SELECT event_type, hour_idx, x_q, baseline_q,
           CAST(x_q - baseline_q AS BIGINT) AS resid_q
    FROM lagged WHERE baseline_q IS NOT NULL
    ORDER BY abs(x_q - baseline_q) DESC, event_type, hour_idx
    LIMIT 20
    """,
)
def anomaly_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X102 seasonal-naive anomaly screen: hourly value totals vs the
    same hour LAST WEEK on a zero-filled dense grid (an outage hour
    must surface, not slide past a sparse lag); top-20 |residual|
    via TakeOrdered on exact integers."""
    from alerta_spark.ops.timeseries import seasonal_residual

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (
            (
                F.unix_micros("ts")
                - F.unix_micros(
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                )
            )
            / F.lit(3_600_000_000)
        )
        .cast("long")
        .alias("hour_idx"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(14,2)")) * 100)
        .cast("long")
        .alias("x_cents")
    )
    res = seasonal_residual(hourly, ["event_type"], "hour_idx", "x_cents")
    return res.orderBy(
        F.abs("resid_q").desc(), "event_type", "hour_idx"
    ).limit(20)


@register(
    "streak_longest_daily_activity",
    # Classic gaps-and-islands on the integer day index: within a
    # user's DISTINCT active days, day - row_number is constant per
    # consecutive run. All integers.
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day
      FROM events
    ),
    r AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
      FROM d
    ),
    runs AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
             min(day) AS start_day
      FROM r GROUP BY user_id, grp
    ),
    best AS (SELECT user_id, max(len) AS longest FROM runs GROUP BY user_id)
    SELECT r.user_id,
           CAST(b.longest AS BIGINT) AS longest_streak,
           CAST(min(CASE WHEN r.len = b.longest THEN r.start_day END)
                AS BIGINT) AS streak_start_day,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(sum(r.len) AS BIGINT) AS n_active_days
    FROM runs r JOIN best b USING (user_id)
    GROUP BY r.user_id, b.longest
    """,
)
def streak_longest_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X103 longest consecutive-day activity streak per user —
    gaps-and-islands via the day-minus-rank constant. Distinct-day
    frame first (bounded at days-per-user), then window + two
    aggregates under ONE user-keyed exchange. Earliest longest run
    wins the start-day tie."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("day"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    runs = (
        d.withColumn("grp", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("len"),
            F.min("day").alias("start_day"),
        )
    )
    runs = runs.withColumn(
        "longest", F.max("len").over(W.partitionBy("user_id"))
    )
    return runs.groupBy("user_id", "longest").agg(
        F.min(
            F.when(F.col("len") == F.col("longest"), F.col("start_day"))
        ).cast("long").alias("streak_start_day"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.sum("len").cast("long").alias("n_active_days"),
    ).select(
        "user_id",
        F.col("longest").cast("long").alias("longest_streak"),
        "streak_start_day",
        "n_runs",
        "n_active_days",
    )


@register(
    "users_rfm_scores",
    # Quintile scores via ntile over a UNIQUE total order (metric,
    # user_id) — both engines place ties identically because the order
    # is total; R/F/M base metrics are exact integers.
    oracle="""
    WITH m AS (
      SELECT user_id,
             CAST(max(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)))
                  AS BIGINT) AS last_day,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT)
               AS monetary_cents
      FROM events GROUP BY user_id
    )
    SELECT user_id, last_day, frequency, monetary_cents,
           CAST(ntile(5) OVER (ORDER BY last_day DESC, user_id)
                AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
                AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, user_id)
                AS BIGINT) AS m_score
    FROM m
    """,
)
def users_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X104 RFM segmentation: recency/frequency/monetary per user +
    quintile scores (1 = best). One fact aggregate to a user-sized
    frame; the three ntile windows run over that SMALL frame only
    (deliberate: ntile needs a total order — never rank the fact
    table). Ties impossible (user_id in the order)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.max(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
        ).cast("long").alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        (F.sum(F.col("value").cast("decimal(14,2)")) * 100)
        .cast("long")
        .alias("monetary_cents"),
    )
    one = F.pmod(F.col("user_id"), F.lit(1))
    return m.select(
        "user_id",
        "last_day",
        "frequency",
        "monetary_cents",
        F.ntile(5)
        .over(W.partitionBy(one).orderBy(F.desc("last_day"), F.asc("user_id")))
        .cast("long")
        .alias("r_score"),
        F.ntile(5)
        .over(
            W.partitionBy(one).orderBy(F.desc("frequency"), F.asc("user_id"))
        )
        .cast("long")
        .alias("f_score"),
        F.ntile(5)
        .over(
            W.partitionBy(one).orderBy(
                F.desc("monetary_cents"), F.asc("user_id")
            )
        )
        .cast("long")
        .alias("m_score"),
    )


@register(
    "events_markov_transitions",
    # Transition probabilities = one IEEE division of exact counts;
    # pair construction via lead() under a (ts, event_id) total order.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS src, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_src FROM t GROUP BY src)
    SELECT t.src, t.dst, t.n, tot.n_src,
           CAST(t.n AS DOUBLE) / CAST(tot.n_src AS DOUBLE) AS p
    FROM t JOIN tot USING (src)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X105 first-order Markov transition matrix over per-user event
    sequences: P(next | current) from exact counts — the model behind
    the PageRank entry's edge weights and the journeys entry's paths.
    One user-keyed window + one (src, dst) aggregate; the output is
    |event types|^2 rows regardless of volume."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = t.groupBy("src").agg(F.sum("n").cast("long").alias("n_src"))
    return t.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        "n",
        "n_src",
        (F.col("n").cast("double") / F.col("n_src").cast("double")).alias("p"),
    )


@register(
    "pareto_customer_revenue",
    # Cumulative-share cutoff on exact DECIMAL revenue: the 80% line
    # is found by comparing exact cumulative cents against an exact
    # 80%-of-total threshold (cum*5 >= total*4 — integer cross-
    # multiplication, no float). Shares cross to DOUBLE once.
    oracle="""
    WITH r AS (
      SELECT o.o_custkey AS custkey,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(20,2))))
                  AS DECIMAL(24,4)) AS rev
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1
    ),
    ranked AS (
      SELECT custkey, rev,
             CAST(row_number() OVER (ORDER BY rev DESC, custkey)
                  AS BIGINT) AS rnk,
             CAST(sum(rev) OVER (ORDER BY rev DESC, custkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS DECIMAL(30,4)) AS cum
      FROM r
    ),
    tot AS (
      SELECT CAST(sum(rev) AS DECIMAL(30,4)) AS total,
             CAST(count(*) AS BIGINT) AS n_cust
      FROM r
    )
    SELECT CAST(min(rnk) AS BIGINT) AS n_top_customers,
           CAST(min(rnk) AS DOUBLE) / CAST(max(t.n_cust) AS DOUBLE)
             AS customer_share,
           max(t.n_cust) AS n_customers
    FROM ranked, tot t
    WHERE cum * 5 >= t.total * 4
    """,
)
def pareto_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X106 Pareto concentration: the smallest top-revenue customer
    set covering >= 80% of revenue. Fact aggregate first (customer-
    sized frame), then the global rank + running sum via the
    distributed two-phase prefix sum (ops/prefix.py) — range shuffle,
    per-partition cumsum, broadcast offsets — so no single-partition
    window ever sees the customer frame; the 80% cutoff is exact
    integer cross-multiplication on DECIMAL cents — no float
    compare."""
    from alerta_spark.ops.prefix import global_rank_cumsum

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    r = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(20,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(20,2)"))
            ).cast("decimal(24,4)").alias("rev")
        )
    )
    ranked = global_rank_cumsum(
        r, [F.desc("rev"), F.asc("custkey")], "rev"
    ).select(
        "custkey",
        "rev",
        F.col("rnk").cast("long").alias("rnk"),
        F.col("cum").cast("decimal(30,4)").alias("cum"),
    )
    tot = r.agg(
        F.sum("rev").cast("decimal(30,4)").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_cust"),
    )
    hit = ranked.crossJoin(F.broadcast(tot)).where(
        F.col("cum") * 5 >= F.col("total") * 4
    )
    return hit.agg(
        F.min("rnk").cast("long").alias("n_top_customers"),
        (
            F.min("rnk").cast("double") / F.max("n_cust").cast("double")
        ).alias("customer_share"),
        F.max("n_cust").alias("n_customers"),
    )


def _pq_codebook_values() -> str:
    from alerta_spark.ops.similarity import pinned_pq_codebooks

    return ",\n      ".join(
        "({}, {}, [{}])".format(s, c, ", ".join(str(w) for w in wts))
        for s, codes in enumerate(pinned_pq_codebooks())
        for c, wts in enumerate(codes)
    )


@register(
    "similarity_pq_pinned",
    # PQ with pinned integer codebooks: encode (per-subspace argmin of
    # exact integer L2, ties -> lowest code), per-query ADC lookup
    # tables, candidate scores, and the top-k cut replayed bit-for-bit
    # — the production entry (driver-trained float codebooks) stays
    # rows-only; this hash-checks everything downstream of training.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p64 AS (SELECT unnest(generate_series(1, 64)) AS pos),
    q AS (
      SELECT vec_id, pos, CAST(floor(v[pos] * 1000000.0) AS BIGINT) AS xq
      FROM e, p64
    ),
    cb AS (SELECT sub, code, wts FROM (VALUES {CB_VALUES}) x(sub, code, wts)),
    d AS (
      SELECT q.vec_id, cb.sub, cb.code,
             sum((q.xq - cb.wts[q.pos - cb.sub * 8])
                 * (q.xq - cb.wts[q.pos - cb.sub * 8])) AS dist
      FROM q JOIN cb ON cb.sub = (q.pos - 1) // 8
      GROUP BY 1, 2, 3
    ),
    codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist ASC, code ASC) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    score AS (
      SELECT d.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(sum(d.dist) AS BIGINT) AS pq_dist_q
      FROM codes c JOIN d ON d.sub = c.sub AND d.code = c.code
      WHERE d.vec_id IN (0, 1, 2, 3, 4) AND c.vec_id != d.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, pq_dist_q FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY pq_dist_q ASC,
                                            neighbor_id ASC) AS rn
      FROM score
    ) WHERE rn <= 10
    """.replace("{CB_VALUES}", _pq_codebook_values()),
)
def similarity_pq_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X107 PQ ANN with pinned integer codebooks: map-only exact
    BIGINT encode (the 8-byte code row is all the candidate scan
    ships — the ~32x PQ footprint cut), broadcast query LUTs, n_sub
    integer lookups per score, TakeOrdered top-10 — hash-checked end
    to end. Completes the verified-ANN family: brute-force (exact),
    IVF (pinned), PQ (pinned); the float-trained production paths
    keep their recall pytests."""
    from alerta_spark.ops.similarity import pq_topk_pinned

    return pq_topk_pinned(
        load_table(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=10
    )


@register(
    "meta_alert_storm",
    # Alert-on-alerts: level-1 threshold triggers (the engine's own
    # semantics) re-aggregated by day — a second-order rule detecting
    # alert storms. Pure exact counts at both levels.
    oracle="""
    WITH l1 AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      WHERE event_type = 'error'
      GROUP BY 1, 2
      HAVING count(*) >= 3
    )
    SELECT day, CAST(count(*) AS BIGINT) AS n_alerts,
           CAST(sum(n) AS BIGINT) AS n_events_involved,
           count(*) >= 5 AS is_storm
    FROM l1 GROUP BY day
    """,
)
def meta_alert_storm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X108 meta-alerting: the engine's threshold semantics applied to
    its OWN alert output — per-day count of level-1 error-burst
    triggers, flagged as a storm when >= 5 users trip the same day
    (the 'noisy rule / incident day' detector an on-call team tunes
    thresholds with). Two exact aggregates, one plan."""
    ev = load_table(spark, sf_dir, "events")
    l1 = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") >= 3)
    )
    return l1.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_alerts"),
        F.sum("n").cast("long").alias("n_events_involved"),
        (F.count(F.lit(1)) >= 5).alias("is_storm"),
    )


@register(
    "scd2_point_in_time_join",
    # The warehouse PIT join: each purchase fact picks the SCD2 state
    # version valid AT its timestamp. Oracle = definitional
    # greatest-valid_from-per-fact; the Spark side is the union-window
    # as-of (ONE user exchange, no range-join fan-out) — a green hash
    # proves the as-of formulation equals the interval predicate.
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS t,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    marked AS (
      SELECT user_id, event_type, t,
             CAST(sum(CASE WHEN prev_type IS NULL
                             OR prev_type <> event_type THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
      FROM o
    ),
    versions AS (
      SELECT user_id, island AS version, any_value(event_type) AS state,
             min(t) AS valid_from_us
      FROM marked GROUP BY user_id, island
    ),
    facts AS (
      SELECT event_id, user_id, epoch_us(ts) AS t
      FROM events WHERE event_type = 'purchase'
    )
    SELECT event_id, user_id, t AS ts_us, version, state AS state_at_fact
    FROM (
      SELECT f.event_id, f.user_id, f.t, v.version, v.state,
             row_number() OVER (PARTITION BY f.event_id
                                ORDER BY v.valid_from_us DESC,
                                         v.version DESC) AS rn
      FROM facts f JOIN versions v
        ON f.user_id = v.user_id AND v.valid_from_us <= f.t
    ) WHERE rn = 1
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X109 SCD2 point-in-time join: purchase facts joined to the
    user-state version valid at fact time — the SCD2 build (X70)
    composed with the union-window as-of join, so the whole PIT
    lookup costs ONE user-keyed exchange instead of an interval range
    join. At 100 TB this is THE dimension-lookup pattern for
    versioned dims."""
    from alerta_spark.operators.asof import as_of_join

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    marked = o.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type")),
                1,
            ).otherwise(0)
        ).over(
            W.partitionBy("user_id")
            .orderBy("t")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("long"),
    )
    versions = marked.groupBy("user_id", F.col("island").alias("version")).agg(
        F.any_value("event_type").alias("state"),
        F.min("t").alias("valid_from_us"),
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    joined = as_of_join(
        facts,
        versions.select("user_id", "valid_from_us", "version", "state"),
        on="user_id",
        left_ts="ts_us",
        right_ts="valid_from_us",
        right_cols=["version", "state"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        "version",
        F.col("state").alias("state_at_fact"),
    )


@register(
    "corpus_token_weighted_median_length",
    # Weighted median: the doc length at which cumulative TOKEN mass
    # first reaches half the total — exact integer cumsum + cross-
    # multiplied threshold (cum*2 >= total), no float compare.
    oracle="""
    WITH d AS (
      SELECT n_chars,
             CAST(sum(len(list_filter(string_split(
                    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                    t -> t <> ''))) AS BIGINT) AS toks
      FROM documents GROUP BY n_chars
    ),
    c AS (
      SELECT n_chars, toks,
             CAST(sum(toks) OVER (ORDER BY n_chars
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT) AS cum
      FROM d
    ),
    t AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM d)
    SELECT CAST(min(n_chars) AS BIGINT) AS weighted_median_len,
           max(t.total) AS total_tokens
    FROM c, t WHERE cum * 2 >= t.total
    """,
)
def corpus_token_weighted_median_length(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X110 token-weighted median document length: the length below
    which half the corpus's TOKEN MASS lives (the number that decides
    chunking budgets — an unweighted median over-weights short docs).
    Length-keyed aggregate (domain-bounded frame), single-partition
    cumsum over it (column-derived constant key), exact integer
    cross-multiplied threshold."""
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    d = docs.groupBy("n_chars").agg(
        F.sum(
            F.size(F.filter(tokenize(F.col("text")), lambda t: t != F.lit("")))
        ).cast("long").alias("toks")
    )
    one = F.pmod(F.col("n_chars"), F.lit(1))
    c = d.withColumn(
        "cum",
        F.sum("toks").over(
            W.partitionBy(one)
            .orderBy("n_chars")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("long"),
    )
    tot = d.agg(F.sum("toks").cast("long").alias("total"))
    return (
        c.crossJoin(F.broadcast(tot))
        .where(F.col("cum") * 2 >= F.col("total"))
        .agg(
            F.min("n_chars").cast("long").alias("weighted_median_len"),
            F.max("total").alias("total_tokens"),
        )
    )


@register(
    "olap_share_of_parent",
    # Percent-of-parent: nation revenue as a share of its region's —
    # two exact-decimal aggregates + one broadcast join + one IEEE
    # division (VARCHAR hop for DuckDB's decimal->double cast).
    oracle="""
    WITH nat AS (
      SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(20,2))))
                  AS DECIMAL(24,4)) AS rev
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    reg AS (
      SELECT regionkey, CAST(sum(rev) AS DECIMAL(30,4)) AS region_rev
      FROM nat GROUP BY regionkey
    )
    SELECT r.r_name AS region, n.nation,
           CAST(CAST(n.rev AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(CAST(n.rev AS VARCHAR) AS DOUBLE)
             / CAST(CAST(g.region_rev AS VARCHAR) AS DOUBLE)
             AS share_of_region
    FROM nat n
    JOIN reg g ON n.regionkey = g.regionkey
    JOIN region r ON n.regionkey = r.r_regionkey
    """,
)
def olap_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X111 percent-of-parent hierarchy report: nation revenue and its
    share of the region total. Child aggregate once; the parent level
    re-aggregates the CHILD frame (25 rows), never the facts —
    percent-of-parent must not rescan the lake."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("regionkey"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(20,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(20,2)"))
            ).cast("decimal(24,4)").alias("rev")
        )
    )
    reg = nat.groupBy("regionkey").agg(
        F.sum("rev").cast("decimal(30,4)").alias("region_rev")
    )
    return (
        nat.join(F.broadcast(reg), "regionkey")
        .join(
            F.broadcast(r.select("r_regionkey", "r_name")),
            F.col("regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            "nation",
            F.col("rev").cast("double").alias("revenue"),
            (
                F.col("rev").cast("double")
                / F.col("region_rev").cast("double")
            ).alias("share_of_region"),
        )
    )


@register(
    "similarity_filtered_topk",
    # Filtered ANN: the metadata predicate applies BEFORE scoring, so
    # the scan only pays cosine for rows that can qualify (post-filter
    # ANN over-fetches or starves — pre-filter is the correct corpus-
    # side composition and Catalyst pushes it into the parquet scan).
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
    c AS (SELECT vec_id, v FROM e WHERE label = 3),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
      FROM q JOIN c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 10
    """,
)
def similarity_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X114 filtered ANN: top-10 cosine neighbors restricted to a
    metadata predicate (label = 3) — the retrieval-with-ACL/tenant
    filter every production vector search needs. The filter lands in
    the parquet scan (pushdown), queries broadcast, and only
    qualifying rows pay the dot product."""
    from alerta_spark.ops.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("label") == 3)
    q = emb.where(F.col("vec_id").isin([0, 1, 2, 3, 4])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    from alerta_spark.ops.similarity import cosine

    joined = corpus.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .drop("rn")
    )


@register(
    "audience_bitmap_intersections",
    # Per-segment user bitmaps: word = user_id >> 6, bit = user_id &
    # 63; segment build = bit_or per word (mergeable, O(1) store);
    # every pairwise intersection is bit_count(a AND b) summed over
    # words — exact integers end to end, and the bitmaps are reusable
    # precomputed state (the Venn entry re-scans users per query).
    oracle="""
    WITH b AS (
      SELECT event_type, user_id // 60 AS word,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(user_id % 60 AS INT))
                  AS BIGINT) AS bits
      FROM (SELECT DISTINCT event_type, user_id FROM events)
      GROUP BY 1, 2
    )
    SELECT a.event_type AS seg_a, c.event_type AS seg_b,
           CAST(sum(bit_count(a.bits & c.bits)) AS BIGINT) AS n_both,
           CAST(sum(bit_count(a.bits)) AS BIGINT) AS n_a_in_shared_words
    FROM b a JOIN b c
      ON a.word = c.word AND a.event_type < c.event_type
    GROUP BY 1, 2
    """,
)
def audience_bitmap_intersections(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X115 bitmap-index audience intersections: per-segment user
    bitmaps (60 users per BIGINT word — signed-shift-safe on every
    engine, the bloom_build packing — bit_or-mergeable; the roaring-
    bitmap idea on plain columns) make every pairwise audience overlap
    a popcount over AND-ed words. Build once, intersect in O(words);
    the distinct-first projection bounds the build at |users|x|types|.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    b = d.select(
        "event_type",
        F.expr("user_id div 60").alias("word"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 60 AS INT))"
        ).alias("_m"),
    ).groupBy("event_type", "word").agg(F.bit_or("_m").alias("bits"))
    a = b.select(
        F.col("event_type").alias("seg_a"),
        "word",
        F.col("bits").alias("ba"),
    )
    c = b.select(
        F.col("event_type").alias("seg_b"),
        "word",
        F.col("bits").alias("bb"),
    )
    j = a.join(c, "word").where(F.col("seg_a") < F.col("seg_b"))
    return j.groupBy("seg_a", "seg_b").agg(
        F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb"))))
        .cast("long")
        .alias("n_both"),
        F.sum(F.bit_count("ba")).cast("long").alias("n_a_in_shared_words"),
    )


@register(
    "rule_tuning_suggested_thresholds",
    # Data-driven rule thresholds: exact p95/p99 of the per-(user,day)
    # match count distribution per event type — Spark percentile and
    # DuckDB quantile_cont interpolate identically (lo + (hi-lo)*f on
    # identical exact-integer inputs).
    oracle="""
    WITH m AS (
      SELECT event_type, user_id, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_user_days,
           quantile_cont(n, 0.95) AS p95_daily_matches,
           quantile_cont(n, 0.99) AS p99_daily_matches,
           CAST(ceil(quantile_cont(n, 0.99)) + 1 AS BIGINT)
             AS suggested_threshold
    FROM m GROUP BY event_type
    """,
)
def rule_tuning_suggested_thresholds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X117 closing the analytics->alerting loop: per event type, the
    exact p95/p99 of per-(user, day) match counts and the suggested
    threshold (ceil(p99)+1) a rule author should start from — the
    threshold twin of the gap-percentiles deadman-window tuning
    entry. One aggregate to user-day counts, one grouped exact
    percentile over that bounded frame."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type", "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return m.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_user_days"),
        F.percentile("n", F.lit(0.95)).alias("p95_daily_matches"),
        F.percentile("n", F.lit(0.99)).alias("p99_daily_matches"),
        (F.ceil(F.percentile("n", F.lit(0.99))) + 1)
        .cast("long")
        .alias("suggested_threshold"),
    )


@register(
    "report_top_sources_with_other",
    # Top-N + OTHERS: the reporting cut that keeps totals honest —
    # the tail is aggregated into one 'other' row instead of dropped;
    # shares are exact-count divisions.
    oracle="""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    r AS (
      SELECT source, n,
             row_number() OVER (ORDER BY n DESC, source) AS rnk
      FROM c
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT CASE WHEN rnk <= 3 THEN source ELSE 'other' END AS source_group,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(n) AS DOUBLE) / CAST(max(t.total) AS DOUBLE) AS share
    FROM r, t
    GROUP BY 1
    """,
)
def report_top_sources_with_other(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X118 top-N + OTHERS report: the top-3 sources by volume with
    the tail collapsed into one honest 'other' row (shares sum to 1).
    Rank window over the source-sized aggregate only."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    one = F.pmod(F.length("source"), F.lit(1))
    r = c.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy(one).orderBy(F.desc("n"), F.asc("source"))
        ),
    )
    tot = c.agg(F.sum("n").cast("long").alias("total"))
    return (
        r.crossJoin(F.broadcast(tot))
        .groupBy(
            F.when(F.col("rnk") <= 3, F.col("source"))
            .otherwise(F.lit("other"))
            .alias("source_group")
        )
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            (
                F.sum("n").cast("double") / F.max("total").cast("double")
            ).alias("share"),
        )
    )


@register(
    "quality_fk_integrity_audit",
    # Referential-integrity audit over the star schema: orphan counts
    # per FK edge via anti-join semantics expressed as NOT IN counts —
    # exact integers; one row per edge.
    oracle="""
    SELECT 'orders.custkey' AS fk_edge,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey NOT IN
                       (SELECT c_custkey FROM customer)) AS BIGINT)
             AS n_orphans
    UNION ALL
    SELECT 'lineitem.orderkey',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_orderkey NOT IN
                       (SELECT o_orderkey FROM orders)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.partkey',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_partkey NOT IN
                       (SELECT p_partkey FROM part)) AS BIGINT)
    UNION ALL
    SELECT 'customer.nationkey',
           CAST((SELECT count(*) FROM customer) AS BIGINT),
           CAST((SELECT count(*) FROM customer c
                 WHERE c.c_nationkey NOT IN
                       (SELECT n_nationkey FROM nation)) AS BIGINT)
    """,
)
def quality_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X119 referential-integrity audit: orphan-row counts for every
    FK edge of the star schema — the pre-flight data-quality gate
    before trusting any join's row counts. Each edge is one LEFT ANTI
    join (broadcast dim); output is one row per edge."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")

    def edge(name, fact, fk, dim, pk):
        orphans = fact.join(
            F.broadcast(dim.select(pk)), F.col(fk) == F.col(pk), "left_anti"
        )
        return (
            fact.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("n_orphans")
                )
            )
            .select(F.lit(name).alias("fk_edge"), "n_rows", "n_orphans")
        )

    return (
        edge("orders.custkey", o, "o_custkey", c, "c_custkey")
        .unionByName(edge("lineitem.orderkey", li, "l_orderkey", o, "o_orderkey"))
        .unionByName(edge("lineitem.partkey", li, "l_partkey", p, "p_partkey"))
        .unionByName(edge("customer.nationkey", c, "c_nationkey", n, "n_nationkey"))
    )


@register(
    "dedup_minhash_eval_report",
    # The approximation the 100 TB dedup path rests on, quantified:
    # TP/FP/FN of MinHash-LSH candidates vs the exact Jaccard ground
    # truth on the same corpus. The oracle recomputes ground truth
    # definitionally; banding is deterministic, so the confusion
    # counts are engine-exact. (On this corpus recall is exactly 1 —
    # the dedup_minhash_lsh entry depends on that; THIS row is where
    # that claim is measured rather than assumed.)
    oracle=f"""
    WITH s AS (SELECT doc_id, {{DS}} AS sh FROM documents),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
           CAST(count(*) AS BIGINT) AS n_found_pairs,
           CAST(0 AS BIGINT) AS n_missed,
           1.0 AS recall
    FROM truth
    """.replace("{DS}", _DUCK_SHINGLES),
)
def dedup_minhash_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X120 approximate-dedup evaluation: MinHash-LSH pair recall
    against the exact all-pairs ground truth, as data (n_true,
    n_found, n_missed, recall). Verification joins are on (id_a,
    id_b) pairs — bounded by the pair sets, not the corpus."""
    from alerta_spark.ops.dedupe import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(docs, n=5, threshold=0.8).select(
        "id_a", "id_b"
    )
    found = minhash_lsh_pairs(docs, n=5, threshold=0.8).select("id_a", "id_b")
    missed = truth.join(found, ["id_a", "id_b"], "left_anti")
    return (
        truth.agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))
        .crossJoin(
            found.agg(F.count(F.lit(1)).cast("long").alias("n_found_pairs"))
        )
        .crossJoin(
            missed.agg(F.count(F.lit(1)).cast("long").alias("n_missed"))
        )
        .select(
            "n_true_pairs",
            "n_found_pairs",
            "n_missed",
            (
                (F.col("n_true_pairs") - F.col("n_missed")).cast("double")
                / F.col("n_true_pairs").cast("double")
            ).alias("recall"),
        )
    )


@register(
    "split_allocation_largest_remainder",
    # Largest-remainder (Hamilton) apportionment: give each source
    # floor(n*frac) rows, then distribute the leftover seats by
    # largest fractional remainder (ties -> source asc). Every step
    # exact integers: remainders compare by cross-multiplication
    # (n*target % total), never a float.
    oracle="""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT CAST(sum(n) AS BIGINT) AS total,
             CAST(1000 AS BIGINT) AS target
      FROM c
    ),
    base AS (
      SELECT c.source, c.n,
             (c.n * t.target) // t.total AS floor_alloc,
             (c.n * t.target) % t.total AS rem,
             t.target - CAST(sum((c.n * t.target) // t.total)
                             OVER () AS BIGINT) AS leftover
      FROM c, t
    ),
    ranked AS (
      SELECT source, n, floor_alloc, leftover,
             row_number() OVER (ORDER BY rem DESC, source) AS rr
      FROM base
    )
    SELECT source, n,
           CAST(floor_alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS allocation
    FROM ranked
    """,
)
def split_allocation_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X121 proportional quota allocation (largest-remainder method):
    split a 1000-row sampling budget across sources proportional to
    volume, with the leftover seats going to the largest fractional
    remainders — allocations sum EXACTLY to the budget (independent
    per-source rounding does not). All integer arithmetic; windows run
    over the source-sized frame only."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = c.agg(F.sum("n").cast("long").alias("total"))
    target = 1000
    one = F.pmod(F.length("source"), F.lit(1))
    base = c.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr(f"(n * {target}) div total").cast("long").alias("floor_alloc"),
        F.expr(f"(n * {target}) % total").cast("long").alias("rem"),
    )
    base = base.withColumn(
        "leftover",
        F.lit(target) - F.sum("floor_alloc").over(W.partitionBy(one)),
    )
    ranked = base.withColumn(
        "rr",
        F.row_number().over(
            W.partitionBy(one).orderBy(F.desc("rem"), F.asc("source"))
        ),
    )
    return ranked.select(
        "source",
        "n",
        (
            F.col("floor_alloc")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        ).cast("long").alias("allocation"),
    )


@register(
    "slo_error_burn_rate",
    # SRE error-budget math from exact counts: per-day error rate,
    # availability, and burn rate vs a 99% SLO (budget = 1%); every
    # ratio is a single division of exact BIGINTs, the burn rate one
    # more fixed-tree division.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS n_errors
      FROM events GROUP BY 1
    )
    SELECT day, n_total, n_errors,
           CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE) AS error_rate,
           (CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE)) / 0.01
             AS burn_rate,
           n_errors * 100 > n_total AS budget_exceeded
    FROM d
    """,
)
def slo_error_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X122 SLO error-budget burn: per-day error rate and burn rate
    against a 99% availability SLO, with the exceeded flag decided by
    integer cross-multiplication (n_errors*100 > n_total) so the
    boundary never rides a float. One conditional aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("n_errors"),
    )
    rate = F.col("n_errors").cast("double") / F.col("n_total").cast("double")
    return d.select(
        "day",
        "n_total",
        "n_errors",
        rate.alias("error_rate"),
        (rate / F.lit(0.01)).alias("burn_rate"),
        (F.col("n_errors") * 100 > F.col("n_total")).alias("budget_exceeded"),
    )


@register(
    "cep_not_followed_by",
    # Negative sequence pattern: purchase NOT followed by a view
    # within 1h for the same user — the absence-after-trigger CEP
    # shape (fraud/abandonment detection). Spark side: ONE lead-style
    # union window pass (next view timestamp per purchase); oracle =
    # the definitional NOT EXISTS. Exact integer microseconds.
    oracle="""
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          AND epoch_us(v.ts) > epoch_us(p.ts)
          AND epoch_us(v.ts) <= epoch_us(p.ts) + 3600000000
      )
    """,
)
def cep_not_followed_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X123 negative CEP pattern: purchases with NO view by the same
    user within the following hour (cart-abandonment / unacknowledged-
    alert shape). The NOT EXISTS decorrelates into one user-keyed
    union-window pass: order (ts, is_view) per user, take the NEXT
    view timestamp via a min-over-following window on view rows only,
    and keep purchases whose next view is null or beyond the horizon
    — no self-join, one exchange."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_type").alias("et"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    nxt = base.withColumn(
        "next_view_us",
        F.min(F.when(F.col("et") == "view", F.col("ts_us"))).over(w),
    )
    return (
        nxt.where(F.col("et") == "purchase")
        .where(
            F.col("next_view_us").isNull()
            | (F.col("next_view_us") > F.col("ts_us") + 3_600_000_000)
        )
        .select("event_id", "user_id", "ts_us")
    )


@register(
    "twa_user_daily_value",
    # Time-weighted average of a held state: each event's value holds
    # until the next event (last value holds to end-of-day); weights
    # are exact integer µs, the value·duration mass accumulates in
    # DECIMAL, one division at the end.
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS t,
             CAST(value AS DECIMAL(14,2)) AS v,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts, event_id) AS t_next
      FROM events
    ),
    seg AS (
      SELECT user_id, day, v,
             coalesce(t_next,
                      epoch_us(CAST(day AS TIMESTAMP) + INTERVAL 1 DAY)) - t
               AS dur_us
      FROM e
    )
    SELECT user_id, day,
           CAST(sum(dur_us) AS BIGINT) AS covered_us,
           CAST(CAST(sum(v * CAST(dur_us AS DECIMAL(16,0)))
                     AS VARCHAR) AS DOUBLE)
             / CAST(sum(dur_us) AS DOUBLE) AS twa_value
    FROM seg GROUP BY user_id, day
    """,
)
def twa_user_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X124 time-weighted average of a held state (the IoT/billing
    mean: a value persists until the next observation, the last one
    holds to end-of-day) — an unweighted mean over-counts bursts.
    One lead window + one aggregate sharing the (user, day)
    clustering; value x duration mass exact in DECIMAL."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    w = W.partitionBy("user_id", day.alias("day")).orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        day.alias("day"),
        F.unix_micros("ts").alias("t"),
        F.col("value").cast("decimal(14,2)").alias("v"),
        F.lead(F.unix_micros("ts"))
        .over(W.partitionBy("user_id", day).orderBy("ts", "event_id"))
        .alias("t_next"),
    )
    end_of_day = F.unix_micros(
        F.date_add(F.col("day"), 1).cast("timestamp")
    )
    seg = e.select(
        "user_id",
        "day",
        "v",
        (F.coalesce(F.col("t_next"), end_of_day) - F.col("t")).alias(
            "dur_us"
        ),
    )
    return seg.groupBy("user_id", "day").agg(
        F.sum("dur_us").cast("long").alias("covered_us"),
        (
            F.sum(F.col("v") * F.col("dur_us").cast("decimal(16,0)"))
            .cast("string")
            .cast("double")
            / F.sum("dur_us").cast("double")
        ).alias("twa_value"),
    )


@register(
    "corpus_token_weighted_quality",
    # Token-weighted mean quality per source: weights exact BIGINT
    # token counts, quality quantized to exact integer micro-units
    # before the weighted sum, one final division.
    oracle="""
    WITH q AS (
      SELECT source,
             CAST(len(list_filter(string_split(
                    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                    t -> t <> '')) AS BIGINT) AS toks,
             CAST(length(text) AS BIGINT) AS n_chars_txt
      FROM documents
    )
    SELECT source,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(sum(toks * n_chars_txt) AS BIGINT) AS char_mass,
           CAST(sum(toks * n_chars_txt) AS DOUBLE)
             / CAST(sum(toks) AS DOUBLE) AS token_weighted_mean_chars
    FROM q GROUP BY source
    """,
)
def corpus_token_weighted_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X125 token-weighted grouped mean (per-source mean doc length
    weighted by token mass — what the training mix actually sees;
    unweighted means over-weight short docs). Pure exact integers,
    one aggregate."""
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "source",
        F.size(
            F.filter(tokenize(F.col("text")), lambda t: t != F.lit(""))
        ).cast("long").alias("toks"),
        F.length("text").cast("long").alias("n_chars_txt"),
    )
    return q.groupBy("source").agg(
        F.sum("toks").cast("long").alias("total_tokens"),
        F.sum(F.col("toks") * F.col("n_chars_txt"))
        .cast("long")
        .alias("char_mass"),
        (
            F.sum(F.col("toks") * F.col("n_chars_txt")).cast("double")
            / F.sum("toks").cast("double")
        ).alias("token_weighted_mean_chars"),
    )


@register(
    "graph_khop_reachability",
    # k-hop reachability over the event-transition graph (which event
    # types a user reaches within 3 transitions of 'signup'): BFS
    # unrolled as k self-joins over the DISTINCT edge set — exact, and
    # the edge set is |types|^2-bounded so every hop is a tiny join.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    e AS (
      SELECT DISTINCT event_type AS src, next_type AS dst
      FROM seq WHERE next_type IS NOT NULL
    ),
    h1 AS (SELECT dst, 1 AS hops FROM e WHERE src = 'signup'),
    h2 AS (SELECT DISTINCT e.dst, 2 AS hops
           FROM h1 JOIN e ON e.src = h1.dst),
    h3 AS (SELECT DISTINCT e.dst, 3 AS hops
           FROM h2 JOIN e ON e.src = h2.dst),
    allh AS (
      SELECT dst, hops FROM h1
      UNION ALL SELECT dst, hops FROM h2
      UNION ALL SELECT dst, hops FROM h3
    )
    SELECT dst AS reachable_type,
           CAST(min(hops) AS BIGINT) AS min_hops
    FROM allh GROUP BY dst
    """,
)
def graph_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X126 k-hop reachability (BFS, k=3) from 'signup' over the
    observed event-transition graph: which states a journey can reach
    in <= 3 steps, with the minimum hop count. Edges come from ONE
    lead-window pass; each hop is a join over the |types|²-bounded
    distinct edge set — graph traversal whose per-round cost is
    independent of event volume."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .distinct()
    )
    frontier = e.where(F.col("src") == "signup").select(
        "dst", F.lit(1).alias("hops")
    )
    reached = frontier
    for hop in (2, 3):
        f = frontier.select(F.col("dst").alias("_cur"))
        frontier = (
            f.join(e, f["_cur"] == e["src"])
            .select("dst", F.lit(hop).alias("hops"))
            .distinct()
        )
        reached = reached.unionByName(frontier)
    return reached.groupBy(F.col("dst").alias("reachable_type")).agg(
        F.min("hops").cast("long").alias("min_hops")
    )


@register("similarity_mmr_rerank", oracle=None)  # oracle generated below
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X127 MMR diversity re-ranking over the exact top-20 cosine
    candidates of query 0 (λ=0.7, k=5): corpus-sized work (recall +
    candidate-pair sims) in Spark, the O(|C|·k) greedy on bounded
    fixed-point scores driver-side. The greedy rounds UNROLL into a
    generated SQL oracle (_mmr_oracle: pick1..pick5 CTEs), so the
    selection order and every score hash-check; also replayed against
    a pure-Python reference in tests/test_similarity_ops.py."""
    from alerta_spark.ops.similarity import mmr_rerank

    return mmr_rerank(load_table(spark, sf_dir, "embeddings"), query_id=0)


@register(
    "abtest_stratified_rates",
    # Simpson's-paradox guard for experiment readouts: pooled
    # conversion per arm AND per-stratum (event volume tier) rates —
    # exact counts, fixed divisions; the md5-band arm assignment is
    # the rerun-stable one from abtest_conversion_z.
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || 'ab'), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               > 0 AS converted
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT arm,
             CASE WHEN n_events < 50 THEN 'low'
                  WHEN n_events < 80 THEN 'mid' ELSE 'high' END AS stratum,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(count(*) FILTER (WHERE converted) AS BIGINT) AS n_conv
      FROM u GROUP BY 1, 2
    )
    SELECT arm, stratum, n_users, n_conv,
           CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate
    FROM s
    UNION ALL
    SELECT arm, 'POOLED', CAST(sum(n_users) AS BIGINT),
           CAST(sum(n_conv) AS BIGINT),
           CAST(sum(n_conv) AS DOUBLE) / CAST(sum(n_users) AS DOUBLE)
    FROM s GROUP BY arm
    """,
)
def abtest_stratified_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X128 stratified experiment readout: per-arm conversion split by
    activity stratum PLUS the pooled row — the Simpson's-paradox
    guard (a pooled lift can reverse inside every stratum when arms
    are imbalanced across strata). Exact counts; strata re-aggregate
    the user-sized frame, never the facts."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (
            F.sum((F.col("event_type") == "purchase").cast("long")) > 0
        ).alias("converted"),
    ).select(
        "user_id",
        F.when(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("ab"))),
                1,
                1,
            )
            < "8",
            "A",
        ).otherwise("B").alias("arm"),
        "n_events",
        "converted",
    )
    s = u.groupBy(
        "arm",
        F.when(F.col("n_events") < 50, "low")
        .when(F.col("n_events") < 80, "mid")
        .otherwise("high")
        .alias("stratum"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("converted").cast("long")).cast("long").alias("n_conv"),
    )
    per = s.select(
        "arm",
        "stratum",
        "n_users",
        "n_conv",
        (
            F.col("n_conv").cast("double") / F.col("n_users").cast("double")
        ).alias("conv_rate"),
    )
    pooled = s.groupBy("arm").agg(
        F.sum("n_users").cast("long").alias("n_users"),
        F.sum("n_conv").cast("long").alias("n_conv"),
    ).select(
        "arm",
        F.lit("POOLED").alias("stratum"),
        "n_users",
        "n_conv",
        (
            F.col("n_conv").cast("double") / F.col("n_users").cast("double")
        ).alias("conv_rate"),
    )
    return per.unionByName(pooled)


def _mmr_oracle(k: int = 5, n_candidates: int = 20, quant: int = 1 << 20,
                lam: float = 0.7) -> str:
    lam_q = int(lam * quant)
    inv = quant - lam_q
    ctes = []
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT id FROM pick{i}" for i in range(1, r)
        )
        ctes.append(f"""
    score{r} AS (
      SELECT c.id, c.rel,
             {lam_q} * c.rel - {inv} * coalesce(max(s.sim), 0) AS sc,
             coalesce(max(s.sim), 0) AS mx
      FROM cands c
      LEFT JOIN sims s ON s.a = c.id AND s.b IN ({prev})
      WHERE c.id NOT IN ({prev})
      GROUP BY c.id, c.rel
    ),
    pick{r} AS (
      SELECT id, rel, sc, {r} AS rnk FROM score{r}
      ORDER BY sc DESC, id LIMIT 1
    )""")
    picks = " UNION ALL ".join(
        (
            "SELECT 1 AS rnk, id, rel,"
            f" {lam_q} * rel AS mmr FROM pick1"
        ) if i == 1 else f"SELECT rnk, id, rel, sc AS mmr FROM pick{i}"
        for i in range(1, k + 1)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v FROM e WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id AS id,
             CAST(floor(round(list_dot_product(q.v, e.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(e.v, e.v))), 6)
                  * {quant}.0) AS BIGINT) AS rel
      FROM e, q WHERE e.vec_id <> 0
    ),
    cands AS (
      SELECT id, rel FROM (
        SELECT id, rel, row_number() OVER (ORDER BY rel DESC, id) AS rn
        FROM scored
      ) WHERE rn <= {n_candidates}
    ),
    sims0 AS (
      SELECT a.id AS a, b.id AS b,
             CAST(floor(round(list_dot_product(ea.v, eb.v)
                   / (sqrt(list_dot_product(ea.v, ea.v))
                      * sqrt(list_dot_product(eb.v, eb.v))), 6)
                  * {quant}.0) AS BIGINT) AS sim
      FROM cands a JOIN cands b ON a.id < b.id
      JOIN e ea ON ea.vec_id = a.id
      JOIN e eb ON eb.vec_id = b.id
    ),
    sims AS (
      SELECT a, b, sim FROM sims0
      UNION ALL SELECT b, a, sim FROM sims0
    ),
    pick1 AS (
      SELECT id, rel FROM cands ORDER BY rel DESC, id LIMIT 1
    ),{",".join(ctes)}
    SELECT CAST(rnk AS BIGINT) AS rank, CAST(id AS BIGINT) AS vec_id,
           CAST(rel AS BIGINT) AS rel_q, CAST(mmr AS BIGINT) AS mmr_q
    FROM ({picks})
    """


QUERIES["similarity_mmr_rerank"]["oracle"] = _mmr_oracle()
# upgraded from rows-only: the greedy rounds unroll into generated
# CTEs (pick1..pick5), so selection order, relevance, and MMR scores
# all hash-check — no rows-only entry is left without either an exact
# twin or a full oracle.


def _rrf_oracle() -> str:
    bm = QUERIES["text_bm25_topk"]["oracle"]
    return f"""
    WITH bm AS ({bm}),
    bmr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS r_bm25
      FROM bm
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v FROM e WHERE vec_id = 0),
    cs AS (
      SELECT e.vec_id AS doc_id,
             round(list_dot_product(q.v, e.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cos
      FROM e, q WHERE e.vec_id <> 0
    ),
    csr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT)
               AS r_cos
      FROM cs QUALIFY r_cos <= 10
    ),
    f AS (
      SELECT coalesce(b.doc_id, c.doc_id) AS doc_id, b.r_bm25, c.r_cos
      FROM bmr b FULL OUTER JOIN csr c ON b.doc_id = c.doc_id
    )
    SELECT doc_id, r_bm25, r_cos,
           coalesce(1.0 / (60 + r_bm25), 0.0)
             + coalesce(1.0 / (60 + r_cos), 0.0) AS rrf
    FROM f
    ORDER BY rrf DESC, doc_id LIMIT 10
    """


@register("retrieval_rrf_fusion", oracle=None)  # oracle set below
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X129 reciprocal rank fusion (RRF, k=60): fuse the BM25 lexical
    top-10 with the cosine top-10 of query vector 0 (doc_id == vec_id
    — the synthetic corpora are paired by id) by Σ 1/(60+rank) — the
    score-free list-fusion standard when lexical and dense scores
    aren't calibrated against each other (cf. hybrid_retrieval_rerank
    which funnels instead). Each 1/(60+r) is one IEEE division of
    exact integers, the fused score one fixed two-term sum — engine-
    exact including the final cut."""
    from alerta_spark.ops.similarity import cosine_topk
    from alerta_spark.ops.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    one = F.pmod(F.col("doc_id"), F.lit(1))
    bmr = bm25_topk(docs, ["spark", "join", "vector"], k=10).select(
        "doc_id",
        F.row_number()
        .over(W.partitionBy(one).orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("long")
        .alias("r_bm25"),
    )
    csr = cosine_topk(emb, [0], k=10).select(
        F.col("neighbor_id").alias("doc_id"),
        F.row_number()
        .over(
            W.partitionBy(F.pmod(F.col("neighbor_id"), F.lit(1))).orderBy(
                F.desc("cos"), F.asc("neighbor_id")
            )
        )
        .cast("long")
        .alias("r_cos"),
    )
    f = bmr.join(csr, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(60) + F.col("r_bm25")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_cos")), F.lit(0.0))
    return (
        f.select("doc_id", "r_bm25", "r_cos", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
    )


QUERIES["retrieval_rrf_fusion"]["oracle"] = _rrf_oracle()


@register(
    "funnel_within_session",
    # Session-scoped funnel: signup -> view -> purchase must complete
    # INSIDE one 30-min-gap session (cross-session "conversions" are
    # the classic product-analytics overcount). Composes the pinned
    # single-exchange sessionizer with the ordered-steps test; the
    # oracle recomputes sessions + first-occurrence ordering
    # definitionally.
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_type, t,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS sid
      FROM o
    ),
    firsts AS (
      SELECT user_id, sid,
             min(CASE WHEN event_type = 'signup' THEN t END) AS t1,
             min(CASE WHEN event_type = 'view' THEN t END) AS t2,
             min(CASE WHEN event_type = 'purchase' THEN t END) AS t3
      FROM s GROUP BY user_id, sid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(*) FILTER (WHERE t1 IS NOT NULL) AS BIGINT)
             AS n_step1,
           CAST(count(*) FILTER (WHERE t1 IS NOT NULL AND t2 > t1)
                AS BIGINT) AS n_step2,
           CAST(count(*) FILTER (WHERE t1 IS NOT NULL AND t2 > t1
                                   AND t3 > t2) AS BIGINT) AS n_converted
    FROM firsts
    """,
)
def funnel_within_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X130 session-scoped funnel: ordered signup->view->purchase
    completion within ONE session (30-min gaps) — composes the
    single-exchange sessionizer with a first-occurrence ordering test
    per (user, session); the whole computation shares the user
    clustering (sessionize window + session aggregate), one real
    exchange. Cross-session conversions — the classic overcount —
    are excluded by construction."""
    from alerta_spark.ops.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, gap_minutes=30).select(
        "user_id",
        "session_idx",
        "event_type",
        F.unix_micros("ts").alias("t"),
    )
    firsts = s.groupBy("user_id", "session_idx").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("t"))).alias("t1"),
        F.min(F.when(F.col("event_type") == "view", F.col("t"))).alias("t2"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("t"))).alias(
            "t3"
        ),
    )
    return firsts.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.col("t1").isNotNull().cast("long"))
        .cast("long")
        .alias("n_step1"),
        F.sum(
            (F.col("t1").isNotNull() & (F.col("t2") > F.col("t1"))).cast(
                "long"
            )
        ).cast("long").alias("n_step2"),
        F.sum(
            (
                F.col("t1").isNotNull()
                & (F.col("t2") > F.col("t1"))
                & (F.col("t3") > F.col("t2"))
            ).cast("long")
        ).cast("long").alias("n_converted"),
    )


@register(
    "timeseries_daily_value_bands",
    # p10/p50/p90 daily bands: exact interpolated percentiles on both
    # engines (identical lo + (hi-lo)*frac arithmetic).
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n,
           quantile_cont(value, 0.10) AS p10,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.90) AS p90
    FROM events GROUP BY 1
    """,
)
def timeseries_daily_value_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X131 daily percentile bands (p10/p50/p90 of event value) — the
    chart-ready envelope behind every metric dashboard; one grouped
    exact-percentile aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile("value", F.lit(0.10)).alias("p10"),
        F.percentile("value", F.lit(0.50)).alias("p50"),
        F.percentile("value", F.lit(0.90)).alias("p90"),
    )


@register(
    "anomaly_user_burst",
    # Burst = last-day count vs the user's own trailing daily mean,
    # compared by integer cross-multiplication (n_last * n_days_prior
    # >= K * n_prior) — no float boundary; the per-user behavioral
    # twin of the global seasonal screen.
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT max(day) AS last_day FROM d),
    d2 AS (
      SELECT user_id, day, n FROM d
      UNION ALL
      SELECT u AS user_id, mx.last_day AS day, CAST(40 AS BIGINT) AS n
      FROM (SELECT unnest([1, 2, 3]) AS u), mx
    ),
    agg AS (
      SELECT d.user_id,
             CAST(sum(CASE WHEN d.day = mx.last_day THEN n ELSE 0 END)
                  AS BIGINT) AS n_last,
             CAST(sum(CASE WHEN d.day < mx.last_day THEN n ELSE 0 END)
                  AS BIGINT) AS n_prior,
             CAST(count(*) FILTER (WHERE d.day < mx.last_day) AS BIGINT)
               AS days_prior
      FROM d2 d, mx GROUP BY d.user_id
    )
    SELECT user_id, n_last, n_prior, days_prior
    FROM agg
    WHERE days_prior > 0 AND n_last * days_prior >= 3 * n_prior
      AND n_last >= 5
    """,
)
def anomaly_user_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X132 per-user burst detection: users whose LAST-day event count
    is >= 3x their own trailing daily mean (and >= 5 absolute) — the
    compromised-account / runaway-client screen, exact integer cross-
    multiplication so the 3x boundary never rides a float. One daily
    aggregate + one user aggregate. The uniform synthetic stream has
    no organic bursts, so 40 extra last-day events are PLANTED for
    users 1-3 (the planted-twin convention — the regime the operator
    exists for); the oracle plants identically."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    mx = d.agg(F.max("day").alias("last_day"))
    planted = (
        spark.range(1, 4)
        .select(F.col("id").alias("user_id"))
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.col("last_day").alias("day"),
            F.lit(40).cast("long").alias("n"),
        )
    )
    d = d.unionByName(planted)
    agg = d.crossJoin(F.broadcast(mx)).groupBy("user_id").agg(
        F.sum(
            F.when(F.col("day") == F.col("last_day"), F.col("n")).otherwise(0)
        ).cast("long").alias("n_last"),
        F.sum(
            F.when(F.col("day") < F.col("last_day"), F.col("n")).otherwise(0)
        ).cast("long").alias("n_prior"),
        F.sum((F.col("day") < F.col("last_day")).cast("long"))
        .cast("long")
        .alias("days_prior"),
    )
    return agg.where(
        (F.col("days_prior") > 0)
        & (F.col("n_last") * F.col("days_prior") >= 3 * F.col("n_prior"))
        & (F.col("n_last") >= 5)
    )


@register(
    "text_kwic_snippets",
    # Keyword-in-context: ±3-token windows around every 'vector' hit,
    # built from the SAME posting-probe machinery as phrase search —
    # array slicing on the collected token list, all JVM expressions.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               t -> t <> '') AS ts
      FROM documents
    ),
    pos AS (
      SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS p
      FROM toks
    )
    SELECT doc_id, CAST(p AS BIGINT) AS pos,
           array_to_string(ts[greatest(p - 3, 1):least(p + 3, len(ts))],
                           ' ') AS snippet
    FROM pos WHERE ts[p] = 'vector'
    """,
)
def text_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X133 keyword-in-context: the reviewer-facing ±3-token window
    around every 'vector' occurrence — what a search UI or a labeling
    queue shows. Token positions from one posexplode; the snippet is
    a JVM slice+join of the per-doc token array."""
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.filter(tokenize(F.col("text")), lambda x: x != F.lit("")).alias(
            "ts"
        ),
    )
    hits = t.select(
        "doc_id",
        "ts",
        F.posexplode("ts").alias("p0", "tok"),
    ).where(F.col("tok") == "vector").select(
        "doc_id", "ts", (F.col("p0") + 1).alias("pos")
    )
    lo = F.greatest(F.col("pos") - 3, F.lit(1))
    hi = F.least(F.col("pos") + 3, F.size("ts"))
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(F.slice("ts", lo, hi - lo + 1), " ").alias("snippet"),
    )


@register(
    "events_hour_of_week_profile",
    # The 168-cell weekly heatmap behind deadman/threshold tuning:
    # exact counts + per-type shares (one division of BIGINTs).
    oracle="""
    WITH c AS (
      SELECT event_type,
             -- DuckDB dayofweek is 0-based Sunday; Spark's is 1-based
             CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
    SELECT c.event_type, c.dow, c.hod, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
    FROM c JOIN t USING (event_type)
    """,
)
def events_hour_of_week_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X134 hour-of-week activity profile: the 168-cell heatmap per
    event type with per-type shares — the seasonality fingerprint that
    tunes deadman windows and threshold schedules. One aggregate +
    broadcast totals join."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").cast("long").alias("tot"))
    return c.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        "hod",
        "n",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias(
            "share"
        ),
    )


@register(
    "index_posting_stats",
    # Inverted-index observability: the posting-length distribution
    # that decides the hot-shingle cap and predicts join fan-out —
    # exact counts + exact percentiles over the term-sized frame.
    oracle="""
    WITH s AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                 t -> t <> '')) AS term
        FROM documents
      ) GROUP BY term
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(df) AS BIGINT) AS n_postings,
           CAST(max(df) AS BIGINT) AS max_df,
           quantile_cont(df, 0.50) AS p50_df,
           quantile_cont(df, 0.99) AS p99_df
    FROM s
    """,
)
def index_posting_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X135 posting-list statistics for the term inverted index:
    term count, posting mass, max/p50/p99 document frequency — the
    numbers that size the hot-term cap (X2/X69) and predict candidate
    join fan-out BEFORE building a dedup/retrieval index at 100 TB."""
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    s = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(tokenize(F.col("text")), lambda t: t != F.lit(""))
            ).alias("term"),
        )
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        F.max("df").cast("long").alias("max_df"),
        F.percentile("df", F.lit(0.50)).alias("p50_df"),
        F.percentile("df", F.lit(0.99)).alias("p99_df"),
    )


@register(
    "dedup_cluster_size_distribution",
    # Cluster-size histogram over the transitive dup clusters: how
    # much mass dedup removes at each multiplicity — the shape that
    # decides whether canonical-cut savings justify the clustering
    # pass. Oracle reuses the recursive-closure definition.
    oracle="""
    WITH RECURSIVE s AS (SELECT doc_id, {DS} AS sh FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
      FROM comp GROUP BY cluster_id
    )
    SELECT size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(count(*) * (size - 1) AS BIGINT) AS docs_removable
    FROM sizes GROUP BY size
    """,
)
def dedup_cluster_size_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X136 dup-cluster size histogram + removable-doc mass per size —
    the dedup ROI readout (a corpus of pairs dedups very differently
    from one with mega-clusters). Composes dup_clusters; output is
    bounded by the distinct sizes."""
    from alerta_spark.ops.dedupe import dup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=5, threshold=0.8
    )
    sizes = dup_clusters(pairs).groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.count(F.lit(1)) * (F.col("size") - 1))
        .cast("long")
        .alias("docs_removable"),
    )


QUERIES["dedup_cluster_size_distribution"]["oracle"] = QUERIES[
    "dedup_cluster_size_distribution"
]["oracle"].replace("{DS}", _DUCK_SHINGLES)


@register(
    "growth_accounting_daily",
    # Growth-accounting quadrants: per day, active users split into
    # NEW (first-ever day), RETAINED (also active the previous day),
    # RESURRECTED (seen before, not yesterday). Exact set logic via
    # first-day aggregate + previous-day self-check; counts only.
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day
      FROM events
    ),
    f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY user_id),
    j AS (
      SELECT d.user_id, d.day, f.first_day,
             EXISTS (SELECT 1 FROM d p
                     WHERE p.user_id = d.user_id
                       AND p.day = d.day - 1) AS active_prev
      FROM d JOIN f USING (user_id)
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS dau,
           CAST(count(*) FILTER (WHERE day = first_day) AS BIGINT) AS new_users,
           CAST(count(*) FILTER (WHERE day > first_day AND active_prev)
                AS BIGINT) AS retained,
           CAST(count(*) FILTER (WHERE day > first_day AND NOT active_prev)
                AS BIGINT) AS resurrected
    FROM j GROUP BY day
    """,
)
def growth_accounting_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X137 growth accounting: daily actives split into new /
    retained / resurrected — the product-growth ledger (churn is the
    complement on the next day). The previous-day test is a lag over
    each user's ORDERED distinct-day sequence (one user exchange
    shared with the first-day window), not a self-join."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("day"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    j = d.select(
        "user_id",
        "day",
        F.min("day").over(W.partitionBy("user_id")).alias("first_day"),
        (F.lag("day").over(w) == F.col("day") - 1).alias("active_prev"),
    )
    return j.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau"),
        F.sum((F.col("day") == F.col("first_day")).cast("long"))
        .cast("long")
        .alias("new_users"),
        F.sum(
            (
                (F.col("day") > F.col("first_day"))
                & F.coalesce(F.col("active_prev"), F.lit(False))
            ).cast("long")
        ).cast("long").alias("retained"),
        F.sum(
            (
                (F.col("day") > F.col("first_day"))
                & ~F.coalesce(F.col("active_prev"), F.lit(False))
            ).cast("long")
        ).cast("long").alias("resurrected"),
    )


@register(
    "corr_matrix_daily_values",
    # Pairwise Pearson between event types' daily value totals from
    # exact-decimal moments (the X62 discipline, now per type-pair):
    # daily totals exact in DECIMAL cents, the pair frame is
    # days x types-squared bounded, every numerator assembled exactly
    # with the VARCHAR hop before ONE double crossing.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(sum(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT)
               AS x
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type AS ta, b.event_type AS tb, a.x AS xa, b.x AS xb
      FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type
    ),
    m AS (
      SELECT ta, tb, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xa) AS BIGINT) AS sx, CAST(sum(xb) AS BIGINT) AS sy,
             CAST(sum(xa * xb) AS DECIMAL(30,0)) AS sxy,
             CAST(sum(xa * xa) AS DECIMAL(30,0)) AS sxx,
             CAST(sum(xb * xb) AS DECIMAL(30,0)) AS syy
      FROM p GROUP BY ta, tb
    )
    SELECT ta, tb, n,
           CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxy
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                 AS VARCHAR) AS DOUBLE)
           / sqrt(
               CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxx
                     - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                     AS VARCHAR) AS DOUBLE)
               * CAST(CAST(CAST(n AS DECIMAL(8,0)) * syy
                     - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                     AS VARCHAR) AS DOUBLE)
             ) AS corr_daily
    FROM m
    """,
)
def corr_matrix_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X138 pairwise correlation matrix of event types' daily value
    totals (do purchases co-move with views?) — bit-reproducible
    Pearson from exact moments per pair; the pair frame is
    days×types² bounded, never the fact table."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        (F.sum(F.col("value").cast("decimal(14,2)")) * 100)
        .cast("long")
        .alias("x")
    )
    a = d.select(
        F.col("day").alias("_d"), F.col("event_type").alias("ta"),
        F.col("x").alias("xa"),
    )
    b = d.select(
        F.col("day").alias("_d"), F.col("event_type").alias("tb"),
        F.col("x").alias("xb"),
    )
    p = a.join(b, "_d").where(F.col("ta") < F.col("tb"))
    m = p.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xa").cast("long").alias("sx"),
        F.sum("xb").cast("long").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).cast("decimal(30,0)").alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).cast("decimal(30,0)").alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).cast("decimal(30,0)").alias("syy"),
    )
    n8 = F.col("n").cast("decimal(8,0)")
    sx19 = F.col("sx").cast("decimal(19,0)")
    sy19 = F.col("sy").cast("decimal(19,0)")
    cov = (n8 * F.col("sxy") - sx19 * sy19).cast("string").cast("double")
    vx = (n8 * F.col("sxx") - sx19 * sx19).cast("string").cast("double")
    vy = (n8 * F.col("syy") - sy19 * sy19).cast("string").cast("double")
    return m.select(
        "ta", "tb", "n", (cov / F.sqrt(vx * vy)).alias("corr_daily")
    )


@register(
    "attribution_linear_multi_touch",
    # Linear multi-touch with EXACT credit conservation: each purchase
    # splits its cents equally over the user's clicks in the prior
    # hour — integral div per click, remainder cents to the EARLIEST
    # clicks (largest-remainder style), so per-purchase credits sum
    # exactly to the purchase. Per-click totals are exact BIGINTs.
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS pt,
             CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS cid, user_id, epoch_us(ts) AS ct
      FROM events WHERE event_type = 'click'
    ),
    touch AS (
      SELECT p.pid, p.cents, c.cid,
             row_number() OVER (PARTITION BY p.pid ORDER BY c.ct, c.cid)
               AS rn,
             count(*) OVER (PARTITION BY p.pid) AS n_touch
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ct < p.pt AND c.ct >= p.pt - 3600000000
    ),
    credit AS (
      SELECT cid,
             cents // n_touch
               + CASE WHEN rn <= cents % n_touch THEN 1 ELSE 0 END
               AS cr
      FROM touch
    )
    SELECT cid AS click_event_id,
           CAST(count(*) AS BIGINT) AS n_purchases_touched,
           CAST(sum(cr) AS BIGINT) AS credit_cents
    FROM credit GROUP BY cid
    """,
)
def attribution_linear_multi_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X139 linear multi-touch attribution: purchase cents split
    equally across the user's prior-hour clicks with EXACT
    conservation (integral div + remainder cents to the earliest
    touches — the largest-remainder trick again; float splitting
    would leak cents). Range join bounded by the 1h window; windows
    run per purchase over its bounded touch set."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.unix_micros("ts").alias("pt"),
        (F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        "user_id",
        F.unix_micros("ts").alias("ct"),
    )
    touch = p.join(c, "user_id").where(
        (F.col("ct") < F.col("pt"))
        & (F.col("ct") >= F.col("pt") - 3_600_000_000)
    )
    w = W.partitionBy("pid").orderBy("ct", "cid")
    touch = touch.select(
        "pid",
        "cents",
        "cid",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("pid")).alias("n_touch"),
    )
    credit = touch.select(
        "cid",
        (
            F.expr("cents div n_touch")
            + F.when(F.col("rn") <= F.expr("cents % n_touch"), 1).otherwise(0)
        ).cast("long").alias("cr"),
    )
    return credit.groupBy(F.col("cid").alias("click_event_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases_touched"),
        F.sum("cr").cast("long").alias("credit_cents"),
    )


@register(
    "abtest_wilson_bounds",
    # Wilson 95% interval from exact counts: one fixed IEEE expression
    # tree per bound (z = 1.96 literal shared by both engines).
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || 'ab'), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               > 0 AS converted
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE converted) AS BIGINT) AS k
      FROM u GROUP BY arm
    )
    SELECT arm, n, k,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
           ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) + 3.8416 / (2.0 * n)
            - 1.96 * sqrt(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                           * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                           + 3.8416 / (4.0 * n)) / n))
             / (1.0 + 3.8416 / n) AS wilson_lo,
           ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) + 3.8416 / (2.0 * n)
            + 1.96 * sqrt(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                           * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                           + 3.8416 / (4.0 * n)) / n))
             / (1.0 + 3.8416 / n) AS wilson_hi
    FROM s
    """,
)
def abtest_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X140 Wilson 95% confidence bounds on per-arm conversion — the
    small-sample-honest interval (normal approximation misbehaves at
    extreme rates); identical fixed expression trees of exact counts
    on both engines."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("long")) > 0
        ).alias("converted")
    ).select(
        F.when(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("ab"))),
                1,
                1,
            )
            < "8",
            "A",
        ).otherwise("B").alias("arm"),
        "converted",
    )
    s = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("converted").cast("long")).cast("long").alias("k"),
    )
    nd = F.col("n").cast("double")
    ph = F.col("k").cast("double") / nd
    z2 = F.lit(3.8416)
    rad = F.sqrt((ph * (F.lit(1.0) - ph) + z2 / (F.lit(4.0) * nd)) / nd)
    den = F.lit(1.0) + z2 / nd
    return s.select(
        "arm",
        "n",
        "k",
        ph.alias("p_hat"),
        ((ph + z2 / (F.lit(2.0) * nd) - F.lit(1.96) * rad) / den).alias(
            "wilson_lo"
        ),
        ((ph + z2 / (F.lit(2.0) * nd) + F.lit(1.96) * rad) / den).alias(
            "wilson_hi"
        ),
    )


@register(
    "tokenizer_fertility_report",
    # Tokenizer fertility (chars per token) per source x lang under
    # the BPE-ish pre-tokenizer — exact integer masses, one division.
    oracle="""
    SELECT source, lang,
           CAST(sum(length(text)) AS BIGINT) AS chars_mass,
           CAST(sum(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
             AS token_mass,
           CAST(sum(length(text)) AS DOUBLE)
             / CAST(sum(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS DOUBLE)
             AS chars_per_token
    FROM documents GROUP BY source, lang
    """,
)
def tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X141 tokenizer fertility: chars-per-token by source x lang
    under the BPE-ish pre-tokenizer — the compression-ratio readout
    that flags languages/sources a tokenizer serves badly (fertility
    drives real training cost per character). One aggregate."""
    from alerta_spark.ops.text import bpe_ish_tokens

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.sum(F.length("text")).cast("long").alias("chars_mass"),
        F.sum(F.size(bpe_ish_tokens(F.col("text"))))
        .cast("long")
        .alias("token_mass"),
        (
            F.sum(F.length("text")).cast("double")
            / F.sum(F.size(bpe_ish_tokens(F.col("text")))).cast("double")
        ).alias("chars_per_token"),
    )


@register(
    "dedup_threshold_sweep",
    # Threshold-sensitivity in ONE pass: exact Jaccard computed once
    # per candidate pair (tau=0.5 recall floor), then counted into
    # cumulative >= 0.5/0.6/0.7/0.8/0.9 bands — the curve that picks
    # the production threshold.
    oracle="""
    WITH s AS (SELECT doc_id, {DS} AS sh FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) AS j
      FROM s a JOIN s b ON a.doc_id < b.doc_id
    )
    SELECT t.tau,
           CAST(count(*) FILTER (WHERE j >= t.tau) AS BIGINT) AS n_pairs
    FROM pairs CROSS JOIN
         (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS tau) t
    GROUP BY t.tau
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X142 dedup threshold sweep: near-dup pair counts at tau = 0.5
    ... 0.9 from ONE Jaccard pass (inverted-index candidates at the
    0.5 floor, then cumulative band counts) — the sensitivity curve
    that justifies the production 0.8 instead of guessing it."""
    from alerta_spark.ops.dedupe import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=5, threshold=0.5,
        max_doc_freq=1000,
    )
    taus = F.array(*[F.lit(t) for t in (0.5, 0.6, 0.7, 0.8, 0.9)])
    return (
        pairs.select("jaccard", F.explode(taus).alias("tau"))
        .where(F.col("jaccard") >= F.col("tau"))
        .groupBy("tau")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


@register(
    "vocab_coverage_curve",
    # Zipf coverage: share of total token mass covered by the top
    # 10/30/100 terms — exact masses, the top-k cut on (tf desc,
    # term) is total-ordered.
    oracle="""
    WITH tf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS tf
      FROM (
        SELECT unnest(list_filter(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                 t -> t <> '')) AS term
        FROM documents
      ) GROUP BY term
    ),
    r AS (
      SELECT tf, row_number() OVER (ORDER BY tf DESC, term) AS rnk FROM tf
    ),
    t AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM tf)
    SELECT k.k,
           CAST(sum(r.tf) FILTER (WHERE r.rnk <= k.k) AS BIGINT) AS mass_topk,
           max(t.total) AS total_mass,
           CAST(sum(r.tf) FILTER (WHERE r.rnk <= k.k) AS DOUBLE)
             / CAST(max(t.total) AS DOUBLE) AS coverage
    FROM r CROSS JOIN (SELECT unnest([10, 30, 100]) AS k) k CROSS JOIN t
    GROUP BY k.k
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X143 vocabulary coverage curve: token-mass share of the top
    10/30/100 terms (the Zipf readout that sizes vocabularies and
    stop-lists). Only ranks <= 100 are ever read, so the global rank
    window is replaced by a distributed orderBy+limit (Spark's
    TakeOrdered — per-partition top-100 then a 100-row merge) and the
    row_number runs over the 100-row frame."""
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(
                F.filter(tokenize(F.col("text")), lambda t: t != F.lit(""))
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    top = tf.orderBy(F.desc("tf"), F.asc("term")).limit(100)
    one = F.pmod(F.col("tf"), F.lit(1))
    r = top.select(
        "tf",
        F.row_number().over(
            W.partitionBy(one).orderBy(F.desc("tf"), F.asc("term"))
        ).alias("rnk"),
    )
    t = tf.agg(F.sum("tf").cast("long").alias("total"))
    ks = F.explode(F.array(F.lit(10), F.lit(30), F.lit(100))).alias("k")
    return (
        r.select("tf", "rnk", ks)
        .crossJoin(F.broadcast(t))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("tf")))
            .cast("long")
            .alias("mass_topk"),
            F.max("total").alias("total_mass"),
            (
                F.sum(
                    F.when(F.col("rnk") <= F.col("k"), F.col("tf"))
                ).cast("double")
                / F.max("total").cast("double")
            ).alias("coverage"),
        )
    )


QUERIES["dedup_threshold_sweep"]["oracle"] = QUERIES["dedup_threshold_sweep"][
    "oracle"
].replace("{DS}", _DUCK_SHINGLES)


@register(
    "trending_rank_movement",
    # Rank-movement report between the two corpus halves (by doc_id):
    # per term in either top-20, its rank then vs now and the delta;
    # entered/exited flagged via NULLs. Rank cuts are total-ordered.
    oracle="""
    WITH a AS (
      SELECT term, CAST(count(*) AS BIGINT) AS tf
      FROM (
        SELECT unnest(list_filter(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                 t -> t <> '')) AS term
        FROM documents WHERE doc_id % 2 = 0
      ) GROUP BY term
    ),
    b AS (
      SELECT term, CAST(count(*) AS BIGINT) AS tf
      FROM (
        SELECT unnest(list_filter(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                 t -> t <> '')) AS term
        FROM documents WHERE doc_id % 2 = 1
      ) GROUP BY term
    ),
    ra AS (SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS r
           FROM a QUALIFY r <= 20),
    rb AS (SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS r
           FROM b QUALIFY r <= 20)
    SELECT coalesce(ra.term, rb.term) AS term,
           CAST(ra.r AS BIGINT) AS rank_prev,
           CAST(rb.r AS BIGINT) AS rank_now,
           CAST(ra.r - rb.r AS BIGINT) AS moved_up_by
    FROM ra FULL OUTER JOIN rb ON ra.term = rb.term
    """,
)
def trending_rank_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X144 top-term rank movement between two corpus snapshots
    (halves by doc_id): rank then vs now, movement delta, entries and
    exits as NULL sides — the leaderboard-churn view that pairs with
    the count-lift trending entry. Rank windows run over top-20-cut
    vocab frames only."""
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")

    def side(pred):
        tf = (
            docs.where(pred)
            .select(
                F.explode(
                    F.filter(
                        tokenize(F.col("text")), lambda t: t != F.lit("")
                    )
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
        one = F.pmod(F.col("tf"), F.lit(1))
        return tf.select(
            "term",
            F.row_number()
            .over(W.partitionBy(one).orderBy(F.desc("tf"), F.asc("term")))
            .alias("r"),
        ).where(F.col("r") <= 20)

    ra = side(F.col("doc_id") % 2 == 0).select(
        F.col("term").alias("ta"), F.col("r").alias("rank_prev")
    )
    rb = side(F.col("doc_id") % 2 == 1).select(
        F.col("term").alias("tb"), F.col("r").alias("rank_now")
    )
    j = ra.join(rb, ra["ta"] == rb["tb"], "full_outer")
    return j.select(
        F.coalesce("ta", "tb").alias("term"),
        F.col("rank_prev").cast("long").alias("rank_prev"),
        F.col("rank_now").cast("long").alias("rank_now"),
        (F.col("rank_prev") - F.col("rank_now"))
        .cast("long")
        .alias("moved_up_by"),
    )


@register(
    "funnel_step_latency",
    # Time-to-next-step percentiles for converted users: per user the
    # FIRST signup -> first view AFTER it -> first purchase AFTER
    # that (the funnel's own ordering rule), exact integer µs deltas,
    # exact interpolated percentiles per step pair.
    oracle="""
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t1
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN f ON e.user_id = f.user_id
      WHERE e.event_type = 'view' AND epoch_us(e.ts) > f.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.t2
      GROUP BY e.user_id
    ),
    d AS (
      SELECT 'signup->view' AS step, (v.t2 - f.t1) AS dt
      FROM f JOIN v USING (user_id)
      UNION ALL
      SELECT 'view->purchase', (p.t3 - v.t2)
      FROM v JOIN p USING (user_id)
    )
    SELECT step, CAST(count(*) AS BIGINT) AS n_users,
           quantile_cont(dt, 0.50) AS p50_us,
           quantile_cont(dt, 0.90) AS p90_us
    FROM d GROUP BY step
    """,
)
def funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X145 funnel step latency: p50/p90 time between adjacent funnel
    steps for users who progressed (first signup, first view after
    it, first purchase after that) — the drop-off-timing numbers next
    to the conversion counts. Three bounded per-user aggregates
    sharing the user clustering + one percentile over user-sized
    deltas."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("t1")
    ).where(F.col("t1").isNotNull())
    v = (
        ev.where(F.col("event_type") == "view")
        .join(f, "user_id")
        .where(us > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min(us).alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v.select("user_id", "t2"), "user_id")
        .where(us > F.col("t2"))
        .groupBy("user_id", "t2")
        .agg(F.min(us).alias("t3"))
    )
    d = v.select(
        F.lit("signup->view").alias("step"),
        (F.col("t2") - F.col("t1")).alias("dt"),
    ).unionByName(
        p.select(
            F.lit("view->purchase").alias("step"),
            (F.col("t3") - F.col("t2")).alias("dt"),
        )
    )
    return d.groupBy("step").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.percentile("dt", F.lit(0.50)).alias("p50_us"),
        F.percentile("dt", F.lit(0.90)).alias("p90_us"),
    )


@register(
    "dedup_source_mix",
    # Corpus forensics: are near-dups within one source (boilerplate)
    # or cross-source (syndication)? Classification over the exact
    # pair set; counts only.
    oracle="""
    WITH s AS (SELECT doc_id, source, {DS} AS sh FROM documents),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    )
    SELECT CASE WHEN sa = sb THEN 'within_source'
                ELSE 'cross_source' END AS pair_kind,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1
    """,
)
def dedup_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X146 near-dup provenance mix: within-source (boilerplate) vs
    cross-source (syndication/mirroring) pair counts — the forensic
    split that decides whether dedup belongs in per-source ingest or
    the global pass. Joins sources onto the existing pair machinery;
    counts only."""
    from alerta_spark.ops.dedupe import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=5, threshold=0.8)
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("sb")
            ),
            "id_b",
        )
    )
    return j.groupBy(
        F.when(F.col("sa") == F.col("sb"), "within_source")
        .otherwise("cross_source")
        .alias("pair_kind")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))


@register(
    "daily_peak_hours",
    # argmax via min over (-n, hod) structs: the earliest
    # highest-count hour per (day, type) — total-ordered, exact.
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT day, event_type,
           -- composite order in one BIGINT: max (n, then earliest
           -- hour) == arg-max of n*100 - hod (hod < 24, unique/group)
           CAST(max_by(hod, n * 100 - hod) AS BIGINT) AS peak_hour,
           CAST(max(n) AS BIGINT) AS peak_count
    FROM c GROUP BY day, event_type
    """,
)
def daily_peak_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X147 daily peak hour per event type (earliest hour on count
    ties — a total order, so argmax is engine-exact): the capacity-
    planning readout. Two aggregates under one clustering."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return c.groupBy("day", "event_type").agg(
        F.max_by("hod", F.col("n") * 100 - F.col("hod"))
        .cast("long")
        .alias("peak_hour"),
        F.max("n").cast("long").alias("peak_count"),
    )


@register(
    "inventory_running_balance_floor",
    # The floor-at-zero running balance b_t = max(0, b_{t-1} + x_t) is
    # a NON-associative fold (like EWMA) — but it linearizes by the
    # prefix identity b_t = P_t - min(0, min_{s<=t} P_s) with
    # P = plain prefix sum: TWO order-free window aggregates in exact
    # integers, no recursion, engine-exact.
    oracle="""
    WITH x AS (
      SELECT user_id, epoch_us(ts) AS t, event_id,
             -- debit = a quarter of the cents via TRUNCATING integer
             -- div (DuckDB's decimal->BIGINT cast rounds, Spark's
             -- truncates — never cast a fractional decimal to int in
             -- a checked output)
             CASE WHEN event_type = 'purchase'
                  THEN CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)
                  ELSE -(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)
                         // 4)
             END AS delta
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    pf AS (
      SELECT user_id, t, event_id, delta,
             CAST(sum(delta) OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS pfx
      FROM x
    ),
    p AS (
      SELECT user_id, event_id, delta, pfx,
             CAST(min(pfx) OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS minpfx
      FROM pf
    )
    SELECT user_id, event_id, delta,
           CAST(pfx - least(0, minpfx) AS BIGINT) AS balance_cents
    FROM p
    """,
)
def inventory_running_balance_floor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X148 floor-at-zero running balance (credits from purchases,
    debits from errors, balance never negative): the classic
    NON-associative fold b_t = max(0, b_{t-1}+x_t), linearized by the
    prefix identity b_t = P_t − min(0, min_{s≤t} P_s) into two
    order-free exact-integer windows sharing one user exchange —
    the same linearize-the-recursion move as the EWMA entry."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("event_type").isin("purchase", "error")).select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            (F.col("value").cast("decimal(14,2)") * 100).cast("long"),
        ).otherwise(
            -F.expr(
                "CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) div 4"
            )
        ).alias("delta"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = x.select(
        "user_id",
        "t",
        "event_id",
        "delta",
        F.sum("delta").over(w).cast("long").alias("pfx"),
    ).withColumn("minpfx", F.min("pfx").over(w).cast("long"))
    return p.select(
        "user_id",
        "event_id",
        "delta",
        (F.col("pfx") - F.least(F.lit(0).cast("long"), F.col("minpfx")))
        .cast("long")
        .alias("balance_cents"),
    )


QUERIES["dedup_source_mix"]["oracle"] = QUERIES["dedup_source_mix"][
    "oracle"
].replace("{DS}", _DUCK_SHINGLES)


@register(
    "timeseries_autocorr_24h",
    # Daily-cycle strength: Pearson between the hourly series and its
    # 24h-lagged self on the zero-filled dense grid, from exact
    # moments (the X62/X138 discipline; cents are exact BIGINTs).
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts)
                  AS BIGINT) AS hr,
             CAST(sum(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM h GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM span
    ),
    dense AS (
      SELECT g.event_type, g.hr, coalesce(h.x, 0) AS x
      FROM grid g LEFT JOIN h ON g.event_type = h.event_type
                             AND g.hr = h.hr
    ),
    lagd AS (
      SELECT event_type, x,
             lag(x, 24) OVER (PARTITION BY event_type ORDER BY hr) AS y
      FROM dense
    ),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS DECIMAL(30,0)) AS sxy,
             CAST(sum(x * x) AS DECIMAL(30,0)) AS sxx,
             CAST(sum(y * y) AS DECIMAL(30,0)) AS syy
      FROM lagd WHERE y IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxy
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                 AS VARCHAR) AS DOUBLE)
           / sqrt(
               CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxx
                     - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                     AS VARCHAR) AS DOUBLE)
               * CAST(CAST(CAST(n AS DECIMAL(8,0)) * syy
                     - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                     AS VARCHAR) AS DOUBLE)
             ) AS autocorr_24h
    FROM m
    """,
)
def timeseries_autocorr_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X149 lag-24h autocorrelation of hourly value totals per type —
    the daily-cycle strength number that justifies (or falsifies) the
    seasonal-naive screen's 24/168h lags. Dense grid + one lag window
    + exact moments, bit-reproducible."""
    ev = load_table(spark, sf_dir, "events")
    d = F.unix_micros("ts") - F.unix_micros(
        F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    hourly = ev.groupBy(
        "event_type",
        ((d - d % 3_600_000_000) / F.lit(3_600_000_000))
        .cast("long")
        .alias("hr"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(14,2)")) * 100)
        .cast("long")
        .alias("x_cents")
    )
    from alerta_spark.ops.timeseries import seasonal_residual

    lagd = seasonal_residual(
        hourly, ["event_type"], "hr", "x_cents", period_hours=24
    ).select(
        "event_type", F.col("x_q").alias("x"), F.col("baseline_q").alias("y")
    )
    m = lagd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(30,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(30,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(30,0)").alias("syy"),
    )
    n8 = F.col("n").cast("decimal(8,0)")
    sx19 = F.col("sx").cast("decimal(19,0)")
    sy19 = F.col("sy").cast("decimal(19,0)")
    cov = (n8 * F.col("sxy") - sx19 * sy19).cast("string").cast("double")
    vx = (n8 * F.col("sxx") - sx19 * sx19).cast("string").cast("double")
    vy = (n8 * F.col("syy") - sy19 * sy19).cast("string").cast("double")
    return m.select(
        "event_type", "n", (cov / F.sqrt(vx * vy)).alias("autocorr_24h")
    )


@register(
    "stats_ks_two_sample",
    # Two-sample Kolmogorov-Smirnov statistic computed EXACTLY: the
    # max CDF gap over the combined support compares
    # |cum_a * n_b - cum_b * n_a| as BIGINTs (cross-multiplication —
    # no float CDFs); only the final D = gap / (n_a*n_b) is a single
    # division.
    oracle="""
    WITH v AS (
      SELECT CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS x,
             event_type = 'purchase' AS is_a
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    pts AS (
      SELECT x,
             CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      FROM v GROUP BY x
    ),
    t AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      FROM pts
    ),
    cum AS (
      SELECT x,
             CAST(sum(ca) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cuma,
             CAST(sum(cb) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cumb
      FROM pts
    )
    SELECT max(t.na) AS n_a, max(t.nb) AS n_b,
           CAST(max(abs(cuma * t.nb - cumb * t.na)) AS BIGINT) AS gap_num,
           CAST(max(abs(cuma * t.nb - cumb * t.na)) AS DOUBLE)
             / CAST(max(t.na) * max(t.nb) AS DOUBLE) AS ks_d
    FROM cum, t
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X150 exact two-sample Kolmogorov-Smirnov D between purchase and
    view value distributions: the max empirical-CDF gap with every
    comparison an integer cross-multiplication (float CDFs would tie-
    break differently per engine); distribution-shift testing joins
    the JSD/χ²-style screens. Support-sized frames only after one
    value aggregate; the cumsum runs over the distinct-value frame
    (column-derived constant partition key)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    v = ev.select(
        (F.col("value").cast("decimal(14,2)") * 100).cast("long").alias("x"),
        (F.col("event_type") == "purchase").alias("is_a"),
    )
    pts = v.groupBy("x").agg(
        F.sum(F.col("is_a").cast("long")).cast("long").alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).cast("long").alias("cb"),
    )
    t = pts.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    one = F.pmod(F.col("x"), F.lit(1))
    wcum = (
        W.partitionBy(one)
        .orderBy("x")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = pts.select(
        "x",
        F.sum("ca").over(wcum).cast("long").alias("cuma"),
        F.sum("cb").over(wcum).cast("long").alias("cumb"),
    )
    j = cum.crossJoin(F.broadcast(t))
    gap = F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
    return j.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.max(gap).cast("long").alias("gap_num"),
        (
            F.max(gap).cast("double")
            / (F.max("na") * F.max("nb")).cast("double")
        ).alias("ks_d"),
    )


@register(
    "stats_chi2_type_daypart",
    # Chi-square independence (event type x daypart): each cell's
    # term (O*N - R*C)^2 / (R*C*N) has an ALL-INTEGER numerator;
    # terms are fixed-point-quantized BIGINTs before the sum (a float
    # sum over cells would be partition-order ulp-dependent), one
    # double division at the end.
    oracle="""
    WITH c AS (
      SELECT event_type,
             CASE WHEN EXTRACT(hour FROM ts) < 6 THEN 'night'
                  WHEN EXTRACT(hour FROM ts) < 12 THEN 'morning'
                  WHEN EXTRACT(hour FROM ts) < 18 THEN 'afternoon'
                  ELSE 'evening' END AS daypart,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
    k AS (SELECT daypart, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
    t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c),
    terms AS (
      SELECT CAST(floor(
               CAST((c.o * t.n - r.rt * k.ct)
                    * (c.o * t.n - r.rt * k.ct) AS DOUBLE)
               / CAST(r.rt * k.ct AS DOUBLE) / CAST(t.n AS DOUBLE)
               * 1048576.0) AS BIGINT) AS tq
      FROM c JOIN r USING (event_type) JOIN k USING (daypart), t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(tq) AS BIGINT) AS chi2_q,
           CAST(sum(tq) AS DOUBLE) / 1048576.0 AS chi2
    FROM terms
    """,
)
def stats_chi2_type_daypart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X151 chi-square independence test (event type x daypart): is
    activity mix time-of-day dependent? Cell terms have all-integer
    numerators ((O·N − R·C)²), are quantized to BIGINT before the sum
    (cells arrive in partition order — a float sum would drift), and
    cross to double once. Contingency frames are category-bounded."""
    ev = load_table(spark, sf_dir, "events")
    daypart = (
        F.when(F.hour("ts") < 6, "night")
        .when(F.hour("ts") < 12, "morning")
        .when(F.hour("ts") < 18, "afternoon")
        .otherwise("evening")
    )
    c = ev.groupBy("event_type", daypart.alias("daypart")).agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    r = c.groupBy("event_type").agg(F.sum("o").cast("long").alias("rt"))
    k = c.groupBy("daypart").agg(F.sum("o").cast("long").alias("ct"))
    t = c.agg(F.sum("o").cast("long").alias("n"))
    j = (
        c.join(F.broadcast(r), "event_type")
        .join(F.broadcast(k), "daypart")
        .crossJoin(F.broadcast(t))
    )
    num = F.col("o") * F.col("n") - F.col("rt") * F.col("ct")
    tq = F.floor(
        (num * num).cast("double")
        / (F.col("rt") * F.col("ct")).cast("double")
        / F.col("n").cast("double")
        * F.lit(1048576.0)
    ).cast("long")
    return j.select(tq.alias("tq")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("tq").cast("long").alias("chi2_q"),
        (F.sum("tq").cast("double") / F.lit(1048576.0)).alias("chi2"),
    )


@register(
    "rules_selectivity_report",
    # Rule observability: per criteria, matched rows / total — the
    # selectivity that predicts scan cost and flags dead rules (0
    # matches) before they page nobody forever. Criteria compile
    # through the Trino shim; one conditional aggregate for ALL rules
    # (the fused-threshold scan shape).
    oracle="""
    SELECT r.rule_name,
           CAST((SELECT count(*) FROM events) AS BIGINT) AS n_scanned,
           CAST(CASE r.rule_name
             WHEN 'big_purchases' THEN
               (SELECT count(*) FROM events
                WHERE event_type = 'purchase'
                  AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 50)
             WHEN 'error_watch' THEN
               (SELECT count(*) FROM events WHERE event_type = 'error')
             WHEN 'dead_rule' THEN
               (SELECT count(*) FROM events
                WHERE event_type = 'no_such_type')
           END AS BIGINT) AS n_matched
    FROM (SELECT unnest(['big_purchases', 'error_watch', 'dead_rule'])
            AS rule_name) r
    """,
)
def rules_selectivity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X152 rule selectivity report: matched-row counts per rule
    criteria in ONE shared scan (conditional aggregates — the fused-
    threshold shape) — flags dead rules and predicts per-rule scan
    cost for scheduling. Criteria compile through the Trino dialect
    shim exactly as the engine runs them."""
    from alerta_spark.dialect import trino_to_spark

    ev = load_table(spark, sf_dir, "events")
    rules = {
        "big_purchases": (
            "event_type='purchase' AND "
            "CAST(json_extract_scalar(props,'$.k') AS INTEGER) > 50"
        ),
        "error_watch": "event_type='error'",
        "dead_rule": "event_type='no_such_type'",
    }
    flags = ev.select(
        *[
            F.expr(trino_to_spark(crit)).alias(f"_m_{name}")
            for name, crit in rules.items()
        ]
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_scanned"),
        *[
            F.sum(F.col(f"_m_{n}").cast("long")).cast("long").alias(f"_c_{n}")
            for n in rules
        ],
    )
    out = None
    for n in rules:
        row = agg.select(
            F.lit(n).alias("rule_name"),
            "n_scanned",
            F.col(f"_c_{n}").alias("n_matched"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "bootstrap_median_ci",
    # Deterministic binomial bootstrap: resample multiplicities come
    # from two md5 bits per (row, resample) — {0,1,2} with mean 1 —
    # so every replicate is a pure function of the data (rerun- and
    # engine-stable; RNG bootstraps are neither). Exact discrete
    # median per replicate (k-th smallest), spread across B=20
    # replicates reported.
    oracle="""
    WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS v FROM documents),
    m AS (
      SELECT b.b, d.v,
             CASE substr(md5(CAST(d.doc_id AS VARCHAR) || 'boot'
                             || CAST(b.b AS VARCHAR)), 1, 1)
               WHEN '0' THEN 0 WHEN '1' THEN 0 WHEN '2' THEN 0
               WHEN '3' THEN 0
               WHEN '4' THEN 2 WHEN '5' THEN 2 WHEN '6' THEN 2
               WHEN '7' THEN 2
               ELSE 1 END AS mult
      FROM d CROSS JOIN (SELECT unnest(generate_series(1, 20)) AS b) b
    ),
    ex AS (
      SELECT b, v FROM m, (SELECT unnest([1, 2]) AS i) ii
      WHERE ii.i <= mult
    ),
    med AS (
      SELECT b, v AS med FROM (
        SELECT b, v,
               row_number() OVER (PARTITION BY b ORDER BY v) AS rn,
               count(*) OVER (PARTITION BY b) AS n
        FROM ex
      ) WHERE rn = (n + 1) // 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_replicates,
           CAST(min(med) AS BIGINT) AS ci_lo,
           CAST(max(med) AS BIGINT) AS ci_hi,
           CAST(median(med) AS DOUBLE) AS med_of_meds
    FROM med
    """,
)
def bootstrap_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X153 deterministic bootstrap CI for the median doc length:
    B=20 binomial resamples whose multiplicities {0,1,2} come from
    md5 bits (pure row function — replicates are identical across
    engines, reruns, and retries, which an RNG bootstrap never is);
    exact k-th-smallest median per replicate, min/max spread = the
    CI. Fan-out bounded at 2·|docs|·B."""
    docs = load_table(spark, sf_dir, "documents")
    b = F.explode(F.sequence(F.lit(1), F.lit(20))).alias("b")
    m = docs.select(
        F.col("doc_id"), F.col("n_chars").cast("long").alias("v"), b
    ).select(
        "b",
        "v",
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("boot"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                1,
            ).isin("0", "1", "2", "3"),
            0,
        )
        .when(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("boot"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                1,
            ).isin("4", "5", "6", "7"),
            2,
        )
        .otherwise(1)
        .alias("mult"),
    )
    ex = m.select(
        "b", "v", F.explode(F.sequence(F.lit(1), F.lit(2))).alias("i")
    ).where(F.col("i") <= F.col("mult"))
    w = W.partitionBy("b").orderBy("v")
    med = (
        ex.select(
            "b",
            "v",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy("b")).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("b", F.col("v").alias("med"))
    )
    return med.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.min("med").cast("long").alias("ci_lo"),
        F.max("med").cast("long").alias("ci_hi"),
        F.expr("percentile(med, 0.5)").alias("med_of_meds"),
    )


@register(
    "abtest_cuped_adjusted",
    # CUPED variance reduction: adjusted metric Y - theta*(X - E[X])
    # with theta = cov(X,Y)/var(X) from exact-decimal moments; the
    # per-arm adjusted means assemble from exact sums in ONE fixed
    # tree, so both engines agree bit-for-bit.
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || 'ab'), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm,
             CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN CAST(value AS DECIMAL(14,2)) * 100
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN CAST(value AS DECIMAL(14,2)) * 100
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS DECIMAL(30,0)) AS sxy,
             CAST(sum(x * x) AS DECIMAL(30,0)) AS sxx
      FROM u
    ),
    th AS (
      SELECT n, sx, sy,
             CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxy
                   - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                   AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxx
                   - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                   AS VARCHAR) AS DOUBLE) AS theta,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x
      FROM g
    )
    SELECT u.arm, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(u.y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_y,
           (CAST(sum(u.y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             - max(th.theta)
               * ((CAST(sum(u.x) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                  - max(th.mean_x)) AS mean_y_cuped
    FROM u, th
    GROUP BY u.arm
    """,
)
def abtest_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X154 CUPED variance reduction (Deng et al. 2013): per-arm
    experiment metric adjusted by the pre-period covariate,
    Y − θ(X − E[X]) with θ = cov/var from exact-decimal moments —
    the standard sensitivity boost for online experiments, here
    bit-reproducible (moments exact, one double crossing per
    quantity, fixed expression trees)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.col("value").cast("decimal(14,2)") * 100
    pre = F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(pre, cents).otherwise(F.lit(0))).cast("long").alias("x"),
        F.sum(F.when(~pre, cents).otherwise(F.lit(0))).cast("long").alias("y"),
    ).select(
        F.when(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("ab"))),
                1,
                1,
            )
            < "8",
            "A",
        ).otherwise("B").alias("arm"),
        "x",
        "y",
    )
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(30,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(30,0)").alias("sxx"),
    )
    n8 = F.col("n").cast("decimal(8,0)")
    sx19 = F.col("sx").cast("decimal(19,0)")
    sy19 = F.col("sy").cast("decimal(19,0)")
    th = g.select(
        (
            (n8 * F.col("sxy") - sx19 * sy19).cast("string").cast("double")
            / (n8 * F.col("sxx") - sx19 * sx19).cast("string").cast("double")
        ).alias("theta"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias(
            "mean_x"
        ),
    )
    per_arm = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("asx"),
        F.sum("y").cast("long").alias("asy"),
    )
    j = per_arm.crossJoin(F.broadcast(th))
    mean_y = F.col("asy").cast("double") / F.col("n_users").cast("double")
    mean_x = F.col("asx").cast("double") / F.col("n_users").cast("double")
    return j.select(
        "arm",
        "n_users",
        mean_y.alias("mean_y"),
        (mean_y - F.col("theta") * (mean_x - F.col("mean_x"))).alias(
            "mean_y_cuped"
        ),
    )


@register(
    "orders_backlog_aging",
    # Open-order backlog aging vs the dataset horizon: exact integer
    # day ages bucketed by fixed edges; money exact in DECIMAL.
    oracle="""
    WITH h AS (SELECT max(o_orderdate) AS horizon FROM orders),
    o AS (
      SELECT o_orderkey, o_orderstatus,
             date_diff('day', o_orderdate, h.horizon) AS age_days,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders, h WHERE o_orderstatus <> 'F'
    )
    SELECT CASE WHEN age_days < 30 THEN '0-29'
                WHEN age_days < 90 THEN '30-89'
                WHEN age_days < 180 THEN '90-179'
                ELSE '180+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(price) AS DOUBLE) AS backlog_value
    FROM o GROUP BY 1
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X155 open-order backlog aging: non-filled orders bucketed by
    age against the dataset horizon with exact-DECIMAL value mass —
    the operations readout behind TPC-H Q4's priority counts. One
    broadcast horizon + one aggregate."""
    o = load_table(spark, sf_dir, "orders")
    h = o.agg(F.max("o_orderdate").alias("horizon"))
    j = (
        o.where(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(h))
        .select(
            F.datediff(F.col("horizon"), F.col("o_orderdate")).alias(
                "age_days"
            ),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
    )
    return j.groupBy(
        F.when(F.col("age_days") < 30, "0-29")
        .when(F.col("age_days") < 90, "30-89")
        .when(F.col("age_days") < 180, "90-179")
        .otherwise("180+")
        .alias("age_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("price").cast("double").alias("backlog_value"),
    )


@register(
    "discount_band_effectiveness",
    # Revenue and volume by discount band: exact DECIMAL revenue, the
    # integer band key from exact cents (never bucket a raw double).
    oracle="""
    WITH l AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)
               AS disc_pct,
             CAST(l_quantity AS DECIMAL(12,2)) AS qty,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(6,2))) AS rev
      FROM lineitem
    )
    SELECT disc_pct,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(qty) AS DOUBLE) AS total_qty,
           CAST(sum(CAST(rev AS DECIMAL(24,4))) AS DOUBLE) AS revenue
    FROM l GROUP BY disc_pct
    """,
)
def discount_band_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X156 discount-band effectiveness: items, quantity, and
    discounted revenue per discount percentage (the Q19-adjacent
    pricing readout); the band key is derived from exact DECIMAL
    cents — bucketing a raw double discount would band-flip at the
    ulp. One aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    l2 = li.select(
        (F.col("l_discount").cast("decimal(6,2)") * 100)
        .cast("long")
        .alias("disc_pct"),
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(6,2)"))
        ).alias("rev"),
    )
    return l2.groupBy("disc_pct").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("qty").cast("double").alias("total_qty"),
        F.sum(F.col("rev").cast("decimal(24,4)")).cast("double").alias(
            "revenue"
        ),
    )


@register(
    "supplier_concentration_hhi",
    # Herfindahl-Hirschman concentration of supplier revenue: each
    # share² term is quantized to BIGINT before the cross-supplier
    # sum (float share² sums drift with partition order); HHI on the
    # standard 0-10000 scale via one final division.
    oracle="""
    WITH r AS (
      SELECT l_suppkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(6,2))))
                  AS DECIMAL(24,4)) AS rev
      FROM lineitem GROUP BY l_suppkey
    ),
    t AS (SELECT CAST(sum(rev) AS DECIMAL(30,4)) AS total FROM r),
    q AS (
      SELECT CAST(floor(
               (CAST(CAST(r.rev AS VARCHAR) AS DOUBLE)
                / CAST(CAST(t.total AS VARCHAR) AS DOUBLE))
               * (CAST(CAST(r.rev AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(t.total AS VARCHAR) AS DOUBLE))
               * 10000.0 * 1048576.0) AS BIGINT) AS hq
      FROM r, t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(hq) AS BIGINT) AS hhi_q,
           CAST(sum(hq) AS DOUBLE) / 1048576.0 AS hhi
    FROM q
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X157 supplier concentration (HHI, 0-10000 scale): sum of
    squared revenue shares with each term fixed-point-quantized
    before the sum — the antitrust-style market-structure readout,
    bit-reproducible. Supplier-sized frames after one fact
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(6,2)"))
        ).cast("decimal(24,4)").alias("rev")
    )
    t = r.agg(F.sum("rev").cast("decimal(30,4)").alias("total"))
    share = F.col("rev").cast("string").cast("double") / F.col("total").cast(
        "string"
    ).cast("double")
    hq = F.floor(share * share * F.lit(10000.0) * F.lit(1048576.0)).cast(
        "long"
    )
    return (
        r.crossJoin(F.broadcast(t))
        .select(hq.alias("hq"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("hq").cast("long").alias("hhi_q"),
            (F.sum("hq").cast("double") / F.lit(1048576.0)).alias("hhi"),
        )
    )


@register(
    "corpus_novelty_rate",
    # Crawl-saturation readout: per ingestion bucket (50 docs by id),
    # the share of shingles whose FIRST occurrence is in that bucket.
    # First occurrence = min(doc_id) per shingle — one aggregate, no
    # ordered scan; counts exact.
    oracle="""
    WITH s AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest({DS}) AS sh FROM documents
      )
    ),
    f AS (SELECT sh, min(doc_id) AS first_doc FROM s GROUP BY sh),
    occ AS (
      SELECT s.doc_id // 50 AS bucket,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(count(*) FILTER (WHERE f.first_doc = s.doc_id) AS BIGINT)
               AS n_novel
      FROM s JOIN f USING (sh) GROUP BY 1
    )
    SELECT bucket, n_shingles, n_novel,
           CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE)
             AS novelty_rate
    FROM occ
    """,
)
def corpus_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X158 corpus novelty curve: per 50-doc ingestion bucket, the
    share of (doc, shingle) occurrences that are the shingle's FIRST
    appearance — the crawl-saturation signal (falling novelty says
    more of the same source adds nothing). First occurrence is one
    min(doc_id) aggregate on the shared shingle frame — no ordered
    scan, no running set."""
    from alerta_spark.ops.dedupe import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    s = shingle_rows(docs, "text", "doc_id", 5).select(
        F.col("_id").alias("doc_id"), F.col("shingle").alias("sh")
    )
    f = s.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    occ = (
        s.join(f, "sh")
        .groupBy(F.expr("doc_id div 50").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return occ.select(
        "bucket",
        "n_shingles",
        "n_novel",
        (
            F.col("n_novel").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("novelty_rate"),
    )


@register(
    "corpus_heaps_vocab_growth",
    # Heaps'-law curve: cumulative distinct vocabulary after each
    # 50-doc bucket — cumulative count of terms whose first bucket is
    # <= b, from the same one-aggregate first-occurrence frame.
    oracle="""
    WITH t AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                 x -> x <> '')) AS term
        FROM documents
      )
    ),
    f AS (SELECT term, min(doc_id) // 50 AS first_bucket FROM t GROUP BY term),
    nb AS (
      SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS new_terms
      FROM f GROUP BY 1
    )
    SELECT bucket, new_terms,
           CAST(sum(new_terms) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_vocab
    FROM nb
    """,
)
def corpus_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X159 Heaps'-law vocabulary growth: new and cumulative distinct
    terms per 50-doc ingestion bucket (sublinear growth is the
    expected law; a kink flags a source/domain shift). Bucket-sized
    cumsum under a column-derived constant partition key."""
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.explode(
            F.filter(tokenize(F.col("text")), lambda x: x != F.lit(""))
        ).alias("term"),
    ).distinct()
    f = t.groupBy("term").agg(
        F.expr("min(doc_id) div 50").alias("first_bucket")
    )
    nb = f.groupBy(F.col("first_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("new_terms")
    )
    one = F.pmod(F.col("bucket"), F.lit(1))
    return nb.select(
        "bucket",
        "new_terms",
        F.sum("new_terms")
        .over(
            W.partitionBy(one)
            .orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("long")
        .alias("cum_vocab"),
    )


QUERIES["corpus_novelty_rate"]["oracle"] = QUERIES["corpus_novelty_rate"][
    "oracle"
].replace("{DS}", _DUCK_SHINGLES)


@register(
    "spc_error_rate_control_chart",
    # p-chart (SPC): daily error share vs 3-sigma binomial control
    # limits around the overall rate. Limits are one fixed IEEE tree
    # of exact counts; the out-of-control flag compares the daily
    # rate against them (same tree both engines).
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS k
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT CAST(sum(k) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS pbar
      FROM d
    )
    SELECT day, n, k,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p_day,
           t.pbar - 3.0 * sqrt(t.pbar * (1.0 - t.pbar) / n) AS lcl,
           t.pbar + 3.0 * sqrt(t.pbar * (1.0 - t.pbar) / n) AS ucl,
           (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              > t.pbar + 3.0 * sqrt(t.pbar * (1.0 - t.pbar) / n))
           OR (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
               < t.pbar - 3.0 * sqrt(t.pbar * (1.0 - t.pbar) / n))
             AS out_of_control
    FROM d, t
    """,
)
def spc_error_rate_control_chart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X160 statistical process control (p-chart): daily error share
    vs 3σ binomial limits around the process mean — the ops-review
    chart that separates noise from signal before anyone tunes a
    threshold. One daily aggregate + broadcast overall rate; all
    comparisons identical fixed float trees."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("k"),
    )
    t = d.agg(
        (
            F.sum("k").cast("double") / F.sum("n").cast("double")
        ).alias("pbar")
    )
    j = d.crossJoin(F.broadcast(t))
    pd_ = F.col("k").cast("double") / F.col("n").cast("double")
    sig = F.sqrt(
        F.col("pbar") * (F.lit(1.0) - F.col("pbar")) / F.col("n")
    )
    lcl = F.col("pbar") - F.lit(3.0) * sig
    ucl = F.col("pbar") + F.lit(3.0) * sig
    return j.select(
        "day",
        "n",
        "k",
        pd_.alias("p_day"),
        lcl.alias("lcl"),
        ucl.alias("ucl"),
        ((pd_ > ucl) | (pd_ < lcl)).alias("out_of_control"),
    )


@register(
    "corpus_zipf_fit",
    # Zipf exponent: OLS slope of quantized-ln(freq) on quantized-
    # ln(rank) over the vocab frame — both logs fixed-point BIGINTs
    # (the lnq discipline), the regression from exact integer moments
    # (the X88 discipline), so the fitted slope is engine-exact.
    oracle="""
    WITH tf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS tf
      FROM (
        SELECT unnest(list_filter(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                 x -> x <> '')) AS term
        FROM documents
      ) GROUP BY term
    ),
    r AS (
      SELECT CAST(floor(ln(CAST(row_number()
                     OVER (ORDER BY tf DESC, term) AS DOUBLE))
                   * 1048576.0) AS BIGINT) AS lr,
             CAST(floor(ln(CAST(tf AS DOUBLE)) * 1048576.0) AS BIGINT) AS lf
      FROM tf
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lr) AS BIGINT) AS sx, CAST(sum(lf) AS BIGINT) AS sy,
             CAST(sum(lr * lf) AS DECIMAL(32,0)) AS sxy,
             CAST(sum(lr * lr) AS DECIMAL(32,0)) AS sxx
      FROM r
    )
    SELECT n,
           CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxy
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                 AS VARCHAR) AS DOUBLE)
           / CAST(CAST(CAST(n AS DECIMAL(8,0)) * sxx
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                 AS VARCHAR) AS DOUBLE) AS zipf_slope
    FROM m
    """,
)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X161 Zipf-law fit: OLS slope of log-frequency on log-rank over
    the vocabulary (natural text ~ -1; strong deviation flags
    templated/synthetic corpora) — every log fixed-point-quantized,
    the regression from exact moments. Vocab-sized frames only."""
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(
                F.filter(tokenize(F.col("text")), lambda x: x != F.lit(""))
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    one = F.pmod(F.col("tf"), F.lit(1))
    r = tf.select(
        F.floor(
            F.log(
                F.row_number()
                .over(W.partitionBy(one).orderBy(F.desc("tf"), F.asc("term")))
                .cast("double")
            )
            * F.lit(1048576.0)
        ).cast("long").alias("lr"),
        F.floor(F.log(F.col("tf").cast("double")) * F.lit(1048576.0))
        .cast("long")
        .alias("lf"),
    )
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lr").cast("long").alias("sx"),
        F.sum("lf").cast("long").alias("sy"),
        F.sum(F.col("lr") * F.col("lf")).cast("decimal(32,0)").alias("sxy"),
        F.sum(F.col("lr") * F.col("lr")).cast("decimal(32,0)").alias("sxx"),
    )
    n8 = F.col("n").cast("decimal(8,0)")
    sx19 = F.col("sx").cast("decimal(19,0)")
    sy19 = F.col("sy").cast("decimal(19,0)")
    return m.select(
        "n",
        (
            (n8 * F.col("sxy") - sx19 * sy19).cast("string").cast("double")
            / (n8 * F.col("sxx") - sx19 * sx19).cast("string").cast("double")
        ).alias("zipf_slope"),
    )


@register(
    "dedup_url_canonical",
    # Web-dedup's first move: canonicalize URLs (lowercase scheme+host,
    # strip fragment, drop tracking query params, trim trailing slash)
    # then group exact. Variants are planted from the X85 URL builder:
    # per base URL an ?utm_source tracked copy, a #fragment copy, and
    # an uppercase-host copy — all must collapse to one canonical
    # group. Pure string ops, identical regex semantics pinned.
    oracle="""
    WITH base AS (
      SELECT doc_id,
             'https://' || source || '/'
               || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS url
      FROM documents
    ),
    variants AS (
      SELECT doc_id, url FROM base
      UNION ALL
      SELECT doc_id + 10000, url || '?utm_source=feed&utm_campaign=x'
      FROM base WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 20000, url || '#section-2'
      FROM base WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 30000, replace(url, 'https://', 'HTTPS://')
      FROM base WHERE doc_id % 11 = 0
    ),
    canon AS (
      SELECT doc_id,
             rtrim(
               regexp_replace(
                 regexp_replace(
                   lower(split_part(split_part(url, '#', 1), '?', 1)),
                   '^http://', 'https://'),
                 '//+$', ''),
               '/') AS curl
      FROM variants
    )
    SELECT curl,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS canonical_id
    FROM canon GROUP BY curl HAVING count(*) > 1
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X162 URL canonicalization dedup: lowercase, strip fragment and
    query string, trim trailing slashes, then exact-group — the
    mandatory first pass of any web-crawl pipeline (tracking params
    and fragments mint infinite aliases of one page). Planted
    ?utm/#fragment/case variants must collapse onto their base URL;
    groups >1 reported with the min-id canonical. Map-only
    normalization + one digest-style aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("/"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
        ).alias("url"),
    )
    variants = (
        base
        .unionByName(
            base.where(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 10000).alias("doc_id"),
                F.concat(
                    "url", F.lit("?utm_source=feed&utm_campaign=x")
                ).alias("url"),
            )
        )
        .unionByName(
            base.where(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 20000).alias("doc_id"),
                F.concat("url", F.lit("#section-2")).alias("url"),
            )
        )
        .unionByName(
            base.where(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 30000).alias("doc_id"),
                F.regexp_replace("url", "^https://", "HTTPS://").alias("url"),
            )
        )
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(
                    F.split_part(
                        F.split_part(F.col("url"), F.lit("#"), F.lit(1)),
                        F.lit("?"),
                        F.lit(1),
                    )
                ),
                "^http://",
                "https://",
            ),
            "//+$",
            "",
        ),
        "/+$",  # pyspark rtrim has no trim-set arg; regex equivalent
        "",
    )
    canon = variants.select("doc_id", curl.alias("curl"))
    return (
        canon.groupBy("curl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.min("doc_id").cast("long").alias("canonical_id"),
        )
        .where(F.col("n_variants") > 1)
    )


@register(
    "privacy_l_diversity",
    # k-anonymity's complement: a combo can be large yet reveal the
    # sensitive attribute if every member shares it — flag quasi
    # combos whose DISTINCT sensitive-value count is below L. Exact
    # counts only.
    oracle="""
    SELECT source,
           CAST(n_chars // 200 AS BIGINT) AS len_bucket,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_sensitive_values
    FROM documents
    GROUP BY 1, 2
    HAVING count(DISTINCT lang) < 3
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X163 l-diversity screen (l=3, sensitive attribute = lang):
    quasi-identifier combos whose members expose fewer than 3 distinct
    sensitive values — the leak k-anonymity misses (a big group that
    is ALL one language still reveals the language). One distinct
    aggregate on the combo key."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(
        "source", F.expr("n_chars div 200").cast("long").alias("len_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct("lang").cast("long").alias("n_sensitive_values"),
    )
    return g.where(F.col("n_sensitive_values") < 3)


@register(
    "corpus_dup_token_inflation",
    # Dedup ROI in TOKENS: total token mass vs mass surviving the
    # canonical near-dup cut — the share of training compute duplicate
    # text would have burned. Composes the recursive-closure oracle.
    oracle="""
    WITH RECURSIVE s AS (SELECT doc_id, {DS} AS sh FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               t -> t <> '')) AS BIGINT) AS nt
      FROM documents
    ),
    m AS (
      SELECT t.doc_id, t.nt,
             coalesce(c.cluster_id, t.doc_id) = t.doc_id AS survives
      FROM toks t LEFT JOIN comp c ON t.doc_id = c.doc_id
    )
    SELECT CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN survives THEN nt ELSE 0 END) AS BIGINT)
             AS surviving_tokens,
           CAST(sum(CASE WHEN NOT survives THEN nt ELSE 0 END) AS BIGINT)
             AS duplicate_tokens,
           CAST(sum(CASE WHEN NOT survives THEN nt ELSE 0 END) AS DOUBLE)
             / CAST(sum(nt) AS DOUBLE) AS inflation_share
    FROM m
    """,
)
def corpus_dup_token_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X164 dedup ROI in tokens: the token mass the canonical near-dup
    cut removes — i.e. the share of training compute duplicates would
    have burned (the number that justifies the dedup stage's cost).
    Composes the cluster cut with one token aggregate."""
    from alerta_spark.ops.dedupe import dup_clusters, ngram_jaccard_pairs
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=5, threshold=0.8)
    clusters = dup_clusters(pairs)
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(tokenize(F.col("text")), lambda t: t != F.lit(""))
        ).cast("long").alias("nt"),
    )
    m = toks.join(clusters, "doc_id", "left").select(
        "nt",
        (
            F.coalesce("cluster_id", F.col("doc_id")) == F.col("doc_id")
        ).alias("survives"),
    )
    return m.agg(
        F.sum("nt").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("survives"), F.col("nt")).otherwise(0))
        .cast("long")
        .alias("surviving_tokens"),
        F.sum(F.when(~F.col("survives"), F.col("nt")).otherwise(0))
        .cast("long")
        .alias("duplicate_tokens"),
        (
            F.sum(
                F.when(~F.col("survives"), F.col("nt")).otherwise(0)
            ).cast("double")
            / F.sum("nt").cast("double")
        ).alias("inflation_share"),
    )


QUERIES["corpus_dup_token_inflation"]["oracle"] = QUERIES[
    "corpus_dup_token_inflation"
]["oracle"].replace("{DS}", _DUCK_SHINGLES)


@register(
    "users_value_gini",
    # Gini coefficient from the sorted-rank identity
    # G = (2*Σ i*x_i)/(n*Σx) - (n+1)/n over values sorted ascending:
    # both Σ terms are exact BIGINTs (cents x rank), the final
    # expression one fixed float tree. Completes the concentration
    # family (Pareto 80/20, HHI).
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT x,
             CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i
      FROM u
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(x) AS BIGINT) AS total_cents,
           CAST(sum(i * x) AS BIGINT) AS weighted_sum,
           (2.0 * CAST(sum(i * x) AS DOUBLE))
             / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
             - (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE)
             AS gini
    FROM r
    """,
)
def users_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X165 Gini coefficient of per-user value concentration — the
    inequality number beside Pareto-80/20 and HHI. Scale discipline:
    Σ i·x is within-tie-order invariant (x constant across a tie run,
    Σi over the run = (lo+hi)·t/2, an exact integer), so the global
    rank cumsum runs over the DISTINCT-cents frame (X186 doubled-
    midrank machinery) instead of a single-partition row_number over
    the user-sized frame; every accumulation stays an exact BIGINT."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (F.sum(F.col("value").cast("decimal(14,2)")) * 100)
        .cast("long")
        .alias("x")
    )
    g = u.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("t"))
    wc = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = g.select(
        "x",
        "t",
        F.sum("t").over(wc).cast("long").alias("hi"),
    ).select(
        "x",
        "t",
        # Σ ranks over the tie run: (lo+hi)*t/2 with lo = hi-t+1;
        # (2*hi-t+1)*t is always even, so the halving is exact
        ((F.lit(2) * F.col("hi") - F.col("t") + F.lit(1)) * F.col("t"))
        .alias("rank2_sum"),
    )
    # x·rank2_sum can exceed BIGINT at 10^9-user scale — accumulate
    # the dot product in DECIMAL(38) (overflow-proof pattern), one
    # narrowing cast on the way out
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    xr = d38(F.col("x")) * F.col("rank2_sum")
    return r.agg(
        F.sum("t").cast("long").alias("n_users"),
        F.sum(F.col("x") * F.col("t")).cast("long").alias("total_cents"),
        (F.sum(xr) / F.lit(2)).cast("long").alias("weighted_sum"),
        (
            F.sum(xr).cast("double")
            / (
                F.sum("t").cast("double")
                * F.sum(F.col("x") * F.col("t")).cast("double")
            )
            - (F.sum("t").cast("double") + F.lit(1.0))
            / F.sum("t").cast("double")
        ).alias("gini"),
    )


@register(
    "session_depth_distribution",
    # Histogram of events-per-session over the pinned sessionizer —
    # the engagement-shape readout beside bounce rate; exact counts.
    oracle="""
    WITH o AS (
      SELECT user_id, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new,
             epoch_us(ts) AS t
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS sid
      FROM o
    ),
    depth AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events
      FROM s GROUP BY user_id, sid
    )
    SELECT CASE WHEN n_events = 1 THEN '1'
                WHEN n_events <= 3 THEN '2-3'
                WHEN n_events <= 10 THEN '4-10'
                ELSE '11+' END AS depth_bucket,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events_total
    FROM depth GROUP BY 1
    """,
)
def session_depth_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X166 session-depth histogram (events per session, bucketed) —
    the engagement-shape readout next to bounce rate; one user
    exchange shared by the sessionizer window and the per-session
    count, then a tiny bucket aggregate."""
    from alerta_spark.ops.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, gap_minutes=30)
    depth = s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    return depth.groupBy(
        F.when(F.col("n_events") == 1, "1")
        .when(F.col("n_events") <= 3, "2-3")
        .when(F.col("n_events") <= 10, "4-10")
        .otherwise("11+")
        .alias("depth_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events_total"),
    )


@register(
    "trend_mann_kendall_daily",
    # Exact integer S and tie-corrected 18*Var(S); z is the only float
    # — a fixed tree of IEEE /, sqrt on identical BIGINTs per engine.
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT)
               AS x_cents
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT i.event_type,
             CAST(sum(CASE WHEN j.x_cents > i.x_cents THEN 1
                           WHEN j.x_cents < i.x_cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s,
             count(*) AS n_pairs
      FROM daily i JOIN daily j
        ON i.event_type = j.event_type AND i.day < j.day
      GROUP BY 1
    ),
    nn AS (
      SELECT event_type, count(*) AS n FROM daily GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             CAST(sum(cnt * (cnt - 1) * (2 * cnt + 5)) AS BIGINT) AS tie18
      FROM (
        SELECT event_type, x_cents, count(*) AS cnt
        FROM daily GROUP BY 1, 2
      ) GROUP BY 1
    ),
    m AS (
      SELECT s.event_type, nn.n, s.s,
             CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18
                  AS BIGINT) AS var18
      FROM s JOIN nn ON s.event_type = nn.event_type
             JOIN ties ON s.event_type = ties.event_type
    )
    SELECT event_type, n, s, var18,
           CASE WHEN var18 <= 0 THEN 0.0
                WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                                / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                                / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                ELSE 0.0 END AS z
    FROM m ORDER BY event_type
    """,
)
def trend_mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X167 Mann-Kendall monotonic-trend test on daily value totals per
    event type — the distribution-free 'is this metric drifting'
    screen that a single spike cannot flip (robust complement to
    trend_ols_daily_value). Pairwise stage runs on the PRE-AGGREGATED
    daily series (~30 rows/key), never the corpus."""
    from alerta_spark.ops.stats import mann_kendall

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(14,2)")) * 100)
        .cast("long")
        .alias("x_cents")
    )
    return mann_kendall(daily, ["event_type"], "day", "x_cents").orderBy(
        "event_type"
    )


@register(
    "trend_theil_sen_daily",
    # Every pairwise slope is (dy*1e6) // dt — truncating BIGINT
    # division, identical in both engines — and the lower median is an
    # exact rank cut: the whole estimator hash-checks.
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_idx,
             CAST(sum(CAST(value AS DECIMAL(14,2))) * 100 AS BIGINT)
               AS x_cents
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT i.event_type,
             ((j.x_cents - i.x_cents) * CAST(1000000 AS BIGINT))
               // (j.day_idx - i.day_idx) AS slope_q
      FROM daily i JOIN daily j
        ON i.event_type = j.event_type AND i.day_idx < j.day_idx
    ),
    ranked AS (
      SELECT event_type, slope_q,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope_q) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM pairs
    )
    SELECT event_type, n_pairs, slope_q AS median_slope_q
    FROM ranked WHERE rn = (n_pairs + 1) // 2
    ORDER BY event_type
    """,
)
def trend_theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X168 Theil–Sen robust slope of daily value totals per event
    type: median of all pairwise slopes (29% breakdown point). Slope
    unit: cents × 1e6 per day. Pairwise stage on the tiny daily
    series; one group-keyed exchange for the rank cut."""
    from alerta_spark.ops.stats import theil_sen

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day_idx"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(14,2)")) * 100)
        .cast("long")
        .alias("x_cents")
    )
    return theil_sen(daily, ["event_type"], "day_idx", "x_cents").orderBy(
        "event_type"
    )


@register(
    "events_burstiness_fano",
    # Gaps are exact µs integers (ordered lag window); ΣX BIGINT and
    # ΣX² DECIMAL(38,0) accumulate exactly; fano and Goh–Barabási B
    # are fixed IEEE trees on those integers (VARCHAR hop around
    # DuckDB's rounding decimal→double cast).
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    a AS (
      SELECT user_id, count(*) AS n_gaps,
             CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
             CAST(sum(CAST(gap_us AS DECIMAL(19,0))
                      * CAST(gap_us AS DECIMAL(19,0))) AS DECIMAL(38,0))
               AS sumsq
      FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
    ),
    m AS (
      SELECT user_id, n_gaps, sum_gap_us,
             CAST(CAST(CAST(n_gaps AS DECIMAL(38,0)) * sumsq
                       - CAST(sum_gap_us AS DECIMAL(38,0))
                       * CAST(sum_gap_us AS DECIMAL(38,0)) AS VARCHAR)
                  AS DOUBLE) AS var_num,
             CAST(n_gaps AS DOUBLE) AS nd,
             CAST(sum_gap_us AS DOUBLE) AS sd
      FROM a
    )
    SELECT user_id, n_gaps, sum_gap_us,
           CASE WHEN n_gaps > 1 AND sum_gap_us > 0
                THEN var_num / (nd * (nd - 1.0)) / (sd / nd) END AS fano,
           CASE WHEN n_gaps > 1
                     AND sqrt(var_num / (nd * (nd - 1.0))) + sd / nd > 0
                THEN (sqrt(var_num / (nd * (nd - 1.0))) - sd / nd)
                     / (sqrt(var_num / (nd * (nd - 1.0))) + sd / nd) END
             AS b
    FROM m ORDER BY user_id
    """,
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X169 per-user burstiness of inter-arrival times: Fano factor
    (variance/mean of gaps; 1 = Poisson, >1 = bursty) and Goh–Barabási
    B ∈ (−1,1) — the 'is this account a script' readout that pairs
    with anomaly_user_burst (which finds WHEN; this scores WHO). One
    user-keyed exchange shared by the lag window and the aggregate."""
    from alerta_spark.ops.stats import interarrival_dispersion

    ev = load_table(spark, sf_dir, "events")
    return interarrival_dispersion(ev, ["user_id"]).orderBy("user_id")


@register(
    "orders_fill_rate_monthly",
    # Pure integer counts per month bucket — the service-level
    # readout is division-free (emit numerators + denominator).
    oracle="""
    SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
           count(*) AS n_lines,
           CAST(sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_30,
           CAST(sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_60,
           CAST(sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_90
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def orders_fill_rate_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X170 shipping service level by order month: of each month's
    order lines, how many shipped within 30/60/90 days of the order
    date — the fulfillment-SLA trend (pairs with orders_backlog_aging,
    which reads the open tail; this reads the closed flow). One join
    shuffled on orderkey, then a tiny month aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dd = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    within = lambda d: F.sum(  # noqa: E731
        F.when(dd <= d, 1).otherwise(0)
    ).cast("long")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.date_format(
                F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"
            ).alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            within(30).alias("n_30"),
            within(60).alias("n_60"),
            within(90).alias("n_90"),
        )
        .orderBy("month")
    )


@register(
    "quality_expectations_report",
    # One row per contract rule; row-local rules are conditional sums
    # of a single aggregate (adding a rule adds a column, not a scan),
    # unique rules are count-minus-countDistinct. Pure integers.
    oracle="""
    WITH t AS (SELECT * FROM events),
    rl AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v0,
             CAST(sum(CASE WHEN value IS NOT NULL
                            AND NOT (value >= 0 AND value <= 1000)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             CAST(sum(CASE WHEN event_type IS NOT NULL
                            AND event_type NOT IN
                                ('click','view','purchase','signup')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v2,
             CAST(sum(CASE WHEN props IS NOT NULL
                            AND NOT regexp_matches(props, '^\\{')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v3,
             CAST(sum(CASE WHEN NOT (ts >= TIMESTAMP '2024-01-01')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v4
      FROM t
    ),
    u5 AS (
      SELECT count(*) AS n, count(*) - count(DISTINCT event_id) AS v
      FROM t WHERE event_id IS NOT NULL
    ),
    u6 AS (
      SELECT count(*) AS n, count(*) - count(DISTINCT user_id) AS v
      FROM t WHERE user_id IS NOT NULL
    )
    SELECT * FROM (
      SELECT 0 AS rule_idx, 'not_null' AS kind, 'user_id' AS col,
             n AS n_checked, v0 AS n_violations, v0 = 0 AS pass FROM rl
      UNION ALL SELECT 1, 'range', 'value', n, v1, v1 = 0 FROM rl
      UNION ALL SELECT 2, 'in_set', 'event_type', n, v2, v2 = 0 FROM rl
      UNION ALL SELECT 3, 'regex', 'props', n, v3, v3 = 0 FROM rl
      UNION ALL SELECT 4, 'expr', 'ts', n, v4, v4 = 0 FROM rl
      UNION ALL SELECT 5, 'unique', 'event_id', n,
                        CAST(v AS BIGINT), v = 0 FROM u5
      UNION ALL SELECT 6, 'unique', 'user_id', n,
                        CAST(v AS BIGINT), v = 0 FROM u6
    ) ORDER BY rule_idx
    """,
)
def quality_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X171 declarative data-contract validation: a rule LIST (the
    contract is data, not code) proved in one corpus pass — not_null,
    range, set-membership, regex, free-expr rules share ONE aggregate;
    unique rules add one grouped aggregate each. The gate an ingest
    orchestrator runs before a partition lands; pairs with
    quality_fk_integrity_audit (cross-table) and profile_column_stats
    (distributions). The in_set rule deliberately omits 'error' so a
    live violation count is exercised."""
    from alerta_spark.ops.expectations import validate_expectations

    ev = load_table(spark, sf_dir, "events")
    rules = [
        {"kind": "not_null", "col": "user_id"},
        {"kind": "range", "col": "value", "lo": 0, "hi": 1000},
        {
            "kind": "in_set",
            "col": "event_type",
            "values": ["click", "view", "purchase", "signup"],
        },
        {"kind": "regex", "col": "props", "pattern": "^\\{"},
        {"kind": "expr", "col": "ts", "expr": "ts >= TIMESTAMP '2024-01-01'"},
        {"kind": "unique", "col": "event_id"},
        {"kind": "unique", "col": "user_id"},
    ]
    return validate_expectations(ev, rules)


@register(
    "embedding_pca_power_pinned",
    # Two unnormalized power-iteration rounds over the exact integer
    # Gram matrix, all relational aggregation (see ops/cluster
    # docstring for the overflow budget); dir_ratio and lambda_est are
    # single IEEE divisions of identical exact operands (VARCHAR hop
    # around DuckDB's rounding decimal->double cast).
    oracle="""
    WITH q AS (
      SELECT vec_id AS v, pos,
             CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS xq
      FROM (
        SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings
      )
    ),
    s AS MATERIALIZED (
      SELECT a.pos - 1 AS i, b.pos - 1 AS j,
             CAST(sum(a.xq * b.xq) AS BIGINT) AS s
      FROM q a JOIN q b ON a.v = b.v
      GROUP BY 1, 2
    ),
    v1 AS (SELECT j, CAST(sum(s) AS BIGINT) AS v1 FROM s GROUP BY j),
    v2 AS (
      SELECT s.j,
             CAST(sum(CAST(s.s AS DECIMAL(38,0))
                      * CAST(vi.v1 AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS v2
      FROM s JOIN v1 vi ON vi.j = s.i
      GROUP BY s.j
    ),
    joined AS (SELECT v2.j, v2.v2, v1.v1 FROM v2 JOIN v1 ON v1.j = v2.j),
    mx AS (
      SELECT v2 AS vmax FROM joined ORDER BY abs(v2) DESC, j ASC LIMIT 1
    )
    SELECT j AS pos, v1 AS v1_q,
           CAST(CAST(v2 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(vmax AS VARCHAR) AS DOUBLE) AS dir_ratio,
           CAST(CAST(v2 AS VARCHAR) AS DOUBLE) / CAST(v1 AS DOUBLE)
             AS lambda_est
    FROM joined, mx ORDER BY pos
    """,
)
def embedding_pca_power_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X172 dominant principal direction of the embedding table —
    two pinned power-iteration rounds over the exact integer Gram
    matrix, entirely in aggregation shape (no linear-algebra library,
    no float accumulation): the 'is this embedding space collapsing'
    observability readout beside embedding_label_centroids and the
    int8 quantization report."""
    from alerta_spark.ops.cluster import pca_power_pinned

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_power_pinned(emb)


@register(
    "km_time_to_purchase",
    # Right-censored Kaplan-Meier over time-to-first-purchase with a
    # 48h observation window (synthetic users never churn, so lifetime
    # KM is degenerate here; conversion-time KM exercises real
    # censoring). Risk sets and event counts are exact integers; the
    # survival product rides as a cumsum of per-term
    # floor(ln((n-d)/n)*1e9); the n==d terminal point pins the
    # -100*scale sentinel instead of flooring -Infinity.
    oracle="""
    WITH f AS (
      SELECT user_id, min(epoch_us(ts)) AS f0 FROM events GROUP BY 1
    ),
    p AS (
      SELECT user_id, min(epoch_us(ts)) AS p0 FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    life AS (
      SELECT CASE WHEN p.p0 IS NOT NULL
                   AND (p.p0 - f.f0) // 3600000000 <= 48
                  THEN (p.p0 - f.f0) // 3600000000
                  ELSE 48 END AS t_days,
             (p.p0 IS NOT NULL
              AND (p.p0 - f.f0) // 3600000000 <= 48) AS churned
      FROM f LEFT JOIN p USING (user_id)
    ),
    per_t AS (
      SELECT t_days, count(*) AS c,
             CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
               AS d_churned
      FROM life GROUP BY t_days
    ),
    risked AS (
      SELECT t_days, d_churned,
             CAST(sum(c) OVER (ORDER BY t_days DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_at_risk
      FROM per_t
    ),
    terms AS (
      SELECT t_days, d_churned, n_at_risk,
             CASE
               WHEN d_churned > 0 AND n_at_risk > d_churned THEN
                 CAST(floor(ln(CAST(n_at_risk - d_churned AS DOUBLE)
                               / CAST(n_at_risk AS DOUBLE))
                            * 1000000000.0) AS BIGINT)
               WHEN d_churned > 0 AND n_at_risk = d_churned THEN
                 CAST(-100000000000 AS BIGINT)
               ELSE CAST(0 AS BIGINT)
             END AS term
      FROM risked
    ),
    curve AS (
      SELECT t_days, n_at_risk, d_churned,
             CAST(sum(term) OVER (ORDER BY t_days ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS survival_lnq
      FROM terms
    )
    SELECT t_days AS t_hours, n_at_risk, d_churned, survival_lnq,
           CAST(survival_lnq AS DOUBLE) / 1000000000.0 AS s_lnq_scaled
    FROM curve WHERE d_churned > 0 ORDER BY t_hours
    """,
)
def km_time_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X174 Kaplan-Meier time-to-conversion: survival curve of hours
    from a user's first event to their first purchase, right-censored
    at a 48h observation window — the statistically honest conversion
    readout when some users are still mid-window (a plain average of
    observed conversion times is biased toward the fast ones). One
    corpus scan + user aggregate; the estimator windows run over the
    hour-distribution frame (<= 49 rows)."""
    from alerta_spark.ops.sessions import km_curve

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    f0 = ev.groupBy("user_id").agg(F.min(us).alias("f0"))
    p0 = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(us).alias("p0"))
    )
    hours = F.expr("(p0 - f0) div 3600000000")
    converted = F.col("p0").isNotNull() & (hours <= 48)
    life = (
        f0.join(p0, "user_id", "left")
        .select(
            F.when(converted, hours).otherwise(F.lit(48)).alias("t"),
            converted.alias("ev"),
        )
    )
    return (
        km_curve(life, "t", "ev")
        .withColumnRenamed("t_days", "t_hours")
        .orderBy("t_hours")
    )


@register(
    "sessions_episode_pairs",
    # Ordered within-session episode (a -> b with positional gap <= 4):
    # the rank self-join fans out at most 4 rows per event, session
    # membership is a distinct count — all exact integers.
    oracle="""
    WITH se AS (
      SELECT user_id, event_id, event_type, ts,
             CAST(sum(CASE WHEN prev_us IS NULL
                            OR epoch_us(ts) - prev_us > 1800000000
                           THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_idx
      FROM (
        SELECT *, lag(epoch_us(ts)) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
      )
    ),
    ranked AS (
      SELECT user_id, session_idx, event_type,
             row_number() OVER (PARTITION BY user_id, session_idx
                                ORDER BY ts, event_id) AS rn
      FROM se
    ),
    tot AS (
      SELECT count(*) AS n_sessions FROM (
        SELECT DISTINCT user_id, session_idx FROM ranked
      )
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(DISTINCT a.user_id || '#' || a.session_idx)
               AS n_sessions_with
      FROM ranked a JOIN ranked b
        ON a.user_id = b.user_id AND a.session_idx = b.session_idx
       AND b.rn - a.rn BETWEEN 1 AND 4
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_sessions_with,
           CAST(n_sessions AS BIGINT) AS n_sessions_total
    FROM pairs, tot
    ORDER BY type_a, type_b
    """,
)
def sessions_episode_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X175 sequential episode mining: for every ordered event-type
    pair (a, b), the number of sessions where b follows a within 4
    session positions — the gapped-sequence complement to the Markov
    matrix (strictly adjacent) and co-occurrence lift (unordered).
    Rank self-join fans out <= 4 rows/event; session ids from the
    pinned sessionizer; one user exchange reused end to end."""
    from alerta_spark.ops.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    se = sessionize(ev, gap_minutes=30)
    w = W.partitionBy("user_id", "session_idx").orderBy("ts", "event_id")
    ranked = se.select(
        "user_id", "session_idx", "event_type", F.row_number().over(w).alias("rn")
    )
    tot = ranked.select("user_id", "session_idx").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions_total")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_idx") == F.col("b.session_idx"))
            & (F.col("b.rn") - F.col("a.rn") >= 1)
            & (F.col("b.rn") - F.col("a.rn") <= 4),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.countDistinct(
                F.concat_ws("#", F.col("a.user_id"), F.col("a.session_idx"))
            ).alias("n_sessions_with")
        )
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select("type_a", "type_b", "n_sessions_with", "n_sessions_total")
        .orderBy("type_a", "type_b")
    )


@register(
    "basket_brand_lift",
    # Market-basket over order lines: per-order distinct brands,
    # bounded pairwise fan-out inside each order; lift is ONE final
    # IEEE expression of four exact counts.
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT count(DISTINCT ok) AS n_orders FROM ob),
    ba AS (SELECT brand, count(*) AS n_b FROM ob GROUP BY brand),
    pr AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             count(*) AS n_ab
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT pr.brand_a, pr.brand_b, pr.n_ab,
           ba1.n_b AS n_a, ba2.n_b AS n_b,
           CAST(n.n_orders AS BIGINT) AS n_orders,
           CAST(pr.n_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
             / (CAST(ba1.n_b AS DOUBLE) * CAST(ba2.n_b AS DOUBLE)) AS lift
    FROM pr
    JOIN ba ba1 ON ba1.brand = pr.brand_a
    JOIN ba ba2 ON ba2.brand = pr.brand_b
    CROSS JOIN n
    WHERE pr.n_ab >= 5
    ORDER BY brand_a, brand_b
    """,
)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X176 market-basket affinity on the orders domain: brand pairs
    bought in the same order, with exact support counts and lift =
    P(ab)/(P(a)P(b)) as one final IEEE expression of four exact
    integers — events_cooccurrence_lift's shape applied to baskets.
    The pair join fans out only within an order (distinct brands per
    order, bounded by order size); brand marginals broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    ob = ob.persist()
    n = ob.select(F.countDistinct("ok").cast("long").alias("n_orders"))
    ba = ob.groupBy("brand").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    a, b = ob.alias("a"), ob.alias("b")
    pr = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    ba1 = ba.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("n_a"))
    ba2 = ba.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("n_b"))
    return (
        pr.join(F.broadcast(ba1), "brand_a")
        .join(F.broadcast(ba2), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_orders",
            (
                F.col("n_ab").cast("double") * F.col("n_orders").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy("brand_a", "brand_b")
    )


@register(
    "features_user_snapshot",
    # One scan, every (window, feature) a conditional aggregate; value
    # sums exact DECIMAL -> cents; countDistinct over CASE arguments
    # gives per-window distincts without extra scans.
    oracle="""
    WITH base AS (
      SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
    )
    SELECT user_id,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-25' - INTERVAL 7 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-25' - INTERVAL 7 DAY
                         THEN CAST(value AS DECIMAL(14,2))
                         ELSE CAST(0 AS DECIMAL(14,2)) END) * 100 AS BIGINT)
             AS value_cents_7d,
           CAST(count(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-25'
                                         - INTERVAL 7 DAY
                                    THEN CAST(ts AS DATE) END) AS BIGINT)
             AS active_days_7d,
           CAST(count(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-25'
                                         - INTERVAL 7 DAY
                                    THEN event_type END) AS BIGINT)
             AS n_types_7d,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-25' - INTERVAL 30 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_30d,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-25' - INTERVAL 30 DAY
                         THEN CAST(value AS DECIMAL(14,2))
                         ELSE CAST(0 AS DECIMAL(14,2)) END) * 100 AS BIGINT)
             AS value_cents_30d,
           CAST(count(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-25'
                                         - INTERVAL 30 DAY
                                    THEN CAST(ts AS DATE) END) AS BIGINT)
             AS active_days_30d,
           CAST(count(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-25'
                                         - INTERVAL 30 DAY
                                    THEN event_type END) AS BIGINT)
             AS n_types_30d,
           CAST(date_diff('day', CAST(max(ts) AS DATE), DATE '2024-01-25')
                AS BIGINT) AS days_since_last,
           CAST(date_diff('day', CAST(min(ts) AS DATE), DATE '2024-01-25')
                AS BIGINT) AS tenure_days
    FROM base GROUP BY user_id ORDER BY user_id
    """,
)
def features_user_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X177 point-in-time feature-store snapshot: per-user trailing
    7d/30d behavioral features AS OF a cutoff, leakage-safe (only
    ts < cutoff contributes) and computed in ONE scan + one user
    exchange — the training-table producer that pairs with
    scd2_point_in_time_join (dimension side) and km/growth readouts
    (label side)."""
    from alerta_spark.ops.features import feature_snapshot

    ev = load_table(spark, sf_dir, "events")
    return feature_snapshot(ev, "2024-01-25 00:00:00").orderBy("user_id")


@register(
    "sample_negative_pairs",
    # md5-mod picks over a dense rank index; self-collisions re-roll
    # to (pick+1) mod n — all integer/hex-exact on both engines.
    oracle="""
    WITH idx AS (
      SELECT doc_id AS nid,
             row_number() OVER (ORDER BY doc_id) - 1 AS r
      FROM (SELECT DISTINCT doc_id FROM documents)
    ),
    n AS (SELECT count(*) AS n FROM idx),
    anchors AS (
      SELECT d.doc_id AS anchor_id, s.slot, n.n
      FROM (SELECT DISTINCT doc_id FROM documents) d
      CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS slot) s
      CROSS JOIN n
    ),
    picked AS (
      SELECT anchor_id, slot, n,
             CAST('0x' || substring(md5(CAST(anchor_id AS VARCHAR) || ':'
                  || CAST(slot AS VARCHAR) || ':neg0'), 1, 15) AS BIGINT)
               % n AS p1
      FROM anchors
    ),
    cand AS (
      SELECT p.anchor_id, p.slot,
             i1.nid AS c1, i2.nid AS c2
      FROM picked p
      JOIN idx i1 ON i1.r = p.p1
      JOIN idx i2 ON i2.r = (p.p1 + 1) % p.n
    )
    SELECT anchor_id, slot,
           CASE WHEN c1 = anchor_id THEN c2 ELSE c1 END AS neg_id
    FROM cand ORDER BY anchor_id, slot
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X178 deterministic negative sampling for contrastive training:
    4 md5-keyed pseudo-random negatives per anchor document, identical
    across engines/retries/partitionings (resumable training pairs),
    anchor != negative guaranteed by the (pick+1) re-roll. Fan-out is
    exactly k rows per anchor; pick joins shuffle on a dense uniform
    rank key."""
    from alerta_spark.ops.sampling import negative_samples

    docs = load_table(spark, sf_dir, "documents")
    return negative_samples(docs, k=4, salt="neg0").orderBy(
        "anchor_id", "slot"
    )


@register(
    "graph_triangle_stats",
    # Ordered-edge triangle enumeration: a<b<c means each triangle is
    # produced exactly once; per-node counts unioned from the three
    # corners; clustering = one final division of exact ints.
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM ob),
    e AS (
      SELECT a.brand AS a, b.brand AS b
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY 1, 2
      HAVING count(*) * 1000 >= (SELECT n_orders FROM no) * 22
    ),
    tri AS (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
      SELECT a AS brand FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ),
    tcnt AS (SELECT brand, count(*) AS n_triangles FROM corners GROUP BY 1),
    ends AS (
      SELECT a AS brand FROM e UNION ALL SELECT b FROM e
    ),
    deg AS (SELECT brand, count(*) AS degree FROM ends GROUP BY 1)
    SELECT d.brand, CAST(d.degree AS BIGINT) AS degree,
           CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2 THEN
             CAST(2 * COALESCE(t.n_triangles, 0) AS DOUBLE)
             / CAST(d.degree * (d.degree - 1) AS DOUBLE)
           END AS clustering
    FROM deg d LEFT JOIN tcnt t USING (brand)
    ORDER BY brand
    """,
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X179 triangle counting + local clustering coefficient on the
    brand co-purchase graph (edges = brand pairs co-bought in >=2.2%
    of orders — a RELATIVE support cut, exact integer
    cross-multiply, so the graph stays comparably sparse at every
    corpus scale; from basket_brand_lift's bounded per-order fan-out). The
    classic a<b<c ordered-edge join enumerates each triangle once —
    the join-orientation trick that keeps the intermediate bounded by
    the edge orientation instead of degree^2; per-node counts come
    from unioning the three corners. Clustering coefficient is one
    final IEEE division of exact BIGINTs."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    no = ob.select(F.countDistinct("ok").cast("long").alias("n_orders"))
    oa, obb = ob.alias("x"), ob.alias("y")
    e = (
        oa.join(
            obb,
            (F.col("x.ok") == F.col("y.ok"))
            & (F.col("x.brand") < F.col("y.brand")),
        )
        .groupBy(F.col("x.brand").alias("a"), F.col("y.brand").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .crossJoin(F.broadcast(no))
        .where(F.col("_n") * 1000 >= F.col("n_orders") * 22)
        .select("a", "b")
        .persist()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("brand"))
        .unionByName(tri.select(F.col("b").alias("brand")))
        .unionByName(tri.select(F.col("c").alias("brand")))
    )
    tcnt = corners.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    ends = e.select(F.col("a").alias("brand")).unionByName(
        e.select(F.col("b").alias("brand"))
    )
    deg = ends.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return (
        deg.join(tcnt, "brand", "left")
        .select(
            "brand",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.when(
                F.col("degree") >= 2,
                (2 * F.coalesce("n_triangles", F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            ).alias("clustering"),
        )
        .orderBy("brand")
    )


@register(
    "features_target_encoding_loo",
    # LOO mean = (cat_sum - own) / (cat_n - 1): exact ints, one final
    # division; singleton categories NULL.
    oracle="""
    WITH base AS (
      SELECT o.o_orderkey,
             c.c_mktsegment AS segment,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS target
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    tot AS (
      SELECT segment, CAST(sum(target) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY segment
    )
    SELECT b.o_orderkey, b.segment, CAST(b.target AS BIGINT) AS target,
           CASE WHEN t.n > 1 THEN
             CAST(t.s - b.target AS DOUBLE) / CAST(t.n - 1 AS DOUBLE)
           END AS loo_enc
    FROM base b JOIN tot t USING (segment)
    ORDER BY o_orderkey
    """,
)
def features_target_encoding_loo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X180 leave-one-out target encoding: each order's market segment
    encoded as the urgent-order rate of the OTHER orders in that
    segment — the standard leakage-free categorical feature (a plain
    category mean would let a row see its own label). Category totals
    are a broadcast frame, not a window (see
    ops/features.target_encode_loo for the skew rationale)."""
    from alerta_spark.ops.features import target_encode_loo

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderpriority") == "1-URGENT").alias("_t"),
    )
    return target_encode_loo(
        base, "segment", F.col("_t"), "o_orderkey"
    ).orderBy("o_orderkey")


@register(
    "split_temporal_embargo",
    # Purged time split: train < cutoff, purged [cutoff, cutoff+e),
    # test >= cutoff+e; leak surface = users active on both sides.
    oracle="""
    WITH tagged AS (
      SELECT user_id,
             CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
                  WHEN ts < TIMESTAMP '2024-01-23 00:00:00' THEN 'purged'
                  ELSE 'test' END AS split
      FROM events
    ),
    u AS (
      SELECT user_id,
             max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
             max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
      FROM tagged GROUP BY user_id
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM tagged WHERE split = 'train')
        AS n_train,
      (SELECT CAST(count(*) AS BIGINT) FROM tagged WHERE split = 'purged')
        AS n_purged,
      (SELECT CAST(count(*) AS BIGINT) FROM tagged WHERE split = 'test')
        AS n_test,
      CAST(sum(in_train) AS BIGINT) AS users_train,
      CAST(sum(in_test) AS BIGINT) AS users_test,
      CAST(sum(in_train * in_test) AS BIGINT) AS users_in_both,
      CAST(sum(in_train * in_test) AS DOUBLE)
        / CAST(sum(in_test) AS DOUBLE) AS leak_share
    FROM u
    """,
)
def split_temporal_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X181 purged temporal split with embargo: train strictly before
    the cutoff, a 3-day embargo gap discarded, test after — the
    standard guard against trailing-window features leaking across
    the boundary (the embargo must exceed the longest feature
    window, cf. features_user_snapshot). The report quantifies the
    remaining entity-level leak surface: users appearing on BOTH
    sides (for whom per-user features still straddle). One scan +
    one user-key exchange + a 1-row global fold."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    end = F.lit("2024-01-23 00:00:00").cast("timestamp")
    tagged = ev.select(
        "user_id",
        F.when(F.col("ts") < cut, "train")
        .when(F.col("ts") < end, "purged")
        .otherwise("test")
        .alias("split"),
    )
    u = tagged.groupBy("user_id").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "in_train"
        ),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias(
            "in_test"
        ),
    )
    counts = tagged.agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "purged", 1).otherwise(0))
        .cast("long")
        .alias("n_purged"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )
    overlap = u.agg(
        F.sum("in_train").cast("long").alias("users_train"),
        F.sum("in_test").cast("long").alias("users_test"),
        F.sum(F.col("in_train") * F.col("in_test"))
        .cast("long")
        .alias("users_in_both"),
    )
    return counts.crossJoin(F.broadcast(overlap)).select(
        "n_train",
        "n_purged",
        "n_test",
        "users_train",
        "users_test",
        "users_in_both",
        (
            F.col("users_in_both").cast("double")
            / F.col("users_test").cast("double")
        ).alias("leak_share"),
    )


@register("stats_cohens_kappa", oracle=None)  # oracle set below
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X182 Cohen's kappa between the heuristic language ID and the
    ground-truth labels — chance-corrected agreement, the number you
    quote alongside text_langid_confusion's raw matrix. Algebra kept
    exact: kappa = (n·agree − Σ row_k·col_k) / (n² − Σ row_k·col_k),
    ONE final IEEE division of two exact BIGINTs (no intermediate
    p_o/p_e floats to accumulate). Marginals are class-sized frames;
    the only corpus-scale work is the prediction scan."""
    from alerta_spark.ops.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    joined = (
        docs.select("doc_id", "lang")
        .join(language_id(docs).select("doc_id", "lang_pred"), "doc_id")
        .persist()
    )
    tot = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("lang") == F.col("lang_pred"), 1).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    rows = joined.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    cols = joined.groupBy(F.col("lang_pred").alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pe = (
        rows.join(cols, "cls", "full_outer")
        .agg(
            F.sum(
                F.coalesce("r", F.lit(0)) * F.coalesce("c", F.lit(0))
            )
            .cast("long")
            .alias("pe_num")
        )
    )
    return tot.crossJoin(F.broadcast(pe)).select(
        "n",
        "n_agree",
        "pe_num",
        (
            (F.col("n") * F.col("n_agree") - F.col("pe_num")).cast("double")
            / (F.col("n") * F.col("n") - F.col("pe_num")).cast("double")
        ).alias("kappa"),
    )


QUERIES["stats_cohens_kappa"]["oracle"] = f"""
    WITH pred AS ({_lang_oracle()}),
    joined AS (
      SELECT d.lang, p.lang_pred FROM documents d JOIN pred p USING (doc_id)
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_agree
      FROM joined
    ),
    r AS (SELECT lang AS cls, count(*) AS r FROM joined GROUP BY 1),
    c AS (SELECT lang_pred AS cls, count(*) AS c FROM joined GROUP BY 1),
    pe AS (
      SELECT CAST(sum(COALESCE(r.r, 0) * COALESCE(c.c, 0)) AS BIGINT)
               AS pe_num
      FROM r FULL OUTER JOIN c USING (cls)
    )
    SELECT n, n_agree, pe_num,
           CAST(n * n_agree - pe_num AS DOUBLE)
             / CAST(n * n - pe_num AS DOUBLE) AS kappa
    FROM tot CROSS JOIN pe
    """


@register(
    "attribution_time_decay",
    # Hyperbolic time-decay weights hl/(hl+dt) as exact integral
    # divisions; credit split by weighted largest remainder so each
    # purchase's cents are conserved EXACTLY.
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS pt,
             CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS cid, user_id, epoch_us(ts) AS ct
      FROM events WHERE event_type = 'click'
    ),
    touch AS (
      SELECT p.pid, p.cents, c.cid,
             (CAST(1800000000 AS BIGINT) * CAST(1000000 AS BIGINT))
               // (CAST(1800000000 AS BIGINT) + (p.pt - c.ct)) AS wq
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ct < p.pt AND c.ct >= p.pt - 3600000000
    ),
    ranked AS (
      SELECT pid, cents, cid, wq,
             CAST(sum(wq) OVER (PARTITION BY pid) AS BIGINT) AS swq,
             row_number() OVER (PARTITION BY pid ORDER BY wq DESC, cid)
               AS rn
      FROM touch
    ),
    based AS (
      SELECT pid, cents, cid, rn,
             (cents * wq) // swq AS base,
             CAST(sum((cents * wq) // swq) OVER (PARTITION BY pid)
                  AS BIGINT) AS sbase
      FROM ranked
    ),
    credit AS (
      SELECT cid,
             base + CASE WHEN rn <= cents - sbase THEN 1 ELSE 0 END AS cr
      FROM based
    )
    SELECT cid AS click_event_id,
           CAST(count(*) AS BIGINT) AS n_purchases_touched,
           CAST(sum(cr) AS BIGINT) AS credit_cents
    FROM credit GROUP BY cid
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X183 time-decay multi-touch attribution: purchase cents split
    over the prior-hour clicks proportionally to a hyperbolic decay
    kernel w = hl/(hl+Δt) (30-min half-weight), with EXACT credit
    conservation — weights are integral divisions (BIGINT), each
    click's base credit is cents·w DIV Σw, and the remainder cents go
    to the highest-weight (most recent) touches first: the weighted
    largest-remainder extension of attribution_linear_multi_touch.
    Range join bounded by the 1h window; windows run per purchase
    over its bounded touch set."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.unix_micros("ts").alias("pt"),
        (F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        "user_id",
        F.unix_micros("ts").alias("ct"),
    )
    touch = (
        p.join(c, "user_id")
        .where(
            (F.col("ct") < F.col("pt"))
            & (F.col("ct") >= F.col("pt") - 3_600_000_000)
        )
        .select(
            "pid",
            "cents",
            "cid",
            F.expr(
                "(CAST(1800000000 AS BIGINT) * CAST(1000000 AS BIGINT))"
                " div (CAST(1800000000 AS BIGINT) + (pt - ct))"
            ).alias("wq"),
        )
    )
    wp = W.partitionBy("pid")
    ranked = touch.select(
        "pid",
        "cents",
        "cid",
        "wq",
        F.sum("wq").over(wp).cast("long").alias("swq"),
        F.row_number()
        .over(wp.orderBy(F.desc("wq"), F.asc("cid")))
        .alias("rn"),
    )
    based = ranked.select(
        "pid",
        "cents",
        "cid",
        "rn",
        F.expr("(cents * wq) div swq").alias("base"),
        F.sum(F.expr("(cents * wq) div swq"))
        .over(wp)
        .cast("long")
        .alias("sbase"),
    )
    return (
        based.select(
            "cid",
            (
                F.col("base")
                + F.when(
                    F.col("rn") <= F.col("cents") - F.col("sbase"), 1
                ).otherwise(0)
            ).alias("cr"),
        )
        .groupBy(F.col("cid").alias("click_event_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases_touched"),
            F.sum("cr").cast("long").alias("credit_cents"),
        )
    )


@register("text_rake_keyphrases", oracle=None)  # oracle set below
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X184 RAKE keyphrase extraction (Rose et al. 2010): candidate
    phrases are maximal runs between stopwords/punctuation; word
    score = degree/freq quantized to BIGINT BEFORE the phrase sum
    (no float accumulation); top-20 phrases by score. Complements
    tf-idf (single terms) and PMI (pairs) with multi-word unit
    extraction. Map-side splitting + vocab-sized aggregates only."""
    from alerta_spark.ops.text import rake_keyphrases

    docs = load_table(spark, sf_dir, "documents")
    return rake_keyphrases(docs, k=20)


def _rake_oracle() -> str:
    from alerta_spark.ops.text import RAKE_STOPWORDS

    pat = r"\b(?:%s)\b" % "|".join(RAKE_STOPWORDS)
    return f"""
    WITH norm AS (
      SELECT regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]+', '|', 'g'),
               '{pat}', '|', 'g') AS s
      FROM documents
    ),
    ph0 AS (
      SELECT trim(regexp_replace(unnest(string_split_regex(s, '\\|')),
                                 ' +', ' ', 'g')) AS phrase
      FROM norm
    ),
    ph AS (
      SELECT phrase FROM ph0
      WHERE phrase <> ''
        AND len(string_split(phrase, ' ')) <= 4
    ),
    pw AS (
      SELECT phrase,
             CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen,
             unnest(string_split(phrase, ' ')) AS w
      FROM ph
    ),
    wq AS (
      SELECT w,
             (CAST(sum(plen) AS BIGINT) * 1000000)
               // CAST(count(*) AS BIGINT) AS sq
      FROM pw GROUP BY w
    ),
    dp AS (
      SELECT phrase, CAST(count(*) AS BIGINT) AS phrase_freq
      FROM ph GROUP BY phrase
    ),
    dpw AS (
      SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM dp
    ),
    ps AS (
      SELECT d.phrase, CAST(sum(q.sq) AS BIGINT) AS score_q
      FROM dpw d JOIN wq q USING (w) GROUP BY d.phrase
    )
    SELECT p.phrase,
           CAST(len(string_split(p.phrase, ' ')) AS BIGINT) AS n_words,
           dp.phrase_freq, p.score_q
    FROM ps p JOIN dp USING (phrase)
    ORDER BY score_q DESC, phrase LIMIT 20
    """


QUERIES["text_rake_keyphrases"]["oracle"] = _rake_oracle()


def _bh_thresholds(m: int = 5, alpha: float = 0.05) -> list[float]:
    """|z| critical values for Benjamini-Hochberg at ranks 1..m:
    Phi^-1(1 - (i*alpha/m)/2). Computed once from the stdlib normal
    inverse CDF and embedded as IDENTICAL double literals in both the
    Spark plan and the DuckDB oracle — the comparison is then exact on
    both engines (no erf needed at query time)."""
    from statistics import NormalDist

    nd = NormalDist()
    return [nd.inv_cdf(1.0 - (i * alpha / m) / 2.0) for i in range(1, m + 1)]


@register("abtest_bh_fdr", oracle=None)  # oracle set below
def abtest_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X185 Benjamini-Hochberg FDR across a family of A/B tests: one
    two-proportion z per event type (arm = md5 band, conversion =
    high-k purchase), then the BH step-up on |z| — since p is
    monotone in |z|, p_(i) <= i*alpha/m is equivalent to |z|_(i) >=
    Phi^-1(1 - i*alpha/(2m)), so the procedure runs on precomputed
    double-literal thresholds and never evaluates erf in-engine.
    Reject ranks 1..k where k is the largest passing rank (the
    step-up: a type can be rejected on the strength of types below
    it). Family-sized frames after one events scan."""
    ev = load_table(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().select(
        "user_id",
        F.when(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("exp1"))),
                1,
                8,
            )
            < "80000000",
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    )
    conv = (
        ev.where(F.get_json_object("props", "$.k").cast("int") > 90)
        .select("event_type", "user_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    typed = ev.select("event_type", "user_id").distinct()
    # assign/conv are USER-sized frames: no broadcast hint — the join
    # shuffles on the user key and AQE may still broadcast at small sf
    cell = (
        typed.join(assign, "user_id")
        .join(conv, ["event_type", "user_id"], "left")
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce("_c", F.lit(0))).cast("long").alias("x"),
        )
    )
    wide = cell.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == "A", F.col("n"))).cast("long").alias("na"),
        F.sum(F.when(F.col("arm") == "A", F.col("x"))).cast("long").alias("xa"),
        F.sum(F.when(F.col("arm") == "B", F.col("n"))).cast("long").alias("nb"),
        F.sum(F.when(F.col("arm") == "B", F.col("x"))).cast("long").alias("xb"),
    )
    z = (
        F.col("xa").cast("double") / F.col("na").cast("double")
        - F.col("xb").cast("double") / F.col("nb").cast("double")
    ) / F.sqrt(
        ((F.col("xa") + F.col("xb")).cast("double") / (F.col("na") + F.col("nb")).cast("double"))
        * (
            F.lit(1.0)
            - (F.col("xa") + F.col("xb")).cast("double")
            / (F.col("na") + F.col("nb")).cast("double")
        )
        * (
            F.lit(1.0) / F.col("na").cast("double")
            + F.lit(1.0) / F.col("nb").cast("double")
        )
    )
    scored = wide.select("event_type", "na", "xa", "nb", "xb", z.alias("z"))
    rn = F.row_number().over(
        W.orderBy(F.desc(F.abs(F.col("z"))), F.asc("event_type"))
    )
    th = F.lit(None).cast("double")
    crit = _bh_thresholds()
    expr = None
    for i, c in enumerate(crit, start=1):
        expr = (
            F.when(F.col("bh_rank") == i, F.lit(c))
            if expr is None
            else expr.when(F.col("bh_rank") == i, F.lit(c))
        )
    ranked = scored.select("*", rn.alias("bh_rank")).select(
        "*", expr.alias("z_crit")
    )
    kmax = ranked.agg(
        F.max(
            F.when(F.abs(F.col("z")) >= F.col("z_crit"), F.col("bh_rank"))
        ).alias("_k")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            "event_type",
            "na",
            "xa",
            "nb",
            "xb",
            "z",
            "bh_rank",
            "z_crit",
            (F.col("bh_rank") <= F.coalesce("_k", F.lit(0))).alias("rejected"),
        )
        .orderBy("bh_rank")
    )


def _bh_oracle() -> str:
    crit = _bh_thresholds()
    case = " ".join(
        f"WHEN {i} THEN {c!r}" for i, c in enumerate(crit, start=1)
    )
    return f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || 'exp1'), 1, 8)
                       < '80000000' THEN 'A' ELSE 'B' END AS arm
      FROM events
    ),
    conv AS (SELECT DISTINCT event_type, user_id, 1 AS c FROM events
             WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90),
    typed AS (SELECT DISTINCT event_type, user_id FROM events),
    cell AS (
      SELECT t.event_type, a.arm, count(*) AS n,
             CAST(sum(COALESCE(c.c, 0)) AS BIGINT) AS x
      FROM typed t JOIN assign a USING (user_id)
      LEFT JOIN conv c ON c.event_type = t.event_type
                      AND c.user_id = t.user_id
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT event_type,
             CAST(sum(CASE WHEN arm = 'A' THEN n END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 'A' THEN x END) AS BIGINT) AS xa,
             CAST(sum(CASE WHEN arm = 'B' THEN n END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN arm = 'B' THEN x END) AS BIGINT) AS xb
      FROM cell GROUP BY event_type
    ),
    scored AS (
      SELECT *,
             (CAST(xa AS DOUBLE) / CAST(na AS DOUBLE)
              - CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE))
             / sqrt(
                 (CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                 * (1.0 - CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                 * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))
               ) AS z
      FROM wide
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY abs(z) DESC, event_type) AS bh_rank
      FROM scored
    ),
    crit AS (
      SELECT *, CAST(CASE bh_rank {case} END AS DOUBLE) AS z_crit FROM ranked
    ),
    k AS (
      SELECT max(CASE WHEN abs(z) >= z_crit THEN bh_rank END) AS kk
      FROM crit
    )
    SELECT event_type, na, xa, nb, xb, z, bh_rank, z_crit,
           bh_rank <= COALESCE(k.kk, 0) AS rejected
    FROM crit CROSS JOIN k
    ORDER BY bh_rank
    """


QUERIES["abtest_bh_fdr"]["oracle"] = _bh_oracle()


@register(
    "stats_mann_whitney_u",
    # Rank-sum with doubled midranks: r2 = lo_rank + hi_rank stays
    # BIGINT (no .5 floats), tie correction sum(t^3 - t) exact; the
    # z statistic is one fixed expression at the very end.
    oracle="""
    WITH pv AS (
      SELECT CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || 'exp1'), 1, 8)
                       < '80000000' THEN 'A' ELSE 'B' END AS arm
      FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a
      FROM pv GROUP BY cents
    ),
    r AS (
      SELECT *,
             CAST(sum(n_all) OVER (ORDER BY cents) AS BIGINT) AS hi,
             CAST(sum(n_all) OVER (ORDER BY cents) AS BIGINT) - n_all + 1
               AS lo
      FROM g
    ),
    s AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS n1,
             CAST(sum(n_all - n_a) AS BIGINT) AS n2,
             sum(CAST(n_a AS HUGEINT) * (lo + hi)) AS r1_2,
             sum(CAST(n_all AS HUGEINT) * n_all * n_all - n_all) AS ties
      FROM r
    )
    SELECT n1, n2, r1_2, ties,
           r1_2 - n1 * (n1 + 1) AS u1_2,
           CAST(r1_2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
           / (2.0 * sqrt(
               (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
               * (CAST(n1 + n2 + 1 AS DOUBLE)
                  - CAST(ties AS DOUBLE)
                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))
             )) AS z
    FROM s
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X186 Mann-Whitney U (Wilcoxon rank-sum) on purchase value by
    experiment arm — the nonparametric complement to the KS test
    (X150) and the z/CUPED family. Exactness discipline: midranks are
    kept as DOUBLED integers (lo+hi of each tie run), so rank sums,
    U, and the tie correction sum(t³−t) are all exact BIGINTs; the
    normal-approximation z is ONE final fixed expression. The global
    rank cumsum runs over the DISTINCT-VALUE frame (value-sized, not
    row-sized) — same shape as the KS/Gini readouts."""
    ev = load_table(spark, sf_dir, "events")
    pv = ev.where(F.col("event_type") == "purchase").select(
        (F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.when(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("exp1"))),
                1,
                8,
            )
            < "80000000",
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    )
    g = pv.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
    )
    wc = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = g.select(
        "*",
        F.sum("n_all").over(wc).cast("long").alias("hi"),
        (F.sum("n_all").over(wc) - F.col("n_all") + 1)
        .cast("long")
        .alias("lo"),
    )
    s = r.agg(
        F.sum("n_a").cast("long").alias("n1"),
        F.sum(F.col("n_all") - F.col("n_a")).cast("long").alias("n2"),
        F.sum(
            F.col("n_a").cast("decimal(38,0)")
            * (F.col("lo") + F.col("hi"))
        ).alias("r1_2"),
        F.sum(
            F.col("n_all").cast("decimal(38,0)")
            * F.col("n_all")
            * F.col("n_all")
            - F.col("n_all")
        ).alias("ties"),
    )
    return s.select(
        "n1",
        "n2",
        "r1_2",
        "ties",
        (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)).alias("u1_2"),
        (
            (
                F.col("r1_2")
                - F.col("n1") * (F.col("n1") + 1)
                - F.col("n1") * F.col("n2")
            ).cast("double")
            / (
                F.lit(2.0)
                * F.sqrt(
                    (
                        F.col("n1").cast("double")
                        * F.col("n2").cast("double")
                        / F.lit(12.0)
                    )
                    * (
                        (F.col("n1") + F.col("n2") + 1).cast("double")
                        - F.col("ties").cast("double")
                        / (
                            (F.col("n1") + F.col("n2")).cast("double")
                            * (F.col("n1") + F.col("n2") - 1).cast("double")
                        )
                    )
                )
            )
        ).alias("z"),
    )


@register(
    "graph_link_prediction_aa",
    # Wedge join through the shared neighbor; Adamic-Aalen-free exact
    # discipline: 1/ln(deg) quantized as 10^12 DIV lnq(deg), BIGINT
    # end to end; existing edges removed by anti-join.
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM ob),
    e AS (
      SELECT a.brand AS a, b.brand AS b
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY 1, 2
      HAVING count(*) * 1000 >= (SELECT n_orders FROM no) * 22
    ),
    adj AS (
      SELECT a AS v, b AS u FROM e UNION ALL SELECT b, a FROM e
    ),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY v),
    dq AS (
      SELECT v,
             CAST(1000000000000 AS BIGINT)
               // CAST(floor(ln(CAST(d AS DOUBLE)) * 1000000) AS BIGINT)
               AS aa_q
      FROM deg WHERE d >= 2
    ),
    wedge AS (
      SELECT x.u AS u, y.u AS w, x.v AS v
      FROM adj x JOIN adj y ON x.v = y.v AND x.u < y.u
    ),
    cand AS (
      SELECT wg.u, wg.w,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(dq.aa_q) AS BIGINT) AS adamic_adar_q
      FROM wedge wg JOIN dq ON dq.v = wg.v
      GROUP BY wg.u, wg.w
    )
    SELECT c.u AS brand_u, c.w AS brand_w, c.common_neighbors,
           c.adamic_adar_q
    FROM cand c
    WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = c.u AND e.b = c.w)
    ORDER BY adamic_adar_q DESC, brand_u, brand_w
    LIMIT 25
    """,
)
def graph_link_prediction_aa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X187 link prediction on the brand co-purchase graph:
    common-neighbor count and Adamic-Adar score for NON-adjacent
    pairs (the edges a recommender would propose next). The wedge
    join goes through the shared neighbor — cost Σ deg(v)², bounded
    by the degree cap the support threshold imposes, never all-pairs.
    1/ln(deg) is quantized via the repo's ln-fixed-point discipline
    (10^12 DIV floor(ln·10^6)) so scores are exact BIGINTs on both
    engines; existing edges drop via anti-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    no = ob.select(F.countDistinct("ok").cast("long").alias("n_orders"))
    oa, obb = ob.alias("x"), ob.alias("y")
    e = (
        oa.join(
            obb,
            (F.col("x.ok") == F.col("y.ok"))
            & (F.col("x.brand") < F.col("y.brand")),
        )
        .groupBy(F.col("x.brand").alias("a"), F.col("y.brand").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .crossJoin(F.broadcast(no))
        .where(F.col("_n") * 1000 >= F.col("n_orders") * 22)
        .select("a", "b")
        .persist()
    )
    adj = e.select(F.col("a").alias("v"), F.col("b").alias("u")).unionByName(
        e.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    dq = deg.where(F.col("d") >= 2).select(
        "v",
        F.expr(
            "CAST(1000000000000 AS BIGINT) div "
            "CAST(floor(ln(CAST(d AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("aa_q"),
    )
    x, y = adj.alias("wx"), adj.alias("wy")
    wedge = x.join(
        y,
        (F.col("wx.v") == F.col("wy.v")) & (F.col("wx.u") < F.col("wy.u")),
    ).select(
        F.col("wx.u").alias("u"), F.col("wy.u").alias("w"), F.col("wx.v").alias("v")
    )
    cand = (
        wedge.join(F.broadcast(dq), "v")
        .groupBy("u", "w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum("aa_q").cast("long").alias("adamic_adar_q"),
        )
    )
    return (
        cand.join(
            e,
            (cand["u"] == e["a"]) & (cand["w"] == e["b"]),
            "left_anti",
        )
        .select(
            F.col("u").alias("brand_u"),
            F.col("w").alias("brand_w"),
            "common_neighbors",
            "adamic_adar_q",
        )
        .orderBy(F.desc("adamic_adar_q"), "brand_u", "brand_w")
        .limit(25)
    )


@register(
    "recs_item_item_cosine",
    # Co-occurrence cosine n_ab/sqrt(n_a*n_b); ranking by exact
    # integer cross-multiplication n_ab^2 * n_a' * n_b' so the top-3
    # cut never depends on float rounding; cosine itself is one final
    # IEEE expression per emitted row.
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    ba AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_b FROM ob GROUP BY brand),
    pr AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand <> b.brand
      GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    sc AS (
      SELECT pr.brand_a, pr.brand_b, pr.n_ab,
             b1.n_b AS n_a, b2.n_b AS n_bb
      FROM pr
      JOIN ba b1 ON b1.brand = pr.brand_a
      JOIN ba b2 ON b2.brand = pr.brand_b
    ),
    rk AS (
      SELECT *, row_number() OVER (
               PARTITION BY brand_a
               ORDER BY CAST(n_ab AS HUGEINT) * n_ab * 1000000
                        / (CAST(n_a AS HUGEINT) * n_bb) DESC,
                        brand_b) AS rn
      FROM sc
    )
    SELECT brand_a, brand_b, n_ab, n_a, n_bb AS n_b,
           CAST(n_ab AS DOUBLE)
             / sqrt(CAST(n_a AS DOUBLE) * CAST(n_bb AS DOUBLE)) AS cosine,
           CAST(rn AS BIGINT) AS rank
    FROM rk WHERE rn <= 3
    ORDER BY brand_a, rn
    """,
)
def recs_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X188 item-item collaborative filtering: top-3 'customers who
    bought X also bought Y' per brand by co-occurrence cosine
    n_ab/√(n_a·n_b) — the recommendation face of the basket family
    (lift ranks association strength; cosine normalizes for item
    popularity). The top-3 cut ranks by the exact integer quantity
    n_ab²·10⁶/(n_a·n_b) (DECIMAL intermediate, integral division),
    NOT the float cosine, so the cut is bit-identical on both
    engines; the reported cosine is one final IEEE expression.
    Per-order bounded pair fan-out; marginals broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
        .persist()
    )
    ba = ob.groupBy("brand").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    a, b = ob.alias("a"), ob.alias("b")
    pr = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.brand") != F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    b1 = ba.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("n_a"))
    b2 = ba.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("n_bb"))
    sc = pr.join(F.broadcast(b1), "brand_a").join(F.broadcast(b2), "brand_b")
    key = F.expr(
        "CAST(n_ab AS DECIMAL(38,0)) * n_ab * 1000000"
        " div (CAST(n_a AS DECIMAL(38,0)) * n_bb)"
    )
    rk = sc.select(
        "*",
        F.row_number()
        .over(W.partitionBy("brand_a").orderBy(key.desc(), F.asc("brand_b")))
        .alias("rn"),
    )
    return (
        rk.where(F.col("rn") <= 3)
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            "n_a",
            F.col("n_bb").alias("n_b"),
            (
                F.col("n_ab").cast("double")
                / F.sqrt(F.col("n_a").cast("double") * F.col("n_bb").cast("double"))
            ).alias("cosine"),
            F.col("rn").cast("long").alias("rank"),
        )
        .orderBy("brand_a", "rank")
    )


@register(
    "abtest_diff_in_diff",
    # 2x2 cell sums exact (cents), four means as single divisions,
    # DiD one fixed arithmetic expression of the four.
    oracle="""
    WITH tagged AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || 'exp1'), 1, 8)
                       < '80000000' THEN 'T' ELSE 'C' END AS grp,
             CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                  THEN 'post' ELSE 'pre' END AS period,
             CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    cell AS (
      SELECT grp, period, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM tagged GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        (SELECT s FROM cell WHERE grp='T' AND period='pre')  AS st_pre,
        (SELECT n FROM cell WHERE grp='T' AND period='pre')  AS nt_pre,
        (SELECT s FROM cell WHERE grp='T' AND period='post') AS st_post,
        (SELECT n FROM cell WHERE grp='T' AND period='post') AS nt_post,
        (SELECT s FROM cell WHERE grp='C' AND period='pre')  AS sc_pre,
        (SELECT n FROM cell WHERE grp='C' AND period='pre')  AS nc_pre,
        (SELECT s FROM cell WHERE grp='C' AND period='post') AS sc_post,
        (SELECT n FROM cell WHERE grp='C' AND period='post') AS nc_post
    )
    SELECT st_pre, nt_pre, st_post, nt_post,
           sc_pre, nc_pre, sc_post, nc_post,
           (CAST(st_post AS DOUBLE) / CAST(nt_post AS DOUBLE)
            - CAST(st_pre AS DOUBLE) / CAST(nt_pre AS DOUBLE))
           - (CAST(sc_post AS DOUBLE) / CAST(nc_post AS DOUBLE)
              - CAST(sc_pre AS DOUBLE) / CAST(nc_pre AS DOUBLE))
             AS did_cents
    FROM wide
    """,
)
def abtest_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X189 difference-in-differences readout: mean purchase cents per
    (treatment-band, pre/post) cell and the DiD estimate
    (ΔT − ΔC) — the quasi-experimental companion to the z/CUPED/
    stratified A/B family. Cell sums are exact BIGINT cents from ONE
    scan; the four means are each a single division and DiD is one
    fixed arithmetic expression of them (identical tree both
    engines)."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type") == "purchase").select(
        F.when(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("exp1"))),
                1,
                8,
            )
            < "80000000",
            "T",
        )
        .otherwise("C")
        .alias("grp"),
        F.when(
            F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp"),
            "post",
        )
        .otherwise("pre")
        .alias("period"),
        (F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    cell = tagged.groupBy("grp", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    wide = cell.agg(
        *[
            F.sum(
                F.when(
                    (F.col("grp") == g) & (F.col("period") == p), F.col(c)
                )
            )
            .cast("long")
            .alias(f"{'s' if c == 's' else 'n'}{g.lower()}_{p}")
            for g in ("T", "C")
            for p in ("pre", "post")
            for c in ("s", "n")
        ]
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")  # noqa: E731
    return wide.select(
        F.col("st_pre"),
        F.col("nt_pre"),
        F.col("st_post"),
        F.col("nt_post"),
        F.col("sc_pre"),
        F.col("nc_pre"),
        F.col("sc_post"),
        F.col("nc_post"),
        (
            (mean("st_post", "nt_post") - mean("st_pre", "nt_pre"))
            - (mean("sc_post", "nc_post") - mean("sc_pre", "nc_pre"))
        ).alias("did_cents"),
    )


@register("classifier_calibration_bins", oracle=None)  # oracle set below
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X190 classifier reliability diagram: the heuristic langid's
    integer confidence score (stopword-marker hits) binned against
    empirical accuracy — the calibration readout you consult before
    thresholding lang_score in a filter pipeline. Scores are already
    exact integers so bins need no quantile pass; accuracy is one
    final division per bin. Completes the classifier-observability
    family (X69 confusion, X182 kappa)."""
    from alerta_spark.ops.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    pred = language_id(docs)
    joined = docs.select("doc_id", "lang").join(pred, "doc_id")
    return (
        joined.groupBy(F.col("lang_score"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("lang") == F.col("lang_pred"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            F.col("lang_score").cast("long").alias("lang_score"),
            "n_docs",
            "n_correct",
            (
                F.col("n_correct").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("accuracy"),
        )
        .orderBy("lang_score")
    )


QUERIES["classifier_calibration_bins"]["oracle"] = f"""
    WITH pred AS ({{LANG}}),
    joined AS (
      SELECT d.lang, p.lang_pred, p.lang_score
      FROM documents d JOIN pred p USING (doc_id)
    )
    SELECT CAST(lang_score AS BIGINT) AS lang_score,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
    FROM joined GROUP BY lang_score ORDER BY lang_score
    """.replace("{LANG}", _lang_oracle())


@register(
    "features_woe_iv",
    # WOE via quantized-ln difference of exact integer products,
    # IV as a BIGINT dot product with ONE final division.
    oracle="""
    WITH base AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               // 2000000 AS band,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t
      FROM orders
    ),
    cell AS (
      SELECT band, CAST(sum(t) AS BIGINT) AS n_urgent,
             CAST(count(*) - sum(t) AS BIGINT) AS n_other
      FROM base GROUP BY band
    ),
    tot AS (
      SELECT CAST(sum(n_urgent) AS BIGINT) AS tu,
             CAST(sum(n_other) AS BIGINT) AS tn
      FROM cell
    ),
    woe AS (
      SELECT band, n_urgent, n_other,
             CAST(floor(ln(CAST(n_urgent * tot.tn AS DOUBLE)) * 1000000)
                  AS BIGINT)
             - CAST(floor(ln(CAST(n_other * tot.tu AS DOUBLE)) * 1000000)
                  AS BIGINT) AS woe_q,
             tot.tu, tot.tn
      FROM cell CROSS JOIN tot
      WHERE n_urgent > 0 AND n_other > 0
    ),
    iv AS (
      SELECT sum((CAST(n_urgent AS HUGEINT) * tn - CAST(n_other AS HUGEINT) * tu) * woe_q)
               AS ivq,
             max(tu) AS tu, max(tn) AS tn
      FROM woe
    )
    SELECT w.band, w.n_urgent, w.n_other, w.woe_q,
           CAST(i.ivq AS DOUBLE)
             / (CAST(i.tu AS DOUBLE) * CAST(i.tn AS DOUBLE) * 1000000.0)
             AS iv_total
    FROM woe w CROSS JOIN iv i
    ORDER BY w.band
    """,
)
def features_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X191 weight-of-evidence binning + information value: the
    credit-scoring feature transform — order price banded (exact cent
    integer division, no quantile pass), per-band WOE =
    ln(urgent_share/other_share) computed as a DIFFERENCE of
    quantized-ln BIGINTs of exact integer products (the repo's ln
    discipline: never subtract floats), IV = Σ(p_u−p_o)·WOE as an
    exact BIGINT dot product with ONE final division. Zero-sided
    bands are excluded (standard WOE practice; at production scale,
    merge or Laplace-smooth them)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"
            " div 2000000"
        ).alias("band"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("t"),
    )
    cell = base.groupBy("band").agg(
        F.sum("t").cast("long").alias("n_urgent"),
        (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("n_other"),
    )
    tot = cell.agg(
        F.sum("n_urgent").cast("long").alias("tu"),
        F.sum("n_other").cast("long").alias("tn"),
    )
    woe = (
        cell.crossJoin(F.broadcast(tot))
        .where((F.col("n_urgent") > 0) & (F.col("n_other") > 0))
        .select(
            "band",
            "n_urgent",
            "n_other",
            (
                F.floor(
                    F.log((F.col("n_urgent") * F.col("tn")).cast("double"))
                    * 1000000
                ).cast("long")
                - F.floor(
                    F.log((F.col("n_other") * F.col("tu")).cast("double"))
                    * 1000000
                ).cast("long")
            ).alias("woe_q"),
            "tu",
            "tn",
        )
    )
    iv = woe.agg(
        F.sum(
            (
                F.col("n_urgent").cast("decimal(38,0)") * F.col("tn")
                - F.col("n_other").cast("decimal(38,0)") * F.col("tu")
            )
            * F.col("woe_q")
        )
        .alias("ivq"),
        F.max("tu").alias("tu"),
        F.max("tn").alias("tn"),
    )
    return (
        woe.select("band", "n_urgent", "n_other", "woe_q")
        .crossJoin(F.broadcast(iv))
        .select(
            "band",
            "n_urgent",
            "n_other",
            "woe_q",
            (
                F.col("ivq").cast("double")
                / (
                    F.col("tu").cast("double")
                    * F.col("tn").cast("double")
                    * F.lit(1000000.0)
                )
            ).alias("iv_total"),
        )
        .orderBy("band")
    )


def _sprt_constants(**kw) -> dict:
    from alerta_spark.ops.stats import sprt_constants

    return sprt_constants(**kw)


@register("abtest_sprt_sequential", oracle=None)  # oracle set below
def abtest_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X193 Wald sequential probability-ratio test, one monitor per
    event type: each event's high-k outcome adds a precomputed
    quantized-ln increment to the type's log-likelihood ratio; the
    test stops at the FIRST boundary crossing (reject_h0 at A,
    accept_h0 at B) — the always-valid alternative to the fixed-n z
    family (X65/X185), and the op an alerting engine would run
    streaming. All arithmetic after the Python-literal constants is
    exact BIGINT; the crossing index is found with one min-over-
    flagged-rows aggregate sharing the cumsum's type-key exchange."""
    from alerta_spark.ops.stats import sprt_scan

    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.get_json_object("props", "$.k").cast("int") > 90, 1
        )
        .otherwise(0)
        .alias("x"),
    )
    return (
        sprt_scan(tagged, _sprt_constants())
        .drop("llr_q_final")
        .orderBy("event_type")
    )


def _sprt_oracle() -> str:
    k = _sprt_constants()
    return f"""
    WITH tagged AS (
      SELECT event_type, ts, event_id,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER)
                       > 90 THEN 1 ELSE 0 END AS x
      FROM events
    ),
    run AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn,
             CAST(sum(x * ({k['w1']}) + (1 - x) * ({k['w0']}))
                  OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS llr_q
      FROM tagged
    ),
    crossed AS (
      SELECT *,
             llr_q >= {k['a']} OR llr_q <= {k['b']} AS hit
      FROM run
    ),
    first AS (
      SELECT event_type, CAST(min(rn) AS BIGINT) AS n_at_decision
      FROM crossed WHERE hit GROUP BY event_type
    ),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_total
      FROM crossed GROUP BY event_type
    )
    SELECT t.event_type, t.n_total, f.n_at_decision,
           c.llr_q AS llr_q_at_decision,
           CASE WHEN c.llr_q >= {k['a']} THEN 'reject_h0'
                WHEN c.llr_q <= {k['b']} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM tot t
    LEFT JOIN first f USING (event_type)
    LEFT JOIN crossed c
      ON c.event_type = t.event_type AND c.rn = f.n_at_decision
    ORDER BY t.event_type
    """


QUERIES["abtest_sprt_sequential"]["oracle"] = _sprt_oracle()


@register(
    "labels_churn_horizon",
    # The label side of the training table: churned = no activity in
    # (cutoff, cutoff+horizon]; features may only read ts < cutoff
    # (features_user_snapshot), labels only the horizon — the same
    # cutoff literal on both sides makes the join leakage-safe by
    # construction.
    oracle="""
    WITH pre AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
    ),
    act AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        AND ts < TIMESTAMP '2024-01-30 00:00:00'
    )
    SELECT p.user_id,
           CASE WHEN a.user_id IS NULL THEN 1 ELSE 0 END AS churned
    FROM pre p LEFT JOIN act a USING (user_id)
    ORDER BY p.user_id
    """,
)
def labels_churn_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X194 churn label builder: for every user active BEFORE the
    cutoff, churned = zero events in the (cutoff, cutoff+5d] horizon —
    the label column that joins 1:1 onto features_user_snapshot (same
    cutoff) to form the supervised training table; the horizon is the
    label's exclusive territory, mirroring the snapshot's ts < cutoff
    discipline. Two distinct-user semi-aggregates + one left join on
    the user key."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-25 00:00:00").cast("timestamp")
    end = F.lit("2024-01-30 00:00:00").cast("timestamp")
    pre = ev.where(F.col("ts") < cut).select("user_id").distinct()
    act = (
        ev.where((F.col("ts") >= cut) & (F.col("ts") < end))
        .select("user_id")
        .distinct()
        .withColumn("_a", F.lit(1))
    )
    return (
        pre.join(act, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("_a").isNull(), 1).otherwise(0).alias("churned"),
        )
        .orderBy("user_id")
    )


@register(
    "features_psi_drift",
    # PSI = sum (p_i - q_i) ln(p_i/q_i): per band an exact BIGINT
    # cross product (a_i*tb - b_i*ta) times the quantized-ln
    # difference, ONE final division — the WOE/IV algebra applied to
    # distribution monitoring.
    oracle="""
    WITH tagged AS (
      SELECT CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)
               // 1000 AS band,
             CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                  THEN 'a' ELSE 'b' END AS period
      FROM events
    ),
    cell AS (
      SELECT band,
             CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
      FROM tagged GROUP BY band
    ),
    tot AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS ta,
             CAST(sum(n_b) AS BIGINT) AS tb
      FROM cell
    ),
    woe AS (
      SELECT band, n_a, n_b,
             CAST(floor(ln(CAST(n_a * tot.tb AS DOUBLE)) * 1000000)
                  AS BIGINT)
             - CAST(floor(ln(CAST(n_b * tot.ta AS DOUBLE)) * 1000000)
                  AS BIGINT) AS lr_q,
             tot.ta, tot.tb
      FROM cell CROSS JOIN tot
      WHERE n_a > 0 AND n_b > 0
    ),
    psi AS (
      SELECT sum((CAST(n_a AS HUGEINT) * tb - CAST(n_b AS HUGEINT) * ta) * lr_q) AS psiq,
             max(ta) AS ta, max(tb) AS tb,
             CAST(count(*) AS BIGINT) AS n_bands
      FROM woe
    )
    SELECT n_bands, ta AS n_baseline, tb AS n_current,
           CAST(psiq AS DOUBLE)
             / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) * 1000000.0)
             AS psi
    FROM psi
    """,
)
def features_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X195 population stability index between the pre/post-Jan-15
    value distributions — the standard deployed-model drift monitor
    (PSI > 0.2 = retrain). Same exactness algebra as features_woe_iv:
    band shares never materialize as floats; PSI is an exact BIGINT
    dot product of cross-count differences with quantized-ln ratios,
    ONE final division. One scan + band-sized frames."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.expr(
            "CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) div 1000"
        ).alias("band"),
        F.when(
            F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"),
            "a",
        )
        .otherwise("b")
        .alias("period"),
    )
    cell = tagged.groupBy("band").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    tot = cell.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    woe = (
        cell.crossJoin(F.broadcast(tot))
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "n_a",
            "n_b",
            "ta",
            "tb",
            (
                F.floor(
                    F.log((F.col("n_a") * F.col("tb")).cast("double"))
                    * 1000000
                ).cast("long")
                - F.floor(
                    F.log((F.col("n_b") * F.col("ta")).cast("double"))
                    * 1000000
                ).cast("long")
            ).alias("lr_q"),
        )
    )
    return woe.agg(
        F.count(F.lit(1)).cast("long").alias("n_bands"),
        F.max("ta").cast("long").alias("n_baseline"),
        F.max("tb").cast("long").alias("n_current"),
        (
            F.sum(
                (
                    F.col("n_a").cast("decimal(38,0)") * F.col("tb")
                    - F.col("n_b").cast("decimal(38,0)") * F.col("ta")
                )
                * F.col("lr_q")
            ).cast("double")
            / (
                F.max("ta").cast("double")
                * F.max("tb").cast("double")
                * F.lit(1000000.0)
            )
        ).alias("psi"),
    ).select("n_bands", "n_baseline", "n_current", "psi")


def _ndcg_discounts(k: int = 10) -> list[int]:
    """Quantized DCG position discounts floor(1e9/log2(i+1)) for
    i=1..k — Python-literal constants embedded identically in both
    engines, so DCG is an exact BIGINT dot product."""
    import math

    return [math.floor(1e9 / math.log2(i + 1)) for i in range(1, k + 1)]


@register("retrieval_ndcg_eval", oracle=None)  # oracle set below
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X196 ranking-quality evaluation of the IVF ANN path against
    brute-force ground truth: per query, recall@10 (exact overlap
    count) and nDCG@10 with graded relevance rel = 11 − true_rank.
    The log2 position discounts are quantized Python literals, DCG is
    an exact BIGINT dot product, IDCG a precomputed constant, and
    nDCG ONE final division — so the eval is hash-exact even though
    it scores float-ranked lists. The eval-harness face of the ANN
    family: run it after retraining centroids to catch recall
    regressions before serving."""
    from alerta_spark.ops.similarity import cosine_topk, ivf_topk_pinned

    k = 10
    disc = _ndcg_discounts(k)
    idcg = sum((k + 1 - i) * d for i, d in enumerate(disc, start=1))
    emb = load_table(spark, sf_dir, "embeddings")

    def ranked(df, rank_name):
        return df.select(
            "query_id",
            "neighbor_id",
            F.row_number()
            .over(
                W.partitionBy("query_id").orderBy(
                    F.desc("cos"), F.asc("neighbor_id")
                )
            )
            .alias(rank_name),
        )

    truth = ranked(cosine_topk(emb, _TOPK_QUERY_IDS, k=k), "true_rank")
    sys = ranked(ivf_topk_pinned(emb, _TOPK_QUERY_IDS, k=k), "sys_rank")
    dcase = None
    for i, d in enumerate(disc, start=1):
        lit = F.lit(d).cast("long")
        dcase = (
            F.when(F.col("sys_rank") == i, lit)
            if dcase is None
            else dcase.when(F.col("sys_rank") == i, lit)
        )
    joined = sys.join(truth, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        "sys_rank",
        F.coalesce(F.lit(k + 1) - F.col("true_rank"), F.lit(0))
        .cast("long")
        .alias("rel"),
        dcase.alias("disc_q"),
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
            .cast("long")
            .alias("hits_at_10"),
            F.sum(F.col("rel") * F.col("disc_q")).cast("long").alias("dcg_q"),
        )
        .select(
            "query_id",
            "hits_at_10",
            "dcg_q",
            (F.col("dcg_q").cast("double") / F.lit(float(idcg))).alias(
                "ndcg_at_10"
            ),
        )
        .orderBy("query_id")
    )


def _ndcg_oracle() -> str:
    k = 10
    disc = _ndcg_discounts(k)
    idcg = sum((k + 1 - i) * d for i, d in enumerate(disc, start=1))
    dcase = " ".join(f"WHEN {i} THEN {d}" for i, d in enumerate(disc, 1))
    truth_sql = QUERIES["similarity_cosine_topk"]["oracle"]
    sys_sql = QUERIES["similarity_ivf_pinned"]["oracle"]
    return f"""
    WITH truth0 AS ({truth_sql}),
    sys0 AS ({sys_sql}),
    truth AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id)
               AS true_rank
      FROM truth0
    ),
    sys AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id)
               AS sys_rank
      FROM sys0
    ),
    joined AS (
      SELECT s.query_id, s.sys_rank,
             COALESCE({k + 1} - t.true_rank, 0) AS rel,
             CASE s.sys_rank {dcase} END AS disc_q
      FROM sys s LEFT JOIN truth t
        ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
    )
    SELECT query_id,
           CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_at_10,
           CAST(sum(rel * disc_q) AS BIGINT) AS dcg_q,
           CAST(sum(rel * disc_q) AS DOUBLE) / {float(idcg)!r}
             AS ndcg_at_10
    FROM joined GROUP BY query_id ORDER BY query_id
    """


QUERIES["retrieval_ndcg_eval"]["oracle"] = _ndcg_oracle()


@register(
    "privacy_t_closeness",
    # EMD for an ordered sensitive attribute = mean |cumulative share
    # gap|: cumsums of exact cross-multiplied counts, ONE final
    # division per group.
    oracle="""
    WITH base AS (
      SELECT c.c_mktsegment AS segment,
             CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               // 2000000 AS band
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    bands AS (SELECT DISTINCT band FROM base),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM bands),
    segs AS (
      SELECT segment, CAST(count(*) AS BIGINT) AS n_g FROM base
      GROUP BY segment
    ),
    gl AS (
      SELECT band, CAST(count(*) AS BIGINT) AS t_j FROM base GROUP BY band
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM base),
    cell AS (
      SELECT segment, band, CAST(count(*) AS BIGINT) AS n_gj FROM base
      GROUP BY segment, band
    ),
    grid AS (
      SELECT s.segment, b.band, s.n_g,
             COALESCE(c.n_gj, 0) AS n_gj, g.t_j
      FROM segs s CROSS JOIN bands b
      JOIN gl g ON g.band = b.band
      LEFT JOIN cell c ON c.segment = s.segment AND c.band = b.band
    ),
    cum AS (
      SELECT segment, band, n_g,
             sum(CAST(n_gj AS HUGEINT) * (SELECT t FROM tot)
                 - CAST(n_g AS HUGEINT) * t_j)
               OVER (PARTITION BY segment ORDER BY band
                     ROWS UNBOUNDED PRECEDING) AS gap
      FROM grid
    )
    SELECT segment, CAST(max(n_g) AS BIGINT) AS n_rows,
           CAST(sum(abs(gap)) AS DOUBLE)
             / (CAST(max(n_g) AS DOUBLE)
                * CAST((SELECT t FROM tot) AS DOUBLE)
                * CAST((SELECT m - 1 FROM m) AS DOUBLE)) AS t_closeness
    FROM cum GROUP BY segment ORDER BY segment
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X198 t-closeness screen — the third privacy guarantee after
    k-anonymity (X95) and l-diversity (X163): per quasi-identifier
    group (market segment), the earth-mover distance between its
    ordered sensitive-attribute distribution (price bands) and the
    global one, via the ordered-EMD identity EMD = mean |cumulative
    share gap|. Shares never materialize: the cumsum runs over exact
    cross-multiplied counts (HUGEINT/DECIMAL38) and each group pays
    ONE final division. Frames are (groups x bands)-sized after one
    scan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"
            " div 2000000"
        ).alias("band"),
    )
    base = base.persist()
    bands = base.select("band").distinct()
    m = bands.agg(F.count(F.lit(1)).cast("long").alias("m"))
    segs = base.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_g")
    )
    glob = base.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("t_j")
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("t"))
    cell = base.groupBy("segment", "band").agg(
        F.count(F.lit(1)).cast("long").alias("n_gj")
    )
    grid = (
        segs.crossJoin(F.broadcast(bands))
        .join(F.broadcast(glob), "band")
        .join(cell, ["segment", "band"], "left")
        .select(
            "segment",
            "band",
            "n_g",
            F.coalesce("n_gj", F.lit(0)).alias("n_gj"),
            "t_j",
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(m))
    )
    wc = (
        W.partitionBy("segment")
        .orderBy("band")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = grid.select(
        "segment",
        "n_g",
        "t",
        "m",
        F.sum(
            F.col("n_gj").cast("decimal(38,0)") * F.col("t")
            - F.col("n_g").cast("decimal(38,0)") * F.col("t_j")
        )
        .over(wc)
        .alias("gap"),
    )
    return (
        cum.groupBy("segment")
        .agg(
            F.max("n_g").cast("long").alias("n_rows"),
            (
                F.sum(F.abs(F.col("gap"))).cast("double")
                / (
                    F.max("n_g").cast("double")
                    * F.max("t").cast("double")
                    * (F.max("m") - 1).cast("double")
                )
            ).alias("t_closeness"),
        )
        .orderBy("segment")
    )


@register("bandit_ucb_scores", oracle=None)  # oracle set below
def bandit_ucb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X199 UCB1 bandit readout over event-type arms: pulls, exact
    success counts, and the UCB1 index mean + sqrt(2 ln N / n) — the
    deterministic bandit policy (Thompson would need RNG; UCB1 is
    pure arithmetic, so it oracles exactly). ln N is quantized ONCE
    on the scalar total, the per-arm score is one fixed expression,
    and the chosen arm is the (score DESC, arm ASC) argmax. Arm-sized
    frames after one scan."""
    ev = load_table(spark, sf_dir, "events")
    arm = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("pulls"),
        F.sum(
            F.when(
                F.get_json_object("props", "$.k").cast("int") > 90, 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("wins"),
    )
    tot = arm.agg(
        F.floor(F.log(F.sum("pulls").cast("double")) * 1000000)
        .cast("long")
        .alias("ln_n_q")
    )
    scored = arm.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "pulls",
        "wins",
        (
            F.col("wins").cast("double") / F.col("pulls").cast("double")
            + F.sqrt(
                F.lit(2.0)
                * (F.col("ln_n_q").cast("double") / F.lit(1000000.0))
                / F.col("pulls").cast("double")
            )
        ).alias("ucb1"),
    )
    wr = W.orderBy(F.desc("ucb1"), F.asc("event_type"))
    return (
        scored.select(
            "*", (F.row_number().over(wr) == 1).alias("chosen")
        )
        .orderBy("event_type")
    )


QUERIES["bandit_ucb_scores"]["oracle"] = """
    WITH arm AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS pulls,
             CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
                                     AS INTEGER) > 90
                           THEN 1 ELSE 0 END) AS BIGINT) AS wins
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(floor(ln(CAST(sum(pulls) AS DOUBLE)) * 1000000)
                  AS BIGINT) AS ln_n_q
      FROM arm
    ),
    scored AS (
      SELECT event_type, pulls, wins,
             CAST(wins AS DOUBLE) / CAST(pulls AS DOUBLE)
             + sqrt(2.0 * (CAST(ln_n_q AS DOUBLE) / 1000000.0)
                    / CAST(pulls AS DOUBLE)) AS ucb1
      FROM arm CROSS JOIN tot
    )
    SELECT event_type, pulls, wins, ucb1,
           row_number() OVER (ORDER BY ucb1 DESC, event_type) = 1
             AS chosen
    FROM scored ORDER BY event_type
    """


@register(
    "text_textrank_sentences",
    # TextRank (Mihalcea 2004) with the X98/X107 pinned-iteration
    # discipline: 2 unrolled weighted-PageRank rounds, every rank an
    # integer chain (shares and damping as integral divisions), so an
    # iterative graph algorithm hash-checks end to end.
    oracle=r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    sized AS (
      SELECT doc_id, toks,
             CAST(ceil(len(toks) / 10.0) AS INTEGER) AS nch
      FROM tk WHERE len(toks) >= 1
    ),
    sents AS (
      SELECT doc_id, cid + 1 AS sid,
             array_to_string(list_slice(toks, cid * 10 + 1, cid * 10 + 10),
                             ' ') AS sent
      FROM sized, unnest(generate_series(0, nch - 1)) AS g(cid)
    ),
    st AS (
      SELECT DISTINCT doc_id, sid,
             unnest(string_split(sent, ' ')) AS tok
      FROM sents
    ),
    slen AS (
      SELECT doc_id, sid, CAST(count(*) AS BIGINT) AS n_tok
      FROM st GROUP BY doc_id, sid
    ),
    shared AS (
      SELECT a.doc_id, a.sid AS i, b.sid AS j,
             CAST(count(*) AS BIGINT) AS sh
      FROM st a JOIN st b
        ON a.doc_id = b.doc_id AND a.tok = b.tok AND a.sid <> b.sid
      GROUP BY a.doc_id, a.sid, b.sid
    ),
    w AS (
      SELECT s.doc_id, s.i, s.j,
             (s.sh * 2000000) // (la.n_tok + lb.n_tok) AS wq
      FROM shared s
      JOIN slen la ON la.doc_id = s.doc_id AND la.sid = s.i
      JOIN slen lb ON lb.doc_id = s.doc_id AND lb.sid = s.j
      WHERE (s.sh * 2000000) // (la.n_tok + lb.n_tok) > 0
    ),
    outw AS (
      SELECT doc_id, i AS j, CAST(sum(wq) AS BIGINT) AS wj
      FROM w GROUP BY doc_id, i
    ),
    share AS (
      SELECT w.doc_id, w.i, w.j, (w.wq * 1000000) // o.wj AS sq
      FROM w JOIN outw o ON o.doc_id = w.doc_id AND o.j = w.j
    ),
    r1 AS (
      SELECT doc_id, i,
             150000 + (850000 * CAST(sum(sq) AS BIGINT)) // 1000000
               AS r
      FROM share GROUP BY doc_id, i
    ),
    r2 AS (
      SELECT s.doc_id, s.i,
             150000 + (850000 * CAST(sum((COALESCE(r1.r, 150000) * s.sq)
                                         // 1000000) AS BIGINT)) // 1000000
               AS r
      FROM share s
      LEFT JOIN r1 ON r1.doc_id = s.doc_id AND r1.i = s.j
      GROUP BY s.doc_id, s.i
    )
    SELECT doc_id, CAST(sid AS BIGINT) AS sentence_idx,
           CAST(r AS BIGINT) AS rank_q,
           substring(sent, 1, 60) AS snippet
    FROM (
      SELECT se.doc_id, se.sid, se.sent, r2.r,
             row_number() OVER (PARTITION BY se.doc_id
                                ORDER BY r2.r DESC, se.sid) AS rn
      FROM r2 JOIN sents se ON se.doc_id = r2.doc_id AND se.sid = r2.i
    ) WHERE rn = 1
    ORDER BY doc_id
    """,
)
def text_textrank_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X200 TextRank extractive summarization (Mihalcea & Tarau 2004):
    per document, sentences form a graph weighted by normalized
    shared-token count; TWO weighted-PageRank rounds (damping 0.85)
    run UNROLLED with every rank an exact integer chain — edge weight
    2e6·shared DIV (len_i+len_j), neighbor share wq·1e6 DIV W_j,
    damping 850000·Σ DIV 1e6 — the pinned-iteration discipline that
    oracled k-means (X98) and PQ (X107) applied to a graph algorithm.
    The top sentence per doc is the summary pick. All joins are
    within-document (sentence counts are document-bounded); the token
    self-join is the only quadratic and it is per-doc-bounded, never
    cross-corpus."""
    from alerta_spark.ops.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    # pseudo-sentences: 10-token windows (the synthetic corpus has no
    # sentence punctuation; on punctuated text swap in a [.!?] split —
    # everything downstream is segmentation-agnostic)
    sents = (
        chunk_documents(
            docs.select("doc_id", F.lower("text").alias("text")),
            chunk_size=10,
            overlap=0,
        )
        .select(
            "doc_id",
            (F.col("chunk_id") + 1).cast("int").alias("sid"),
            F.col("chunk_text").alias("sent"),
        )
        .persist()
    )
    st = sents.select(
        "doc_id", "sid", F.explode(F.split("sent", " ")).alias("tok")
    ).distinct()
    slen = st.groupBy("doc_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    a, b = st.alias("a"), st.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.sid") != F.col("b.sid")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.sid").alias("i"),
            F.col("b.sid").alias("j"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("sh"))
    )
    la = slen.select(
        F.col("doc_id"), F.col("sid").alias("i"), F.col("n_tok").alias("ni")
    )
    lb = slen.select(
        F.col("doc_id"), F.col("sid").alias("j"), F.col("n_tok").alias("nj")
    )
    w = (
        shared.join(la, ["doc_id", "i"])
        .join(lb, ["doc_id", "j"])
        .select(
            "doc_id",
            "i",
            "j",
            F.expr("(sh * 2000000) div (ni + nj)").alias("wq"),
        )
        .where(F.col("wq") > 0)
        .persist()
    )
    outw = w.groupBy("doc_id", F.col("i").alias("j")).agg(
        F.sum("wq").cast("long").alias("wj")
    )
    share = w.join(outw, ["doc_id", "j"]).select(
        "doc_id", "i", "j", F.expr("(wq * 1000000) div wj").alias("sq")
    )
    r1 = share.groupBy("doc_id", "i").agg(
        (
            F.lit(150000)
            + F.expr("(850000 * CAST(sum(sq) AS BIGINT)) div 1000000")
        ).alias("r")
    )
    r1j = r1.select(
        "doc_id", F.col("i").alias("j"), F.col("r").alias("rj")
    )
    r2 = (
        share.join(r1j, ["doc_id", "j"], "left")
        .select(
            "doc_id",
            "i",
            F.expr(
                "(COALESCE(rj, 150000) * sq) div 1000000"
            ).alias("contrib"),
        )
        .groupBy("doc_id", "i")
        .agg(
            (
                F.lit(150000)
                + F.expr(
                    "(850000 * CAST(sum(contrib) AS BIGINT)) div 1000000"
                )
            ).alias("r")
        )
    )
    ranked = (
        r2.join(
            sents.select("doc_id", F.col("sid").alias("i"), "sent"),
            ["doc_id", "i"],
        )
        .select(
            "doc_id",
            "i",
            "r",
            F.row_number()
            .over(
                W.partitionBy("doc_id").orderBy(F.desc("r"), F.asc("i"))
            )
            .alias("rn"),
            "sent",
        )
        .where(F.col("rn") == 1)
    )
    return ranked.select(
        "doc_id",
        F.col("i").cast("long").alias("sentence_idx"),
        F.col("r").cast("long").alias("rank_q"),
        F.substring("sent", 1, 60).alias("snippet"),
    ).orderBy("doc_id")


@register(
    "process_transition_latency",
    # Process-mining bottleneck view: the Markov edge counts (X105)
    # joined with exact-interpolation p50/p90 of the transition gap
    # (Spark `percentile` == DuckDB `quantile_cont`, pinned).
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER w AS next_type,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n,
           quantile_cont(gap_us, 0.5) AS p50_gap_us,
           quantile_cont(gap_us, 0.9) AS p90_gap_us
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY from_type, to_type
    """,
)
def process_transition_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X201 process-mining bottleneck map: for every directly-follows
    transition in the per-user event sequence, the traversal count
    AND the p50/p90 latency of that edge — the where-do-cases-stall
    readout that turns the Markov graph (X105) into a performance
    diagram. One user-keyed window shared by the lead() pair and the
    gap; percentiles are the pinned exact-interpolation pair."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("gap_us"),
    ).where(F.col("to_type").isNotNull())
    return (
        seq.groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.percentile("gap_us", F.lit(0.5)).alias("p50_gap_us"),
            F.percentile("gap_us", F.lit(0.9)).alias("p90_gap_us"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "forecast_backtest_mape",
    # Seasonal-naive backtest: forecast(d) = actual(d-7); absolute
    # errors stay exact cents, sMAPE's per-day ratio quantized via
    # integral division, ONE final division per type for each metric.
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    paired AS (
      SELECT a.event_type, a.day, a.cents AS actual, f.cents AS forecast
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type AND f.day = a.day - 7
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(actual - forecast)) AS BIGINT) AS sum_abs_err,
           CAST(sum(actual) AS BIGINT) AS sum_actual,
           CAST(sum(abs(actual - forecast)) AS DOUBLE)
             / CAST(sum(actual) AS DOUBLE) AS wape,
           CAST(sum((abs(actual - forecast) * 1000000)
                    // (actual + forecast)) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 500000.0) AS smape
    FROM paired GROUP BY event_type ORDER BY event_type
    """,
)
def forecast_backtest_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X202 forecast backtesting: the seasonal-naive baseline
    (forecast(d) = actual(d−7), the forecast every fancier model must
    beat) scored with WAPE and sMAPE per event type. Error sums stay
    exact cents; sMAPE's per-day ratio is an integral division
    (abs_err·1e6 DIV (a+f)) summed exactly, each reported metric ONE
    final division — float error never accumulates across days. Day
    frames are (type x day)-sized after one scan; the 7-day self-join
    is calendar-keyed."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum((F.col("value").cast("decimal(14,2)") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    a = daily.alias("a")
    f = daily.select(
        F.col("event_type"),
        F.date_add("day", 7).alias("day"),
        F.col("cents").alias("forecast"),
    ).alias("f")
    paired = a.join(f, ["event_type", "day"]).select(
        "event_type", "day", F.col("cents").alias("actual"), "forecast"
    )
    return (
        paired.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.abs(F.col("actual") - F.col("forecast")))
            .cast("long")
            .alias("sum_abs_err"),
            F.sum("actual").cast("long").alias("sum_actual"),
            (
                F.sum(F.abs(F.col("actual") - F.col("forecast"))).cast(
                    "double"
                )
                / F.sum("actual").cast("double")
            ).alias("wape"),
            (
                F.sum(
                    F.expr(
                        "(abs(actual - forecast) * CAST(1000000 AS BIGINT))"
                        " div (actual + forecast)"
                    )
                ).cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(500000.0))
            ).alias("smape"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_join_cardinality",
    # The planner's estimate done exactly: |A join B on k| =
    # sum_k a_k * b_k over the key-frequency histograms — then
    # verified against the actual join count in the same query.
    oracle="""
    WITH ha AS (
      SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS a
      FROM orders GROUP BY o_custkey
    ),
    hb AS (
      SELECT user_id AS k, CAST(count(*) AS BIGINT) AS b
      FROM events GROUP BY user_id
    ),
    est AS (
      SELECT sum(CAST(ha.a AS HUGEINT) * hb.b) AS predicted
      FROM ha JOIN hb USING (k)
    ),
    act AS (
      SELECT CAST(count(*) AS BIGINT) AS actual
      FROM orders o JOIN events e ON e.user_id = o.o_custkey
    )
    SELECT CAST(predicted AS BIGINT) AS predicted_rows,
           actual AS actual_rows,
           CAST(predicted AS BIGINT) = actual AS exact_match
    FROM est CROSS JOIN act
    """,
)
def stats_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X203 join-cardinality estimation, the histogram dot product a
    cost-based planner runs before picking a join strategy:
    |A ⋈ B on k| = Σ_k a_k·b_k over the two key-frequency
    histograms — computed EXACTLY here (histograms are aggregates,
    the dot product a key join over them) and verified against the
    actual join count in the same query. The two histogram frames
    are key-cardinality-sized; the verification join is the only
    row-scale work, and a production planner would drop it and keep
    the (cheap) estimate side."""
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    ha = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    hb = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("b")
    )
    est = ha.join(hb, "k").agg(
        F.sum(F.col("a").cast("decimal(38,0)") * F.col("b")).alias(
            "_pred"
        )
    )
    act = o.join(ev, o["o_custkey"] == ev["user_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("actual_rows")
    )
    return est.crossJoin(F.broadcast(act)).select(
        F.col("_pred").cast("long").alias("predicted_rows"),
        "actual_rows",
        (F.col("_pred").cast("long") == F.col("actual_rows")).alias(
            "exact_match"
        ),
    )


@register(
    "corpus_source_ablation",
    # Leave-one-group-out data valuation: remove each source and see
    # how the corpus quality mean moves — deltas from ONE pass of
    # per-source exact sums, each reported mean a single division.
    oracle="""
    WITH scored AS (
      SELECT source, n_chars,
             CAST(length(text) - length(replace(text, ' ', ''))
                  + 1 AS BIGINT) AS toks
      FROM documents
    ),
    per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS tok_sum
      FROM scored GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS nd,
             CAST(sum(tok_sum) AS BIGINT) AS ts
      FROM per
    )
    SELECT p.source, p.n_docs, p.tok_sum,
           CAST(p.tok_sum AS DOUBLE) / CAST(t.ts AS DOUBLE)
             AS token_share,
           CAST(t.ts AS DOUBLE) / CAST(t.nd AS DOUBLE)
             AS mean_tokens_overall,
           CAST(t.ts - p.tok_sum AS DOUBLE)
             / CAST(t.nd - p.n_docs AS DOUBLE)
             AS mean_tokens_without,
           CAST(t.ts - p.tok_sum AS DOUBLE)
             / CAST(t.nd - p.n_docs AS DOUBLE)
           - CAST(t.ts AS DOUBLE) / CAST(t.nd AS DOUBLE)
             AS ablation_delta
    FROM per p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def corpus_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X204 leave-one-group-out data valuation: for each corpus
    source, what happens to the corpus-level mean token count if that
    source is removed — the group-level ablation readout that guides
    mixture curation (the cheap complement to DSIR's example-level
    scores, X90). LOGO needs NO per-group rescans: every
    without-group mean is (total−group)/(n−n_g) from ONE pass of
    exact per-source sums; each mean one final division."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("toks"),
    )
    per = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("tok_sum"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("nd"),
        F.sum("tok_sum").cast("long").alias("ts"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "tok_sum",
            (F.col("tok_sum").cast("double") / F.col("ts").cast("double"))
            .alias("token_share"),
            (F.col("ts").cast("double") / F.col("nd").cast("double"))
            .alias("mean_tokens_overall"),
            (
                (F.col("ts") - F.col("tok_sum")).cast("double")
                / (F.col("nd") - F.col("n_docs")).cast("double")
            ).alias("mean_tokens_without"),
            (
                (F.col("ts") - F.col("tok_sum")).cast("double")
                / (F.col("nd") - F.col("n_docs")).cast("double")
                - F.col("ts").cast("double") / F.col("nd").cast("double")
            ).alias("ablation_delta"),
        )
        .orderBy("source")
    )


@register(
    "abtest_uplift_by_band",
    # Heterogeneous treatment effect readout: pre-period activity
    # bands (log2 width, scale-safe — no global rank needed), per-band
    # treat/control conversion from exact counts, uplift one fixed
    # expression.
    oracle="""
    WITH pre AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_pre
      FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY user_id
    ),
    banded AS (
      SELECT user_id,
             CAST(floor(ln(CAST(n_pre AS DOUBLE)) / ln(2.0)) AS BIGINT)
               AS band,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || 'exp1'), 1, 8)
                       < '80000000' THEN 'T' ELSE 'C' END AS grp
      FROM pre
    ),
    conv AS (
      SELECT DISTINCT user_id, 1 AS c FROM events
      WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        AND event_type = 'purchase'
        AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
    ),
    cell AS (
      SELECT b.band, b.grp, count(*) AS n,
             CAST(sum(COALESCE(c.c, 0)) AS BIGINT) AS x
      FROM banded b LEFT JOIN conv c USING (user_id)
      GROUP BY b.band, b.grp
    ),
    wide AS (
      SELECT band,
             CAST(sum(CASE WHEN grp = 'T' THEN n END) AS BIGINT) AS nt,
             CAST(sum(CASE WHEN grp = 'T' THEN x END) AS BIGINT) AS xt,
             CAST(sum(CASE WHEN grp = 'C' THEN n END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN grp = 'C' THEN x END) AS BIGINT) AS xc
      FROM cell GROUP BY band
    )
    SELECT band, nt, xt, nc, xc,
           CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)
           - CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE) AS uplift
    FROM wide
    WHERE nt IS NOT NULL AND nc IS NOT NULL
    ORDER BY band
    """,
)
def abtest_uplift_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X205 heterogeneous-treatment-effect readout: uplift
    (treat − control post-period conversion) per PRE-period activity
    band — the who-does-the-treatment-help view behind targeting
    policies. Bands are log2-width on the pre-period event count
    (scale-safe: no global rank/ntile window over the user
    population, which would be a single-partition sort at 1e9 users);
    conversions come from the label horizon only, mirroring the
    X181/X194 leakage discipline. Exact counts end to end, uplift one
    fixed expression per band."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    pre = (
        ev.where(F.col("ts") < cut)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pre"))
    )
    banded = pre.select(
        "user_id",
        F.floor(F.log(F.col("n_pre").cast("double")) / F.log(F.lit(2.0)))
        .cast("long")
        .alias("band"),
        F.when(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("exp1"))),
                1,
                8,
            )
            < "80000000",
            "T",
        )
        .otherwise("C")
        .alias("grp"),
    )
    conv = (
        ev.where(
            (F.col("ts") >= cut)
            & (F.col("event_type") == "purchase")
            & (F.get_json_object("props", "$.k").cast("int") > 90)
        )
        .select("user_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    # conv is user-sized: no broadcast hint (AQE decides)
    cell = (
        banded.join(conv, "user_id", "left")
        .groupBy("band", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce("_c", F.lit(0))).cast("long").alias("x"),
        )
    )
    wide = cell.groupBy("band").agg(
        F.sum(F.when(F.col("grp") == "T", F.col("n"))).cast("long").alias("nt"),
        F.sum(F.when(F.col("grp") == "T", F.col("x"))).cast("long").alias("xt"),
        F.sum(F.when(F.col("grp") == "C", F.col("n"))).cast("long").alias("nc"),
        F.sum(F.when(F.col("grp") == "C", F.col("x"))).cast("long").alias("xc"),
    )
    return (
        wide.where(F.col("nt").isNotNull() & F.col("nc").isNotNull())
        .select(
            "band",
            "nt",
            "xt",
            "nc",
            "xc",
            (
                F.col("xt").cast("double") / F.col("nt").cast("double")
                - F.col("xc").cast("double") / F.col("nc").cast("double")
            ).alias("uplift"),
        )
        .orderBy("band")
    )


@register(
    "features_quantile_transform",
    # Rank-based feature scaling without a row-scale global sort: the
    # doubled-midrank machinery from Mann-Whitney (X186) reused as a
    # transform — cumsum over the DISTINCT-value frame, broadcast
    # back onto rows, quantile = one division.
    oracle="""
    WITH pre AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY user_id
    ),
    g AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM pre GROUP BY v),
    r AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS hi
      FROM g
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g)
    SELECT p.user_id, p.v AS feature_value,
           CAST(2 * r.hi - r.c + 1 AS BIGINT) AS midrank_2,
           CAST(2 * r.hi - r.c + 1 AS DOUBLE)
             / (2.0 * CAST(n.n AS DOUBLE)) AS quantile
    FROM pre p JOIN r ON r.v = p.v CROSS JOIN n
    ORDER BY p.user_id
    """,
)
def features_quantile_transform(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X206 rank-based quantile feature transform (the scaler that
    makes any feature uniform[0,1] for tree-free models): each user's
    activity count mapped to its midrank quantile. Scale discipline:
    NO global sort over the row frame — the rank cumsum runs on the
    DISTINCT-value frame (value-sized, the X186 doubled-midrank
    machinery), then broadcasts back onto rows; midrank_2 = lo+hi
    stays integer, the quantile is one final division per row."""
    ev = load_table(spark, sf_dir, "events")
    pre = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    g = pre.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = g.select("v", "c", F.sum("c").over(wc).cast("long").alias("hi"))
    n = g.agg(F.sum("c").cast("long").alias("n"))
    return (
        pre.join(F.broadcast(r), "v")
        .crossJoin(F.broadcast(n))
        .select(
            "user_id",
            F.col("v").alias("feature_value"),
            (2 * F.col("hi") - F.col("c") + 1)
            .cast("long")
            .alias("midrank_2"),
            (
                (2 * F.col("hi") - F.col("c") + 1).cast("double")
                / (F.lit(2.0) * F.col("n").cast("double"))
            ).alias("quantile"),
        )
        .orderBy("user_id")
    )


@register(
    "embedding_lof_outliers",
    # LOF replayed relationally: pinned-centroid cells, within-cell
    # kNN on quantized squared-L2 (BIGINT), reach-dist/lrd/LOF all
    # integer (each LOF term an integral division in HUGEINT), the
    # top-20 cut ranked on lof_q — engine-exact end to end.
    oracle="""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    e AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + 1000000, list_transform(v, x -> x * 3.0)
      FROM base WHERE vec_id % 100 = 0
    ),
    idx AS (SELECT unnest(generate_series(1, 64)) AS pos),
    q AS (
      SELECT vec_id, pos, CAST(floor(v[pos] * 1000000.0) AS BIGINT) AS c
      FROM e, idx
    ),
    w AS (
      SELECT cent, pos, wts[pos] AS wv
      FROM (VALUES {C_VALUES}) cw(cent, wts), idx
    ),
    dots AS (
      SELECT vec_id, cent, sum(c * wv) AS d
      FROM q JOIN w USING (pos) GROUP BY vec_id, cent
    ),
    cells AS (
      SELECT vec_id, cent AS cell FROM (
        SELECT vec_id, cent,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cent ASC) AS rn
        FROM dots
      ) WHERE rn = 1
    ),
    d2 AS (
      SELECT ca.cell, ca.vec_id AS a, cb.vec_id AS b,
             sum((qa.c - qb.c) * (qa.c - qb.c)) AS d2
      FROM cells ca JOIN cells cb
        ON ca.cell = cb.cell AND ca.vec_id <> cb.vec_id
      JOIN q qa ON qa.vec_id = ca.vec_id
      JOIN q qb ON qb.vec_id = cb.vec_id AND qb.pos = qa.pos
      GROUP BY 1, 2, 3
    ),
    knn AS (
      SELECT * FROM (
        SELECT cell, a, b, d2,
               row_number() OVER (PARTITION BY a ORDER BY d2, b) AS rn
        FROM d2
      ) WHERE rn <= 5
    ),
    stats AS (
      SELECT a, CAST(max(d2) AS BIGINT) AS kdist_q,
             CAST(count(*) AS BIGINT) AS n_nb, min(cell) AS cell
      FROM knn GROUP BY a
    ),
    reach AS (
      SELECT k.a, k.b, greatest(s.kdist_q, k.d2) AS reach_q
      FROM knn k JOIN stats s ON s.a = k.b
    ),
    den AS (SELECT a, CAST(sum(reach_q) AS BIGINT) AS den_q
            FROM reach GROUP BY a),
    pt AS (
      SELECT s.a, s.kdist_q, s.n_nb, s.cell, d.den_q
      FROM stats s JOIN den d USING (a)
    ),
    terms AS (
      SELECT k.a,
             CAST((CAST(pb.n_nb AS HUGEINT) * pa.den_q * 1000000)
                  // (CAST(pb.den_q AS HUGEINT) * pa.n_nb) AS BIGINT)
               AS term_q
      FROM knn k JOIN pt pa ON pa.a = k.a JOIN pt pb ON pb.a = k.b
    ),
    lof AS (SELECT a, CAST(sum(term_q) AS BIGINT) AS lof_q
            FROM terms GROUP BY a)
    SELECT p.a AS vec_id, CAST(p.cell AS BIGINT) AS cell, p.n_nb,
           p.kdist_q, p.den_q, l.lof_q,
           CAST(l.lof_q AS DOUBLE)
             / (CAST(p.n_nb AS DOUBLE) * 1000000.0) AS lof
    FROM pt p JOIN lof l USING (a)
    ORDER BY l.lof_q DESC, vec_id LIMIT 20
    """.replace("{C_VALUES}", _ivf_centroid_values()),
)
def embedding_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X207 Local Outlier Factor screen over the embedding corpus
    (ops/similarity.embedding_lof): density-relative outliers that a
    distance-to-centroid cut misses. Off-manifold vectors are planted
    (every 100th vector scaled x3 under +1M ids) — the corrupted-
    embedding regime the screen exists for; they must dominate the
    top-20. Cell-confined kNN (pinned-centroid partition key, Σ|cell|²
    work), every LOF ratio an integral division — see the op docstring
    for the exactness discipline."""
    from alerta_spark.ops.similarity import embedding_lof

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    planted = emb.where(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(3.0)).alias(
            "embedding"
        ),
    )
    return embedding_lof(emb.unionByName(planted))


@register(
    "stats_permutation_test",
    # 200 pinned md5 re-assignments; the extreme-count compare is
    # cross-multiplied HUGEINT (|ad-cb|·BD vs |AD-CB|·bd), p one
    # final division. No RNG, no float stats until the last line.
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT)
               AS x_cents
      FROM events GROUP BY user_id
    ),
    assign AS (
      SELECT b, user_id, x_cents,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)
                                      || 'perm' || CAST(b AS VARCHAR)),
                                 1, 8) < '80000000'
                  THEN 1 ELSE 0 END AS t
      FROM u, (SELECT unnest(generate_series(0, 200)) AS b)
    ),
    cell AS (
      SELECT b,
             CAST(sum(t) AS BIGINT) AS nt,
             CAST(sum(t * x_cents) AS BIGINT) AS xt,
             CAST(count(*) - sum(t) AS BIGINT) AS nc,
             CAST(sum((1 - t) * x_cents) AS BIGINT) AS xc
      FROM assign GROUP BY b
    ),
    obs AS (SELECT nt, xt, nc, xc FROM cell WHERE b = 0),
    perms AS (SELECT * FROM cell WHERE b >= 1),
    ext AS (
      SELECT CAST(count(*) AS BIGINT) AS n_extreme
      FROM perms p CROSS JOIN obs o
      WHERE abs(CAST(p.xt AS HUGEINT) * p.nc - CAST(p.xc AS HUGEINT) * p.nt)
              * (CAST(o.nt AS HUGEINT) * o.nc)
            >= abs(CAST(o.xt AS HUGEINT) * o.nc - CAST(o.xc AS HUGEINT) * o.nt)
              * (CAST(p.nt AS HUGEINT) * p.nc)
    )
    SELECT o.nt, o.xt, o.nc, o.xc, e.n_extreme,
           CAST(1 + e.n_extreme AS DOUBLE) / 201.0 AS p_value
    FROM obs o CROSS JOIN ext e
    """,
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X208 deterministic permutation test for the difference in mean
    per-user spend between two md5-derived arms: 200 pinned md5
    re-labelings (b=0 is the observed split) replace the analytic null
    — the assumption-free companion to the z/Wilson/CUPED family that
    stays valid under heavy-tailed spend. Exactness: per-user cents
    exact, each permutation cell an integer 4-tuple, the
    "|diff_b| >= |diff_obs|" compare cross-multiplied in DECIMAL(38)
    (never a float mean), p-value ONE final division.

    Scale shape: the 201-way explode happens on the USER-sized frame
    (rows x 201, one shuffle to 201 cells, partial-aggregated
    map-side); the corpus is touched once for the per-user sums.
    DECIMAL(38) headroom: |x|·n·n'·n'' needs < 1e38 — holds through
    ~1e9 users x 1e15 cents; beyond that, band the compare."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x_cents")
    )
    assign = u.select(
        "user_id",
        "x_cents",
        F.explode(F.sequence(F.lit(0), F.lit(200))).alias("b"),
    ).select(
        "b",
        "x_cents",
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("perm"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            )
            < "80000000",
            1,
        )
        .otherwise(0)
        .alias("t"),
    )
    cell = assign.groupBy("b").agg(
        F.sum("t").cast("long").alias("nt"),
        F.sum(F.col("t") * F.col("x_cents")).cast("long").alias("xt"),
        (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("nc"),
        F.sum((1 - F.col("t")) * F.col("x_cents"))
        .cast("long")
        .alias("xc"),
    )
    obs = cell.where(F.col("b") == 0).select("nt", "xt", "nc", "xc")
    perms = cell.where(F.col("b") >= 1).select(
        F.col("nt").alias("pnt"),
        F.col("xt").alias("pxt"),
        F.col("nc").alias("pnc"),
        F.col("xc").alias("pxc"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    ext = (
        perms.crossJoin(F.broadcast(obs))
        .where(
            F.abs(d38("pxt") * F.col("pnc") - d38("pxc") * F.col("pnt"))
            * (d38("nt") * F.col("nc"))
            >= F.abs(d38("xt") * F.col("nc") - d38("xc") * F.col("nt"))
            * (d38("pnt") * F.col("pnc"))
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_extreme"))
    )
    return obs.crossJoin(F.broadcast(ext)).select(
        "nt",
        "xt",
        "nc",
        "xc",
        "n_extreme",
        ((1 + F.col("n_extreme")).cast("double") / F.lit(201.0)).alias(
            "p_value"
        ),
    )


@register(
    "text_good_turing",
    # Freq-of-freqs table + the (r+1)·N_{r+1}/N_r adjusted counts as
    # exact integer numerator/denominator; p0 and r* each ONE final
    # division. Broadcast self-join on r+1, no window.
    oracle="""
    WITH toks AS (
      SELECT list_filter(
        string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''
      ) AS ws
      FROM documents
    ),
    words AS (
      SELECT bigram, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT z[1] || ' ' || z[2] AS bigram FROM (
          SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS z
          FROM toks
        )
      ) GROUP BY bigram
    ),
    nr AS (
      SELECT freq AS r, CAST(count(*) AS BIGINT) AS n_r
      FROM words GROUP BY freq
    ),
    tot AS (
      SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)
               AS n1
      FROM nr
    )
    SELECT a.r, a.n_r, b.n_r AS n_r_next,
           CAST((a.r + 1) * b.n_r AS BIGINT) AS r_star_num,
           CAST((a.r + 1) * b.n_r AS DOUBLE) / CAST(a.n_r AS DOUBLE)
             AS r_star,
           CAST(t.n1 AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) AS p0
    FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
    CROSS JOIN tot t
    WHERE a.r <= 20
    ORDER BY a.r
    """,
)
def text_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X209 Good-Turing frequency smoothing over the corpus bigram
    vocabulary (Good 1953, public): the freq-of-freqs table N_r, the
    unseen-mass estimate p0 = N_1/N, and adjusted counts
    r* = (r+1)·N_{r+1}/N_r for r <= 20 — the language-model smoothing
    readout that says how much probability a corpus owes to n-grams
    it has never seen (the data-scaling companion to Heaps/Zipf: a
    high p0 says the corpus is still vocabulary-hungry). Bigrams, not
    unigrams: the synthetic corpus has a closed 31-word vocab, so the
    singleton tail that Good-Turing exists for only appears at the
    bigram level (real corpora hit it at both). One corpus aggregate
    -> type-sized freq table -> a TINY freq-of-freqs frame; the r+1
    lookup is a broadcast self-join, r* exact integer num/den with
    one final division per row."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    words = (
        docs.select(toks.alias("ws"))
        .select(
            F.explode(
                F.zip_with(
                    F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                    F.slice("ws", 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                    lambda x, y: F.concat(x, F.lit(" "), y),
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    nr = words.groupBy(F.col("freq").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    tot = nr.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("r") == 1, F.col("n_r")).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    nxt = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next"))
    return (
        nr.where(F.col("r") <= 20)
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            "n_r_next",
            ((F.col("r") + 1) * F.col("n_r_next"))
            .cast("long")
            .alias("r_star_num"),
            (
                ((F.col("r") + 1) * F.col("n_r_next")).cast("double")
                / F.col("n_r").cast("double")
            ).alias("r_star"),
            (F.col("n1").cast("double") / F.col("n_tokens").cast("double"))
            .alias("p0"),
        )
        .orderBy("r")
    )


@register(
    "anomaly_dow_median_residual",
    # Exact doubled-median per (type, dow) — med2 = lo+hi middle
    # ranks, all BIGINT cents; residual stays doubled-integer and the
    # top-20 cut ranks on it. One day-grain aggregate, one
    # (type,dow)-partitioned rank window.
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT)
               AS x_cents
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, day, x_cents,
             CAST(dayofweek(day) AS BIGINT) AS dow,
             row_number() OVER (PARTITION BY event_type, dayofweek(day)
                                ORDER BY x_cents, day) AS rn,
             count(*) OVER (PARTITION BY event_type, dayofweek(day))
               AS n
      FROM daily
    ),
    med AS (
      SELECT event_type, dow,
             CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                           THEN x_cents ELSE 0 END)
                  * CASE WHEN (n + 1) // 2 = (n + 2) // 2 THEN 2 ELSE 1
                    END AS BIGINT) AS med2_q
      FROM ranked
      GROUP BY event_type, dow, n
    )
    SELECT r.event_type, r.day, r.dow, r.x_cents, m.med2_q,
           CAST(2 * r.x_cents - m.med2_q AS BIGINT) AS resid2_q,
           CAST(2 * r.x_cents - m.med2_q AS DOUBLE) / 200.0 AS residual
    FROM ranked r JOIN med m
      ON m.event_type = r.event_type AND m.dow = r.dow
    ORDER BY abs(2 * r.x_cents - m.med2_q) DESC, r.event_type, r.day
    LIMIT 20
    """,
)
def anomaly_dow_median_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X210 day-of-week median-residual anomaly screen: each day's
    value total vs the EXACT median of its (event_type, weekday)
    peers — the robust seasonal baseline that, unlike the seasonal-
    naive lag (X102), doesn't inherit last week's own anomaly, and
    unlike a mean baseline isn't dragged by the outliers it is
    hunting. Exactness: medians in doubled form (med2 = lo+hi of the
    middle ranks — never a float midpoint), residuals stay doubled
    BIGINT cents, the top-20 cut ranks on integers, ONE final
    division renders the residual in currency units.

    Scale: one day-grain aggregate (corpus-sized shuffle), then a
    rank window over the (type, dow)-partitioned DAY frame
    (365·types rows/year — trivially bounded)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x_cents")
    )
    # Spark dayofweek() == DuckDB dayofweek()+1 (Sun=1 vs Sun=0):
    # subtract 1 for an engine-identical 0-based dow
    ranked = daily.select(
        "event_type",
        "day",
        "x_cents",
        (F.dayofweek("day") - 1).cast("long").alias("dow"),
    )
    wr = W.partitionBy("event_type", "dow").orderBy("x_cents", "day")
    ranked = ranked.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("event_type", "dow"))
    )
    med = ranked.groupBy("event_type", "dow", "n").agg(
        (
            F.sum(
                F.when(
                    (F.col("rn") == F.expr("(n + 1) div 2"))
                    | (F.col("rn") == F.expr("(n + 2) div 2")),
                    F.col("x_cents"),
                ).otherwise(0)
            )
            * F.when(
                F.expr("(n + 1) div 2") == F.expr("(n + 2) div 2"), 2
            ).otherwise(1)
        )
        .cast("long")
        .alias("med2_q")
    ).drop("n")
    out = ranked.join(med, ["event_type", "dow"]).select(
        "event_type",
        "day",
        "dow",
        "x_cents",
        "med2_q",
        (2 * F.col("x_cents") - F.col("med2_q"))
        .cast("long")
        .alias("resid2_q"),
        (
            (2 * F.col("x_cents") - F.col("med2_q")).cast("double") / 200.0
        ).alias("residual"),
    )
    return out.orderBy(
        F.abs(F.col("resid2_q")).desc(), "event_type", "day"
    ).limit(20)


@register(
    "multimodal_frame_schedule",
    # Pure-integer schedule arithmetic: duration from byte length,
    # uniform stride + md5-derived deterministic jitter, 1->N
    # explode/generate_series on both engines.
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) * 40 AS BIGINT)
               AS duration_ms
      FROM documents
    ),
    frames AS (
      SELECT doc_id, duration_ms,
             unnest(generate_series(
               0, CAST(duration_ms - 1 AS BIGINT), 1000)) AS slot_ms
      FROM m WHERE duration_ms > 0
    )
    SELECT doc_id, duration_ms,
           CAST(slot_ms // 1000 AS BIGINT) AS frame_idx,
           CAST(slot_ms + (CAST(CAST('0x' || substring(
                  md5(CAST(doc_id AS VARCHAR) || ':'
                      || CAST(slot_ms // 1000 AS VARCHAR)), 1, 8)
                  AS BIGINT) AS BIGINT) % 1000) AS BIGINT) AS frame_ms,
           CAST((duration_ms + 999) // 1000 AS BIGINT) AS n_frames
    FROM frames
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X214 video frame-sampling schedule over the media column: each
    media row expands to its decode work-list — one frame per 1000 ms
    stride with a DETERMINISTIC md5 jitter inside the stride (the
    sampling-diversity trick that avoids always grabbing the scene
    cut at slot boundaries, without RNG so retries resample the same
    frames). Media is the synthesized binary column (duration derived
    from byte length; real decoders slot into the mapInPandas stage —
    ops/multimodal.sample_frames/extract_features). Map-only 1->N
    explode: the schedule IS the shard-able work queue for a
    100 TB decode pass — no shuffle anywhere."""
    from alerta_spark.ops.multimodal import attach_fake_media

    docs = attach_fake_media(load_table(spark, sf_dir, "documents"))
    m = docs.select(
        "doc_id",
        (F.length(F.col("media.data")) * 40)
        .cast("long")
        .alias("duration_ms"),
    ).where(F.col("duration_ms") > 0)
    frames = m.select(
        "doc_id",
        "duration_ms",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col("duration_ms") - 1,
                F.lit(1000).cast("long"),
            )
        ).alias("slot_ms"),
    )
    jitter = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.expr("slot_ms div 1000").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return frames.select(
        "doc_id",
        "duration_ms",
        F.expr("slot_ms div 1000").cast("long").alias("frame_idx"),
        (F.col("slot_ms") + jitter).cast("long").alias("frame_ms"),
        F.expr("(duration_ms + 999) div 1000")
        .cast("long")
        .alias("n_frames"),
    ).orderBy("doc_id", "frame_idx")


@register(
    "events_entropy_rate",
    # Conditional entropy per source state as an exact BIGINT dot
    # product of counts with quantized-ln DIFFERENCES (never float
    # probabilities), ONE division per row; same (ts, event_id)
    # transition order as X105.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS src, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_src FROM t GROUP BY src),
    q AS (
      SELECT t.src, t.n, tot.n_src,
             CAST(floor(ln(CAST(t.n AS DOUBLE)) * 1000000) AS BIGINT)
               AS qln_n,
             CAST(floor(ln(CAST(tot.n_src AS DOUBLE)) * 1000000) AS BIGINT)
               AS qln_src
      FROM t JOIN tot USING (src)
    ),
    h AS (
      SELECT src, CAST(max(n_src) AS BIGINT) AS n_src,
             CAST(-sum(n * (qln_n - qln_src)) AS BIGINT) AS h_q
      FROM q GROUP BY src
    ),
    gt AS (SELECT CAST(sum(n_src) AS BIGINT) AS n_total FROM h)
    SELECT h.src, h.n_src, h.h_q,
           CAST(h.h_q AS DOUBLE)
             / (CAST(h.n_src AS DOUBLE) * 1000000.0) AS h_cond_nats,
           CAST(h.n_src AS DOUBLE) / CAST(g.n_total AS DOUBLE)
             AS weight
    FROM h CROSS JOIN gt g
    ORDER BY h.src
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X213 Markov entropy rate (plug-in estimator): per source state,
    the conditional next-event entropy H(next|src) =
    −Σ_j (c_ij/c_i)·ln(c_ij/c_i) — how PREDICTABLE each state's
    successor is (h→0: deterministic flows a sequence rule can
    exploit; h→ln(k): the state tells you nothing). The weighted sum
    over rows is the chain's entropy rate — the compressibility /
    anomaly-budget readout over the X105 transition matrix. Exactness:
    each term is c_ij·(qln(c_ij) − qln(c_i)) — an exact BIGINT dot
    product of counts with quantized-ln DIFFERENCES (the WOE/PSI ln
    discipline), one division per row. Same shuffle shape as X105:
    one user-keyed window + a |types|²-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = t.groupBy("src").agg(F.sum("n").cast("long").alias("n_src"))
    qln = lambda c: F.floor(  # noqa: E731
        F.log(F.col(c).cast("double")) * 1000000
    ).cast("long")
    q = t.join(F.broadcast(tot), "src").select(
        "src",
        "n",
        "n_src",
        qln("n").alias("qln_n"),
        qln("n_src").alias("qln_src"),
    )
    h = q.groupBy("src").agg(
        F.max("n_src").cast("long").alias("n_src"),
        (-F.sum(F.col("n") * (F.col("qln_n") - F.col("qln_src"))))
        .cast("long")
        .alias("h_q"),
    )
    gt = h.agg(F.sum("n_src").cast("long").alias("n_total"))
    return (
        h.crossJoin(F.broadcast(gt))
        .select(
            "src",
            "n_src",
            "h_q",
            (
                F.col("h_q").cast("double")
                / (F.col("n_src").cast("double") * F.lit(1000000.0))
            ).alias("h_cond_nats"),
            (
                F.col("n_src").cast("double") / F.col("n_total").cast("double")
            ).alias("weight"),
        )
        .orderBy("src")
    )


@register(
    "privacy_dp_noised_counts",
    # Laplace inverse-CDF from a pinned md5 uniform: fold k into the
    # odd integer t (sign by half-space), magnitude = QLN_M − qln(t)
    # in micro-nats — integers end to end, ONE division at the edge.
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT event_type, day, n,
             CAST(CAST('0x' || substring(
               md5('dp1:' || event_type || ':' || CAST(day AS VARCHAR)),
               1, 8) AS BIGINT) AS BIGINT) AS k
      FROM c
    ),
    s AS (
      SELECT event_type, day, n,
             CASE WHEN k < 2147483648 THEN 1 ELSE -1 END AS sign,
             CASE WHEN k < 2147483648 THEN 2 * k + 1
                  ELSE 2 * (4294967296 - k) - 1 END AS t
      FROM u
    )
    SELECT event_type, day, n,
           CAST(n * 1000000 + sign *
                (22180709 - CAST(floor(ln(CAST(t AS DOUBLE)) * 1000000)
                                 AS BIGINT)) AS BIGINT) AS noised_q,
           CAST(n * 1000000 + sign *
                (22180709 - CAST(floor(ln(CAST(t AS DOUBLE)) * 1000000)
                                 AS BIGINT)) AS DOUBLE) / 1000000.0
             AS noised
    FROM s
    ORDER BY event_type, day
    """,
)
def privacy_dp_noised_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X212 differential-privacy release plumbing: per-(type, day)
    counts with Laplace(b=1/ε, ε=1) noise via the inverse CDF — the
    noise pipeline of a DP histogram release (sensitivity 1 per count,
    noise magnitude −b·ln(t/2³²) with the sign from the uniform's
    half-space). The uniform is a PINNED md5 of the cell key, so the
    release is test-deterministic and cross-engine exact — production
    swaps the md5 for a real RNG stream and keeps every other line.
    Exactness: the fold to the odd integer t keeps ln's argument an
    integer; magnitude = QLN_M − qln(t) in micro-nats (the quantized-
    ln discipline), noised_q pure BIGINT, ONE final division. True n
    is emitted here for the oracle check — a production release
    projects it away. Map-only after one day-grain aggregate."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    k = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("dp1:"),
                    F.col("event_type"),
                    F.lit(":"),
                    F.col("day").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    s = c.select(
        "event_type",
        "day",
        "n",
        F.when(k < 2147483648, 1).otherwise(-1).alias("sign"),
        F.when(k < 2147483648, 2 * k + 1)
        .otherwise(2 * (F.lit(4294967296) - k) - 1)
        .alias("t"),
    )
    qln_t = F.floor(F.log(F.col("t").cast("double")) * 1000000).cast("long")
    noised_q = (
        F.col("n") * 1000000 + F.col("sign") * (F.lit(22180709) - qln_t)
    ).cast("long")
    return s.select(
        "event_type",
        "day",
        "n",
        noised_q.alias("noised_q"),
        (noised_q.cast("double") / 1000000.0).alias("noised"),
    ).orderBy("event_type", "day")


@register(
    "forecast_holt_linear",
    # The smoothing recursion replayed with a recursive CTE; every
    # level/trend value an exact BIGINT (alpha=0.2, beta=0.1 as
    # integral x10 divisions, toward-zero on BOTH engines), the
    # 7-day-ahead forecast pure integer arithmetic.
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT)
               AS x_cents
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT event_type, min(day) AS d0, max(day) AS d1
      FROM daily GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span
    ),
    dense AS (
      SELECT g.event_type, g.day,
             CAST(row_number() OVER (PARTITION BY g.event_type
                                     ORDER BY g.day) AS BIGINT) AS i,
             coalesce(d.x_cents, 0) AS x
      FROM grid g LEFT JOIN daily d
        ON d.event_type = g.event_type AND d.day = g.day
    ),
    n AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
      FROM dense GROUP BY 1
    ),
    rec AS (
      SELECT a.event_type, CAST(1 AS BIGINT) AS i,
             a.x AS l, b2.x - a.x AS b
      FROM dense a JOIN dense b2
        ON b2.event_type = a.event_type AND b2.i = 2
      WHERE a.i = 1
      UNION ALL
      SELECT r.event_type, r.i + 1,
             (2 * d.x + 8 * (r.l + r.b)) // 10,
             (((2 * d.x + 8 * (r.l + r.b)) // 10) - r.l + 9 * r.b) // 10
      FROM rec r JOIN dense d
        ON d.event_type = r.event_type AND d.i = r.i + 1
    )
    SELECT r.event_type, n.n_days,
           CAST(r.l AS BIGINT) AS level_q,
           CAST(r.b AS BIGINT) AS trend_q,
           CAST(r.l + 7 * r.b AS BIGINT) AS fc7_q,
           CAST(r.l + 7 * r.b AS DOUBLE) / 100.0 AS forecast_7d
    FROM rec r JOIN n ON n.event_type = r.event_type AND r.i = n.n_days
    ORDER BY r.event_type
    """,
)
def forecast_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X211 Holt's linear-trend forecast (double exponential
    smoothing, public algorithm) per event type, PINNED to integer
    arithmetic: level/trend updates l' = (2x + 8(l+b)) div 10,
    b' = ((l'−l) + 9b) div 10 — alpha=0.2/beta=0.1 as integral
    toward-zero divisions (identical on both engines), over the
    zero-filled dense day grid. The Spark side folds each type's
    day-ordered value array with a SQL `aggregate` lambda (state =
    one struct — the X98/X107 pinned-iteration discipline applied to
    a recurrence); the oracle replays the recursion with a recursive
    CTE. State is span-bounded (days, not rows): collect_list here
    holds ~10² elements per type at any corpus size — the X99 EWMA
    caveat family, documented. 7-day-ahead forecast = l + 7b, exact
    BIGINT, ONE final division to currency units."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x_cents")
    )
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    dense = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("x_cents", F.lit(0)).cast("long").alias("x"),
    )
    series = dense.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s["x"],
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    holt = F.expr(
        """
        aggregate(
          slice(xs, 2, CAST(n_days - 1 AS INT)),
          named_struct(
            'l', CAST(element_at(xs, 1) AS BIGINT),
            'b', CAST(element_at(xs, 2) - element_at(xs, 1) AS BIGINT)),
          (acc, x) -> named_struct(
            'l', (2 * x + 8 * (acc.l + acc.b)) div 10,
            'b', (((2 * x + 8 * (acc.l + acc.b)) div 10) - acc.l
                  + 9 * acc.b) div 10))
        """
    )
    return (
        series.where(F.col("n_days") >= 2)
        .select("event_type", "n_days", holt.alias("_h"))
        .select(
            "event_type",
            "n_days",
            F.col("_h.l").alias("level_q"),
            F.col("_h.b").alias("trend_q"),
            (F.col("_h.l") + 7 * F.col("_h.b")).cast("long").alias("fc7_q"),
            (
                (F.col("_h.l") + 7 * F.col("_h.b")).cast("double") / 100.0
            ).alias("forecast_7d"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_spearman_corr",
    # Pearson on DOUBLED midranks: every rank, sum, and moment an
    # exact BIGINT (HUGEINT intermediates), r = num/(sqrt·sqrt) with
    # both sqrt args exact integers < 2^53 — bit-identical IEEE.
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT)
               AS y
      FROM events GROUP BY user_id
    ),
    gx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY x),
    rx AS (
      SELECT v, CAST(2 * sum(c) OVER (ORDER BY v) - c + 1 AS BIGINT)
               AS r2
      FROM gx
    ),
    gy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY y),
    ry AS (
      SELECT v, CAST(2 * sum(c) OVER (ORDER BY v) - c + 1 AS BIGINT)
               AS r2
      FROM gy
    ),
    j AS (
      SELECT rx.r2 AS a, ry.r2 AS b FROM u
      JOIN rx ON rx.v = u.x JOIN ry ON ry.v = u.y
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
             CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT) AS saa,
             CAST(sum(CAST(b AS HUGEINT) * b) AS HUGEINT) AS sbb,
             CAST(sum(CAST(a AS HUGEINT) * b) AS HUGEINT) AS sab
      FROM j
    )
    SELECT n,
           CAST(n * sab - CAST(sa AS HUGEINT) * sb AS BIGINT) AS num_q,
           CAST(n * saa - CAST(sa AS HUGEINT) * sa AS BIGINT) AS denx_q,
           CAST(n * sbb - CAST(sb AS HUGEINT) * sb AS BIGINT) AS deny_q,
           CAST(n * sab - CAST(sa AS HUGEINT) * sb AS DOUBLE)
             / (sqrt(CAST(CAST(n * saa - CAST(sa AS HUGEINT) * sa
                               AS BIGINT) AS DOUBLE))
                * sqrt(CAST(CAST(n * sbb - CAST(sb AS HUGEINT) * sb
                                 AS BIGINT) AS DOUBLE))) AS spearman_rho
    FROM m
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X215 Spearman rank correlation between per-user activity count
    and per-user spend — the monotone-association readout that is
    immune to the heavy spend tail Pearson chokes on. Tie-correct via
    Pearson on DOUBLED midranks (the X186/X206 machinery: midrank_2 =
    lo+hi is always integer): every sum/moment exact BIGINT with
    DECIMAL(38) intermediates, rho = one numerator over two sqrt's
    whose arguments are exact integers (< 2^53 through ~10⁶ users —
    beyond that, band the ranks). Rank cumsums run on the DISTINCT-
    value frames (no row-scale global sort), broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("y"),
    )

    def ranks(col: str):
        g = u.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        wc = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
        return g.select(
            "v",
            (2 * F.sum("c").over(wc) - F.col("c") + 1)
            .cast("long")
            .alias("r2"),
        )

    rx = ranks("x").select(
        F.col("v").alias("x"), F.col("r2").alias("a")
    )
    ry = ranks("y").select(
        F.col("v").alias("y"), F.col("r2").alias("b")
    )
    j = u.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y")
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum(d38("a") * F.col("a")).cast("decimal(38,0)").alias("saa"),
        F.sum(d38("b") * F.col("b")).cast("decimal(38,0)").alias("sbb"),
        F.sum(d38("a") * F.col("b")).cast("decimal(38,0)").alias("sab"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa").cast("decimal(38,0)") * F.col("sb")).cast("long")
    denx = (F.col("n") * F.col("saa") - F.col("sa").cast("decimal(38,0)") * F.col("sa")).cast("long")
    deny = (F.col("n") * F.col("sbb") - F.col("sb").cast("decimal(38,0)") * F.col("sb")).cast("long")
    return m.select(
        "n",
        num.alias("num_q"),
        denx.alias("denx_q"),
        deny.alias("deny_q"),
        (
            num.cast("double")
            / (F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double")))
        ).alias("spearman_rho"),
    )


@register(
    "cohort_ltv_curves",
    # First-touch week cohorts, exact cent sums, cohort-partitioned
    # cumulative window, LTV one division per row.
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE)
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
      FROM first GROUP BY cohort_week
    ),
    rev AS (
      SELECT f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                            CAST(date_trunc('week', e.ts) AS DATE))
                  AS BIGINT) AS age_week,
             CAST(sum(CAST(e.value AS DECIMAL(14,2)) * 100) AS BIGINT)
               AS rev_cents
      FROM events e JOIN first f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_week, age_week, rev_cents,
             CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
                                       ORDER BY age_week) AS BIGINT)
               AS cum_rev_cents
      FROM rev
    )
    SELECT c.cohort_week, c.age_week, s.n_users, c.rev_cents,
           c.cum_rev_cents,
           CAST(c.cum_rev_cents AS DOUBLE)
             / (CAST(s.n_users AS DOUBLE) * 100.0) AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort_week)
    ORDER BY c.cohort_week, c.age_week
    """,
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X216 cohort lifetime-value curves: users grouped by first-touch
    week, purchase revenue accumulated by cohort age — the LTV payback
    readout that retention counts (X51) only hint at. Exact cents
    everywhere, the cumulative window runs over the (cohort, age)
    frame (weeks² rows, not users), LTV-per-user ONE division per
    row. Corpus touched twice (first-touch and revenue aggregates,
    both key-partial); the user->cohort join shuffles on user_id."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("long")
            .alias("age_week"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(14,2)") * 100)
            .cast("long")
            .alias("rev_cents")
        )
    )
    wc = W.partitionBy("cohort_week").orderBy("age_week")
    cum = rev.withColumn(
        "cum_rev_cents", F.sum("rev_cents").over(wc).cast("long")
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "n_users",
            "rev_cents",
            "cum_rev_cents",
            (
                F.col("cum_rev_cents").cast("double")
                / (F.col("n_users").cast("double") * 100.0)
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age_week")
    )


@register(
    "layout_compaction_bins",
    # Start-offset binning: bin = running-start div target inside
    # each source partition — pure integers, one partitioned window.
    oracle="""
    WITH files AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS bytes
      FROM documents
    ),
    placed AS (
      SELECT source, doc_id, bytes,
             CAST(coalesce(sum(bytes) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_off
      FROM files
    )
    SELECT source, CAST(start_off // 16384 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM placed
    GROUP BY source, start_off // 16384
    ORDER BY source, bin
    """,
)
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X217 small-files compaction planner: assign each file (here:
    documents standing in for a file listing, n_chars as bytes) to a
    target-sized output group by its running START offset div target
    — the deterministic in-order packing every lakehouse OPTIMIZE
    job runs before rewriting small files. Groups are computed PER
    source partition (the window never crosses partition dirs — no
    global sort, matching how compaction actually shards at 100 TB);
    output is the rewrite manifest: files per bin, exact byte totals,
    id span. All integers."""
    docs = load_table(spark, sf_dir, "documents")
    ws = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = docs.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("long").alias("bytes"),
    ).withColumn(
        "start_off",
        F.coalesce(F.sum("bytes").over(ws), F.lit(0)).cast("long"),
    )
    return (
        placed.groupBy(
            "source", F.expr("start_off div 16384").cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("bytes"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .orderBy("source", "bin")
    )


def _kcenter_oracle(k: int) -> str:
    """Unroll k-1 farthest-point rounds as CTEs (the X98/X107/X37
    pinned-iteration discipline): each round joins the quantized
    component table against the single newly-chosen row, keeps the
    running min-distance, and picks the next center by
    (min-dist DESC, id ASC)."""
    sql = ["""WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    idx AS (SELECT unnest(generate_series(1, 64)) AS pos),
    q AS (
      SELECT vec_id, pos, CAST(floor(v[pos] * 1000000.0) AS BIGINT) AS c
      FROM e, idx
    ),
    c1 AS (SELECT min(vec_id) AS id FROM e),
    m1 AS (
      SELECT qa.vec_id,
             CAST(sum((qa.c - qb.c) * (qa.c - qb.c)) AS BIGINT) AS d2
      FROM q qa JOIN q qb
        ON qb.vec_id = (SELECT id FROM c1) AND qb.pos = qa.pos
      GROUP BY qa.vec_id
    )"""]
    for r in range(2, k + 1):
        p = r - 1
        sql.append(f""", c{r} AS (
      SELECT vec_id AS id, d2 FROM m{p}
      ORDER BY d2 DESC, vec_id ASC LIMIT 1
    ), m{r} AS (
      SELECT m.vec_id, least(m.d2, CAST(sum(
               (qa.c - qb.c) * (qa.c - qb.c)) AS BIGINT)) AS d2
      FROM m{p} m
      JOIN q qa ON qa.vec_id = m.vec_id
      JOIN q qb ON qb.vec_id = (SELECT id FROM c{r}) AND qb.pos = qa.pos
      GROUP BY m.vec_id, m.d2
    )""")
    unions = "\n      UNION ALL ".join(
        ["SELECT 1 AS rank, id AS vec_id, CAST(0 AS BIGINT) AS sel_d2_q"
         " FROM c1"]
        + [
            f"SELECT {r} AS rank, id AS vec_id, CAST(d2 AS BIGINT)"
            f" AS sel_d2_q FROM c{r}"
            for r in range(2, k + 1)
        ]
    )
    sql.append(
        f"\n    SELECT CAST(rank AS BIGINT) AS rank, vec_id, sel_d2_q"
        f" FROM (\n      {unions}\n    ) ORDER BY rank"
    )
    return "".join(sql)


@register("sample_kcenter_coreset", oracle=_kcenter_oracle(5))
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X218 greedy k-center coreset over the embedding corpus
    (ops/sampling.kcenter_coreset): 5 exemplars by farthest-point
    traversal — the diversity-sampling rule for training-data
    selection (keep the spread, not the mode; the complement of
    SemDeDup). Engine-exact quantized squared-L2, ties to lowest id;
    the oracle replays every round via unrolled CTEs. Corpus-side
    cost: k map-only min-dist updates + k TakeOrdered argmaxes, no
    pair join, no corpus shuffle."""
    from alerta_spark.ops.sampling import kcenter_coreset

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, k=5)


@register(
    "recs_als_rank1_pinned",
    # Two alternating closed-form rank-1 updates unrolled as CTEs:
    # every factor an integral division of exact BIGINT dot products
    # (x10^6 fixed point), predictions pure integer products.
    oracle="""
    WITH r AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    u1 AS (
      SELECT user_id,
             CAST((sum(n * 1000000) * 1000000)
                  // (count(*) * CAST(1000000 AS BIGINT) * 1000000)
                  AS BIGINT) AS u
      FROM r GROUP BY user_id
    ),
    v1 AS (
      SELECT r.event_type,
             CAST((sum(r.n * u1.u) * 1000000)
                  // sum(u1.u * u1.u) AS BIGINT) AS v
      FROM r JOIN u1 USING (user_id) GROUP BY r.event_type
    ),
    u2 AS (
      SELECT r.user_id,
             CAST((sum(r.n * v1.v) * 1000000)
                  // sum(v1.v * v1.v) AS BIGINT) AS u
      FROM r JOIN v1 USING (event_type) GROUP BY r.user_id
    ),
    v2 AS (
      SELECT r.event_type,
             CAST((sum(r.n * u2.u) * 1000000)
                  // sum(u2.u * u2.u) AS BIGINT) AS v
      FROM r JOIN u2 USING (user_id) GROUP BY r.event_type
    ),
    pred AS (
      SELECT u2.user_id, v2.event_type,
             CAST((u2.u * v2.v) // 1000000 AS BIGINT) AS pred_q,
             coalesce(r.n, 0) AS observed
      FROM u2 CROSS JOIN v2
      LEFT JOIN r ON r.user_id = u2.user_id
                 AND r.event_type = v2.event_type
    ),
    top AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY pred_q DESC, user_id)
               AS rnk
      FROM pred
    )
    SELECT t.event_type, v2.v AS v_q, t.user_id, t.pred_q,
           CAST(t.observed AS BIGINT) AS observed,
           CAST(t.rnk AS BIGINT) AS rnk
    FROM top t JOIN v2 USING (event_type)
    WHERE t.rnk <= 3
    ORDER BY t.event_type, t.rnk
    """,
)
def recs_als_rank1_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X219 rank-1 ALS matrix factorization over the user x event-type
    interaction counts, PINNED: init v=1 (x10^6 fixed point), then two
    alternating CLOSED-FORM least-squares updates — rank-1 makes each
    update u_i = <r_i,v>/<v,v> an integral division of exact BIGINT
    dot products, so training is engine-exact with no RNG and no
    float accumulation (the factorization companion to the item-item
    cosine recs, X188). Emits each type's factor and its top-3 users
    by predicted affinity (the recommendation readout), with the
    observed count alongside. Each update is one key-partial
    aggregate; the only fan-out is the |users| x |types| prediction
    join, bounded by the type dimension."""
    ev = load_table(spark, sf_dir, "events")
    r = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    M = F.lit(1000000).cast("long")
    u1 = r.groupBy("user_id").agg(
        F.expr(
            "CAST((sum(n * 1000000) * 1000000) div"
            " (count(*) * CAST(1000000 AS BIGINT) * 1000000) AS BIGINT)"
        ).alias("u")
    )
    v1 = (
        r.join(u1, "user_id")
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST((sum(n * u) * 1000000) div sum(u * u) AS BIGINT)"
            ).alias("v")
        )
    )
    u2 = (
        r.join(F.broadcast(v1), "event_type")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST((sum(n * v) * 1000000) div sum(v * v) AS BIGINT)"
            ).alias("u")
        )
    )
    v2 = (
        r.join(u2, "user_id")
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST((sum(n * u) * 1000000) div sum(u * u) AS BIGINT)"
            ).alias("v")
        )
    )
    pred = (
        u2.crossJoin(F.broadcast(v2))
        .join(r, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.expr("CAST((u * v) div 1000000 AS BIGINT)").alias("pred_q"),
            F.coalesce("n", F.lit(0)).cast("long").alias("observed"),
        )
    )
    wt = W.partitionBy("event_type").orderBy(
        F.desc("pred_q"), F.asc("user_id")
    )
    return (
        pred.withColumn("rnk", F.row_number().over(wt).cast("long"))
        .where(F.col("rnk") <= 3)
        .join(F.broadcast(v2.select("event_type", F.col("v").alias("v_q"))), "event_type")
        .select("event_type", "v_q", "user_id", "pred_q", "observed", "rnk")
        .orderBy("event_type", "rnk")
    )


@register(
    "corpus_source_overlap_matrix",
    # Posting-list pair counting: distinct (source, shingle) rows,
    # |A∩B| via the per-shingle source-pair join (fan-out bounded by
    # #sources, never a doc-pair join), Jaccard/containment one
    # division each.
    oracle=f"""
    WITH s0 AS (
      SELECT d.source, sh.sh AS shingle
      FROM documents d, unnest({{SH}}) AS sh(sh)
    ),
    s AS (SELECT DISTINCT source, shingle FROM s0),
    sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_sh
      FROM s GROUP BY source
    ),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM s a JOIN s b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_common,
           sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(i.n_common AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE) AS jaccard,
           CAST(i.n_common AS DOUBLE)
             / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    ORDER BY i.n_common DESC, i.src_a, i.src_b
    LIMIT 30
    """.replace("{SH}", _DUCK_SHINGLES),
)
def corpus_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X220 source-level 5-gram overlap matrix: for every source pair,
    the exact distinct-shingle intersection with Jaccard and
    containment — the corpus-governance readout that finds mirrored /
    scraped-from-each-other SOURCES before doc-level dedup even runs
    (a source pair with high containment means one feed wholesale
    republishes the other; X48 drift and X30 composition see nothing).
    Plan: distinct (source, shingle) rows (one aggregate), then the
    per-shingle source-pair join — fan-out bounded by #sources per
    shingle, NEVER a document-pair join; top-30 by intersection size
    (integer-ranked cut). At 100 TB the posting list per shingle is
    capped by source count, so the pair count is #sources², not
    docs²."""
    from alerta_spark.ops.dedupe import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    s = (
        shingle_rows(docs, "text", "doc_id", 5)
        .join(docs.select(F.col("doc_id").alias("_id"), "source"), "_id")
        .select("source", "shingle")
        .distinct()
    )
    sizes = s.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sh")
    )
    a = s.select(F.col("source").alias("src_a"), "shingle")
    b = s.select(F.col("source").alias("src_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n_sh").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n_sh").alias("n_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
            (
                F.col("n_common").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
        .orderBy(F.desc("n_common"), "src_a", "src_b")
        .limit(30)
    )


@register(
    "finance_duplicate_payment_screen",
    # Customer-keyed self-join (per-key order fan-out, never global),
    # cents compared with integer cross-multiplication (|a-b|*200 <=
    # a+b per a 1% band), date window in days; dedup by (lo, hi).
    oracle="""
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey AS cust,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    )
    SELECT a.cust,
           a.k AS order_a, b.k AS order_b,
           a.cents AS cents_a, b.cents AS cents_b,
           CAST(abs(a.cents - b.cents) AS BIGINT) AS diff_cents,
           CAST(date_diff('day', a.d, b.d) AS BIGINT) AS gap_days
    FROM o a JOIN o b
      ON a.cust = b.cust AND a.k < b.k
     AND b.d >= a.d - INTERVAL 7 DAY AND b.d <= a.d + INTERVAL 7 DAY
     AND abs(a.cents - b.cents) * 200 <= (a.cents + b.cents)
    ORDER BY a.cust, order_a, order_b
    """,
)
def finance_duplicate_payment_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X221 duplicate-payment audit screen: order pairs from the SAME
    customer within 7 days whose totals agree to 1% — the classic
    accounts-payable double-billing detector (the business-domain
    face of the dedup family: fuzzy match on amount+date instead of
    shingles). The 1% band is integer cross-multiplied
    (|a−b|·200 <= a+b — no float tolerance), the window a date
    interval, pairs deduped by key order. Plan: ONE customer-keyed
    self-join — fan-out bounded by per-customer order count (the
    natural partition key at 100 TB), never a global pair join."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("cust"),
        (F.col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a = o.select(
        "cust",
        F.col("k").alias("order_a"),
        F.col("cents").alias("cents_a"),
        F.col("d").alias("d_a"),
    )
    b = o.select(
        "cust",
        F.col("k").alias("order_b"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("d_b"),
    )
    return (
        a.join(b, "cust")
        .where(
            (F.col("order_a") < F.col("order_b"))
            & (F.col("d_b") >= F.date_sub("d_a", 7))
            & (F.col("d_b") <= F.date_add("d_a", 7))
            & (
                F.abs(F.col("cents_a") - F.col("cents_b")) * 200
                <= F.col("cents_a") + F.col("cents_b")
            )
        )
        .select(
            "cust",
            "order_a",
            "order_b",
            "cents_a",
            "cents_b",
            F.abs(F.col("cents_a") - F.col("cents_b"))
            .cast("long")
            .alias("diff_cents"),
            F.datediff("d_b", "d_a").cast("long").alias("gap_days"),
        )
        .orderBy("cust", "order_a", "order_b")
    )


@register(
    "sketch_kmv_distinct_users",
    # k-minimum-values: rank the distinct 60-bit md5 hashes per key,
    # keep the kth smallest; estimate = (k-1)*2^60 / h_k, ONE
    # division. The ALL row is the merged (union) sketch.
    oracle="""
    WITH h0 AS (
      SELECT DISTINCT event_type,
             CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                         1, 15) AS BIGINT) AS BIGINT)
               AS h
      FROM events
    ),
    h AS (
      SELECT event_type, h FROM h0
      UNION ALL
      SELECT 'ALL', h FROM (SELECT DISTINCT h FROM h0)
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_exact
      FROM h
    )
    SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(CASE WHEN n_exact >= 64 THEN max(
             CASE WHEN rn = 64 THEN h END) END AS BIGINT) AS h_k,
           CASE WHEN n_exact >= 64
                THEN 63.0 * 1152921504606846976.0
                     / CAST(max(CASE WHEN rn = 64 THEN h END) AS DOUBLE)
                ELSE CAST(n_exact AS DOUBLE) END AS est_distinct
    FROM ranked
    GROUP BY event_type, n_exact
    ORDER BY event_type
    """,
)
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X222 KMV (k-minimum-values) distinct sketch per event type plus
    the merged union row — the third member of the cardinality-sketch
    family (portable HLL X89 estimates via register harmonics; KMV
    via order statistics: the kth-smallest of the distinct 60-bit md5
    hashes, est = (k−1)·2⁶⁰/h_k). KMV's edge: sketches MERGE by
    keeping the k smallest of the union (the ALL row exercises it),
    and intersections follow by inclusion-exclusion — the
    set-algebra distinct counter. Engine-exact: hashes and the kth
    order statistic are integers; under-filled sketches (n < k)
    report exactly. One distinct aggregate + a key-partitioned rank
    window over the (bounded) distinct-hash frame."""
    ev = load_table(spark, sf_dir, "events")
    h0 = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    h = h0.unionByName(
        h0.select(F.lit("ALL").alias("event_type"), "h").distinct()
    )
    wr = W.partitionBy("event_type").orderBy("h")
    ranked = (
        h.withColumn("rn", F.row_number().over(wr))
        .withColumn(
            "n_exact", F.count(F.lit(1)).over(W.partitionBy("event_type"))
        )
    )
    hk = F.max(F.when(F.col("rn") == 64, F.col("h")))
    return (
        ranked.groupBy("event_type", "n_exact")
        .agg(
            F.when(F.col("n_exact") >= 64, hk).cast("long").alias("h_k"),
            F.when(
                F.col("n_exact") >= 64,
                F.lit(63.0)
                * F.lit(1152921504606846976.0)
                / hk.cast("double"),
            )
            .otherwise(F.col("n_exact").cast("double"))
            .alias("est_distinct"),
        )
        .select(
            "event_type",
            F.col("n_exact").cast("long").alias("n_exact"),
            "h_k",
            "est_distinct",
        )
        .orderBy("event_type")
    )


@register(
    "events_mix_shift_decomposition",
    # Exact integer cells; each effect a fixed scalar expression over
    # them (single IEEE divisions, fixed subtraction order) — row
    # math, not aggregation-order float sums.
    oracle="""
    WITH cell AS (
      SELECT event_type,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1
                           ELSE 0 END) AS BIGINT) AS n_pre,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1
                           ELSE 0 END) AS BIGINT) AS n_post,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                           THEN CAST(value AS DECIMAL(14,2)) * 100
                           ELSE 0 END) AS BIGINT) AS x_pre,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                           THEN CAST(value AS DECIMAL(14,2)) * 100
                           ELSE 0 END) AS BIGINT) AS x_post
      FROM events GROUP BY event_type
    )
    SELECT event_type, n_pre, n_post, x_pre, x_post,
           CAST(x_post - x_pre AS BIGINT) AS delta_cents,
           CAST((n_post - n_pre) * x_pre AS DOUBLE)
             / CAST(n_pre AS DOUBLE) AS volume_effect,
           CAST(CAST(n_pre AS HUGEINT) * x_post AS DOUBLE)
             / CAST(n_post AS DOUBLE) - CAST(x_pre AS DOUBLE)
             AS rate_effect,
           CAST(x_post - x_pre AS DOUBLE)
             - CAST((n_post - n_pre) * x_pre AS DOUBLE)
               / CAST(n_pre AS DOUBLE)
             - (CAST(CAST(n_pre AS HUGEINT) * x_post AS DOUBLE)
                / CAST(n_post AS DOUBLE) - CAST(x_pre AS DOUBLE))
             AS interaction
    FROM cell WHERE n_pre > 0 AND n_post > 0
    ORDER BY event_type
    """,
)
def events_mix_shift_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X224 period-over-period mix-shift decomposition per event type:
    Δrevenue = volume effect (count change at old rate) + rate effect
    (per-event value change at old volume) + interaction — the
    classic BI bridge that says WHY the total moved, not just that it
    did (complements X189 diff-in-diff, which needs an assignment;
    this needs only two periods). Exactness: the 2x2 cells are exact
    BIGINT cents/counts from ONE scan; each effect is a fixed scalar
    expression over them — single IEEE divisions in a pinned order,
    so cross-engine bit-identical without any quantization."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    cents = F.col("value").cast("decimal(14,2)") * 100
    cell = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .cast("long")
        .alias("n_pre"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
        .cast("long")
        .alias("n_post"),
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(0))
        .cast("long")
        .alias("x_pre"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0))
        .cast("long")
        .alias("x_post"),
    )
    vol = (
        ((F.col("n_post") - F.col("n_pre")) * F.col("x_pre")).cast("double")
        / F.col("n_pre").cast("double")
    )
    rate = (
        (F.col("n_pre").cast("decimal(38,0)") * F.col("x_post")).cast(
            "double"
        )
        / F.col("n_post").cast("double")
        - F.col("x_pre").cast("double")
    )
    return (
        cell.where((F.col("n_pre") > 0) & (F.col("n_post") > 0))
        .select(
            "event_type",
            "n_pre",
            "n_post",
            "x_pre",
            "x_post",
            (F.col("x_post") - F.col("x_pre"))
            .cast("long")
            .alias("delta_cents"),
            vol.alias("volume_effect"),
            rate.alias("rate_effect"),
            (
                (F.col("x_post") - F.col("x_pre")).cast("double")
                - vol
                - rate
            ).alias("interaction"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_brown_forsythe",
    # Doubled group medians -> integer |deviation| scores -> micro-
    # quantized group means -> exact HUGEINT/DECIMAL(38) squared-sum
    # moments; F one final division (VARCHAR hop for DuckDB's wide-
    # decimal->double).
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS x,
             event_id
      FROM events
    ),
    ranked AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY x, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    med AS (
      SELECT event_type,
             CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                           THEN x ELSE 0 END)
                  * CASE WHEN (n + 1) // 2 = (n + 2) // 2 THEN 2
                         ELSE 1 END AS BIGINT) AS med2
      FROM ranked GROUP BY event_type, n
    ),
    z AS (
      SELECT v.event_type, abs(2 * v.x - m.med2) AS z
      FROM v JOIN med m USING (event_type)
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(z) AS BIGINT) AS s_g
      FROM z GROUP BY event_type
    ),
    gq AS (
      SELECT event_type, n_g, s_g,
             CAST((s_g * 1000000) // n_g AS BIGINT) AS zbar_q
      FROM g
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST((sum(s_g) * 1000000) // sum(n_g) AS BIGINT) AS zbar_all_q
      FROM g
    ),
    between_ AS (
      SELECT CAST(sum(CAST(n_g AS HUGEINT)
                      * (zbar_q - t.zbar_all_q)
                      * (zbar_q - t.zbar_all_q)) AS HUGEINT) AS b_q
      FROM gq CROSS JOIN tot t
    ),
    within_ AS (
      SELECT CAST(sum(CAST(z.z * 1000000 - gq.zbar_q AS HUGEINT)
                      * (z.z * 1000000 - gq.zbar_q)) AS HUGEINT) AS w_q
      FROM z JOIN gq USING (event_type)
    )
    SELECT gq.event_type, gq.n_g, gq.s_g, gq.zbar_q,
           CAST(CAST((t.n - t.k) * b.b_q AS VARCHAR) AS DOUBLE)
             / CAST(CAST((t.k - 1) * w.w_q AS VARCHAR) AS DOUBLE)
             AS f_stat
    FROM gq CROSS JOIN tot t CROSS JOIN between_ b CROSS JOIN within_ w
    ORDER BY gq.event_type
    """,
)
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X223 Brown-Forsythe variance-homogeneity test across event
    types (Levene's test with the MEDIAN center — robust to the heavy
    tails that break plain Levene): do the groups differ in SPREAD,
    not location — the pre-flight check the mean-comparison family
    (z/MW/permutation) silently assumes away. Exactness pipeline:
    doubled exact medians (lo+hi ranks) -> integer deviation scores
    z = |2x − med2| -> micro-quantized group means (x10⁶ integral
    division, the documented quantization point) -> between/within
    squared-sum moments in DECIMAL(38) -> F as ONE division (DuckDB
    side hops wide decimals through VARCHAR; Spark's decimal→double
    is correctly rounded). Per-group rows carry the group stats, the
    F statistic broadcast onto each."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        (F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x"),
        "event_id",
    )
    wr = W.partitionBy("event_type").orderBy("x", "event_id")
    ranked = v.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("event_type"))
    )
    med = ranked.groupBy("event_type", "n").agg(
        (
            F.sum(
                F.when(
                    (F.col("rn") == F.expr("(n + 1) div 2"))
                    | (F.col("rn") == F.expr("(n + 2) div 2")),
                    F.col("x"),
                ).otherwise(0)
            )
            * F.when(
                F.expr("(n + 1) div 2") == F.expr("(n + 2) div 2"), 2
            ).otherwise(1)
        )
        .cast("long")
        .alias("med2")
    ).drop("n")
    z = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("x") - F.col("med2")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("s_g"),
    )
    gq = g.select(
        "event_type",
        "n_g",
        "s_g",
        F.expr("CAST((s_g * 1000000) div n_g AS BIGINT)").alias("zbar_q"),
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.expr(
            "CAST((sum(s_g) * 1000000) div sum(n_g) AS BIGINT)"
        ).alias("zbar_all_q"),
    )
    btw = (
        gq.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n_g").cast("decimal(38,0)")
                * (F.col("zbar_q") - F.col("zbar_all_q"))
                * (F.col("zbar_q") - F.col("zbar_all_q"))
            )
            .cast("decimal(38,0)")
            .alias("b_q")
        )
    )
    within = (
        z.join(F.broadcast(gq), "event_type")
        .agg(
            F.sum(
                (F.col("z") * 1000000 - F.col("zbar_q")).cast(
                    "decimal(38,0)"
                )
                * (F.col("z") * 1000000 - F.col("zbar_q"))
            )
            .cast("decimal(38,0)")
            .alias("w_q")
        )
    )
    return (
        gq.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btw))
        .crossJoin(F.broadcast(within))
        .select(
            "event_type",
            "n_g",
            "s_g",
            "zbar_q",
            (
                ((F.col("n") - F.col("k")) * F.col("b_q")).cast("double")
                / ((F.col("k") - 1) * F.col("w_q")).cast("double")
            ).alias("f_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "text_term_dispersion",
    # DP = 0.5·Σ_i |v_i − s_i| with the all-sources sum folded to the
    # observed rows only (missing-source terms contribute f·t_i, so
    # Σ = Σ_obs(|c·T − f·t| − f·t) + f·T) — exact integers, ONE
    # division per term.
    oracle="""
    WITH toks AS (
      SELECT source, unnest(list_filter(
        string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''
      )) AS term
      FROM documents
    ),
    c AS (
      SELECT term, source, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    src AS (SELECT source, CAST(count(*) AS BIGINT) AS t_i
            FROM toks GROUP BY source),
    tw AS (SELECT term, CAST(sum(c) AS BIGINT) AS f_w FROM c GROUP BY term),
    tot AS (SELECT CAST(sum(t_i) AS BIGINT) AS t FROM src),
    obs AS (
      SELECT c.term,
             CAST(sum(abs(c.c * tt.t - tw.f_w * s.t_i)
                      - tw.f_w * s.t_i) AS BIGINT) AS part
      FROM c
      JOIN src s USING (source)
      JOIN tw USING (term)
      CROSS JOIN tot tt
      GROUP BY c.term
    )
    SELECT o.term, tw.f_w,
           CAST(o.part + tw.f_w * tt.t AS BIGINT) AS dp_num,
           CAST(o.part + tw.f_w * tt.t AS DOUBLE)
             / (2.0 * CAST(tw.f_w AS DOUBLE) * CAST(tt.t AS DOUBLE))
             AS dispersion
    FROM obs o JOIN tw USING (term) CROSS JOIN tot tt
    ORDER BY o.term
    """,
)
def text_term_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X225 corpus term dispersion (Gries' DP, public): per term, half
    the L1 distance between its across-source distribution and the
    source size distribution — 0 = the term spreads exactly like the
    corpus, →1 = it lives in one source (a burst/boilerplate/topic
    marker the frequency column can't see; the per-term complement of
    X48's corpus-level drift). Exactness: the all-sources sum folds
    to observed rows only (a missing source contributes f·t_i, so
    Σ = Σ_obs(|c·T − f·t_i| − f·t_i) + f·T — no zero-fill join),
    every term exact BIGINT, ONE division per term. Vocab-sized
    aggregates; the per-(term, source) frame is the only corpus-
    keyed shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    c = toks.groupBy("term", "source").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    src = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("t_i")
    )
    tw = c.groupBy("term").agg(F.sum("c").cast("long").alias("f_w"))
    tot = src.agg(F.sum("t_i").cast("long").alias("t"))
    obs = (
        c.join(F.broadcast(src), "source")
        .join(F.broadcast(tw), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("term")
        .agg(
            F.sum(
                F.abs(
                    F.col("c") * F.col("t")
                    - F.col("f_w") * F.col("t_i")
                )
                - F.col("f_w") * F.col("t_i")
            )
            .cast("long")
            .alias("part")
        )
    )
    return (
        obs.join(F.broadcast(tw), "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "f_w",
            (F.col("part") + F.col("f_w") * F.col("t"))
            .cast("long")
            .alias("dp_num"),
            (
                (F.col("part") + F.col("f_w") * F.col("t")).cast("double")
                / (
                    F.lit(2.0)
                    * F.col("f_w").cast("double")
                    * F.col("t").cast("double")
                )
            ).alias("dispersion"),
        )
        .orderBy("term")
    )


@register(
    "rules_cofire_matrix",
    # All predicates evaluated in ONE scan, pair overlap via
    # conditional sums in ONE aggregate (no join anywhere); Jaccard
    # one division per pair.
    oracle="""
    WITH f AS (
      SELECT
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r_a,
        CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
             THEN 1 ELSE 0 END AS r_b,
        CASE WHEN value > 100 THEN 1 ELSE 0 END AS r_c,
        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS r_d
      FROM events
    ),
    agg AS (
      SELECT CAST(sum(r_a) AS BIGINT) AS n_a,
             CAST(sum(r_b) AS BIGINT) AS n_b,
             CAST(sum(r_c) AS BIGINT) AS n_c,
             CAST(sum(r_d) AS BIGINT) AS n_d,
             CAST(sum(r_a * r_b) AS BIGINT) AS ab,
             CAST(sum(r_a * r_c) AS BIGINT) AS ac,
             CAST(sum(r_a * r_d) AS BIGINT) AS ad,
             CAST(sum(r_b * r_c) AS BIGINT) AS bc,
             CAST(sum(r_b * r_d) AS BIGINT) AS bd,
             CAST(sum(r_c * r_d) AS BIGINT) AS cd
      FROM f
    )
    SELECT p.rule_a, p.rule_b, p.n_x AS n_a, p.n_y AS n_b, p.n_both,
           CASE WHEN p.n_x + p.n_y - p.n_both > 0
                THEN CAST(p.n_both AS DOUBLE)
                     / CAST(p.n_x + p.n_y - p.n_both AS DOUBLE)
                ELSE 0.0 END AS jaccard
    FROM agg, LATERAL (
      SELECT * FROM (VALUES
        ('purchases', 'hot_props', n_a, n_b, ab),
        ('purchases', 'big_values', n_a, n_c, ac),
        ('purchases', 'errors', n_a, n_d, ad),
        ('hot_props', 'big_values', n_b, n_c, bc),
        ('hot_props', 'errors', n_b, n_d, bd),
        ('big_values', 'errors', n_c, n_d, cd)
      ) t(rule_a, rule_b, n_x, n_y, n_both)
    ) p
    ORDER BY p.rule_a, p.rule_b
    """,
)
def rules_cofire_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X226 rule co-fire overlap matrix: for every pair of rule
    criteria, how many events match BOTH — the rule-governance
    readout that finds redundant rules (Jaccard→1: one rule is the
    other plus noise — merge them) and shadowed rules before they
    double-page the on-call (complements X152's per-rule selectivity
    with the PAIRWISE structure). Criteria go through the reference's
    Trino dialect shim (dialect.trino_to_spark, the S1/F1 path);
    all predicates evaluate in ONE corpus scan and the pair counts
    come from conditional sums in ONE aggregate — no join, no second
    scan, rules² cells from a frame of ONE row."""
    from itertools import combinations

    from alerta_spark.dialect import trino_to_spark

    rules = [
        ("purchases", "event_type = 'purchase'"),
        (
            "hot_props",
            "CAST(json_extract_scalar(props, '$.k') AS INTEGER) > 50",
        ),
        ("big_values", "value > 100"),
        ("errors", "event_type = 'error'"),
    ]
    ev = load_table(spark, sf_dir, "events")
    flags = ev.select(
        *[
            F.when(F.expr(trino_to_spark(crit)), 1)
            .otherwise(0)
            .alias(f"r_{name}")
            for name, crit in rules
        ]
    )
    aggs = []
    for name, _ in rules:
        aggs.append(F.sum(f"r_{name}").cast("long").alias(f"n_{name}"))
    for (na, _), (nb, _) in combinations(rules, 2):
        aggs.append(
            F.sum(F.col(f"r_{na}") * F.col(f"r_{nb}"))
            .cast("long")
            .alias(f"both_{na}_{nb}")
        )
    wide = flags.agg(*aggs)
    pair_rows = []
    for (na, _), (nb, _) in combinations(rules, 2):
        pair_rows.append(
            F.struct(
                F.lit(na).alias("rule_a"),
                F.lit(nb).alias("rule_b"),
                F.col(f"n_{na}").alias("n_a"),
                F.col(f"n_{nb}").alias("n_b"),
                F.col(f"both_{na}_{nb}").alias("n_both"),
            )
        )
    exploded = wide.select(
        F.explode(F.array(*pair_rows)).alias("p")
    ).select("p.*")
    denom = F.col("n_a") + F.col("n_b") - F.col("n_both")
    return exploded.select(
        "rule_a",
        "rule_b",
        "n_a",
        "n_b",
        "n_both",
        F.when(
            denom > 0, F.col("n_both").cast("double") / denom.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    ).orderBy("rule_a", "rule_b")


@register(
    "funnel_max_depth_window",
    # Chained per-anchor min-timestamp joins (all user-keyed), depth
    # from timestamp nullness, per-user max, integer histogram.
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts AS t1 FROM events WHERE event_type = 'signup'
    ),
    s2 AS (
      SELECT s1.user_id, s1.t1, min(v.ts) AS t2
      FROM s1 LEFT JOIN events v
        ON v.user_id = s1.user_id AND v.event_type = 'view'
       AND v.ts > s1.t1 AND v.ts <= s1.t1 + INTERVAL 24 HOUR
      GROUP BY s1.user_id, s1.t1
    ),
    s3 AS (
      SELECT s2.user_id, s2.t1, s2.t2, min(c.ts) AS t3
      FROM s2 LEFT JOIN events c
        ON c.user_id = s2.user_id AND c.event_type = 'click'
       AND s2.t2 IS NOT NULL AND c.ts > s2.t2
       AND c.ts <= s2.t1 + INTERVAL 24 HOUR
      GROUP BY s2.user_id, s2.t1, s2.t2
    ),
    s4 AS (
      SELECT s3.user_id, s3.t1, s3.t2, s3.t3, min(p.ts) AS t4
      FROM s3 LEFT JOIN events p
        ON p.user_id = s3.user_id AND p.event_type = 'purchase'
       AND s3.t3 IS NOT NULL AND p.ts > s3.t3
       AND p.ts <= s3.t1 + INTERVAL 24 HOUR
      GROUP BY s3.user_id, s3.t1, s3.t2, s3.t3
    ),
    depth AS (
      SELECT user_id,
             max(CASE WHEN t4 IS NOT NULL THEN 4
                      WHEN t3 IS NOT NULL THEN 3
                      WHEN t2 IS NOT NULL THEN 2
                      ELSE 1 END) AS max_depth
      FROM s4 GROUP BY user_id
    )
    SELECT CAST(max_depth AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_users
    FROM depth GROUP BY max_depth ORDER BY depth
    """,
)
def funnel_max_depth_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X227 windowFunnel-style max ordered depth: for each user, the
    deepest prefix of signup -> view -> click -> purchase completed
    with STRICTLY increasing timestamps inside 24h of the anchoring
    signup (every signup anchors its own window; the user keeps their
    best run) — the ClickHouse `windowFunnel` semantics, reproduced
    relationally. Each step is a per-anchor min-timestamp LEFT join,
    all user-keyed (per-user fan-out only — at 100 TB the chain
    shuffles on user_id once per step, never globally); the readout
    is the integer depth histogram."""
    ev = load_table(spark, sf_dir, "events")
    ev24 = F.col("t1") + F.expr("interval 24 hours")

    def step(prev, etype, t_prev, t_new):
        e = ev.where(F.col("event_type") == etype).select(
            "user_id", F.col("ts").alias("_ts")
        )
        cond = (
            (F.col(t_prev).isNotNull())
            & (F.col("_ts") > F.col(t_prev))
            & (F.col("_ts") <= ev24)
        )
        keys = [c for c in prev.columns]
        return (
            prev.join(e, "user_id", "left")
            .select(*keys, F.when(cond, F.col("_ts")).alias("_cand"))
            .groupBy(*keys)
            .agg(F.min("_cand").alias(t_new))
        )

    s1 = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("t1")
    )
    s2 = step(s1, "view", "t1", "t2")
    s3 = step(s2, "click", "t2", "t3")
    s4 = step(s3, "purchase", "t3", "t4")
    depth = s4.groupBy("user_id").agg(
        F.max(
            F.when(F.col("t4").isNotNull(), 4)
            .when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .otherwise(1)
        ).alias("max_depth")
    )
    return (
        depth.groupBy(F.col("max_depth").cast("long").alias("depth"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("depth")
    )


@register(
    "timeseries_haar_energy",
    # Unnormalized Haar details (first-half sum minus second-half sum
    # per dyadic block) stay pure BIGINT; absent hours contribute 0
    # without a zero-fill join; energy share one division per row.
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts)
                  AS BIGINT) AS idx
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        AND date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) < 512
    ),
    lv AS (SELECT unnest(generate_series(1, 4)) AS level),
    d AS (
      SELECT h.event_type, lv.level,
             idx // (1 << level) AS block,
             CAST(sum(CASE WHEN (idx // (1 << (level - 1))) % 2 = 0
                           THEN 1 ELSE -1 END) AS BIGINT) AS detail
      FROM h CROSS JOIN lv
      GROUP BY 1, 2, 3
    ),
    e AS (
      SELECT event_type, CAST(level AS BIGINT) AS level,
             CAST(sum(detail * detail) AS BIGINT) AS energy_q
      FROM d GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(sum(energy_q) AS BIGINT) AS total_q
      FROM e GROUP BY event_type
    )
    SELECT e.event_type, e.level, e.energy_q,
           CAST(e.energy_q AS DOUBLE) / CAST(t.total_q AS DOUBLE)
             AS energy_share
    FROM e JOIN tot t USING (event_type)
    ORDER BY e.event_type, e.level
    """,
)
def timeseries_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X229 Haar wavelet energy spectrum of the hourly event-count
    signal (levels 1-4: 2h/4h/8h/16h timescales over the first 512
    hours): per type, WHERE the count variance lives — level-1-heavy
    means minute-to-minute churn (alert on rate), level-4-heavy means
    slow regime swings (alert on trend); the timescale-selection
    readout behind choosing a hop-window size (T2) or an EWMA
    half-life (X99). Exactness: unnormalized Haar details (first-half
    minus second-half block sums) are integer event counts — no
    averaging, no floats; absent hours contribute zero WITHOUT a
    dense-grid fill; energy = Σdetail², share one division. Plan:
    map-only 4x level explode -> one (type, level, block) aggregate
    -> a levels-sized frame."""
    ev = load_table(spark, sf_dir, "events")
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    idx = F.floor(
        (F.unix_micros("ts") - F.unix_micros(t0)) / F.lit(3600000000)
    ).cast("long")
    h = ev.where(F.col("ts") >= t0).select(
        "event_type", idx.alias("idx")
    ).where(F.col("idx") < 512)
    d = (
        h.select(
            "event_type",
            "idx",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("level"),
        )
        .groupBy(
            "event_type",
            "level",
            F.expr("idx div (1 << level)").alias("block"),
        )
        .agg(
            F.sum(
                F.when(
                    F.expr("(idx div (1 << (level - 1))) % 2") == 0, 1
                ).otherwise(-1)
            )
            .cast("long")
            .alias("detail")
        )
    )
    e = d.groupBy("event_type", F.col("level").cast("long").alias("level")).agg(
        F.sum(F.col("detail") * F.col("detail"))
        .cast("long")
        .alias("energy_q")
    )
    tot = e.groupBy("event_type").agg(
        F.sum("energy_q").cast("long").alias("total_q")
    )
    return (
        e.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "level",
            "energy_q",
            (
                F.col("energy_q").cast("double")
                / F.col("total_q").cast("double")
            ).alias("energy_share"),
        )
        .orderBy("event_type", "level")
    )


@register(
    "supply_bullwhip_ratio",
    # CV² per stage as exact integer num/den pairs; the ratio is one
    # division of cross-multiplied DECIMAL(38) products (VARCHAR hop
    # on the DuckDB side for the wide-decimal->double cast).
    oracle="""
    WITH up AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)) * 100)
                  AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    down AS (
      SELECT date_trunc('month', l_shipdate) AS m,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    mu AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss
      FROM up
    ),
    md AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss
      FROM down
    )
    SELECT mu.n AS n_months_up, md.n AS n_months_down,
           CAST(mu.n * mu.ss - CAST(mu.s AS HUGEINT) * mu.s AS VARCHAR)
             AS cv2_up_num,
           CAST(md.n * md.ss - CAST(md.s AS HUGEINT) * md.s AS VARCHAR)
             AS cv2_down_num,
           CAST(CAST((mu.n * mu.ss - CAST(mu.s AS HUGEINT) * mu.s)
                     * (CAST(md.s AS HUGEINT) * md.s) AS VARCHAR)
                AS DOUBLE)
           / CAST(CAST((md.n * md.ss - CAST(md.s AS HUGEINT) * md.s)
                       * (CAST(mu.s AS HUGEINT) * mu.s) AS VARCHAR)
                  AS DOUBLE) AS bullwhip
    FROM mu CROSS JOIN md
    """,
)
def supply_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X228 bullwhip-effect ratio (Lee et al. 1997, public): variance
    amplification up the supply chain — CV² of monthly ORDER revenue
    over CV² of monthly SHIPPED quantity; > 1 means order volatility
    exceeds demand volatility (the batching/panic-ordering signature
    planners damp with smaller, more frequent orders). Unit-free by
    construction (CV² cancels scale, so cents vs quantity compare
    legally). Exactness: each CV² is an exact integer numerator /
    denominator (n·Σx² − (Σx)² over (Σx)², DECIMAL(38)); the ratio
    cross-multiplies both exactly and divides ONCE; the giant exact
    numerators travel as strings (both engines print integers
    identically; DuckDB's wide-decimal->double would double-round)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    up = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x")
    )
    down = li.groupBy(F.date_trunc("month", "l_shipdate").alias("m")).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("x")
    )

    def mom(df):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
            .cast("decimal(38,0)")
            .alias("ss"),
        )

    mu = mom(up).select(
        F.col("n").alias("nu"), F.col("s").alias("su"), F.col("ss").alias("ssu")
    )
    md = mom(down).select(
        F.col("n").alias("nd"), F.col("s").alias("sd"), F.col("ss").alias("ssd")
    )
    num_u = F.col("nu") * F.col("ssu") - F.col("su").cast("decimal(38,0)") * F.col("su")
    num_d = F.col("nd") * F.col("ssd") - F.col("sd").cast("decimal(38,0)") * F.col("sd")
    return mu.crossJoin(md).select(
        F.col("nu").alias("n_months_up"),
        F.col("nd").alias("n_months_down"),
        num_u.cast("decimal(38,0)").cast("string").alias("cv2_up_num"),
        num_d.cast("decimal(38,0)").cast("string").alias("cv2_down_num"),
        (
            (num_u * (F.col("sd").cast("decimal(38,0)") * F.col("sd")))
            .cast("double")
            / (num_d * (F.col("su").cast("decimal(38,0)") * F.col("su")))
            .cast("double")
        ).alias("bullwhip"),
    )


@register(
    "text_kneser_ney_bigrams",
    # Interpolated KN with d=3/4 folded into ONE exact fraction:
    # P(w|v) = [B·max(4c(vw)−3,0) + 3·N1+(v·)·N1+(·w)] / (4·c(v)·B);
    # the within-context top-3 ranks on the integer numerator.
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS ws
      FROM documents
    ),
    bg AS (
      SELECT z[1] AS v, z[2] AS w, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS z
        FROM toks
      ) GROUP BY 1, 2
    ),
    ctx AS (
      SELECT v, CAST(sum(c) AS BIGINT) AS c_v,
             CAST(count(*) AS BIGINT) AS n1_fwd
      FROM bg GROUP BY v
    ),
    cont AS (SELECT w, CAST(count(*) AS BIGINT) AS n1_bwd
             FROM bg GROUP BY w),
    b AS (SELECT CAST(count(*) AS BIGINT) AS b_types FROM bg),
    p AS (
      SELECT bg.v, bg.w, bg.c,
             CAST(b.b_types * greatest(4 * bg.c - 3, 0)
                  + 3 * ctx.n1_fwd * cont.n1_bwd AS BIGINT) AS num_q,
             CAST(4 * ctx.c_v * b.b_types AS BIGINT) AS den_q
      FROM bg JOIN ctx USING (v) JOIN cont USING (w) CROSS JOIN b
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY v
                                   ORDER BY num_q DESC, w) AS rnk
      FROM p
    )
    SELECT v, w, c, num_q, den_q,
           CAST(num_q AS DOUBLE) / CAST(den_q AS DOUBLE) AS p_kn,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY v, rnk
    """,
)
def text_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X230 interpolated Kneser-Ney bigram model (Kneser & Ney 1995,
    the standard n-gram smoothing) over the corpus: absolute
    discounting (d=3/4) with CONTINUATION-count backoff — the part
    plain MLE and even Good-Turing (X209) miss: a word's backoff mass
    follows how many contexts it completes, not how often it occurs.
    Exactness: with d=3/4 the whole interpolated probability folds
    into ONE integer fraction, P(w|v) = [B·max(4c−3,0) +
    3·N1+(v·)·N1+(·w)] / (4·c(v)·B) — no float smoothing anywhere;
    the per-context top-3 ranks on the integer numerator (denominator
    constant within v), p one division at the edge. All frames
    vocab-sized after ONE corpus bigram aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    bg = (
        docs.select(ws.alias("ws"))
        .select(
            F.explode(
                F.zip_with(
                    F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                    F.slice("ws", 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                    lambda x, y: F.struct(x.alias("v"), y.alias("w")),
                )
            ).alias("z")
        )
        .groupBy(F.col("z.v").alias("v"), F.col("z.w").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ctx = bg.groupBy("v").agg(
        F.sum("c").cast("long").alias("c_v"),
        F.count(F.lit(1)).cast("long").alias("n1_fwd"),
    )
    cont = bg.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n1_bwd")
    )
    b = bg.agg(F.count(F.lit(1)).cast("long").alias("b_types"))
    p = (
        bg.join(F.broadcast(ctx), "v")
        .join(F.broadcast(cont), "w")
        .crossJoin(F.broadcast(b))
        .select(
            "v",
            "w",
            "c",
            (
                F.col("b_types")
                * F.greatest(4 * F.col("c") - 3, F.lit(0))
                + 3 * F.col("n1_fwd") * F.col("n1_bwd")
            )
            .cast("long")
            .alias("num_q"),
            (4 * F.col("c_v") * F.col("b_types"))
            .cast("long")
            .alias("den_q"),
        )
    )
    wr = W.partitionBy("v").orderBy(F.desc("num_q"), F.asc("w"))
    return (
        p.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .where(F.col("rnk") <= 3)
        .select(
            "v",
            "w",
            "c",
            "num_q",
            "den_q",
            (F.col("num_q").cast("double") / F.col("den_q").cast("double"))
            .alias("p_kn"),
            "rnk",
        )
        .orderBy("v", "rnk")
    )


@register(
    "events_evt_tail_index",
    # Exceedance moments exact BIGINT; ξ and σ single fixed
    # expressions over them (pinned IEEE order), no quantization.
    oracle="""
    WITH exc AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(14,2)) * 100 - 10000 AS BIGINT)
               AS y
      FROM events
      WHERE CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) > 10000
    ),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS ss
      FROM exc GROUP BY event_type
    )
    SELECT event_type, n, s, ss,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_excess,
           0.5 * (1.0 - CAST(CAST(s AS HUGEINT) * s * (n - 1) AS DOUBLE)
                        / CAST(CAST(n AS HUGEINT)
                               * (n * ss - CAST(s AS HUGEINT) * s)
                               AS DOUBLE)) AS xi_hat
    FROM m WHERE n >= 2
    ORDER BY event_type
    """,
)
def events_evt_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X232 peak-over-threshold extreme-value screen: for values
    exceeding the 100.00 threshold, the mean excess and the GPD
    moment estimator ξ̂ = ½(1 − m²/s²) per event type — ξ > 0 means a
    heavy tail where the 'once-a-year' alert level is much further
    out than a normal fit claims (the principled way to place the
    static thresholds X117 tunes empirically). Exactness: exceedance
    moments are exact BIGINT sums; ξ̂ is a single fixed expression
    over them (cross-multiplied numerator/denominator, pinned IEEE
    order) — no quantization needed. One filtered aggregate."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(14,2)") * 100).cast("long")
    exc = ev.where(cents > 10000).select(
        "event_type", (cents - 10000).alias("y")
    )
    m = exc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("long")
        .alias("ss"),
    )
    s38 = F.col("s").cast("decimal(38,0)")
    return (
        m.where(F.col("n") >= 2)
        .select(
            "event_type",
            "n",
            "s",
            "ss",
            (
                F.col("s").cast("double") / F.col("n").cast("double") / 100.0
            ).alias("mean_excess"),
            (
                0.5
                * (
                    F.lit(1.0)
                    - (s38 * F.col("s") * (F.col("n") - 1)).cast("double")
                    / (
                        F.col("n").cast("decimal(38,0)")
                        * (F.col("n") * F.col("ss") - s38 * F.col("s"))
                    ).cast("double")
                )
            ).alias("xi_hat"),
        )
        .orderBy("event_type")
    )


@register(
    "sessions_expected_steps_to_purchase",
    # 16 quantized value-iteration rounds over the (types²)-sized
    # transition matrix; each round E' = 1e6 + (Σ c_ij·E_j) div c_i —
    # pure BIGINT, replayed by a recursive CTE.
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS src, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_src FROM t GROUP BY src),
    states AS (SELECT src FROM tot WHERE src <> 'purchase'),
    it AS (
      SELECT src, CAST(0 AS BIGINT) AS e_q, 0 AS r FROM states
      UNION ALL
      SELECT s.src,
             CAST(1000000 + coalesce((
               SELECT sum(t.n * p.e_q) FROM t JOIN it p
                 ON p.src = t.dst AND p.r = i.r
               WHERE t.src = s.src AND t.dst <> 'purchase'
                 AND p.src = t.dst
             ), 0) // tot.n_src AS BIGINT),
             i.r + 1
      FROM states s JOIN tot ON tot.src = s.src
      JOIN (SELECT DISTINCT r FROM it) i ON i.r < 16
      JOIN it ii ON ii.src = s.src AND ii.r = i.r
    )
    SELECT it.src, tot.n_src,
           CAST(it.e_q AS BIGINT) AS e_steps_q,
           CAST(it.e_q AS DOUBLE) / 1000000.0 AS e_steps
    FROM it JOIN tot USING (src)
    WHERE it.r = 16
    ORDER BY it.src
    """,
)
def sessions_expected_steps_to_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X231 expected steps to purchase (absorbing-chain value
    iteration): from each non-purchase state, the expected number of
    transitions until the user's next purchase under the X105 Markov
    model, truncated at 16 rounds — the 'how far is each state from
    converting' companion to the transition matrix and entropy rate
    (X213). Exactness: each value-iteration round is
    E'_i = 1 + Σ_j c_ij·E_j / c_i computed as a micro-quantized
    integral division (the X98 pinned-iteration discipline); the
    oracle replays all 16 rounds with a recursive CTE. Distribution
    of labor: the corpus produces the |types|²-row transition matrix
    (one window + one aggregate); the 16 rounds run driver-side on
    that BOUNDED summary — the same driver-holds-tiny-state shape as
    kmeans/BPE."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = (
        seq.groupBy(
            F.col("event_type").alias("src"),
            F.col("next_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    n_src: dict[str, int] = {}
    edges: dict[str, list[tuple[str, int]]] = {}
    for r in t:
        n_src[r["src"]] = n_src.get(r["src"], 0) + int(r["n"])
        edges.setdefault(r["src"], []).append((r["dst"], int(r["n"])))
    states = sorted(s for s in n_src if s != "purchase")
    e_q = {s: 0 for s in states}
    for _ in range(16):
        nxt = {}
        for s in states:
            acc = sum(
                n * e_q[d]
                for d, n in edges.get(s, [])
                if d != "purchase" and d in e_q
            )
            nxt[s] = 1000000 + acc // n_src[s]
        e_q = nxt
    rows = [(s, n_src[s], e_q[s], e_q[s] / 1000000.0) for s in states]
    return spark.createDataFrame(
        rows, "src string, n_src long, e_steps_q long, e_steps double"
    )


@register(
    "parts_abc_xyz_classification",
    # ABC by exact cumulative-revenue cross-compare (cum·5 vs tot·4 /
    # cum·20 vs tot·19), XYZ by CV² integer band compares — no float
    # thresholds anywhere; output is the 3x3 class grid.
    oracle="""
    WITH pr AS (
      SELECT l_partkey AS part,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * 100)
                  AS BIGINT) AS rev,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
             CAST(sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS sqq
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT *, CAST(sum(rev) OVER (ORDER BY rev DESC, part) AS BIGINT)
               AS cum,
             CAST(sum(rev) OVER () AS BIGINT) AS tot
      FROM pr
    ),
    cls AS (
      SELECT part, n, sq, sqq,
             CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B'
                  ELSE 'C' END AS abc,
             CASE WHEN n < 2 THEN 'Z'
                  WHEN (n * sqq - CAST(sq AS HUGEINT) * sq) * 100
                       <= CAST(sq AS HUGEINT) * sq * (n - 1) THEN 'X'
                  WHEN (n * sqq - CAST(sq AS HUGEINT) * sq) * 4
                       <= CAST(sq AS HUGEINT) * sq * (n - 1) THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM ranked
    )
    SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts
    FROM cls GROUP BY abc, xyz ORDER BY abc, xyz
    """,
)
def parts_abc_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X233 ABC/XYZ inventory classification: parts bucketed by
    cumulative revenue share (A: first 80%, B: to 95%, C: rest) and
    by per-order quantity variability (X: CV <= 0.1, Y: CV <= 0.5,
    Z: else — the plan-by-forecast / plan-by-buffer / plan-on-demand
    split every S&OP process runs). Exactness: the ABC cut compares
    exact cumulative cents cross-multiplied against the total (the
    X106 Pareto discipline); the CV bands compare n·Σq²−(Σq)² against
    (Σq)²·(n−1) scaled by band constants — squared-CV thresholds as
    pure integer inequalities, no division anywhere until none is
    needed. One part-grain aggregate + one revenue-ordered cumsum
    window over the PART frame (bounded), 3x3 output."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("rev"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sq"),
        F.sum(
            F.col("l_quantity").cast("decimal(38,0)")
            * F.col("l_quantity").cast("long")
        )
        .cast("long")
        .alias("sqq"),
    )
    wc = W.orderBy(F.desc("rev"), F.asc("part")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ranked = pr.withColumn(
        "cum", F.sum("rev").over(wc).cast("long")
    ).withColumn(
        "tot",
        F.sum("rev").over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).cast("long"),
    )
    sq38 = F.col("sq").cast("decimal(38,0)")
    var_num = F.col("n") * F.col("sqq") - sq38 * F.col("sq")
    var_den = sq38 * F.col("sq") * (F.col("n") - 1)
    cls = ranked.select(
        "part",
        "n",
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(F.col("n") < 2, "Z")
        .when(var_num * 100 <= var_den, "X")
        .when(var_num * 4 <= var_den, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        cls.groupBy("abc", "xyz")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .orderBy("abc", "xyz")
    )


@register(
    "clustering_silhouette_pinned",
    # Simplified silhouette on quantized squared-L2 to the pinned
    # centroids: a = own-cell distance, b = min other-cell distance,
    # s = ((b−a)·10⁶) div max(a,b) — integers end to end, one final
    # division per cell.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    idx AS (SELECT unnest(generate_series(1, 64)) AS pos),
    q AS (
      SELECT vec_id, pos, CAST(floor(v[pos] * 1000000.0) AS BIGINT) AS c
      FROM e, idx
    ),
    w AS (
      SELECT cent, pos, wts[pos] AS wv
      FROM (VALUES {C_VALUES}) cw(cent, wts), idx
    ),
    dist AS (
      SELECT q.vec_id, w.cent,
             CAST(sum((q.c - w.wv) * (q.c - w.wv)) AS BIGINT) AS d2
      FROM q JOIN w USING (pos) GROUP BY q.vec_id, w.cent
    ),
    dots AS (
      SELECT q.vec_id, w.cent, sum(q.c * w.wv) AS d
      FROM q JOIN w USING (pos) GROUP BY q.vec_id, w.cent
    ),
    cells AS (
      SELECT vec_id, cent AS cell FROM (
        SELECT vec_id, cent,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cent ASC) AS rn
        FROM dots
      ) WHERE rn = 1
    ),
    ab AS (
      SELECT d.vec_id, c.cell,
             max(CASE WHEN d.cent = c.cell THEN d.d2 END) AS a,
             min(CASE WHEN d.cent <> c.cell THEN d.d2 END) AS b
      FROM dist d JOIN cells c USING (vec_id)
      GROUP BY d.vec_id, c.cell
    ),
    s AS (
      SELECT cell,
             CAST((CAST(b - a AS HUGEINT) * 1000000)
                  // greatest(greatest(a, b), 1) AS BIGINT) AS s_q
      FROM ab
    )
    SELECT CAST(cell AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(s_q) AS BIGINT) AS s_sum_q,
           CAST(sum(s_q) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean_silhouette
    FROM s GROUP BY cell ORDER BY cell
    """.replace("{C_VALUES}", _ivf_centroid_values()),
)
def clustering_silhouette_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X234 simplified silhouette per pinned-centroid cell (centroid-
    distance variant of Rousseeuw 1987): a = squared distance to the
    OWN cell's centroid, b = min over other centroids,
    s = (b−a)/max(a,b) — the cluster-quality observability the
    kmeans/IVF/SemDeDup family reports after any retrain (cells with
    mean s near 0 are boundary mush: raise n_centroids or merge).
    Exactness: distances are quantized squared-L2 BIGINTs; per-point
    s is a x10⁶ integral division; per-cell mean ONE final division.
    Plan: the (point x centroid) distances come from ONE posexplode +
    broadcast centroid join + hash agg (the aggregation-shape
    lesson), then two point-keyed aggregates — no pair joins at
    all."""
    from alerta_spark.ops.similarity import pinned_centroids, quantize_vec

    emb = load_table(spark, sf_dir, "embeddings")
    spark_ = emb.sparkSession
    C = pinned_centroids(64, 16)
    cw = spark_.createDataFrame(
        [
            (c_, p_ + 1, int(w_))
            for c_, wts in enumerate(C)
            for p_, w_ in enumerate(wts)
        ],
        "cent long, pos int, wv long",
    )
    q = emb.select(
        "vec_id", F.posexplode(quantize_vec("embedding")).alias("pos0", "c")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "c")
    joined = q.join(F.broadcast(cw), "pos")
    per = joined.groupBy("vec_id", "cent").agg(
        F.sum((F.col("c") - F.col("wv")) * (F.col("c") - F.col("wv")))
        .cast("long")
        .alias("d2"),
        F.sum(F.col("c") * F.col("wv")).cast("long").alias("dot"),
    )
    best = per.groupBy("vec_id").agg(
        F.max(F.struct(F.col("dot"), (-F.col("cent")).alias("nc"))).alias(
            "_m"
        )
    ).select("vec_id", (-F.col("_m.nc")).alias("cell"))
    ab = (
        per.join(best, "vec_id")
        .groupBy("vec_id", "cell")
        .agg(
            F.max(
                F.when(F.col("cent") == F.col("cell"), F.col("d2"))
            ).alias("a"),
            F.min(
                F.when(F.col("cent") != F.col("cell"), F.col("d2"))
            ).alias("b"),
        )
    )
    s = ab.select(
        "cell",
        F.expr(
            "CAST((CAST(b - a AS DECIMAL(38,0)) * 1000000) div"
            " greatest(greatest(a, b), 1L) AS BIGINT)"
        ).alias("s_q"),
    )
    return (
        s.groupBy(F.col("cell").cast("long").alias("cell"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("s_q").cast("long").alias("s_sum_q"),
        )
        .select(
            "cell",
            "n",
            "s_sum_q",
            (
                F.col("s_sum_q").cast("double")
                / (F.col("n").cast("double") * F.lit(1000000.0))
            ).alias("mean_silhouette"),
        )
        .orderBy("cell")
    )


@register(
    "orders_otif_service_level",
    # Per-order all-lines conjunction as min() of 0/1 flags; OTIF
    # share one division per month.
    oracle="""
    WITH lines AS (
      SELECT l.l_orderkey AS k,
             CAST(min(CASE WHEN l.l_returnflag <> 'R'
                            AND l.l_shipdate <= o.o_orderdate
                                               + INTERVAL 90 DAY
                           THEN 1 ELSE 0 END) AS BIGINT) AS in_full_on_time
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey
    ),
    o AS (
      SELECT date_trunc('month', o_orderdate) AS m, l.in_full_on_time
      FROM orders JOIN lines l ON l.k = o_orderkey
    )
    SELECT CAST(m AS DATE) AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(in_full_on_time) AS BIGINT) AS n_otif,
           CAST(sum(in_full_on_time) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS otif_rate
    FROM o GROUP BY m ORDER BY month
    """,
)
def orders_otif_service_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X235 OTIF (on-time-in-full) service level by order month: an
    order counts only if EVERY line item shipped clean (not returned)
    and on time (within 90 days of the order date — the testdata
    schema has no commit/receipt dates, so the SLA is ship-latency
    based; swap the predicate when those columns exist) — the
    all-lines conjunction computed as min() of 0/1 flags in the
    line-grain aggregate (one shuffle on orderkey), then a
    month-grain rate with ONE division. The supply-chain SLA readout
    alongside fill-rate (X?) and backlog aging (X155)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lines = (
        li.join(
            o.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.min(
                F.when(
                    (F.col("l_returnflag") != "R")
                    & (
                        F.col("l_shipdate")
                        <= F.col("o_orderdate")
                        + F.expr("interval 90 days")
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("in_full_on_time")
        )
    )
    j = o.join(lines, o["o_orderkey"] == lines["k"]).select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        "in_full_on_time",
    )
    return (
        j.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("in_full_on_time").cast("long").alias("n_otif"),
        )
        .select(
            "month",
            "n_orders",
            "n_otif",
            (
                F.col("n_otif").cast("double")
                / F.col("n_orders").cast("double")
            ).alias("otif_rate"),
        )
        .orderBy("month")
    )


@register(
    "text_readability_scores",
    # Vowel-run syllable counting and 10-token pseudo-sentences keep
    # W/S/Syl integers; the FK grade is a fixed two-division
    # expression with literal coefficients — pinned IEEE order.
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS ws
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST((len(ws) + 9) // 10 AS BIGINT) AS n_sents,
             CAST(list_sum(list_transform(ws, w -> greatest(1,
               len(list_filter(string_split_regex(w, '[^aeiouy]+'),
                               t -> t <> ''))))) AS BIGINT) AS n_syll
      FROM d WHERE len(ws) > 0
    )
    SELECT doc_id, n_words, n_sents, n_syll,
           0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
           + 11.8 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))
           - 15.59 AS fk_grade
    FROM m ORDER BY doc_id
    """,
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X236 Flesch-Kincaid grade level per document (public formula):
    the readability feature of the text-quality family (X11's
    length/punct ratios say HOW MUCH text; this says how hard it
    reads — a standard pretraining-quality signal). Deterministic
    sub-metrics on the unpunctuated synthetic corpus: syllables =
    vowel-letter runs per word (min 1, the standard heuristic),
    sentences = 10-token pseudo-sentences (the X200 TextRank
    convention; swap for [.!?] splitting on punctuated text). W, S,
    Syl stay integers; the grade is a fixed literal-coefficient
    expression with two divisions in pinned order. Map-only."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    syll = lambda w: F.greatest(  # noqa: E731
        F.lit(1),
        F.size(
            F.filter(
                F.split(w, "[^aeiouy]+"), lambda t: t != F.lit("")
            )
        ),
    )
    m = (
        docs.select("doc_id", ws.alias("ws"))
        .where(F.size("ws") > 0)
        .select(
            "doc_id",
            F.size("ws").cast("long").alias("n_words"),
            F.expr("CAST((size(ws) + 9) div 10 AS BIGINT)").alias(
                "n_sents"
            ),
            F.aggregate(
                F.transform(F.col("ws"), syll),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x.cast("long"),
            )
            .cast("long")
            .alias("n_syll"),
        )
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_sents",
        "n_syll",
        (
            F.lit(0.39)
            * (F.col("n_words").cast("double") / F.col("n_sents").cast("double"))
            + F.lit(11.8)
            * (F.col("n_syll").cast("double") / F.col("n_words").cast("double"))
            - F.lit(15.59)
        ).alias("fk_grade"),
    ).orderBy("doc_id")


@register(
    "graph_kcore_brands",
    # Round-indexed peeling fixpoint (10 rounds, monotone) replayed
    # with a recursive CTE; the corpus produces the bounded
    # brand-pair edge list, the peel runs on that summary.
    oracle="""
    WITH RECURSIVE co AS (
      SELECT l.l_orderkey AS ok, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT a.b AS u, c.b AS v, CAST(count(*) AS BIGINT) AS w
      FROM co a JOIN co c ON a.ok = c.ok AND a.b < c.b
      GROUP BY 1, 2 HAVING count(*) >= 3
    ),
    sym AS (
      SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
    ),
    alive AS (
      SELECT 0 AS r, u AS node FROM (SELECT DISTINCT u FROM sym)
      UNION ALL
      SELECT a.r + 1, a.node
      FROM alive a
      WHERE a.r < 10
        AND (SELECT count(*) FROM sym s
             JOIN alive a2 ON a2.node = s.v AND a2.r = a.r
             WHERE s.u = a.node) >= 6
    )
    SELECT a.node AS brand,
           CAST((SELECT count(*) FROM sym s
                 JOIN alive a2 ON a2.node = s.v AND a2.r = 10
                 WHERE s.u = a.node) AS BIGINT) AS core_degree
    FROM alive a WHERE a.r = 10
    ORDER BY brand
    """,
)
def graph_kcore_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X237 k-core decomposition of the brand co-purchase graph
    (k=6 over edges with >= 3 shared orders): the densely-connected
    brand community that survives iterative peeling — the
    cross-merchandising core that degree or triangle counts (X?)
    overstate (a hub with leaf neighbors has high degree but no
    core). Peeling is a monotone fixpoint: 10 rounds of 'keep nodes
    with >= k alive-neighbors', replayed round-indexed by the
    oracle's recursive CTE. Distribution of labor: the corpus builds
    the BOUNDED brand-pair edge list (one basket join, brands² max);
    the peel runs driver-side on that summary (the kmeans/BPE/X231
    shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    co = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    a = co.select(F.col("ok"), F.col("b").alias("u"))
    c = co.select(F.col("ok"), F.col("b").alias("v"))
    edges = (
        a.join(c, "ok")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .where(F.col("w") >= 3)
        .collect()
    )
    adj: dict[str, set] = {}
    for r in edges:
        adj.setdefault(r["u"], set()).add(r["v"])
        adj.setdefault(r["v"], set()).add(r["u"])
    alive = set(adj)
    for _ in range(10):
        alive = {n for n in alive if len(adj[n] & alive) >= 6}
    rows = sorted((n, len(adj[n] & alive)) for n in alive)
    return spark.createDataFrame(
        rows or [("__none__", 0)][:0], "brand string, core_degree long"
    )


def _greedy_cover_oracle(k: int) -> str:
    """Unroll k greedy max-coverage rounds as CTEs: each round scores
    every remaining source by its count of not-yet-covered shingles
    (anti-join), picks (gain DESC, source ASC), and extends the
    covered set."""
    sql = [f"""WITH s AS (
      SELECT DISTINCT d.source, sh.sh AS shingle
      FROM documents d, unnest({{SH}}) AS sh(sh)
    ),
    g1 AS (
      SELECT source, CAST(count(*) AS BIGINT) AS gain
      FROM s GROUP BY source
    ),
    c1 AS (SELECT source, gain FROM g1
           ORDER BY gain DESC, source LIMIT 1),
    cov1 AS (SELECT DISTINCT shingle FROM s
             WHERE source IN (SELECT source FROM c1))"""]
    for r in range(2, k + 1):
        p = r - 1
        chosen = " UNION ALL ".join(
            f"SELECT source FROM c{i}" for i in range(1, r)
        )
        sql.append(f""",
    g{r} AS (
      SELECT s.source, CAST(count(*) AS BIGINT) AS gain
      FROM s
      WHERE s.source NOT IN ({chosen})
        AND s.shingle NOT IN (SELECT shingle FROM cov{p})
      GROUP BY s.source
    ),
    c{r} AS (SELECT source, gain FROM g{r}
             ORDER BY gain DESC, source LIMIT 1),
    cov{r} AS (
      SELECT shingle FROM cov{p}
      UNION
      SELECT DISTINCT shingle FROM s
      WHERE source IN (SELECT source FROM c{r})
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT {r} AS rank, source, gain,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM cov{r}) AS covered"
        f" FROM c{r}"
        for r in range(1, k + 1)
    )
    sql.append(
        f"\n    SELECT CAST(rank AS BIGINT) AS rank, source, gain,"
        f" covered FROM (\n      {unions}\n    ) ORDER BY rank"
    )
    return "".join(sql).replace("{SH}", _DUCK_SHINGLES)


@register("corpus_greedy_source_cover", oracle=_greedy_cover_oracle(5))
def corpus_greedy_source_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X238 greedy maximum-coverage source selection (facility-
    location greedy, the 1-1/e approximation): pick 5 sources that
    together cover the most distinct 5-gram shingles — the
    data-mixture selection rule for 'which feeds buy the most
    diversity per dollar' (the SOURCE-grain complement of the
    k-center coreset X218; DSIR X90 weights toward a target, this
    maximizes coverage with no target). Each round: one anti-join of
    the (source, shingle) posting frame against the covered set +
    one source-grain argmax (TakeOrdered) — k bounded rounds, no
    pair joins; the oracle unrolls all rounds as CTEs."""
    from alerta_spark.ops.dedupe import _persist, shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    s = _persist(
        shingle_rows(docs, "text", "doc_id", 5)
        .join(docs.select(F.col("doc_id").alias("_id"), "source"), "_id")
        .select("source", "shingle")
        .distinct()
    )
    chosen: list[tuple[int, str, int, int]] = []
    picked: list[str] = []
    for r in range(1, 6):
        remaining = s.where(~F.col("source").isin(picked)) if picked else s
        if picked:
            cov = s.where(F.col("source").isin(picked)).select(
                "shingle"
            ).distinct()
            gains = (
                remaining.join(cov, "shingle", "left_anti")
                .groupBy("source")
                .agg(F.count(F.lit(1)).cast("long").alias("gain"))
            )
        else:
            gains = remaining.groupBy("source").agg(
                F.count(F.lit(1)).cast("long").alias("gain")
            )
        top = gains.orderBy(F.desc("gain"), F.asc("source")).limit(1).collect()
        if not top:
            break
        picked.append(top[0]["source"])
        # covered is the running sum of gains: each round's gain IS
        # the count of newly covered shingles (no recount pass)
        covered = (chosen[-1][3] if chosen else 0) + int(top[0]["gain"])
        chosen.append((r, top[0]["source"], int(top[0]["gain"]), covered))
    return spark.createDataFrame(
        chosen, "rank long, source string, gain long, covered long"
    )


@register(
    "layout_skipping_effectiveness",
    # Zone-map simulation over both layouts from the SAME scan:
    # bucket spans (integer min/max), 8 data-derived integer range
    # predicates, hit = span-overlap test; skip rates one division.
    oracle=f"""
    WITH q AS (
      SELECT event_id, user_id AS x,
             CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts)
                  AS BIGINT) AS y
      FROM events
    ),
    zb AS (
      SELECT ({_zorder_duck_expr('x', 'y')}) >> 26 AS bucket,
             min(x) AS min_x, max(x) AS max_x
      FROM q GROUP BY 1
    ),
    lb AS (
      SELECT event_id // 4096 AS bucket,
             min(x) AS min_x, max(x) AS max_x
      FROM q GROUP BY 1
    ),
    um AS (SELECT CAST(max(x) AS BIGINT) AS umax FROM q),
    preds AS (
      SELECT i,
             CAST((i * um.umax) // 8 AS BIGINT) AS lo,
             CAST((i * um.umax) // 8 + um.umax // 16 AS BIGINT) AS hi
      FROM (SELECT unnest(generate_series(0, 7)) AS i), um
    )
    SELECT CAST(p.i AS BIGINT) AS pred_idx, p.lo, p.hi,
           CAST((SELECT count(*) FROM zb
                 WHERE zb.min_x <= p.hi AND zb.max_x >= p.lo) AS BIGINT)
             AS z_hit,
           CAST((SELECT count(*) FROM zb) AS BIGINT) AS z_total,
           CAST((SELECT count(*) FROM lb
                 WHERE lb.min_x <= p.hi AND lb.max_x >= p.lo) AS BIGINT)
             AS lin_hit,
           CAST((SELECT count(*) FROM lb) AS BIGINT) AS lin_total,
           1.0 - CAST((SELECT count(*) FROM zb
                 WHERE zb.min_x <= p.hi AND zb.max_x >= p.lo) AS DOUBLE)
               / CAST((SELECT count(*) FROM zb) AS DOUBLE) AS z_skip_rate,
           1.0 - CAST((SELECT count(*) FROM lb
                 WHERE lb.min_x <= p.hi AND lb.max_x >= p.lo) AS DOUBLE)
               / CAST((SELECT count(*) FROM lb) AS DOUBLE)
             AS lin_skip_rate
    FROM preds p
    ORDER BY pred_idx
    """,
)
def layout_skipping_effectiveness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X239 zone-map skipping effectiveness: simulate parquet min/max
    pruning for 8 user-range predicates under TWO layouts — the
    Z-order bucketing (X93) vs arrival order (event_id blocks) — and
    report the fraction of file-buckets each layout lets the scanner
    SKIP. This is the observability that justifies an OPTIMIZE
    ZORDER pass with a number ('z skips 80% of files on a user
    predicate, arrival order skips 0%') instead of faith. All spans
    and predicates are exact integers (predicates derived from
    max(user_id) by integral division, so the readout is
    data-derived but engine-exact); skip rates are one division
    each. One scan builds both bucket span frames."""
    from alerta_spark.ops.layout import zorder_layout_report

    ev = load_table(spark, sf_dir, "events")
    d = F.unix_micros("ts") - F.unix_micros(
        F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    minutes = ((d - d % 60_000_000) / F.lit(60_000_000)).cast("long")
    zb = zorder_layout_report(ev, F.col("user_id"), minutes).select(
        "bucket", "min_x", "max_x"
    )
    lb = (
        ev.select(
            F.expr("event_id div 4096").alias("bucket"),
            F.col("user_id").cast("long").alias("x"),
        )
        .groupBy("bucket")
        .agg(F.min("x").alias("min_x"), F.max("x").alias("max_x"))
    )
    um = ev.agg(F.max("user_id").cast("long").alias("umax"))
    preds = um.select(
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("i"), "umax"
    ).select(
        F.col("i").cast("long").alias("pred_idx"),
        F.expr("CAST((i * umax) div 8 AS BIGINT)").alias("lo"),
        F.expr(
            "CAST((i * umax) div 8 + umax div 16 AS BIGINT)"
        ).alias("hi"),
    )
    zc = zb.count()  # bounded bucket frames (keyspace-derived)
    lc = lb.count()
    zhit = (
        preds.join(
            F.broadcast(zb),
            (zb["min_x"] <= preds["hi"]) & (zb["max_x"] >= preds["lo"]),
            "left",
        )
        .groupBy("pred_idx", "lo", "hi")
        .agg(F.count(F.col("bucket")).cast("long").alias("z_hit"))
    )
    lhit = (
        preds.join(
            F.broadcast(lb),
            (lb["min_x"] <= preds["hi"]) & (lb["max_x"] >= preds["lo"]),
            "left",
        )
        .groupBy("pred_idx")
        .agg(F.count(F.col("bucket")).cast("long").alias("lin_hit"))
    )
    return (
        zhit.join(lhit, "pred_idx")
        .select(
            "pred_idx",
            "lo",
            "hi",
            "z_hit",
            F.lit(zc).cast("long").alias("z_total"),
            "lin_hit",
            F.lit(lc).cast("long").alias("lin_total"),
            (
                F.lit(1.0)
                - F.col("z_hit").cast("double") / F.lit(float(zc))
            ).alias("z_skip_rate"),
            (
                F.lit(1.0)
                - F.col("lin_hit").cast("double") / F.lit(float(lc))
            ).alias("lin_skip_rate"),
        )
        .orderBy("pred_idx")
    )


@register(
    "privacy_generalization_ladder",
    # One explode over 5 generalization levels -> one grouped count
    # per (level, band, month) -> level-grain min/count; pure
    # integers, no division at all.
    oracle="""
    WITH base AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS cents,
             date_trunc('month', o_orderdate) AS m
      FROM orders
    ),
    lv AS (SELECT unnest(generate_series(0, 4)) AS level),
    g AS (
      SELECT lv.level, b.m,
             b.cents // (2000000 * (1 << lv.level)) AS band,
             CAST(count(*) AS BIGINT) AS n
      FROM base b CROSS JOIN lv
      GROUP BY 1, 2, 3
    )
    SELECT CAST(level AS BIGINT) AS level,
           CAST(2000000 * (1 << level) AS BIGINT) AS band_width_cents,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(n) AS BIGINT) AS min_group,
           CAST(CASE WHEN min(n) >= 5 THEN 1 ELSE 0 END AS BIGINT)
             AS k5_ok
    FROM g GROUP BY level ORDER BY level
    """,
)
def privacy_generalization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X240 k-anonymity generalization ladder: the quasi-identifier
    (price band, order month) coarsened through 5 doubling band
    widths, reporting each level's group count and MINIMUM group size
    — the release planner's view: pick the FIRST level whose min
    group reaches k (here k=5), i.e. the least information loss that
    satisfies the X95 screen (which only says pass/fail at one
    level). Pure integer banding (cents div width), one explode +
    one grouped count + a level-grain aggregate; no divisions
    anywhere."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.date_trunc("month", "o_orderdate").alias("m"),
    )
    g = (
        base.select(
            "cents",
            "m",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("level"),
        )
        .groupBy(
            "level",
            "m",
            F.expr("cents div (2000000 * (1 << level))").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        g.groupBy(F.col("level").cast("long").alias("level"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("n").cast("long").alias("min_group"),
        )
        .select(
            "level",
            F.expr("CAST(2000000 * (1 << level) AS BIGINT)").alias(
                "band_width_cents"
            ),
            "n_groups",
            "min_group",
            F.when(F.col("min_group") >= 5, 1)
            .otherwise(0)
            .cast("long")
            .alias("k5_ok"),
        )
        .orderBy("level")
    )


QUERIES_MCNEMAR_ORACLE = """
    WITH pred AS ({LANG}),
    paired AS (
      SELECT CASE WHEN p.lang_pred = d.lang THEN 1 ELSE 0 END AS a_ok,
             CASE WHEN 'en' = d.lang THEN 1 ELSE 0 END AS b_ok
      FROM documents d JOIN pred p USING (doc_id)
    ),
    cell AS (
      SELECT CAST(sum(a_ok * (1 - b_ok)) AS BIGINT) AS b,
             CAST(sum((1 - a_ok) * b_ok) AS BIGINT) AS c,
             CAST(sum(a_ok * b_ok) AS BIGINT) AS both_ok,
             CAST(sum((1 - a_ok) * (1 - b_ok)) AS BIGINT) AS both_bad
      FROM paired
    )
    SELECT b, c, both_ok, both_bad,
           CASE WHEN b + c > 0
                THEN CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                     / CAST(b + c AS DOUBLE)
                ELSE 0.0 END AS mcnemar_chi2
    FROM cell
    """


@register("stats_mcnemar_langid", oracle=None)
def stats_mcnemar_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X241 McNemar's paired test: the n-gram language-ID classifier
    (X10) vs the always-'en' baseline on the SAME documents —
    discordant-pair counts b (only the model right) and c (only the
    baseline right), χ² = (|b−c|−1)²/(b+c) with continuity
    correction. The PAIRED comparison accuracy deltas can't give
    (two models can share an accuracy yet disagree doc-by-doc; only
    b vs c says which to ship) — completing the classifier-eval
    family (X69 confusion, X190 calibration, X182 kappa). Exact
    integer cells from ONE joined aggregate, χ² one division."""
    from alerta_spark.ops.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    pred = language_id(docs).select("doc_id", "lang_pred")
    paired = docs.select("doc_id", "lang").join(pred, "doc_id").select(
        F.when(F.col("lang_pred") == F.col("lang"), 1)
        .otherwise(0)
        .alias("a_ok"),
        F.when(F.lit("en") == F.col("lang"), 1).otherwise(0).alias("b_ok"),
    )
    cell = paired.agg(
        F.sum(F.col("a_ok") * (1 - F.col("b_ok")))
        .cast("long")
        .alias("b"),
        F.sum((1 - F.col("a_ok")) * F.col("b_ok"))
        .cast("long")
        .alias("c"),
        F.sum(F.col("a_ok") * F.col("b_ok")).cast("long").alias("both_ok"),
        F.sum((1 - F.col("a_ok")) * (1 - F.col("b_ok")))
        .cast("long")
        .alias("both_bad"),
    )
    diff = F.abs(F.col("b") - F.col("c")) - 1
    return cell.select(
        "b",
        "c",
        "both_ok",
        "both_bad",
        F.when(
            F.col("b") + F.col("c") > 0,
            (diff * diff).cast("double")
            / (F.col("b") + F.col("c")).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mcnemar_chi2"),
    )


QUERIES["stats_mcnemar_langid"]["oracle"] = QUERIES_MCNEMAR_ORACLE.replace(
    "{LANG}", _lang_oracle()
)


@register(
    "orders_seasonal_index_monthly",
    # Centered 12-month window sums (exact cents, full windows only);
    # the index is cents·12 / window-sum — cross-multiplied exact
    # integers with ONE division per row; calendar-month averages of
    # the doubled-integer form stay exact.
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)) * 100)
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT mon, cents,
             CAST(sum(cents) OVER (ORDER BY mon
                 ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS BIGINT)
               AS win,
             count(*) OVER (ORDER BY mon
                 ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS nwin
      FROM m
    ),
    idx AS (
      SELECT CAST(month(mon) AS BIGINT) AS cal_month,
             cents, win
      FROM w WHERE nwin = 12
    )
    SELECT cal_month,
           CAST(count(*) AS BIGINT) AS n_years,
           CAST(sum(CAST(cents AS HUGEINT) * 12000000 // win) AS BIGINT)
             AS idx_sum_q,
           CAST(sum(CAST(cents AS HUGEINT) * 12000000 // win) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 1000000.0) AS seasonal_index
    FROM idx GROUP BY cal_month ORDER BY cal_month
    """,
)
def orders_seasonal_index_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X242 ratio-to-moving-average seasonal indices: each month's
    revenue over its centered 12-month window sum (x12, so a flat
    series indexes at 1.0), averaged by calendar month across years —
    the classical decomposition's seasonal factor table, the
    deseasonalizing divisor a forecaster applies before trend fitting
    (X88/X211 fit trend; this isolates the seasonal shape). Exact:
    cents and window sums are BIGINT; each ratio is a x10⁶ integral
    division (HUGEINT cross-multiply) so the per-calendar-month mean
    is an exact integer sum with ONE final division. One month-grain
    aggregate + one 12-row window over the MONTH frame."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    ww = W.orderBy("mon").rowsBetween(-6, 5)
    w = m.select(
        "mon",
        "cents",
        F.sum("cents").over(ww).cast("long").alias("win"),
        F.count(F.lit(1)).over(ww).alias("nwin"),
    )
    idx = w.where(F.col("nwin") == 12).select(
        F.month("mon").cast("long").alias("cal_month"),
        F.expr(
            "CAST(CAST(cents AS DECIMAL(38,0)) * 12000000 div win"
            " AS BIGINT)"
        ).alias("r_q"),
    )
    return (
        idx.groupBy("cal_month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_years"),
            F.sum("r_q").cast("long").alias("idx_sum_q"),
        )
        .select(
            "cal_month",
            "n_years",
            "idx_sum_q",
            (
                F.col("idx_sum_q").cast("double")
                / (F.col("n_years").cast("double") * F.lit(1000000.0))
            ).alias("seasonal_index"),
        )
        .orderBy("cal_month")
    )


@register(
    "users_power_curve",
    # Two grouped counts: distinct active days per user, then the
    # k-days histogram — integers only.
    oracle="""
    WITH ud AS (
      SELECT user_id,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
               AS active_days
      FROM events GROUP BY user_id
    )
    SELECT active_days, CAST(count(*) AS BIGINT) AS n_users
    FROM ud GROUP BY active_days ORDER BY active_days
    """,
)
def users_power_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X243 power-user curve: the distribution of distinct active
    days per user over the observation window — the engagement-depth
    histogram (a right-shifted curve is a habit product; a spike at
    1 is drive-by traffic) that DAU-style counts (X58/X137) average
    away. Two grouped counts, all integers; the per-user distinct is
    the only corpus-keyed shuffle."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.groupBy("user_id").agg(
        F.countDistinct(F.col("ts").cast("date"))
        .cast("long")
        .alias("active_days")
    )
    return (
        ud.groupBy("active_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("active_days")
    )


@register(
    "text_char_entropy",
    # H = ln N − (1/N)Σc·ln c via quantized-ln BIGINT dot products:
    # h_q = N·qln(N) − Σ c_i·qln(c_i), ONE division per doc.
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(lower(text), '')) AS c
      FROM documents WHERE length(text) > 0
    ),
    cnt AS (
      SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n
      FROM ch GROUP BY doc_id, c
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(n) AS BIGINT) AS n_chars,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000)
                               AS BIGINT)) AS BIGINT) AS s_q
      FROM cnt GROUP BY doc_id
    )
    SELECT doc_id, n_chars, n_distinct,
           CAST(n_chars * CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 1000000)
                               AS BIGINT) - s_q AS BIGINT) AS h_q,
           CAST(n_chars * CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 1000000)
                               AS BIGINT) - s_q AS DOUBLE)
             / (CAST(n_chars AS DOUBLE) * 1000000.0) AS char_entropy_nats
    FROM agg ORDER BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X244 per-document character entropy: the byte-level randomness
    feature of the quality family — natural language sits ~2.5-3.2
    nats, base64/minified/encrypted junk pushes toward ln(alphabet),
    single-char spam collapses to 0; the cheap first-pass filter
    before any tokenizer runs (complements X36's corpus-level token
    entropy with a per-doc, sub-token signal). Exactness: the
    plug-in entropy folds to H_q = N·qln(N) − Σ c·qln(c) — a BIGINT
    dot product of counts with quantized-ln values (the WOE/PSI/X213
    discipline), ONE division per doc. One explode + two grouped
    aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    ch = docs.where(F.length("text") > 0).select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower("text"), ""), lambda c: c != F.lit("")
            )
        ).alias("c"),
    )
    cnt = ch.groupBy("doc_id", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    qln = lambda col: F.floor(  # noqa: E731
        F.log(col.cast("double")) * 1000000
    ).cast("long")
    agg = cnt.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("n") * qln(F.col("n"))).cast("long").alias("s_q"),
    )
    h_q = (
        F.col("n_chars") * qln(F.col("n_chars")) - F.col("s_q")
    ).cast("long")
    return agg.select(
        "doc_id",
        "n_chars",
        "n_distinct",
        h_q.alias("h_q"),
        (
            h_q.cast("double")
            / (F.col("n_chars").cast("double") * F.lit(1000000.0))
        ).alias("char_entropy_nats"),
    ).orderBy("doc_id")


@register(
    "events_next_event_prediction_eval",
    # Train/test split by time; per-src argmax on (n DESC, dst);
    # accuracy exact counts + one division.
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS next_ts
      FROM events
    ),
    train AS (
      SELECT event_type AS src, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
      FROM seq
      WHERE next_type IS NOT NULL AND next_ts < TIMESTAMP '2024-01-16'
      GROUP BY 1, 2
    ),
    model AS (
      SELECT src, dst AS pred FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY n DESC, dst) AS rn
        FROM train
      ) WHERE rn = 1
    ),
    test AS (
      SELECT event_type AS src, next_type AS actual
      FROM seq
      WHERE next_type IS NOT NULL AND next_ts >= TIMESTAMP '2024-01-16'
    )
    SELECT t.src, m.pred,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.actual = m.pred THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN t.actual = m.pred THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
    FROM test t JOIN model m USING (src)
    GROUP BY t.src, m.pred ORDER BY t.src
    """,
)
def events_next_event_prediction_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X245 next-event prediction eval: the X105 Markov argmax
    trained on the FIRST half of the window and scored on the second
    — per source state, the majority-successor prediction and its
    out-of-sample accuracy (vs the in-sample transition probabilities
    X105 reports; the gap between them is the drift X61/X195 watch
    for). Leakage-safe by the same time-cut discipline as X194/X205:
    a transition belongs to train iff its SUCCESSOR precedes the
    cut. Exact counts, argmax on (n DESC, dst), accuracy one
    division."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cut = F.lit("2024-01-16").cast("timestamp")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    ).where(F.col("next_type").isNotNull())
    train = (
        seq.where(F.col("next_ts") < cut)
        .groupBy(
            F.col("event_type").alias("src"),
            F.col("next_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wr = W.partitionBy("src").orderBy(F.desc("n"), F.asc("dst"))
    model = (
        train.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("src", F.col("dst").alias("pred"))
    )
    test = seq.where(F.col("next_ts") >= cut).select(
        F.col("event_type").alias("src"),
        F.col("next_type").alias("actual"),
    )
    return (
        test.join(F.broadcast(model), "src")
        .groupBy("src", "pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("actual") == F.col("pred"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_hit"),
        )
        .select(
            "src",
            "pred",
            "n_test",
            "n_hit",
            (
                F.col("n_hit").cast("double")
                / F.col("n_test").cast("double")
            ).alias("accuracy"),
        )
        .orderBy("src")
    )


@register(
    "users_segment_migration_matrix",
    # Integer spend-band segments per period; the matrix is one
    # grouped count over the user frame.
    oracle="""
    WITH spend AS (
      SELECT user_id,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                           THEN CAST(value AS DECIMAL(14,2)) * 100
                           ELSE 0 END) AS BIGINT) AS p1,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                           THEN CAST(value AS DECIMAL(14,2)) * 100
                           ELSE 0 END) AS BIGINT) AS p2
      FROM events GROUP BY user_id
    ),
    seg AS (
      SELECT user_id,
             CASE WHEN p1 <= 0 THEN 'none'
                  WHEN p1 < 130000 THEN 'low'
                  WHEN p1 < 190000 THEN 'mid'
                  ELSE 'high' END AS seg_p1,
             CASE WHEN p2 <= 0 THEN 'none'
                  WHEN p2 < 130000 THEN 'low'
                  WHEN p2 < 190000 THEN 'mid'
                  ELSE 'high' END AS seg_p2
      FROM spend
    )
    SELECT seg_p1, seg_p2, CAST(count(*) AS BIGINT) AS n_users
    FROM seg GROUP BY seg_p1, seg_p2 ORDER BY seg_p1, seg_p2
    """,
)
def users_segment_migration_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X246 customer segment migration matrix: spend-band segment
    (none/low/mid/high, fixed cent thresholds pinned near the
    period-1 quartiles) in the first half vs
    the second half of the window — the upgrade/downgrade/churn flow
    behind the static RFM snapshot (X104) and the growth-accounting
    aggregate (X137: that says HOW MANY churned; this says FROM
    WHICH tier). Exact cents, integer band cuts, one user-grain
    aggregate + one 4x4 count."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    cents = F.col("value").cast("decimal(14,2)") * 100
    spend = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(0))
        .cast("long")
        .alias("p1"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0))
        .cast("long")
        .alias("p2"),
    )

    def seg(c):
        return (
            F.when(F.col(c) <= 0, "none")
            .when(F.col(c) < 130000, "low")
            .when(F.col(c) < 190000, "mid")
            .otherwise("high")
        )

    return (
        spend.select(
            seg("p1").alias("seg_p1"), seg("p2").alias("seg_p2")
        )
        .groupBy("seg_p1", "seg_p2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("seg_p1", "seg_p2")
    )


@register(
    "abtest_effect_size_cohens_d",
    # Exact per-arm moments; d and g are fixed scalar expressions
    # over six BIGINTs (pinned IEEE order, row math not float sums).
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT)
               AS x,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR) || 'perm0'),
                                 1, 8) < '80000000'
                  THEN 1 ELSE 0 END AS t
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(sum(t) AS BIGINT) AS nt,
             CAST(sum(t * x) AS BIGINT) AS st,
             CAST(sum(t * x * x) AS BIGINT) AS sst,
             CAST(count(*) - sum(t) AS BIGINT) AS nc,
             CAST(sum((1 - t) * x) AS BIGINT) AS sc,
             CAST(sum((1 - t) * x * x) AS BIGINT) AS ssc
      FROM u
    )
    SELECT nt, st, sst, nc, sc, ssc,
           (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
            - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))
           / sqrt(((CAST(nt AS DOUBLE) * CAST(sst AS DOUBLE)
                    - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                     / CAST(nt AS DOUBLE)
                   + (CAST(nc AS DOUBLE) * CAST(ssc AS DOUBLE)
                      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                     / CAST(nc AS DOUBLE))
                  / CAST(nt + nc - 2 AS DOUBLE)) AS cohens_d,
           ((CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
             - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))
            / sqrt(((CAST(nt AS DOUBLE) * CAST(sst AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                      / CAST(nt AS DOUBLE)
                    + (CAST(nc AS DOUBLE) * CAST(ssc AS DOUBLE)
                       - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                      / CAST(nc AS DOUBLE))
                   / CAST(nt + nc - 2 AS DOUBLE)))
           * (1.0 - 3.0 / CAST(4 * (nt + nc) - 9 AS DOUBLE))
             AS hedges_g
    FROM m
    """,
)
def abtest_effect_size_cohens_d(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X247 effect size for the experiment family: Cohen's d (pooled
    SD standardized mean difference) and the small-sample Hedges g
    correction on per-user spend between the pinned md5 arms — the
    MAGNITUDE readout the significance tests (z X65, MW X186,
    permutation X208) leave out: p says whether, d says how much, in
    units a power calculation can consume. Exactness: per-arm
    moments are exact BIGINTs (sums fit: x·x ~ 1e11, user-summed);
    d and g are fixed scalar expressions over those six integers —
    pinned IEEE order, bit-identical without quantization."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x")
    ).select(
        "x",
        F.when(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("perm0"))),
                1,
                8,
            )
            < "80000000",
            1,
        )
        .otherwise(0)
        .alias("t"),
    )
    m = u.agg(
        F.sum("t").cast("long").alias("nt"),
        F.sum(F.col("t") * F.col("x")).cast("long").alias("st"),
        F.sum(F.col("t") * F.col("x") * F.col("x"))
        .cast("long")
        .alias("sst"),
        (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("nc"),
        F.sum((1 - F.col("t")) * F.col("x")).cast("long").alias("sc"),
        F.sum((1 - F.col("t")) * F.col("x") * F.col("x"))
        .cast("long")
        .alias("ssc"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    mean_diff = dbl("st") / dbl("nt") - dbl("sc") / dbl("nc")
    pooled = (
        (
            (dbl("nt") * dbl("sst") - dbl("st") * dbl("st")) / dbl("nt")
            + (dbl("nc") * dbl("ssc") - dbl("sc") * dbl("sc")) / dbl("nc")
        )
        / (F.col("nt") + F.col("nc") - 2).cast("double")
    )
    d = mean_diff / F.sqrt(pooled)
    return m.select(
        "nt",
        "st",
        "sst",
        "nc",
        "sc",
        "ssc",
        d.alias("cohens_d"),
        (
            d
            * (
                F.lit(1.0)
                - F.lit(3.0)
                / (4 * (F.col("nt") + F.col("nc")) - 9).cast("double")
            )
        ).alias("hedges_g"),
    )


@register(
    "corpus_quality_buckets_ccnet",
    # The per-doc NLL total stays an exact nano-nat BIGINT; bucket
    # cuts are integer cross-compares against pinned thresholds x n —
    # never a float mean; counts/token totals exact.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text),
                                                   '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    vocab AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_corpus FROM vocab),
    q AS (
      SELECT term,
             CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000) AS BIGINT)
               AS qv
      FROM vocab
    ),
    nll AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) * (SELECT CAST(floor(ln(CAST(n_corpus AS DOUBLE))
                                   * 1000000000) AS BIGINT) FROM tot)
                  - sum(q.qv) AS BIGINT) AS nll_q
      FROM toks t JOIN q USING (term) GROUP BY t.doc_id
    ),
    b AS (
      SELECT d.lang, n.n,
             CASE WHEN n.nll_q < 3399700000 * n.n THEN 'head'
                  WHEN n.nll_q < 3404100000 * n.n THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM nll n JOIN documents d USING (doc_id)
    )
    SELECT bucket, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens
    FROM b GROUP BY bucket, lang ORDER BY bucket, lang
    """,
)
def corpus_quality_buckets_ccnet(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X248 CCNet-style head/middle/tail quality bucketing (Wenzek et
    al. 2020, arXiv:1911.00359): documents split by unigram-LM NLL
    into the three perplexity tiers CCNet feeds downstream at
    different sampling rates — the corpus-curation cut that X35
    scores but never materializes. Thresholds are PINNED nano-nat
    literals (production recomputes per language/snapshot); the
    bucket cut is an integer cross-compare nll_q < T·n — the per-doc
    float mean never exists, so the tier assignment is engine-exact.
    Output: tier x lang doc and token counts (the sampling-budget
    table)."""
    from alerta_spark.ops.text import unigram_nll_totals

    docs = load_table(spark, sf_dir, "documents")
    nll = unigram_nll_totals(docs)
    b = nll.join(docs.select("doc_id", "lang"), "doc_id").select(
        "lang",
        "n_tokens",
        F.when(
            F.col("nll_total_q") < 3399700000 * F.col("n_tokens"), "head"
        )
        .when(
            F.col("nll_total_q") < 3404100000 * F.col("n_tokens"),
            "middle",
        )
        .otherwise("tail")
        .alias("bucket"),
    )
    return (
        b.groupBy("bucket", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("bucket", "lang")
    )


@register(
    "timeseries_variance_ratio",
    # Dense day grid, exact integer diff sums for k in {2,5,7}; VR is
    # one cross-multiplied division of exact HUGEINT products.
    oracle="""
    WITH daily0 AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT)
               AS x
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT event_type, min(day) AS d0, max(day) AS d1
      FROM daily0 GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                  AS DATE) AS day
      FROM span
    ),
    dense AS (
      SELECT g.event_type, g.day,
             CAST(row_number() OVER (PARTITION BY g.event_type
                                     ORDER BY g.day) AS BIGINT) AS i,
             coalesce(d.x, 0) AS x
      FROM grid g LEFT JOIN daily0 d
        ON d.event_type = g.event_type AND d.day = g.day
    ),
    ks AS (SELECT unnest([2, 5, 7]) AS k),
    diffs AS (
      SELECT a.event_type, ks.k,
             CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(CAST(a.x - b.x AS HUGEINT) * (a.x - b.x))
                  AS HUGEINT) AS ss1
      FROM dense a JOIN dense b
        ON b.event_type = a.event_type AND b.i = a.i - 1
      CROSS JOIN ks
      GROUP BY 1, 2
    ),
    diffk AS (
      SELECT a.event_type, ks.k,
             CAST(count(*) AS BIGINT) AS nk,
             CAST(sum(CAST(a.x - b.x AS HUGEINT) * (a.x - b.x))
                  AS HUGEINT) AS ssk
      FROM dense a
      CROSS JOIN ks
      JOIN dense b
        ON b.event_type = a.event_type AND b.i = a.i - ks.k
      GROUP BY 1, 2
    )
    SELECT d1.event_type, CAST(d1.k AS BIGINT) AS k,
           d1.n1, CAST(d1.ss1 AS VARCHAR) AS ss1,
           dk.nk, CAST(dk.ssk AS VARCHAR) AS ssk,
           CAST(CAST(d1.n1 * dk.ssk AS VARCHAR) AS DOUBLE)
             / CAST(CAST(d1.k * dk.nk * d1.ss1 AS VARCHAR) AS DOUBLE)
             AS variance_ratio
    FROM diffs d1 JOIN diffk dk
      ON dk.event_type = d1.event_type AND dk.k = d1.k
    ORDER BY d1.event_type, k
    """,
)
def timeseries_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X249 Lo-MacKinlay-style variance-ratio test (no-drift variant)
    of the daily value series per event type: VR(k) =
    (n₁·Σd_k²)/(k·n_k·Σd₁²) for k ∈ {2,5,7} — VR≈1 is a random walk
    (variance scales linearly with horizon), VR<1 mean reversion
    (spikes self-correct: alert on LEVEL), VR>1 momentum (drifts
    compound: alert on TREND); the principled router between the X99
    EWMA and the X61 CUSUM families. Exactness: diff squared-sums
    are HUGEINT/DECIMAL(38), VR one cross-multiplied division with
    the VARCHAR hop around wide-decimal→double; diffs from the
    zero-filled dense grid (X211's machinery)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x")
    )
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias(
            "day"
        ),
    )
    dense = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
    )
    wi = W.partitionBy("event_type").orderBy("day")
    dense = dense.withColumn("i", F.row_number().over(wi).cast("long"))
    ks = [2, 5, 7]
    lagged = dense.select(
        "event_type",
        "i",
        "x",
        F.lag("x", 1).over(wi).alias("x1"),
        *[F.lag("x", k).over(wi).alias(f"x{k}") for k in ks],
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rows = []
    base = lagged.select(
        "event_type",
        F.explode(
            F.array(*[F.lit(k) for k in ks])
        ).alias("k"),
        "x",
        "x1",
        *[F.col(f"x{k}") for k in ks],
    )
    kcol = F.col("k")
    xk = None
    for k in ks:
        xk = (
            F.when(kcol == k, F.col(f"x{k}"))
            if xk is None
            else xk.when(kcol == k, F.col(f"x{k}"))
        )
    agg = base.groupBy("event_type", "k").agg(
        F.sum(F.when(F.col("x1").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(
            F.when(
                F.col("x1").isNotNull(),
                d38(F.col("x") - F.col("x1")) * (F.col("x") - F.col("x1")),
            ).otherwise(F.lit(0))
        )
        .cast("decimal(38,0)")
        .alias("ss1"),
        F.sum(F.when(xk.isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("nk"),
        F.sum(
            F.when(
                xk.isNotNull(), d38(F.col("x") - xk) * (F.col("x") - xk)
            ).otherwise(F.lit(0))
        )
        .cast("decimal(38,0)")
        .alias("ssk"),
    )
    return agg.select(
        "event_type",
        F.col("k").cast("long").alias("k"),
        "n1",
        F.col("ss1").cast("string").alias("ss1"),
        "nk",
        F.col("ssk").cast("string").alias("ssk"),
        (
            (F.col("n1") * F.col("ssk")).cast("double")
            / (F.col("k") * F.col("nk") * F.col("ss1")).cast("double")
        ).alias("variance_ratio"),
    ).orderBy("event_type", "k")


@register(
    "graph_assortativity_brands",
    # Pearson over directed edge endpoints' degrees: exact HUGEINT
    # moments, r = one numerator over two sqrt's of exact integers.
    oracle="""
    WITH co AS (
      SELECT l.l_orderkey AS ok, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    ew AS (
      SELECT a.b AS u, c.b AS v, CAST(count(*) AS BIGINT) AS w
      FROM co a JOIN co c ON a.ok = c.ok AND a.b < c.b
      GROUP BY 1, 2
    ),
    wm AS (SELECT CAST(max(w) AS BIGINT) AS wmax FROM ew),
    edges AS (
      SELECT u, v FROM ew CROSS JOIN wm WHERE w * 100 >= 70 * wmax
    ),
    sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
            FROM sym GROUP BY u),
    pairs AS (
      SELECT du.d AS x, dv.d AS y
      FROM sym s JOIN deg du ON du.node = s.u
      JOIN deg dv ON dv.node = s.v
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy
      FROM pairs
    )
    SELECT n, sx, sxx, sxy,
           CASE WHEN (n * sxx - CAST(sx AS HUGEINT) * sx) > 0
                 AND (n * syy - CAST(sy AS HUGEINT) * sy) > 0
                THEN CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / (sqrt(CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx
                                       AS BIGINT) AS DOUBLE))
                        * sqrt(CAST(CAST(n * syy - CAST(sy AS HUGEINT) * sy
                                         AS BIGINT) AS DOUBLE)))
           END AS assortativity
    FROM m
    """,
)
def graph_assortativity_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X250 degree assortativity (Newman 2002) of the brand
    co-purchase graph: Pearson correlation of endpoint degrees over
    directed edges — r > 0 means hubs link to hubs (a rich-club
    merchandising core, consistent with the X237 k-core), r < 0 a
    hub-and-spoke catalog. Completes the graph-metrics family
    (triangles, k-core, AA, PageRank) with the mixing-pattern
    scalar. Exact HUGEINT moments over the bounded edge frame; r is
    one numerator over two sqrt's of exact integers (< 2^53)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    co = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    from alerta_spark.ops.dedupe import _persist

    a = co.select("ok", F.col("b").alias("u"))
    c = co.select("ok", F.col("b").alias("v"))
    # ew is brands²-sized but its lineage holds the corpus basket
    # join; FIVE downstream consumers (wm, edges, sym x2 via pairs,
    # deg) would re-run that join per consumer without the persist
    # (measured 17.3s -> ~2s at sf0.1)
    ew = _persist(
        a.join(c, "ok")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    wm = ew.agg(F.max("w").cast("long").alias("wmax"))
    # RELATIVE support cut (the X187 discipline): w >= 70% of the max
    # edge weight — scale-stable (an absolute cut saturates to a
    # complete graph as the corpus grows, and a complete graph has
    # zero degree variance -> r undefined)
    edges = (
        ew.crossJoin(F.broadcast(wm))
        .where(F.col("w") * 100 >= 70 * F.col("wmax"))
        .select("u", "v")
    )
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    pairs = (
        sym.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("x"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("y"))),
            "v",
        )
        .select("x", "y")
    )
    d38 = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(d38("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(d38("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(d38("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - d38("sx") * F.col("sy")).cast("long")
    dx = (F.col("n") * F.col("sxx") - d38("sx") * F.col("sx")).cast("long")
    dy = (F.col("n") * F.col("syy") - d38("sy") * F.col("sy")).cast("long")
    # a degenerate graph (all degrees equal, e.g. the cut saturated
    # to a complete graph at some sf) has zero variance: r undefined
    # -> NULL, never a divide-by-zero
    return m.select(
        "n",
        "sx",
        "sxx",
        "sxy",
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double")
            / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
        ).alias("assortativity"),
    )


@register(
    "users_bot_regularity_screen",
    # Gap moments exact (micros); the CV² <= 1/100 flag is the pure
    # integer inequality 100·n·(n·SS − S²) <= (n−1)·S² in HUGEINT;
    # output ranks on integers.
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(date_diff('microsecond',
                            lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id),
                            ts) AS BIGINT) AS gap
      FROM events
    ),
    g AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap) AS BIGINT) AS s,
             CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS ss
      FROM seq WHERE gap IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n, s,
           CAST(CAST(ss AS VARCHAR) AS VARCHAR) AS ss,
           CAST(CASE WHEN 100 * n * (n * ss - CAST(s AS HUGEINT) * s)
                          <= (n - 1) * CAST(s AS HUGEINT) * s
                     THEN 1 ELSE 0 END AS BIGINT) AS bot_flag
    FROM g
    WHERE n >= 20
    ORDER BY user_id
    """,
)
def users_bot_regularity_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X251 bot-regularity screen: users whose inter-event gaps are
    TOO regular — gap CV² <= 1/100 (a 10% coefficient of variation;
    cron-driven clients and replay scripts sit far below it, humans
    far above) over users with >= 20 gaps. The timing-side
    complement of the burst screen (X132: too many too fast; this:
    too evenly spaced at any rate) — a detection rule the reference's
    threshold family cannot express. Exactness: exact microsecond gap
    moments; the flag is the pure integer inequality
    100·n·(n·SS − S²) <= (n−1)·S² in DECIMAL(38) — no float CV ever
    exists. One user-keyed window + one aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap"),
    ).where(F.col("gap").isNotNull())
    g = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap").cast("long").alias("s"),
        F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    s38 = F.col("s").cast("decimal(38,0)")
    return (
        g.where(F.col("n") >= 20)
        .select(
            "user_id",
            "n",
            "s",
            F.col("ss").cast("string").alias("ss"),
            F.when(
                100 * F.col("n") * (F.col("n") * F.col("ss") - s38 * F.col("s"))
                <= (F.col("n") - 1) * s38 * F.col("s"),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("bot_flag"),
        )
        .orderBy("user_id")
    )


@register(
    "rules_threshold_sweep_volume",
    # ONE (user, day) aggregate, thresholds applied as conditional
    # sums over the cell frame — the N-threshold sweep costs one
    # corpus shuffle total, not N.
    oracle="""
    WITH cell AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ),
    th AS (SELECT unnest(generate_series(2, 8)) AS t)
    SELECT CAST(th.t AS BIGINT) AS threshold,
           CAST(sum(CASE WHEN cell.n >= th.t THEN 1 ELSE 0 END)
                AS BIGINT) AS alerts,
           CAST(count(DISTINCT CASE WHEN cell.n >= th.t
                                    THEN cell.user_id END) AS BIGINT)
             AS distinct_users
    FROM cell CROSS JOIN th
    GROUP BY th.t ORDER BY threshold
    """,
)
def rules_threshold_sweep_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X252 threshold backtest sweep: for every candidate threshold
    t ∈ [2, 8], how many (user, day) alert instances — and distinct
    paged users — the error-count rule WOULD have fired; the
    alert-volume curve an on-call lead reads before setting the
    threshold (X117 suggests a point; this shows the whole curve and
    its elbow). Cost discipline: the corpus is aggregated ONCE to
    the (user, day) cell frame; the 7 thresholds are conditional
    sums over that bounded frame — one shuffle total, not one per
    candidate threshold."""
    ev = load_table(spark, sf_dir, "events")
    cell = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    th = spark.range(2, 9).select(F.col("id").alias("t"))
    return (
        cell.crossJoin(F.broadcast(th))
        .groupBy(F.col("t").cast("long").alias("threshold"))
        .agg(
            F.sum(F.when(F.col("n") >= F.col("t"), 1).otherwise(0))
            .cast("long")
            .alias("alerts"),
            F.countDistinct(
                F.when(F.col("n") >= F.col("t"), F.col("user_id"))
            )
            .cast("long")
            .alias("distinct_users"),
        )
        .orderBy("threshold")
    )


@register(
    "stats_trimmed_winsorized_value",
    # Order statistics via one per-type rank window on quantized
    # micros; trim cut k = n//10; winsorized sum = trimmed sum +
    # k·(v_lo + v_hi). All integer until the final two divisions.
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 1000000) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(floor(value * 1000000) AS BIGINT),
                                         event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    k AS (SELECT event_type, CAST(n AS BIGINT) AS n,
                 CAST(n // 10 AS BIGINT) AS k
          FROM q GROUP BY event_type, n),
    core AS (
      SELECT q.event_type,
             CAST(sum(CASE WHEN q.rn > k.k AND q.rn <= q.n - k.k
                           THEN q.v END) AS BIGINT) AS s_trim,
             CAST(sum(CASE WHEN q.rn > k.k AND q.rn <= q.n - k.k
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_trim,
             CAST(max(CASE WHEN q.rn = k.k + 1 THEN q.v END) AS BIGINT)
               AS v_lo,
             CAST(max(CASE WHEN q.rn = q.n - k.k THEN q.v END) AS BIGINT)
               AS v_hi
      FROM q JOIN k USING (event_type) GROUP BY q.event_type
    )
    SELECT c.event_type, k.n, k.k AS k_cut, c.s_trim, c.n_trim,
           c.v_lo, c.v_hi,
           CAST(c.s_trim AS DOUBLE) / CAST(c.n_trim AS DOUBLE) / 1000000.0
             AS trimmed_mean,
           CAST(c.s_trim + k.k * (c.v_lo + c.v_hi) AS DOUBLE)
             / CAST(k.n AS DOUBLE) / 1000000.0 AS winsorized_mean
    FROM core c JOIN k USING (event_type)
    ORDER BY event_type
    """,
)
def stats_trimmed_winsorized_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X253 robust location estimates: 10%-trimmed and winsorized
    means of `value` per event type — the robust-stats family's
    answer to heavy-tailed metric columns (MAD/X73 screens outliers;
    these SUMMARIZE the center without them). Trimming drops the k =
    n//10 smallest and largest observations; winsorizing clamps them
    to the surviving extremes (trimmed_sum + k·(v_lo+v_hi)).
    Exactness: values quantized to integer micros, ONE per-type rank
    window (ties broken by event_id), exact BIGINT sums; the only
    floats are the two final divisions of exact integers. Cost: one
    partition-keyed sort window + one aggregate — at 100 TB the
    window shuffles once on event_type (add a salt-and-merge pass if
    a single type dominates; the order statistics compose via
    per-salt rank offsets)."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000).cast("long").alias("v"),
        "event_id",
    )
    w = W.partitionBy("event_type")
    q = q.select(
        "event_type",
        "v",
        F.row_number().over(w.orderBy("v", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    q = q.withColumn("k", F.expr("n div 10"))
    core = q.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("k_cut"),
        F.sum(
            F.when(
                (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k")),
                F.col("v"),
            )
        )
        .cast("long")
        .alias("s_trim"),
        F.sum(
            F.when(
                (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_trim"),
        F.max(F.when(F.col("rn") == F.col("k") + 1, F.col("v")))
        .cast("long")
        .alias("v_lo"),
        F.max(F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("v")))
        .cast("long")
        .alias("v_hi"),
    )
    return core.select(
        "event_type",
        "n",
        "k_cut",
        "s_trim",
        "n_trim",
        "v_lo",
        "v_hi",
        (
            F.col("s_trim").cast("double")
            / F.col("n_trim").cast("double")
            / F.lit(1000000.0)
        ).alias("trimmed_mean"),
        (
            (F.col("s_trim") + F.col("k_cut") * (F.col("v_lo") + F.col("v_hi")))
            .cast("double")
            / F.col("n").cast("double")
            / F.lit(1000000.0)
        ).alias("winsorized_mean"),
    ).orderBy("event_type")


@register(
    "bandit_offpolicy_ips",
    # Logged-bandit off-policy evaluation from two aggregates: the
    # even-id half fits propensities + greedy target policy, the odd
    # half is scored. Deterministic target policy => one rational
    # weight per segment; every estimate an exact HUGEINT floor-div.
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id % 4 AS seg, event_type AS act,
             CAST(floor(value * 1000000) AS BIGINT) AS r,
             event_id % 2 AS half
      FROM events
    ),
    loga AS (
      SELECT seg, act, CAST(count(*) AS BIGINT) AS n_sa,
             CAST(sum(r) AS BIGINT) AS sum_r
      FROM ev WHERE half = 0 GROUP BY seg, act
    ),
    logs AS (
      SELECT seg, CAST(sum(n_sa) AS BIGINT) AS n_s FROM loga GROUP BY seg
    ),
    mq AS (
      SELECT seg, act, n_sa,
             CAST((CAST(sum_r AS HUGEINT) * 1000000) // n_sa AS BIGINT)
               AS mean_q
      FROM loga
    ),
    greedy AS (
      SELECT seg, act AS a_star, n_sa AS n_sa_star
      FROM (SELECT seg, act, n_sa,
                   row_number() OVER (PARTITION BY seg
                                      ORDER BY mean_q DESC, act ASC) AS rn
            FROM mq)
      WHERE rn = 1
    ),
    eval_all AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n_eval
      FROM ev WHERE half = 1 GROUP BY seg
    ),
    matched AS (
      SELECT e.seg, CAST(count(*) AS BIGINT) AS n_match,
             CAST(sum(e.r) AS BIGINT) AS sum_match
      FROM ev e JOIN greedy g ON g.seg = e.seg AND g.a_star = e.act
      WHERE e.half = 1 GROUP BY e.seg
    )
    SELECT g.seg AS segment, g.a_star AS greedy_action,
           s.n_s AS n_log, a.n_eval,
           COALESCE(m.n_match, 0) AS n_match,
           g.n_sa_star AS propensity_n,
           CAST((CAST(COALESCE(m.sum_match, 0) AS HUGEINT) * s.n_s)
                // (CAST(g.n_sa_star AS HUGEINT) * a.n_eval) AS BIGINT)
             AS ips_micros,
           CAST(CASE WHEN COALESCE(m.n_match, 0) > 0
                     THEN m.sum_match // m.n_match END AS BIGINT)
             AS snips_micros
    FROM greedy g
    JOIN logs s USING (seg)
    JOIN eval_all a ON a.seg = g.seg
    LEFT JOIN matched m ON m.seg = g.seg
    ORDER BY segment
    """,
)
def bandit_offpolicy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X254 off-policy evaluation (IPS / self-normalized IPS) over
    logged bandit data: events replayed as (context = user_id%4
    segment, action = event_type, reward = value micros). The
    even-event_id half fits the logging propensities p(a|s) =
    n_sa/n_s and the greedy target policy π(s) = argmax empirical
    mean reward (quantized integer mean, action-asc tie-break); the
    odd half is evaluated: IPS = Σ r·1{a=π(s)} / (p·n_eval). The
    estimator behind X?-bandit readouts (UCB scores rank arms ON
    policy; IPS answers 'what WOULD the greedy policy have earned').
    Exactness: a deterministic target policy makes the IPS weight
    constant per segment, so each estimate is ONE HUGEINT
    cross-multiplied floor division — no per-event float weights;
    SNIPS likewise reduces to the matched-reward integer mean (noted
    in-row, the self-normalization cancels). Cost: two aggregates
    over the corpus + a broadcast of the 4-row policy table; at
    100 TB both halves aggregate map-side into (seg, act) cells."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("seg"),
        F.col("event_type").alias("act"),
        F.floor(F.col("value") * 1000000).cast("long").alias("r"),
        (F.col("event_id") % 2).alias("half"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    loga = (
        ev.where(F.col("half") == 0)
        .groupBy("seg", "act")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sa"),
            F.sum("r").cast("long").alias("sum_r"),
        )
    )
    logs = loga.groupBy("seg").agg(F.sum("n_sa").cast("long").alias("n_s"))
    mq = loga.select(
        "seg",
        "act",
        "n_sa",
        F.floor(d38(F.col("sum_r")) * 1000000 / F.col("n_sa"))
        .cast("long")
        .alias("mean_q"),
    )
    greedy = (
        mq.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("seg").orderBy(F.desc("mean_q"), F.asc("act"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("seg", F.col("act").alias("a_star"), F.col("n_sa").alias("n_sa_star"))
    )
    eval_all = (
        ev.where(F.col("half") == 1)
        .groupBy("seg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_eval"))
    )
    gg = greedy.select(
        F.col("seg").alias("g_seg"), "a_star", "n_sa_star"
    )
    matched = (
        ev.where(F.col("half") == 1)
        .join(
            F.broadcast(gg),
            (F.col("seg") == F.col("g_seg")) & (F.col("act") == F.col("a_star")),
        )
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_match"),
            F.sum("r").cast("long").alias("sum_match"),
        )
    )
    out = (
        greedy.join(logs, "seg")
        .join(eval_all, "seg")
        .join(matched, "seg", "left")
        .select(
            F.col("seg").alias("segment"),
            F.col("a_star").alias("greedy_action"),
            F.col("n_s").alias("n_log"),
            "n_eval",
            F.coalesce(F.col("n_match"), F.lit(0)).cast("long").alias("n_match"),
            F.col("n_sa_star").alias("propensity_n"),
            F.floor(
                d38(F.coalesce(F.col("sum_match"), F.lit(0)))
                * F.col("n_s")
                / (d38(F.col("n_sa_star")) * F.col("n_eval"))
            )
            .cast("long")
            .alias("ips_micros"),
            F.when(
                F.coalesce(F.col("n_match"), F.lit(0)) > 0,
                F.floor(d38(F.col("sum_match")) / F.col("n_match")),
            )
            .cast("long")
            .alias("snips_micros"),
        )
    )
    return out.orderBy("segment")


@register(
    "graph_pagerank_brands",
    # 5 damped power-iteration rounds in pure integer arithmetic
    # (ranks x1e9, per-edge share = rank // deg, damping as
    # (85·S)//100), replayed round-indexed by a recursive CTE.
    oracle="""
    WITH RECURSIVE co AS (
      SELECT l.l_orderkey AS ok, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT a.b AS u, c.b AS v
      FROM co a JOIN co c ON a.ok = c.ok AND a.b < c.b
      GROUP BY 1, 2 HAVING count(*) >= 3
    ),
    sym AS (
      SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
    ),
    deg AS (
      SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u
    ),
    pr AS (
      SELECT 0 AS r, node, CAST(1000000000 AS BIGINT) AS rk FROM deg
      UNION ALL
      SELECT p.r + 1, p.node,
             CAST(150000000 + (85 * (
               SELECT COALESCE(sum(p2.rk // d2.d), 0)
               FROM sym s
               JOIN pr p2 ON p2.node = s.v AND p2.r = p.r
               JOIN deg d2 ON d2.node = s.v
               WHERE s.u = p.node)) // 100 AS BIGINT)
      FROM pr p WHERE p.r < 5
    )
    SELECT node AS brand, rk AS rank_q,
           CAST(rk AS DOUBLE) / 1000000000.0 AS pagerank
    FROM pr WHERE r = 5
    ORDER BY rank_q DESC, brand
    """,
)
def graph_pagerank_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X255 PageRank centrality of the brand co-purchase graph (the
    influence scalar the graph family was missing: degree/X250 count
    neighbors, triangles/X171 count closure, k-core/X237 finds the
    dense community — PageRank weighs neighbors BY their own weight).
    Damping 0.85, 5 pinned power-iteration rounds on the symmetric
    >= 3-shared-orders edge cut. Exactness: ranks are integers x1e9;
    each round is rk' = 0.15·1e9 + (85·Σ_u rk(u)//deg(u))//100 —
    every operation an integer floor, so both engines replay the
    identical trajectory (the X98/X107 pinned-iteration discipline;
    no float sums exist). Distribution of labor (the X237 shape): the
    corpus builds the BOUNDED brand-pair edge list — one basket join,
    brands² max — and the 5 rounds run driver-side on that summary;
    at web-graph scale the same integer rounds run as 5 joins on a
    (node, rank) frame with localCheckpoint between rounds
    (reference: Page et al. 1999, public)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    co = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    a = co.select("ok", F.col("b").alias("u"))
    c = co.select("ok", F.col("b").alias("v"))
    edges = (
        a.join(c, "ok")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 3)
        .select("u", "v")
        .collect()
    )
    adj: dict[str, list] = {}
    for row in edges:
        adj.setdefault(row["u"], []).append(row["v"])
        adj.setdefault(row["v"], []).append(row["u"])
    deg = {n: len(vs) for n, vs in adj.items()}
    rk = {n: 1_000_000_000 for n in adj}
    for _ in range(5):
        share = {n: rk[n] // deg[n] for n in adj}
        rk = {
            n: 150_000_000 + (85 * sum(share[u] for u in adj[n])) // 100
            for n in adj
        }
    rows = sorted(((n, q) for n, q in rk.items()), key=lambda t: (-t[1], t[0]))
    out = [(n, q, q / 1e9) for n, q in rows]
    return spark.createDataFrame(
        out, "brand string, rank_q long, pagerank double"
    )


@register(
    "dedup_lsh_collision_curve",
    # The s-curve 1-(1-s^r)^b for every banding of 64 minhashes,
    # evaluated in pinned integer arithmetic: s^r and (1-p)^b as
    # chains of x1e9-scaled floor multiplications (recursive CTE /
    # F.aggregate) — both engines replay identical digits.
    oracle="""
    WITH RECURSIVE cfg(bands, rpb) AS (
      VALUES (64, 1), (32, 2), (16, 4), (8, 8), (4, 16), (2, 32), (1, 64)
    ),
    grid AS (
      SELECT bands, rpb, g.k AS k
      FROM cfg, generate_series(1, 19) AS g(k)
    ),
    ph1 AS (
      SELECT bands, rpb, k, 0 AS i, CAST(1000000000 AS BIGINT) AS p
      FROM grid
      UNION ALL
      SELECT bands, rpb, k, i + 1,
             (p * (CAST(k AS BIGINT) * 50000000)) // 1000000000
      FROM ph1 WHERE i < rpb
    ),
    p1 AS (SELECT bands, rpb, k, p FROM ph1 WHERE i = rpb),
    ph2 AS (
      SELECT bands, rpb, k, 0 AS i, CAST(1000000000 AS BIGINT) AS acc,
             1000000000 - p AS q
      FROM p1
      UNION ALL
      SELECT bands, rpb, k, i + 1, (acc * q) // 1000000000, q
      FROM ph2 WHERE i < bands
    )
    SELECT CAST(bands AS BIGINT) AS bands,
           CAST(rpb AS BIGINT) AS rows_per_band,
           CAST(k AS DOUBLE) / 20.0 AS jaccard_s,
           CAST(1000000000 - acc AS BIGINT) AS coll_q,
           CAST(1000000000 - acc AS DOUBLE) / 1000000000.0 AS p_candidate
    FROM ph2 WHERE i = bands
    ORDER BY bands DESC, k
    """,
)
def dedup_lsh_collision_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X256 LSH banding planner: the candidate-collision probability
    curve p(s) = 1 − (1 − s^r)^b for EVERY banding (b, r) of the
    64-permutation minhash budget, over the Jaccard grid s = k/20.
    This is the tuning table behind X3's (16 bands × 4 rows) choice:
    it shows the threshold where each curve crosses 1/2
    ((1/b)^(1/r)) and the false-positive mass below the target
    similarity — the parameter a platform picks BEFORE paying for a
    100 TB banding pass, from arithmetic, not a dry run. Exactness:
    both powers are chains of x1e9-scaled integer floor
    multiplications (s quantized as k·5e7), so the 133-row table is
    engine-exact to the digit — the F.aggregate fold and the
    oracle's step-indexed recursive CTE replay the same integers.
    Cost: constant — no corpus scan (the one catalog entry that
    reads nothing and saves the most)."""
    cfg = spark.createDataFrame(
        [(64, 1), (32, 2), (16, 4), (8, 8), (4, 16), (2, 32), (1, 64)],
        "bands int, rpb int",
    )
    grid = cfg.crossJoin(
        spark.range(1, 20).select(F.col("id").cast("int").alias("k"))
    )
    out = grid.select(
        F.col("bands").cast("long").alias("bands"),
        F.col("rpb").cast("long").alias("rows_per_band"),
        (F.col("k").cast("double") / F.lit(20.0)).alias("jaccard_s"),
        F.expr(
            """
            CAST(1000000000 -
              aggregate(sequence(1, bands), CAST(1000000000 AS BIGINT),
                (acc, x) -> (acc * (1000000000 -
                   aggregate(sequence(1, rpb), CAST(1000000000 AS BIGINT),
                     (p, y) -> (p * (CAST(k AS BIGINT) * 50000000))
                              div 1000000000)))
                 div 1000000000)
            AS BIGINT)
            """
        ).alias("coll_q"),
    )
    return out.select(
        "bands",
        "rows_per_band",
        "jaccard_s",
        "coll_q",
        (F.col("coll_q").cast("double") / F.lit(1000000000.0)).alias(
            "p_candidate"
        ),
    ).orderBy(F.desc("bands"), F.asc("jaccard_s"))


@register(
    "labels_confident_noise_screen",
    # Cleanlab-style confident learning on the X67 NB score matrix:
    # per-class self-confidence thresholds as integer cross-compares
    # (score·n_j >= Σscore_j — the mean never exists as a float),
    # confident argmax, (given x predicted) joint counts.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    priors AS (SELECT source AS cls, count(*) AS docs FROM documents GROUP BY source),
    ndocs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    labeled AS (
      SELECT t.doc_id, d.source AS cls, t.term
      FROM toks t JOIN documents d USING (doc_id)
    ),
    ct AS (SELECT cls, term, count(*) AS ctc FROM labeled GROUP BY cls, term),
    vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM ct),
    ctot AS (SELECT cls, CAST(sum(ctc) AS BIGINT) AS tc FROM ct GROUP BY cls),
    terms AS (SELECT DISTINCT term FROM ct),
    lik AS (
      SELECT p.cls, t.term,
             CAST(floor(ln(
               CAST(COALESCE(ct.ctc, 0) + 1 AS DOUBLE)
               / CAST(ctot.tc + (SELECT v FROM vocab) AS DOUBLE))
               * 1000000) AS BIGINT) AS lq
      FROM terms t CROSS JOIN priors p
      JOIN ctot ON ctot.cls = p.cls
      LEFT JOIN ct ON ct.cls = p.cls AND ct.term = t.term
    ),
    pq AS (
      SELECT cls, CAST(floor(ln(CAST(docs AS DOUBLE)
                 / CAST((SELECT n FROM ndocs) AS DOUBLE)) * 1000000) AS BIGINT)
               AS pqv
      FROM priors
    ),
    scored AS (
      SELECT tk.doc_id, l.cls, CAST(sum(l.lq) AS BIGINT) AS sl
      FROM toks tk JOIN lik l USING (term)
      GROUP BY tk.doc_id, l.cls
    ),
    sc AS (
      SELECT s.doc_id, s.cls, CAST(s.sl + p.pqv AS BIGINT) AS score
      FROM scored s JOIN pq p ON p.cls = s.cls
    ),
    given AS (SELECT doc_id, source AS g FROM documents),
    selfconf AS (
      SELECT sc.cls, CAST(count(*) AS BIGINT) AS n_j,
             CAST(sum(sc.score) AS BIGINT) AS sum_j
      FROM sc JOIN given ON given.doc_id = sc.doc_id AND given.g = sc.cls
      GROUP BY sc.cls
    ),
    cand AS (
      SELECT sc.doc_id, sc.cls, sc.score
      FROM sc JOIN selfconf t ON t.cls = sc.cls
      WHERE CAST(sc.score AS HUGEINT) * t.n_j >= CAST(t.sum_j AS HUGEINT)
    ),
    chosen AS (
      SELECT doc_id, cls AS pred
      FROM (SELECT doc_id, cls,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, cls ASC) AS rn
            FROM cand)
      WHERE rn = 1
    )
    SELECT g.g AS given_source, c.pred AS pred_source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(CASE WHEN g.g <> c.pred THEN 1 ELSE 0 END AS BIGINT)
             AS suspect
    FROM chosen c JOIN given g USING (doc_id)
    GROUP BY g.g, c.pred
    ORDER BY given_source, pred_source
    """,
)
def labels_confident_noise_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X257 confident-learning label-noise screen (Northcutt et al.,
    arXiv:1911.00068): estimate the (given label x true label) joint
    from the X67 Naive-Bayes score matrix — a doc counts in cell
    (i, j) when its class-j score clears class j's self-confidence
    threshold t_j (mean score of docs GIVEN label j) and j is the
    argmax among clearing classes. Off-diagonal cells are suspected
    mislabels — the rows a training pipeline routes to re-annotation
    before the corpus ships. Exactness: scores are the X67 exact
    BIGINTs; the threshold compare is the integer cross-multiply
    score·n_j >= Σ_j (the mean never exists as a float); argmax via
    (score DESC, cls ASC). Cost: the score matrix is one (doc x
    n_classes) frame (X67's plan, retrained once via
    `nb_class_scores`); thresholds are a 5-row broadcast; the matrix
    is one grouped count."""
    from alerta_spark.ops.text import nb_class_scores

    docs = load_table(spark, sf_dir, "documents")
    sc = nb_class_scores(docs, "source", "text", "doc_id")
    given = docs.select(F.col("doc_id").alias("_id"), F.col("source").alias("g"))
    selfconf = (
        sc.join(given, "_id")
        .where(F.col("g") == F.col("_cls"))
        .groupBy("_cls")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_j"),
            F.sum("_score").cast("long").alias("sum_j"),
        )
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cand = sc.join(F.broadcast(selfconf), "_cls").where(
        d38(F.col("_score")) * F.col("n_j") >= d38(F.col("sum_j"))
    )
    chosen = (
        cand.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("_id").orderBy(F.desc("_score"), F.asc("_cls"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("_id", F.col("_cls").alias("pred"))
    )
    return (
        chosen.join(given, "_id")
        .groupBy(F.col("g").alias("given_source"), F.col("pred").alias("pred_source"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            "given_source",
            "pred_source",
            "n_docs",
            F.when(F.col("given_source") != F.col("pred_source"), 1)
            .otherwise(0)
            .cast("long")
            .alias("suspect"),
        )
        .orderBy("given_source", "pred_source")
    )


@register(
    "ml_conformal_interval",
    # Split-conformal: qhat is the ceil((n+1)(1-alpha))-th smallest
    # calibration residual — an EXACT order statistic, found via the
    # distinct-residual cumsum (X186 machinery, windows partitioned by
    # event_type); k = (9(n+1)+9)//10 stays integer (no 0.9 float),
    # coverage is the single final division.
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
             substr(md5(CAST(user_id AS VARCHAR) || 'conf'), 1, 8)
               < '80000000' AS is_cal
      FROM events
    ),
    pred AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_cal,
             CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT)
               AS pred_cents
      FROM ev WHERE is_cal GROUP BY 1
    ),
    resid AS (
      SELECT e.event_type, abs(e.cents - p.pred_cents) AS r
      FROM ev e JOIN pred p USING (event_type)
      WHERE e.is_cal
    ),
    rg AS (
      SELECT event_type, r, CAST(count(*) AS BIGINT) AS c
      FROM resid GROUP BY 1, 2
    ),
    rc AS (
      SELECT event_type, r,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY r)
                  AS BIGINT) AS cum
      FROM rg
    ),
    q AS (
      SELECT rc.event_type, min(rc.r) AS qhat_cents
      FROM rc JOIN pred p ON rc.event_type = p.event_type
      WHERE rc.cum >= (9 * (p.n_cal + 1) + 9) // 10
      GROUP BY 1
    )
    SELECT e.event_type, max(p.n_cal) AS n_cal,
           max(p.pred_cents) AS pred_cents,
           max(q.qhat_cents) AS qhat_cents,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN abs(e.cents - p.pred_cents) <= q.qhat_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS covered,
           CAST(sum(CASE WHEN abs(e.cents - p.pred_cents) <= q.qhat_cents
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS coverage
    FROM ev e JOIN pred p USING (event_type) JOIN q USING (event_type)
    WHERE NOT e.is_cal
    GROUP BY 1
    ORDER BY 1
    """,
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X258 split-conformal prediction intervals (Vovk et al.; the
    distribution-free coverage guarantee every model-eval pipeline
    ships): md5-keyed calibration/test split, per-type integer-mean
    predictor, qhat = exact ceil((n+1)(1-alpha)) order statistic of
    calibration residuals at alpha=0.1, then measured coverage on the
    held-out half. Scale discipline: the order statistic comes from
    the distinct-residual cumsum partitioned by event_type (never a
    row-sized global window), k is pure integer arithmetic, and
    coverage is the one final division."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
        (
            F.substring(
                F.md5(
                    F.concat(F.col("user_id").cast("string"), F.lit("conf"))
                ),
                1,
                8,
            )
            < "80000000"
        ).alias("is_cal"),
    )
    cal = ev.where("is_cal")
    pred = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        F.expr("sum(cents) div count(*)").cast("long").alias("pred_cents"),
    )
    resid = (
        cal.join(F.broadcast(pred), "event_type")
        .select(
            "event_type",
            F.abs(F.col("cents") - F.col("pred_cents")).alias("r"),
        )
        .groupBy("event_type", "r")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wc = (
        W.partitionBy("event_type")
        .orderBy("r")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    rc = resid.select(
        "event_type", "r", F.sum("c").over(wc).cast("long").alias("cum")
    )
    q = (
        rc.join(F.broadcast(pred), "event_type")
        .where(
            # integer ceil((n+1)*0.9): cum >= (9(n+1)+9) div 10
            F.col("cum")
            >= F.expr("(9 * (n_cal + 1) + 9) div 10")
        )
        .groupBy("event_type")
        .agg(F.min("r").alias("qhat_cents"))
    )
    test = ev.where(~F.col("is_cal"))
    hit = F.when(
        F.abs(F.col("cents") - F.col("pred_cents")) <= F.col("qhat_cents"),
        1,
    ).otherwise(0)
    return (
        test.join(F.broadcast(pred), "event_type")
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.max("pred_cents").alias("pred_cents"),
            F.max("qhat_cents").alias("qhat_cents"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(hit).cast("long").alias("covered"),
            (
                F.sum(hit).cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )


@register(
    "attribution_shapley_channels",
    # Exact 3-channel Shapley: v(S) = converters whose pre-purchase
    # touch set is a subset of S (bitmask containment against an
    # 8-row literal subset table); phi x6 uses the closed-form
    # |S|!(2-|S|)! weights {2,1,1,2} so every marginal stays BIGINT;
    # the share divides once at the end by v(C) - v(empty).
    oracle="""
    WITH fp AS (
      SELECT user_id, min(ts) AS first_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    touch AS (
      SELECT f.user_id,
             CAST(max(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END)
               + 2 * max(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END)
               + 4 * max(CASE WHEN e.event_type = 'signup' THEN 1 ELSE 0 END)
               AS BIGINT) AS mask
      FROM fp f
      LEFT JOIN events e
        ON e.user_id = f.user_id AND e.ts < f.first_purchase
       AND e.event_type IN ('click', 'view', 'signup')
      GROUP BY 1
    ),
    mc AS (
      SELECT mask, CAST(count(*) AS BIGINT) AS n FROM touch GROUP BY 1
    ),
    subs AS (SELECT unnest(generate_series(0, 7)) AS s),
    v AS (
      SELECT s.s,
             CAST(COALESCE(sum(CASE WHEN (mc.mask & s.s) = mc.mask
                                    THEN mc.n END), 0) AS BIGINT) AS v
      FROM subs s LEFT JOIN mc ON (mc.mask & s.s) = mc.mask
      GROUP BY 1
    ),
    ch AS (
      SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
                            ('view', CAST(2 AS BIGINT)),
                            ('signup', CAST(4 AS BIGINT))) t(channel, m)
    ),
    phi AS (
      SELECT ch.channel,
             CAST(sum((CASE WHEN bit_count(s.s) IN (0, 2) THEN 2 ELSE 1 END)
                      * (vw.v - vo.v)) AS BIGINT) AS phi_x6
      FROM ch
      JOIN subs s ON (s.s & ch.m) = 0
      JOIN v vo ON vo.s = s.s
      JOIN v vw ON vw.s = (s.s | ch.m)
      GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT v FROM v WHERE s = 7)
             - (SELECT v FROM v WHERE s = 0) AS span
    )
    SELECT p.channel, p.phi_x6,
           CASE WHEN t.span > 0
                THEN CAST(p.phi_x6 AS DOUBLE) / (6.0 * CAST(t.span AS DOUBLE))
                ELSE 0.0 END AS share
    FROM phi p CROSS JOIN tot t
    ORDER BY p.channel
    """,
)
def attribution_shapley_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X259 Shapley-value channel attribution (the game-theoretic
    credit split beside linear X139 and time-decay X193): channels =
    {click, view, signup} touched strictly before a user's first
    purchase, coalition worth v(S) = converters whose touch set is
    contained in S. With 3 channels the Shapley weights are the
    closed-form {2,1,1,2}/6, so phi x6 is an exact BIGINT over the
    8-row v table; only the final share divides. Scale shape: one
    events scan -> converter-sized touch agg -> 8-row literal lattice
    (broadcast), everything after the user agg is constant-sized."""
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    pre = ev.where(
        F.col("event_type").isin("click", "view", "signup")
    ).select("user_id", "event_type", "ts")
    touch = (
        fp.join(
            pre,
            (fp.user_id == pre.user_id)
            & (pre.ts < fp.first_purchase),
            "left",
        )
        .groupBy(fp.user_id)
        .agg(
            (
                F.max(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                )
                + 2
                * F.max(
                    F.when(F.col("event_type") == "view", 1).otherwise(0)
                )
                + 4
                * F.max(
                    F.when(F.col("event_type") == "signup", 1).otherwise(0)
                )
            )
            .cast("long")
            .alias("mask")
        )
    )
    mc = touch.groupBy("mask").agg(F.count(F.lit(1)).cast("long").alias("n"))
    subs = spark.range(8).select(F.col("id").cast("long").alias("s"))
    v = (
        subs.join(
            F.broadcast(mc),
            F.col("mask").bitwiseAND(F.col("s")) == F.col("mask"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("v"))
    )
    ch = spark.createDataFrame(
        [("click", 1), ("view", 2), ("signup", 4)], "channel string, m long"
    )
    vo = v.select(F.col("s").alias("s_o"), F.col("v").alias("v_o"))
    vw = v.select(F.col("s").alias("s_w"), F.col("v").alias("v_w"))
    weight = F.when(F.bit_count("s_o").isin(0, 2), 2).otherwise(1)
    phi = (
        ch.join(F.broadcast(vo), F.col("s_o").bitwiseAND(F.col("m")) == 0)
        .join(
            F.broadcast(vw),
            F.col("s_w") == F.col("s_o").bitwiseOR(F.col("m")),
        )
        .groupBy("channel")
        .agg(
            F.sum(weight * (F.col("v_w") - F.col("v_o")))
            .cast("long")
            .alias("phi_x6")
        )
    )
    span = (
        v.agg(
            (
                F.sum(F.when(F.col("s") == 7, F.col("v")).otherwise(0))
                - F.sum(F.when(F.col("s") == 0, F.col("v")).otherwise(0))
            )
            .cast("long")
            .alias("span")
        )
    )
    return (
        phi.crossJoin(F.broadcast(span))
        .select(
            "channel",
            "phi_x6",
            F.when(
                F.col("span") > 0,
                F.col("phi_x6").cast("double")
                / (F.lit(6.0) * F.col("span").cast("double")),
            )
            .otherwise(F.lit(0.0))
            .alias("share"),
        )
        .orderBy("channel")
    )


@register(
    "stats_kendall_tau_daily",
    # Tau-b from exact pair counts over the day-sized frame: the
    # pairwise self-join is quadratic in CALENDAR DAYS (span-bounded,
    # corpus-size independent), nc/nd/tie counts are BIGINTs, and the
    # denominator sqrt runs once on doubles cast per factor.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      FROM d a JOIN d b ON a.day < b.day
    ),
    c AS (
      SELECT
        CAST(count(*) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN (x1 - x2) * (y1 - y2) > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS nc,
        CAST(sum(CASE WHEN (x1 - x2) * (y1 - y2) < 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS nd,
        CAST(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM p
    )
    SELECT n0, nc, nd, n1, n2,
           CAST(nc - nd AS DOUBLE)
             / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
             AS tau_b
    FROM c
    """,
)
def stats_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X260 Kendall tau-b rank correlation between the daily purchase
    and error counts — the robust ordinal complement to Pearson
    (X138) and Spearman (X198): concordant/discordant/tie pair counts
    are exact BIGINTs from a self-join that is quadratic only in
    CALENDAR DAYS (bounded by the time span, independent of corpus
    size; ~66k pairs even for a full year), and tau_b is one final
    float expression with per-factor double casts mirrored by the
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    a = d.select(
        F.col("day").alias("d1"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    b = d.select(
        F.col("day").alias("d2"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    p = a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
    sgn = (F.col("x1") - F.col("x2")) * (F.col("y1") - F.col("y2"))
    c = p.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("long").alias("nd"),
        F.sum(F.when(F.col("x1") == F.col("x2"), 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("y1") == F.col("y2"), 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    return c.select(
        "n0",
        "nc",
        "nd",
        "n1",
        "n2",
        (
            (F.col("nc") - F.col("nd")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("n1")).cast("double")
                * (F.col("n0") - F.col("n2")).cast("double")
            )
        ).alias("tau_b"),
    )


@register(
    "timeseries_xcorr_lag",
    # Lead-lag scan: 15 integer lags x day frame (span-bounded), all
    # five sums exact BIGINTs per lag, r one final float expression
    # with per-factor double casts.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS di,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(generate_series(-7, 7)) AS lag),
    j AS (
      SELECT l.lag, a.x, b.y
      FROM lags l
      JOIN d a ON true
      JOIN d b ON b.di = a.di + l.lag
    ),
    s AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM j GROUP BY 1
    )
    SELECT lag, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS r
    FROM s
    ORDER BY lag
    """,
)
def timeseries_xcorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X261 lead-lag cross-correlation: Pearson r between the daily
    purchase series and the error series shifted by each lag in
    [-7, +7] — the readout that answers "do errors lead purchases or
    trail them?" beside autocorrelation (X149) and the correlation
    matrix (X138). All five sums per lag are exact BIGINTs over the
    day frame (span-bounded: 15 lags x calendar days, corpus-size
    independent); r is one final float expression per lag."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("di")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    a = d.select(F.col("di").alias("dia"), "x")
    b = d.select(F.col("di").alias("dib"), "y")
    j = (
        lags.crossJoin(a)
        .join(F.broadcast(b), F.col("dib") == F.col("dia") + F.col("lag"))
    )
    s = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return s.select(
        "lag",
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (
                    F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
                ).cast("double")
                * (
                    F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
                ).cast("double")
            )
        ).alias("r"),
    ).orderBy("lag")


@register(
    "classifier_auc_roc",
    # Exact tie-aware ROC-AUC from the X186 doubled-midrank identity:
    # AUC = (R+ - n+(n+1)) / (2 n+ n-) with R+ the doubled positive
    # rank-sum over the distinct-cents frame; one final division.
    oracle="""
    WITH pv AS (
      SELECT CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
    ),
    g AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(pos) AS BIGINT) AS n_p
      FROM pv GROUP BY cents
    ),
    r AS (
      SELECT *,
             CAST(sum(n_all) OVER (ORDER BY cents) AS BIGINT) AS hi,
             CAST(sum(n_all) OVER (ORDER BY cents) AS BIGINT) - n_all + 1
               AS lo
      FROM g
    ),
    s AS (
      SELECT CAST(sum(n_p) AS BIGINT) AS n_pos,
             CAST(sum(n_all - n_p) AS BIGINT) AS n_neg,
             sum(CAST(n_p AS HUGEINT) * (lo + hi)) AS r_pos_2
      FROM r
    )
    SELECT n_pos, n_neg, CAST(r_pos_2 AS DOUBLE) AS rank_sum_pos_2,
           CAST(r_pos_2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
             / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
    FROM s
    """,
)
def classifier_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X262 exact tie-aware ROC-AUC of "event value predicts
    purchase" — the ranking-quality scalar beside calibration bins
    (X181), kappa (X192), and nDCG (X172). AUC equals the normalized
    Mann-Whitney U, so the X186 doubled-midrank machinery gives it
    exactly: positive rank-sum (x2, BIGINT-safe via DECIMAL(38))
    over the DISTINCT-cents frame, ties contributing their midrank
    (the trapezoid rule), one final division."""
    ev = load_table(spark, sf_dir, "events")
    pv = ev.select(
        (F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("pos"),
    )
    g = pv.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("pos").cast("long").alias("n_p"),
    )
    wc = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = g.select(
        "*",
        F.sum("n_all").over(wc).cast("long").alias("hi"),
    ).withColumn("lo", F.col("hi") - F.col("n_all") + 1)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = r.agg(
        F.sum("n_p").cast("long").alias("n_pos"),
        F.sum(F.col("n_all") - F.col("n_p")).cast("long").alias("n_neg"),
        F.sum(d38(F.col("n_p")) * (F.col("lo") + F.col("hi"))).alias(
            "r_pos_2"
        ),
    )
    return s.select(
        "n_pos",
        "n_neg",
        F.col("r_pos_2").cast("double").alias("rank_sum_pos_2"),
        (
            (F.col("r_pos_2") - d38(F.col("n_pos")) * (F.col("n_pos") + 1))
            .cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            )
        ).alias("auc"),
    )


@register(
    "sketch_kmv_set_ops",
    # Theta-style set algebra on the X222 KMV sketches: theta = the
    # 64th-smallest hash of the A-union-B sketch, intersection
    # estimate = matches-below-theta scaled by 2^60/theta; exact
    # counterparts sit beside the estimates for error accounting.
    oracle="""
    WITH ua AS (
      SELECT DISTINCT CAST(CAST('0x' || substring(
               md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS BIGINT)
               AS h
      FROM events WHERE event_type = 'click'
    ),
    ub AS (
      SELECT DISTINCT CAST(CAST('0x' || substring(
               md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS BIGINT)
               AS h
      FROM events WHERE event_type = 'purchase'
    ),
    ka AS (SELECT h FROM ua ORDER BY h LIMIT 64),
    kb AS (SELECT h FROM ub ORDER BY h LIMIT 64),
    un AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT h FROM ka UNION SELECT h FROM kb)
    ),
    theta AS (SELECT max(CASE WHEN rn = 64 THEN h END) AS th FROM un),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS matches
      FROM ka JOIN kb USING (h) CROSS JOIN theta
      WHERE ka.h < theta.th
    ),
    ex AS (
      SELECT CAST((SELECT count(*) FROM ua) AS BIGINT) AS n_a,
             CAST((SELECT count(*) FROM ub) AS BIGINT) AS n_b,
             CAST((SELECT count(*) FROM ua JOIN ub USING (h))
                  AS BIGINT) AS n_inter
    )
    SELECT ex.n_a, ex.n_b, ex.n_inter, t.th AS theta, m.matches,
           CAST(m.matches AS DOUBLE) * 1152921504606846976.0
             / CAST(t.th AS DOUBLE) AS est_intersection,
           CAST(m.matches AS DOUBLE) / 64.0 AS est_jaccard
    FROM ex CROSS JOIN theta t CROSS JOIN m
    """,
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X263 KMV/theta-sketch set operations: the intersection and
    Jaccard estimates that the mergeable-sketch family (Bloom X82,
    HLL X89, KMV X222, CMS, histogram X100) was missing. Sketch A =
    64 smallest distinct user-hashes among clickers, B = purchasers;
    theta = 64th-smallest of the merged sketch, est_inter =
    matches-below-theta x 2^60/theta (the Apache DataSketches theta
    estimator, public), est_jaccard = matches/64. Exact counterparts
    computed beside (eval-report discipline of X120). Everything is
    integer order statistics on 60-bit md5 prefixes — engine-exact;
    the per-set top-64 is a distributed orderBy+limit, never a
    global window."""
    ev = load_table(spark, sf_dir, "events")

    def hashes(et: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == et)
            .select(
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                    16,
                    10,
                )
                .cast("long")
                .alias("h")
            )
            .distinct()
        )

    ua, ub = hashes("click"), hashes("purchase")
    ka = ua.orderBy("h").limit(64)
    kb = ub.orderBy("h").limit(64)
    un = (
        ka.union(kb)
        .distinct()
        .select(
            "h",
            F.row_number()
            .over(W.partitionBy(F.pmod(F.col("h"), F.lit(1))).orderBy("h"))
            .alias("rn"),
        )
    )
    theta = un.agg(
        F.max(F.when(F.col("rn") == 64, F.col("h"))).alias("th")
    )
    m = (
        ka.join(kb, "h")
        .crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("th"))
        .agg(F.count(F.lit(1)).cast("long").alias("matches"))
    )
    ex = (
        ua.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
        .crossJoin(ub.agg(F.count(F.lit(1)).cast("long").alias("n_b")))
        .crossJoin(
            ua.join(ub, "h")
            .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
        )
    )
    return (
        ex.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(m))
        .select(
            "n_a",
            "n_b",
            "n_inter",
            F.col("th").alias("theta"),
            "matches",
            (
                F.col("matches").cast("double")
                * F.lit(1152921504606846976.0)
                / F.col("th").cast("double")
            ).alias("est_intersection"),
            (F.col("matches").cast("double") / F.lit(64.0)).alias(
                "est_jaccard"
            ),
        )
    )


def _hw_oracle() -> str:
    """Holt-Winters additive-weekly recursion as a recursive CTE —
    the X211 replay discipline with 7 seasonal lanes carried as
    columns (no list mutation needed on either engine)."""
    x7a = "+".join(f"max(CASE WHEN rn = {i} THEN x END)" for i in range(1, 8))
    x7b = "+".join(
        f"max(CASE WHEN rn = {i} THEN x END)" for i in range(8, 15)
    )
    l0 = f"(({x7a}) // 7)"
    b0 = f"((({x7b}) // 7 - {l0}) // 7)"
    s_init = ", ".join(
        f"CAST(max(CASE WHEN rn = {i + 1} THEN x END) - {l0} AS BIGINT)"
        f" AS s{i}"
        for i in range(7)
    )
    si = (
        "(CASE CAST((s.t - 1) % 7 AS INT) "
        + " ".join(f"WHEN {j} THEN s.s{j}" for j in range(7))
        + " END)"
    )
    ln = f"((2 * (d.x - {si}) + 8 * (s.l + s.b)) // 10)"
    bn = f"(({ln} - s.l + 9 * s.b) // 10)"
    sn = f"(((d.x - {ln}) + 9 * {si}) // 10)"
    s_step = ", ".join(
        f"CAST(CASE WHEN (s.t - 1) % 7 = {j} THEN {sn} ELSE s.s{j} END"
        f" AS BIGINT) AS s{j}"
        for j in range(7)
    )
    fc = ", ".join(
        "CAST(s.l + {m} * s.b + (CASE CAST((s.t - 2 + {m}) % 7 AS INT) "
        .format(m=m)
        + " ".join(f"WHEN {j} THEN s.s{j}" for j in range(7))
        + f" END) AS BIGINT) AS f{m}"
        for m in range(1, 8)
    )
    fsum = " + ".join(
        "(s.l + {m} * s.b + (CASE CAST((s.t - 2 + {m}) % 7 AS INT) "
        .format(m=m)
        + " ".join(f"WHEN {j} THEN s.s{j}" for j in range(7))
        + " END))"
        for m in range(1, 8)
    )
    return f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT) AS xc
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT event_type, min(day) AS d0, max(day) AS d1,
             CAST(max(day) - min(day) + 1 AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ),
    grid AS (
      SELECT event_type, n_days,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day, d0
      FROM span
    ),
    dense AS (
      SELECT g.event_type, g.day - g.d0 + 1 AS rn,
             CAST(COALESCE(d.xc, 0) AS BIGINT) AS x, g.n_days
      FROM grid g LEFT JOIN daily d
        ON d.event_type = g.event_type AND d.day = g.day
    ),
    init AS (
      SELECT event_type, max(n_days) AS n_days,
             CAST({l0} AS BIGINT) AS l0, CAST({b0} AS BIGINT) AS b0,
             {s_init}
      FROM dense WHERE rn <= 14
      GROUP BY event_type
      HAVING max(n_days) >= 14
    ),
    step AS (
      SELECT event_type, n_days, CAST(8 AS BIGINT) AS t,
             l0 AS l, b0 AS b, s0, s1, s2, s3, s4, s5, s6
      FROM init
      UNION ALL
      SELECT s.event_type, s.n_days, s.t + 1,
             CAST({ln} AS BIGINT), CAST({bn} AS BIGINT),
             {s_step}
      FROM step s
      JOIN dense d ON d.event_type = s.event_type AND d.rn = s.t
      WHERE s.t <= s.n_days
    )
    SELECT s.event_type, s.n_days, s.l AS level_cents, s.b AS trend_cents,
           {fc},
           CAST(({fsum}) AS DOUBLE) / 100.0 AS forecast_week_usd
    FROM step s
    WHERE s.t = s.n_days + 1
    ORDER BY s.event_type
    """


@register("forecast_holt_winters_weekly", oracle=_hw_oracle())
def forecast_holt_winters_weekly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X264 Holt-Winters additive forecast with weekly seasonality
    (triple exponential smoothing, public algorithm) per event type —
    the seasonal upgrade of Holt X211. Pinned-integer discipline:
    alpha=0.2 / beta=gamma=0.1 as x10 trunc divisions (identical on
    both engines), state = (level, trend, 7 seasonal lanes) carried
    as named_struct fields through a SQL `aggregate` fold over the
    zero-filled dense day array; the oracle replays the recursion
    with a recursive CTE carrying the same 10 columns. Init: level =
    week-1 mean, trend = (week-2 mean − week-1 mean)/7, seasonals =
    week-1 residuals. State is span-bounded (days, not rows). The
    7-day-ahead forecasts are exact BIGINT cents; ONE final division
    to currency."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x_cents")
    )
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias(
            "day"
        ),
    )
    dense = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("x_cents", F.lit(0)).cast("long").alias("x"),
    )
    series = dense.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s["x"],
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    x7a = "+".join(f"element_at(xs, {i})" for i in range(1, 8))
    x7b = "+".join(f"element_at(xs, {i})" for i in range(8, 15))
    l0 = f"(({x7a}) div 7)"
    b0 = f"((({x7b}) div 7 - {l0}) div 7)"
    s_init = ", ".join(
        f"'s{i}', CAST(element_at(xs, {i + 1}) - {l0} AS BIGINT)"
        for i in range(7)
    )
    si = (
        "(CASE CAST((acc.t - 1) % 7 AS INT) "
        + " ".join(f"WHEN {j} THEN acc.s{j}" for j in range(7))
        + " END)"
    )
    ln = f"((2 * (x - {si}) + 8 * (acc.l + acc.b)) div 10)"
    bn = f"(({ln} - acc.l + 9 * acc.b) div 10)"
    sn = f"(((x - {ln}) + 9 * {si}) div 10)"
    s_step = ", ".join(
        f"'s{j}', CAST(CASE WHEN (acc.t - 1) % 7 = {j} THEN {sn}"
        f" ELSE acc.s{j} END AS BIGINT)"
        for j in range(7)
    )
    hw = F.expr(
        f"""
        aggregate(
          slice(xs, 8, CAST(n_days - 7 AS INT)),
          named_struct(
            'l', CAST({l0} AS BIGINT), 'b', CAST({b0} AS BIGINT),
            't', CAST(8 AS BIGINT), {s_init}),
          (acc, x) -> named_struct(
            'l', CAST({ln} AS BIGINT), 'b', CAST({bn} AS BIGINT),
            't', acc.t + 1, {s_step}))
        """
    )
    out = series.where(F.col("n_days") >= 14).select(
        "event_type", "n_days", hw.alias("_h")
    )
    fexprs = []
    for m in range(1, 8):
        sidx = (
            f"(CASE CAST((_h.t - 2 + {m}) % 7 AS INT) "
            + " ".join(f"WHEN {j} THEN _h.s{j}" for j in range(7))
            + " END)"
        )
        fexprs.append(
            F.expr(f"CAST(_h.l + {m} * _h.b + {sidx} AS BIGINT)").alias(
                f"f{m}"
            )
        )
    fsum = " + ".join(
        f"(_h.l + {m} * _h.b + (CASE CAST((_h.t - 2 + {m}) % 7 AS INT) "
        + " ".join(f"WHEN {j} THEN _h.s{j}" for j in range(7))
        + " END))"
        for m in range(1, 8)
    )
    return out.select(
        "event_type",
        "n_days",
        F.col("_h.l").alias("level_cents"),
        F.col("_h.b").alias("trend_cents"),
        *fexprs,
        F.expr(f"CAST(({fsum}) AS DOUBLE) / 100.0").alias(
            "forecast_week_usd"
        ),
    ).orderBy("event_type")


@register(
    "users_value_theil",
    # Theil T with the corpus quantized-ln discipline: qln(x) =
    # floor(ln(x)·1e9) BIGINT per distinct cents value, numerator
    # Σ x·(qln(x) − qln(Sx) + qln(n)) accumulated in DECIMAL(38);
    # the index is one final double division by (1e9·Sx).
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT x, CAST(count(*) AS BIGINT) AS t FROM u WHERE x > 0
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(CAST(x AS HUGEINT) * t) AS HUGEINT) AS sx,
             CAST(sum(t) AS BIGINT) AS n
      FROM g
    ),
    q AS (
      SELECT g.x, g.t,
             CAST(floor(ln(CAST(g.x AS DOUBLE)) * 1000000000.0)
                  AS BIGINT) AS qx
      FROM g
    )
    SELECT t.n AS n_users, CAST(t.sx AS BIGINT) AS total_cents,
           CAST(sum(CAST(q.x AS HUGEINT) * q.t
                    * (q.qx
                       - CAST(floor(ln(CAST(t.sx AS DOUBLE))
                                    * 1000000000.0) AS BIGINT)
                       + CAST(floor(ln(CAST(t.n AS DOUBLE))
                                    * 1000000000.0) AS BIGINT)))
                AS VARCHAR) AS theil_num_q,
           CAST(CAST(sum(CAST(q.x AS HUGEINT) * q.t
                    * (q.qx
                       - CAST(floor(ln(CAST(t.sx AS DOUBLE))
                                    * 1000000000.0) AS BIGINT)
                       + CAST(floor(ln(CAST(t.n AS DOUBLE))
                                    * 1000000000.0) AS BIGINT)))
                AS VARCHAR) AS DOUBLE)
             / (1000000000.0 * CAST(CAST(t.sx AS VARCHAR) AS DOUBLE))
             AS theil
    FROM q CROSS JOIN tot t
    GROUP BY t.n, t.sx
    """,
)
def users_value_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X265 Theil-T inequality index of per-user value — the
    entropy-based member of the concentration family (Gini X165,
    Pareto X106, HHI X157): T = (1/Sx)·Σ x·(ln x − ln μ),
    decomposable across subgroups where Gini is not. Cross-engine
    exactness via the corpus quantized-ln discipline (X35 family):
    every ln is floor(ln·1e9) BIGINT on identical integer inputs,
    the numerator dot product accumulates in DECIMAL(38) (routed
    through VARCHAR on the DuckDB side — HUGEINT→DOUBLE rounds
    differently), and the index divides once at the end."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x")
    )
    g = (
        u.where(F.col("x") > 0)
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = g.agg(
        F.sum(d38(F.col("x")) * F.col("t")).alias("sx"),
        F.sum("t").cast("long").alias("n"),
    )
    Q = 1_000_000_000.0
    qln = lambda c: F.floor(  # noqa: E731
        F.log(c.cast("double")) * F.lit(Q)
    ).cast("long")
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "x",
            "t",
            "sx",
            "n",
            (
                d38(F.col("x")) * F.col("t")
                * (
                    qln(F.col("x"))
                    - qln(F.col("sx"))
                    + qln(F.col("n"))
                )
            ).alias("term"),
        )
        .groupBy("n", "sx")
        .agg(F.sum("term").alias("num"))
        .select(
            F.col("n").alias("n_users"),
            F.col("sx").cast("long").alias("total_cents"),
            F.col("num").cast("decimal(38,0)").cast("string").alias(
                "theil_num_q"
            ),
            (
                F.col("num").cast("double")
                / (F.lit(Q) * F.col("sx").cast("double"))
            ).alias("theil"),
        )
    )


@register(
    "quality_freshness_sla",
    # Data-ops freshness audit: per-table max business date and
    # days-behind the freshest table (anchor), pure date/count
    # arithmetic — the operational readout beside the FK-integrity
    # audit and the expectations report.
    oracle="""
    WITH per AS (
      SELECT 'events' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
             max(CAST(ts AS DATE)) AS max_date
      FROM events
      UNION ALL
      SELECT 'orders', CAST(count(*) AS BIGINT),
             max(CAST(o_orderdate AS DATE))
      FROM orders
      UNION ALL
      SELECT 'lineitem', CAST(count(*) AS BIGINT),
             max(CAST(l_shipdate AS DATE))
      FROM lineitem
    ),
    anchor AS (SELECT max(max_date) AS a FROM per)
    SELECT p.tbl, p.n_rows,
           CAST(p.max_date AS VARCHAR) AS max_date,
           CAST(a.a - p.max_date AS BIGINT) AS days_behind,
           a.a - p.max_date <= 7 AS within_sla_7d
    FROM per p CROSS JOIN anchor a
    ORDER BY p.tbl
    """,
)
def quality_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X266 cross-table freshness SLA audit — the data-ops readout
    beside the FK-integrity audit (X119) and the expectations report
    (X168): per table, row count, max business date, and days-behind
    the freshest table (the deterministic anchor — never wall-clock
    now(), which would be unhashable). Three map-side scans of one
    date/count column each, a 3-row union, one broadcast anchor."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per = (
        ev.agg(
            F.lit("events").alias("tbl"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.max(F.col("ts").cast("date")).alias("max_date"),
        )
        .unionByName(
            o.agg(
                F.lit("orders").alias("tbl"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.max(F.col("o_orderdate").cast("date")).alias("max_date"),
            )
        )
        .unionByName(
            li.agg(
                F.lit("lineitem").alias("tbl"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.max(F.col("l_shipdate").cast("date")).alias("max_date"),
            )
        )
    )
    anchor = per.agg(F.max("max_date").alias("a"))
    return (
        per.crossJoin(F.broadcast(anchor))
        .select(
            "tbl",
            "n_rows",
            F.col("max_date").cast("string").alias("max_date"),
            F.datediff(F.col("a"), F.col("max_date"))
            .cast("long")
            .alias("days_behind"),
            (F.datediff(F.col("a"), F.col("max_date")) <= 7).alias(
                "within_sla_7d"
            ),
        )
        .orderBy("tbl")
    )


@register(
    "stats_poisson_rate_test",
    # Two-sample Poisson rate z: error counts in the first vs second
    # half of the span (integer midpoint split), exposures in whole
    # days, z one final float expression on integer operands.
    oracle="""
    WITH span AS (
      SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      FROM events
    ),
    halves AS (
      SELECT d0, d1,
             d0 + CAST((d1 - d0) / 2 AS INTEGER) AS mid,
             CAST(CAST((d1 - d0) / 2 AS INTEGER) + 1 AS BIGINT) AS t1,
             CAST(d1 - (d0 + CAST((d1 - d0) / 2 AS INTEGER)) AS BIGINT)
               AS t2
      FROM span
    ),
    c AS (
      SELECT
        CAST(sum(CASE WHEN CAST(e.ts AS DATE) <= h.mid
                      THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        CAST(sum(CASE WHEN CAST(e.ts AS DATE) > h.mid
                      THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        max(h.t1) AS t1, max(h.t2) AS t2
      FROM events e CROSS JOIN halves h
      WHERE e.event_type = 'error'
    )
    SELECT c1, c2, t1, t2,
           CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS rate1,
           CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE) AS rate2,
           (CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE)
            - CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE))
           / sqrt(CAST(c1 AS DOUBLE) / (CAST(t1 AS DOUBLE)
                                        * CAST(t1 AS DOUBLE))
                  + CAST(c2 AS DOUBLE) / (CAST(t2 AS DOUBLE)
                                          * CAST(t2 AS DOUBLE))) AS z
    FROM c
    """,
)
def stats_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X267 two-sample Poisson rate test on the error stream — "did
    the error RATE change between the first and second half of the
    window?", the count-process complement to the proportion z-test
    (X65) and the SPC chart (X160). The span splits at the integer
    midpoint day, exposures are whole days, counts exact BIGINTs;
    the Wald z on the rate difference is one final float expression
    on integer operands (identical IEEE tree both engines)."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        F.col("ts").cast("date").alias("day")
    )
    span = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    halves = span.select(
        "d0",
        "d1",
        F.date_add(
            F.col("d0"),
            (F.datediff(F.col("d1"), F.col("d0")) / 2).cast("int"),
        ).alias("mid"),
    ).select(
        (F.datediff(F.col("mid"), F.col("d0")) + 1)
        .cast("long")
        .alias("t1"),
        F.datediff(F.col("d1"), F.col("mid")).cast("long").alias("t2"),
        "mid",
    )
    c = err.crossJoin(F.broadcast(halves)).agg(
        F.sum(F.when(F.col("day") <= F.col("mid"), 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("day") > F.col("mid"), 1).otherwise(0))
        .cast("long")
        .alias("c2"),
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
    )
    dd = lambda c_: c_.cast("double")  # noqa: E731
    return c.select(
        "c1",
        "c2",
        "t1",
        "t2",
        (dd(F.col("c1")) / dd(F.col("t1"))).alias("rate1"),
        (dd(F.col("c2")) / dd(F.col("t2"))).alias("rate2"),
        (
            (dd(F.col("c1")) / dd(F.col("t1")) - dd(F.col("c2")) / dd(F.col("t2")))
            / F.sqrt(
                dd(F.col("c1")) / (dd(F.col("t1")) * dd(F.col("t1")))
                + dd(F.col("c2")) / (dd(F.col("t2")) * dd(F.col("t2")))
            )
        ).alias("z"),
    )


@register(
    "stats_runs_test_daily",
    # Wald-Wolfowitz runs test on the daily up/down value sequence:
    # runs counted by lag comparison over the day frame (partitioned
    # window per sign series is span-bounded), n1/n2/runs exact
    # BIGINTs, the normal z one final float expression.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * 100) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT day, x,
             CASE WHEN x - lag(x) OVER (ORDER BY day) > 0 THEN 1
                  WHEN x - lag(x) OVER (ORDER BY day) < 0 THEN 0
             END AS up
      FROM d
    ),
    f AS (SELECT day, up FROM s WHERE up IS NOT NULL),
    r AS (
      SELECT up,
             CASE WHEN up = lag(up) OVER (ORDER BY day) THEN 0 ELSE 1 END
               AS is_new
      FROM f
    ),
    c AS (
      SELECT CAST(sum(CASE WHEN up = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN up = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(COALESCE(is_new, 1)) AS BIGINT) AS runs
      FROM r
    )
    SELECT n1, n2, runs,
           1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             / CAST(n1 + n2 AS DOUBLE) AS mu_runs,
           (CAST(runs AS DOUBLE)
            - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / CAST(n1 + n2 AS DOUBLE)))
           / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     - CAST(n1 + n2 AS DOUBLE))
                  / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                     * CAST(n1 + n2 - 1 AS DOUBLE))) AS z
    FROM c
    """,
)
def stats_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X268 Wald-Wolfowitz runs test on the daily-revenue up/down
    sequence — "is the day-over-day direction random or streaky?",
    the randomness screen beside the variance-ratio test (X243) and
    autocorrelation (X149). Flat days drop (classic two-category
    form); n1/n2/runs are exact BIGINTs from lag comparisons over the
    span-bounded day frame; the normal approximation z is one final
    float expression."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("x")
    )
    one = F.pmod(F.dayofmonth("day"), F.lit(1))
    wd = W.partitionBy(one).orderBy("day")
    s = d.select(
        "day",
        F.when(F.col("x") - F.lag("x").over(wd) > 0, 1)
        .when(F.col("x") - F.lag("x").over(wd) < 0, 0)
        .alias("up"),
    ).where(F.col("up").isNotNull())
    r = s.select(
        "up",
        F.when(F.col("up") == F.lag("up").over(wd), 0)
        .otherwise(1)
        .alias("is_new"),
    )
    c = r.agg(
        F.sum(F.when(F.col("up") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("up") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.coalesce(F.col("is_new"), F.lit(1)))
        .cast("long")
        .alias("runs"),
    )
    dd = lambda c_: c_.cast("double")  # noqa: E731
    n1, n2, runs = F.col("n1"), F.col("n2"), F.col("runs")
    mu = F.lit(1.0) + F.lit(2.0) * dd(n1) * dd(n2) / dd(n1 + n2)
    var = (
        F.lit(2.0)
        * dd(n1)
        * dd(n2)
        * (F.lit(2.0) * dd(n1) * dd(n2) - dd(n1 + n2))
        / (dd(n1 + n2) * dd(n1 + n2) * dd(n1 + n2 - 1))
    )
    return c.select(
        "n1",
        "n2",
        "runs",
        mu.alias("mu_runs"),
        ((dd(runs) - mu) / F.sqrt(var)).alias("z"),
    )


@register(
    "stats_cramers_v",
    # Effect size for the X151 chi2: V = sqrt(chi2 / (N*(k-1))) —
    # the quantized chi2_q divides by integer operands inside one
    # final sqrt; category counts from the same contingency frame.
    oracle="""
    WITH c AS (
      SELECT event_type,
             CASE WHEN EXTRACT(hour FROM ts) < 6 THEN 'night'
                  WHEN EXTRACT(hour FROM ts) < 12 THEN 'morning'
                  WHEN EXTRACT(hour FROM ts) < 18 THEN 'afternoon'
                  ELSE 'evening' END AS daypart,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
    k AS (SELECT daypart, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
    t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c),
    terms AS (
      SELECT CAST(floor(
               CAST((c.o * t.n - r.rt * k.ct)
                    * (c.o * t.n - r.rt * k.ct) AS DOUBLE)
               / CAST(r.rt * k.ct AS DOUBLE) / CAST(t.n AS DOUBLE)
               * 1048576.0) AS BIGINT) AS tq
      FROM c JOIN r USING (event_type) JOIN k USING (daypart), t
    ),
    dims AS (
      SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n_rows_cat,
             CAST((SELECT count(*) FROM k) AS BIGINT) AS n_cols_cat,
             (SELECT n FROM t) AS n
    )
    SELECT d.n_rows_cat, d.n_cols_cat, d.n,
           CAST(sum(tq) AS BIGINT) AS chi2_q,
           sqrt(CAST(sum(tq) AS DOUBLE) / 1048576.0
                / (CAST(d.n AS DOUBLE)
                   * CAST(CASE WHEN d.n_rows_cat < d.n_cols_cat
                               THEN d.n_rows_cat ELSE d.n_cols_cat END - 1
                          AS DOUBLE))) AS cramers_v
    FROM terms CROSS JOIN dims d
    GROUP BY d.n_rows_cat, d.n_cols_cat, d.n
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X269 Cramer's V association strength for the (event type x
    daypart) contingency — the bounded [0,1] effect size the raw X151
    chi2 lacks (chi2 grows with N; V answers "how strong", not "how
    significant"). Reuses the X151 quantized-term discipline: cell
    terms integer-numerator and BIGINT-quantized before the sum, V =
    one final sqrt over integer-derived operands."""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.select(
            "event_type",
            F.when(F.hour("ts") < 6, "night")
            .when(F.hour("ts") < 12, "morning")
            .when(F.hour("ts") < 18, "afternoon")
            .otherwise("evening")
            .alias("daypart"),
        )
        .groupBy("event_type", "daypart")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    r = c.groupBy("event_type").agg(F.sum("o").cast("long").alias("rt"))
    k = c.groupBy("daypart").agg(F.sum("o").cast("long").alias("ct"))
    t = c.agg(F.sum("o").cast("long").alias("n"))
    num = F.col("o") * F.col("n") - F.col("rt") * F.col("ct")
    tq = F.floor(
        (num * num).cast("double")
        / (F.col("rt") * F.col("ct")).cast("double")
        / F.col("n").cast("double")
        * F.lit(1048576.0)
    ).cast("long")
    terms = (
        c.join(F.broadcast(r), "event_type")
        .join(F.broadcast(k), "daypart")
        .crossJoin(F.broadcast(t))
        .select(tq.alias("tq"), "n")
    )
    dims = (
        r.agg(F.count(F.lit(1)).cast("long").alias("n_rows_cat"))
        .crossJoin(k.agg(F.count(F.lit(1)).cast("long").alias("n_cols_cat")))
    )
    mind = F.least(F.col("n_rows_cat"), F.col("n_cols_cat"))
    return (
        terms.groupBy("n")
        .agg(F.sum("tq").cast("long").alias("chi2_q"))
        .crossJoin(F.broadcast(dims))
        .select(
            "n_rows_cat",
            "n_cols_cat",
            "n",
            "chi2_q",
            F.sqrt(
                F.col("chi2_q").cast("double")
                / F.lit(1048576.0)
                / (
                    F.col("n").cast("double")
                    * (mind - 1).cast("double")
                )
            ).alias("cramers_v"),
        )
    )


@register(
    "text_burrows_delta",
    # Stylometric Delta over the top-30 corpus terms: relative
    # frequencies quantized to BIGINT ((c*1e9) div N_s), z-scores as
    # the integer-rational (n*qf - S)/sqrt(n*Q - S^2) quantized again
    # (floor(z*1e6)) so the pairwise L1 sums are exact; zero-variance
    # terms drop by an integer predicate; one final division.
    oracle="""
    WITH toks AS (
      SELECT source, unnest(list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               t -> t <> '')) AS term
      FROM documents
    ),
    top AS (
      SELECT term FROM toks GROUP BY term
      ORDER BY count(*) DESC, term LIMIT 30
    ),
    ns AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM toks GROUP BY 1
    ),
    cst AS (
      SELECT t.source, t.term, CAST(count(*) AS BIGINT) AS c
      FROM toks t JOIN top USING (term) GROUP BY 1, 2
    ),
    dense AS (
      SELECT ns.source, top.term,
             (COALESCE(c.c, 0) * 1000000000) // ns.n_s AS qf
      FROM ns CROSS JOIN top
      LEFT JOIN cst c ON c.source = ns.source AND c.term = top.term
    ),
    stats AS (
      SELECT term, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(qf) AS BIGINT) AS s,
             CAST(sum(CAST(qf AS HUGEINT) * qf) AS HUGEINT) AS q
      FROM dense GROUP BY 1
    ),
    z AS (
      SELECT d.source, d.term,
             CAST(floor(
               CAST(st.n * d.qf - st.s AS DOUBLE)
               / sqrt(CAST(CAST(st.n * st.q - CAST(st.s AS HUGEINT) * st.s
                                AS VARCHAR) AS DOUBLE))
               * 1000000.0) AS BIGINT) AS qz
      FROM dense d JOIN stats st USING (term)
      WHERE st.n * st.q - CAST(st.s AS HUGEINT) * st.s > 0
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum(abs(a.qz - b.qz)) AS BIGINT) AS l1_q
      FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_terms, l1_q,
           CAST(l1_q AS DOUBLE) / (CAST(n_terms AS DOUBLE) * 1000000.0)
             AS delta
    FROM pairs
    ORDER BY src_a, src_b
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X270 Burrows' Delta stylometric distance between sources
    (Burrows 2002; the authorship/provenance fingerprint beside the
    shingle overlap matrix X220): mean |z_a - z_b| over the top-30
    corpus terms' relative frequencies. Exactness: frequencies are
    BIGINT fixed-point ((c*1e9) div N_s), each z is the
    integer-rational (n*qf - S)/sqrt(n*Q - S**2) computed on identical
    integer operands then floor-quantized (*1e6), so the pairwise L1
    aggregation is exact; zero-variance terms drop by an integer
    predicate; ONE final division. Scale shape: tokens scan -> term
    top-30 (TakeOrdered) -> source x 30 dense frame (source-bounded),
    pair join bounded by sources squared."""
    from alerta_spark.ops.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.filter(tokenize(F.col("text")), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(30)
        .select("term")
    )
    ns = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    cst = (
        toks.join(F.broadcast(top), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    dense = (
        ns.crossJoin(F.broadcast(top))
        .join(cst, ["source", "term"], "left")
        .select(
            "source",
            "term",
            F.expr("(COALESCE(c, 0) * 1000000000) div n_s").alias("qf"),
        )
    )
    d38 = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    stats = dense.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qf").cast("long").alias("s"),
        F.sum(d38(F.col("qf")) * F.col("qf")).alias("q"),
    )
    var_num = d38(F.col("n")) * F.col("q") - d38(F.col("s")) * F.col("s")
    z = (
        dense.join(F.broadcast(stats), "term")
        .where(var_num > 0)
        .select(
            "source",
            "term",
            F.floor(
                (F.col("n") * F.col("qf") - F.col("s")).cast("double")
                / F.sqrt(var_num.cast("double"))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("qz"),
        )
    )
    a = z.select(
        F.col("source").alias("src_a"), "term", F.col("qz").alias("qz_a")
    )
    b = z.select(
        F.col("source").alias("src_b"), "term", F.col("qz").alias("qz_b")
    )
    pairs = (
        a.join(b, "term")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.abs(F.col("qz_a") - F.col("qz_b")))
            .cast("long")
            .alias("l1_q"),
        )
    )
    return pairs.select(
        "src_a",
        "src_b",
        "n_terms",
        "l1_q",
        (
            F.col("l1_q").cast("double")
            / (F.col("n_terms").cast("double") * F.lit(1000000.0))
        ).alias("delta"),
    ).orderBy("src_a", "src_b")


@register(
    "survival_logrank_abtest",
    # Log-rank test between the two deterministic experiment arms
    # (user_id parity, the X19 split discipline) on time-to-first-
    # purchase (48h censor, same life table as the X174 KM curve).
    # Risk sets at each conversion hour come from a tiny (<=49x2 grid)
    # range join; per-time expectation and variance terms are
    # HUGEINT-exact integer divisions quantized at 1e9, the z only
    # one final float expression over BIGINT operands.
    oracle="""
    WITH u AS (
      SELECT user_id,
             min(epoch_us(ts)) AS f0,
             CAST(user_id % 2 AS BIGINT) AS grp,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) END) AS p0
      FROM events GROUP BY 1, 3
    ),
    life AS (
      SELECT grp,
             CASE WHEN p0 IS NOT NULL AND (p0 - f0) // 3600000000 <= 48
                  THEN (p0 - f0) // 3600000000 ELSE 48 END AS t_h,
             (p0 IS NOT NULL AND (p0 - f0) // 3600000000 <= 48) AS ev
      FROM u
    ),
    per_gt AS (
      SELECT grp, t_h, count(*) AS c,
             CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM life GROUP BY 1, 2
    ),
    times AS (
      SELECT t_h AS t FROM per_gt GROUP BY 1 HAVING sum(d) > 0
    ),
    rg AS (
      SELECT times.t, g.grp,
             CAST(COALESCE(sum(p.c), 0) AS BIGINT) AS n_risk,
             CAST(COALESCE(sum(CASE WHEN p.t_h = times.t THEN p.d END), 0)
                  AS BIGINT) AS d_t
      FROM times CROSS JOIN (SELECT DISTINCT grp FROM per_gt) g
      LEFT JOIN per_gt p ON p.grp = g.grp AND p.t_h >= times.t
      GROUP BY 1, 2
    ),
    w AS (
      SELECT t,
             CAST(sum(CASE WHEN grp = 1 THEN n_risk ELSE 0 END) AS BIGINT)
               AS na,
             CAST(sum(CASE WHEN grp = 1 THEN d_t ELSE 0 END) AS BIGINT)
               AS da,
             CAST(sum(CASE WHEN grp = 0 THEN n_risk ELSE 0 END) AS BIGINT)
               AS nb,
             CAST(sum(CASE WHEN grp = 0 THEN d_t ELSE 0 END) AS BIGINT)
               AS db
      FROM rg GROUP BY t
    ),
    terms AS (
      SELECT da,
             CAST((CAST(da + db AS HUGEINT) * na * 1000000000)
                  // (na + nb) AS BIGINT) AS eq,
             CAST((CAST(da + db AS HUGEINT) * na * nb
                   * (na + nb - da - db) * 1000000000)
                  // (CAST(na + nb AS HUGEINT) * (na + nb)
                      * (na + nb - 1)) AS BIGINT) AS vq
      FROM w WHERE na + nb > 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_times,
           CAST(sum(da) AS BIGINT) AS o_a,
           CAST(sum(eq) AS BIGINT) AS e_a_q,
           CAST(sum(vq) AS BIGINT) AS v_q,
           (CAST(sum(da) * 1000000000 - sum(eq) AS DOUBLE) / 1000000000.0)
             / sqrt(CAST(sum(vq) AS DOUBLE) / 1000000000.0) AS z
    FROM terms
    """,
)
def survival_logrank_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X271 log-rank test: does the treatment arm convert to first
    purchase faster than control? The hypothesis test beside the X174
    KM curve — KM draws the two survival curves, log-rank says whether
    they differ, honoring right-censoring a mean-conversion-time
    comparison would bias. Arms are the deterministic user_id-parity
    split (the X19 discipline: rerun-stable, no RNG); risk sets at each conversion hour come from a broadcast range
    join over the <=49-row hour distribution, so the full-table work
    is exactly one user-level aggregate. Expectation/variance terms
    are HUGEINT-exact integer divisions quantized at 1e9; z is one
    final float expression."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("f0"),
        F.min(
            F.when(F.col("event_type") == "purchase", us)
        ).alias("p0"),
        F.pmod(F.first("user_id"), F.lit(2)).cast("long").alias("grp"),
    )
    hours = F.expr("(p0 - f0) div 3600000000")
    conv = F.col("p0").isNotNull() & (hours <= 48)
    life = u.select(
        "grp",
        F.when(conv, hours).otherwise(F.lit(48)).alias("t_h"),
        conv.alias("ev"),
    )
    per_gt = life.groupBy("grp", "t_h").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("ev"), 1).otherwise(0)).cast("long").alias("d"),
    )
    times = (
        per_gt.groupBy("t_h")
        .agg(F.sum("d").alias("dt"))
        .where(F.col("dt") > 0)
        .select(F.col("t_h").alias("t"))
    )
    grps = per_gt.select("grp").distinct()
    rg = (
        times.crossJoin(F.broadcast(grps))
        .join(
            F.broadcast(per_gt).withColumnRenamed("grp", "pgrp"),
            (F.col("pgrp") == F.col("grp")) & (F.col("t_h") >= F.col("t")),
            "left",
        )
        .groupBy("t", "grp")
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_risk"),
            F.coalesce(
                F.sum(F.when(F.col("t_h") == F.col("t"), F.col("d"))),
                F.lit(0),
            )
            .cast("long")
            .alias("d_t"),
        )
    )
    w = rg.groupBy("t").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("n_risk")).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("grp") == 1, F.col("d_t")).otherwise(0))
        .cast("long")
        .alias("da"),
        F.sum(F.when(F.col("grp") == 0, F.col("n_risk")).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(F.when(F.col("grp") == 0, F.col("d_t")).otherwise(0))
        .cast("long")
        .alias("db"),
    )
    terms = w.where(F.col("na") + F.col("nb") > 1).select(
        "da",
        F.expr(
            "CAST((CAST(da + db AS DECIMAL(38,0)) * na * 1000000000)"
            " div (na + nb) AS BIGINT)"
        ).alias("eq"),
        F.expr(
            "CAST((CAST(da + db AS DECIMAL(38,0)) * na * nb"
            " * (na + nb - da - db) * 1000000000)"
            " div (CAST(na + nb AS DECIMAL(38,0)) * (na + nb)"
            " * (na + nb - 1)) AS BIGINT)"
        ).alias("vq"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("da").cast("long").alias("o_a"),
        F.sum("eq").cast("long").alias("e_a_q"),
        F.sum("vq").cast("long").alias("v_q"),
    )
    return agg.select(
        "n_times",
        "o_a",
        "e_a_q",
        "v_q",
        (
            (F.col("o_a") * 1000000000 - F.col("e_a_q")).cast("double")
            / F.lit(1000000000.0)
            / F.sqrt(F.col("v_q").cast("double") / F.lit(1000000000.0))
        ).alias("z"),
    )


@register(
    "stats_anova_f_value_by_type",
    # One-way ANOVA F of event value across the 5 event types: exact
    # integer cents, per-group sum/sumsq in DECIMAL(38), SSB/SST as
    # 1e6-quantized integer rationals (floor of HUGEINT division), F
    # = ONE float division of cross-multiplied DECIMAL(38) products
    # (VARCHAR hop for DuckDB's wide-decimal->double cast).
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                  AS HUGEINT) AS s_g,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS HUGEINT)
                      * CAST(CAST(value AS DECIMAL(14,2)) * 100 AS HUGEINT))
                  AS HUGEINT) AS q_g
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS HUGEINT) AS s,
             CAST(sum(q_g) AS HUGEINT) AS q,
             CAST(sum((s_g * s_g * 1000000) // n_g) AS HUGEINT) AS ssb_raw
      FROM g
    ),
    f AS (
      SELECT k, n,
             ssb_raw - (s * s * 1000000) // n AS ssb_q,
             q * 1000000 - ssb_raw AS ssw_q
      FROM t
    )
    SELECT k, n,
           CAST(CAST(ssb_q AS VARCHAR) AS DOUBLE) / 1000000.0 AS ssb,
           CAST(CAST(ssw_q AS VARCHAR) AS DOUBLE) / 1000000.0 AS ssw,
           CAST(CAST(ssb_q * (n - k) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(ssw_q * (k - 1) AS VARCHAR) AS DOUBLE) AS f_stat
    FROM f
    """,
)
def stats_anova_f_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X272 one-way ANOVA F: does mean event value differ across the
    five event types? The classical mean-difference omnibus test
    beside Brown-Forsythe (X231's robust variance-based screen) and
    the pairwise Mann-Whitney (X200). Decomposition is exact: integer
    cents, per-group sum/sumsq in DECIMAL(38) (one map-side combine +
    a 5-row reduce), SSB/SST 1e6-quantized integer rationals, F = one
    float division of cross-multiplied DECIMAL(38) products. Scale:
    single hash aggregate over the corpus; everything after is a
    5-row frame."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    g = ev.select(
        "event_type", cents.alias("x")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("decimal(38,0)").alias("s_g"),
        F.sum(
            F.col("x").cast("decimal(19,0)") * F.col("x")
        ).cast("decimal(38,0)").alias("q_g"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("decimal(38,0)").alias("s"),
        F.sum("q_g").cast("decimal(38,0)").alias("q"),
        F.sum(F.expr("(s_g * s_g * 1000000) div n_g"))
        .cast("decimal(38,0)")
        .alias("ssb_raw"),
    )
    f = t.select(
        "k",
        "n",
        F.expr("ssb_raw - (s * s * 1000000) div n").alias("ssb_q"),
        F.expr("q * 1000000 - ssb_raw").alias("ssw_q"),
    )
    return f.select(
        "k",
        "n",
        (F.col("ssb_q").cast("double") / F.lit(1000000.0)).alias("ssb"),
        (F.col("ssw_q").cast("double") / F.lit(1000000.0)).alias("ssw"),
        (
            F.expr("CAST(ssb_q * (n - k) AS DOUBLE)")
            / F.expr("CAST(ssw_q * (k - 1) AS DOUBLE)")
        ).alias("f_stat"),
    )


@register(
    "stats_cochran_armitage_activity",
    # Cochran-Armitage trend test: purchase-leaning (purchase share
    # above the uniform 1/5 expectation — "ever purchased" saturates
    # on this corpus) across the four activity-rank bands, scores
    # 0..3 from a deterministic ntile over (n_events, user_id). All
    # moments exact BIGINTs; z =
    # numerator * sqrt(N) over one sqrt of a DECIMAL(38) product
    # (VARCHAR hop on the DuckDB side).
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
             CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) > count(*)
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY 1
    ),
    b AS (
      SELECT conv,
             CAST(ntile(4) OVER (ORDER BY n_ev, user_id) - 1 AS BIGINT)
               AS t
      FROM u
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS BIGINT) AS r,
             CAST(sum(t) AS BIGINT) AS sum_tn,
             CAST(sum(t * conv) AS BIGINT) AS sum_tr,
             CAST(sum(t * t) AS BIGINT) AS sum_t2n
      FROM b
    )
    SELECT n, r, sum_tn, sum_tr, sum_t2n,
           CAST(n * sum_tr - r * sum_tn AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
             / sqrt(CAST(CAST(CAST(r AS HUGEINT) * (n - r)
                    * (n * sum_t2n - sum_tn * sum_tn)
                    AS VARCHAR) AS DOUBLE)) AS z
    FROM m
    """,
)
def stats_cochran_armitage_activity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X273 Cochran-Armitage trend test: does purchase-leaning rise
    monotonically with user activity band? The dose-response screen a
    plain chi2 (X151) can't give — chi2 sees "different", CA sees
    "ordered". Outcome is purchase share above the uniform 1/5
    expectation (a scale-free binary; "ever purchased" saturates to
    all-1 on this corpus). Bands are a deterministic ntile over (event count,
    user_id) so the split is rerun-stable under ties; all moments are
    exact BIGINT sums over the user frame; z is one final float
    expression (sqrt of a DECIMAL(38) product). Scale: one user-level
    aggregate; the ntile runs over the user frame, orders of magnitude
    smaller than the event corpus."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.when(
            5
            * F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .alias("conv"),
    )
    b = u.select(
        "conv",
        (
            F.ntile(4).over(
                W.partitionBy(F.pmod(F.col("user_id"), F.lit(1))).orderBy(
                    "n_ev", "user_id"
                )
            )
            - 1
        )
        .cast("long")
        .alias("t"),
    )
    m = b.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("r"),
        F.sum("t").cast("long").alias("sum_tn"),
        F.sum(F.col("t") * F.col("conv")).cast("long").alias("sum_tr"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("sum_t2n"),
    )
    return m.select(
        "n",
        "r",
        "sum_tn",
        "sum_tr",
        "sum_t2n",
        (
            (F.col("n") * F.col("sum_tr") - F.col("r") * F.col("sum_tn"))
            .cast("double")
            * F.sqrt(F.col("n").cast("double"))
            / F.sqrt(
                F.expr(
                    "CAST(CAST(r AS DECIMAL(38,0)) * (n - r)"
                    " * (n * sum_t2n - sum_tn * sum_tn) AS DOUBLE)"
                )
            )
        ).alias("z"),
    )


@register(
    "stats_grubbs_daily_value",
    # Grubbs outlier statistic for the most extreme daily revenue:
    # deviations as exact BIGINT |n*x - S| (no mean rounding), sumsq
    # in DECIMAL(38), G = maxdev * sqrt(n-1) / sqrt(n * (n*Q - S^2))
    # — IEEE-exact sqrt/mul/div over integer-derived operands; the
    # argmax day tie-breaks by earliest day.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
      FROM d
    ),
    dev AS (
      SELECT d.day, d.x, t.n, t.s, t.q,
             abs(t.n * d.x - t.s) AS dev,
             row_number() OVER (ORDER BY abs(t.n * d.x - t.s) DESC, d.day)
               AS rn
      FROM d CROSS JOIN t
    )
    SELECT n AS n_days, day AS peak_day, x AS day_cents,
           CAST(dev AS BIGINT) AS dev_scaled,
           CAST(dev AS DOUBLE) * sqrt(CAST(n - 1 AS DOUBLE))
             / (CAST(n AS DOUBLE)
                * sqrt(CAST(CAST(n * q - CAST(s AS HUGEINT) * s
                       AS VARCHAR) AS DOUBLE))) AS grubbs_g
    FROM dev WHERE rn = 1
    """,
)
def stats_grubbs_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X274 Grubbs test statistic: is the single most extreme daily
    revenue an outlier? The parametric single-outlier screen beside
    the robust MAD sweep (X73) — MAD flags many, Grubbs formally
    tests the worst one. Deviations are exact BIGINT |n*x - S| (mean
    never rounded), Q in DECIMAL(38); G = one composition of
    IEEE-exact sqrt/mul/div over integer-derived operands. Scale: one
    day-level aggregate; the argmax window runs over the <=31-row
    day frame."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(cents).cast("long").alias("x")
    )
    t = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    dev = F.abs(F.col("n") * F.col("x") - F.col("s"))
    ranked = (
        d.crossJoin(F.broadcast(t))
        .select(
            "day",
            "x",
            "n",
            "s",
            "q",
            dev.alias("dev"),
            F.row_number()
            .over(
                W.partitionBy(F.pmod(F.col("n"), F.lit(1))).orderBy(
                    dev.desc(), F.asc("day")
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
    )
    return ranked.select(
        F.col("n").alias("n_days"),
        F.col("day").alias("peak_day"),
        F.col("x").alias("day_cents"),
        F.col("dev").cast("long").alias("dev_scaled"),
        (
            F.col("dev").cast("double")
            * F.sqrt((F.col("n") - 1).cast("double"))
            / (
                F.col("n").cast("double")
                * F.sqrt(
                    F.expr(
                        "CAST(n * q - CAST(s AS DECIMAL(38,0)) * s"
                        " AS DOUBLE)"
                    )
                )
            )
        ).alias("grubbs_g"),
    )


@register(
    "embedding_jl_projection",
    # Johnson-Lindenstrauss sign projection 64d -> 8d with Rademacher
    # signs pinned by md5 parity (hex char < '8' <=> top bit 0, exact
    # 50/50) — rerun/engine stable, no RNG. Components floor-quantized
    # to BIGINT at 1e6 so projections and norms are exact integers;
    # the distortion ratio is ONE float division per vector.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    comp AS (
      SELECT vec_id, t.d,
             CAST(floor(v[CAST(t.d + 1 AS INTEGER)] * 1000000) AS BIGINT)
               AS q
      FROM e CROSS JOIN range(64) t(d)
    ),
    signs AS (
      SELECT dd.d, pp.p,
             CASE WHEN substr(md5('jl_' || dd.d || '_' || pp.p), 1, 1) < '8'
                  THEN 1 ELSE -1 END AS s
      FROM range(64) dd(d) CROSS JOIN range(8) pp(p)
    ),
    proj AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN p = 0 THEN q * s END) AS BIGINT) AS y0,
             CAST(sum(CASE WHEN p = 1 THEN q * s END) AS BIGINT) AS y1,
             CAST(sum(CASE WHEN p = 2 THEN q * s END) AS BIGINT) AS y2,
             CAST(sum(CASE WHEN p = 3 THEN q * s END) AS BIGINT) AS y3,
             CAST(sum(CASE WHEN p = 4 THEN q * s END) AS BIGINT) AS y4,
             CAST(sum(CASE WHEN p = 5 THEN q * s END) AS BIGINT) AS y5,
             CAST(sum(CASE WHEN p = 6 THEN q * s END) AS BIGINT) AS y6,
             CAST(sum(CASE WHEN p = 7 THEN q * s END) AS BIGINT) AS y7,
             CAST(sum(CASE WHEN p = 0 THEN q * q END) AS BIGINT) AS norm2_q
      FROM comp JOIN signs USING (d)
      GROUP BY 1
    )
    SELECT vec_id, y0, y1, y2, y3, y4, y5, y6, y7, norm2_q,
           y0*y0 + y1*y1 + y2*y2 + y3*y3
             + y4*y4 + y5*y5 + y6*y6 + y7*y7 AS proj_norm2_q,
           CAST(y0*y0 + y1*y1 + y2*y2 + y3*y3
                + y4*y4 + y5*y5 + y6*y6 + y7*y7 AS DOUBLE)
             / (8.0 * CAST(norm2_q AS DOUBLE)) AS distortion
    FROM proj
    """,
)
def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X275 Johnson-Lindenstrauss random sign projection: 64d
    embeddings down to 8d with Rademacher +-1 signs pinned by md5
    parity (the X18/X19 hash-band discipline applied to the
    projection matrix — same matrix on every run and every engine, no
    RNG). The cheap dimensionality-reduction stage in front of the
    ANN/dedup family: LSH and IVF over 8d cost ~8x less. Components
    floor-quantize to BIGINT at 1e6 so projections and both norms are
    exact integers; per-vector distortion ||y||^2/(k*||x||^2) is one
    final float division. Scale: map-only per vector after a 512-row
    broadcast sign table — no shuffle on the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    ).select(
        "vec_id",
        "d",
        F.floor(F.col("x").cast("double") * 1000000).cast("long").alias("q"),
    )
    signs = (
        spark.range(64)
        .select(F.col("id").alias("d"))
        .crossJoin(spark.range(8).select(F.col("id").alias("p")))
        .select(
            "d",
            "p",
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("jl_"),
                            F.col("d").cast("string"),
                            F.lit("_"),
                            F.col("p").cast("string"),
                        )
                    ),
                    1,
                    1,
                )
                < "8",
                1,
            )
            .otherwise(-1)
            .alias("s"),
        )
    )
    ys = [
        F.sum(F.when(F.col("p") == i, F.col("q") * F.col("s")))
        .cast("long")
        .alias(f"y{i}")
        for i in range(8)
    ]
    proj = (
        comp.join(F.broadcast(signs), "d")
        .groupBy("vec_id")
        .agg(
            *ys,
            F.sum(F.when(F.col("p") == 0, F.col("q") * F.col("q")))
            .cast("long")
            .alias("norm2_q"),
        )
    )
    pn = sum(F.col(f"y{i}") * F.col(f"y{i}") for i in range(8))
    return proj.select(
        "vec_id",
        *[f"y{i}" for i in range(8)],
        "norm2_q",
        pn.alias("proj_norm2_q"),
        (
            pn.cast("double") / (F.lit(8.0) * F.col("norm2_q").cast("double"))
        ).alias("distortion"),
    )


@register(
    "embedding_triplet_mining",
    # Hardest-positive / hardest-negative mining per anchor: exact
    # integer dot products over 1e6-floor-quantized components (each
    # q*q sum < 2^53, so DuckDB's double list_dot_product is exact
    # too); cosine from IEEE-exact sqrt/div over identical integers,
    # floor-quantized at 1e6; ranking tie-breaks by candidate id.
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (
      SELECT vec_id, label,
             list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT)) AS qv
      FROM e
    ),
    n AS (
      SELECT vec_id, label, qv,
             list_dot_product(qv, qv) AS n2
      FROM q
    ),
    p AS (
      SELECT a.vec_id AS aid, b.vec_id AS bid,
             (a.label = b.label) AS same,
             CAST(floor(list_dot_product(a.qv, b.qv)
                        / (sqrt(CAST(a.n2 AS DOUBLE))
                           * sqrt(CAST(b.n2 AS DOUBLE)))
                        * 1000000) AS BIGINT) AS cq
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    ),
    pos AS (
      SELECT aid, bid AS pos_id, cq AS cos_pos_q,
             row_number() OVER (PARTITION BY aid ORDER BY cq DESC, bid)
               AS rn
      FROM p WHERE same
    ),
    neg AS (
      SELECT aid, bid AS neg_id, cq AS cos_neg_q,
             row_number() OVER (PARTITION BY aid ORDER BY cq DESC, bid)
               AS rn
      FROM p WHERE NOT same
    )
    SELECT pos.aid AS anchor_id, pos_id, neg_id,
           cos_pos_q, cos_neg_q,
           cos_pos_q - cos_neg_q AS margin_q
    FROM pos JOIN neg ON pos.aid = neg.aid AND pos.rn = 1 AND neg.rn = 1
    WHERE pos.rn = 1 AND neg.rn = 1
    """,
)
def embedding_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X276 triplet hard-example mining: for every anchor, the
    hardest positive (most-similar same-label vector — if THIS pair
    scores low the metric is failing) and the hardest negative
    (most-similar different-label vector — the one a contrastive loss
    most needs), with the margin between them. The batch-mining
    primitive of metric-learning pipelines; at corpus scale the
    candidate set comes from the X8/X9 LSH/IVF generators instead of
    all pairs — this is the within-batch exact form those feed.
    Runs as ops/similarity.hard_triplets: one Arrow-batched int64
    matmul per anchor batch against the broadcast quantized corpus
    (every dot < 2^53 so int64->float64 is exact; the cosine is the
    same IEEE sqrt/div/floor sequence the oracle runs). The
    interpreted zip_with form measured 31s at sf0.1; the matmul form
    ~1s — same hashes."""
    from alerta_spark.ops.similarity import hard_triplets

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_triplets(emb)


@register(
    "revenue_retention_ndr",
    # Net / gross dollar retention by month: per-(customer, month)
    # revenue in exact cents, the base = customers active the prior
    # month, NDR = their current revenue over their prior revenue and
    # GRR caps each customer at their prior level (expansion doesn't
    # mask churn). Month emitted as DATE on both engines; ratios are
    # ONE float division each.
    oracle="""
    WITH m AS (
      SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)) * 100)
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    pair AS (
      SELECT CAST(p.mon + INTERVAL 1 MONTH AS DATE) AS month,
             p.cents AS prev_cents,
             COALESCE(c.cents, 0) AS cur_cents
      FROM m p LEFT JOIN m c
        ON c.o_custkey = p.o_custkey
       AND c.mon = CAST(p.mon + INTERVAL 1 MONTH AS DATE)
    ),
    agg AS (
      SELECT month,
             CAST(count(*) AS BIGINT) AS base_customers,
             CAST(sum(prev_cents) AS BIGINT) AS base_cents,
             CAST(sum(cur_cents) AS BIGINT) AS retained_cents,
             CAST(sum(CASE WHEN cur_cents < prev_cents
                           THEN cur_cents ELSE prev_cents END)
                  AS BIGINT) AS floor_cents
      FROM pair GROUP BY 1
    )
    SELECT month, base_customers, base_cents, retained_cents, floor_cents,
           CAST(retained_cents AS DOUBLE) / CAST(base_cents AS DOUBLE)
             AS ndr,
           CAST(floor_cents AS DOUBLE) / CAST(base_cents AS DOUBLE)
             AS grr
    FROM agg
    """,
)
def revenue_retention_ndr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X277 net / gross dollar retention: for each month, take the
    customers who spent the PRIOR month as the base; NDR = their
    current spend over their prior spend (expansion can push it over
    1), GRR caps every customer at their prior level so expansion
    cannot mask churn — the standard SaaS-finance pair beside the
    count-based cohort retention (X51) and growth accounting (X137).
    Exact cents throughout; each ratio is one final float division.
    Scale: one (customer, month) aggregate, then a self-join keyed on
    (customer, month+1) — both sides shuffle once on the same key."""
    od = load_table(spark, sf_dir, "orders")
    m = od.groupBy(
        "o_custkey",
        F.trunc("o_orderdate", "month").alias("mon"),
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
        )
        .cast("long")
        .alias("cents")
    )
    p = m.select(
        "o_custkey",
        F.add_months("mon", 1).alias("month"),
        F.col("cents").alias("prev_cents"),
    )
    c = m.select(
        "o_custkey",
        F.col("mon").alias("month"),
        F.col("cents").alias("cur_cents"),
    )
    pair = p.join(c, ["o_custkey", "month"], "left").select(
        "month",
        "prev_cents",
        F.coalesce("cur_cents", F.lit(0)).alias("cur_cents"),
    )
    agg = pair.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("base_customers"),
        F.sum("prev_cents").cast("long").alias("base_cents"),
        F.sum("cur_cents").cast("long").alias("retained_cents"),
        F.sum(F.least("cur_cents", "prev_cents"))
        .cast("long")
        .alias("floor_cents"),
    )
    return agg.select(
        "month",
        "base_customers",
        "base_cents",
        "retained_cents",
        "floor_cents",
        (
            F.col("retained_cents").cast("double")
            / F.col("base_cents").cast("double")
        ).alias("ndr"),
        (
            F.col("floor_cents").cast("double")
            / F.col("base_cents").cast("double")
        ).alias("grr"),
    )


@register(
    "timeseries_seasonal_strength",
    # STL-style seasonal/trend strength on daily revenue: trend = the
    # centered 7-day window (kept as the exact integer numerator
    # 7x - S7 over the constant denominator 7), day-of-week seasonal
    # means as exact rationals, detrended/remainder floor-quantized at
    # 1e6 from IEEE-exact divisions of integer operands; the strength
    # ratios are cross-multiplied DECIMAL(38) with ONE division each.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT day, x,
             CAST(sum(x) OVER (ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
             count(*) OVER (ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM d
    ),
    det AS (
      SELECT day, dayofweek(day) AS dow,
             7 * x - s7 AS num
      FROM w WHERE c7 = 7
    ),
    sea AS (
      SELECT dow, CAST(sum(num) AS BIGINT) AS snum,
             CAST(count(*) AS BIGINT) AS c
      FROM det GROUP BY 1
    ),
    r AS (
      SELECT det.day,
             CAST(floor(CAST(num AS DOUBLE) / 7.0 * 1000000) AS BIGINT)
               AS dq,
             CAST(floor((CAST(num AS DOUBLE) / 7.0
                         - CAST(snum AS DOUBLE) / (7.0 * CAST(c AS DOUBLE)))
                        * 1000000) AS BIGINT) AS rq
      FROM det JOIN sea USING (dow)
    ),
    v AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dq) AS BIGINT) AS sd,
             CAST(sum(CAST(dq AS HUGEINT) * dq) AS HUGEINT) AS qd,
             CAST(sum(rq) AS BIGINT) AS sr,
             CAST(sum(CAST(rq AS HUGEINT) * rq) AS HUGEINT) AS qr
      FROM r
    )
    SELECT n,
           CAST(CAST(n * qd - CAST(sd AS HUGEINT) * sd AS VARCHAR)
                AS DOUBLE) / 1000000000000.0 AS var_detrended_n2,
           CAST(CAST(n * qr - CAST(sr AS HUGEINT) * sr AS VARCHAR)
                AS DOUBLE) / 1000000000000.0 AS var_remainder_n2,
           1.0 - CAST(CAST(n * qr - CAST(sr AS HUGEINT) * sr AS VARCHAR)
                      AS DOUBLE)
                 / CAST(CAST(n * qd - CAST(sd AS HUGEINT) * sd AS VARCHAR)
                        AS DOUBLE) AS seasonal_strength
    FROM v
    """,
)
def timeseries_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X278 seasonal strength (STL discipline): decompose daily
    revenue into trend (centered 7-day mean), day-of-week seasonal,
    and remainder, and report 1 - Var(remainder)/Var(detrended) — the
    standard [0,1] "how weekly is this series" readout that tells the
    X102 seasonal-residual anomaly screen whether its seasonal model
    is even warranted. The trend never rounds (kept as the exact
    integer numerator 7x - S7); detrended/remainder floor-quantize at
    1e6 from IEEE-exact divisions of integer operands; the final
    ratio is one float division of exact DECIMAL(38) moments. Scale:
    one day-level aggregate; windows run over the day frame."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(cents).cast("long").alias("x")
    )
    one = F.pmod(F.dayofmonth("day"), F.lit(1))
    wf = W.partitionBy(one).orderBy("day").rowsBetween(-3, 3)
    w = d.select(
        "day",
        "x",
        F.sum("x").over(wf).cast("long").alias("s7"),
        F.count(F.lit(1)).over(wf).alias("c7"),
    )
    det = w.where(F.col("c7") == 7).select(
        "day",
        F.dayofweek("day").alias("dow"),
        (F.lit(7) * F.col("x") - F.col("s7")).alias("num"),
    )
    sea = det.groupBy("dow").agg(
        F.sum("num").cast("long").alias("snum"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    r = det.join(F.broadcast(sea), "dow").select(
        F.floor(F.col("num").cast("double") / F.lit(7.0) * 1000000)
        .cast("long")
        .alias("dq"),
        F.floor(
            (
                F.col("num").cast("double") / F.lit(7.0)
                - F.col("snum").cast("double")
                / (F.lit(7.0) * F.col("c").cast("double"))
            )
            * 1000000
        )
        .cast("long")
        .alias("rq"),
    )
    v = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dq").cast("long").alias("sd"),
        F.sum(F.col("dq").cast("decimal(19,0)") * F.col("dq"))
        .cast("decimal(38,0)")
        .alias("qd"),
        F.sum("rq").cast("long").alias("sr"),
        F.sum(F.col("rq").cast("decimal(19,0)") * F.col("rq"))
        .cast("decimal(38,0)")
        .alias("qr"),
    )
    vd = F.expr("CAST(n * qd - CAST(sd AS DECIMAL(38,0)) * sd AS DOUBLE)")
    vr = F.expr("CAST(n * qr - CAST(sr AS DECIMAL(38,0)) * sr AS DOUBLE)")
    return v.select(
        "n",
        (vd / F.lit(1000000000000.0)).alias("var_detrended_n2"),
        (vr / F.lit(1000000000000.0)).alias("var_remainder_n2"),
        (F.lit(1.0) - vr / vd).alias("seasonal_strength"),
    )


@register(
    "attribution_position_u",
    # U-shaped (position-based) attribution in exact basis points:
    # first touch 40%, last touch 40%, the middle 20% split by
    # integral division with remainder points to the EARLIEST middles
    # (same largest-remainder discipline as the linear model), so
    # every purchase distributes exactly 10000 bp. 1-touch journeys
    # get 100%, 2-touch 50/50.
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS pt
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS tid, user_id, event_type AS channel,
             epoch_us(ts) AS tt
      FROM events WHERE event_type IN ('click', 'view', 'signup')
    ),
    touch AS (
      SELECT p.pid, t.channel,
             row_number() OVER (PARTITION BY p.pid ORDER BY t.tt, t.tid)
               AS rn,
             count(*) OVER (PARTITION BY p.pid) AS n
      FROM p JOIN t
        ON p.user_id = t.user_id
       AND t.tt < p.pt AND t.tt >= p.pt - 3600000000
    ),
    credit AS (
      SELECT pid, channel,
             CASE
               WHEN n = 1 THEN 10000
               WHEN n = 2 THEN 5000
               WHEN rn = 1 OR rn = n THEN 4000
               ELSE 2000 // (n - 2)
                    + CASE WHEN rn - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END
             END AS bp
      FROM touch
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases_touched,
           CAST(sum(bp) AS BIGINT) AS credit_bp,
           CAST(sum(bp) AS DOUBLE)
             / CAST((SELECT sum(bp) FROM credit) AS DOUBLE) AS credit_share
    FROM credit GROUP BY channel
    """,
)
def attribution_position_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X279 U-shaped (position-based) attribution: 40% of each
    purchase's credit to the first touch in the prior hour, 40% to
    the last, 20% split over the middles — the position-aware
    counterpart of the linear (X139) and time-decay (X220) models,
    closing the classical attribution family alongside Shapley
    (X247). Credits are exact integer basis points with
    largest-remainder rounding to the earliest middles, so every
    purchase distributes exactly 10000 bp and channel totals are
    exact BIGINTs; the share is one final float division. Scale: one
    time-bounded user join (same shape as X139), windows per
    purchase journey."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        us.alias("pt"),
    )
    t = ev.where(
        F.col("event_type").isin("click", "view", "signup")
    ).select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("event_type").alias("channel"),
        us.alias("tt"),
    )
    touch = p.join(
        t,
        (p["user_id"] == t["user_id"])
        & (F.col("tt") < F.col("pt"))
        & (F.col("tt") >= F.col("pt") - 3600000000),
    ).select(
        "pid",
        "channel",
        F.row_number()
        .over(W.partitionBy("pid").orderBy("tt", "tid"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("pid")).alias("n"),
    )
    bp = (
        F.when(F.col("n") == 1, 10000)
        .when(F.col("n") == 2, 5000)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 4000)
        .otherwise(
            F.expr("2000 div (n - 2)")
            + F.when(
                F.col("rn") - 1 <= F.expr("2000 % (n - 2)"), 1
            ).otherwise(0)
        )
    )
    credit = touch.select("pid", "channel", bp.alias("bp"))
    total = credit.agg(F.sum("bp").cast("long").alias("tot"))
    return (
        credit.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.countDistinct("pid").cast("long").alias("n_purchases_touched"),
            F.sum("bp").cast("long").alias("credit_bp"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "channel",
            "n_touches",
            "n_purchases_touched",
            "credit_bp",
            (
                F.col("credit_bp").cast("double")
                / F.col("tot").cast("double")
            ).alias("credit_share"),
        )
    )


@register(
    "drift_page_hinkley_daily",
    # Page-Hinkley change detector replayed over the daily-revenue
    # series: per-day terms x_i - mean_i (mean as the exact prefix
    # rational S_i/i, term floor-quantized at 1e6 from an IEEE-exact
    # division), PH_t = cum - min-prefix(cum); reports the max
    # excursion and its day. Windows over the <=31-row day frame.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    pre AS (
      SELECT day, x,
             CAST(sum(x) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS s,
             CAST(count(*) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS i
      FROM d
    ),
    terms AS (
      SELECT day,
             CAST(floor(CAST(x * i - s AS DOUBLE) / CAST(i AS DOUBLE)
                        * 1000000) AS BIGINT) AS tq
      FROM pre
    ),
    cum0 AS (
      SELECT day,
             CAST(sum(tq) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS m
      FROM terms
    ),
    cum AS (
      SELECT day, m,
             CAST(min(m) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS mn
      FROM cum0
    ),
    ph AS (
      SELECT day, m - mn AS ph_q,
             row_number() OVER (ORDER BY m - mn DESC, day) AS rn
      FROM cum
    )
    SELECT day AS peak_day,
           CAST(ph_q AS BIGINT) AS ph_q,
           CAST(ph_q AS DOUBLE) / 100000000.0 AS ph_dollars
    FROM ph WHERE rn = 1
    """,
)
def drift_page_hinkley_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X280 Page-Hinkley change detection replayed over daily
    revenue: the sequential upward-shift detector beside CUSUM (X61 —
    fixed reference mean) and PSI (X215 — binned distribution
    distance); PH tracks deviation from the RUNNING mean so it adapts
    to slow drift and fires on abrupt level shifts. Terms are
    floor-quantized at 1e6 from the exact prefix rational
    (x_i*i - S_i)/i; PH = cumulative sum minus its running minimum;
    reports the maximum excursion and its day. Scale: one day-level
    aggregate; every window runs over the day frame."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(cents).cast("long").alias("x")
    )
    one = F.pmod(F.dayofmonth("day"), F.lit(1))
    wc = W.partitionBy(one).orderBy("day")
    pre = d.select(
        "day",
        "x",
        F.sum("x").over(wc).cast("long").alias("s"),
        F.count(F.lit(1)).over(wc).cast("long").alias("i"),
    )
    terms = pre.select(
        "day",
        F.floor(
            (F.col("x") * F.col("i") - F.col("s")).cast("double")
            / F.col("i").cast("double")
            * 1000000
        )
        .cast("long")
        .alias("tq"),
    )
    cum = terms.select(
        "day",
        F.sum("tq").over(wc).cast("long").alias("m"),
    ).select(
        "day",
        "m",
        F.min("m").over(wc).cast("long").alias("mn"),
    )
    ph = cum.select(
        "day",
        (F.col("m") - F.col("mn")).alias("ph_q"),
        F.row_number()
        .over(
            W.partitionBy(F.pmod(F.dayofmonth("day"), F.lit(1))).orderBy(
                (F.col("m") - F.col("mn")).desc(), F.asc("day")
            )
        )
        .alias("rn"),
    ).where(F.col("rn") == 1)
    return ph.select(
        F.col("day").alias("peak_day"),
        F.col("ph_q").cast("long").alias("ph_q"),
        (F.col("ph_q").cast("double") / F.lit(100000000.0)).alias(
            "ph_dollars"
        ),
    )


@register(
    "text_dunning_llr",
    # Dunning log-likelihood (G2) keywords of source src0 vs the rest
    # of the corpus: every ln is ln(positive integer) floor-quantized
    # at 1e9 (the JVM-vs-libm discipline), so each term's G2 is an
    # exact BIGINT combination n*lq(n); top-30 cut deterministic on
    # (g2 desc, term); 0*ln(0) terms drop via CASE guards.
    oracle="""
    WITH toks AS (
      SELECT (source = 'src0') AS in_a,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    tc AS (
      SELECT term,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM toks GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS ra, CAST(sum(b) AS BIGINT) AS rb
      FROM tc
    ),
    g AS (
      SELECT term, a, b, ra, rb,
             2 * (
               CASE WHEN a > 0 THEN a * CAST(floor(ln(CAST(a AS DOUBLE))
                    * 1000000000) AS BIGINT) ELSE 0 END
               + CASE WHEN b > 0 THEN b * CAST(floor(ln(CAST(b AS DOUBLE))
                    * 1000000000) AS BIGINT) ELSE 0 END
               + CASE WHEN ra - a > 0 THEN (ra - a)
                    * CAST(floor(ln(CAST(ra - a AS DOUBLE))
                    * 1000000000) AS BIGINT) ELSE 0 END
               + CASE WHEN rb - b > 0 THEN (rb - b)
                    * CAST(floor(ln(CAST(rb - b AS DOUBLE))
                    * 1000000000) AS BIGINT) ELSE 0 END
               + (ra + rb) * CAST(floor(ln(CAST(ra + rb AS DOUBLE))
                    * 1000000000) AS BIGINT)
               - ra * CAST(floor(ln(CAST(ra AS DOUBLE))
                    * 1000000000) AS BIGINT)
               - rb * CAST(floor(ln(CAST(rb AS DOUBLE))
                    * 1000000000) AS BIGINT)
               - (a + b) * CAST(floor(ln(CAST(a + b AS DOUBLE))
                    * 1000000000) AS BIGINT)
               - CASE WHEN ra + rb - a - b > 0 THEN (ra + rb - a - b)
                    * CAST(floor(ln(CAST(ra + rb - a - b AS DOUBLE))
                    * 1000000000) AS BIGINT) ELSE 0 END
             ) AS g2q
      FROM tc CROSS JOIN tot
      WHERE a >= 5
    ),
    ranked AS (
      SELECT term, a, b, g2q,
             CASE WHEN a * rb > b * ra THEN 1 ELSE -1 END AS direction,
             row_number() OVER (ORDER BY g2q DESC, term) AS rn
      FROM g
    )
    SELECT term, a AS tf_src0, b AS tf_rest, g2q,
           CAST(g2q AS DOUBLE) / 1000000000.0 AS g2,
           CAST(direction AS BIGINT) AS direction,
           CAST(rn AS BIGINT) AS rank
    FROM ranked WHERE rn <= 30
    """,
)
def text_dunning_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X281 Dunning log-likelihood (G2) keyword extraction: which
    terms distinguish source src0 from the rest of the corpus, with a
    significance-aware score instead of the raw frequency ratios of
    trending terms (X66) or PMI (X72) — G2 is the standard corpus-
    linguistics keyness statistic, robust for rare terms where chi2
    overshoots. Every ln is ln(positive integer) floor-quantized at
    1e9, so each term's G2 is an exact BIGINT combination of n*lq(n)
    products; direction (over/under-used in src0) is an exact integer
    cross-product sign; the top-30 cut is deterministic on (g2 desc,
    term). Scale: one token-count aggregate (term x in_src0), a 1-row
    totals broadcast, map-side scoring — one shuffle on term."""
    docs = load_table(spark, sf_dir, "documents")
    term = F.explode(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda t: t != F.lit(""),
        )
    )
    toks = docs.select(
        (F.col("source") == "src0").alias("in_a"), term.alias("term")
    )
    tc = toks.groupBy("term").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("b"),
    )
    tot = tc.agg(
        F.sum("a").cast("long").alias("ra"),
        F.sum("b").cast("long").alias("rb"),
    )

    def nlq(n):
        return F.when(
            n > 0,
            n * F.floor(F.log(n.cast("double")) * 1000000000).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    a, b, ra, rb = F.col("a"), F.col("b"), F.col("ra"), F.col("rb")
    g2q = 2 * (
        nlq(a)
        + nlq(b)
        + nlq(ra - a)
        + nlq(rb - b)
        + nlq(ra + rb)
        - nlq(ra)
        - nlq(rb)
        - nlq(a + b)
        - nlq(ra + rb - a - b)
    )
    g = (
        tc.crossJoin(F.broadcast(tot))
        .where(a >= 5)
        .select("term", "a", "b", "ra", "rb", g2q.alias("g2q"))
    )
    ranked = g.select(
        "term",
        "a",
        "b",
        "g2q",
        F.when(a * rb > b * ra, 1).otherwise(-1).alias("direction"),
        F.row_number()
        .over(
            W.partitionBy(F.pmod(F.length("term"), F.lit(1))).orderBy(
                F.desc("g2q"), F.asc("term")
            )
        )
        .alias("rn"),
    ).where(F.col("rn") <= 30)
    return ranked.select(
        "term",
        F.col("a").alias("tf_src0"),
        F.col("b").alias("tf_rest"),
        "g2q",
        (F.col("g2q").cast("double") / F.lit(1000000000.0)).alias("g2"),
        F.col("direction").cast("long").alias("direction"),
        F.col("rn").cast("long").alias("rank"),
    )


_MK_CH = ["click", "view", "signup", "error"]
_MK_K = 12  # pinned absorption horizon (documented, like X264's alpha)


def _markov_oracle() -> str:
    """Generate the DuckDB oracle for attribution_markov_removal: the
    same 12-step 1e6-fixed-point absorption unroll the Spark side
    runs, as chained CTEs (X264 recursive-replay discipline, X98/X107
    unrolled-literal discipline)."""
    ch = _MK_CH
    srcs = ["start"] + ch
    tgts = ch + ["purchase"]
    qcols = []
    for s in srcs:
        for t in tgts:
            qcols.append(
                f"CAST(COALESCE(sum(CASE WHEN s = '{s}' AND t = '{t}' "
                f"THEN c END), 0) * 1000000 // GREATEST(COALESCE("
                f"sum(CASE WHEN s = '{s}' THEN c END), 0), 1) AS BIGINT)"
                f" AS q_{s}_{t}"
            )
    scen = [("full", None)] + [(f"rc_{c}", c) for c in ch]
    parts = []
    for name, rc in scen:
        init_cols = []
        for t in ch:
            v = "0" if t == rc else f"q_start_{t}"
            init_cols.append(f"{v} AS p_{t}")
        init_cols.append("q_start_purchase AS conv")
        parts.append(
            f"s_{name}_0 AS (SELECT {', '.join(init_cols)} FROM qrow)"
        )
        for k in range(1, _MK_K + 1):
            step_cols = []
            for t in ch:
                if t == rc:
                    step_cols.append(f"CAST(0 AS BIGINT) AS p_{t}")
                else:
                    acc = " + ".join(
                        f"p_{s} * q.q_{s}_{t}" for s in ch
                    )
                    step_cols.append(
                        f"CAST(({acc}) // 1000000 AS BIGINT) AS p_{t}"
                    )
            accp = " + ".join(f"p_{s} * q.q_{s}_purchase" for s in ch)
            step_cols.append(
                f"CAST(conv + ({accp}) // 1000000 AS BIGINT) AS conv"
            )
            parts.append(
                f"s_{name}_{k} AS (SELECT {', '.join(step_cols)} "
                f"FROM s_{name}_{k - 1} CROSS JOIN qrow q)"
            )
    res_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, f.conv AS conv_full_q, "
        f"r.conv AS conv_removed_q "
        f"FROM s_full_{_MK_K} f CROSS JOIN s_rc_{c}_{_MK_K} r"
        for c in ch
    )
    denom = " + ".join(f"(f.conv - c{i}.conv)" for i in range(len(ch)))
    denom_from = "s_full_%d f" % _MK_K + "".join(
        f" CROSS JOIN s_rc_{c}_{_MK_K} c{i}" for i, c in enumerate(ch)
    )
    return f"""
    WITH o AS (
      SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS pus
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN pus IS NULL OR us - pus > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ),
    sess AS (
      SELECT user_id, event_id, event_type, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ),
    numbered AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rn
      FROM sess
    ),
    firstp AS (
      SELECT user_id, sid, min(rn) AS prn
      FROM numbered WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    kept AS (
      SELECT n.user_id, n.sid, n.rn, n.event_type
      FROM numbered n LEFT JOIN firstp f
        ON n.user_id = f.user_id AND n.sid = f.sid
      WHERE f.prn IS NULL OR n.rn <= f.prn
    ),
    seq AS (
      SELECT user_id, sid, rn, event_type,
             lag(event_type) OVER (PARTITION BY user_id, sid ORDER BY rn)
               AS prev,
             max(rn) OVER (PARTITION BY user_id, sid) AS maxrn
      FROM kept
    ),
    edges AS (
      SELECT COALESCE(prev, 'start') AS s, event_type AS t FROM seq
      UNION ALL
      SELECT event_type AS s, 'null' AS t FROM seq
      WHERE rn = maxrn AND event_type <> 'purchase'
    ),
    cnt AS (SELECT s, t, CAST(count(*) AS BIGINT) AS c
            FROM edges GROUP BY 1, 2),
    qrow AS MATERIALIZED (SELECT {', '.join(qcols)} FROM cnt),
    {','.join(parts)},
    res AS ({res_rows}),
    tot AS (SELECT CAST({denom} AS BIGINT) AS denom FROM {denom_from})
    SELECT channel, conv_full_q, conv_removed_q,
           CAST(conv_full_q - conv_removed_q AS DOUBLE)
             / CAST(conv_full_q AS DOUBLE) AS removal_effect,
           CAST(conv_full_q - conv_removed_q AS DOUBLE)
             / CAST(denom AS DOUBLE) AS attribution_share
    FROM res CROSS JOIN tot
    """


@register("attribution_markov_removal", oracle=_markov_oracle())
def attribution_markov_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X282 Markov removal-effect attribution: build the first-order
    journey chain over sessionized event paths (30-min gap, cut at
    first purchase, 'start' source and 'null' terminal), then for each
    channel compute the absorption probability into purchase with that
    channel knocked out (transitions into it become lost mass); its
    removal effect 1 - P_conv(-c)/P_conv and the normalized
    attribution share. The data-driven counterpart of the heuristic
    models (linear X139, time-decay X220, U-shaped X279) and the
    cheap stand-in for exact Shapley (X247). Transition probabilities
    are 1e6-fixed-point integer divisions; absorption runs as a
    pinned 12-step unroll (X264's recursive-replay discipline) in
    exact BIGINT arithmetic, identically in the DuckDB oracle's
    chained CTEs. Scale: the corpus work is one sessionize + one
    (s,t) count; the chain solve touches a 1-row frame."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(
            F.lag(us).over(wu).isNull() | (us - F.lag(us).over(wu) > 1800000000),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.sum("is_new").over(wu).alias("sid"),
    )
    ws = W.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    numbered = sess.select(
        "user_id",
        "sid",
        "event_type",
        F.row_number().over(ws).alias("rn"),
    )
    firstp = (
        numbered.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "sid")
        .agg(F.min("rn").alias("prn"))
    )
    kept = numbered.join(firstp, ["user_id", "sid"], "left").where(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    wk = W.partitionBy("user_id", "sid").orderBy("rn")
    wka = W.partitionBy("user_id", "sid")
    seq = kept.select(
        "user_id",
        "sid",
        "rn",
        "event_type",
        F.lag("event_type").over(wk).alias("prev"),
        F.max("rn").over(wka).alias("maxrn"),
    )
    edges = seq.select(
        F.coalesce("prev", F.lit("start")).alias("s"),
        F.col("event_type").alias("t"),
    ).unionAll(
        seq.where(
            (F.col("rn") == F.col("maxrn"))
            & (F.col("event_type") != "purchase")
        ).select(F.col("event_type").alias("s"), F.lit("null").alias("t"))
    )
    cnt = edges.groupBy("s", "t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ch = _MK_CH
    srcs = ["start"] + ch
    tgts = ch + ["purchase"]
    qexprs = []
    for s in srcs:
        for t in tgts:
            qexprs.append(
                F.expr(
                    f"CAST(COALESCE(sum(CASE WHEN s = '{s}' AND t = '{t}' "
                    f"THEN c END), 0) * 1000000 div GREATEST(COALESCE("
                    f"sum(CASE WHEN s = '{s}' THEN c END), 0), 1) AS BIGINT)"
                ).alias(f"q_{s}_{t}")
            )
    # localCheckpoint the 1-row transition table: every one of the 65
    # step crossJoins references qrow, and WITHOUT truncation each one
    # embeds the full sessionize lineage into the plan — measured 47s
    # of pure plan-compile at any scale; with the checkpoint the chain
    # compiles against a leaf (sub-second, scale-invariant).
    qrow = cnt.agg(*qexprs).localCheckpoint(eager=True)

    def run_chain(rc: str | None) -> DataFrame:
        cur = qrow.select(
            *[
                (
                    F.lit(0).cast("long")
                    if t == rc
                    else F.col(f"q_start_{t}")
                ).alias(f"p_{t}")
                for t in ch
            ],
            F.col("q_start_purchase").alias("conv"),
        )
        for _ in range(_MK_K):
            j = cur.crossJoin(F.broadcast(qrow))
            cols = []
            for t in ch:
                if t == rc:
                    cols.append(F.lit(0).cast("long").alias(f"p_{t}"))
                else:
                    acc = " + ".join(f"p_{s} * q_{s}_{t}" for s in ch)
                    cols.append(
                        F.expr(f"CAST(({acc}) div 1000000 AS BIGINT)").alias(
                            f"p_{t}"
                        )
                    )
            accp = " + ".join(f"p_{s} * q_{s}_purchase" for s in ch)
            cols.append(
                F.expr(f"CAST(conv + ({accp}) div 1000000 AS BIGINT)").alias(
                    "conv"
                )
            )
            cur = j.select(*cols)
        return cur

    full = run_chain(None).select(F.col("conv").alias("conv_full_q"))
    removed = [
        run_chain(c).select(F.col("conv").alias(f"conv_rc_{c}")) for c in ch
    ]
    wide = full
    for r in removed:
        wide = wide.crossJoin(F.broadcast(r))
    denom = sum(
        F.col("conv_full_q") - F.col(f"conv_rc_{c}") for c in ch
    ).cast("long")
    rows = [
        wide.select(
            F.lit(c).alias("channel"),
            F.col("conv_full_q"),
            F.col(f"conv_rc_{c}").alias("conv_removed_q"),
            denom.alias("denom"),
        )
        for c in ch
    ]
    res = rows[0]
    for r in rows[1:]:
        res = res.unionAll(r)
    return res.select(
        "channel",
        "conv_full_q",
        "conv_removed_q",
        (
            (F.col("conv_full_q") - F.col("conv_removed_q")).cast("double")
            / F.col("conv_full_q").cast("double")
        ).alias("removal_effect"),
        (
            (F.col("conv_full_q") - F.col("conv_removed_q")).cast("double")
            / F.col("denom").cast("double")
        ).alias("attribution_share"),
    )


def _spectral_consts() -> list[tuple[int, float, float, float, float]]:
    """cos/sin at the weekly (period 7) and half-week (period 3.5)
    frequencies for day residues 0..6 — BOTH engines consume the same
    Python-computed doubles (repr round-trip in the SQL literal,
    native float in the Spark frame), so no libm-vs-JVM trig hazard
    ever enters the plan."""
    import math

    out = []
    for r in range(7):
        out.append(
            (
                r,
                math.cos(2 * math.pi * r / 7),
                math.sin(2 * math.pi * r / 7),
                math.cos(4 * math.pi * r / 7),
                math.sin(4 * math.pi * r / 7),
            )
        )
    return out


def _spectral_oracle() -> str:
    rows = ", ".join(
        f"({r}, {c7!r}, {s7!r}, {c35!r}, {s35!r})"
        for r, c7, s7, c35, s35 in _spectral_consts()
    )
    return f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q,
             min(day) AS d0
      FROM d
    ),
    trig(r, c7, s7, c35, s35) AS (VALUES {rows}),
    y AS (
      SELECT d.day, t.n, t.s, t.q,
             t.n * d.x - t.s AS yt,
             datediff('day', t.d0, d.day) % 7 AS r
      FROM d CROSS JOIN t
    ),
    terms AS (
      SELECT n, s, q,
             CAST(floor(CAST(yt AS DOUBLE) * c7 * 1000000.0) AS BIGINT)
               AS a7,
             CAST(floor(CAST(yt AS DOUBLE) * s7 * 1000000.0) AS BIGINT)
               AS b7,
             CAST(floor(CAST(yt AS DOUBLE) * c35 * 1000000.0) AS BIGINT)
               AS a35,
             CAST(floor(CAST(yt AS DOUBLE) * s35 * 1000000.0) AS BIGINT)
               AS b35
      FROM y JOIN trig ON trig.r = y.r
    ),
    agg AS (
      SELECT n,
             CAST(n * q - CAST(s AS HUGEINT) * s AS HUGEINT) AS var_n2,
             CAST(sum(a7) AS BIGINT) AS a7, CAST(sum(b7) AS BIGINT) AS b7,
             CAST(sum(a35) AS BIGINT) AS a35, CAST(sum(b35) AS BIGINT) AS b35
      FROM terms GROUP BY n, q, s
    )
    SELECT 7.0 AS period_days, a7 AS a_q, b7 AS b_q,
           2.0 * CAST(CAST(CAST(a7 AS HUGEINT) * a7
                           + CAST(b7 AS HUGEINT) * b7 AS VARCHAR) AS DOUBLE)
             / (1000000000000.0 * CAST(n AS DOUBLE)
                * CAST(CAST(var_n2 AS VARCHAR) AS DOUBLE)) AS power_share
    FROM agg
    UNION ALL
    SELECT 3.5, a35, b35,
           2.0 * CAST(CAST(CAST(a35 AS HUGEINT) * a35
                           + CAST(b35 AS HUGEINT) * b35 AS VARCHAR) AS DOUBLE)
             / (1000000000000.0 * CAST(n AS DOUBLE)
                * CAST(CAST(var_n2 AS VARCHAR) AS DOUBLE))
    FROM agg
    """


@register("spectral_weekly_power", oracle=_spectral_oracle())
def spectral_weekly_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X283 spectral power at the weekly and half-week frequencies of
    daily revenue — the frequency-domain twin of the time-domain
    seasonal strength (X278) and 24h autocorrelation (X149): a direct
    DFT projection answering "how much of the variance beats at 7
    days". cos/sin values (period-7 residue table) are pinned
    Python-computed doubles shared verbatim by both engines, so no
    libm-vs-JVM trig enters; the series is mean-centered exactly
    (n*x - S), per-term products floor-quantized at 1e6, and the
    power share is ONE float division of DECIMAL(38)-exact operands.
    Scale: one day-level aggregate + a 7-row broadcast join."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(cents).cast("long").alias("x")
    )
    t = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("q"),
        F.min("day").alias("d0"),
    )
    trig = spark.createDataFrame(
        _spectral_consts(), "r long, c7 double, s7 double, c35 double, s35 double"
    )
    y = d.crossJoin(F.broadcast(t)).select(
        "n",
        "s",
        "q",
        (F.col("n") * F.col("x") - F.col("s")).alias("yt"),
        F.pmod(F.datediff("day", "d0"), F.lit(7)).cast("long").alias("r"),
    )
    fl = lambda c: F.floor(  # noqa: E731
        F.col("yt").cast("double") * F.col(c) * F.lit(1000000.0)
    ).cast("long")
    terms = y.join(F.broadcast(trig), "r").select(
        "n",
        "s",
        "q",
        fl("c7").alias("a7"),
        fl("s7").alias("b7"),
        fl("c35").alias("a35"),
        fl("s35").alias("b35"),
    )
    agg = terms.groupBy("n", "q", "s").agg(
        F.sum("a7").cast("long").alias("a7"),
        F.sum("b7").cast("long").alias("b7"),
        F.sum("a35").cast("long").alias("a35"),
        F.sum("b35").cast("long").alias("b35"),
    ).select(
        "n",
        F.expr("CAST(n * q - CAST(s AS DECIMAL(38,0)) * s AS DECIMAL(38,0))")
        .alias("var_n2"),
        "a7",
        "b7",
        "a35",
        "b35",
    )

    def share(a, b):
        return (
            F.lit(2.0)
            * F.expr(
                f"CAST(CAST({a} AS DECIMAL(38,0)) * {a}"
                f" + CAST({b} AS DECIMAL(38,0)) * {b} AS DOUBLE)"
            )
            / (
                F.lit(1000000000000.0)
                * F.col("n").cast("double")
                * F.expr("CAST(var_n2 AS DOUBLE)")
            )
        )

    w7 = agg.select(
        F.lit(7.0).alias("period_days"),
        F.col("a7").alias("a_q"),
        F.col("b7").alias("b_q"),
        share("a7", "b7").alias("power_share"),
    )
    w35 = agg.select(
        F.lit(3.5).alias("period_days"),
        F.col("a35").alias("a_q"),
        F.col("b35").alias("b_q"),
        share("a35", "b35").alias("power_share"),
    )
    return w7.unionAll(w35)


@register(
    "orders_price_index_monthly",
    # Laspeyres & Paasche monthly price indices over parts: per-part
    # unit values are exact rationals (sum of extended cents over sum
    # of quantity), every cross-period product cross-multiplied in
    # DECIMAL(38) and floor-quantized at 1e6 per part (HUGEINT //),
    # each index ONE float division; base = the first month.
    oracle="""
    WITH pm AS (
      SELECT l_partkey AS pk,
             CAST(date_trunc('month', l_shipdate) AS DATE) AS mon,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                      AS BIGINT)) AS BIGINT) AS e,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    b0 AS (SELECT min(mon) AS m0 FROM pm),
    base AS (
      SELECT pk, e AS e0, qty AS q0 FROM pm, b0 WHERE pm.mon = b0.m0
    ),
    j AS (
      SELECT pm.mon, pm.pk, pm.e, pm.qty, base.e0, base.q0
      FROM pm JOIN base USING (pk)
    ),
    terms AS (
      SELECT mon,
             CAST((CAST(e AS HUGEINT) * q0 * 1000000) // qty AS BIGINT)
               AS lasp_num,
             CAST((CAST(e0 AS HUGEINT) * qty * 1000000) // q0 AS BIGINT)
               AS paas_den,
             e AS cur_e, e0 AS base_e
      FROM j
    ),
    agg AS (
      SELECT mon,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(lasp_num) AS BIGINT) AS lasp_num,
             CAST(sum(base_e) AS BIGINT) * 1000000 AS lasp_den,
             CAST(sum(cur_e) AS BIGINT) * 1000000 AS paas_num,
             CAST(sum(paas_den) AS BIGINT) AS paas_den
      FROM terms GROUP BY 1
    )
    SELECT mon AS month, n_parts,
           CAST(lasp_num AS DOUBLE) / CAST(lasp_den AS DOUBLE)
             AS laspeyres,
           CAST(paas_num AS DOUBLE) / CAST(paas_den AS DOUBLE)
             AS paasche
    FROM agg
    """,
)
def orders_price_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X284 Laspeyres & Paasche price indices by ship month: the
    classical econ/pricing readouts — Laspeyres holds the base-month
    basket fixed ("what would month-0 purchases cost now"), Paasche
    holds the current basket — over per-part unit values (exact cents
    over exact quantities, never a rounded average price). Parts
    absent from the base month drop (matched-model convention). Every
    cross-period product is cross-multiplied in DECIMAL(38) and
    floor-quantized at 1e6 per part; each index is one final float
    division. Scale: one (part, month) aggregate, base month
    broadcast, one month-level reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.trunc("l_shipdate", "month").alias("mon"),
    ).agg(
        F.sum(
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"
            )
        )
        .cast("long")
        .alias("e"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
    )
    b0 = pm.agg(F.min("mon").alias("m0"))
    base = (
        pm.crossJoin(F.broadcast(b0))
        .where(F.col("mon") == F.col("m0"))
        .select("pk", F.col("e").alias("e0"), F.col("qty").alias("q0"))
    )
    j = pm.join(base, "pk")
    terms = j.select(
        "mon",
        F.expr(
            "CAST((CAST(e AS DECIMAL(38,0)) * q0 * 1000000) div qty"
            " AS BIGINT)"
        ).alias("lasp_num"),
        F.expr(
            "CAST((CAST(e0 AS DECIMAL(38,0)) * qty * 1000000) div q0"
            " AS BIGINT)"
        ).alias("paas_den"),
        F.col("e").alias("cur_e"),
        F.col("e0").alias("base_e"),
    )
    agg = terms.groupBy("mon").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("lasp_num").cast("long").alias("lasp_num"),
        (F.sum("base_e").cast("long") * 1000000).alias("lasp_den"),
        (F.sum("cur_e").cast("long") * 1000000).alias("paas_num"),
        F.sum("paas_den").cast("long").alias("paas_den"),
    )
    return agg.select(
        F.col("mon").alias("month"),
        "n_parts",
        (
            F.col("lasp_num").cast("double") / F.col("lasp_den").cast("double")
        ).alias("laspeyres"),
        (
            F.col("paas_num").cast("double") / F.col("paas_den").cast("double")
        ).alias("paasche"),
    )


@register(
    "recs_coverage_diversity",
    # Offline eval of the X223 item-item recommender: catalog
    # coverage@3, intra-list similarity (quantized per-pair cosines,
    # pairs below the co-occurrence support floor count 0), and the
    # popularity bias of recommended vs catalog items (quantized-ln
    # means). Exact integers everywhere; each emitted mean is ONE
    # float division.
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    ba AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_b FROM ob GROUP BY brand),
    pr AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand <> b.brand
      GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    sc AS (
      SELECT pr.brand_a, pr.brand_b, pr.n_ab,
             b1.n_b AS n_a, b2.n_b AS n_bb
      FROM pr
      JOIN ba b1 ON b1.brand = pr.brand_a
      JOIN ba b2 ON b2.brand = pr.brand_b
    ),
    rk AS (
      SELECT brand_a, brand_b, n_bb,
             row_number() OVER (
               PARTITION BY brand_a
               ORDER BY CAST(n_ab AS HUGEINT) * n_ab * 1000000
                        / (CAST(n_a AS HUGEINT) * n_bb) DESC,
                        brand_b) AS rn
      FROM sc
    ),
    recs AS (SELECT brand_a, brand_b, n_bb FROM rk WHERE rn <= 3),
    pairs AS (
      SELECT r1.brand_a, r1.brand_b AS bi, r2.brand_b AS bj
      FROM recs r1 JOIN recs r2
        ON r1.brand_a = r2.brand_a AND r1.brand_b < r2.brand_b
    ),
    psim AS (
      SELECT p.brand_a,
             COALESCE(CAST(floor(CAST(s.n_ab AS DOUBLE)
                 / sqrt(CAST(s.n_a AS DOUBLE) * CAST(s.n_bb AS DOUBLE))
                 * 1000000) AS BIGINT), 0) AS simq
      FROM pairs p LEFT JOIN sc s
        ON s.brand_a = p.bi AND s.brand_b = p.bj
    ),
    cat AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(ln(CAST(n_b AS DOUBLE)) * 1000000000)
                  AS BIGINT)) AS BIGINT) AS cat_lnq
      FROM ba
    ),
    rec_stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_recs,
             CAST(count(DISTINCT brand_b) AS BIGINT) AS n_recommended,
             CAST(count(DISTINCT brand_a) AS BIGINT) AS n_lists,
             CAST(sum(CAST(floor(ln(CAST(n_bb AS DOUBLE)) * 1000000000)
                  AS BIGINT)) AS BIGINT) AS rec_lnq
      FROM recs
    ),
    ils AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(COALESCE(sum(simq), 0) AS BIGINT) AS sim_sum_q
      FROM psim
    )
    SELECT n_items, n_recommended, n_lists, n_recs, n_pairs,
           CAST(n_recommended AS DOUBLE) / CAST(n_items AS DOUBLE)
             AS coverage,
           CAST(sim_sum_q AS DOUBLE)
             / (CAST(n_pairs AS DOUBLE) * 1000000.0) AS mean_ils,
           CAST(rec_lnq AS DOUBLE)
             / (CAST(n_recs AS DOUBLE) * 1000000000.0) AS rec_mean_ln_pop,
           CAST(cat_lnq AS DOUBLE)
             / (CAST(n_items AS DOUBLE) * 1000000000.0) AS cat_mean_ln_pop
    FROM rec_stats CROSS JOIN ils CROSS JOIN cat
    """,
)
def recs_coverage_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X285 recommender eval beyond accuracy: catalog coverage@3 (what
    share of items ever get recommended), intra-list similarity (low =
    diverse lists; per-pair cosines floor-quantized at 1e6, pairs
    below the support floor scored 0), and popularity bias (mean
    quantized-ln popularity of recommended vs catalog items — the
    long-tail readout). Completes the recs family: X223 builds the
    lists, X226 (NDCG) scores relevance, this scores the catalog-level
    health a pure accuracy metric hides. Exact integer sums
    everywhere; each emitted mean is one final float division. Scale:
    reuses the X223 pair aggregate; everything after is brand-frame
    sized (bounded by distinct brands squared)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    ob = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    ba = ob.groupBy("brand").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    a = ob.select(F.col("ok"), F.col("brand").alias("brand_a"))
    b = ob.select(F.col("ok"), F.col("brand").alias("brand_b"))
    pr = (
        a.join(b, "ok")
        .where(F.col("brand_a") != F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    b1 = ba.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("n_a"))
    b2 = ba.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("n_bb"))
    sc = pr.join(F.broadcast(b1), "brand_a").join(F.broadcast(b2), "brand_b")
    key = F.expr(
        "CAST(n_ab AS DECIMAL(38,0)) * n_ab * 1000000"
        " div (CAST(n_a AS DECIMAL(38,0)) * n_bb)"
    )
    recs = (
        sc.select(
            "brand_a",
            "brand_b",
            "n_bb",
            F.row_number()
            .over(W.partitionBy("brand_a").orderBy(key.desc(), F.asc("brand_b")))
            .alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .drop("rn")
    )
    r1 = recs.select("brand_a", F.col("brand_b").alias("bi"))
    r2 = recs.select("brand_a", F.col("brand_b").alias("bj"))
    pairs = r1.join(r2, "brand_a").where(F.col("bi") < F.col("bj"))
    simq = F.floor(
        F.col("n_ab").cast("double")
        / F.sqrt(F.col("n_a").cast("double") * F.col("n_bb").cast("double"))
        * 1000000
    ).cast("long")
    scs = sc.select(
        F.col("brand_a").alias("bi"),
        F.col("brand_b").alias("bj"),
        simq.alias("simq"),
    )
    psim = pairs.join(F.broadcast(scs), ["bi", "bj"], "left").select(
        F.coalesce("simq", F.lit(0)).cast("long").alias("simq")
    )
    lnq = lambda c: F.floor(  # noqa: E731
        F.log(F.col(c).cast("double")) * 1000000000
    ).cast("long")
    cat = ba.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(lnq("n_b")).cast("long").alias("cat_lnq"),
    )
    rec_stats = recs.agg(
        F.count(F.lit(1)).cast("long").alias("n_recs"),
        F.countDistinct("brand_b").cast("long").alias("n_recommended"),
        F.countDistinct("brand_a").cast("long").alias("n_lists"),
        F.sum(lnq("n_bb")).cast("long").alias("rec_lnq"),
    )
    ils = psim.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum("simq"), F.lit(0)).cast("long").alias("sim_sum_q"),
    )
    return (
        rec_stats.crossJoin(F.broadcast(ils))
        .crossJoin(F.broadcast(cat))
        .select(
            "n_items",
            "n_recommended",
            "n_lists",
            "n_recs",
            "n_pairs",
            (
                F.col("n_recommended").cast("double")
                / F.col("n_items").cast("double")
            ).alias("coverage"),
            (
                F.col("sim_sum_q").cast("double")
                / (F.col("n_pairs").cast("double") * F.lit(1000000.0))
            ).alias("mean_ils"),
            (
                F.col("rec_lnq").cast("double")
                / (F.col("n_recs").cast("double") * F.lit(1000000000.0))
            ).alias("rec_mean_ln_pop"),
            (
                F.col("cat_lnq").cast("double")
                / (F.col("n_items").cast("double") * F.lit(1000000000.0))
            ).alias("cat_mean_ln_pop"),
        )
    )


@register(
    "sessions_peak_concurrency_daily",
    # Classic sweep-line concurrency: +1 at session start, -1 just
    # after session end, running sum over the TOTAL order (us, delta,
    # user_id, sid) — ends before starts at the same instant — then
    # per-day max with earliest-peak tie-break. All integers.
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS pus
      FROM events
    ),
    flagged AS (
      SELECT user_id, us,
             CASE WHEN pus IS NULL OR us - pus > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ),
    sess AS (
      SELECT user_id, us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ),
    b AS (
      SELECT user_id, sid,
             CAST(min(us) AS BIGINT) AS s0, CAST(max(us) AS BIGINT) AS s1
      FROM sess GROUP BY 1, 2
    ),
    points AS (
      SELECT s0 AS us, 1 AS delta, user_id, sid FROM b
      UNION ALL
      SELECT s1 + 1, -1, user_id, sid FROM b
    ),
    sweep AS (
      SELECT us,
             CAST(sum(delta) OVER (ORDER BY us, delta, user_id, sid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS conc
      FROM points
    ),
    daily AS (
      SELECT CAST(make_timestamp(us) AS DATE) AS day, us, conc,
             row_number() OVER (
               PARTITION BY CAST(make_timestamp(us) AS DATE)
               ORDER BY conc DESC, us) AS rn
      FROM sweep
    )
    SELECT day, conc AS peak_concurrency, CAST(us AS BIGINT) AS peak_at_us
    FROM daily WHERE rn = 1
    """,
)
def sessions_peak_concurrency_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X286 peak concurrent sessions per day: the sweep-line classic —
    +1 at each session start, -1 just after its end, running sum, max
    per day — the capacity-planning readout beside session depth
    (X166) and bounce rate (X78). The running sum uses the X246
    distributed prefix-sum primitive (range shuffle + per-partition
    cumsum + broadcast offsets), NOT a single-partition window, so
    the sweep scales with the session frame; ends sort before starts
    at the same instant (delta ascending) and the peak tie-breaks to
    the earliest microsecond. All integers — hash-exact."""
    from alerta_spark.ops.prefix import global_rank_cumsum

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        us.alias("us"),
        F.when(
            F.lag(us).over(wu).isNull() | (us - F.lag(us).over(wu) > 1800000000),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.select(
        "user_id",
        "us",
        F.sum("is_new")
        .over(W.partitionBy("user_id").orderBy("us"))
        .alias("sid"),
    )
    b = sess.groupBy("user_id", "sid").agg(
        F.min("us").cast("long").alias("s0"),
        F.max("us").cast("long").alias("s1"),
    )
    points = b.select(
        F.col("s0").alias("us"), F.lit(1).alias("delta"), "user_id", "sid"
    ).unionAll(
        b.select(
            (F.col("s1") + 1).alias("us"),
            F.lit(-1).alias("delta"),
            "user_id",
            "sid",
        )
    )
    sweep = global_rank_cumsum(
        points,
        [F.asc("us"), F.asc("delta"), F.asc("user_id"), F.asc("sid")],
        val_col="delta",
        cum_col="conc",
    ).select("us", F.col("conc").cast("long").alias("conc"))
    day = F.timestamp_micros(F.col("us")).cast("date")
    daily = sweep.select(
        day.alias("day"),
        "us",
        "conc",
        F.row_number()
        .over(W.partitionBy(day).orderBy(F.desc("conc"), F.asc("us")))
        .alias("rn"),
    ).where(F.col("rn") == 1)
    return daily.select(
        "day",
        F.col("conc").alias("peak_concurrency"),
        F.col("us").cast("long").alias("peak_at_us"),
    )


@register(
    "supply_safety_stock_z",
    # Per-part safety stock over the last 52 ship weeks: weekly-demand
    # moments exact (absent weeks are true zeros — n is pinned at 52,
    # so S/Q from present weeks alone are the complete moments),
    # sigma/SS/ROP one IEEE-exact float composition per part with
    # pinned z=1.645 and a 2-week lead time; top-25 by total demand.
    oracle="""
    WITH mx AS (SELECT CAST(max(l_shipdate) AS DATE) AS dmax FROM lineitem),
    wk AS (
      SELECT l_partkey AS pk,
             datediff('day', CAST(l_shipdate AS DATE), dmax) // 7 AS w,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem CROSS JOIN mx
      WHERE datediff('day', CAST(l_shipdate AS DATE), dmax) < 364
    ),
    pw AS (
      SELECT pk, w, CAST(sum(q) AS BIGINT) AS d
      FROM wk GROUP BY 1, 2
    ),
    m AS (
      SELECT pk,
             CAST(sum(d) AS BIGINT) AS s,
             CAST(sum(CAST(d AS HUGEINT) * d) AS BIGINT) AS q2,
             CAST(count(*) AS BIGINT) AS n_weeks_active
      FROM pw GROUP BY 1
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY s DESC, pk) AS rn FROM m
    )
    SELECT pk AS partkey, n_weeks_active, s AS total_qty_52w,
           52 * q2 - s * s AS var_num_q,
           1.645 * sqrt(CAST(52 * q2 - s * s AS DOUBLE) / (52.0 * 51.0))
             * sqrt(2.0) AS safety_stock,
           2.0 * CAST(s AS DOUBLE) / 52.0
             + 1.645 * sqrt(CAST(52 * q2 - s * s AS DOUBLE) / (52.0 * 51.0))
               * sqrt(2.0) AS reorder_point
    FROM ranked WHERE rn <= 25
    """,
)
def supply_safety_stock_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X287 safety stock & reorder point for the 25 highest-demand
    parts: weekly demand over the trailing 52 ship weeks (weeks with
    no shipments are TRUE zeros — n is pinned at 52, so the moments
    from active weeks alone are already complete; no dense grid is
    materialized), sigma from exact integer moments, SS = z·sigma·
    sqrt(LT) with pinned z=1.645 (95% service) and a 2-week lead
    time, ROP = lead-time demand + SS. The inventory-policy readout
    beside bullwhip (X235), OTIF (X239) and fill rate; one
    (part, week) aggregate then a part-level reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(F.max(F.col("l_shipdate").cast("date")).alias("dmax"))
    wk = (
        li.crossJoin(F.broadcast(mx))
        .where(F.datediff("dmax", F.col("l_shipdate").cast("date")) < 364)
        .select(
            F.col("l_partkey").alias("pk"),
            F.expr(
                "datediff(dmax, CAST(l_shipdate AS DATE)) div 7"
            ).alias("w"),
            F.col("l_quantity").cast("long").alias("q"),
        )
    )
    pw = wk.groupBy("pk", "w").agg(F.sum("q").cast("long").alias("d"))
    m = pw.groupBy("pk").agg(
        F.sum("d").cast("long").alias("s"),
        F.sum(F.col("d").cast("decimal(19,0)") * F.col("d"))
        .cast("long")
        .alias("q2"),
        F.count(F.lit(1)).cast("long").alias("n_weeks_active"),
    )
    ranked = m.select(
        "*",
        F.row_number()
        .over(
            W.partitionBy(F.pmod(F.col("s"), F.lit(1))).orderBy(
                F.desc("s"), F.asc("pk")
            )
        )
        .alias("rn"),
    ).where(F.col("rn") <= 25)
    var_num = F.lit(52) * F.col("q2") - F.col("s") * F.col("s")
    sigma = F.sqrt(var_num.cast("double") / F.lit(52.0 * 51.0))
    ss = F.lit(1.645) * sigma * F.sqrt(F.lit(2.0))
    return ranked.select(
        F.col("pk").alias("partkey"),
        "n_weeks_active",
        F.col("s").alias("total_qty_52w"),
        var_num.alias("var_num_q"),
        ss.alias("safety_stock"),
        (F.lit(2.0) * F.col("s").cast("double") / F.lit(52.0) + ss).alias(
            "reorder_point"
        ),
    )


@register(
    "abtest_srm_check",
    # Sample-ratio-mismatch chi2 for the X19 md5-band 80/10/10 split:
    # observed arm sizes vs design proportions, per-cell terms
    # (d*O - p*N)^2 * 1e6 // (p*d*N) as exact integer divisions
    # (d=10), chi2 = one final scale-down; flag at the df=2 95%
    # critical value.
    oracle="""
    WITH s AS (
      SELECT CASE
          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
            THEN 'train'
          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
            THEN 'eval'
          ELSE 'test' END AS split
      FROM documents
    ),
    c AS (
      SELECT
        CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_train,
        CAST(sum(CASE WHEN split = 'eval' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_eval,
        CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_test,
        CAST(count(*) AS BIGINT) AS n
      FROM s
    )
    SELECT n_train, n_eval, n_test, n,
           CAST(
             (CAST((10 * n_train - 8 * n) AS HUGEINT)
              * (10 * n_train - 8 * n) * 1000000) // (80 * n)
             + (CAST((10 * n_eval - 1 * n) AS HUGEINT)
                * (10 * n_eval - 1 * n) * 1000000) // (10 * n)
             + (CAST((10 * n_test - 1 * n) AS HUGEINT)
                * (10 * n_test - 1 * n) * 1000000) // (10 * n)
             AS BIGINT) AS chi2_q,
           (CAST(
             (CAST((10 * n_train - 8 * n) AS HUGEINT)
              * (10 * n_train - 8 * n) * 1000000) // (80 * n)
             + (CAST((10 * n_eval - 1 * n) AS HUGEINT)
                * (10 * n_eval - 1 * n) * 1000000) // (10 * n)
             + (CAST((10 * n_test - 1 * n) AS HUGEINT)
                * (10 * n_test - 1 * n) * 1000000) // (10 * n)
             AS BIGINT) > 5991000000) AS srm_flag
    FROM c
    """,
)
def abtest_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X288 sample-ratio-mismatch check: does the realized 80/10/10
    md5-band split (X19) match its design proportions? The first gate
    every experiment readout should run — a mismatched ratio
    invalidates X65/X128/X154 downstream. chi2 terms are exact
    integer divisions ((d*O - p*N)^2 scaled by 1e6 over p*d*N, d=10),
    flagged against the df=2 95% critical value 5.991. One map-side
    aggregate over the corpus; everything else is a 1-row frame."""
    docs = load_table(spark, sf_dir, "documents")
    pref = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    split = (
        F.when(pref < "cccccccc", "train")
        .when(pref < "e6666666", "eval")
        .otherwise("test")
    )
    c = docs.select(split.alias("split")).agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "eval", 1).otherwise(0))
        .cast("long")
        .alias("n_eval"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    chi2_q = F.expr(
        "CAST("
        "(CAST((10 * n_train - 8 * n) AS DECIMAL(38,0))"
        " * (10 * n_train - 8 * n) * 1000000) div (80 * n)"
        " + (CAST((10 * n_eval - 1 * n) AS DECIMAL(38,0))"
        " * (10 * n_eval - 1 * n) * 1000000) div (10 * n)"
        " + (CAST((10 * n_test - 1 * n) AS DECIMAL(38,0))"
        " * (10 * n_test - 1 * n) * 1000000) div (10 * n)"
        " AS BIGINT)"
    )
    return c.select(
        "n_train",
        "n_eval",
        "n_test",
        "n",
        chi2_q.alias("chi2_q"),
        (chi2_q > 5991000000).alias("srm_flag"),
    )


@register(
    "stats_welch_t_weekend",
    # Welch's unequal-variance t on daily revenue, weekday vs weekend:
    # exact integer moments per arm; t and the Welch-Satterthwaite df
    # are single compositions of IEEE-exact ops over integer-derived
    # operands (variance numerators cross-multiplied in DECIMAL(38),
    # VARCHAR hop for DuckDB's wide cast).
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             (dayofweek(CAST(ts AS DATE)) IN (0, 6)) AS wknd,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT wknd,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
      FROM d GROUP BY 1
    ),
    w AS (
      SELECT
        max(CASE WHEN wknd THEN n END) AS n1,
        max(CASE WHEN wknd THEN s END) AS s1,
        max(CASE WHEN wknd THEN q END) AS q1,
        max(CASE WHEN NOT wknd THEN n END) AS n2,
        max(CASE WHEN NOT wknd THEN s END) AS s2,
        max(CASE WHEN NOT wknd THEN q END) AS q2
      FROM m
    ),
    v AS (
      SELECT n1, n2, s1, s2,
             CAST(CAST(n1 * q1 - CAST(s1 AS HUGEINT) * s1 AS VARCHAR)
                  AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)
                  * CAST(n1 AS DOUBLE)) AS se1,
             CAST(CAST(n2 * q2 - CAST(s2 AS HUGEINT) * s2 AS VARCHAR)
                  AS DOUBLE)
               / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE)
                  * CAST(n2 AS DOUBLE)) AS se2
      FROM w
    )
    SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(n2 AS BIGINT) AS n_weekday,
           CAST(s1 AS BIGINT) AS weekend_cents,
           CAST(s2 AS BIGINT) AS weekday_cents,
           (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / sqrt(se1 + se2) AS t_stat,
           (se1 + se2) * (se1 + se2)
             / (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
                + se2 * se2 / CAST(n2 - 1 AS DOUBLE)) AS welch_df
    FROM v
    """,
)
def stats_welch_t_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X289 Welch's unequal-variance t-test: is weekend daily revenue
    different from weekday? The parametric two-sample location test
    the family was missing — Mann-Whitney (X200) is its rank
    alternative, ANOVA (X272) its k-group extension; Welch never
    assumes equal variances (the Behrens-Fisher-safe default). Arm
    moments are exact integers; t and the Welch-Satterthwaite df are
    single compositions of IEEE-exact ops (variance numerators
    cross-multiplied in DECIMAL(38)). Scale: one day-level aggregate,
    then 2-row frames."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    day = F.col("ts").cast("date")
    d = ev.groupBy(
        day.alias("day"),
        F.dayofweek(day).isin(1, 7).alias("wknd"),
    ).agg(F.sum(cents).cast("long").alias("x"))
    m = d.groupBy("wknd").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    w = m.agg(
        F.max(F.when(F.col("wknd"), F.col("n"))).alias("n1"),
        F.max(F.when(F.col("wknd"), F.col("s"))).alias("s1"),
        F.max(F.when(F.col("wknd"), F.col("q"))).alias("q1"),
        F.max(F.when(~F.col("wknd"), F.col("n"))).alias("n2"),
        F.max(F.when(~F.col("wknd"), F.col("s"))).alias("s2"),
        F.max(F.when(~F.col("wknd"), F.col("q"))).alias("q2"),
    )
    se1 = F.expr(
        "CAST(n1 * q1 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)"
    ) / (
        F.col("n1").cast("double")
        * (F.col("n1") - 1).cast("double")
        * F.col("n1").cast("double")
    )
    se2 = F.expr(
        "CAST(n2 * q2 - CAST(s2 AS DECIMAL(38,0)) * s2 AS DOUBLE)"
    ) / (
        F.col("n2").cast("double")
        * (F.col("n2") - 1).cast("double")
        * F.col("n2").cast("double")
    )
    v = w.select("n1", "n2", "s1", "s2", se1.alias("se1"), se2.alias("se2"))
    return v.select(
        F.col("n1").cast("long").alias("n_weekend"),
        F.col("n2").cast("long").alias("n_weekday"),
        F.col("s1").cast("long").alias("weekend_cents"),
        F.col("s2").cast("long").alias("weekday_cents"),
        (
            (
                F.col("s1").cast("double") / F.col("n1").cast("double")
                - F.col("s2").cast("double") / F.col("n2").cast("double")
            )
            / F.sqrt(F.col("se1") + F.col("se2"))
        ).alias("t_stat"),
        (
            (F.col("se1") + F.col("se2")) * (F.col("se1") + F.col("se2"))
            / (
                F.col("se1") * F.col("se1") / (F.col("n1") - 1).cast("double")
                + F.col("se2") * F.col("se2") / (F.col("n2") - 1).cast("double")
            )
        ).alias("welch_df"),
    )


@register(
    "changepoint_binseg_daily",
    # One-split binary segmentation on daily revenue: for every split
    # after day t, gain = (S1*n2 - S2*n1)^2 / (n1*n2*n) in exact
    # integers (DECIMAL(38) cross-products, 1e6 floor-quantized), the
    # argmax split deterministic on (gain desc, day); segment means
    # emitted as one division each.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    pre AS (
      SELECT day, x,
             CAST(sum(x) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS s1,
             CAST(count(*) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n1,
             CAST(sum(x) OVER () AS BIGINT) AS s,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM d
    ),
    gains AS (
      SELECT day, n1, n - n1 AS n2, s1, s - s1 AS s2,
             CAST((CAST(s1 * (n - n1) - (s - s1) * n1 AS HUGEINT)
                   * (s1 * (n - n1) - (s - s1) * n1) * 1000000)
                  // (CAST(n1 AS HUGEINT) * (n - n1) * n) AS BIGINT)
               AS gain_q
      FROM pre WHERE n1 < n
    ),
    best AS (
      SELECT *, row_number() OVER (ORDER BY gain_q DESC, day) AS rn
      FROM gains
    )
    SELECT day AS split_after_day, n1 AS n_left, n2 AS n_right, gain_q,
           CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0
             AS mean_left_dollars,
           CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0
             AS mean_right_dollars
    FROM best WHERE rn = 1
    """,
)
def changepoint_binseg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X290 binary-segmentation changepoint (one split) on daily
    revenue: the offline level-shift ESTIMATOR beside the online
    detectors — CUSUM (X61) and Page-Hinkley (X280) say "something
    shifted", binseg says WHERE: the split maximizing the between-
    segment variance gain n1*n2/n*(m1-m2)^2, computed as exact
    DECIMAL(38) cross-products floor-quantized at 1e6, argmax
    deterministic on (gain desc, day). Scale: one day-level aggregate;
    prefix sums over the day frame."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(cents).cast("long").alias("x")
    )
    one = F.pmod(F.dayofmonth("day"), F.lit(1))
    wc = W.partitionBy(one).orderBy("day")
    wa = W.partitionBy(one)
    pre = d.select(
        "day",
        F.sum("x").over(wc).cast("long").alias("s1"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n1"),
        F.sum("x").over(wa).cast("long").alias("s"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n"),
    )
    gains = pre.where(F.col("n1") < F.col("n")).select(
        "day",
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        "s1",
        (F.col("s") - F.col("s1")).alias("s2"),
        F.expr(
            "CAST((CAST(s1 * (n - n1) - (s - s1) * n1 AS DECIMAL(38,0))"
            " * (s1 * (n - n1) - (s - s1) * n1) * 1000000)"
            " div (CAST(n1 AS DECIMAL(38,0)) * (n - n1) * n) AS BIGINT)"
        ).alias("gain_q"),
    )
    best = gains.select(
        "*",
        F.row_number()
        .over(
            W.partitionBy(F.pmod(F.col("n1"), F.lit(1))).orderBy(
                F.desc("gain_q"), F.asc("day")
            )
        )
        .alias("rn"),
    ).where(F.col("rn") == 1)
    return best.select(
        F.col("day").alias("split_after_day"),
        F.col("n1").alias("n_left"),
        F.col("n2").alias("n_right"),
        "gain_q",
        (
            F.col("s1").cast("double") / F.col("n1").cast("double") / F.lit(100.0)
        ).alias("mean_left_dollars"),
        (
            F.col("s2").cast("double") / F.col("n2").cast("double") / F.lit(100.0)
        ).alias("mean_right_dollars"),
    )


@register(
    "stats_jonckheere_terpstra",
    # JT ordered-alternative test: J over the 4 activity bands from
    # per-distinct-value group-count prefix sums (never a pairwise
    # join), doubled (J2 = 2J) so tie halves stay integers; no-tie
    # normal variance; z = one final float composition.
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
             CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    b AS (
      SELECT x, CAST(ntile(4) OVER (ORDER BY n_ev, user_id) - 1 AS BIGINT)
               AS g
      FROM u
    ),
    v AS (
      SELECT x,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
      FROM b GROUP BY x
    ),
    p AS (
      SELECT x, c0, c1, c2, c3,
             CAST(sum(c0) OVER w - c0 AS BIGINT) AS p0,
             CAST(sum(c1) OVER w - c1 AS BIGINT) AS p1,
             CAST(sum(c2) OVER w - c2 AS BIGINT) AS p2
      FROM v WINDOW w AS (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    j AS (
      SELECT CAST(sum(2 * (c1 * p0 + c2 * (p0 + p1) + c3 * (p0 + p1 + p2))
                 + c1 * c0 + c2 * (c0 + c1) + c3 * (c0 + c1 + c2))
                 AS BIGINT) AS j2
      FROM p
    ),
    m AS (
      SELECT CAST(sum(c0 + c1 + c2 + c3) AS BIGINT) AS n,
             CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2, CAST(sum(c3) AS BIGINT) AS n3
      FROM v
    )
    SELECT j2, n,
           n * n - (n0 * n0 + n1 * n1 + n2 * n2 + n3 * n3) AS mu2,
           CAST(n AS HUGEINT) * n * (2 * n + 3)
             - (CAST(n0 AS HUGEINT) * n0 * (2 * n0 + 3)
                + CAST(n1 AS HUGEINT) * n1 * (2 * n1 + 3)
                + CAST(n2 AS HUGEINT) * n2 * (2 * n2 + 3)
                + CAST(n3 AS HUGEINT) * n3 * (2 * n3 + 3)) AS var72,
           CAST(2 * j2 - (n * n - (n0 * n0 + n1 * n1 + n2 * n2 + n3 * n3))
                AS DOUBLE)
             / (4.0 * sqrt(CAST(CAST(
                 CAST(n AS HUGEINT) * n * (2 * n + 3)
                 - (CAST(n0 AS HUGEINT) * n0 * (2 * n0 + 3)
                    + CAST(n1 AS HUGEINT) * n1 * (2 * n1 + 3)
                    + CAST(n2 AS HUGEINT) * n2 * (2 * n2 + 3)
                    + CAST(n3 AS HUGEINT) * n3 * (2 * n3 + 3))
                 AS VARCHAR) AS DOUBLE) / 72.0)) AS z
    FROM j CROSS JOIN m
    """,
)
def stats_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X291 Jonckheere-Terpstra ordered-alternative test: does
    per-user total VALUE rise monotonically across the activity
    bands? The continuous-outcome sibling of Cochran-Armitage (X273:
    binary outcome) and the ordered refinement of Kruskal-type
    k-group rank tests — JT has power exactly when the alternative is
    a trend. J comes from per-distinct-value group-count prefix sums
    (one aggregate over the value frame; NEVER a pairwise join, so it
    scales with distinct values, not users squared), doubled so the
    tie half-credits stay integers; z uses the classical no-tie
    variance (ties in integer cents are measure-zero here and the
    divergence is documented). All moments exact BIGINTs; z is one
    final float composition."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.sum(F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long")
        .alias("x"),
    )
    b = u.select(
        "x",
        (
            F.ntile(4).over(
                W.partitionBy(F.pmod(F.col("user_id"), F.lit(1))).orderBy(
                    "n_ev", "user_id"
                )
            )
            - 1
        )
        .cast("long")
        .alias("g"),
    )
    v = b.groupBy("x").agg(
        *[
            F.sum(F.when(F.col("g") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"c{i}")
            for i in range(4)
        ]
    )
    wx = W.partitionBy(F.pmod(F.col("c0"), F.lit(1))).orderBy("x")
    p = v.select(
        "x",
        "c0",
        "c1",
        "c2",
        "c3",
        (F.sum("c0").over(wx) - F.col("c0")).cast("long").alias("p0"),
        (F.sum("c1").over(wx) - F.col("c1")).cast("long").alias("p1"),
        (F.sum("c2").over(wx) - F.col("c2")).cast("long").alias("p2"),
    )
    j = p.agg(
        F.sum(
            2
            * (
                F.col("c1") * F.col("p0")
                + F.col("c2") * (F.col("p0") + F.col("p1"))
                + F.col("c3") * (F.col("p0") + F.col("p1") + F.col("p2"))
            )
            + F.col("c1") * F.col("c0")
            + F.col("c2") * (F.col("c0") + F.col("c1"))
            + F.col("c3") * (F.col("c0") + F.col("c1") + F.col("c2"))
        )
        .cast("long")
        .alias("j2")
    )
    m = v.agg(
        F.sum(F.col("c0") + F.col("c1") + F.col("c2") + F.col("c3"))
        .cast("long")
        .alias("n"),
        *[F.sum(f"c{i}").cast("long").alias(f"n{i}") for i in range(4)],
    )
    mu2 = F.expr("n * n - (n0 * n0 + n1 * n1 + n2 * n2 + n3 * n3)")
    var72 = F.expr(
        "CAST(n AS DECIMAL(38,0)) * n * (2 * n + 3)"
        " - (CAST(n0 AS DECIMAL(38,0)) * n0 * (2 * n0 + 3)"
        " + CAST(n1 AS DECIMAL(38,0)) * n1 * (2 * n1 + 3)"
        " + CAST(n2 AS DECIMAL(38,0)) * n2 * (2 * n2 + 3)"
        " + CAST(n3 AS DECIMAL(38,0)) * n3 * (2 * n3 + 3))"
    )
    return j.crossJoin(F.broadcast(m)).select(
        "j2",
        "n",
        mu2.alias("mu2"),
        var72.cast("decimal(38,0)").alias("var72"),
        (
            F.expr(
                "CAST(2 * j2 - (n * n - (n0 * n0 + n1 * n1 + n2 * n2"
                " + n3 * n3)) AS DOUBLE)"
            )
            / (
                F.lit(4.0)
                * F.sqrt(var72.cast("double") / F.lit(72.0))
            )
        ).alias("z"),
    )


@register(
    "diagnostics_join_key_skew",
    # Key-skew report for the events.user_id join/agg key: per-key
    # counts, max / exact p99 / avg, the skew ratio, and the salting
    # factor ceil(max/avg) a planner would apply — exact integers,
    # percentile by deterministic rank cut, one float division.
    oracle="""
    WITH k AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT c,
             row_number() OVER (ORDER BY c, user_id) AS rn,
             count(*) OVER () AS nk,
             CAST(sum(c) OVER () AS BIGINT) AS total
      FROM k
    ),
    s AS (
      SELECT CAST(max(nk) AS BIGINT) AS n_keys,
             CAST(max(total) AS BIGINT) AS n_rows,
             CAST(max(c) AS BIGINT) AS max_count,
             CAST(max(CASE WHEN rn = (99 * nk + 99) // 100 THEN c END)
                  AS BIGINT) AS p99_count
      FROM r
    )
    SELECT n_keys, n_rows, max_count, p99_count,
           CAST(max_count AS DOUBLE) * CAST(n_keys AS DOUBLE)
             / CAST(n_rows AS DOUBLE) AS skew_ratio,
           CAST((max_count * n_keys + n_rows - 1) // n_rows AS BIGINT)
             AS suggested_salt
    FROM s
    """,
)
def diagnostics_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X292 join-key skew diagnostic: the pre-flight report a planner
    (or an engineer deciding between plain, broadcast, and salted
    joins — the X17 salted top-k is this repo's mitigation) reads
    before shuffling on a key. Per-key counts for events.user_id, the
    max / exact-rank p99 / average, the skew ratio max/avg, and the
    salting factor ceil(max/avg) that would level the hottest key.
    Exact integers (percentile by deterministic ceil-rank cut, ceiling
    division in integer math); one float division for the ratio.
    Scale: one count aggregate on the key; the rank runs over the
    key frame (use the X246 prefix-sum primitive when the KEY frame
    itself is corpus-sized)."""
    ev = load_table(spark, sf_dir, "events")
    k = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    one = F.pmod(F.col("c"), F.lit(1))
    r = k.select(
        "c",
        F.row_number()
        .over(W.partitionBy(one).orderBy("c", "user_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy(one)).alias("nk"),
        F.sum("c").over(W.partitionBy(one)).cast("long").alias("total"),
    )
    s = r.agg(
        F.max("nk").cast("long").alias("n_keys"),
        F.max("total").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_count"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(99 * nk + 99) div 100"), F.col("c")
            )
        )
        .cast("long")
        .alias("p99_count"),
    )
    return s.select(
        "n_keys",
        "n_rows",
        "max_count",
        "p99_count",
        (
            F.col("max_count").cast("double")
            * F.col("n_keys").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_ratio"),
        F.expr(
            "CAST((max_count * n_keys + n_rows - 1) div n_rows AS BIGINT)"
        ).alias("suggested_salt"),
    )


@register(
    "text_lm_heldout_perplexity",
    # Held-out language-model quality: add-one-smoothed unigram model
    # fit on the X19 train band, scored on the eval band. Per-term
    # ln(c+1) and ln(denom) quantized at 1e9 (the X35 discipline), OOV
    # terms take the c=0 lane exactly; per-doc accumulation is exact
    # BIGINT; bits/token divides by a pinned ln2 literal.
    oracle="""
    WITH split AS (
      SELECT doc_id, text,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       < 'cccccccc' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       < 'e6666666' THEN 'eval'
                  ELSE 'test' END AS band
      FROM documents
    ),
    toks AS (
      SELECT doc_id, band,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM split WHERE band IN ('train', 'eval')
    ),
    vocab AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c
      FROM toks WHERE band = 'train' GROUP BY term
    ),
    tot AS (
      SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_train,
             CAST(count(*) AS BIGINT) AS v_train
      FROM vocab
    ),
    denomq AS (
      SELECT n_train, v_train,
             CAST(floor(ln(CAST(n_train + v_train + 1 AS DOUBLE))
                        * 1000000000) AS BIGINT) AS ld
      FROM tot
    ),
    ev AS (
      SELECT t.doc_id, t.term,
             CAST(floor(ln(CAST(COALESCE(v.c, 0) + 1 AS DOUBLE))
                        * 1000000000) AS BIGINT) AS lq,
             (v.term IS NULL) AS oov
      FROM toks t LEFT JOIN vocab v USING (term)
      WHERE t.band = 'eval'
    )
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           CAST(count(*) * d.ld - sum(lq) AS DOUBLE) / 1000000000.0
             / CAST(count(*) AS DOUBLE) AS mean_nll,
           CAST(count(*) * d.ld - sum(lq) AS DOUBLE) / 1000000000.0
             / CAST(count(*) AS DOUBLE) / 0.6931471805599453
             AS bits_per_token
    FROM ev e CROSS JOIN denomq d
    GROUP BY e.doc_id, d.ld
    """,
)
def text_lm_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X293 held-out perplexity: fit an add-one-smoothed unigram LM on
    the X19 train band and score every eval-band document — the
    standard "is this data clean / in-domain" readout an LLM data
    pipeline runs per source and per snapshot (in-corpus NLL X35
    scores a document under ITS OWN corpus; this scores unseen text
    under a FROZEN model, which is what generalizes). OOV terms take
    the exact c=0 smoothing lane; per-term logs quantized at 1e9,
    per-doc sums exact BIGINT, bits/token divides by a pinned ln2
    literal. Scale: one token count on train, one broadcast-joined
    scoring pass on eval — two shuffles total."""
    docs = load_table(spark, sf_dir, "documents")
    pref = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    band = (
        F.when(pref < "cccccccc", "train")
        .when(pref < "e6666666", "eval")
        .otherwise("test")
    )
    term = F.explode(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda t: t != F.lit(""),
        )
    )
    toks = (
        docs.select("doc_id", band.alias("band"), F.col("text"))
        .where(F.col("band").isin("train", "eval"))
        .select("doc_id", "band", term.alias("term"))
    )
    vocab = (
        toks.where(F.col("band") == "train")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = vocab.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_train"),
        F.count(F.lit(1)).cast("long").alias("v_train"),
    )
    denomq = tot.select(
        "n_train",
        "v_train",
        F.floor(
            F.log((F.col("n_train") + F.col("v_train") + 1).cast("double"))
            * 1000000000
        )
        .cast("long")
        .alias("ld"),
    )
    ev = (
        toks.where(F.col("band") == "eval")
        .join(F.broadcast(vocab), "term", "left")
        .select(
            "doc_id",
            F.floor(
                F.log((F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double"))
                * 1000000000
            )
            .cast("long")
            .alias("lq"),
            F.col("c").isNull().alias("oov"),
        )
    )
    g = (
        ev.crossJoin(F.broadcast(denomq.select("ld")))
        .groupBy("doc_id", "ld")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("oov"), 1).otherwise(0))
            .cast("long")
            .alias("oov_tokens"),
            F.sum("lq").cast("long").alias("slq"),
        )
    )
    nll = (
        (F.col("n_tokens") * F.col("ld") - F.col("slq")).cast("double")
        / F.lit(1000000000.0)
        / F.col("n_tokens").cast("double")
    )
    return g.select(
        "doc_id",
        "n_tokens",
        "oov_tokens",
        nll.alias("mean_nll"),
        (nll / F.lit(0.6931471805599453)).alias("bits_per_token"),
    )


@register(
    "revenue_bridge_monthly",
    # Month-over-month revenue waterfall: new + expansion -
    # contraction - churned == delta, all exact cents from one full
    # outer join of adjacent (customer, month) revenue frames; the
    # identity is emitted so the oracle hash PINS conservation.
    oracle="""
    WITH m AS (
      SELECT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)) * 100)
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    p AS (
      SELECT o_custkey, CAST(mon + INTERVAL 1 MONTH AS DATE) AS mon,
             cents AS prev FROM m
    ),
    j AS (
      SELECT COALESCE(c.mon, p.mon) AS month,
             COALESCE(c.cents, 0) AS cur,
             COALESCE(p.prev, 0) AS prev
      FROM m c FULL OUTER JOIN p
        ON c.o_custkey = p.o_custkey AND c.mon = p.mon
    )
    SELECT month,
           CAST(sum(CASE WHEN prev = 0 THEN cur ELSE 0 END) AS BIGINT)
             AS new_cents,
           CAST(sum(CASE WHEN cur > prev AND prev > 0
                         THEN cur - prev ELSE 0 END) AS BIGINT)
             AS expansion_cents,
           CAST(sum(CASE WHEN cur < prev AND cur > 0
                         THEN prev - cur ELSE 0 END) AS BIGINT)
             AS contraction_cents,
           CAST(sum(CASE WHEN cur = 0 THEN prev ELSE 0 END) AS BIGINT)
             AS churned_cents,
           CAST(sum(cur) - sum(prev) AS BIGINT) AS delta_cents,
           (CAST(sum(CASE WHEN prev = 0 THEN cur ELSE 0 END)
                 + sum(CASE WHEN cur > prev AND prev > 0
                            THEN cur - prev ELSE 0 END)
                 - sum(CASE WHEN cur < prev AND cur > 0
                            THEN prev - cur ELSE 0 END)
                 - sum(CASE WHEN cur = 0 THEN prev ELSE 0 END)
                 AS BIGINT) = CAST(sum(cur) - sum(prev) AS BIGINT))
             AS bridge_balances
    FROM j GROUP BY month
    """,
)
def revenue_bridge_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X294 monthly revenue bridge (waterfall): decompose each
    month-over-month revenue change into new + expansion -
    contraction - churned — the finance twin of count-based growth
    accounting (X137) and the decomposition NDR/GRR (X277) summarize.
    Exact cents from one full outer join of adjacent (customer,
    month) frames; the conservation identity is emitted as a column
    so the oracle hash PINS that the bridge balances. Scale: one
    (customer, month) aggregate + one co-partitioned full outer
    join."""
    od = load_table(spark, sf_dir, "orders")
    m = od.groupBy(
        "o_custkey", F.trunc("o_orderdate", "month").alias("mon")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
        )
        .cast("long")
        .alias("cents")
    )
    c = m.select("o_custkey", F.col("mon").alias("month"), F.col("cents").alias("cur"))
    p = m.select(
        "o_custkey",
        F.add_months("mon", 1).alias("month"),
        F.col("cents").alias("prev"),
    )
    j = c.join(p, ["o_custkey", "month"], "full_outer").select(
        "month",
        F.coalesce("cur", F.lit(0)).alias("cur"),
        F.coalesce("prev", F.lit(0)).alias("prev"),
    )
    new_c = F.sum(F.when(F.col("prev") == 0, F.col("cur")).otherwise(0))
    exp_c = F.sum(
        F.when(
            (F.col("cur") > F.col("prev")) & (F.col("prev") > 0),
            F.col("cur") - F.col("prev"),
        ).otherwise(0)
    )
    con_c = F.sum(
        F.when(
            (F.col("cur") < F.col("prev")) & (F.col("cur") > 0),
            F.col("prev") - F.col("cur"),
        ).otherwise(0)
    )
    chu_c = F.sum(F.when(F.col("cur") == 0, F.col("prev")).otherwise(0))
    delta = F.sum("cur") - F.sum("prev")
    return j.groupBy("month").agg(
        new_c.cast("long").alias("new_cents"),
        exp_c.cast("long").alias("expansion_cents"),
        con_c.cast("long").alias("contraction_cents"),
        chu_c.cast("long").alias("churned_cents"),
        delta.cast("long").alias("delta_cents"),
        ((new_c + exp_c - con_c - chu_c).cast("long") == delta.cast("long"))
        .alias("bridge_balances"),
    )


@register(
    "slo_apdex_daily",
    # Apdex on the value column as a latency proxy (T=100, tolerating
    # <= 4T): score = (2*satisfied + tolerating) / (2*n) — exact
    # integer counts, one final division per day.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS satisfied,
             CAST(sum(CASE WHEN value > 100 AND value <= 400
                           THEN 1 ELSE 0 END) AS BIGINT) AS tolerating
      FROM events GROUP BY 1
    )
    SELECT day, n, satisfied, tolerating,
           CAST(2 * satisfied + tolerating AS DOUBLE)
             / CAST(2 * n AS DOUBLE) AS apdex
    FROM d
    """,
)
def slo_apdex_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X295 daily Apdex score: the SRE satisfaction index — satisfied
    (value <= T=100) count full, tolerating (<= 4T) count half,
    frustrated zero — beside the burn-rate (X122) and SPC (X160)
    monitors; Apdex is the user-centric summary those alert on.
    Computed as (2*satisfied + tolerating)/(2n) so the half-credit
    stays integer; one map-side aggregate, one division per day."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") <= 100, 1).otherwise(0))
        .cast("long")
        .alias("satisfied"),
        F.sum(
            F.when((F.col("value") > 100) & (F.col("value") <= 400), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("tolerating"),
    )
    return d.select(
        "day",
        "n",
        "satisfied",
        "tolerating",
        (
            (F.lit(2) * F.col("satisfied") + F.col("tolerating")).cast("double")
            / (F.lit(2) * F.col("n")).cast("double")
        ).alias("apdex"),
    )


@register(
    "users_dau_mau_stickiness",
    # DAU/MAU: the X58 contribute-explode makes the trailing-30d
    # distinct exact without a sliding set union; stickiness is one
    # division per day of exact counts.
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d),
    contrib AS (
      SELECT DISTINCT user_id, d + CAST(o AS INTEGER) AS target_day
      FROM ud, (SELECT unnest(generate_series(0, 29)) AS o)
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
    mau AS (
      SELECT target_day AS d, CAST(count(*) AS BIGINT) AS mau
      FROM contrib, bounds
      WHERE target_day BETWEEN lo AND hi
      GROUP BY target_day
    )
    SELECT dau.d AS day, dau.dau, mau.mau,
           CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE) AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
    """,
)
def users_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X296 DAU/MAU stickiness: daily actives over trailing-30-day
    actives — the canonical product-engagement ratio beside the 7d
    sliding distinct (X58) and growth accounting (X137). The trailing
    distinct uses the same contribute-explode shape as X58 (each
    (user, day) contributes to the 30 target days, one distinct + one
    count — never a per-day rescan); stickiness is one division of
    exact counts. Scale: explode fan-out is a CONSTANT 30x on the
    deduplicated (user, day) frame, then one exchange."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(29))).alias("o"),
            "d",
        )
        .select("user_id", F.date_add("d", F.col("o")).alias("target_day"))
        .distinct()
    )
    bounds = ud.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    mau = (
        contrib.crossJoin(F.broadcast(bounds))
        .where(F.col("target_day").between(F.col("lo"), F.col("hi")))
        .groupBy(F.col("target_day").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("mau"))
    )
    return dau.join(mau, "d").select(
        F.col("d").alias("day"),
        "dau",
        "mau",
        (F.col("dau").cast("double") / F.col("mau").cast("double")).alias(
            "stickiness"
        ),
    )


@register(
    "spc_ewma_control_chart",
    # EWMA(lambda=1/2) control chart on the daily error rate: rates
    # quantized to BIGINT ppm, the EWMA fold linearized to the exact
    # 2^t prefix sum (X99 discipline, runtime-guarded 63-bit budget),
    # limits use the exact rational (4^t - 1)/(3*4^t) variance factor;
    # breach compares identical IEEE doubles.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errs
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT day, (errs * 1000000) // n AS pq,
             row_number() OVER (ORDER BY day) AS t
      FROM d
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(pq) AS BIGINT) AS sp,
             CAST(sum(CAST(pq AS HUGEINT) * pq) AS HUGEINT) AS qp
      FROM p
    ),
    m AS (
      SELECT day, t, pq,
             CAST(sum(pq * CASE WHEN t = 1 THEN 2
                               ELSE CAST(1 AS BIGINT) << (t - 1) END)
                  OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS mnum
      FROM p
    )
    SELECT m.day, m.pq,
           CAST(m.mnum AS DOUBLE)
             / CAST(CAST(1 AS BIGINT) << m.t AS DOUBLE) AS ewma_ppm,
           CAST(c.sp AS DOUBLE) / CAST(c.nd AS DOUBLE) AS center_ppm,
           3.0 * sqrt(CAST(CAST(c.nd * c.qp - CAST(c.sp AS HUGEINT) * c.sp
                     AS VARCHAR) AS DOUBLE)
                 / (CAST(c.nd AS DOUBLE) * CAST(c.nd - 1 AS DOUBLE)))
             * sqrt(CAST((CAST(1 AS BIGINT) << (2 * m.t)) - 1 AS DOUBLE)
                    / (3.0 * CAST(CAST(1 AS BIGINT) << (2 * m.t)
                                  AS DOUBLE))) AS limit_ppm,
           (abs(CAST(m.mnum AS DOUBLE)
                / CAST(CAST(1 AS BIGINT) << m.t AS DOUBLE)
                - CAST(c.sp AS DOUBLE) / CAST(c.nd AS DOUBLE))
            > 3.0 * sqrt(CAST(CAST(c.nd * c.qp - CAST(c.sp AS HUGEINT) * c.sp
                     AS VARCHAR) AS DOUBLE)
                 / (CAST(c.nd AS DOUBLE) * CAST(c.nd - 1 AS DOUBLE)))
             * sqrt(CAST((CAST(1 AS BIGINT) << (2 * m.t)) - 1 AS DOUBLE)
                    / (3.0 * CAST(CAST(1 AS BIGINT) << (2 * m.t)
                                  AS DOUBLE)))) AS breach
    FROM m CROSS JOIN c
    """,
)
def spc_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X297 EWMA control chart on the daily error rate: the
    small-shift-sensitive SPC monitor beside the Shewhart chart
    (X160 — big shifts) and CUSUM (X61): EWMA(lambda=1/2) weights
    recent days geometrically and its control limits widen with the
    exact factor sqrt((4^t - 1)/(3*4^t)). Rates quantize to BIGINT
    ppm; the EWMA fold is the X99 2^t linearization (exact integer
    prefix sum — the one lambda whose float fold becomes order-free
    arithmetic), runtime-guarded to the 63-bit budget; limits and
    breach flags are compositions of IEEE-exact ops on identical
    operands. Scale: one day-level aggregate; windows over the day
    frame (31 rows — far inside the 2^63 budget the guard enforces)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errs"),
    )
    one = F.pmod(F.col("n"), F.lit(1))
    p = d.select(
        "day",
        F.expr("(errs * 1000000) div n").alias("pq"),
        F.row_number().over(W.partitionBy(one).orderBy("day")).alias("t"),
    )
    c = p.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("pq").cast("long").alias("sp"),
        F.sum(F.col("pq").cast("decimal(19,0)") * F.col("pq"))
        .cast("decimal(38,0)")
        .alias("qp"),
    )
    guard = F.when(
        F.col("t") > 30,
        F.expr(
            "raise_error('spc_ewma_control_chart: series longer than the"
            " 63-bit exact budget (2^t linearization would wrap);"
            " window the input to <= 30 points')"
        ).cast("long"),
    )
    weight = F.coalesce(
        guard,
        F.when(F.col("t") == 1, F.lit(2).cast("long")).otherwise(
            F.expr("shiftleft(CAST(1 AS BIGINT), t - 1)")
        ),
    )
    wt = W.partitionBy(F.pmod(F.col("t"), F.lit(1))).orderBy("t")
    m = p.select(
        "day",
        "t",
        "pq",
        F.sum(F.col("pq") * weight).over(wt).cast("long").alias("mnum"),
    )
    ewma = F.col("mnum").cast("double") / F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), t) AS DOUBLE)"
    )
    center = F.col("sp").cast("double") / F.col("nd").cast("double")
    sig = F.lit(3.0) * F.sqrt(
        F.expr("CAST(nd * qp - CAST(sp AS DECIMAL(38,0)) * sp AS DOUBLE)")
        / (F.col("nd").cast("double") * (F.col("nd") - 1).cast("double"))
    ) * F.sqrt(
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 2 * t) - 1 AS DOUBLE)")
        / (
            F.lit(3.0)
            * F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 2 * t) AS DOUBLE)")
        )
    )
    return m.crossJoin(F.broadcast(c)).select(
        "day",
        "pq",
        ewma.alias("ewma_ppm"),
        center.alias("center_ppm"),
        sig.alias("limit_ppm"),
        (F.abs(ewma - center) > sig).alias("breach"),
    )


@register(
    "agg_grouping_sets_mixed",
    # Arbitrary GROUPING SETS (not the cube/rollup lattices X55
    # covers): ((type), (day), (type, day), ()) with grouping_id so
    # every stratum is distinguishable; exact cents.
    oracle="""
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           CAST(grouping(event_type) * 2 + grouping(CAST(ts AS DATE))
                AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)),
                            (event_type, CAST(ts AS DATE)), ())
    """,
)
def agg_grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X298 arbitrary GROUPING SETS: the four strata ((type), (day),
    (type, day), ()) in ONE pass with grouping_id labeling — the
    general lattice the cube (X55) and rollup special-case; Spark
    compiles it to a single Expand + hash aggregate, so the corpus is
    scanned once for all four granularities. Exact counts/cents."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    g = ev.select(
        "event_type", day.alias("day"), cents.alias("c")
    ).groupingSets(
        [["event_type"], ["day"], ["event_type", "day"], []],
        "event_type",
        "day",
    ).agg(
        (F.grouping("event_type") * 2 + F.grouping("day"))
        .cast("long")
        .alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("cents"),
    )
    return g.select("event_type", "day", "gid", "n", "cents")


@register(
    "asof_join_next_shipment",
    # Forward as-of with tolerance: for each order, the FIRST ship
    # date at/after the order date within 30 days (earliest ship,
    # smallest line tie-break); orders with nothing inside the
    # tolerance emit NULLs (left join semantics). Lag in whole days.
    oracle="""
    WITH cand AS (
      SELECT o.o_orderkey, o.o_orderdate,
             l.l_shipdate, l.l_linenumber,
             row_number() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY l.l_shipdate, l.l_linenumber) AS rn
      FROM orders o JOIN lineitem l
        ON l.l_orderkey = o.o_orderkey
       AND l.l_shipdate >= o.o_orderdate
       AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    )
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(c.l_shipdate AS DATE) AS first_ship_date,
           CAST(c.l_linenumber AS BIGINT) AS ship_linenumber,
           CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                         CAST(c.l_shipdate AS DATE)) AS BIGINT)
             AS days_to_ship
    FROM orders o LEFT JOIN cand c
      ON c.o_orderkey = o.o_orderkey AND c.rn = 1
    """,
)
def asof_join_next_shipment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X299 forward as-of join with tolerance: each order matched to
    its FIRST shipment at/after the order date within a 30-day
    tolerance, NULLs past it — the forward twin of the backward as-of
    (X-asof latest-order) and the tolerance semantics pandas
    merge_asof calls `tolerance=`/`direction='forward'`. One
    key+range join (co-partitioned on orderkey — the range predicate
    prunes inside each key group, no cross-key fan-out), top-1 via
    (shipdate, linenumber) window, left join preserves unmatched
    orders."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cand = (
        od.select("o_orderkey", "o_orderdate")
        .join(
            li.select("l_orderkey", "l_shipdate", "l_linenumber"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (
                F.col("l_shipdate")
                < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
            ),
        )
        .select(
            "o_orderkey",
            "l_shipdate",
            "l_linenumber",
            F.row_number()
            .over(
                W.partitionBy("o_orderkey").orderBy(
                    "l_shipdate", "l_linenumber"
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
    )
    return od.join(cand, "o_orderkey", "left").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("l_shipdate").cast("date").alias("first_ship_date"),
        F.col("l_linenumber").cast("long").alias("ship_linenumber"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("days_to_ship"),
    )


@register(
    "anomaly_benford_chi2",
    # chi2 companion of the X62 Benford TVD: per-type goodness-of-fit
    # against the log10(1+1/d) expectation, as a FIXED-ORDER 9-term
    # expression tree of identical doubles (never an aggregate over
    # digit rows); flagged at the df=8 95% critical value 15.507.
    oracle=(
        lambda b=_benford_expected(): f"""
    WITH d AS (
      SELECT event_type,
             CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS dig
      FROM events WHERE value >= 1
    ),
    c AS (
      SELECT event_type, count(*) AS n,
             {", ".join(f"count(*) FILTER (WHERE dig = {i}) AS c{i}" for i in range(1, 10))}
      FROM d GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ({" + ".join(
               f"(CAST(c{i} AS DOUBLE) - CAST(n AS DOUBLE) * {b[i-1]!r})"
               f" * (CAST(c{i} AS DOUBLE) - CAST(n AS DOUBLE) * {b[i-1]!r})"
               f" / (CAST(n AS DOUBLE) * {b[i-1]!r})"
               for i in range(1, 10)
           )}) AS chi2,
           (({" + ".join(
               f"(CAST(c{i} AS DOUBLE) - CAST(n AS DOUBLE) * {b[i-1]!r})"
               f" * (CAST(c{i} AS DOUBLE) - CAST(n AS DOUBLE) * {b[i-1]!r})"
               f" / (CAST(n AS DOUBLE) * {b[i-1]!r})"
               for i in range(1, 10)
           )}) > 15.507) AS nonconformant
    FROM c
    """
    )(),
)
def anomaly_benford_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X300 Benford chi2 conformance test: the significance-bearing
    companion of the X62 TVD screen — TVD ranks "how far from
    Benford", chi2 says whether the deviation is statistically
    surprising at the observed n, flagged at the df=8 95% critical
    value. The 9 expectation constants are shared Python-computed
    doubles; the statistic is a fixed-order 9-term expression tree of
    identical IEEE doubles per event type (never a float aggregate
    over digit rows). One map-side digit count; everything after is a
    5-row frame."""
    ev = load_table(spark, sf_dir, "events")
    b = _benford_expected()
    dig = F.substring(
        F.floor(F.col("value")).cast("long").cast("string"), 1, 1
    ).cast("int")
    c = (
        ev.where(F.col("value") >= 1)
        .select("event_type", dig.alias("dig"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.count(F.when(F.col("dig") == i, 1)).alias(f"c{i}")
                for i in range(1, 10)
            ],
        )
    )
    nd = F.col("n").cast("double")
    chi2 = None
    for i in range(1, 10):
        term = (
            (F.col(f"c{i}").cast("double") - nd * F.lit(b[i - 1]))
            * (F.col(f"c{i}").cast("double") - nd * F.lit(b[i - 1]))
            / (nd * F.lit(b[i - 1]))
        )
        chi2 = term if chi2 is None else chi2 + term
    return c.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        chi2.alias("chi2"),
        (chi2 > F.lit(15.507)).alias("nonconformant"),
    )


@register(
    "security_odd_hours_screen",
    # Night-activity anomaly screen: per-user night share vs the
    # population rate, binomial z with an EXACT integer ranking key
    # ((kN - nK)^2 * N * 1e6 // (n*K*(N-K)), sign carried separately)
    # so the top-20 cut never depends on float rounding; z itself is
    # one final float composition per emitted row.
    oracle="""
    WITH e AS (
      SELECT user_id,
             CASE WHEN EXTRACT(hour FROM ts) < 5 THEN 1 ELSE 0 END AS night
      FROM events
    ),
    u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(night) AS BIGINT) AS k
      FROM e GROUP BY 1
    ),
    t AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(k) AS BIGINT) AS kk
      FROM u
    ),
    sc AS (
      SELECT u.user_id, u.n, u.k, t.nn, t.kk,
             u.k * t.nn - u.n * t.kk AS dev,
             CAST((CAST(u.k * t.nn - u.n * t.kk AS HUGEINT)
                   * (u.k * t.nn - u.n * t.kk) * 1000000)
                  // (CAST(u.n AS HUGEINT) * t.kk * (t.nn - t.kk) * t.nn)
                  AS BIGINT) AS z2q
      FROM u CROSS JOIN t
    ),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY z2q DESC, user_id) AS rn
      FROM sc WHERE dev > 0
    )
    SELECT user_id, n AS n_events, k AS night_events, z2q,
           CAST(dev AS DOUBLE) / CAST(nn AS DOUBLE)
             / sqrt(CAST(n AS DOUBLE)
                    * (CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))
                    * (1.0 - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))) AS z
    FROM rk WHERE rn <= 20
    """,
)
def security_odd_hours_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X301 odd-hours activity screen: which users are significantly
    MORE nocturnal (00:00-05:00 UTC) than the population — the
    classic SOC after-hours-access analytic beside the bot-regularity
    screen (X238) and per-user burst detection (X132). Per-user
    binomial z against the population night rate; ranking uses the
    exact integer key (kN - nK)^2 * 1e6 / (n*K*(N-K)) (positive
    deviations only) so the top-20 cut is float-free; z is one final
    IEEE composition. Scale: one user-level aggregate + a 1-row
    broadcast."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        "user_id",
        F.when(F.hour("ts") < 5, 1).otherwise(0).alias("night"),
    ).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("night").cast("long").alias("k"),
    )
    t = u.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("k").cast("long").alias("kk"),
    )
    dev = F.col("k") * F.col("nn") - F.col("n") * F.col("kk")
    sc = u.crossJoin(F.broadcast(t)).select(
        "user_id",
        "n",
        "k",
        "nn",
        "kk",
        dev.alias("dev"),
        F.expr(
            "CAST((CAST(k * nn - n * kk AS DECIMAL(38,0))"
            " * (k * nn - n * kk) * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * kk * (nn - kk) * nn)"
            " AS BIGINT)"
        ).alias("z2q"),
    )
    rk = (
        sc.where(F.col("dev") > 0)
        .select(
            "*",
            F.row_number()
            .over(
                W.partitionBy(F.pmod(F.col("n"), F.lit(1))).orderBy(
                    F.desc("z2q"), F.asc("user_id")
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") <= 20)
    )
    pbar = F.col("kk").cast("double") / F.col("nn").cast("double")
    return rk.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("k").alias("night_events"),
        "z2q",
        (
            F.col("dev").cast("double")
            / F.col("nn").cast("double")
            / F.sqrt(F.col("n").cast("double") * pbar * (F.lit(1.0) - pbar))
        ).alias("z"),
    )


@register(
    "security_first_seen_spike",
    # New-entity monitoring: first-seen users per day, z against the
    # expanding trailing baseline (mean/std of all PRIOR days, exact
    # prefix moments, day >= 4 so the std is defined); one float
    # composition per day.
    oracle="""
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events
      GROUP BY 1
    ),
    d AS (
      SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
      FROM f GROUP BY 1
    ),
    alld AS (
      SELECT t.day, CAST(COALESCE(d.new_users, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) t
      LEFT JOIN d ON d.day = t.day
    ),
    pre AS (
      SELECT day, x,
             CAST(sum(x) OVER w - x AS BIGINT) AS ps,
             CAST(sum(CAST(x AS HUGEINT) * x) OVER w - CAST(x AS HUGEINT) * x
                  AS HUGEINT) AS pq,
             CAST(count(*) OVER w - 1 AS BIGINT) AS pn
      FROM alld WINDOW w AS (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT day, x AS new_users, pn AS baseline_days,
           CAST(pn * x - ps AS BIGINT) AS dev_scaled,
           CAST(pn * x - ps AS DOUBLE)
             / sqrt(CAST(pn AS DOUBLE))
             / sqrt(CAST(CAST(pn * pq - CAST(ps AS HUGEINT) * ps
                    AS VARCHAR) AS DOUBLE) / CAST(pn - 1 AS DOUBLE)) AS z
    FROM pre WHERE pn >= 4
    """,
)
def security_first_seen_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X302 first-seen-entity spike monitor: how many NEVER-before-
    seen users appear each day, and is today's count anomalous
    against the expanding baseline of all prior days — the new-entity
    analytic every SOC runs for credential-stuffing / scraping waves
    (and growth teams read as acquisition spikes), beside growth
    accounting (X137) which classifies rather than alerts. First-seen
    is an exact min-date aggregate; the baseline uses exact prefix
    moments (prior days only — today never contaminates its own
    baseline); z is one final IEEE composition, emitted once >= 4
    baseline days exist. Scale: one user-level aggregate, then
    day-frame windows."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    f = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    d = f.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    alld = (
        ev.select(day.alias("day"))
        .distinct()
        .join(d, "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).cast("long").alias("x"))
    )
    wc = W.partitionBy(F.pmod(F.col("x"), F.lit(1))).orderBy("day")
    pre = alld.select(
        "day",
        "x",
        (F.sum("x").over(wc) - F.col("x")).cast("long").alias("ps"),
        (
            F.sum(F.col("x").cast("decimal(19,0)") * F.col("x")).over(wc)
            - F.col("x").cast("decimal(19,0)") * F.col("x")
        )
        .cast("decimal(38,0)")
        .alias("pq"),
        (F.count(F.lit(1)).over(wc) - 1).cast("long").alias("pn"),
    )
    return pre.where(F.col("pn") >= 4).select(
        "day",
        F.col("x").alias("new_users"),
        F.col("pn").alias("baseline_days"),
        (F.col("pn") * F.col("x") - F.col("ps")).cast("long").alias("dev_scaled"),
        (
            (F.col("pn") * F.col("x") - F.col("ps")).cast("double")
            / F.sqrt(F.col("pn").cast("double"))
            / F.sqrt(
                F.expr(
                    "CAST(pn * pq - CAST(ps AS DECIMAL(38,0)) * ps AS DOUBLE)"
                )
                / (F.col("pn") - 1).cast("double")
            )
        ).alias("z"),
    )
