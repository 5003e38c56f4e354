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
