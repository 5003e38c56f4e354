"""Declarative data-contract validation — a Great-Expectations-style
rule list evaluated in (almost) one corpus pass.

A training-data lake lives or dies on enforced contracts: every
ingest batch should prove "event_id unique, ts in range, value
non-negative, event_type in the known set" BEFORE it lands. The rule
set is data ("expectations"), not code, so the same engine pass serves
every table.

Spark shape: all ROW-LOCAL rules (not_null / range / in_set / regex /
expr) compile to conditional-sum columns of ONE aggregate over ONE
scan — adding a rule adds a column, not a job. `unique` rules are the
exception (they need a groupBy per column); each runs as its own tiny
two-level aggregate (count minus countDistinct) and the results union.
Output is one row per rule: [rule_idx, kind, col, n_checked,
n_violations, pass] — the report an orchestrator gates a partition
write on.

Reference provenance: no analogue (the reference trusts its Athena
schema); training-pipeline extension, pairs with
quality_fk_integrity_audit (cross-table) and profile_column_stats
(distribution readout) — this is the CONTRACT layer.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rule_predicate(rule: dict[str, Any]) -> "F.Column":
    """Violation predicate (TRUE = row violates) for row-local rules."""
    kind = rule["kind"]
    col = F.col(rule["col"])
    if kind == "not_null":
        return col.isNull()
    if kind == "range":
        lo, hi = rule.get("lo"), rule.get("hi")
        ok = F.lit(True)
        if lo is not None:
            ok = ok & (col >= F.lit(lo))
        if hi is not None:
            ok = ok & (col <= F.lit(hi))
        # NULLs are not range violations; not_null is its own rule
        return col.isNotNull() & ~ok
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(list(rule["values"]))
    if kind == "regex":
        return col.isNotNull() & ~col.rlike(str(rule["pattern"]))
    if kind == "expr":
        # free-form boolean SQL over the row; violation = NOT expr
        return ~F.expr(str(rule["expr"]))
    raise ValueError(f"unknown expectation kind: {kind!r}")


def validate_expectations(
    df: DataFrame, rules: list[dict[str, Any]]
) -> DataFrame:
    """Evaluate ``rules`` against ``df``; one report row per rule.

    Rule dicts: {"kind": "not_null"|"range"|"in_set"|"regex"|"expr"
    |"unique", "col": str, ...kind params}. Row-local rules share one
    aggregate/scan; each `unique` rule adds one grouped aggregate.
    """
    spark = df.sparkSession
    row_local = [
        (i, r) for i, r in enumerate(rules) if r["kind"] != "unique"
    ]
    uniques = [(i, r) for i, r in enumerate(rules) if r["kind"] == "unique"]

    reports: list[DataFrame] = []
    if row_local:
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, r in row_local:
            aggs.append(
                F.sum(
                    F.when(_rule_predicate(r), 1).otherwise(0)
                ).cast("long").alias(f"_v{i}")
            )
        one = df.agg(*aggs)
        # ONE report row per rule via an in-row explode of the 1-row
        # aggregate — the former per-rule union re-ran the corpus
        # aggregate once per rule (N scans for N row-local rules)
        rep = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("rule_idx"),
                            F.lit(r["kind"]).alias("kind"),
                            F.lit(r.get("col", "")).alias("col"),
                            F.col("_n").alias("n_checked"),
                            F.col(f"_v{i}").alias("n_violations"),
                        )
                        for i, r in row_local
                    ]
                )
            ).alias("_r")
        ).select("_r.*")
        reports.append(rep)

    for i, r in uniques:
        col = r["col"]
        agg = df.where(F.col(col).isNotNull()).agg(
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct(F.col(col)).alias("_d"),
        )
        reports.append(
            agg.select(
                F.lit(i).alias("rule_idx"),
                F.lit("unique").alias("kind"),
                F.lit(col).alias("col"),
                F.col("_n").alias("n_checked"),
                (F.col("_n") - F.col("_d")).cast("long").alias(
                    "n_violations"
                ),
            )
        )

    if not reports:
        return spark.createDataFrame(
            [],
            "rule_idx int, kind string, col string, n_checked long, "
            "n_violations long, pass boolean",
        )
    out = reports[0]
    for rdf in reports[1:]:
        out = out.unionByName(rdf)
    return out.withColumn("pass", F.col("n_violations") == 0).orderBy(
        "rule_idx"
    )


def split_violations(
    df: DataFrame, rules: list[dict[str, Any]]
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split on ROW-LOCAL rules: (clean, rejected) where
    rejected rows carry `violated` — the rule indexes they break, as a
    sorted array — so quarantined data is diagnosable without a
    re-scan. `unique` rules are cross-row and cannot tag a single row;
    they belong in the report (:func:`validate_expectations`), not the
    split."""
    row_local = [(i, r) for i, r in enumerate(rules) if r["kind"] != "unique"]
    if not row_local:
        return df, df.where(F.lit(False)).withColumn(
            "violated", F.array().cast("array<int>")
        )
    tags = F.array_compact(
        F.array(
            *[
                F.when(_rule_predicate(r), F.lit(i))
                for i, r in row_local
            ]
        )
    )
    tagged = df.withColumn("violated", tags)
    clean = tagged.where(F.size("violated") == 0).drop("violated")
    rejected = tagged.where(F.size("violated") > 0)
    return clean, rejected


def stream_contract_gate(
    stream_df: DataFrame,
    rules: list[dict[str, Any]],
    clean_path: str,
    rejected_path: str,
    checkpoint_dir: str,
    trigger: dict[str, Any] | None = None,
):
    """The contract as an INGEST GATE: every micro-batch is split
    (clean rows append to ``clean_path``, violating rows with their
    rule tags to ``rejected_path``/dead-letter) and the full
    per-batch report — including cross-row `unique` rules evaluated
    WITHIN the batch — appends to ``rejected_path``/_reports with the
    batch id. foreachBatch keeps it one pass per batch; exactly-once
    comes from the checkpointed batch id (a replayed batch overwrites
    nothing, appends are idempotent per path+batch via the report).

    Returns the StreamingQuery (caller awaits/stops)."""

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        clean, rejected = split_violations(batch_df, rules)
        clean.write.mode("append").parquet(clean_path)
        rejected.withColumn(
            "violated", F.col("violated").cast("array<int>")
        ).write.mode("append").parquet(rejected_path)
        report = validate_expectations(batch_df, rules).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        report.write.mode("append").parquet(rejected_path + "/_reports")

    writer = (
        stream_df.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
