"""Pre-flight data profiling for shuffle-heavy plans.

Every big join/groupBy in this repo shuffles on a key; at 100 TB a
single hot key (or NULL flood) turns one reducer into the job's
critical path. `skew_report` is the cheap pre-flight: one aggregate
over the key column, broadcast totals, top-N heavy hitters with their
share of all rows and ratio to the mean key size — the numbers that
decide between a plain shuffle, `salted_topk`-style two-phase
aggregation, AQE skew-join, or an explicit hot-key route. NULL keys
are reported as a first-class row (the classic silent skew source in
outer joins).

All ratios are single IEEE divisions of exact BIGINT counts —
deterministic across engines, so the catalog entry is hash-checked.

Reference provenance: no analogue — the reference's Athena delegation
hides physical skew entirely; on Spark it is the operator's problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Top-``top_n`` heaviest keys with global skew context.

    Plan: one partial+final count aggregate on the key, a broadcast
    single-row totals frame, and TakeOrderedAndProject for the top-N
    cut (never a global window over all keys); the rank window runs
    over the already-cut top-N rows only — bounded by construction,
    single-partition by design (constant partition key states that).

    -> [key, cnt, rank, share_of_total, ratio_to_mean].
    """
    c = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    t = c.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = c.orderBy(F.desc("cnt"), F.asc_nulls_first("key")).limit(top_n)
    w = W.partitionBy(F.lit(0)).orderBy(F.desc("cnt"), F.asc_nulls_first("key"))
    return (
        top.crossJoin(F.broadcast(t))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "key",
            "cnt",
            "rank",
            (F.col("cnt").cast("double") / F.col("total").cast("double")).alias(
                "share_of_total"
            ),
            (
                F.col("cnt").cast("double")
                / (F.col("total").cast("double") / F.col("n_keys").cast("double"))
            ).alias("ratio_to_mean"),
        )
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Schema-quality profile: per listed column, row count, NULL
    count, NULL rate, and EXACT distinct count, in ONE scan.

    The multi-column exact-distinct runs as a single aggregate (Spark
    expands the input once per distinct aggregate — row growth is
    x len(cols), partial-aggregated map-side; for web-scale quick looks
    swap in approx_count_distinct). The wide one-row result is unpivoted
    driver-side via stack — nothing row-sized leaves the aggregate.

    -> [column, n_rows, n_null, null_rate, n_distinct]; null_rate is
    one int/int IEEE division (engine-exact).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"_n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', _n_{c}, _null_{c}, _dist_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (column, n_rows, n_null, n_distinct)"
    ).select(
        "column",
        "n_rows",
        "n_null",
        (F.col("n_null").cast("double") / F.col("n_rows").cast("double")).alias(
            "null_rate"
        ),
        "n_distinct",
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Pre-release privacy screen: quasi-identifier combinations whose
    group size is below ``k`` — the rows a k-anonymity policy says are
    re-identifiable and must be generalized or suppressed before a
    dataset ships.

    One partial+final count aggregate on the quasi-identifier tuple +
    a broadcast 1-row total; NULLs group as values (a NULL combo can
    be identifying too). Returns only the at-risk combos:
    [*quasi_cols, n, share_e6] where share_e6 is the combo's
    parts-per-million of all rows (exact integer arithmetic — an
    engine-exact stand-in for a float share).

    Scale: group cardinality is bounded by the quasi-identifier
    domain, not the row count; the aggregate map-side combines, so
    the 100 TB cost is one shuffle of (combo, partial count) rows.

    Reference provenance: no analogue; dataset-release extension
    (pairs with corpus_datacard).
    """
    counts = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("_tot"))
    return (
        counts.where(F.col("n") < k)
        .crossJoin(F.broadcast(total))
        .select(
            *quasi_cols,
            "n",
            # integral div, never a float: IEEE n*1e6/tot can round
            # UP across the integer boundary floor() expects
            F.expr("(n * 1000000) div _tot").cast("long").alias("share_e6"),
        )
    )
