"""Physical-plan regression guards: the properties that make these
operators survive a 100x scale-up. If one of these starts failing, a
code change broke pushdown/broadcast/pruning — the plan, not just the
answer, is part of the contract."""

import pytest

from alerta_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = catalog.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_criteria_scan_prunes_and_pushes(spark):
    plan = _plan(spark, "s1_criteria_scan")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # column pruning: ts/value not read for this projection
    assert "ts" not in scan.split("FileScan parquet")[1].split("]")[0]
    # predicate pushdown reaches the scan
    assert "event_type" in scan and "purc" in scan


def test_dedup_antijoin_is_broadcast(spark):
    plan = _plan(spark, "f8_dedup_antijoin")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_small_dims_broadcast_in_star_join(spark):
    plan = _plan(spark, "join_revenue_by_nation")
    assert "BroadcastHashJoin" in plan


def test_threshold_single_shuffle(spark):
    """The whole threshold-alert pipeline (scan→filter→agg→render) must
    cost exactly one exchange: the groupBy on the aggregation key."""
    plan = _plan(spark, "c7_threshold_alert_render")
    assert plan.count("Exchange") == 1


def test_topk_no_extra_exchange(spark):
    plan = _plan(spark, "a5_topk_per_group")
    # one exchange for the window partitioning, nothing else
    assert plan.count("Exchange") == 1


def test_text_ops_shuffle_free(spark):
    for name in ["text_token_stats", "text_quality_score", "text_fingerprint"]:
        plan = _plan(spark, name)
        assert "Exchange" not in plan, f"{name} should be map-only"
