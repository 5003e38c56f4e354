"""Feature snapshot + negative sampling semantics."""

import datetime as dt

from pyspark.sql import functions as F


def test_feature_snapshot_leakage_safe(spark):
    from alerta_spark.ops.features import feature_snapshot

    cut = dt.datetime(2024, 2, 1)
    rows = [
        # user 1: 2 events in 7d window, 1 more in 30d, 1 AFTER cutoff
        (1, cut - dt.timedelta(days=2), "click", 10.0),
        (1, cut - dt.timedelta(days=3), "view", 5.5),
        (1, cut - dt.timedelta(days=20), "click", 1.0),
        (1, cut + dt.timedelta(days=1), "purchase", 99.0),   # leakage probe
        # user 2: only old events (outside both windows)
        (2, cut - dt.timedelta(days=40), "click", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    out = {r["user_id"]: r for r in feature_snapshot(df, cut).collect()}
    u1 = out[1]
    assert u1["n_7d"] == 2 and u1["n_30d"] == 3
    assert u1["value_cents_7d"] == 1550       # 10.00 + 5.50, no future 99
    assert u1["value_cents_30d"] == 1650
    assert u1["n_types_7d"] == 2 and u1["active_days_7d"] == 2
    assert u1["days_since_last"] == 2 and u1["tenure_days"] == 20
    u2 = out[2]
    assert u2["n_30d"] == 0 and u2["days_since_last"] == 40


def test_negative_samples_deterministic_and_disjoint(spark):
    from alerta_spark.ops.sampling import negative_samples

    df = spark.range(50).select(F.col("id").alias("doc_id"))
    a = negative_samples(df, k=4, salt="s").collect()
    b = negative_samples(df, k=4, salt="s").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # rerun-stable
    assert len(a) == 50 * 4
    assert all(r["neg_id"] != r["anchor_id"] for r in a)   # never self
    c = negative_samples(df, k=4, salt="other").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))  # salt re-rolls


def test_target_encode_loo_excludes_self(spark):
    from alerta_spark.ops.features import target_encode_loo

    rows = [
        (1, "a", 1), (2, "a", 0), (3, "a", 1),   # cat a: sum=2, n=3
        (4, "b", 1),                               # singleton -> NULL
    ]
    df = spark.createDataFrame(rows, "id long, cat string, t long")
    out = {r["id"]: r for r in target_encode_loo(df, "cat", "t", "id").collect()}
    assert out[1]["loo_enc"] == (2 - 1) / 2        # peers: 0,1
    assert out[2]["loo_enc"] == (2 - 0) / 2        # peers: 1,1
    assert out[3]["loo_enc"] == (2 - 1) / 2
    assert out[4]["loo_enc"] is None               # no peers


def test_bh_thresholds_match_normal_inverse():
    from alerta_spark.plans.catalog import _bh_thresholds
    from statistics import NormalDist

    th = _bh_thresholds(m=5, alpha=0.05)
    assert len(th) == 5
    assert th == sorted(th, reverse=True)          # step-up monotone
    assert th[4] == NormalDist().inv_cdf(1 - 0.025)  # rank m is plain alpha


def test_feature_store_incremental_matches_batch(spark, tmp_path):
    """Two incremental updates + store snapshot == one-shot batch
    snapshot over the raw events (day-boundary cutoff), and offline
    compaction preserves the snapshot exactly."""
    import datetime as dt

    from alerta_spark.ops.features import (
        compact_feature_store,
        feature_snapshot,
        feature_snapshot_from_store,
        update_feature_store,
    )

    cut = dt.datetime(2024, 2, 1)
    rows = [
        (1, cut - dt.timedelta(days=2, hours=3), "click", 10.0),
        (1, cut - dt.timedelta(days=3), "view", 5.5),
        (1, cut - dt.timedelta(days=20), "click", 1.0),
        (1, cut + dt.timedelta(days=1), "purchase", 99.0),  # after cutoff
        (2, cut - dt.timedelta(days=40), "click", 3.0),
        (2, cut - dt.timedelta(days=1), "purchase", 7.25),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    store = str(tmp_path / "fstore")
    # split the stream arbitrarily across two updates
    update_feature_store(spark, store, df.where("user_id = 1"))
    update_feature_store(spark, store, df.where("user_id = 2"))

    want = sorted(
        map(tuple, feature_snapshot(df, cut).collect())
    )
    got = sorted(
        map(tuple, feature_snapshot_from_store(spark, store, cut).collect())
    )
    assert got == want

    n = compact_feature_store(spark, store)
    assert n > 0
    got2 = sorted(
        map(tuple, feature_snapshot_from_store(spark, store, cut).collect())
    )
    assert got2 == want


def test_feature_store_streaming_face(spark, tmp_path):
    """The availableNow streaming wrapper folds event files into the
    same store; snapshot matches the batch computation."""
    import datetime as dt
    import json as _json

    from alerta_spark.ops.features import (
        feature_snapshot,
        feature_snapshot_from_store,
        stream_feature_updates,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    cut = dt.datetime(2024, 2, 1)
    rows = [
        (1, "2024-01-30T04:00:00", "click", 10.0),
        (1, "2024-01-12T00:00:00", "view", 5.5),
        (2, "2024-01-31T12:00:00", "purchase", 7.25),
    ]
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "batch.json", "w") as f:
        for u, ts, et, v in rows:
            f.write(
                _json.dumps(
                    {"user_id": u, "ts": ts, "event_type": et, "value": v}
                )
                + "\n"
            )
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    store = str(tmp_path / "fstore")
    q = stream_feature_updates(
        spark, str(src), store, str(tmp_path / "ckpt"), schema
    )
    q.awaitTermination(60)
    df = spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(ts), et, v) for u, ts, et, v in rows],
        schema,
    )
    want = sorted(map(tuple, feature_snapshot(df, cut).collect()))
    got = sorted(
        map(tuple, feature_snapshot_from_store(spark, store, cut).collect())
    )
    assert got == want


def test_quantile_transform_midranks_hand_checked(spark):
    """Guard against same-bug-both-sides oracle blindness: midranks
    pinned against hand computation. Values [5, 7, 7, 9]: ranks are
    1, 2.5, 2.5, 4 -> doubled 2, 5, 5, 8; quantile = mid/N with N=4."""
    from alerta_spark.plans import catalog
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        # user u repeated v times -> per-user counts 5,7,7,9
        [(u, i) for u, v in [(1, 5), (2, 7), (3, 7), (4, 9)] for i in range(v)],
        "user_id long, x long",
    )
    pre = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("v"))
    g = pre.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    from pyspark.sql import Window as W

    wc = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = g.select("v", "c", F.sum("c").over(wc).cast("long").alias("hi"))
    n = g.agg(F.sum("c").cast("long").alias("n"))
    out = {
        row["user_id"]: row
        for row in pre.join(F.broadcast(r), "v")
        .crossJoin(F.broadcast(n))
        .select(
            "user_id",
            (2 * F.col("hi") - F.col("c") + 1).cast("long").alias("m2"),
            (
                (2 * F.col("hi") - F.col("c") + 1).cast("double")
                / (F.lit(2.0) * F.col("n").cast("double"))
            ).alias("q"),
        )
        .collect()
    }
    assert out[1]["m2"] == 2 and out[1]["q"] == 2 / 8
    assert out[2]["m2"] == 5 and out[2]["q"] == 5 / 8
    assert out[3]["m2"] == 5
    assert out[4]["m2"] == 8 and out[4]["q"] == 1.0
