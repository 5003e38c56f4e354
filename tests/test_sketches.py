"""HLL distinct-count rollup: merge exactness + estimate accuracy +
incremental maintenance parity."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from alerta_spark.sources.lake import load_table

    return load_table(spark, SF, "events")


def test_hll_estimate_close_to_exact(events):
    """Sketch estimate within HLL's expected error of the exact
    distinct count at every (day, type) bucket (lg_k=12 → ~1.6% rse;
    assert 5% to stay flake-free)."""
    from alerta_spark.ops.sketches import distinct_partials, finalize_distinct

    est = {
        (r["bucket_start"], r["event_type"]): r["n_distinct"]
        for r in finalize_distinct(
            distinct_partials(events, bucket="1 day")
        ).collect()
    }
    exact = {
        (r["bucket_start"], r["event_type"]): r["n"]
        for r in events.groupBy(
            F.window("ts", "1 day").getField("start").alias("bucket_start"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for key, n in exact.items():
        assert abs(est[key] - n) <= max(2, 0.05 * n), (key, est[key], n)


def test_hll_incremental_equals_monolithic(events):
    """Any delta split merges to the SAME registers: estimates from
    two half-deltas combined equal the one-shot sketch exactly."""
    from alerta_spark.ops.sketches import (
        combine_distinct_partials,
        distinct_partials,
        finalize_distinct,
    )

    mono = finalize_distinct(distinct_partials(events, bucket="1 day"))
    a = events.where(F.col("event_id") % 2 == 0)
    b = events.where(F.col("event_id") % 2 == 1)
    inc = finalize_distinct(
        combine_distinct_partials(
            distinct_partials(a, bucket="1 day"),
            distinct_partials(b, bucket="1 day"),
        )
    )
    assert sorted(map(tuple, mono.collect())) == sorted(map(tuple, inc.collect()))


def test_hll_maintain_rollup_two_waves(spark, events, tmp_path):
    """Store-backed incremental maintenance: two maintain calls over
    disjoint deltas produce the same estimates as one over the union,
    and the second write only rewrites touched buckets."""
    from alerta_spark.ops.sketches import (
        distinct_partials,
        finalize_distinct,
        maintain_distinct_rollup,
        read_distinct_rollup,
    )

    path = str(tmp_path / "hll_rollup")
    a = events.where(F.col("event_id") % 3 == 0)
    b = events.where(F.col("event_id") % 3 != 0)
    maintain_distinct_rollup(spark, path, a, bucket="1 day")
    maintain_distinct_rollup(spark, path, b, bucket="1 day")
    stored = {
        (r["bucket_start"], r["event_type"]): r["n_distinct"]
        for r in read_distinct_rollup(spark, path).collect()
    }
    oneshot = {
        (r["bucket_start"], r["event_type"]): r["n_distinct"]
        for r in finalize_distinct(
            distinct_partials(events, bucket="1 day")
        ).collect()
    }
    assert stored == oneshot


def test_cms_overcounts_never_undercounts(spark):
    from alerta_spark.ops.sketches import cms_build, cms_estimate

    items = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 7 + [("c",)] * 1, ["term"]
    )
    cms = cms_build(items, depth=3, prefix_len=2)  # 256 buckets
    cand = spark.createDataFrame([("a",), ("b",), ("c",)], ["term"])
    est = {r["term"]: r["cms_tf"] for r in cms_estimate(
        cms, cand, depth=3, prefix_len=2
    ).collect()}
    exact = {"a": 50, "b": 7, "c": 1}
    for t, n in exact.items():
        assert est[t] >= n


def test_cms_unseen_item_estimates_zero_or_collision(spark):
    from alerta_spark.ops.sketches import cms_build, cms_estimate

    items = spark.createDataFrame([("a",)] * 3, ["term"])
    cms = cms_build(items, depth=3, prefix_len=3)  # 4096 buckets, 1 item
    cand = spark.createDataFrame([("zzz_never_seen",)], ["term"])
    [row] = cms_estimate(cms, cand, depth=3, prefix_len=3).collect()
    # with one distinct item in 4096 buckets a 3-row collision on all
    # depths is impossible -> the min must hit an absent bucket
    assert row["cms_tf"] == 0


def test_cms_merge_by_adding_counts_is_exact(spark):
    """Sketch of (A union B) == pointwise sum of sketches of A and B —
    the property that makes CMS a per-shard incremental summary."""
    from alerta_spark.ops.sketches import cms_build

    a = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, ["term"])
    b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 5, ["term"])
    merged = (
        cms_build(a).unionByName(cms_build(b))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    oneshot = cms_build(a.unionByName(b))
    m = {(r["depth"], r["bucket"]): r["cnt"] for r in merged.collect()}
    o = {(r["depth"], r["bucket"]): r["cnt"] for r in oneshot.collect()}
    assert m == o


def test_bloom_no_false_negatives_and_low_fpr(spark):
    """Every inserted item MUST probe true (structural guarantee);
    unseen items probe true only at the designed FPR (~(1-e^{-kn/m})^k
    ≈ 0.24% for n=200, m=65536, k=4 — assert well under 5%)."""
    from alerta_spark.ops.sketches import bloom_build, bloom_probe

    seen = spark.range(200).select(
        F.concat(F.lit("item-"), F.col("id")).alias("v")
    )
    unseen = spark.range(1000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("v")
    )
    bloom = bloom_build(seen, "v")
    hits_seen = bloom_probe(bloom, seen, "v").where("maybe_member").count()
    assert hits_seen == 200
    fp = bloom_probe(bloom, unseen, "v").where("maybe_member").count()
    assert fp <= 50


def test_bloom_shard_merge_is_lossless(spark):
    """bit_or-merging per-shard filters == building one filter over
    the union — the property that makes the filter an incremental
    per-shard summary like CMS."""
    from alerta_spark.ops.sketches import bloom_build

    a = spark.createDataFrame([("p",), ("q",)], ["v"])
    b = spark.createDataFrame([("q",), ("r",)], ["v"])
    merged = (
        bloom_build(a, "v").unionByName(bloom_build(b, "v"))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    oneshot = bloom_build(a.unionByName(b), "v")
    m = {(r["word"], r["bits"]) for r in merged.collect()}
    o = {(r["word"], r["bits"]) for r in oneshot.collect()}
    assert m == o


def test_hll_shard_merge_is_lossless(spark):
    """Register max over shard sketches == one-shot registers, so the
    sketch composes incrementally like CMS/Bloom."""
    from alerta_spark.ops.sketches import hll_build, hll_merge

    full = spark.range(500).select(F.col("id").cast("string").alias("v"))
    a = full.where(F.col("v").cast("long") % 2 == 0)
    b = full.where(F.col("v").cast("long") % 2 == 1)
    merged = hll_merge(hll_build(a, "v"), hll_build(b, "v"))
    oneshot = hll_build(full, "v")
    m = {(r["bucket"], r["mreg"]) for r in merged.collect()}
    o = {(r["bucket"], r["mreg"]) for r in oneshot.collect()}
    assert m == o


def test_hll_raw_branch_accuracy(spark):
    """Above the linear-counting cutoff (2.5m = 640) the raw harmonic
    estimator engages; HLL's error bound for m=256 is ~1.04/sqrt(m) =
    6.5% — allow 3 sigma."""
    from alerta_spark.ops.sketches import hll_build, hll_estimate

    n = 50_000
    items = spark.range(n).select(F.col("id").cast("string").alias("v"))
    row = hll_estimate(hll_build(items, "v")).collect()[0]
    assert row["v_zero"] == 0 or row["n_distinct_est"] > 640
    assert abs(row["n_distinct_est"] - n) / n < 0.20


def test_hll_small_range_uses_linear_counting(spark):
    """Tiny cardinalities take the literal-table m*ln(m/V) branch and
    are near-exact there."""
    import math

    from alerta_spark.ops.sketches import HLL_M, hll_build, hll_estimate

    items = spark.range(10).select(F.col("id").cast("string").alias("v"))
    row = hll_estimate(hll_build(items, "v")).collect()[0]
    assert row["v_zero"] == HLL_M - 10  # no bucket collisions at n=10 likely
    expect = HLL_M * math.log(HLL_M / row["v_zero"])
    assert row["n_distinct_est"] == expect


def test_histogram_shard_merge_and_error_bound(spark):
    """Sum-merging shard histograms == one-shot; every estimate is
    within one bucket width above the true discrete quantile."""
    from alerta_spark.ops.sketches import histogram_build, histogram_quantiles

    full = spark.range(1, 10_001).select(
        (F.col("id") * 7 % 100_000).alias("vq")
    )
    a = full.where(F.col("id") % 2 == 0)
    b = full.where(F.col("id") % 2 == 1)
    merged = (
        histogram_build(a, "vq").unionByName(histogram_build(b, "vq"))
        .groupBy("bucket").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    oneshot = histogram_build(full, "vq")
    assert {(r["bucket"], r["cnt"]) for r in merged.collect()} == {
        (r["bucket"], r["cnt"]) for r in oneshot.collect()
    }

    vals = sorted(r["vq"] for r in full.collect())
    for r in histogram_quantiles(oneshot, [50, 90, 99], shift=7).collect():
        true_q = vals[r["rank_k"] - 1]
        assert 0 <= r["est_q"] - true_q < (1 << 7) + (1 << 7)
        # upper edge of the k-th value's bucket: est >= true always
        assert r["est_q"] >= true_q


def test_hll_portable_rollup_incremental_and_replay(spark, tmp_path, events):
    """Two-batch maintenance == one-shot build, and replaying a batch
    changes nothing (register max is idempotent — at-least-once safe
    with NO dedup ledger)."""
    from alerta_spark.ops.sketches import (
        hll_build,
        hll_estimate,
        maintain_hll_portable_rollup,
        read_hll_portable_rollup,
    )

    path = str(tmp_path / "hll_store")
    cut = events.selectExpr("percentile(event_id, 0.5)").collect()[0][0]
    a = events.where(F.col("event_id") <= cut)
    b = events.where(F.col("event_id") > cut)
    maintain_hll_portable_rollup(spark, path, a)
    maintain_hll_portable_rollup(spark, path, b)
    got = {
        (str(r["day"]), r["event_type"]): (r["s_exact"], r["n_distinct_est"])
        for r in read_hll_portable_rollup(spark, path).collect()
    }
    oneshot = hll_estimate(
        hll_build(
            events.select(
                F.col("ts").cast("date").alias("day"), "event_type", "user_id"
            ),
            "user_id",
            ["day", "event_type"],
        ),
        ["day", "event_type"],
    )
    want = {
        (str(r["day"]), r["event_type"]): (r["s_exact"], r["n_distinct_est"])
        for r in oneshot.collect()
    }
    assert got == want

    maintain_hll_portable_rollup(spark, path, a)  # replay
    again = {
        (str(r["day"]), r["event_type"]): (r["s_exact"], r["n_distinct_est"])
        for r in read_hll_portable_rollup(spark, path).collect()
    }
    assert again == want


def test_stream_hll_monitor_matches_batch_face(spark, tmp_path, events):
    """Two file waves through the streaming face == one-shot batch
    registers/estimates over the union."""
    import os

    from pyspark.sql import types as T

    from alerta_spark.ops.sketches import (
        hll_build,
        hll_estimate,
        read_hll_portable_rollup,
        stream_hll_distinct_monitor,
    )

    inp = tmp_path / "in"
    os.makedirs(inp)
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    ev = events.select("ts", "user_id", "event_type", "event_id")
    cut = ev.selectExpr("percentile(event_id, 0.5)").collect()[0][0]

    def wave(name, frame):
        frame.select("ts", "user_id", "event_type").coalesce(1).write.mode(
            "overwrite"
        ).json(str(tmp_path / ("stage_" + name)))
        import glob
        import shutil

        src = glob.glob(str(tmp_path / ("stage_" + name) / "part-*.json"))[0]
        shutil.copy(src, inp / (name + ".json"))
        q = stream_hll_distinct_monitor(spark, str(inp), store, ck, schema)
        q.awaitTermination(120)

    wave("a", ev.where(F.col("event_id") <= cut))
    wave("b", ev.where(F.col("event_id") > cut))

    got = {
        (str(r["day"]), r["event_type"]): (r["s_exact"], r["n_distinct_est"])
        for r in read_hll_portable_rollup(spark, store).collect()
    }
    oneshot = hll_estimate(
        hll_build(
            ev.select(
                F.col("ts").cast("date").alias("day"), "event_type", "user_id"
            ),
            "user_id",
            ["day", "event_type"],
        ),
        ["day", "event_type"],
    )
    want = {
        (str(r["day"]), r["event_type"]): (r["s_exact"], r["n_distinct_est"])
        for r in oneshot.collect()
    }
    assert got == want


def test_stream_histogram_monitor_matches_batch(spark, tmp_path, events):
    """Two file waves == one-shot histogram; quantile estimates over
    the streamed store equal those over the one-shot build."""
    import os

    from pyspark.sql import types as T

    from alerta_spark.ops.sketches import (
        histogram_build,
        histogram_quantiles,
        read_histogram_rollup,
        stream_histogram_monitor,
    )

    inp = tmp_path / "hin"
    os.makedirs(inp)
    store = str(tmp_path / "hstore")
    ck = str(tmp_path / "hck")
    schema = T.StructType(
        [
            T.StructField("value", T.DoubleType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    ev = events.select("value", "event_id")
    cut = ev.selectExpr("percentile(event_id, 0.5)").collect()[0][0]

    def wave(name, frame):
        import glob
        import shutil

        frame.coalesce(1).write.mode("overwrite").json(
            str(tmp_path / ("hstage_" + name))
        )
        src = glob.glob(str(tmp_path / ("hstage_" + name) / "part-*.json"))[0]
        shutil.copy(src, inp / (name + ".json"))
        q = stream_histogram_monitor(spark, str(inp), store, ck, schema)
        q.awaitTermination(120)

    wave("a", ev.where(F.col("event_id") <= cut))
    wave("b", ev.where(F.col("event_id") > cut))

    got_hist = {
        (r["bucket"], r["cnt"])
        for r in read_histogram_rollup(spark, store).collect()
    }
    oneshot = histogram_build(
        ev.selectExpr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS vq"),
        "vq",
    )
    want_hist = {(r["bucket"], r["cnt"]) for r in oneshot.collect()}
    assert got_hist == want_hist

    got_q = {
        (r["q_pct"], r["est_q"])
        for r in histogram_quantiles(
            read_histogram_rollup(spark, store), [50, 99]
        ).collect()
    }
    want_q = {
        (r["q_pct"], r["est_q"])
        for r in histogram_quantiles(oneshot, [50, 99]).collect()
    }
    assert got_q == want_q


def test_compact_histogram_rollup_preserves_totals(spark, tmp_path):
    from alerta_spark.ops.sketches import (
        compact_histogram_rollup,
        maintain_histogram_rollup,
        read_histogram_rollup,
    )

    store = str(tmp_path / "hcstore")
    a = spark.range(1, 500).select(F.col("id").alias("vq"))
    b = spark.range(300, 900).select(F.col("id").alias("vq"))
    maintain_histogram_rollup(spark, store, a, "vq")
    maintain_histogram_rollup(spark, store, b, "vq")
    before = {
        (r["bucket"], r["cnt"])
        for r in read_histogram_rollup(spark, store).collect()
    }
    n = compact_histogram_rollup(spark, store)
    after = {
        (r["bucket"], r["cnt"])
        for r in read_histogram_rollup(spark, store).collect()
    }
    assert after == before and n == len(before)
