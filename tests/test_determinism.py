"""Cross-parallelism determinism: the correctness gate hashes values at
FULL float precision, so every query must produce bit-identical results
regardless of partition count or input layout — accumulation-order-
sensitive float math would break this. These tests rerun the most
float-sensitive catalog queries under a different shuffle-partition
count and a repartitioned lineage and require identical rows."""

import math

from alerta_spark.plans import catalog

SF = "/root/testdata/sf0.001"

QUERIES = [
    "w_running_agg_lag",        # decimal-accumulated running sums
    "agg_stats_moments",        # decimal-carried variance numerator
    "text_unigram_nll",         # fixed-point quantized ln
    "text_token_entropy",       # fixed-point quantized ln
    "corpus_composition_stats", # share divisions
    "text_tfidf_top_terms",     # BIGINT ranking key, top-k cut
]


def _rows(spark, name):
    from alerta_spark.ops.dedupe import release_cached

    df = catalog.queries()[name](spark, SF)
    out = sorted(
        tuple(None if isinstance(v, float) and math.isnan(v) else v for v in r)
        for r in df.collect()
    )
    release_cached()
    return out


def test_float_queries_stable_across_shuffle_partitions(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        base = {n: _rows(spark, n) for n in QUERIES}
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for n in QUERIES:
            assert _rows(spark, n) == base[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
