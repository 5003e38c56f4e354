"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "s1_criteria_scan",
    "a1_mostcommon",
    "a2_threshold_trigger",
    "c7_threshold_alert_render",
    "s7_emission_readback",
    "a5_topk_per_group",
    "f8_dedup_antijoin",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "join_revenue_by_nation",
    "semi_join_building_orders",
    "subquery_correlated_small_qty",
    "subquery_in_large_orders",
    "asof_join_latest_order",
    "text_quality_score",
    "text_redact_pii",
    "rollup_incremental_hourly",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "multimodal_features",
    # round-2 additions (no r01 baseline; tracked from r02 on)
    "t2_hop_window_counts",
    "split_train_eval_test",
    "dedup_embedding_lsh",
    "pipeline_clean_corpus",
    "t3_sequence_correlator",
    "chunk_documents",
    "pack_sequences",
    "vocab_top_terms",
    "text_repetition_stats",
    "tpch_q10_returned_items",
    "decontaminate_train_split",
    "corpus_composition_stats",
    "sessionize_events",
    "funnel_signup_view_purchase",
    # round-3 additions (no earlier baseline; tracked from r03 on)
    "text_unigram_nll",
    "text_token_entropy",
    "tpch_q21_waiting_supplier",
    "text_tfidf_top_terms",
    "dedup_winnow_pairs",
    "anomaly_zscore_events",
    "corpus_length_buckets",
    # round-3 batch 3 (no earlier baseline; tracked from r03 on)
    "text_bm25_topk",
    "text_bigram_nll",
    "corpus_drift_jsd",
    "split_leakage_containment",
    "agg_cube_event_day",
    "cohort_retention_weekly",
    "hybrid_retrieval_rerank",
    "timeseries_ffill_daily",
    "path_top_user_journeys",
    # round-3 batch 6 (no earlier baseline; tracked from r03 on)
    "dedup_frequent_lines",
    "sketch_bloom_dedup_probe",
    "decontaminate_embedding_cos",
    "dedup_fuzzy_levenshtein",
    "text_phrase_search",
    # round-3 batch 7 (no earlier baseline; tracked from r03 on)
    "dedup_containment",
    "dedup_semantic_clusters",
    "dsir_select_target_domain",
    "sketch_hll_distinct_users",
    # round-3 batch 8 (no earlier baseline; tracked from r03 on)
    "clustering_kmeans_pinned",
    "embedding_int8_quant_report",
    "records_golden_user_profile",
    # round-3 batch 9 (no earlier baseline; tracked from r03 on)
    "pipeline_entity_resolution",
    "anomaly_seasonal_residual",
    "sketch_histogram_quantiles",
    # round-3 batch 10 (no earlier baseline; tracked from r03 on)
    "streak_longest_daily_activity",
    "users_rfm_scores",
    "events_markov_transitions",
    "pareto_customer_revenue",
    # round-3 batch 17 (no earlier baseline; tracked from r03 on)
    "cep_not_followed_by",
    "twa_user_daily_value",
    # round-3 final batches (no earlier baseline; tracked from r03 on)
    "scd2_point_in_time_join",
    "stats_ks_two_sample",
    "inventory_running_balance_floor",
    "similarity_pq_pinned",
    "text_kwic_snippets",
    # round-4 additions (no earlier baseline; tracked from r04 on)
    "tpch_q17_small_qty_revenue",
    "tpch_q22_global_sales_opportunity",
    "trend_mann_kendall_daily",
    "trend_theil_sen_daily",
    "events_burstiness_fano",
    "orders_fill_rate_monthly",
    "quality_expectations_report",
    "embedding_pca_power_pinned",
    "km_time_to_purchase",
    "sessions_episode_pairs",
    "basket_brand_lift",
    "bpe_learn_merges_pinned",
    # round-4 batch 2 (no earlier baseline; tracked from r04 on)
    "features_user_snapshot",
    "sample_negative_pairs",
    "graph_triangle_stats",
    "features_target_encoding_loo",
    "split_temporal_embargo",
    "stats_cohens_kappa",
    "attribution_time_decay",
    "text_rake_keyphrases",
    "abtest_bh_fdr",
    "stats_mann_whitney_u",
    "graph_link_prediction_aa",
    "recs_item_item_cosine",
    "abtest_diff_in_diff",
    "classifier_calibration_bins",
    "features_woe_iv",
    "abtest_sprt_sequential",
    "labels_churn_horizon",
    "features_psi_drift",
    "retrieval_ndcg_eval",
    "privacy_t_closeness",
    "bandit_ucb_scores",
    "text_textrank_sentences",
    "process_transition_latency",
    "forecast_backtest_mape",
    "stats_join_cardinality",
    "corpus_source_ablation",
    "abtest_uplift_by_band",
    "features_quantile_transform",
    "embedding_lof_outliers",
    "stats_permutation_test",
    "text_good_turing",
    "anomaly_dow_median_residual",
    "forecast_holt_linear",
    "privacy_dp_noised_counts",
    "events_entropy_rate",
    "multimodal_frame_schedule",
    "stats_spearman_corr",
    "cohort_ltv_curves",
    "layout_compaction_bins",
    "sample_kcenter_coreset",
    "recs_als_rank1_pinned",
    "corpus_source_overlap_matrix",
    "finance_duplicate_payment_screen",
    "sketch_kmv_distinct_users",
    "stats_brown_forsythe",
    "events_mix_shift_decomposition",
    "text_term_dispersion",
    "rules_cofire_matrix",
    "funnel_max_depth_window",
    "supply_bullwhip_ratio",
    "timeseries_haar_energy",
    "text_kneser_ney_bigrams",
    "sessions_expected_steps_to_purchase",
    "events_evt_tail_index",
    "parts_abc_xyz_classification",
    "clustering_silhouette_pinned",
    "orders_otif_service_level",
    "text_readability_scores",
    "graph_kcore_brands",
    "corpus_greedy_source_cover",
    "layout_skipping_effectiveness",
    "privacy_generalization_ladder",
    "stats_mcnemar_langid",
    "orders_seasonal_index_monthly",
    "users_power_curve",
    "text_char_entropy",
    "events_next_event_prediction_eval",
    "users_segment_migration_matrix",
    "abtest_effect_size_cohens_d",
    "corpus_quality_buckets_ccnet",
    "timeseries_variance_ratio",
    "graph_assortativity_brands",
    "users_bot_regularity_screen",
    "rules_threshold_sweep_volume",
    "stats_trimmed_winsorized_value",
    "bandit_offpolicy_ips",
    "graph_pagerank_brands",
    "dedup_lsh_collision_curve",
    "labels_confident_noise_screen",
    "ml_conformal_interval",
    "attribution_shapley_channels",
    "stats_kendall_tau_daily",
    "timeseries_xcorr_lag",
    "classifier_auc_roc",
    "sketch_kmv_set_ops",
    "forecast_holt_winters_weekly",
    "users_value_theil",
    "quality_freshness_sla",
    "stats_poisson_rate_test",
    "stats_runs_test_daily",
    "stats_cramers_v",
    "text_burrows_delta",
    "survival_logrank_abtest",
    "stats_anova_f_value_by_type",
    "stats_cochran_armitage_activity",
    "stats_grubbs_daily_value",
    "embedding_jl_projection",
    "embedding_triplet_mining",
    "revenue_retention_ndr",
    "timeseries_seasonal_strength",
    "attribution_position_u",
    "drift_page_hinkley_daily",
    "text_dunning_llr",
    "attribution_markov_removal",
    "spectral_weekly_power",
    "orders_price_index_monthly",
    "recs_coverage_diversity",
    "sessions_peak_concurrency_daily",
    "supply_safety_stock_z",
    "abtest_srm_check",
    "stats_welch_t_weekend",
    "changepoint_binseg_daily",
    "stats_jonckheere_terpstra",
    "diagnostics_join_key_skew",
    "text_lm_heldout_perplexity",
    "revenue_bridge_monthly",
    "slo_apdex_daily",
    "users_dau_mau_stickiness",
    "spc_ewma_control_chart",
    "agg_grouping_sets_mixed",
    "asof_join_next_shipment",
    "anomaly_benford_chi2",
    "security_odd_hours_screen",
    "security_first_seen_spike",
    "setop_power_user_segments",
    "unpivot_daily_type_metrics",
    "graph_khop_recursive_cte",
    "forecast_croston_intermittent",
    "split_allocation_neyman",
    "orders_trading_day_adjusted_growth",
    "supply_eoq_classic",
    "timeseries_max_drawdown_daily",
    "events_type_mix_entropy_daily",
    "privacy_pii_inventory_by_source",
    "embedding_quality_screen",
    "abtest_mde_planner",
    "dedup_cluster_cohesion_audit",
    "stats_ljung_box_daily",
    "timeseries_hurst_rs_pinned",
    "multimodal_ahash_near_pairs",
    "stats_sign_test_wow",
    "stats_cramer_von_mises",
    "stats_kuiper_hour_of_day",
    "timeseries_wasserstein_wow",
    # round-5 additions (no earlier baseline; tracked from r05 on)
    "dedup_simhash",
    "similarity_pq_topk",
    "similarity_ivf_partitioned",
    # round 9: the blocked plan took over the production name
    # `embedding_triplet_mining` (tracked above); this slot keeps the
    # demoted broadcast form measurable under its explicit alias
    "embedding_triplet_mining_broadcast",
    "t3_sequence_correlator_fused",
]

# Canary normalization (round 9): this host swings ±40% run to run
# (BASELINE.md's same-commit 1.3-1.45x uniform band), which burned
# three rounds of watch items on noise. These ten queries are pinned
# plan-stable shapes (scan+filter, hash agg, broadcast/shuffle joins,
# window, Arrow UDF, text codegen, LSH banding) whose code hasn't
# changed since the r02 methodology-clean record; the values are
# their BENCH_r02.json per-query seconds at sf0.1/32 cpus. The median
# of (current / r02) over the set estimates host load this run;
# each query's normalized time = raw / that factor. A REAL regression
# moves one query against the canary median; host load moves the
# median itself. Raw stays the official metric — normalized columns
# exist so a verdict can separate plan regressions from host load
# without re-running quiet.
CANARY_R02 = {
    "s1_criteria_scan": 0.7892,
    "tpch_q1_pricing_summary": 1.1457,
    "tpch_q3_shipping_priority": 1.7025,
    "join_revenue_by_nation": 1.8843,
    "subquery_in_large_orders": 1.5564,
    "asof_join_latest_order": 1.4399,
    "text_quality_score": 2.506,
    "rollup_incremental_hourly": 1.0685,
    "dedup_minhash_lsh": 5.0547,
    "similarity_cosine_topk": 1.0538,
}


def _host_factor(timings: dict[str, float]) -> tuple[float, dict[str, float]]:
    """Median current/r02 ratio over the canary set (1.0 when the run
    isn't comparable: different sf, missing canaries)."""
    ratios = {
        n: round(timings[n] / r, 4)
        for n, r in CANARY_R02.items()
        if n in timings and timings[n] > 0
    }
    if len(ratios) < len(CANARY_R02) // 2 + 1:
        return 1.0, ratios
    vals = sorted(ratios.values())
    mid = len(vals) // 2
    med = vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2
    return round(med, 4), ratios


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from alerta_spark.plans import catalog
    from alerta_spark.session import get_spark

    spark = get_spark(
        "alerta-bench",
        master=f"local[{cpus}]" if cpus else "local[*]",
        shuffle_partitions=int(cpus) if cpus else (os.cpu_count() or 8),
    )

    qs = catalog.queries()
    names = [n for n in HEADLINE if n in qs]
    # warm the JVM + parquet footers with the cheapest query, and the
    # Python-worker pool (Arrow/pandas-UDF paths pay daemon startup once)
    qs[names[0]](spark, sf_dir).count()
    from pyspark.sql import functions as F

    spark.range(100).select(
        F.pandas_udf(lambda s: s + 1, "long")(F.col("id"))
    ).count()

    # noop sink, NOT count(): count() lets Catalyst prune every column a
    # map-only query computes, so regex/decode work would be skipped and
    # the timing would measure only the scan. The noop writer evaluates
    # every output column and discards rows executor-side.
    # persisted intermediates (shingle frames, banding frames) stay
    # cached ACROSS queries on purpose: Spark's cache manager matches
    # identical logical plans, so the dedup family legitimately shares
    # one shingle materialization — releasing between EVERY query was
    # measured NET-NEGATIVE (minhash 3.6s -> 6.4s vs ~5s saved
    # elsewhere). 128 GiB storage comfortably holds the sf0.1 frames.
    # SPARK_GRAFT_BENCH_RELEASE=N (0=never) clears the cache every N
    # queries — the bench-hygiene knob for measuring whether cache/plan
    # accumulation across a 200+-query session drifts later entries
    # (the `pareto_customer_revenue` creep investigation, round 5).
    release_every = int(os.environ.get("SPARK_GRAFT_BENCH_RELEASE", "0"))
    timings: dict[str, float] = {}
    # wall-clock offset of each query's start (seconds since the loop
    # began): the round-10 closing benches showed host stalls landing
    # on CONTIGUOUS WINDOWS of consecutive queries — with offsets in
    # the detail file, a stall window is locatable post-hoc instead of
    # reading as per-query regressions. Detail-file-only; the stdout
    # contract line is unchanged.
    offsets: dict[str, float] = {}
    # bytes NEWLY cached while each query ran (storage level, mem +
    # disk): family bench entries are dominated by shared-cache
    # materialization landing on whichever member runs first — this
    # makes that first-touch cost attributable post-hoc. Additive,
    # detail-file-only; query order and the timed region unchanged.
    storage_delta: dict[str, int] = {}

    def _cached_bytes() -> int:
        try:
            infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            return int(sum(i.memSize() + i.diskSize() for i in infos))
        except Exception:
            return -1

    loop_t0 = time.perf_counter()
    for i, name in enumerate(names):
        if release_every and i and i % release_every == 0:
            from alerta_spark.ops.dedupe import release_cached

            release_cached()
            spark.catalog.clearCache()
        pre_bytes = _cached_bytes()
        t0 = time.perf_counter()
        offsets[name] = round(t0 - loop_t0, 2)
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        post_bytes = _cached_bytes()
        if pre_bytes >= 0 and post_bytes >= 0:
            storage_delta[name] = post_bytes - pre_bytes

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # canary columns only make sense against the r02 conditions
    comparable = sf_val == 0.1
    factor, canary_ratios = (
        _host_factor(timings) if comparable else (1.0, {})
    )
    normalized = {n: round(t / factor, 4) for n, t in timings.items()}
    total_norm = round(sum(normalized.values()), 4)
    # Per-query detail goes to a file: at 79+ queries the detail dict
    # overflows the driver's stdout tail window and the round's official
    # record ends up unparseable (BENCH_r03 "parsed": null). The stdout
    # line stays compact so the LAST line is always complete JSON.
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": timings,
                "sf": sf_val,
                "host_factor": factor,
                "canary_ratios": canary_ratios,
                "value_normalized": total_norm,
                "queries_normalized": normalized,
                "query_t_offset": offsets,
                "storage_delta": storage_delta,
            },
            indent=1,
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf_val,
                "host_factor": factor,
                "value_normalized": total_norm,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
