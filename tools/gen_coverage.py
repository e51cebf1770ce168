#!/usr/bin/env python
"""Regenerate COVERAGE.md — the SURVEY.md §2.5 inventory → implementation map."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SECTIONS = [
    ("Scans / projections / filters", ["scan_project", "filter_pred", "filter_not_blank", "filter_null_safe_eq"]),
    ("Per-record transforms (reference operators)", [
        "cmf_translate_geotab", "cmf_translate_calamp", "cmf_translate_ford",
        "event_translate_payment", "event_translate_user", "event_translate_order",
        "event_translate_inventory", "event_translate_shipment",
        "route_tenant", "route_event_type_split", "ts_normalize", "enum_normalize",
        "json_extract", "json_multi_extract", "json_variant", "cmf_variant_residue",
    ]),
    ("Joins", [
        "join_inner_equi", "join_left", "join_right", "join_full", "join_broadcast",
        "join_semi", "join_anti", "join_theta_range", "join_range_banded", "join_cross", "join_broadcast_left", "join_asof",
    ]),
    ("Aggregations", [
        "agg_group_sum_avg_min_max_count", "agg_count_distinct",
        "agg_approx_count_distinct", "agg_percentile", "agg_rollup", "agg_cube",
        "agg_grouping_sets", "agg_filtered", "agg_collect", "agg_pivot",
        "agg_salted_skew", "agg_variance_stddev", "agg_max_min_by", "agg_bool", "agg_histogram", "agg_first_per_day",
        "unpivot_melt",
    ]),
    ("Window functions", [
        "win_rank_rownum_denserank", "win_lag_lead", "win_frame_rows",
        "win_frame_range", "win_topk_per_group", "win_distribution", "win_first_last", "win_nth_value", "warehouse_vehicle_gaps",
    ]),
    ("Sorts / limits / set ops", [
        "sort_limit_topk", "union_all", "union_distinct", "union_schema_evolution", "set_intersect", "set_except",
    ]),
    ("Scalar function families", [
        "string_funcs", "string_regexp_groups", "string_split_part", "datetime_funcs", "math_funcs", "array_funcs", "array_set_ops",
        "explode_arrays", "explode_variants", "map_funcs", "misc_funcs", "bitwise_funcs", "error_safe_funcs", "sample_deterministic",
    ]),
    ("Streaming semantics (batch-checkable forms)", [
        "stream_tumbling_agg", "stream_sliding_agg", "stream_session_window",
        "stream_dedup", "stream_watermark_late", "stateful_transitions",
    ]),
    ("Composite / events-array analytics", [
        "fleet_dashboard", "cmf_events_explode", "cmf_tire_pressure_map",
        "events_funnel", "events_cohort_retention", "events_sessionize",
        "ts_ewma", "table_profile", "events_rfm_segments", "events_anomaly_zscore",
    ]),
    ("Statistical / time-series analytics", [
        "agg_stats_corr", "agg_regr_slope", "agg_skew_kurtosis", "agg_mode",
        "ts_resample_15m", "ts_gapfill_15m", "ts_rollup_multires",
        "sample_stratified", "join_salted_skew", "layout_zorder_key",
        "agg_entropy", "agg_winsorized_mean",
    ]),
    ("Information retrieval / sequence mining", [
        "text_inverted_index", "text_tfidf_topk", "text_zipf_slope",
        "text_passage_dedup", "text_js_divergence", "emb_norm_stats", "emb_dim_stats",
        "emb_pca_power",
        "events_path_topk",
    ]),
    ("Geo / telemetry analytics", [
        "telemetry_trip_distance", "telemetry_trip_summary", "udf_pandas_haversine",
    ]),
    ("LLM data pipeline: dedup", [
        "dedup_exact", "dedup_keep_best", "dedup_fingerprint", "dedup_ngram_jaccard", "dedup_minhash",
        "dedup_minhash_banded", "dedup_minhash_fast", "dedup_cluster_components", "dedup_cluster_lss", "text_minhash_signature",
        "dedup_simhash", "dedup_embedding_cosine", "dedup_embedding_blas",
    ]),
    ("LLM data pipeline: similarity search", ["sim_search_knn", "sim_search_lsh", "sim_search_lsh_multiprobe",
        "sim_search_ivf", "emb_centroid_by_label", "emb_quantize_int8"]),
    ("LLM data pipeline: text analysis", [
        "text_stats", "text_quality_score", "text_token_count", "text_lang_id",
        "text_tokenize_filter", "text_levenshtein_pairs", "text_chunk_documents", "text_ngram_freq", "text_pii_scrub",
        "text_decontaminate", "text_gopher_quality", "text_repetition_ratios", "text_unigram_logprob", "text_df_prune", "corpus_curate",
    ]),
    ("LLM data pipeline: corpus assembly", [
        "corpus_split_train", "corpus_pack_sequences", "corpus_mix_domains",
        "corpus_assemble",
    ]),
    ("LLM data pipeline: multimodal", ["multimodal_features", "multimodal_resize", "multimodal_frame_sample", "multimodal_audio_chunks"]),
    ("Sketches (mergeable, deterministic-hash)", [
        "sketch_countmin", "sketch_bloom_build", "sketch_hll_portable", "join_bloom_pruned",
    ]),
    ("Relational warehouse (TPC-H shapes)", [
        "tpch_pricing_summary", "tpch_revenue_by_region", "tpch_top_orders",
        "tpch_market_share", "tpch_order_priority", "agg_weighted_avg",
        "win_running_distinct",
    ]),
    ("Event-journey mining II", [
        "events_markov_transitions", "events_attribution_last_touch",
        "events_dwell_percentiles", "events_ltv_percentiles",
        "win_streaks", "events_pareto_share",
    ]),
    ("Time-series ML features", [
        "ts_lag_features", "ts_outlier_mad", "ts_cusum_drift",
        "ts_seasonal_profile",
    ]),
    ("Corpus hygiene text mining", [
        "text_line_dedup", "text_winnowing", "text_bpe_corpus_prep",
        "text_vocab_coverage", "text_code_detect",
    ]),
    ("Corpus assembly II", [
        "corpus_token_budget", "corpus_dedup_report", "corpus_shard_assign",
    ]),
    ("Geospatial analytics", ["geo_grid_density", "geo_nearest_poi"]),
    ("In-plan ML primitives", ["emb_kmeans_lloyd", "emb_pq_encode", "emb_residual_quantize"]),
    ("Relational warehouse II: the full TPC-H dash (round 5)", [
        "tpch_min_cost_supplier", "tpch_small_qty_revenue", "tpch_parts_promo",
        "tpch_global_sales_opportunity", "tpch_customer_distribution",
        "tpch_returned_items", "tpch_promo_revenue", "tpch_top_supplier",
        "tpch_large_orders", "tpch_disjunctive_pred", "tpch_waiting_suppliers",
        "tpch_nation_volume", "tpch_product_profit", "tpch_important_stock",
        "tpch_forecast_revenue", "tpch_shipmode_priority",
        "tpch_supplier_part_count", "tpch_fulfillment_latency",
        "win_topk_ties_qualify", "win_mom_growth", "win_yoy_growth",
        "win_cumulative_share",
    ]),
    ("Warehouse data management (round 5)", [
        "scd2_point_in_time", "table_snapshot_diff", "warehouse_merge_upsert",
        "dq_orphan_check", "dq_constraint_audit", "graph_hierarchy_closure",
    ]),
    ("Event-journey mining III (round 5)", [
        "events_attribution_position", "events_time_to_convert",
        "events_user_overlap_jaccard", "ts_autocorr", "win_range_interval_1h",
        "join_asof_tolerance", "join_asof_nearest",
    ]),
    ("IR ranking & corpus contrast (round 5)", [
        "text_bm25_topk", "text_keyness_loglik", "text_ppl_buckets",
        "dedup_url_canonical", "text_dedup_survivorship", "corpus_lang_balance",
        "corpus_domain_caps", "text_langid_confusion", "dedup_cross_source",
    ]),
    ("Sketches & sampling II (round 5)", [
        "sketch_hll_merge", "sample_reservoir_hash",
    ]),
    ("Embedding evaluation (round 5)", [
        "sim_search_recall_eval", "emb_label_affinity", "emb_prefix_recall",
        "emb_whiten_stats", "emb_prototypes_per_label",
    ]),
    ("Graph analytics (round 5+)", [
        "graph_pagerank", "graph_degree_stats", "graph_triangle_count",
        "graph_kcore", "graph_bfs_hops",
        "graph_label_propagation", "graph_jaccard_linkpred",
        "graph_assortativity", "graph_modularity", "graph_clustering_coeff",
    ]),
    ("Rank statistics & nonparametric tests (round 8)", [
        "stats_mann_whitney", "stats_spearman", "stats_kruskal_wallis",
        "stats_anova_oneway", "stats_fdr_bh", "stats_permutation_pvalue",
        "stats_tukey_outliers", "stats_qq_deciles", "stats_ks_uniform",
        "agg_gini", "agg_theil_index", "agg_bootstrap_ci",
    ]),
    ("Ranking & classifier metrics II (round 8)", [
        "ml_ndcg_at_k", "ml_mrr", "ml_log_loss", "ml_lift_deciles",
        "ml_average_precision", "ml_best_f1_threshold", "ml_cohen_kappa",
        "ml_mutual_info",
    ]),
    ("Corpus & text analysis III (round 8)", [
        "text_pmi_collocations", "text_token_entropy", "text_hashed_features",
        "text_readability_flesch", "corpus_importance_weights",
        "corpus_dedup_savings", "corpus_novelty_curve", "corpus_seq_len_profile",
    ]),
    ("Similarity search & embedding audit II (round 8)", [
        "sim_search_mmr", "emb_triplet_margin",
    ]),
    ("Time-series & monitoring II (round 8)", [
        "ts_holt_smooth", "ts_periodogram_bin", "ts_downsample_lttb",
        "events_burst_days", "events_anomaly_ewma_band",
        "events_concurrency_sweep", "events_dau_wau", "dq_freshness",
        "exp_sprt_boundary", "sketch_ams_f2", "geo_kde_grid",
    ]),
    ("Warehouse metadata ops (round 8)", [
        "warehouse_zone_map_prune", "warehouse_clustering_depth",
    ]),
    ("Variance tests, power analysis & outlier audit (round 10)", [
        "stats_welch_ttest", "stats_levene_brown_forsythe", "exp_power_mde",
        "privacy_t_closeness", "emb_outlier_mahalanobis_diag",
        "multimodal_dedup_bytes",
    ]),
    ("Distribution audits, confusion metrics & containment dedup (round 11)", [
        "stats_benford_digits", "stats_jarque_bera", "ml_matthews_corr",
        "events_bounce_rate", "dedup_containment", "stats_cramers_v",
        "ml_expected_calibration_error", "dedup_boundary_overlap",
        "dedup_containment_banded", "agg_hhi_concentration",
        "stats_grubbs_outlier", "corpus_quality_filter_funnel",
        "ml_ks_separation", "ts_mk_trend", "stats_runs_test",
    ]),
    ("Heavy hitters, effect sizes & ensemble containment (round 11, session 3)", [
        "dedup_containment_lshensemble", "sketch_heavy_hitters",
        "stats_cohens_d", "stats_wilcoxon_signed_rank",
        "win_ntile_percent_cume",
    ]),
    ("Nonparametric trio, regression scorecard, skyline & profiling (round 11, session 4)", [
        "stats_kendall_tau", "stats_logrank_test", "stats_friedman",
        "ml_regression_metrics", "rank_skyline_2d", "dq_null_profile",
        "agg_weighted_median",
        "stats_anderson_darling_uniform", "events_circular_hour_stats",
        "stats_theil_u", "graph_closeness_centrality", "ts_hurst_rs",
        "stats_kaplan_meier", "stats_nelson_aalen",
    ]),
    ("Seasonal grid, Brier decomposition, McNemar & IVF sweep (round 11, session 5)", [
        "events_seasonal_dow_hour", "ml_brier_decomposition",
        "stats_mcnemar", "sim_search_ivf_recall_sweep",
    ]),
    ("Cochran's Q, Durbin-Watson, forecast backtest & classical STL (round 11, session 5b)", [
        "stats_cochran_q", "stats_durbin_watson",
        "ts_seasonal_naive_mase", "ts_stl_classical",
    ]),
    ("HITS hubs/authorities & Ljung-Box portmanteau (round 11, session 5c)", [
        "graph_hits", "ts_ljung_box",
    ]),
    ("Cochran-Armitage trend & seasonal independence residuals (round 11, session 5c)", [
        "stats_cochran_armitage", "events_seasonal_residuals",
        "events_entropy_rate", "stats_page_trend", "stats_two_way_anova",
    ]),
    ("Exact & stratified contingency inference (round 12)", [
        "stats_fisher_exact_2x2", "stats_g_test", "stats_bartlett",
        "stats_cmh",
    ]),
    ("Held-out LM scoring & heteroscedasticity (round 12)", [
        "text_trigram_stupid_backoff", "stats_breusch_pagan",
    ]),
    ("Forward as-of join (round 12)", [
        "join_asof_forward",
    ]),
    ("Median test & spectral entropy (round 12)", [
        "stats_mood_median", "ts_spectral_entropy",
    ]),
    ("Partial autocorrelations (round 12)", [
        "ts_pacf_durbin",
    ]),
    ("Temperature-scaled mixture planning (round 12)", [
        "corpus_temperature_mix",
    ]),
    ("k-truss decomposition (round 12)", [
        "graph_ktruss",
    ]),
    ("TOST equivalence (round 12)", [
        "stats_tost_equivalence",
    ]),
    ("Poisson dispersion (round 12)", [
        "stats_poisson_dispersion", "events_interarrival_expon_ks",
    ]),
    ("Sketches & sampling III (round 5)", [
        "sketch_kmv_intersect", "sketch_quantile_logbins", "sample_weighted_kmv",
    ]),
    ("Warehouse data management II (round 5)", [
        "warehouse_incremental_agg", "warehouse_changelog_compact",
        "warehouse_partition_prune_stats",
    ]),
    ("Warehouse depth III: BOM explosion + windowed MERGE (round 6)", [
        "warehouse_bom_rollup", "warehouse_merge_resolve_conflicts",
        "layout_compaction_plan", "warehouse_scd2_from_changelog",
    ]),
    ("Semantic dedup + PQ search (round 6)", [
        "dedup_semantic_cluster", "sim_search_pq_adc",
    ]),
    ("Drift & privacy II (round 6)", [
        "drift_wasserstein", "privacy_l_diversity",
    ]),
    ("Dedup cascade + keyphrases (round 6)", [
        "text_dedup_cascade", "text_keyphrase_rake", "dedup_lsh_recall_eval",
    ]),
    ("Time-series II + bigram LM (round 5)", [
        "ts_interp_linear", "ts_theil_sen", "text_bigram_logprob",
    ]),
    ("Drift monitoring & privacy audit (round 5)", [
        "drift_psi", "drift_ks", "drift_chi2", "privacy_k_anonymity",
    ]),
    ("Interval join + embedding calibration (round 5)", [
        "join_interval_overlap", "emb_cosine_histogram",
    ]),
    ("Record linkage + tenant ops (round 5)", [
        "linkage_blocked_match", "tenant_usage_report",
    ]),
    ("Reconciliation + windowed funnel (round 5)", [
        "dq_reconciliation", "events_conversion_rate_daily",
    ]),
    ("Risk & changepoint analytics (round 5)", [
        "win_drawdown", "ts_changepoint_mean_shift", "events_survival_curve",
        "ts_rolling_median",
    ]),
    ("A/B experimentation analytics (round 5)", [
        "exp_ab_lift", "exp_srm_check", "exp_cuped_adjust", "exp_delta_method_ratio",
    ]),
    ("Spatial clustering (round 5)", [
        "geo_dbscan_grid",
    ]),
    ("Model evaluation in-plan (round 5)", [
        "ml_auc_roc", "ml_calibration_bins", "ml_confusion_threshold",
    ]),
    ("Exact similarity join + association mining (round 5)", [
        "dedup_jaccard_prefix_filter", "basket_frequent_pairs",
    ]),
]

STREAMING_ONLY = [
    ("join_stream_stream", "tests/test_streaming.py::test_stream_stream_join"),
    ("join_stream_static_broadcast", "tests/test_streaming.py::test_stream_static_enrichment_join"),
    ("join_asof_stream", "tests/test_streaming.py::test_stream_asof_join"),
    ("stream_watermark_dedup (runtime)", "tests/test_streaming.py::test_watermark_dedup_stream"),
    ("stream_stateful_flatmap (runtime)", "tests/test_streaming.py::test_stateful_transitions_stream_matches_batch"),
    ("pipeline end-to-end (sources→translate→union→route)", "tests/test_streaming.py::test_pipeline_end_to_end_streaming"),
    ("dead-letter branch", "tests/test_sources_sinks.py::test_dead_letter_stream"),
    ("native exactly-once sink", "tests/test_sources_sinks.py::test_native_sink_exactly_once"),
    ("versioned table layer (snapshot isolation / time travel / CAS commit / vacuum)", "tests/test_versioned.py"),
    ("versioned streaming sink (exactly-once batch-id commits)", "tests/test_versioned.py::test_stream_committer_end_to_end_with_restart"),
    ("streaming drift monitor (per-batch PSI vs frozen reference)", "tests/test_streaming.py::test_streaming_drift_monitor_alerts_on_shift"),
    ("pipeline versioned sink mode (manifest-committed CMF landing)", "tests/test_versioned.py::test_pipeline_versioned_sink_end_to_end"),
    ("streaming dedup cascade (incremental exact→LSH, batch-cut invariant, exactly-once)", "tests/test_streaming_dedup_cascade.py"),
    ("streaming drift monitor KS metric (max CDF gap per batch)", "tests/test_streaming.py::test_streaming_drift_monitor_ks_metric"),
    ("streaming drift monitor W1 metric (earth-mover distance per batch)", "tests/test_streaming.py::test_streaming_drift_monitor_w1_metric"),
    ("metrics export (StreamingQueryListener → JSONL progress/state/observed records)", "tests/test_streaming_metrics.py"),
    ("streaming rate monitor (per-key burst + silence alarm, bounded trail)", "tests/test_streaming.py::test_streaming_rate_monitor_burst_and_silence"),
    ("streaming freshness monitor (per-key event-time lag vs global watermark)", "tests/test_streaming.py::test_streaming_freshness_monitor_flags_lagging_key"),
    ("EventTypeSplitter streaming topology (legacy translate → per-type dynamic sink)", "tests/test_streaming.py::test_event_type_splitter_streaming_e2e"),
    ("streaming HLL maintenance (per-batch register max-merge, replay-idempotent by algebra)", "tests/test_streaming_sketches.py::test_hll_stream_equals_batch_query_any_cut"),
    ("streaming CMS maintenance (per-batch counter add-merge, batch-id replay guard)", "tests/test_streaming_sketches.py::test_cms_stream_equals_batch_query_and_guards_replay"),
    ("streaming MG heavy-hitters maintenance (mergeable summaries, provable undercount bound, batch-id replay guard)", "tests/test_streaming_sketches.py::test_mg_stream_exact_when_vocab_fits_budget_any_cut"),
    ("streaming IVF index maintenance (pinned-centroid cell upkeep, batch-cut equivalent search)", "tests/test_streaming_ivf_index.py"),
    ("streaming sign-LSH ANN index maintenance (incremental bucket upkeep, batch-cut equivalent search)", "tests/test_streaming_ann_index.py"),
    ("streaming column profiler (exact add-merged counts, HLL distinct, MG modal candidates — per-statistic merge algebra)", "tests/test_streaming_profile.py"),
    ("streaming 2-D skyline maintenance (union-monotone closure merge, replay-idempotent by algebra, batch-cut equivalent to rank_skyline_2d)", "tests/test_streaming_skyline.py"),
    ("streaming dow x hour seasonal grid (ADD-merged exact counts/DECIMAL sums behind a batch-id guard + per-cell HLL user registers, cut-exact vs events_seasonal_dow_hour)", "tests/test_streaming_seasonal.py"),
    ("streaming Cochran-Armitage trend monitor (five ADD-merged integer moments, O(1) state — the stream Z^2 equals stats_cochran_armitage BIT-FOR-BIT at any cut)", "tests/test_streaming_trend.py"),
]


def main() -> None:
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    listed = {n for _, names in SECTIONS for n in names}
    missing = sorted(set(queries) - listed)
    unknown = sorted(listed - set(queries))
    assert not unknown, f"COVERAGE lists unimplemented queries: {unknown}"

    lines = [
        "# COVERAGE — declared query inventory → implementation\n",
        "Auto-generated by `tools/gen_coverage.py`. Every row is a key in",
        "`__spark_entry__.queries()`; ✅ = DuckDB oracle hash-check, 📊 = rows-only",
        "(approximate/engine-specific-hash operators, checked for execution + row count).\n",
    ]
    total = with_oracle = 0
    for title, names in SECTIONS:
        lines.append(f"## {title}\n")
        for n in names:
            fn = queries[n]
            mod = fn.__module__.replace("pulsar_ingestion_spark.", "")
            mark = "✅" if n in oracles else "📊"
            total += 1
            with_oracle += n in oracles
            lines.append(f"- {mark} `{n}` — `{mod}.{fn.__name__}`")
        lines.append("")
    lines.append("## Streaming-runtime-only surfaces (tested, not oracle-hashable)\n")
    for name, test in STREAMING_ONLY:
        lines.append(f"- 🌊 {name} — `{test}`")
    lines.append("")
    lines.append(f"**Totals: {total} declared queries, {with_oracle} oracle-checked, "
                 f"{total - with_oracle} rows-only, plus {len(STREAMING_ONLY)} streaming-runtime tests.**")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"{total} queries ({with_oracle} oracle-checked); missing from sections: {missing}")
    if missing:
        # drift gate: a registered query absent from SECTIONS understates
        # COVERAGE.md — fail loudly instead of footnoting
        raise SystemExit(f"add to SECTIONS: {missing}")


if __name__ == "__main__":
    main()
