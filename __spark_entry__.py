"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship query (per-source hourly fleet activity over the three
translated CMF branches — SURVEY.md §7.1).
``queries`` / ``oracle_sql``: the declared analytics surface from
SURVEY.md §2.5, implemented in ``pulsar_ingestion_spark/queries_*.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the query modules populates the registry.
import pulsar_ingestion_spark.queries_core  # noqa: F401
import pulsar_ingestion_spark.queries_translate  # noqa: F401
import pulsar_ingestion_spark.queries_llm  # noqa: F401
import pulsar_ingestion_spark.queries_extra  # noqa: F401
import pulsar_ingestion_spark.queries_corpus  # noqa: F401
import pulsar_ingestion_spark.queries_events  # noqa: F401
import pulsar_ingestion_spark.queries_stats  # noqa: F401
import pulsar_ingestion_spark.queries_ir  # noqa: F401
import pulsar_ingestion_spark.queries_sketch  # noqa: F401
import pulsar_ingestion_spark.queries_tpch  # noqa: F401
import pulsar_ingestion_spark.queries_geo  # noqa: F401
import pulsar_ingestion_spark.queries_ml  # noqa: F401
import pulsar_ingestion_spark.queries_warehouse  # noqa: F401
import pulsar_ingestion_spark.queries_graph  # noqa: F401
import pulsar_ingestion_spark.queries_quality  # noqa: F401
import pulsar_ingestion_spark.queries_experiment  # noqa: F401
import pulsar_ingestion_spark.queries_rank  # noqa: F401
from pulsar_ingestion_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize the three raw telemetry feeds from sf0.001
    events, run all three CMF translators, union into the canonical stream,
    and compute per-source hourly activity (count + distinct vehicles)."""
    import pyspark.sql.functions as F

    from pulsar_ingestion_spark.queries_translate import (
        cmf_translate_calamp,
        cmf_translate_ford,
        cmf_translate_geotab,
    )

    sf_dir = "/root/testdata/sf0.001"
    # union on a timestamp column directly — one conversion per branch
    g = cmf_translate_geotab(spark, sf_dir).select(
        "source_type", "vehicle_id", F.to_timestamp(F.col("date_time")).alias("event_time")
    )
    c = cmf_translate_calamp(spark, sf_dir).select(
        "source_type", "vehicle_id", F.to_timestamp(F.col("date_time")).alias("event_time")
    )
    f = cmf_translate_ford(spark, sf_dir).select(
        F.lit("Ford").alias("source_type"),
        "vehicle_id",
        F.timestamp_millis(F.col("epoch_source")).alias("event_time"),
    )
    cmf = g.unionByName(c).unionByName(f)
    return (
        cmf.withColumn("hour", F.date_trunc("hour", F.col("event_time")))
        .groupBy("source_type", "hour")
        .agg(
            F.count("*").alias("msg_cnt"),
            F.approx_count_distinct("vehicle_id").alias("approx_vehicles"),
        )
        .orderBy("source_type", "hour")
    )


# Query ids prior driver rounds already checked (CORRECTNESS_r01.json +
# CORRECTNESS_r02.json rows).  The driver checks a bounded prefix of the
# declared set, so ids it has NOT yet covered are emitted first — rotating
# coverage across rounds until every query has a driver CORRECTNESS row
# (VERDICT r1 item 2, refreshed each round per VERDICT r2 item 2).
_CHECKED_PRIOR = {
    # round 12 (CORRECTNESS_r12.json — 50/50 hash-green: the 15 round-12
    # additions' first rows + the two stranded late-r11 ids (VERDICT r11
    # item 1 closed) + re-verification of the stalest r3/r4-era backlog)
    "stats_fisher_exact_2x2", "stats_g_test", "stats_bartlett", "stats_cmh",
    "text_trigram_stupid_backoff", "stats_breusch_pagan", "join_asof_forward",
    "stats_mood_median", "ts_spectral_entropy", "ts_pacf_durbin",
    "corpus_temperature_mix", "graph_ktruss", "stats_tost_equivalence",
    "stats_poisson_dispersion", "events_interarrival_expon_ks",
    "stats_page_trend", "stats_two_way_anova",
    # round 11 (CORRECTNESS_r11.json — 50/50 hash-green: the 47 round-11
    # additions' first rows + the retired rows-only trio's first
    # hash-checked rows; VERDICT r11)
    "stats_cochran_armitage", "events_seasonal_residuals",
    "events_entropy_rate", "graph_hits", "ts_ljung_box", "stats_cochran_q",
    "stats_durbin_watson", "ts_seasonal_naive_mase", "ts_stl_classical",
    "events_seasonal_dow_hour", "ml_brier_decomposition", "stats_mcnemar",
    "sim_search_ivf_recall_sweep", "stats_kendall_tau", "stats_logrank_test",
    "stats_friedman", "ml_regression_metrics", "rank_skyline_2d",
    "dq_null_profile", "agg_weighted_median",
    "stats_anderson_darling_uniform", "events_circular_hour_stats",
    "stats_theil_u", "graph_closeness_centrality", "ts_hurst_rs",
    "stats_kaplan_meier", "stats_nelson_aalen", "ml_ks_separation",
    "ts_mk_trend", "stats_runs_test", "agg_hhi_concentration",
    "stats_grubbs_outlier", "corpus_quality_filter_funnel",
    "dedup_containment", "dedup_containment_banded",
    "dedup_boundary_overlap", "stats_jarque_bera", "stats_benford_digits",
    "stats_cramers_v", "ml_matthews_corr", "ml_expected_calibration_error",
    "events_bounce_rate", "dedup_containment_lshensemble",
    "sketch_heavy_hitters", "stats_cohens_d", "stats_wilcoxon_signed_rank",
    "win_ntile_percent_cume", "dedup_minhash", "dedup_minhash_fast",
    "agg_approx_count_distinct",
    # round 10 (CORRECTNESS_r10.json — 50/50 hash-green: the six round-10
    # additions' first rows + multimodal_features' first hash-checked row
    # + re-verification of 43 r3-era rows; VERDICT r10)
    "stats_welch_ttest", "privacy_t_closeness", "multimodal_dedup_bytes",
    "stats_levene_brown_forsythe", "exp_power_mde",
    "emb_outlier_mahalanobis_diag",
    # round 8 (CORRECTNESS_r08.json — 49 hash-green + 1 rows-only by
    # design (dedup_minhash_fast): the 50 round-8 additions; VERDICT r8
    # item 1)
    "dedup_minhash_fast", "graph_bfs_hops", "stats_mann_whitney",
    "stats_spearman", "agg_gini", "ml_ndcg_at_k", "ml_mrr", "ml_log_loss",
    "sketch_ams_f2", "text_pmi_collocations", "ts_holt_smooth",
    "warehouse_zone_map_prune", "corpus_importance_weights",
    "graph_label_propagation", "graph_jaccard_linkpred", "stats_fdr_bh",
    "ml_lift_deciles", "agg_theil_index", "events_burst_days",
    "text_token_entropy", "text_hashed_features",
    "warehouse_clustering_depth", "events_anomaly_ewma_band",
    "sim_search_mmr", "emb_triplet_margin", "agg_bootstrap_ci",
    "ts_periodogram_bin", "geo_kde_grid", "dq_freshness",
    "exp_sprt_boundary", "corpus_dedup_savings", "ml_average_precision",
    "ml_cohen_kappa", "stats_kruskal_wallis", "graph_assortativity",
    "events_concurrency_sweep", "stats_anova_oneway",
    "stats_tukey_outliers", "ml_mutual_info", "corpus_novelty_curve",
    "ts_downsample_lttb", "stats_permutation_pvalue", "graph_modularity",
    "ml_best_f1_threshold", "text_readability_flesch",
    "graph_clustering_coeff", "stats_qq_deciles", "stats_ks_uniform",
    "corpus_seq_len_profile", "events_dau_wau",
    # round 7 (CORRECTNESS_r07.json — 49 hash-green + 1 rows-only by
    # design: graph_kcore's first row plus a fresh re-verification of the
    # round-1-era prefix; VERDICT r7 item 2)
    "graph_kcore",
    # round 6 (CORRECTNESS_r06.json — 50/50 hash-green: the 36 rotation
    # ids stranded from round-5 session 3 + udf_pandas_haversine's first
    # post-oracle row + the 14 round-6 additions; VERDICT r6 item 1)
    "ml_auc_roc", "graph_triangle_count", "geo_dbscan_grid",
    "graph_pagerank", "graph_degree_stats",
    "sketch_kmv_intersect", "sketch_quantile_logbins", "sample_weighted_kmv",
    "warehouse_incremental_agg", "warehouse_changelog_compact",
    "warehouse_partition_prune_stats", "dq_reconciliation",
    "drift_psi", "drift_ks", "drift_chi2", "privacy_k_anonymity",
    "exp_ab_lift", "exp_srm_check", "exp_cuped_adjust",
    "ml_calibration_bins", "ml_confusion_threshold",
    "ts_interp_linear", "ts_theil_sen", "ts_changepoint_mean_shift",
    "ts_rolling_median", "linkage_blocked_match", "tenant_usage_report",
    "dedup_jaccard_prefix_filter", "basket_frequent_pairs",
    "win_drawdown", "events_survival_curve", "events_conversion_rate_daily",
    "join_interval_overlap", "emb_cosine_histogram", "text_bigram_logprob",
    "udf_pandas_haversine",
    "warehouse_bom_rollup", "warehouse_merge_resolve_conflicts",
    "layout_compaction_plan", "dedup_semantic_cluster", "sim_search_pq_adc",
    "drift_wasserstein", "privacy_l_diversity", "text_dedup_cascade",
    "warehouse_scd2_from_changelog", "text_keyphrase_rake",
    "dedup_lsh_recall_eval", "join_asof_nearest",
    "exp_delta_method_ratio", "agg_winsorized_mean",
    # round 5 (CORRECTNESS_r05.json — 50/50 hash-green: the curated
    # round-5 prefix incl. TPC-H completion, warehouse management, IR
    # ranking, embedding evaluation, event-journey III)
    "join_asof_tolerance", "sim_search_recall_eval", "emb_label_affinity",
    "text_dedup_survivorship", "corpus_lang_balance", "dedup_url_canonical",
    "text_langid_confusion", "dedup_cross_source", "corpus_domain_caps",
    "text_ppl_buckets", "events_attribution_position",
    "events_time_to_convert", "events_user_overlap_jaccard",
    "win_range_interval_1h", "ts_autocorr", "text_bm25_topk",
    "text_keyness_loglik", "sketch_hll_merge", "sample_reservoir_hash",
    "tpch_min_cost_supplier", "tpch_small_qty_revenue", "tpch_parts_promo",
    "tpch_global_sales_opportunity", "tpch_customer_distribution",
    "win_topk_ties_qualify", "tpch_returned_items", "tpch_promo_revenue",
    "tpch_top_supplier", "tpch_large_orders", "tpch_disjunctive_pred",
    "tpch_waiting_suppliers", "tpch_nation_volume", "tpch_product_profit",
    "tpch_important_stock", "win_mom_growth", "win_yoy_growth",
    "win_cumulative_share", "tpch_forecast_revenue", "tpch_shipmode_priority",
    "tpch_supplier_part_count", "tpch_fulfillment_latency",
    "emb_prefix_recall", "emb_whiten_stats", "emb_prototypes_per_label",
    "scd2_point_in_time", "table_snapshot_diff", "dq_orphan_check",
    "dq_constraint_audit", "warehouse_merge_upsert",
    "graph_hierarchy_closure",
    # round 4 (CORRECTNESS_r04.json — 50/50 hash-green, incl. the two
    # fixed round-3 failures and the four formerly-stranded LSH ids)
    "agg_entropy", "agg_weighted_avg", "corpus_dedup_report",
    "corpus_shard_assign", "corpus_token_budget", "dedup_embedding_blas",
    "dedup_simhash", "emb_kmeans_lloyd", "emb_pca_power", "emb_pq_encode",
    "emb_residual_quantize", "events_attribution_last_touch",
    "events_dwell_percentiles", "events_ltv_percentiles",
    "events_markov_transitions", "events_pareto_share", "events_path_topk",
    "events_sessionize", "geo_grid_density", "geo_nearest_poi",
    "join_bloom_pruned", "join_salted_skew", "layout_zorder_key",
    "sim_search_ivf", "sim_search_lsh", "sketch_bloom_build",
    "sketch_countmin", "sketch_hll_portable", "telemetry_trip_summary",
    "text_bpe_corpus_prep", "text_code_detect", "text_inverted_index",
    "text_js_divergence", "text_line_dedup", "text_tfidf_topk",
    "text_vocab_coverage", "text_winnowing", "tpch_market_share",
    "tpch_order_priority", "tpch_pricing_summary", "tpch_revenue_by_region",
    "tpch_top_orders", "ts_cusum_drift", "ts_lag_features",
    "ts_outlier_mad", "ts_rollup_multires", "ts_seasonal_profile",
    "win_running_distinct", "win_streaks",
    # round 3 (CORRECTNESS_r03.json — 48 green; the two hash failures
    # events_sessionize / telemetry_trip_summary are deliberately NOT
    # listed: their oracles are fixed (CAST … AS BIGINT) and they rotate
    # to the front for fresh green rows, per VERDICT r3 item 2)
    "agg_bool", "agg_first_per_day", "agg_histogram", "agg_mode",
    "agg_regr_slope", "agg_skew_kurtosis", "agg_stats_corr",
    "agg_variance_stddev", "array_set_ops", "bitwise_funcs",
    "cmf_variant_residue", "corpus_assemble", "corpus_mix_domains",
    "corpus_pack_sequences", "corpus_split_train", "dedup_minhash_banded",
    "emb_dim_stats", "emb_norm_stats", "emb_quantize_int8",
    "error_safe_funcs", "events_anomaly_zscore", "events_cohort_retention",
    "events_funnel", "events_rfm_segments", "explode_variants",
    "filter_null_safe_eq", "fleet_dashboard", "join_broadcast_left",
    "join_cross", "join_range_banded", "json_variant", "sample_stratified",
    "sim_search_lsh_multiprobe", "string_regexp_groups",
    "string_split_part", "table_profile", "text_levenshtein_pairs",
    "text_ngram_freq", "text_passage_dedup", "text_repetition_ratios",
    "text_tokenize_filter", "text_unigram_logprob", "text_zipf_slope",
    "ts_ewma", "ts_gapfill_15m", "ts_resample_15m",
    "union_schema_evolution", "unpivot_melt",
    # round 2 (CORRECTNESS_r02.json).  sim_search_lsh / sim_search_ivf /
    # dedup_simhash / dedup_embedding_blas are deliberately NOT listed:
    # their r2 rows were `no_oracle` errors recorded before the r3 oracles
    # existed — rotate them forward for first-ever green rows (VERDICT r3
    # item 3).
    "route_event_type_split", "dedup_exact", "dedup_fingerprint",
    "dedup_keep_best", "text_pii_scrub", "dedup_ngram_jaccard",
    "dedup_minhash", "dedup_embedding_cosine",
    "sim_search_knn", "text_stats", "text_quality_score",
    "text_token_count", "multimodal_features", "multimodal_resize",
    "text_chunk_documents", "text_lang_id", "text_decontaminate",
    "text_minhash_signature", "emb_centroid_by_label",
    # emb_quantize_int8 deliberately NOT listed: its r2 row FAILED
    # (array-hash serialization, now fixed) — rotate it to the front so
    # round 3 records a fresh green row.
    "dedup_cluster_components", "corpus_curate", "dedup_cluster_lss",
    "text_gopher_quality", "multimodal_frame_sample",
    "multimodal_audio_chunks", "text_df_prune", "warehouse_vehicle_gaps",
    "join_right", "event_translate_order", "event_translate_inventory",
    "event_translate_shipment", "stateful_transitions", "win_distribution",
    "win_first_last", "win_nth_value", "agg_pivot", "sample_deterministic",
    "datetime_funcs", "agg_salted_skew", "telemetry_trip_distance",
    "udf_pandas_haversine", "json_multi_extract", "cmf_tire_pressure_map",
    "cmf_events_explode", "agg_max_min_by",
    # round 1 (CORRECTNESS_r01.json)
    "scan_project", "filter_pred", "filter_not_blank", "json_extract",
    "ts_normalize", "enum_normalize", "join_inner_equi", "join_left",
    "join_full", "join_broadcast", "join_semi", "join_anti",
    "join_theta_range", "join_asof", "agg_group_sum_avg_min_max_count",
    "agg_count_distinct", "agg_approx_count_distinct", "agg_percentile",
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_filtered",
    "agg_collect", "win_rank_rownum_denserank", "win_lag_lead",
    "win_frame_rows", "win_frame_range", "win_topk_per_group",
    "sort_limit_topk", "union_all", "union_distinct", "set_intersect",
    "set_except", "string_funcs", "math_funcs", "array_funcs",
    "explode_arrays", "map_funcs", "misc_funcs", "stream_tumbling_agg",
    "stream_sliding_agg", "stream_session_window", "stream_dedup",
    "stream_watermark_late", "cmf_translate_geotab", "cmf_translate_calamp",
    "cmf_translate_ford", "event_translate_payment", "event_translate_user",
    "route_tenant",
}


# Round-13 driver-check prefix (the driver checks a bounded prefix ≈50).
# New round-13 queries go at the FRONT (first driver rows), then the
# stalest re-verification backlog: the r4-era ids displaced from the
# round-12 prefix under the 50-id cap, then the r5-era block (testdata
# is regenerated every round, so old greens deserve periodic re-proof;
# VERDICT r11 item 4).  Later additions displace from the TAIL.
_ROUND13_PREFIX: list[str] = [
    # late round-12 addition stranded after the r12 prefix was pinned —
    # FIRST driver row this round (the rotation-coverage test caught it,
    # same pattern as VERDICT r11 item 1)
    "ml_conformal_interval",
    # round-13 additions — first driver rows this round
    # (appended here as they land)
    # r4-era re-verification backlog displaced from the r12 prefix
    "telemetry_trip_summary",
    "text_bpe_corpus_prep",
    "text_inverted_index",
    "text_js_divergence",
    "text_tfidf_topk",
    "text_vocab_coverage",
    "text_winnowing",
    "tpch_market_share",
    "tpch_order_priority",
    "tpch_pricing_summary",
    "tpch_revenue_by_region",
    "tpch_top_orders",
    "ts_cusum_drift",
    "ts_lag_features",
    "ts_outlier_mad",
    "ts_rollup_multires",
    "ts_seasonal_profile",
    "win_running_distinct",
    "win_streaks",
    # r5-era re-verification backlog (stale since CORRECTNESS_r05), in
    # registry order
    "join_asof_tolerance",
    "sim_search_recall_eval",
    "emb_label_affinity",
    "text_dedup_survivorship",
    "corpus_lang_balance",
    "dedup_url_canonical",
    "text_langid_confusion",
    "dedup_cross_source",
    "corpus_domain_caps",
    "text_ppl_buckets",
    "events_attribution_position",
    "events_time_to_convert",
    "events_user_overlap_jaccard",
    "win_range_interval_1h",
    "ts_autocorr",
    "text_bm25_topk",
    "text_keyness_loglik",
    "sketch_hll_merge",
    "sample_reservoir_hash",
    "tpch_min_cost_supplier",
    "tpch_small_qty_revenue",
    "tpch_parts_promo",
    "tpch_global_sales_opportunity",
    "tpch_customer_distribution",
    "win_topk_ties_qualify",
    "tpch_returned_items",
    "tpch_promo_revenue",
    "tpch_top_supplier",
    "tpch_large_orders",
    "tpch_disjunctive_pred",
    # tpch_waiting_suppliers — displaced by ml_conformal_interval —
    # remaining r5-era rows (tpch_nation_volume …) rotate in next round
    # under the 50-id cap — all remain covered via _CHECKED_PRIOR
]


def _rotated(mapping: dict) -> dict:
    prefix = {k: mapping[k] for k in _ROUND13_PREFIX if k in mapping}
    fresh = {
        k: v for k, v in mapping.items()
        if k not in _CHECKED_PRIOR and k not in prefix
    }
    seen = {
        k: v for k, v in mapping.items()
        if k in _CHECKED_PRIOR and k not in prefix
    }
    return {**prefix, **fresh, **seen}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.5 — ids without
    a prior driver CORRECTNESS row first (coverage rotation), this round's
    curated prefix ahead of later additions."""
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    operators → driver records a rows-only check).  Same rotation order
    as :func:`queries`."""
    return _rotated(ORACLES)
