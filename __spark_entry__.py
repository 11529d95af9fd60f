"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's conformance
surface (one entry per implemented SURVEY §2 operator) for the
driver's DuckDB-oracle comparison at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from open_energy_data_server_spark.queries import ORACLES, QUERIES
from open_energy_data_server_spark.session import register_engine_functions

FLAGSHIP = "q1_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's per-round correctness harness checks queries in
# registration order (first 50). This list is GENERATED — rerun
#   PYTHONPATH=. python tools/rotate_driver_priority.py
# at the start of every round (after the new CORRECTNESS_r*.json
# lands): never-driver-checked names lead, then every checked name
# stalest-latest-green first, so the 50-slot window always covers
# the unchecked set plus the oldest rows and no row ages past ~2
# rounds. Do not hand-edit the ordering; add brand-new queries by
# registering them (the tool folds them in on the next rotation) —
# or rerun the tool immediately if they must be checked this round.
_DRIVER_PRIORITY = [
    # changed this round (--lead): driver must re-check
    "q_recursive_soc",
    "q_ewma_anomaly_rcte",
    "q_text_stats",
    "q_lang_id",
    "q_doc_fingerprint_winnow",
    "q_interpolate_cubic",
    "q_triangle_count",
    "q_fuzzy_dedup_names",
    "q_scd2_apply",
    "q_calendar_scaffold",
    "q_semdedup_pairs",
    "q_pq_encode",
    "q_pq_adc_topk",
    "q_kmeans_refine",
    "q_seasonality_strength",
    "q_remove_duplicate_spans",
    "q_boilerplate_strip",
    "q_repetition_signals",
    "q_nearest_station",
    "q_dedup_embedding_cosine",
    "q_curation_pipeline",
    # checked names, stalest latest-green first (as of r10)
    "q_growth_accounting",  # r6
    "q_postgrest_filter_project",  # r6
    "q_postgrest_aggregate",  # r6
    "q_postgrest_in_like",  # r6
    "q_postgrest_or_logic",  # r6
    "q_stored_procedure_view",  # r6
    "q_extract_year_filter",  # r6
    "q_join_distinct_subquery",  # r6
    "q_grafana_panel",  # r6
    "q_point_in_polygon",  # r6
    "q_weather_shape_rollup",  # r6
    "q_polygon_centroids",  # r6
    "q_wkt_to_geojson",  # r6
    "q_tumbling_window_6h",  # r6
    "q_sliding_window_1h30m",  # r6
    "q_session_windows",  # r6
    "q_revenue_by_region",  # r6
    "q_shipping_priority_top10",  # r6
    "q_customers_with_orders",  # r6
    "q_customers_without_orders",  # r6
    "q_incremental_since_watermark",  # r6
    "q_multiway_full_outer",  # r6
    "q_topk_per_group",  # r6
    "q_quantiles_cont",  # r7
    "q_stream_stream_join",  # r7
    "q_neighbour_pairs",  # r7
    "q_union_distinct",  # r7
    "q_range_join_fiscal_windows",  # r7
    "q_intersect_except",  # r7
    "q_ann_bruteforce_topk",  # r7
    "q_ann_lsh_buckets",  # r7
    "q_multimodal_decode",  # r7
    "q_ann_ivf_probe",  # r7
    "q_image_dhash",  # r7
    "q_dedup_exact",  # r7
    "q_dedup_ngram_jaccard",  # r7
    "q_minhash_signatures",  # r7
    "q_dedup_minhash_lsh",  # r7
    "q_simhash",  # r7
    "q_simhash_pairs",  # r7
    "q_stratified_sample",  # r7
    "q_token_pack",  # r7
    "q_quality_filters",  # r7
    "q_sample_fixed_k",  # r7
    "q_decontaminate",  # r7
    "q_pii_scrub",  # r7
    "q_domain_stats",  # r7
    "q_duplicate_spans",  # r7
    "q_dedup_groups",  # r7
    "q_mixture_sample",  # r7
    "q_dedup_purge",  # r7
    "q1_pricing_summary",  # r7
    "q_melt_part_measures",  # r7
    "q_melt_wide_chunked",  # r7
    "q_grid_density",  # r7
    "q_cusum_drift",  # r7
    "q_chisq_drift",  # r7
    "q_percentile_bands",  # r7
    "q_rpc_parameterized",  # r7
    "q_gaps_islands",  # r7
    "q_rrf_hybrid_search",  # r7
    "q_timestamp_assembly",  # r7
    "q_interpolate_linear",  # r7
    "q_rolling_1h_window",  # r7
    "q_suffix_melt",  # r8
    "q_pivot_event_counts",  # r8
    "q_asof_rate_join",  # r8
    "q_grafana_flow_rate",  # r8
    "q_theil_sen_trend",  # r8
    "q_autocorr_lag",  # r8
    "q_entropy_daily",  # r8
    "q_mad_outliers",  # r8
    "q_seasonal_profile",  # r8
    "q_bollinger_breach",  # r8
    "q_embedding_quantize",  # r8
    "q_ks_drift",  # r8
    "q_grafana_unixepoch",  # r8
    "q_rolling_median",  # r8
    "q_cross_correlation",  # r8
    "q_churn_hazard",  # r8
    "q_forecast_backtest",  # r8
    "q_spearman_daily",  # r8
    "q_merit_order",  # r8
    "q_trimmed_mean",  # r8
    "q_first_touch_attribution",  # r8
    "q_url_canonicalize",  # r8
    "q_volume_price_curve",  # r8
    "q_interval_coalesce",  # r8
    "q_audience_overlap",  # r8
    "q_window_funnel",  # r8
    "q_cohort_ltv",  # r8
    "q_rapid_repeat_events",  # r8
    "q_activity_streaks",  # r8
    "q_dr_baseline",  # r8
    "q_local_supplier_volume",  # r8
    "q_large_orders",  # r8
    "q_sanitize_columns",  # r8
    "q_locale_number_parse",  # r8
    "q_case_when_classify",  # r8
    "q_string_kit",  # r8
    "q_date_arithmetic",  # r8
    "q_tz_roundtrip",  # r8
    "q_unit_conversions",  # r8
    "q_null_handling",  # r8
    "q_tfidf_topk",  # r8
    "q_bm25_search",  # r8
    "q_familiarity_buckets",  # r8
    "q_quality_classifier",  # r8
    "q_lag_diff_decumulate",  # r8
    "q_latest_per_user",  # r8
    "q_ffill_bfill",  # r8
    "q_cms_heavy_hitters",  # r9
    "q_grouping_sets",  # r9
    "q_heatmap_dow_hour",  # r9
    "q_week_over_week",  # r9
    "q_load_duration_curve",  # r9
    "q_anomaly_outliers",  # r9
    "q_pagerank",  # r9
    "q_capacity_factor",  # r9
    "q_ramp_rate",  # r9
    "q_funnel_steps",  # r9
    "q_retention_cohorts",  # r9
    "q_data_gaps",  # r9
    "q_seasonal_naive_error",  # r9
    "q_event_transitions",  # r9
    "q_referential_audit",  # r9
    "q_share_of_total",  # r9
    "q_session_entry_paths",  # r9
    "q_rolling_correlation",  # r9
    "q_peak_offpeak",  # r9
    "q_degree_days",  # r9
    "q_vwap",  # r9
    "q_max_drawdown",  # r9
    "q_keyset_pagination",  # r9
    "q_market_hhi",  # r9
    "q_abc_classification",  # r9
    "q_benford_audit",  # r9
    "q_gini_coefficient",  # r9
    "q_polygon_area",  # r9
    "q_bigram_lm_score",  # r9
    "q_shuffle_shards",  # r9
    "q_train_val_test_split",  # r9
    "q_weighted_sample",  # r9
    "q_top_ngrams",  # r9
    "q_vocab_overlap",  # r9
    "q_stream_dedup_batch_twin",  # r9
    "q_small_quantity_revenue",  # r9
    "q_last_shipper",  # r9
    "q_order_count_distribution",  # r9
    "q_top_revenue_suppliers",  # r9
    "q_idle_rich_customers",  # r9
    "q_lateral_topk",  # r9
    "q_running_sum",  # r9
    "q_snapshot_at_latest",  # r9
    "q_time_bucket_hourly",  # r10
    "q_multi_measure_by_type",  # r10
    "q_watermark_probe",  # r10
    "q_distinct_dims",  # r10
    "q_dedup_keep_first",  # r10
    "q_value_histogram",  # r10
    "q_catalog_stats",  # r10
    "q_net_generation",  # r10
    "q_union_cte_count",  # r10
    "q_json_extract_agg",  # r10
    "q_approx_distinct_kmv",  # r10
    "q_rollup_revenue",  # r10
    "q_quantiles_disc",  # r10
    "q_corr_regression",  # r10
    "q_skew_salted_agg",  # r10
    "q_rfm_segmentation",  # r10
    "q_shipping_lag",  # r10
    "q_basket_pairs",  # r10
    "q_yoy_seasonality",  # r10
    "q_price_volatility",  # r10
    "q_concurrency_sweep",  # r10
    "q_missing_value_profile",  # r10
    "q_active_users",  # r10
    "q_minmax_scale",  # r10
    "q_top_movers",  # r10
    "q_chunk_documents",  # r10
    "q_char_diversity",  # r10
    "q_snapshot_diff",  # r10
    "q_table_fingerprint",  # r10
    "q_min_cost_supplier",  # r10
    "q_order_priority_check",  # r10
    "q_forecast_revenue_delta",  # r10
    "q_volume_shipping",  # r10
    "q_market_share",  # r10
    "q_product_profit",  # r10
    "q_returned_items",  # r10
    "q_important_volume_parts",  # r10
    "q_late_priority_lines",  # r10
    "q_promo_revenue_share",  # r10
    "q_supplier_count_by_part",  # r10
    "q_bracketed_revenue",  # r10
    "q_excess_shippers",  # r10
    "q_cdc_current_snapshot",  # r10
    "q_accent_fold",  # r10
    "q_scd2_history",  # r10
    "q_percent_rank",  # r10
    "q_weighted_moving_average",  # r10
    "q_runs_detection",  # r10
    "q_mode_per_group",  # r10
    "q_ewma",  # r10
]


def _ordered_names() -> list[str]:
    """Priority names first (those lacking a driver correctness row),
    then everything else in module-registration order."""
    seen = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(seen)]
    return seen + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    register_engine_functions(spark)
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_engine_functions(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(QUERIES[name]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
