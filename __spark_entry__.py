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
# registration order (first 50). Round-6 rotation: the ten names
# that have never received a driver correctness row lead (verified
# locally at sf0.01 + sf0.1 in rounds 4-5, but the union in
# CORRECTNESS_r01..r05 lacks them), then the 50 names whose latest
# driver green is oldest (one r2 row, the rest r3) — the first 40
# of those fill the remaining window slots; the tail plus the r4
# block rotates in round 7. Round-7 rotation: recompute the oldest
# set from the union of CORRECTNESS_r*.json — do not trust this
# comment's counts.
_DRIVER_PRIORITY = [
    # never driver-checked (added round 5, past that round's window)
    "q_rfm_segmentation",
    "q_shipping_lag",
    "q_basket_pairs",
    "q_yoy_seasonality",
    "q_price_volatility",
    "q_concurrency_sweep",
    "q_missing_value_profile",
    "q_active_users",
    "q_minmax_scale",
    "q_top_movers",
    # round-6 addition (new query, no driver row yet)
    "q_scd2_apply",
    # then the names whose latest driver row is oldest (r2/r3)
    "q_topk_per_group",
    "q_time_bucket_hourly",
    "q_multi_measure_by_type",
    "q_watermark_probe",
    "q_distinct_dims",
    "q_dedup_keep_first",
    "q_value_histogram",
    "q_catalog_stats",
    "q_net_generation",
    "q_union_cte_count",
    "q_json_extract_agg",
    "q_approx_distinct_kmv",
    "q_rollup_revenue",
    "q_quantiles_disc",
    "q_corr_regression",
    "q_skew_salted_agg",
    "q_postgrest_filter_project",
    "q_postgrest_aggregate",
    "q_postgrest_in_like",
    "q_stored_procedure_view",
    "q_extract_year_filter",
    "q_join_distinct_subquery",
    "q_grafana_panel",
    "q_point_in_polygon",
    "q_weather_shape_rollup",
    "q_polygon_centroids",
    "q_wkt_to_geojson",
    "q_tumbling_window_6h",
    "q_sliding_window_1h30m",
    "q_session_windows",
    "q_revenue_by_region",
    "q_shipping_priority_top10",
    "q_customers_with_orders",
    "q_customers_without_orders",
    "q_incremental_since_watermark",
    "q_multiway_full_outer",
    "q_neighbour_pairs",
    "q_union_distinct",
    "q_range_join_fiscal_windows",
    "q_intersect_except",
    "q_ann_bruteforce_topk",
    "q_ann_lsh_buckets",
    "q_multimodal_decode",
    "q_dedup_embedding_cosine",
    "q_decontaminate",
    "q_pii_scrub",
    "q_domain_stats",
    "q_timestamp_assembly",
    "q_interpolate_linear",
    "q_rolling_1h_window",
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
