"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``mcp_server_vector_search_spark``; this file
only exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mcp_server_vector_search_spark import registry
from mcp_server_vector_search_spark.operators.topk import flagship

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference server.py:85-91 semantics) on sf0.001."""
    return flagship(spark, SMOKE_SF_DIR)


# The driver's correctness gate samples a bounded prefix of this dict
# (~50 entries in iteration order).  To maximize UNION coverage across
# rounds, the r8 prefix leads with the queries that NEED a fresh driver
# record: the 9 queries r7 added (never driver-checked — VERDICT r7
# task 1), then the r8-new queries, then the queries whose latest
# driver record is oldest (r2/r3 cohorts that r7 did not resample).
# Rotating this prefix is the LAST step of every round.
_PRIORITY_PREFIX = [
    # --- r7 new (no driver record yet — VERDICT r7 task 1) ---
    "ann_hnsw_topk",
    "ann_filtered_adaptive",
    "ann_index_maintenance_plan",
    "multimodal_phash_dct",
    "multimodal_jpeg_roundtrip",
    "multimodal_phash_mixed",
    "multimodal_audio_features",
    "multimodal_video_frames",
    "streaming_tumbling_counts",
    # --- r8 new (registered this round) ---
    "multimodal_binaryfile_scan",
    "ann_hnsw_upsert",
    "ann_filtered_planned",
    "streaming_index_append",
    "ann_assign_gemm_cells",
    "ann_hnsw_batch_topk",
    "streaming_stateful_user_totals",
    "window_value_functions",
    "agg_statistical_moments",
    "scalar_lambda_functions",
    "ann_lsh_multiprobe",
    "scd2_customer_update",
    "streaming_dedup_events",
    "join_shuffle_hash_hint",
    "source_csv_quoted_roundtrip",
    "udf_map_in_arrow",
    "observe_metrics_certificate",
    "join_aqe_broadcast_conversion",
    "window_session_native",
    # --- latest record is r2/r3 and r7 did not resample ---
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_avg",
    "q19_or_predicate_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "source_roundtrip_formats",
    "sink_partitioned_pruned_scan",
    "source_schema_evolution",
    "subquery_correlated_above_avg",
    "unpivot_lineitem_measures",
    "q6_revenue_forecast",
    "q10_returned_revenue",
    "sample_hash_deterministic",
    "merge_upsert_orders",
    "rollup_hourly_daily",
    "window_distribution_ranks",
    "vector_centroid_per_label",
    "dedup_editdistance_pairs",
    "q18_large_orders",
    "scalar_map_functions",
    "semantic_search_hash_embedder",
    "dedup_exact",
    "dedup_bag_groups",
    "dedup_ngram_jaccard",
    "rows_as_json",
    "empty_result_guard",
    "setops_multiset_all",
    "window_range_frame",
    "q1_pricing_summary",
    "filter_scan_pushdown",
    "top_n_orders",
    "join_star_broadcast",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_outer_order_counts",
    "setops_nation_presence",
    "window_rank_top3_per_priority",
    "window_running_and_lag",
    "window_moving_frame",
    "scalar_string_functions",
    "scalar_date_functions",
    "scalar_math_functions",
    "scalar_array_functions",
    "scalar_json_functions",
]


def _prioritized(mapping: dict) -> dict:
    first = {n: mapping[n] for n in _PRIORITY_PREFIX if n in mapping}
    rest = {n: v for n, v in mapping.items() if n not in first}
    return {**first, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all_operators()
    return _prioritized(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    registry.load_all_operators()
    return _prioritized(dict(registry.ORACLES))
