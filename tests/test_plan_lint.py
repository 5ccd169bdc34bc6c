"""Global plan lint: every registered query's physical plan, one set of
scale rules.

The per-operator tests in test_plans.py pin specific shapes; this is
the wholesale regression net — ANY registered query that silently picks
up a scale anti-pattern (a cartesian product, a row-at-a-time Python
eval, an unexpected nested-loop join) fails here, including queries
added in future rounds that never got a bespoke plan test.

Known-bounded exceptions are whitelisted BY NAME with the reason, so a
new violation is a test failure, not a silent grandfathering.
"""

from __future__ import annotations

import re

import pytest

from mcp_server_vector_search_spark import registry
from mcp_server_vector_search_spark.plans.explain import formatted_plan

from .conftest import SF_CORRECTNESS

registry.load_all_operators()

# 1-row or k-row literal sides: a nested-loop/cross join against a
# bounded build is the standard "attach a scalar to every row" shape.
BNLJ_OK = {
    "flagship_topk_cosine",  # 1-row query-vector side (topk.py:60)
    "topk_search_after",  # same 1-row query vector, two pages
    "vector_scores_all",  # same 1-row query vector
    "vector_distance_library",  # same
    "topk_per_query_batch",  # k-row query batch, broadcast
    "agg_kmv_jaccard_certificate",  # two single-row certificate frames combine (by design)
    "ann_recall_report",  # exact leg = the same 5-row query-batch cross join
    "semantic_search_hash_embedder",  # 1-row embedded prompt
    "engine_search_e2e",  # 1-row embedded prompt via the facade
    "engine_search_warm_cache",  # same 1-row embedded prompt, cached corpus
    "ann_lsh_topk",  # 1-row bucket literal probe
    "timeseries_resample_ffill",  # 1-row (min,max) grid bounds
    "timeseries_interpolate_linear",  # same
    "q11_important_parts",  # 1-row global-sum scalar
    "q15_top_supplier",  # 1-row max-revenue scalar
    "q17_small_quantity_avg",  # per-part avg is equi-joined; global guard is 1-row
    "q22_idle_customers",  # 1-row global-avg scalar
    "subquery_correlated_above_avg",  # decorrelated 1-row average
    "hybrid_search_rrf",  # 1-row corpus stats (N, avgdl)
    "hybrid_search_weighted",  # 1-row min/max extrema per <=POOL-row leg
    "agg_kll_quantile_certificate",  # 1-row merged-sketch estimate side
    "q14_promo_revenue",  # 1-row denominator scalar
    "q8_market_share",  # 1-row denominators
    "sessionize_users",  # 1-row session-count scalar join
    "empty_result_guard",  # 0/1-row guard by construction
    "dedup_editdistance_pairs",  # banded: length-band equi key + residual
    "join_range_funnel",  # interval join: equi user key + range residual
    "join_asof_latest_order",  # as-of: union carry-forward, bounded probe
    "rows_as_json",  # k-row serialization demo
    "decontaminate_ngram_overlap",  # bounded eval-set broadcast probe
    "chunk_documents_overlap",  # no join at all; listed defensively
    "sort_global_rank",  # 32-row per-range-partition offset table broadcast
    "dedup_incremental_exact",  # 1-row corpus-cut scalar broadcast
    "dedup_incremental_minhash",  # same 1-row corpus-cut scalar broadcast
    "dedup_incremental_substring",  # same 1-row corpus-cut scalar broadcast
    "dedup_incremental_lines",  # same 1-row corpus-cut scalar broadcast
    "graph_pagerank_incremental",  # same 1-row corpus-cut/count scalar broadcast (edge derivation)
    "agg_hll_mergeable_certificate",  # 1-row exact × 1-row union-estimate
    "agg_ams_f2_certificate",  # 1-row sign-sums × 1-row exact-F2 combine
    "stats_ab_cuped",  # 2-row variant frame × 1-row pooled-theta scalar
    "dsir_importance_weights",  # 1-row corpus-total scalar over the 64-row bucket table
    "text_collocations_pmi",  # 1-row corpus-total scalar for the PMI denominator
    "ann_index_maintenance_plan",  # 1-row upsert-cut scalar broadcast
    # non-equi broadcast of the HN_QUERIES-row query set (label !=
    # query_label): the streamed corpus passes each of 4 broadcast rows
    # once — bounded side IS the broadcast, same posture as
    # topk_per_query_batch
    "mine_hard_negatives",
    # 64-row component frame x 1-row certificate aggregate: both sides
    # bounded by DIM/1 regardless of corpus size
    "linalg_top2_deflation",
}

# Arrow-batched Python (ArrowEvalPython / MapInPandas /
# FlatMapGroupsInPandas) is the sanctioned Python path; these queries
# use it by design.  Row-at-a-time BatchEvalPython is never allowed.
ARROW_OK = {
    "udf_scalar_pandas",
    "udaf_grouped_geomean",
    "udtf_tokenize",
    "udtf_polymorphic_schema",  # Arrow UDTF with plan-time analyze (by design)
    "udtf_table_argument",  # Arrow UDTF over TABLE() partitions (by design)
    "dedup_substring_spans_fp",  # map-side Rabin-Karp gram fingerprints (mapInPandas) ARE the subject
    "dedup_lines_crossdoc",  # map-side line fingerprints (mapInPandas, r15) ARE the subject
    "text_blocklist_multiscan",  # the Aho-Corasick one-pass scan (mapInPandas, r15) IS the subject
    "dedup_incremental_lines",  # same line-fingerprint generator feeding the store/probe split
    "similarity_join_threshold",
    "dedup_embedding_cosine",
    "semantic_search_hash_embedder",
    "semantic_search_dim1536",  # distributed 1536-dim Arrow embed IS the subject (by design)
    "semantic_search_maxsim",  # distributed token embed (Arrow) IS the subject (by design)
    "embed_throughput_batch",  # the Arrow real-model embed pass IS the subject (by design)
    "ann_ivf_dim1536",  # 1536-dim Arrow embed + GEMM assignment: both Python stages ARE the subject
    "ann_hnsw_dim1536",  # same 1536-dim Arrow embed + GEMM stages; probes picked by the graph descent
    "engine_search_e2e",
    "engine_search_warm_cache",  # facade embed UDF (by design); the cache IS the subject
    "multimodal_frame_sample",
    "multimodal_metadata",
    "multimodal_resize",  # stubbed codec over mapInPandas (by design)
    "multimodal_phash_dedup",  # real PNG decode + aHash over mapInPandas (by design)
    "multimodal_phash_dct",  # real PNG decode + integer-DCT hash (by design)
    "multimodal_phash_mixed",  # PNG/PGM/JPEG dispatch + DCT hash (by design)
    "multimodal_jpeg_roundtrip",  # real baseline-JPEG encode+decode (by design)
    "multimodal_audio_features",  # real WAV decode + frame features (by design)
    "multimodal_audio_fingerprint_dedup",  # same real WAV decode front end (by design)
    "multimodal_video_frames",  # real MJPEG-AVI walk + JPEG decode (by design)
    "multimodal_binaryfile_scan",  # real-file corpus decode over mapInPandas (by design)
    "ann_assign_gemm_cells",  # Arrow GEMM assignment IS the certified subject (by design)
    # r13: assignment_col dispatches to the Arrow GEMM when cells × dim
    # >= GEMM_ASSIGN_MIN_WORK; at the fixture's 16 cells × 64 dims the
    # IVF-family rows below now carry the GEMM stage intentionally
    "ann_index_maintenance_plan",  # GEMM-dispatched cell assignment (by design)
    "ann_index_stats",  # GEMM-dispatched cell assignment (by design)
    "pipeline_index_cells",  # GEMM-dispatched cell assignment (by design)
    "semdedup_prune",  # GEMM-dispatched cell assignment (by design)
    "dedup_incremental_semdedup",  # GEMM assignment + per-cell new x stored GEMM (by design)
    "tokenizer_unigram_encode",  # Arrow Viterbi over the distinct-word table IS the subject
    "cluster_kmeans_gemm_census",  # Arrow GEMM Lloyd assignment IS the certified subject (by design)
    "streaming_stateful_user_totals",  # applyInPandasWithState custom operator (by design)
    "udf_map_in_arrow",  # RecordBatch-level Arrow slot IS the subject (by design)
    "udf_grouped_map_zscore",  # grouped-map applyInPandas demo (by design)
}


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_plan_scale_lint(spark, name):
    plan = formatted_plan(registry.QUERIES[name](spark, SF_CORRECTNESS))

    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_OK, (
            f"{name}: BroadcastNestedLoopJoin outside the bounded-side "
            "whitelist — add a bespoke justification or fix the join"
        )
    # row-at-a-time Python is never acceptable
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if (
        "ArrowEvalPython" in plan
        or "MapInPandas" in plan
        or "MapInArrow" in plan
        or "FlatMapGroupsInPandas" in plan
    ):
        assert name in ARROW_OK, (
            f"{name}: unexpected Python stage — whitelist it with a "
            "reason if the Python is intentional"
        )


def test_running_distinct_single_data_exchange(spark):
    """window_running_distinct's reason to exist is the one-exchange
    rewrite (LAG over the user partition instead of a (user, type)
    ranking): both windows must share a single hashpartitioning
    exchange — the only other exchange is the output ORDER BY's
    rangepartitioning."""
    plan = formatted_plan(
        registry.QUERIES["window_running_distinct"](spark, SF_CORRECTNESS)
    )
    # formatted mode renders each Exchange's arguments on its own line
    hash_ex = re.findall(r"Arguments: hashpartitioning", plan)
    assert len(hash_ex) == 1, plan[:800]
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 2, plan[:800]
