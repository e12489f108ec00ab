"""Query registry: the driver-facing contract surface.

Every implemented operator registers (a) a PySpark query callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, (b) the
equivalent ANSI SQL for the driver's DuckDB oracle. ``__spark_entry__``
re-exports these. Column names must match between the two (the driver's
compare sorts columns by name before value-hashing), so every computed
column is aliased identically on both sides.

Determinism rules used throughout (SURVEY.md §7.4):
- money-ish double sums go through DECIMAL(18,4/6) accumulation and are cast
  back to DOUBLE, so Spark's and DuckDB's different summation orders cannot
  diverge in the last ulp;
- averages are computed as CAST(decimal-sum AS DOUBLE) / CAST(count AS
  DOUBLE) for the same reason;
- no monotonically_increasing_id / rand anywhere — content-derived keys only.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}

_WORKER_IMPORTS_LOCK = threading.Lock()


def ensure_worker_imports(spark) -> None:
    """Make ``data_engineering_nd_spark`` importable on Python WORKERS
    regardless of the driver's working directory: mapInPandas / pandas-UDF
    closures pickle references to this package, and in local mode workers
    inherit the driver JVM's cwd — a driver launched from elsewhere (with
    only a driver-side sys.path patch) would hit ModuleNotFoundError at
    task time. Zips the package once per process and ships it via
    ``sc.addPyFile`` (idempotent per SparkContext); a no-op overhead when
    the cwd already suffices."""
    import os
    import tempfile
    import zipfile

    sc = spark.sparkContext
    if getattr(sc, "_dend_pyfiles_added", False):
        return
    # Queries may be launched from overlapping driver threads (guide
    # §2.6 pools in the fixtures and test sweeps): without the lock,
    # concurrent first calls all pass the guard, one addPyFile ships a
    # partially-written zip, and every later task fails with "exists and
    # does not match contents". Double-checked lock + write-to-temp +
    # atomic rename makes the first call safe and the rest free.
    with _WORKER_IMPORTS_LOCK:
        if getattr(sc, "_dend_pyfiles_added", False):
            return
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        root = os.path.dirname(pkg_dir)
        zpath = os.path.join(
            tempfile.gettempdir(), f"dend_spark_pkg_{os.getpid()}.zip"
        )
        if not os.path.exists(zpath):
            tmp = zpath + ".tmp"
            with zipfile.ZipFile(tmp, "w") as z:
                for dp, _, fns in os.walk(pkg_dir):
                    if "__pycache__" in dp:
                        continue
                    for fn in fns:
                        if fn.endswith(".py"):
                            full = os.path.join(dp, fn)
                            z.write(full, os.path.relpath(full, root))
            os.replace(tmp, zpath)
        sc.addPyFile(zpath)
        sc._dend_pyfiles_added = True


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible operator
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# --- Gate-window rotation -------------------------------------------------
#
# The driver's correctness gate records a strict PREFIX of the queries() dict
# (round 1 recorded exactly the first 50 of 98 entries in insertion order).
# Registration order therefore decides which queries get contract-level
# verification each round.  To cover the whole surface across rounds we
# rotate: names that have already appeared in a committed CORRECTNESS_r*.json
# sink to the back, never-recorded names float to the front — cheapest cost
# class first, so a time-based window also records as many as possible.
# Local verification (tools/verify_oracle.py, bench.py) always runs all
# queries and is order-insensitive.

#: round-14 refresh (the established per-round protocol): for every name, the
#: most recent committed CORRECTNESS_r0*.json that recorded it.  Round 13
#: recorded the 5 round-0 pins + 7 r06 names + 38 r07 names — ALL green,
#: the sixth zero-exception window (CORRECTNESS_r13.json) — so they
#: refresh to round 13.  The 6 never-recorded r13 DEFERRED registrations
#: pin to round 0 and lead the r14 window (VERDICT r13 task #1) together
#: with the 12 rolled r07 names; the 32 oldest r08-stale names fill the
#: remainder, 17 r08 names roll to r15.  NEW r14 registrations pin to
#: round 14 (DEFERRED; swept locally at two SFs).
LAST_RECORDED_ROUND: dict[str, int] = {
    # -- never driver-recorded: the 6 round-13 registrations; pinned to
    # round 0 so they LEAD the r14 window (VERDICT r13 task #1) --------
    **dict.fromkeys([
        "tbl_zorder_string_report", "tbl_lifecycle_composition",
        "q119_exact_percentiles", "q120_lorenz_decile_table",
        "q121_median_acctbal_by_nation", "q122_weighted_price_quartiles",
    ], 0),
    # -- latest record: CORRECTNESS_r07.json (12 names rolled from the
    # r13 window; they follow the round-0 pins in the r14 window) -----
    **dict.fromkeys([
        "dq_key_skew_report", "ann_brute_force_topk", "ann_ivf_topk",
        "ann_ivf_kmeans_topk", "ann_lsh_topk", "text_stats",
        "text_fingerprint", "text_repetition_metrics", "text_pii_scan",
        "text_tfidf_top_terms", "text_unigram_logprob",
        "stream_restart_recovery",
    ], 7),
    # -- latest record: CORRECTNESS_r08.json ---------------------------
    **dict.fromkeys([
        "q06_top_customers_per_nation", "q07_date_dimension",
        "q08_sas_date_kernel", "q09_flexible_date_kernel",
        "q10_avg_ship_delay", "q11_union_by_name", "q12_string_kernels",
        "q13_dictionary_broadcast_join", "q14_filtered_distinct",
        "q15_props_extraction", "q16_sessionize", "q17_anti_join",
        "q18_semi_join", "q19_top_parts_by_revenue", "q20_column_profile",
        "q21_sql_api_revenue_by_region", "q22_running_total",
        "q23_moving_average", "ds_contamination_check",
        "ds_domain_mix_sample", "ds_label_centroids", "ds_training_order",
        "ds_keep_best_per_cluster", "dedup_cluster_star",
        "ds_corpus_build_report", "ds_epoch_shards", "graph_pagerank_topk",
        "graph_degree_distribution", "q79_forward_asof_join",
        "multimodal_audio_chunks", "multimodal_metadata_stats",
        "multimodal_resize_thumbnails", "ann_pca_projection",
        "ann_hybrid_rrf", "ann_pq_verified", "text_quality_scores",
        "text_token_count_by_source", "text_detect_language",
        "text_filter_decision", "text_bigram_logprob", "text_redact_pii",
        "text_tfidf_cosine_pairs", "text_bm25_topk", "stream_windowed_counts",
        "stream_session_windows", "stream_enriched_counts",
        "stream_user_lifetime_stats", "stream_stream_join",
        "stream_dedup_exactly_once", "stream_stateful_sessions",
    ], 8),
    # -- latest record: CORRECTNESS_r09.json ---------------------------
    **dict.fromkeys([
        "q81_hll_grouped_merge", "q83_grouped_linreg", "q84_kmv_distinct",
        "q85_decayed_revenue", "q86_last_touch_attribution",
        "q87_skyline_pareto", "q88_bitmap_retention", "q89_mad_outliers",
        "q90_rolling_distinct", "q91_fuzzy_blocking_join",
        "q92_seasonal_anomaly", "q93_ab_conversion_ztest",
        "q95_intransit_inventory", "q96_activity_streaks",
        "q97_window_funnel", "q98_dynamic_partition_pruning",
        "q80_bloom_join_prune", "ds_weighted_sample", "dedup_containment",
        "dedup_survivorship", "dedup_ppjoin", "tbl_skipping_report",
        "tbl_zorder_report", "tbl_delete_report", "ds_markov_transitions",
        "tbl_time_travel", "tbl_incremental_agg", "tbl_merge_report",
        "tbl_schema_evolution", "tbl_vacuum_report", "q82_point_in_time_join",
        "graph_shortest_paths", "graph_personalized_pagerank",
        "graph_resource_allocation", "graph_clustering_coefficient",
        "graph_scc", "q94_hybrid_skew_join", "dq_benford_digit_check",
        "dq_functional_dependency", "ann_incremental", "ann_ivf_pq_verified",
        "ann_nndescent", "text_bpe_encode", "text_incremental_bm25",
        "text_boolean_retrieval", "text_rake_keywords",
        "text_pmi_collocations", "stream_hll_users", "stream_bitmap_dau",
        "stream_heavy_hitters",
    ], 9),
    # -- latest record: CORRECTNESS_r10.json --------------------------
    **dict.fromkeys([
        "q24_order_gap_days", "q25_rollup_revenue", "q27_price_percentiles",
        "q29_json_extraction", "q30_time_rollup", "q31_set_operations",
        "q32_pivot_priority", "q33_top_tokens", "q34_pandas_udf_score",
        "q66_interpolate_hourly", "q67_trailing_week_revenue",
        "q99_relational_division", "q100_market_basket_lift",
        "q101_grouped_quantiles_sketch", "q102_ohlc_bars",
        "q104_frequent_triples", "q105_interval_coalesce",
        "q106_time_weighted_average", "q107_rolling_volatility",
        "ds_split_assignment", "ds_exact_substring_spans",
        "ds_span_removal_report", "ds_chunk_dedup", "ds_pack_sequences",
        "ds_epoch_permutation", "dedup_ngram_coverage",
        "dedup_minhash_verified", "dedup_simhash_verified", "ds_quality_gate",
        "ds_shard_manifest", "ds_incremental_update", "tbl_change_feed",
        "tbl_partition_evolution", "tbl_wap_publish",
        "tbl_cdc_apply_roundtrip", "tbl_deletion_vectors",
        "tbl_shallow_clone", "tbl_bloom_index_report",
        "tbl_idempotent_commits", "tbl_constraints_report", "graph_hits",
        "graph_louvain", "q103_interval_overlap_join",
        "multimodal_binary_ingest", "src_avro_roundtrip", "src_xml_roundtrip",
        "src_csv_malformed_report", "src_jsonl_malformed_report",
        "src_parquet_merge_schema", "stream_lakehouse_sink",
    ], 10),
    # -- latest record: CORRECTNESS_r11.json --------------------------
    **dict.fromkeys([
        "q28_approx_vs_exact", "q35_udtf_expand", "q39_array_agg",
        "q40_stratified_sample", "q41_cube_returnflag_linestatus",
        "q108_weighted_median", "q109_event_path_trigrams",
        "q110_new_vs_returning", "q111_histogram2d", "ds_curriculum_stages",
        "ds_token_budget_pack", "ds_repeat_upsampling",
        "ds_bpe_merge_candidates", "ds_pack_boundaries", "ds_split_leakage",
        "ds_dataset_card", "tbl_concurrent_commits",
        "tbl_log_checkpoint_report", "tbl_merge_dv", "tbl_metadata_tables",
        "ds_rag_chunks", "tbl_ndv_sketch_report",
        "tbl_mv_incremental_refresh", "tbl_type_widening",
        "tbl_merge_when_report", "ds_length_histogram",
        "graph_triangle_count", "graph_label_propagation",
        "graph_common_neighbors", "graph_kcore", "multimodal_image_features",
        "multimodal_frame_samples", "multimodal_pair_manifest",
        "multimodal_scene_cuts", "dq_volume_anomalies",
        "dq_distribution_drift", "dq_candidate_keys", "ann_cosine_range",
        "ann_knn_join", "ann_semantic_dedup", "ann_lsh_verified",
        "text_pretoken_stats", "text_entropy_metrics",
        "text_levenshtein_pairs", "text_langid_confusion",
        "stream_quality_filter", "stream_sliding_counts",
        "stream_merge_upsert", "stream_change_feed",
        "stream_constraint_quarantine",
    ], 11),
    # -- NEW round-14 registrations: DEFERRED (sort last; swept locally
    # at sf0.01 AND sf0.1 this round, lead a later window) ------------
    **dict.fromkeys([
        "q123_weighted_global_percentiles", "tbl_zorder_double_report",
        "q124_modal_order_priority", "q125_chi2_priority_status",
        "q126_acctbal_dispersion_by_nation", "tbl_restore_report",
        "tbl_generated_partition_report", "q127_trimmed_winsorized_mean",
        "q128_correlation_matrix", "stream_partitioned_sink",
    ], 14),
    # -- latest record: CORRECTNESS_r13.json (the 50 just-recorded) ---
    **dict.fromkeys([
        "q116_rfm_segments", "q117_order_gap_survival",
        "q118_supplier_hhi_by_nation", "tbl_optimize_zorder",
        "tbl_row_tracking_report", "ann_ivf_kmeans_verified",
        "ann_pca_verified", "ann_recall_report", "text_vocab_encode",
        "q70_jsonl_roundtrip", "q71_orc_roundtrip",
        "stream_late_data_metrics", "q01_pricing_summary",
        "q02_top_nations_by_revenue", "q03_monthly_order_trend",
        "q04_distinct_projection", "q05_null_audit", "q74_hll_distinct",
        "q77_grouping_sets", "q78_quantile_bins",
        "q76_bucketed_join_revenue", "i94_trips_build",
        "i94_immigrations_build", "i94_visitors_build", "i94_flights_build",
        "i94_dates_build", "i94_airports_build",
        "i94_states_demographic_build", "i94_cities_demographic_build",
        "i94_dictionary_build", "i94_pipeline_run", "dedup_exact_groups",
        "dedup_jaccard_pairs", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_embedding_cosine", "dedup_cluster_assignment",
        "dedup_incremental", "tbl_snapshot_diff", "ds_event_sequences",
        "graph_bfs_layers", "q26_salted_skew_groupby", "q37_asof_join",
        "q38_range_join", "q75_salted_skew_join",
        "multimodal_dedup_decisions", "dq_rowcounts", "dq_pk_uniqueness",
        "dq_reconcile_versions", "dq_referential_integrity",
    ], 13),
    # -- latest record: CORRECTNESS_r12.json (the 50 just-recorded) ---
    **dict.fromkeys([
        "q112_kmv_set_operations", "q113_gini_by_nation",
        "q114_max_drawdown_by_year", "q115_top_decile_revenue_share",
        "tbl_persistent_constraints", "tbl_column_mapping_report",
        "tbl_dv_purge_report", "tbl_mutation_occ", "tbl_mv_minmax_refresh",
        "ds_mixture_temperature", "tbl_partition_stats_report",
        "tbl_tags_report", "ds_tokenizer_compression_ratio",
        "graph_assortativity", "dq_completeness_by_partition",
        "q42_deterministic_sample", "q43_rank_distribution",
        "q44_supplier_market_share", "q45_gap_fill_hourly",
        "q46_price_histogram", "q47_correlated_subqueries",
        "q48_returned_item_revenue", "q49_late_shipment_priority",
        "q50_promo_revenue_share", "q51_large_volume_orders",
        "q52_small_quantity_revenue", "q53_top_supplier_revenue",
        "q54_customer_order_distribution", "q55_dormant_rich_customers",
        "q56_event_funnel", "q57_cohort_retention",
        "q58_local_supplier_volume", "q59_volume_shipping",
        "q60_product_type_profit", "q61_disjunctive_predicates",
        "q62_waiting_orders", "q63_forecast_revenue_change",
        "q64_shipping_priority", "q65_order_priority_check",
        "q69_countmin_heavy_hitters", "q72_argmax_aggregates",
        "q73_unpivot_metrics", "dedup_lsh_recall", "ds_compaction_report",
        "ds_mixture_materialize", "q68_scd2_customer_dim",
        "multimodal_dhash_dedup", "multimodal_vad_segments",
        "dq_expectation_suite", "ann_quantized_topk",
    ], 12),
    # -- latest record: CORRECTNESS_r14.json (r15 refresh, the
    # established per-round protocol): the 50 names the r14 driver
    # window recorded — all green — roll to the back so the r15
    # window records the stalest names instead of re-recording them
    **dict.fromkeys([
        "ann_brute_force_topk", "ann_ivf_kmeans_topk", "ann_ivf_topk",
        "ann_lsh_topk", "dedup_cluster_star", "dq_key_skew_report",
        "ds_contamination_check", "ds_corpus_build_report", "ds_domain_mix_sample",
        "ds_epoch_shards", "ds_keep_best_per_cluster", "ds_label_centroids",
        "ds_training_order", "graph_degree_distribution", "graph_pagerank_topk",
        "multimodal_audio_chunks", "multimodal_metadata_stats", "multimodal_resize_thumbnails",
        "q06_top_customers_per_nation", "q07_date_dimension", "q08_sas_date_kernel",
        "q09_flexible_date_kernel", "q10_avg_ship_delay", "q119_exact_percentiles",
        "q11_union_by_name", "q120_lorenz_decile_table", "q121_median_acctbal_by_nation",
        "q122_weighted_price_quartiles", "q12_string_kernels", "q13_dictionary_broadcast_join",
        "q14_filtered_distinct", "q15_props_extraction", "q16_sessionize",
        "q17_anti_join", "q18_semi_join", "q19_top_parts_by_revenue",
        "q20_column_profile", "q21_sql_api_revenue_by_region", "q22_running_total",
        "q23_moving_average", "q79_forward_asof_join", "stream_restart_recovery",
        "tbl_lifecycle_composition", "tbl_zorder_string_report", "text_fingerprint",
        "text_pii_scan", "text_repetition_metrics", "text_stats",
        "text_tfidf_top_terms", "text_unigram_logprob",
    ], 14),
}


#: Back-compat view used by older tests/docs: every name with a usable
#: committed record.
RECORDED_PRIOR_ROUNDS: frozenset[str] = frozenset(LAST_RECORDED_ROUND)

#: Rough per-query gate cost at sf0.01, by name prefix (lower = cheaper =
#: earlier).  Streaming queries carry a fixed micro-batch + state-store
#: overhead regardless of SF, so they go last within the unrecorded block.
_COST_CLASS: tuple[tuple[str, int], ...] = (
    ("i94_", 0), ("dq_", 0), ("q", 1), ("text_", 2), ("dedup_", 3),
    ("ann_", 3), ("multimodal_", 4), ("graph_", 5), ("stream_", 6),
    ("ds_", 7),  # added AFTER round 1 — let the r01 backlog verify first
)


def _cost_class(name: str) -> int:
    for prefix, cls in _COST_CLASS:
        if name.startswith(prefix):
            return cls
    return 3


def gate_ordered(d: dict[str, object]) -> dict[str, object]:
    """Stable-reorder a registry dict for the driver's prefix-window gate:
    never/needs-re-recording names first (by cost class, then registration
    order), previously-recorded names after, OLDEST record first (VERDICT
    r04 task #7: cycle the stale r01 names back through the window), ties
    broken by registration order."""
    order = list(d)
    fresh = [n for n in order if n not in LAST_RECORDED_ROUND]
    fresh.sort(key=lambda n: (_cost_class(n), order.index(n)))
    seen = [n for n in order if n in LAST_RECORDED_ROUND]
    seen.sort(key=lambda n: (LAST_RECORDED_ROUND[n], order.index(n)))
    return {n: d[n] for n in fresh + seen}


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import data_engineering_nd_spark.analytics  # noqa: F401
    import data_engineering_nd_spark.bucketing  # noqa: F401
    import data_engineering_nd_spark.i94_parity  # noqa: F401
    import data_engineering_nd_spark.operators.bloom  # noqa: F401
    import data_engineering_nd_spark.operators.datasets  # noqa: F401
    import data_engineering_nd_spark.operators.dedup  # noqa: F401
    import data_engineering_nd_spark.operators.dimensions  # noqa: F401
    import data_engineering_nd_spark.operators.graph  # noqa: F401
    import data_engineering_nd_spark.operators.joins  # noqa: F401
    import data_engineering_nd_spark.operators.multimodal  # noqa: F401
    import data_engineering_nd_spark.operators.quality  # noqa: F401
    import data_engineering_nd_spark.operators.similarity  # noqa: F401
    import data_engineering_nd_spark.operators.text_analysis  # noqa: F401
    import data_engineering_nd_spark.sources.formats  # noqa: F401
    import data_engineering_nd_spark.streaming.queries  # noqa: F401
