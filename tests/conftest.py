from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signalk_parquet_spark.session import get_spark  # noqa: E402

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


#: The slow tail of the suite — multi-minute differential/ramp/
#: streaming-restart tests excluded from the DEFAULT (gate) tier so the
#: driver's wall-clock-budgeted `pytest tests/ -x -q` completes even on a
#: 3x-degraded shared-tenancy host (VERDICT r12 what's-wrong #1: the full
#: 23.5-min-clean suite read 57-62 min degraded and the verify gate
#: recorded tests_ok:false on a truncated tail). Run EVERYTHING with
#: `pytest tests/ -m ""` — CLAUDE.md requires a full `-m ""` run before
#: recording any official number. Entries are exact nodeids (file::test),
#: each annotated with the clean-host duration that earned it (the
#: 2026-08-18 full-suite profile, threshold >=2.5 s; oracle-parity
#: entries are exempt up to 5 s because parity IS the gate-tier payload —
#: only the two recursive-CTE-oracle EMA params exceed it). A meta-test
#: below fails if an entry stops matching a collected test, so renames
#: can't silently strand the list.
SLOWTAIL = {
    "test_angular_margin.py::test_trig_bit_identity_and_ulp_bound",  # 18.4s setup (200k fuzz corpus)
    "test_audio.py::test_audio_neardup_pairs",  # 7.9s
    "test_audio.py::test_decode_features_audio_spectral_registered",  # 5.2s
    "test_audio.py::test_streaming_audio_neardup_matches_batch",  # 19.7s
    "test_balanced_sample.py::test_determinism_across_partitionings",  # 3.3s
    "test_balanced_sample.py::test_quota_and_centrality",  # 2.6s
    "test_bloom_decontaminate.py::test_no_false_negatives",  # 5.4s setup
    "test_bpe.py::test_trainer_differential_corpus",  # 5.2s
    "test_bpe.py::test_trainer_differential_crafted",  # 8.7s
    "test_cloudsync.py::test_distributed_copy_round_trip_and_idempotence",  # 3.7s
    "test_dedup_operators.py::test_connected_components_matches_union_find[0]",  # 6.9s
    "test_dedup_operators.py::test_decontaminate_semantic_ivf_numpy_assignment",  # 2.8s
    "test_dedup_operators.py::test_incremental_minhash_fuzz_matches_full_plan",  # 13.4s
    "test_dedup_operators.py::test_ivf_numpy_assignment_matches_expr",  # 3.8s
    "test_dedup_operators.py::test_ivf_operator_with_learned_and_stride_quantizers",  # 6.7s
    "test_dedup_operators.py::test_ivfpq_composes_pruning_and_codes",  # 16.6s
    "test_dedup_operators.py::test_ivfpq_modes_agree",  # 6.8s
    "test_dedup_operators.py::test_kmeans_both_rungs_serve_ivf",  # 5.9s (MLlib arm; the local-rung reference differential stays in the gate tier)
    "test_dedup_operators.py::test_knn_and_ann_operators",  # 3.0s
    "test_dedup_operators.py::test_multitable_lsh_beats_single_table",  # 3.1s
    "test_dedup_operators.py::test_pq_topk_compression_and_recall",  # 10.2s
    "test_dedup_operators.py::test_remove_duplicate_spans_differential_random",  # 3.3s
    "test_dedup_operators.py::test_semantic_keep_cell_cap_guards_duplicate_flood",  # 9.4s
    "test_dedup_operators.py::test_semantic_keep_matches_bruteforce",  # 2.7s
    "test_engine_differential.py::test_planner_matches_duckdb_daily_averages",  # 19.8s setup
    "test_engine_differential.py::test_planner_matches_duckdb_multi_context_max",  # 4.4s
    "test_engine_e2e.py::test_smoothing_sma_and_ema",  # 2.5s
    "test_incremental.py::test_incremental_angular_equals_full_recompute",  # 3.7s
    "test_incremental.py::test_incremental_merge_equals_full_property",  # 20.6s
    "test_incremental.py::test_incremental_position_equals_full_recompute",  # 4.7s
    "test_incremental.py::test_streaming_incremental_maintenance",  # 8.7s
    "test_lake_layout.py::test_migrate_rollup_epoch_crash_resume",  # 3.7s
    "test_lm_queries.py::test_dsir_weights_separate_target_from_pool",  # 3.7s
    "test_oracle_parity.py::test_query_matches_oracle[ema_1h_a02]",  # 38.6s (recursive-CTE oracle)
    "test_oracle_parity.py::test_query_matches_oracle[ema_pathspec_a05]",  # 51.6s (recursive-CTE oracle)
    "test_plans.py::test_media_decision_gates_plan_clean",  # 6.8s
    "test_plans.py::test_media_neardup_joins_are_equi_joins",  # 3.2s
    "test_properties.py::test_bucketed_agg_matches_python_reference",  # 22.2s
    "test_properties.py::test_interval_join_equals_theta_join",  # 8.0s
    "test_properties.py::test_ivf_never_beats_exact_knn",  # 25.5s
    "test_properties.py::test_minhash_lsh_finds_all_exact_duplicates",  # 12.2s
    "test_properties.py::test_semantic_keep_modes_agree_on_ties",  # 23.6s
    "test_retrieval.py::test_bm25_duplicate_query_rows_deduped",  # 3.7s
    "test_retrieval.py::test_bm25_mode_agreement_cross_sf",  # 6.7s
    "test_retrieval.py::test_bm25_null_text_excluded_from_stats",  # 3.9s
    "test_selection.py::test_duplicate_heavy_and_multi_round",  # 3.8s
    "test_selection.py::test_grouped_mad_outliers_matches_python_truth",  # 3.8s
    "test_selection.py::test_grouped_matches_per_group_truth",  # 4.4s
    "test_selection.py::test_heavy_tailed_binade_span_converges",  # 4.3s
    "test_selection.py::test_heavy_tailed_mixed_sign_and_zero",  # 5.5s
    "test_selection.py::test_randomized_differential",  # 3.2s
    "test_selection.py::test_small_groups_skip_histogram_rounds",  # 3.9s
    "test_sketch.py::test_empty_string_token_counts_like_jvm",  # 2.9s
    "test_sketch.py::test_frequent_tokens_exact_empty_and_tiny",  # 2.6s
    "test_sketch.py::test_grouped_frequent_tokens_exact_both_rungs",  # 5.9s
    "test_sketch.py::test_grouped_frequent_tokens_null_group_and_empty",  # 5.1s
    "test_sketch.py::test_regex_metachar_separator_consistent_across_passes",  # 4.6s
    "test_sketch.py::test_streaming_grouped_heavy_hitters_state_survives_restart",  # 15.4s
    "test_sketch.py::test_streaming_grouped_heavy_hitters_supersets_batch_gate",  # 28.7s
    "test_sketch.py::test_streaming_heavy_hitters_state_survives_restart",  # 25.6s
    "test_sketch.py::test_streaming_heavy_hitters_supersets_batch_gate",  # 16.4s
    "test_sketch.py::test_tree_merge_rung_preserves_exactness",  # 8.2s
    "test_stateful_repair.py::test_schema_quarantine_split",  # 3.5s
    "test_stateful_repair.py::test_streaming_ema_state_continues_across_batches",  # 17.4s
    "test_stateful_repair.py::test_streaming_neardup_rocksdb_state_provider",  # 22.4s
    "test_stateful_repair.py::test_streaming_neardup_state_survives_query_restart",  # 16.1s
    "test_stateful_repair.py::test_streaming_threshold_first_observation_fires",  # 25.5s
    "test_stateful_repair.py::test_streaming_threshold_hysteresis_across_batches",  # 15.1s
    "test_streaming.py::test_rollup_job_end_to_end_restart_safe",  # 25.0s
    "test_streaming.py::test_streaming_bloom_screen_matches_batch_gate",  # 12.1s
    "test_streaming.py::test_streaming_containment_across_batches",  # 17.7s
    "test_streaming.py::test_streaming_containment_restart_from_checkpoint",  # 24.7s
    "test_streaming.py::test_streaming_dedup_across_microbatches",  # 24.2s
    "test_streaming.py::test_streaming_image_neardup_matches_batch",  # 15.6s
    "test_streaming.py::test_streaming_image_neardup_phash_method",  # 6.2s
    "test_streaming.py::test_streaming_ingest_to_buffer",  # 2.6s
    "test_streaming.py::test_streaming_neardup_minhash_across_batches",  # 23.3s
    "test_streaming.py::test_streaming_neardup_ttl_evicts_idle_state",  # 32.9s
    "test_streaming.py::test_streaming_rollup_angular_matches_batch_tier",  # 7.8s
    "test_streaming.py::test_streaming_rollup_windowed",  # 6.7s
    "test_streaming.py::test_streaming_semantic_dedup_matches_batch",  # 8.3s
    "test_streaming.py::test_streaming_session_windows",  # 4.2s
    "test_streaming.py::test_streaming_video_neardup_matches_batch",  # 15.9s
    "test_thresholds_lifecycle.py::test_compaction_merges_files",  # 4.0s
    "test_thresholds_lifecycle.py::test_json_csv_sinks_roundtrip",  # 5.3s
    "test_thresholds_lifecycle.py::test_migrations_and_autodiscovery",  # 7.1s
    "test_thresholds_lifecycle.py::test_multimodal_decode_pipeline",  # 3.6s
    "test_thresholds_lifecycle.py::test_sql_passthrough_path_rewriting_and_column_correct",  # 3.8s
    "test_tokenizer.py::test_cross_differential_first_merge_diverges",  # 4.4s
    "test_tokenizer.py::test_uniform_apply_contract_and_roundtrip",  # 9.0s
    "test_unigram.py::test_apply_unigram_roundtrip_and_fallback",  # 4.2s
    "test_unigram.py::test_train_unigram_matches_reference",  # 3.7s
    "test_video.py::test_video_neardup_pairs",  # 3.0s
    "test_weighted_sample.py::test_streaming_twin_matches_batch",  # 14.1s
    "test_weighted_sample.py::test_streaming_twin_null_id_fails_loudly",  # 5.8s
    "test_wind.py::test_streaming_derivation_matches_batch",  # 5.7s
    "test_wordpiece.py::test_apply_wordpiece_df",  # 8.2s
    "test_wordpiece.py::test_trainer_matches_python_reference",  # 10.3s
    "test_wordpiece.py::test_trainer_matches_python_reference_randomized",  # 32.2s
    # --- second cut, from the gate-tier's own duration profile (the
    # --- first-cut tier still ran 8:06 clean; the driver's r12 verify
    # --- was truncated ~10-12 min into a degraded run, so the tier
    # --- targets well under that even at 3x). Durations here include
    # --- family-memo/worker-startup attribution, which shifts to the
    # --- next test in the file — realized savings are smaller than the
    # --- nominal sum, by design.
    "test_angular_margin.py::test_nano_round_flip_count_is_zero",  # 11.5s (gate-tier profile)
    "test_balanced_sample.py::test_window_group_limit_plan",  # 6.2s (gate-tier profile)
    "test_bloom_decontaminate.py::test_exact_hit_counts_agree_with_exact_join",  # 9.4s (gate-tier profile)
    "test_boilerplate.py::test_spark_operators_blocks_and_main_content",  # 3.3s (gate-tier profile)
    "test_dedup_operators.py::test_blocked_jaccard_boundary_straddle_recall",  # 5.5s (gate-tier profile)
    "test_dedup_operators.py::test_connected_components_matches_union_find[1000000]",  # 7.7s (gate-tier profile)
    "test_dedup_operators.py::test_connected_components_transitive_closure[0]",  # 2.1s (gate-tier profile)
    "test_dedup_operators.py::test_containment_join_cross_frame",  # 2.1s (gate-tier profile)
    "test_dedup_operators.py::test_dedup_corpus_no_pairs_keeps_everything",  # 14.4s (gate-tier profile)
    "test_dedup_operators.py::test_dedup_corpus_transitive_keep_decision",  # 7.4s (gate-tier profile)
    "test_dedup_operators.py::test_hard_negatives_operator",  # 2.1s (gate-tier profile)
    "test_dedup_operators.py::test_incremental_minhash_drops_decisions",  # 2.3s (gate-tier profile)
    "test_dedup_operators.py::test_ivf_recall_measured",  # 3.6s (gate-tier profile)
    "test_dedup_operators.py::test_pq_modes_agree",  # 2.2s (gate-tier profile)
    "test_dedup_operators.py::test_semantic_keep_with_learned_quantizer",  # 2.2s (gate-tier profile)
    "test_engine_e2e.py::test_multi_path_alignment_and_methods",  # 2.6s (gate-tier profile)
    "test_incremental.py::test_bucket_level_merge_helpers",  # 3.4s (gate-tier profile)
    "test_incremental.py::test_incremental_equals_full_recompute",  # 3.6s (gate-tier profile)
    "test_incremental.py::test_untouched_partitions_not_rewritten",  # 3.0s (gate-tier profile)
    "test_lake_layout.py::test_migrate_rollup_epoch_flat_to_epoch0",  # 2.2s (gate-tier profile)
    "test_plans.py::test_ann_ivfpq_is_single_map_stage_topk",  # 4.8s (gate-tier profile)
    "test_plans.py::test_ann_pq_is_map_encode_broadcast_score_topk",  # 18.1s (gate-tier profile)
    "test_plans.py::test_semantic_dedup_fused_is_single_exchange_no_joins",  # 2.8s (gate-tier profile)
    "test_plans.py::test_write_records_one_file_per_partition",  # 2.7s (gate-tier profile)
    "test_raster.py::test_image_neardup_pairs_cross_format_and_jpeg",  # 3.9s (gate-tier profile)
    "test_raster.py::test_image_neardup_pairs_phash_method",  # 2.3s (gate-tier profile)
    "test_redact_eval.py::test_redaction_removes_every_original_eval_span",  # 4.9s (gate-tier profile)
    "test_retrieval.py::test_bm25_log_idf_matches_python_truth",  # 2.8s (gate-tier profile)
    "test_retrieval.py::test_bm25_rational_matches_python_truth",  # 3.0s (gate-tier profile)
    "test_retrieval.py::test_bm25_topk_rank_and_ties",  # 3.8s (gate-tier profile)
    "test_selection.py::test_grouped_callable_ranks",  # 2.2s (gate-tier profile)
    "test_selection.py::test_grouped_validation",  # 2.0s (gate-tier profile)
    "test_selection.py::test_nulls_excluded_and_rank_validation",  # 2.2s (gate-tier profile)
    "test_selection.py::test_sorted_path_matches_banded",  # 2.4s (gate-tier profile)
    "test_sketch.py::test_partition_sketches_bounded_and_superset",  # 2.4s (gate-tier profile)
    "test_video.py::test_video_neardup_min_aligned_floor",  # 2.1s (gate-tier profile)
    "test_video.py::test_video_neardup_survives_corrupt_middle_frame",  # 2.3s (gate-tier profile)
    "test_warc.py::test_extractor_fuzz_differential",  # 2.6s (gate-tier profile)
}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slowtail
    for item in items:
        if item.nodeid.split("tests/")[-1] in SLOWTAIL:
            item.add_marker(slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("signalk-parquet-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def spark_global(spark):
    """Alias so hypothesis @given tests can take the session fixture without
    function-scope teardown conflicts."""
    return spark
