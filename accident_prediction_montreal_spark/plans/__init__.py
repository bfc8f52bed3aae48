"""Query plans: the engine's declared operator inventory (SURVEY.md §2).

Importing this package populates the registry with every implemented
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle string computing the
same result (same column names, same canonicalization).

Registration ORDER is part of the driver contract: the grading harness
checks the first 50 registry entries, so ``_PRIORITY`` pins an explicit
order — flagship composites, the TPC-H shapes, and the LLM-pipeline
north-star queries first, every one of them oracle-backed; the tail
holds queries whose operators are already evidenced by an in-window
query (redundant micro-shapes) or whose outputs are inherently
rows-only (seeded sampling, sketch internals — their CONTRACTS are
checked in-window by the *_invariants queries instead).
"""

from accident_prediction_montreal_spark.plans.registry import REGISTRY, QuerySpec

# Populate the registry.
from accident_prediction_montreal_spark.plans import relational  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import relational_extra  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import composite  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import llm_ops  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import apm_pipeline  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import scale_ops  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import wave5  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import wave6  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import privacy  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import wave7_streaming  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import wave8  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import wave9  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import wave10  # noqa: F401,E402

# First 50 = the driver's check window.
#
# Round-9 ROTATION (verdict r8 #1: close the ledger): ALL 36 remaining
# zero-driver-evidence queries rotate IN — the 9 r8 additions (wave-10
# block + the two _exact parity twins) and the 27 wave-7/8 ops/analytics
# stragglers (x22-x25, a22-a36 tail, g3/g4, privacy p13-p16, w10/w11,
# m15-m18, st_checkpoint_resume) — every one verified green locally at
# sf0.01 this round (scripts/check_oracle.py). After this window, every
# registered query has a driver CORRECTNESS row. The other 14 slots hold
# queries MODIFIED this round, so the driver validates the new forms:
# asof null-literal + j9 family (operators/asof.py), ppjoin ceil slack
# (operators/dedup.py), band_explode sharing (dedup_minhash_pairs,
# dedup_incremental, st_incremental_dedup — the latter two also in the
# 36), cell_cosine_pairs schema derivation (dedup_semantic,
# llm_curation_pipeline), the a26 single-pass melt, the streaming
# state-partition pinning (st_stream_stream_outer, st_cdc_upsert_stream,
# st_pipeline_capstone), and the kNN cost-model fix (j8_knn_seam_polar,
# j8_knn_join_grid) — plus the apm capstone and a TPC-H anchor.
#
# Rotated OUT — the full r8 window (50/50 green in CORRECTNESS_r08).
_PRIORITY = [
    # --- the final 36 zero-evidence queries (ledger closers) ---
    "s13_jsonl_roundtrip",
    "text_bpe_merges",
    "mm_image_dedup",
    "llm_dataset_card",
    "dedup_incremental",
    "st_incremental_dedup",
    "m18_isotonic_calibration",
    "a26_rfm_segmentation_exact",
    "text_quality_deciles_exact",
    "x22_dynamic_partition_overwrite",
    "x23_global_index",
    "a22_weighted_sample",
    "a23_time_weighted_avg",
    "a24_ohlc_bars",
    "f_array_hof",
    "m15_psi_drift",
    "a28_seasonal_anomaly",
    "g3_label_propagation",
    "a29_robust_zscore",
    "a31_sequence_pattern",
    "g4_bfs_khop",
    "a30_autocorr",
    "m16_gains_table",
    "w10_rolling_median",
    "x25_time_travel",
    "p13_k_anonymity",
    "p16_l_diversity",
    "p14_dp_counts",
    "p15_generalization_ladder",
    "st_checkpoint_resume",
    "privacy_release_pipeline",
    "w11_regex_sequence",
    "m17_bootstrap_ci",
    "a34_funnel_timing",
    "a35_grouped_quantiles",
    "a36_cusum_changepoint",
    # --- queries modified in round 9 (driver re-validates new forms) ---
    "j9_asof_nearest",
    "j9_asof_forward",
    "dedup_ppjoin",
    "dedup_minhash_pairs",
    "dedup_semantic",
    "llm_curation_pipeline",
    "a26_rfm_segmentation",
    "st_stream_stream_outer",
    "st_cdc_upsert_stream",
    "st_pipeline_capstone",
    "j8_knn_seam_polar",
    "j8_knn_join_grid",
    "apm_dataset_pipeline",
    "tpch_q8_market_share",
]

# Positions 51+: the two r9 additions first (zero driver evidence — the
# r10 rotate-in set, verified green locally at sf0.01), then the
# rotated-out r8 window (most-recently-green), then the earlier tail.
_TAIL_HEAD = [
    # r9 additions (r10 rotate-in set):
    "dedup_containment",
    "text_ngram_novelty",
    "llm_decontaminate_semantic",
    # the r8 window, rotated out (50/50 green in CORRECTNESS_r08):
    "j13_scd2_join",
    "m12_oof_target_encode",
    "dedup_editdist",
    "x13_small_files_compaction",
    "x14_incremental_rollup",
    "x15_hll_shard_merge",
    "w8_gap_fill_lvcf",
    "a15_interval_coverage",
    "a16_running_distinct",
    "s12_python_datasource",
    "st_python_stream_source",
    "x16_python_sink_roundtrip",
    "f_variant_json",
    "sql_recursive_cte",
    "x17_table_profile",
    "m14_feature_corr",
    "x18_cdc_merge",
    "x19_dq_expectations",
    "j14_bloom_semi_join",
    "a17_heavy_hitters",
    "j15_point_in_polygon",
    "x20_zorder_layout",
    "er_golden_records",
    "g1_pagerank_trade",
    "a18_skyline_pareto",
    "a19_event_transitions",
    "a20_attribution_last_touch",
    "a21_approx_topk_invariant",
    "w9_distribution_ranks",
    "st_heavy_hitters_stream",
    "j16_interval_overlap",
    "x21_ann_pruned_layout",
    "g2_triangle_count",
    "mm_audio_frames",
    "mm_gif_decode",
    "sql_lateral_topk",
    "a25_session_dynamic_gap",
    "a27_market_basket",
    "text_bm25",
    "sim_kmeans_lloyd",
    "llm_epoch_schedule",
    "text_quality_classifier",
    "text_lm_perplexity",
    # earlier tail:
    "x12_backfill_evolution",
    "a6_idw_seam",
    "tpch_q9_product_profit",
    "j10_range_join",
    "st_stream_range_join",
    "dedup_repeated_spans",
    "text_vocab_coverage",
    "a11_cohort_retention",
    "a12_funnel_steps",
    "a13_grouping_sets",
    "f_udtf_json_kv",
    "w7_range_frame",
    "j12_nullsafe_join",
    "p12_unpivot",
    "mm_ppm_resize",
    "mm_frame_sample",
    "j9_asof_forward",
    "j9_asof_tolerance",
    "f_map_funcs",
    "x8_partitioned_sink_roundtrip",
    "x9_schema_evolution",
    "x10_permissive_csv",
    "x11_bucketed_join",
    "llm_pretrain_pipeline",
    "llm_decontaminate",
    "llm_temperature_mix",
    "dedup_minhash_pairs",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_recall",
    "text_pii_scrub",
    "mm_bmp_decode",
    "mm_pgm_decode",
    "st_late_data_eviction",
    "st_time_rollup",
    "st_foreachbatch_sink",
    "st_stream_static_join",
    "m_calibration_bins",
    "m_rf_pipeline_invariants",
    "m2_random_undersampler",
    "r2_seeded_sample",
    "r3_random_split",
    "r5_hash_split",
    "a8_approx_distinct",
    "f_pandas_grouped_agg",
    "mm_png_decode",
    "w5_running_sums",
    "tpch_q11_important_stock",
    "tpch_q7_volume_shipping",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q16_supplier_cnt",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "dedup_embedding_cosine",
    "dedup_simhash",
    "sim_embedding_stats",
    "text_repetition",
    "text_sequence_pack",
    "text_token_hash",
    "text_quality_deciles",
    "st_tumbling_window",
    "st_sliding_window",
    "st_sliding_stream",
    "a_approx_percentile_invariant",
    "x5_month_shard_backfill",
    "a6_idw_radius",
    "a1_pricing_summary",
    "j8_knn_join_grid",
    "dedup_near_invariants",
    "r_sampling_invariants",
    "r_stratified_sample_invariants",
    "sim_ann_invariants",
    "tpch_q4_late_orders",
    "tpch_q12_priority_lines",
    "mm_ppm_decode",
    "st_session_stream",
    "llm_prepare_corpus",
    "a6_idw_interpolation",
    "j9_asof_join",
    "st_stream_dedup",
    "mm_wav_decode",
    "mm_payload_stats",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_orders",
    "st_availablenow_stream",
    "m7_auc_evaluator",
    "j_salted_skew_join",
    "sql_correlated_subquery",
    "f_apply_in_pandas_zscore",
]


def _reorder() -> None:
    head = _PRIORITY + _TAIL_HEAD
    missing = [n for n in head if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in head}
    for name in sorted(REGISTRY):  # deterministic tail order
        ordered.setdefault(name, REGISTRY[name])
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QuerySpec"]
