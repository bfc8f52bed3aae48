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
from accident_prediction_montreal_spark.plans import wave11  # noqa: F401,E402

# First 50 = the driver's check window.
#
# Round-11 ROTATION. Slot 1: llm_dataset_card stays IN until
# driver-green (the r9/r10 hash-red; root cause was the ORACLE's
# uncast __all__ UNION branch — DuckDB SUM(int) is HUGEINT, which
# renders float64 through arrow — fixed this round, Spark side
# unchanged). Slots 2-6: the queries whose code changed this round
# (corpus_diff null-safe digest compare; semantic-decontam broadcast
# zero-norm sentinel — both strategies; st_source_quota_stream
# batch-deterministic nsmallest admission; llm_source_quota skew
# lever). Slots 7-13: the seven NEW r11 queries (llm_shuffle_shards,
# llm_index_maintenance, llm_url_canonicalize, llm_embedding_refresh,
# st_corpus_diff_stream, llm_blocklist_filter,
# sim_cosine_topk_bucketed) — new queries enter the window the SAME
# round, so they never accrue evidence debt. Slots 14-50: EVIDENCE
# REFRESH from the ledger's oldest latest-green — the full remaining
# r4-era set (23), the r5-era set (11), and 3 of the r6-era set
# (scripts/coverage_ledger.py).
# Every slot verified green locally at sf0.01 this round
# (scripts/check_oracle.py, vanilla session).
#
# Rotated OUT — the r10 refresh set (all driver-green in
# CORRECTNESS_r10).
_PRIORITY = [
    # --- ledger closer + this round's changed code ---
    "llm_dataset_card",
    "llm_corpus_diff",
    "llm_decontaminate_semantic",
    "llm_decontaminate_semantic_bucketed",
    "st_source_quota_stream",
    "llm_source_quota",
    # --- new in r11 ---
    "llm_shuffle_shards",
    "llm_index_maintenance",
    "llm_url_canonicalize",
    "llm_embedding_refresh",
    "st_corpus_diff_stream",
    "llm_blocklist_filter",
    "sim_cosine_topk_bucketed",
    # --- evidence refresh: latest green r4 (the full remaining set) ---
    "f_apply_in_pandas_zscore",
    "f_solar_elevation",
    "m1_feature_assembly",
    "m3_class_weights",
    "m7_auc_evaluator",
    "mm_payload_stats",
    "mm_wav_decode",
    "r4_temporal_split",
    "sim_cosine_topk",
    "sql_correlated_subquery",
    "st_availablenow_stream",
    "st_stateful_running",
    "st_stream_dedup",
    "st_stream_stream_join",
    "text_chunking",
    "text_language_id",
    "text_quality_signals",
    "text_tfidf_topk",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "tpch_q5_local_supplier_volume",
    "w4_ewma",
    "w_topk_rank_rownum",
    # --- evidence refresh: latest green r5 ---
    "a1_pricing_summary",
    "a6_idw_radius",
    "dedup_near_invariants",
    "llm_prepare_corpus",
    "mm_ppm_decode",
    "r_sampling_invariants",
    "r_stratified_sample_invariants",
    "sim_ann_invariants",
    "st_session_stream",
    "tpch_q12_priority_lines",
    "tpch_q4_late_orders",
    # --- evidence refresh: latest green r6 (3 of 25) ---
    "a_approx_percentile_invariant",
    "dedup_embedding_cosine",
    "dedup_simhash",
]

# Positions 51+: the r6-era queries NOT refreshed this round lead (the
# r12 rotate-in candidates — oldest remaining evidence); everything
# else follows in deterministic alphabetical order via _reorder().
_TAIL_HEAD = [
    "sim_embedding_stats",
    "st_sliding_stream",
    "st_sliding_window",
    "st_tumbling_window",
    "text_quality_deciles",
    "text_repetition",
    "text_sequence_pack",
    "text_token_hash",
    "tpch_q11_important_stock",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "w5_running_sums",
    "x5_month_shard_backfill",
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
