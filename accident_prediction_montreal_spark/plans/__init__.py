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
from accident_prediction_montreal_spark.plans import wave12  # noqa: F401,E402

# First 50 = the driver's check window.
#
# Round-12 ROTATION (the r11 verdict's ask #1: with zero reds the
# window goes to the oldest evidence). Slots 1-14: every query whose
# code changed this round or is new — the PSL-aware blocklist variant, the
# tracking-regex fix (llm_url_canonicalize), the size-gated skew lever
# (llm_source_quota), the shared collision-proof snapshot-B fixture
# (llm_corpus_diff + the trilogy + st_corpus_diff_stream,
# dedup_containment's REID_SHIFT), the multiset-checksum verify stages
# (llm_index_maintenance, llm_embedding_refresh), and the IVF
# zero-norm-convention alignment (sim_cosine_topk_bucketed) plus the
# new r12 queries (sim_ann_bucketed_recall, llm_quality_cascade,
# llm_domain_reweight, llm_line_dedup; x15_hll_shard_merge's contract
# was corrected by the r12 sf0.1 full-registry sweep) — changed code
# re-earns its driver evidence the same round. Slots 15-36: the full
# r6-era latest-green set (the ledger's oldest tail). Slots 37-50:
# the r7-era set, alphabetical order, first 14.
# Every slot verified green locally at sf0.01 this round
# (scripts/check_oracle.py, vanilla session).
#
# Rotated OUT — the r11 refresh set (all driver-green in
# CORRECTNESS_r11).
_PRIORITY = [
    # --- this round's changed/new code ---
    "llm_blocklist_filter_psl",
    "llm_url_canonicalize",
    "llm_source_quota",
    "llm_corpus_diff",
    "llm_index_maintenance",
    "llm_embedding_refresh",
    "st_corpus_diff_stream",
    "dedup_containment",
    "sim_cosine_topk_bucketed",
    "sim_ann_bucketed_recall",
    "llm_quality_cascade",
    "llm_domain_reweight",
    "llm_line_dedup",
    "x15_hll_shard_merge",
    # --- evidence refresh: latest green r6 (the full set) ---
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
    # --- evidence refresh: latest green r7 (first 14 of 44) ---
    "a11_cohort_retention",
    "a12_funnel_steps",
    "a13_grouping_sets",
    "a6_idw_seam",
    "a8_approx_distinct",
    "dedup_repeated_spans",
    "f_map_funcs",
    "f_pandas_grouped_agg",
    "f_udtf_json_kv",
    "j10_range_join",
    "j12_nullsafe_join",
    "j9_asof_tolerance",
    "llm_decontaminate",
    "llm_pretrain_pipeline",
]

# Positions 51+: the r7-era queries NOT refreshed this round lead (the
# r13 rotate-in candidates — oldest remaining evidence); everything
# else follows in deterministic alphabetical order via _reorder().
_TAIL_HEAD = [
    "llm_temperature_mix",
    "m2_random_undersampler",
    "m_calibration_bins",
    "m_rf_pipeline_invariants",
    "mm_bmp_decode",
    "mm_frame_sample",
    "mm_pgm_decode",
    "mm_png_decode",
    "mm_ppm_resize",
    "p12_unpivot",
    "r2_seeded_sample",
    "r3_random_split",
    "r5_hash_split",
    "sim_ann_ivf",
    "sim_ann_lsh",
    "sim_ann_recall",
    "st_foreachbatch_sink",
    "st_late_data_eviction",
    "st_stream_range_join",
    "st_stream_static_join",
    "st_time_rollup",
    "text_pii_scrub",
    "text_vocab_coverage",
    "tpch_q9_product_profit",
    "w7_range_frame",
    "x10_permissive_csv",
    "x11_bucketed_join",
    "x12_backfill_evolution",
    "x8_partitioned_sink_roundtrip",
    "x9_schema_evolution",
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
