"""Driver-facing query registry: Spark query builders + DuckDB oracle SQL.

Every operator from SURVEY.md §2 (and the LLM-pipeline additions) gets a
``(spark, sf_dir) -> DataFrame`` builder plus, where SQL can express it,
an ANSI-SQL twin with IDENTICAL semantics:

- anomaly flags are booleans (exact), keys are ints (exact);
- money sums run in integer cents (bit-exact across engines regardless
  of partial-aggregation order);
- unavoidable float outputs (quantiles, stddev, cosine) are computed
  with the same operation order/association in both engines and
  rounded to 6 decimals;
- integer outputs are cast to 64-bit on both sides.

Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).

The query builders themselves live in ``tsod_spark/queries/`` split by
family; importing that package populates QUERIES/ORACLE in registration
order. This module remains the stable import surface (``table``,
``flagship``, ``QUERIES``, ``ordered_queries``...) and owns the
driver-verification rotation below.
"""

from __future__ import annotations

from . import queries as _queries_pkg  # noqa: F401  (registration side-effects)
from .queries._base import (  # noqa: F401
    DTOKS,
    E_CTE,
    HIGH_HEX,
    ORACLE,
    P,
    QUERIES,
    TOKS,
    W,
    _shingle_sql,
    duck_round6,
    events_tsf,
    register,
    table,
)
from .queries.entry import flagship  # noqa: F401

# ---------------------------------------------------------------------------
# driver check-window rotation
#
# The driver's per-round oracle run covers the FIRST 50 entries of the
# queries() dict; round 1 verified exactly the first 50 registration-order
# names (CORRECTNESS_r01.json), leaving 52 registered-later queries with
# no driver verdict. Rotate the ordering so every query earns a driver
# verdict across rounds: names without a green driver row yet come first
# (in registration order), already-verified names after. The two approx
# twins of r1-verified exact queries are parked at the window boundary —
# they are rows-only checks whose exact twins are already green, so they
# lose the least by waiting a round.

R1_VERIFIED = frozenset({
    "ts_range", "ts_range_quantile", "ts_diff", "ts_diff_fit",
    "ts_range_low_only", "ts_diff_positive", "ts_diff_negative",
    "ts_gradient", "ts_gradient_fit", "ts_rolling_std", "ts_rolling_std_fit",
    "ts_constant_value", "ts_constant_gradient", "ts_hampel", "ts_combined",
    "ts_lag_features", "ts_window_dataset", "ts_resample_15m",
    "ts_range_sqlapi", "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
    "tpch_q4", "tpch_q14", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q22",
    "top_customers", "events_daily", "events_props_json", "events_rollup",
    "events_sessions", "ts_asof_join", "ts_asof_forward", "ts_resample_1h",
    "events_type_pivot", "events_distinct_users", "users_purchase_no_error",
    "events_value_percentiles", "doc_stats", "doc_quality",
    "doc_token_counts", "doc_lang_id", "doc_fingerprints", "dedup_exact",
    "dedup_minhash_sig", "dedup_minhash_pairs", "dedup_minhash_groups",
})

# Fully-green rows from CORRECTNESS_r02.json, minus emb_lsh_near_pairs:
# its r2 "pass" hash-matched an EMPTY result (spark_rows=0) and the
# registered threshold has since changed (τ 0.9 → 0.3) to make the
# check non-vacuous, so it must earn a real verdict in r3.
R2_VERIFIED = frozenset({
    "anomaly_daily_summary", "customer_spend_quartiles",
    "customers_above_nation_avg", "daily_orders_vs_purchases",
    "dedup_jaccard_topk", "dedup_simhash", "dedup_simhash_pairs",
    "doc_string_funcs", "emb_array_funcs", "emb_cosine_topk",
    "emb_knn_join", "emb_knn_label_accuracy", "emb_label_centroids",
    "emb_lsh_buckets", "events_conditional_aggs", "events_cube",
    "events_daily_ohlc", "events_date_parts", "events_grouping_sets",
    "events_running_total", "events_session_window", "events_unpivot",
    "events_value_histogram", "mm_decode", "mm_frames", "mm_real_decode",
    "mm_resize", "nation_revenue_share", "orders_monthly_momentum",
    "supplier_balance_rank", "top_parts_per_brand", "tpch_q10",
    "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q16", "tpch_q20",
    "tpch_q21", "tpch_q7", "tpch_q8", "tpch_q9", "ts_autocorr",
    "ts_cusum", "ts_iqr", "ts_zscore", "users_error_or_signup",
    "users_purchase_and_error",
    # rows-only by design (no oracle); its r2 rows-only verdict stands
    "emb_ivf_topk",
})

# Fully-green rows from CORRECTNESS_r03.json. Note r3's window already
# re-confirmed the ts_* detector family on post-encodings code, so those
# R1 names are no longer stale.
R3_VERIFIED = frozenset({
    "dedup_canonical", "dedup_embedding_groups", "dedup_incremental",
    "doc_chunk_dedup", "doc_contamination_stats", "doc_decontaminate",
    "doc_mixture_sample", "doc_redact", "doc_repetition",
    "doc_split_assign", "doc_stratified_sample", "doc_tfidf_topk",
    "emb_lsh_near_pairs", "emb_quantize", "events_funnel",
    "events_interval_overlap", "events_latest_by_key",
    "events_range_join", "events_retention", "events_rollup_hierarchy",
    "events_sliding_1h", "mm_audio_energy", "mm_resize_pixels",
    "tpch_q11", "tpch_q2", "ts_asof_tolerance", "ts_combined",
    "ts_constant_gradient", "ts_constant_value", "ts_diff",
    "ts_diff_fit", "ts_diff_negative", "ts_diff_positive", "ts_ewma",
    "ts_gradient", "ts_gradient_fit", "ts_hampel", "ts_lag_features",
    "ts_range", "ts_range_low_only", "ts_range_quantile",
    "ts_rolling_std", "ts_rolling_std_fit",
})

# Fully-green rows from CORRECTNESS_r04.json.
R4_VERIFIED = frozenset({
    "dedup_rate_by_source", "dedup_simhash_groups", "doc_bm25_search",
    "doc_budget_select", "doc_curation_pipeline", "doc_lm_rarity",
    "doc_pack_sequences", "doc_stats", "doc_vocab_overlap",
    "doc_weighted_sample", "events_asof_snapshot", "events_daily",
    "events_distinct_users", "events_distinct_users_approx",
    "events_profile", "events_props_json", "events_rollup",
    "events_scd2", "events_sessions", "events_table_diff",
    "events_type_pivot", "events_value_drift", "events_value_percentiles",
    "top_customers", "tpch_q1", "tpch_q14", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q22", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "ts_asof_forward", "ts_asof_join", "ts_benchmark_corr", "ts_holt",
    "ts_range_quantile_approx", "ts_range_sqlapi", "ts_resample_15m",
    "ts_resample_1h", "ts_rolling_corr", "ts_seasonal_anomaly",
    "ts_seasonal_decompose", "ts_window_dataset", "users_purchase_no_error",
})

# Fully-green rows from CORRECTNESS_r05.json (driver sf0.01 oracle, 50/50).
R5_VERIFIED = frozenset({
    "anomaly_daily_summary", "dedup_exact", "dedup_jaccard_topk",
    "dedup_minhash_groups", "dedup_minhash_pairs", "dedup_minhash_sig",
    "dedup_simhash", "dedup_simhash_pairs", "doc_chunk_split",
    "doc_fingerprints", "doc_gopher_filter", "doc_lang_id", "doc_quality",
    "doc_rag_search", "doc_token_counts", "doc_vocab_overlap",
    "doc_weighted_sample", "dq_suite", "emb_cosine_topk", "emb_ivf_cells",
    "emb_ivf_topk", "emb_ivfpq_topk", "emb_knn_join",
    "emb_knn_label_accuracy", "emb_lsh_buckets", "emb_pq_topk",
    "events_merge_upsert", "mm_decode", "mm_frames", "mm_real_decode",
    "mm_resize", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q16",
    "tpch_q20", "tpch_q7", "tpch_q8", "tpch_q9", "ts_ccf", "ts_esd",
    "ts_lttb", "ts_mllib_kmeans", "ts_mllib_residual",
    "ts_mllib_residual_per_series", "ts_shesd", "ts_time_weighted_avg",
    "ts_winsorize", "ts_zscore",
})

# Fully-green rows from CORRECTNESS_r06.json (driver sf0.01 oracle, 50/50).
R6_VERIFIED = frozenset({
    "customer_spend_quartiles", "customers_above_nation_avg",
    "daily_orders_vs_purchases", "dedup_minhash_pairs_capped",
    "dedup_simhash_pairs_capped", "dedup_winnow_overlap",
    "doc_string_funcs", "doc_winnow_fingerprints", "emb_array_funcs",
    "emb_diverse_sample", "emb_label_centroids", "events_conditional_aggs",
    "events_cube", "events_daily_ohlc", "events_date_parts",
    "events_grouping_sets", "events_latest_by_key", "events_range_join",
    "events_running_total", "events_salted_join", "events_session_window",
    "events_unpivot", "events_value_histogram", "nation_revenue_share",
    "orders_monthly_momentum", "supplier_balance_rank",
    "top_parts_per_brand", "tpch_q21", "ts_autocorr", "ts_combined",
    "ts_constant_gradient", "ts_constant_value", "ts_cusum", "ts_diff",
    "ts_diff_fit", "ts_diff_negative", "ts_diff_positive", "ts_ewma",
    "ts_gradient", "ts_gradient_fit", "ts_hampel", "ts_iqr",
    "ts_lag_features", "ts_range", "ts_range_low_only",
    "ts_range_quantile", "ts_rolling_std", "ts_rolling_std_fit",
    "users_error_or_signup", "users_purchase_and_error",
})

# Fully-green rows from CORRECTNESS_r07.json (driver sf0.01 oracle, 50/50).
R7_VERIFIED = frozenset({
    "customer_gini_by_nation", "dedup_cap_drop_stats",
    "dedup_cross_source_matrix", "dedup_threshold_curve",
    "dedup_winnow_overlap", "dedup_winnow_overlap_capped",
    "doc_bigram_heavy_hitters", "doc_lexical_diversity",
    "doc_winnow_screen", "doc_zipf_fit", "emb_label_silhouette",
    "events_assoc_rules", "events_benford", "events_dispersion",
    "events_hll_overlap", "events_interarrival",
    "events_interval_overlap", "events_kll_quantiles",
    "events_ks_drift", "events_mannwhitney", "events_markov",
    "events_rollup_hierarchy", "events_theta_sets",
    "events_type_corr", "events_type_entropy", "events_welch_ttest",
    "orders_cohort_ltv", "orders_contingency", "orders_hill_tail",
    "orders_in_flight", "orders_km_segment_summary",
    "orders_km_survival", "orders_rfm", "parts_abc",
    "parts_skyline", "ts_ar1", "ts_backtest_snaive",
    "ts_changepoint", "ts_changepoint_binseg", "ts_haar_energy",
    "ts_holt_winters", "ts_hour_anova", "ts_hw_anomaly",
    "ts_mllib_kmeans", "ts_ols_fit", "ts_peaks", "ts_record_stats",
    "ts_runs_test", "ts_spearman", "ts_theil_sen",
})

# Fully-green rows from CORRECTNESS_r08.json (driver sf0.01 oracle, 50/50,
# all hash-checked).
R8_VERIFIED = frozenset({
    "dedup_canonical", "dedup_containment_pairs", "dedup_embedding_groups",
    "dedup_incremental", "dedup_ppjoin_groups", "dedup_ppjoin_pairs",
    "doc_chunk_dedup", "doc_contamination_stats", "doc_decontaminate",
    "doc_mixture_sample", "doc_redact", "doc_repetition", "doc_split_assign",
    "doc_stratified_sample", "doc_tfidf_topk", "emb_label_davies_bouldin",
    "emb_lsh_near_pairs", "emb_quantize", "events_attribution_credit",
    "events_funnel", "events_mannwhitney", "events_retention",
    "events_sliding_1h", "mm_audio_energy", "mm_resize_pixels",
    "orders_km_quartiles", "orders_nelson_aalen", "supplier_ship_latency",
    "tpch_q1", "tpch_q11", "tpch_q14", "tpch_q17", "tpch_q18", "tpch_q19",
    "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "ts_asof_tolerance", "ts_conformal_snaive", "ts_mllib_kmeans",
    "ts_periodogram", "ts_permutation_entropy", "ts_range_sqlapi",
    "ts_resample_15m", "ts_runs_test", "ts_sax_motifs", "ts_theil_sen",
    "ts_window_dataset",
})

# Fully-green rows from CORRECTNESS_r09.json (driver sf0.01 oracle, 50/50,
# all hash-checked).
R9_VERIFIED = frozenset({
    "dedup_exact", "dedup_minhash_sig", "dedup_ppjoin_bigram_pairs",
    "dedup_ppjoin_incremental", "dedup_ppjoin_prefix_stats",
    "dedup_rate_by_source", "dedup_simhash_groups", "doc_bm25_search",
    "doc_budget_select", "doc_curation_pipeline", "doc_fingerprints",
    "doc_lang_id", "doc_lm_rarity", "doc_pack_mixture_stats",
    "doc_pack_sequences", "doc_quality", "doc_quality_budget_curve",
    "doc_stats", "doc_token_counts", "doc_vocab_overlap",
    "events_asof_snapshot", "events_daily", "events_distinct_users",
    "events_distinct_users_approx", "events_profile", "events_props_json",
    "events_psi_drift", "events_rollup", "events_scd2", "events_sessions",
    "events_table_diff", "events_type_pivot", "events_value_drift",
    "events_value_percentiles", "orders_km_logrank",
    "orders_km_quartiles_by_segment", "orders_nelson_aalen_by_segment",
    "top_customers", "tpch_q22", "ts_asof_forward", "ts_asof_join",
    "ts_benchmark_corr", "ts_conformal_curve", "ts_holt",
    "ts_range_quantile_approx", "ts_resample_1h", "ts_rolling_corr",
    "ts_seasonal_anomaly", "ts_seasonal_decompose",
    "users_purchase_no_error",
})

# Fully-green rows from CORRECTNESS_r10.json (driver sf0.01 oracle, 50/50,
# all hash-checked).
R10_VERIFIED = frozenset({
    "anomaly_daily_summary", "dedup_containment_incremental",
    "dedup_jaccard_topk", "dedup_lsh_tuning_curve", "dedup_minhash_groups",
    "dedup_minhash_pairs", "dedup_simhash", "dedup_simhash_pairs",
    "doc_chunk_split", "doc_contamination_by_split", "doc_gopher_filter",
    "doc_pack_bucketed_stats", "doc_pack_loss_mask", "doc_rag_search",
    "doc_weighted_sample", "dq_suite", "emb_cosine_topk", "emb_ivf_cells",
    "emb_ivf_recall_curve", "emb_ivf_topk", "emb_ivfpq_topk", "emb_knn_join",
    "emb_knn_label_accuracy", "emb_lsh_buckets", "emb_pq_topk",
    "events_merge_upsert", "events_wasserstein_drift", "mm_decode",
    "mm_frames", "mm_real_decode", "mm_resize", "tpch_q10", "tpch_q12",
    "tpch_q13", "tpch_q15", "tpch_q16", "tpch_q20", "tpch_q7", "tpch_q8",
    "tpch_q9", "ts_ccf", "ts_conformal_by_segment", "ts_esd", "ts_lttb",
    "ts_mllib_residual", "ts_mllib_residual_per_series", "ts_shesd",
    "ts_time_weighted_avg", "ts_winsorize", "ts_zscore",
})

# Fully-green rows from CORRECTNESS_r11.json (driver sf0.01 oracle, 50/50,
# all hash-checked): the re-verified r6-stale detector tier plus
# emb_pq_distortion_curve.
R11_VERIFIED = frozenset({
    "customer_spend_quartiles", "customers_above_nation_avg",
    "daily_orders_vs_purchases", "dedup_minhash_pairs_capped",
    "dedup_simhash_pairs_capped", "doc_string_funcs",
    "doc_winnow_fingerprints", "emb_array_funcs", "emb_diverse_sample",
    "emb_label_centroids", "emb_pq_distortion_curve",
    "events_conditional_aggs", "events_cube", "events_daily_ohlc",
    "events_date_parts", "events_grouping_sets", "events_latest_by_key",
    "events_range_join", "events_running_total", "events_salted_join",
    "events_session_window", "events_unpivot", "events_value_histogram",
    "nation_revenue_share", "orders_monthly_momentum",
    "supplier_balance_rank", "top_parts_per_brand", "tpch_q21",
    "ts_autocorr", "ts_combined", "ts_constant_gradient",
    "ts_constant_value", "ts_cusum", "ts_diff", "ts_diff_fit",
    "ts_diff_negative", "ts_diff_positive", "ts_ewma", "ts_gradient",
    "ts_gradient_fit", "ts_hampel", "ts_iqr", "ts_lag_features",
    "ts_range", "ts_range_low_only", "ts_range_quantile",
    "ts_rolling_std", "ts_rolling_std_fit", "users_error_or_signup",
    "users_purchase_and_error",
})

# Fully-green rows from CORRECTNESS_r12.json (driver sf0.01 oracle, 50/50,
# all hash-checked): the 7 r11 registrations + 43 of the r7-stale tier.
R12_VERIFIED = frozenset({
    "customer_gini_by_nation", "dedup_canonicalization_curve",
    "dedup_cap_drop_stats", "dedup_cross_source_matrix",
    "dedup_exact_cross_source", "dedup_source_containment",
    "dedup_threshold_curve", "dedup_threshold_curve_sampled",
    "dedup_winnow_overlap", "dedup_winnow_overlap_capped",
    "doc_bigram_heavy_hitters", "doc_lexical_diversity",
    "doc_winnow_screen", "doc_zipf_fit", "emb_label_silhouette",
    "events_assoc_rules", "events_benford", "events_dispersion",
    "events_hll_overlap", "events_interarrival", "events_interval_overlap",
    "events_kll_quantiles", "events_ks_drift", "events_ks_drift_by_segment",
    "events_markov", "events_psi_drift_by_segment",
    "events_rollup_hierarchy", "events_theta_sets", "events_type_corr",
    "events_type_entropy", "events_wasserstein_drift_by_segment",
    "events_welch_ttest", "orders_cohort_ltv", "orders_contingency",
    "orders_hill_tail", "orders_in_flight", "orders_km_survival",
    "orders_rfm", "parts_abc", "parts_skyline", "ts_ar1",
    "ts_backtest_snaive", "ts_changepoint", "ts_changepoint_binseg",
    "ts_haar_energy", "ts_holt_winters", "ts_hour_anova", "ts_ols_fit",
    "ts_record_stats", "ts_spearman",
})

# Fully-green rows from CORRECTNESS_r13.json (driver sf0.01 oracle, 50/50,
# all hash-checked): the 5 never-verified names VERDICT_r12 #1 demanded,
# the 6 r13 registrations, and 39 of the r8-stale tier.
R13_VERIFIED = frozenset({
    "dedup_canonical", "dedup_containment_pairs",
    "dedup_embedding_cell_block_stats", "dedup_embedding_groups",
    "dedup_governance_increments", "dedup_governance_pipeline",
    "dedup_incremental", "dedup_ppjoin_groups", "dedup_ppjoin_pairs",
    "doc_chunk_dedup", "doc_contamination_stats", "doc_decontaminate",
    "doc_mixture_sample", "doc_redact", "doc_repetition",
    "doc_split_assign", "doc_stratified_sample", "doc_tfidf_topk",
    "emb_ivfpq_build_stats", "emb_ivfpq_persisted_recall_curve",
    "emb_ivfpq_persisted_topk", "emb_ivfpq_residual_topk",
    "emb_label_davies_bouldin", "emb_lsh_near_pairs", "emb_quantize",
    "events_funnel", "events_retention", "events_sliding_1h",
    "mm_audio_energy", "mm_resize_pixels", "orders_km_segment_summary",
    "tpch_q1", "tpch_q11", "tpch_q14", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "ts_asof_tolerance", "ts_hw_anomaly", "ts_mllib_kmeans", "ts_peaks",
    "ts_range_sqlapi", "ts_resample_15m", "ts_runs_test",
    "ts_window_dataset",
})

_ROUND_SETS = (
    (13, R13_VERIFIED),
    (12, R12_VERIFIED),
    (11, R11_VERIFIED),
    (10, R10_VERIFIED),
    (9, R9_VERIFIED),
    (8, R8_VERIFIED),
    (7, R7_VERIFIED),
    (6, R6_VERIFIED),
    (5, R5_VERIFIED),
    (4, R4_VERIFIED),
    (3, R3_VERIFIED),
    (2, R2_VERIFIED),
    (1, R1_VERIFIED),
)

# Queries whose verdict must be (re-)earned first in the CURRENT round:
# names whose plan or semantics changed (r7: winnow containment rounds
# half-away; KMeans fit retrained via driver Lloyd) plus brand-new
# registrations (tier 0 anyway — listing them is documentation).
# Empty is fine — tier 0 then just falls through to staleness.
# Refresh this tuple each round alongside the R{N}_VERIFIED set.
_CURRENT_ROUND_PRIORITY: tuple = (
    # r14 (VERDICT_r13 #1): the 10 queries whose latest driver verdict
    # is r8-era — 5 rounds of code motion since their last check. The
    # window's remaining slots go to the 50-query r9-stale tier in
    # registration order; any new r14 registration slots in right after
    # these 10 (age 0.5 below), displacing one r9-stale name each.
    "ts_theil_sen",
    "events_mannwhitney",
    "orders_km_quartiles",
    "ts_permutation_entropy",
    "ts_sax_motifs",
    "orders_nelson_aalen",
    "ts_conformal_snaive",
    "events_attribution_credit",
    "ts_periodogram",
    "supplier_ship_latency",
)

# Never-verified names outside the priority tuple (i.e., queries
# registered THIS round) slot immediately after the priority names and
# before the stale tiers, so every new registration earns a driver
# verdict in its first eligible round.
_NEW_REGISTRATION_AGE = 0.5


def _latest_verified_round(n: str) -> int:
    """Most recent driver round whose CORRECTNESS file has this query
    fully green; 0 if never verified."""
    for rnd, s in _ROUND_SETS:
        if n in s:
            return rnd
    return 0


def _rotated(d: dict) -> dict:
    # The driver checks the FIRST 50 names per round, so ordering is the
    # verification schedule: (1) new/changed queries needing a fresh
    # verdict (the priority tuple + never-verified names), then
    # (2) stalest latest-verdicts first, registration order within each
    # tier. r14 window: the 10 r8-stale names + 40 of the 50-query
    # r9-stale tier (minus one slot per new r14 registration).

    def age(n: str) -> float:
        if n in _CURRENT_ROUND_PRIORITY:
            return 0.0
        r = _latest_verified_round(n)
        if r == 0:
            # New this-round registrations: window them right after the
            # named priority tuple (see _CURRENT_ROUND_PRIORITY).
            return _NEW_REGISTRATION_AGE
        return float(r)

    names = sorted(d, key=lambda n: age(n))  # stable: registration order within tier
    return {n: d[n] for n in names}


def ordered_queries() -> dict:
    return _rotated(QUERIES)


def ordered_oracle() -> dict:
    return _rotated(ORACLE)
