"""Graded query implementations, one module per SURVEY.md §2 block.

Importing this package registers every batch query into
`hbase_sep_spark.registry.REGISTRY`.

Registration order IS the driver's grading order, and the driver
grades a bounded prefix (~50 entries per round).  The EXPLICIT
`_GRADE_FIRST` list below — not module import order — determines the
prefix.  Policy each round: never-graded names first, then any
sql-hash query whose implementation or oracle changed since its last
green grade, then the stalest old greens for regression
re-confirmation.  New queries added mid-round move INSIDE the
prefix before the round ends (round-4 precedent) so they are graded
immediately; anything displaced rotates to the front next round.
"""

from hbase_sep_spark.queries import (  # noqa: F401
    mutations,
    windows,
    sort_limit,
    sets,
    scalars,
    semistructured,
    udfs,
    llm_ops,
    llm_extras,
    advanced_analytics,
    analytics_r5,
    analytics_r5b,
    analytics_r5c,
    analytics_r5d,
    analytics_r5e,
    analytics_r6prep,
    tpch_suite,
    analytics_r6b,
    analytics_r6c,
    analytics_r6d,
    analytics_r6e,
    analytics_r6f,
    analytics_r6g,
    analytics_r6h,
    analytics_r6i,
    analytics_r6j,
    analytics_r6k,
    analytics_r6l,
    tpch_suite2,
    analytics_r6m,
    relational_ext,
    sources_formats,
    analytics_ext,
    aggregates,
    events,
    filters,
    joins,
)

from hbase_sep_spark.streaming import queries as _streaming_queries  # noqa: F401

from hbase_sep_spark import registry as _registry

# Driver-grading prefix for round 5 (VERDICT r4 item 1 + ADVICE r4):
# 1-5   = the five round-4 tail additions never driver-graded (were at
#         51-55 after round 4's 50-bound),
# 6-7   = queries whose implementation OR oracle changed after their
#         last green grade (must re-enter the prefix per the project
#         invariant): join_pit_scd2 (same-ts version collapse, ADVICE
#         r4) and stream_anomaly_score (chunk-concat causal order +
#         real n_scored, ADVICE r4 — rows-only, re-run for the clean
#         check),
# 8-20  = the thirteen round-5 additions (never graded — inside the
#         prefix per the round-4 precedent so CORRECTNESS_r05 covers
#         them),
# 21-27 = the seven round-5 second-wave additions (analytics_r5b,
#         never graded — same precedent),
# 28-31 = the four round-5 third-wave additions (analytics_r5c,
#         never graded),
# 32-35 = the four round-5 fourth-wave additions (analytics_r5d:
#         TPC-H composite variants + SQL lateral, never graded),
# 36-38 = the three round-5 fifth-wave additions (analytics_r5e:
#         union-by-name evolution, map lambdas, leave-one-out
#         window, never graded),
# 39-50 = the round-2-graded block (the stalest sql-hash greens, all
#         pre-regeneration: windows, sort/limit, sets through
#         set_union_distinct) for re-confirmation on the regenerated
#         testdata; its remaining 18 names (sets tail + scalars +
#         json/arr/map block) plus the UDF/LLM tail and the round-1
#         heads follow the boundary and lead round 6 together with
#         the r1 filters/joins/aggs.
_GRADE_FIRST = [
    # never graded (round-4 tail additions)
    "sql_recursive_cte",
    "win_period_over_period",
    "events_transition_matrix",
    "events_hourly_seasonality",
    "agg_skew_kurtosis_portable",
    # changed since last green grade (round-5 ADVICE fixes)
    "join_pit_scd2",
    "stream_anomaly_score",
    # never graded (round-5 additions)
    "win_running_distinct",
    "events_interarrival_stats",
    "ts_weekly_ohlc",
    "pipeline_quality_gate_report",
    "events_offset_islands",
    "agg_bitmap_distinct_users",
    "simsearch_quantized_rerank",
    "win_trailing_time_frame",
    "pipeline_epoch_shuffle",
    "pipeline_neardup_prep",
    "set_except_all",
    "events_incremental_agg_merge",
    "layout_zorder_stats",
    # never graded (round-5 second-wave additions, analytics_r5b)
    "join_bloom_prefilter",
    "join_shuffle_hash_hint",
    "ts_ewma_halflife",
    "text_zipf_fit",
    "pipeline_domain_mix_report",
    "layout_file_sizing_audit",
    "events_watermark_lag_audit",
    # never graded (round-5 third-wave additions, analytics_r5c)
    "events_order_repair",
    "text_unigram_logprob",
    "agg_heavy_hitters_exact",
    "win_conditional_reset_sum",
    # never graded (round-5 fourth-wave additions, analytics_r5d)
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "join_lateral_topk",
    # never graded (round-5 fifth-wave additions, analytics_r5e)
    "set_union_by_name_evolved",
    "map_lambda_ops",
    "win_leave_one_out_avg",
    # stale round-2 greens (pre-regeneration), grading-age order
    "win_row_number",
    "win_rank_dense",
    "win_ntile",
    "win_lag_lead",
    "win_moving_avg",
    "win_first_last",
    "win_percent_rank_cume",
    "sort_multi_nulls",
    "limit_topn",
    "topk_per_group",
    "set_union_all",
    "set_union_distinct",
    # --- ~50-entry grading boundary (driver grades a bounded prefix).
    # Positions 51+ cost nothing and pay off if the bound is larger:
    # round-6 rotation takes these in order — the round-6 lead-in
    # blocks (positions 51-107, ALL never graded: analytics_r6prep,
    # tpch_suite, analytics_r6b..r6m, tpch_suite2) first, then the
    # r2-block tail, then the stale round-1 greens.
    "agg_geometric_mean",
    "events_session_duration_histogram",
    "graph_label_propagation",
    "scan_rowgroup_stats_audit",
    "agg_weighted_median",
    "scan_incremental_manifest",
    "agg_trimmed_mean",
    "ts_stl_decompose_lite",
    "agg_gini_activity",
    "agg_median_abs_deviation",
    "pipeline_split_leakage_audit",
    # round-6 lead-in, continued: the TPC-H composite completion
    # (queries/tpch_suite.py, never graded)
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q12_priority_class",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_inactive_customers",
    # round-6 lead-in, continued: drift/sampling/allocation block
    # (queries/analytics_r6b.py, never graded)
    "ts_autocorrelation",
    "ts_cusum_drift",
    "agg_jensen_shannon_drift",
    "sample_reservoir_topk_hash",
    "pipeline_token_budget_alloc",
    # round-6 lead-in, continued: traversal/robust-stat/agreement
    # block (queries/analytics_r6c.py, never graded)
    "graph_bfs_levels",
    "win_rolling_median",
    "agg_cohens_kappa",
    "ts_seasonal_naive_mae",
    "tpch_q11_important_parts",
    # round-6 lead-in, continued: robust trend/outlier/card block
    # (queries/analytics_r6d.py, never graded)
    "agg_theil_sen_slope",
    "win_hampel_outlier",
    "pipeline_dataset_card_report",
    # round-6 lead-in, continued: similarity/chi2/WAU block
    # (queries/analytics_r6e.py, never graded)
    "text_source_similarity_matrix",
    "agg_chi_square_independence",
    "events_rolling_wau",
    # round-6 lead-in, continued: BPE/Mann-Whitney block
    # (queries/analytics_r6f.py, never graded)
    "text_bpe_pair_stats",
    "agg_mannwhitney_u",
    # round-6 lead-in, continued: KS drift test (analytics_r6g.py)
    # and Lloyd k-means (analytics_r6h.py, rows-only) — never graded
    "agg_ks_test",
    "vec_kmeans_lloyd",
    # round-6 lead-in, continued: weighted sampling / uptime
    # (queries/analytics_r6i.py, never graded)
    "sample_quality_weighted",
    "events_uptime_pct",
    # round-6 lead-in, continued: lift / Spearman pair
    # (queries/analytics_r6j.py, never graded)
    "events_type_cooccurrence_lift",
    "agg_spearman_corr",
    # round-6 lead-in, continued: profile / OLS / drawdown block
    # (queries/analytics_r6k.py) plus the Benford audit
    # (queries/analytics_r6l.py) — never graded
    "scan_table_profile",
    "agg_ols_two_factor",
    "ts_max_drawdown",
    "agg_benford_price_audit",
    # round-6 lead-in, continued: TPC-H completion part 2
    # (queries/tpch_suite2.py — all 22 TPC-H now covered)
    "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q16_parts_supplier_counts",
    "tpch_q20_excess_stock_suppliers",
    # round-6 lead-in, continued: consumer rebalance plan
    # (queries/analytics_r6m.py, never graded)
    "events_consumer_rebalance_plan",
    "set_intersect",
    "set_except",
    "set_intersect_all",
    "str_basic",
    "str_regex",
    "str_split_pad",
    "date_parts",
    "date_trunc_arith",
    "math_basic",
    "cond_case_coalesce",
    "cast_types",
    "json_extract_props",
    "json_to_map",
    "arr_construct_contains",
    "arr_explode",
    "arr_sort_distinct_slice",
    "arr_lambda_transform",
    "arr_lambda_filter_agg",
    "map_keys_values",
    "udf_python_scalar",
    "udf_pandas_vectorized",
    "udaf_pandas_group",
    "udtf_python",
    "dedup_exact_docs",
    "dedup_minhash_near",
    "simsearch_cosine_topk",
    "simsearch_knn_join",
    "vec_normalize_norm",
    "project_alias",
    "filter_eq",
    "filter_range_between",
    "filter_in",
    "filter_like",
    "filter_null_handling",
    "filter_boolean_combo",
    "select_distinct",
    "join_inner_broadcast",
    "join_inner_shuffle",
    "join_multiway_star",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_cross",
    "join_theta_range",
    "join_interval_events",
    "join_asof_latest_event",
    "agg_global",
    "agg_groupby_basic",
    "agg_having",
    "agg_count_distinct",
    "agg_min_max_stats",
    "agg_corr",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_conditional",
    "agg_approx_count_distinct",
]


def _reorder() -> None:
    reg = _registry.REGISTRY
    missing = [n for n in _GRADE_FIRST if n not in reg]
    if missing:  # fail loudly at import — a typo here silently ungrades a query
        raise RuntimeError(f"_GRADE_FIRST names not registered: {missing}")
    ordered = {n: reg[n] for n in _GRADE_FIRST}
    ordered.update((n, q) for n, q in reg.items() if n not in ordered)
    reg.clear()
    reg.update(ordered)


_reorder()
