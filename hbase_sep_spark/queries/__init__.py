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
    analytics_r12,
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

# Driver-grading prefix for round 13 (standing rotation policy;
# round 12 graded exactly positions 1-50 — 50/50 green,
# CORRECTNESS_r12: the seventh consecutive 50/50 round, zero
# failures ever; nothing flagged, nothing cut off by the bound).
# Changed-since-green enumeration for round 13 (ast_diff 9cc4f31..
# HEAD + the helper-consumer grep): AST-changed =
# dedup_minhash_incremental_upsert (ADVICE-r12 fixes: data-derived
# fresh-id offset + digest-keyed scratch store), the five
# streaming queries whose pinned batch_size became the
# feed-proportional _scaled_bs, and scan_incremental_manifest
# (digest-keyed landing dir, same ADVICE class); ast-INVISIBLE =
# every other stream_* query — sources/sep_events.py was rewritten
# this round (arrow-RecordBatch read() over the shared normalized
# _read_table, feed-proportional auto rate limit), which dirties
# all 18 source consumers without touching their query-module AST.
# Graded-SF outputs re-verified bit-identical (harness row counts
# match CORRECTNESS_r12 exactly; sf0.01 rate limits unchanged by
# construction — floors bind at every feed ≤ 10k rows).
# 1     = dedup_minhash_incremental_upsert (ADVICE-r12, changed).
# 2-19  = ALL 18 stream_* names (source rewrite), registration order.
# 20    = scan_incremental_manifest (digest-key change).
# 21    = udf_pandas_vectorized (optimization session: fan-out count
#         derived from io.table_rows — graded-SF plan bit-identical,
#         plan-pinned; OPTIMIZATION_r13.md C7).
# 22-31 = the ten r5°-evidence names (the oldest in the registry —
#         VERDICT-r12 item 1's queue).
# 32-50 = the first nineteen r6°-evidence names by registration order.
# --- bound ---
# 51+   = round-14 queue: tpch_q11_important_parts (displaced by the
#         position-21 insertion), then the TEN remaining r6° names
#         (text_source_similarity_matrix, agg_chi_square_independence,
#         events_rolling_wau, text_bpe_pair_stats, scan_table_profile,
#         tpch_q2/q6/q9/q16/q20), then r7° greens by registration
#         order — and as always: anything CORRECTNESS_r13 flags or
#         its bound cuts off leads, then anything changed-since-green
#         in round 14 (ast_diff + the helper-consumer grep, never
#         memory).
# All prefix names re-verified against the local oracle on current
# data under two shuffle configs + a chunked plain-session driver
# sim before the round ends (tests.harness + plain_session_sweep.py).
_GRADE_FIRST = [
    # 1: ADVICE-r12 fixes (changed-since-green)
    "dedup_minhash_incremental_upsert",
    # 2-19: all 18 sep_events-source consumers (source rewritten
    # round 13: arrow-batch read + feed-proportional rate limit),
    # registration order
    "stream_sink_exactly_once_audit",
    "stream_multi_subscription_fanout",
    "stream_bootstrap_then_tail",
    "stream_static_join",
    "stream_foreach_batch_sink",
    "stream_sep_source",
    "stream_tumbling_count",
    "stream_sliding_avg",
    "stream_session_window",
    "stream_watermark_late",
    "stream_dedup_watermark",
    "stream_stateful_latest",
    "stream_latest_op_wins",
    "stream_stream_interval_join",
    "stream_incremental_upsert_view",
    "stream_scd2_maintain",
    "stream_anomaly_score",
    "stream_windowed_distinct_hll",
    # 20: digest-keyed landing dir (ADVICE-r12 class, changed)
    "scan_incremental_manifest",
    # 21: changed in the round-13 optimization session — the Arrow
    # fan-out repartition count is now derived from the orders footer
    # row count (floor 8 ⇒ the graded-SF plan is bit-identical,
    # pinned by tests/test_plans.py; OPTIMIZATION_r13.md C7)
    "udf_pandas_vectorized",
    # 22-31: the ten r5°-evidence names (oldest evidence; VERDICT-r12
    # item 1), registration order
    "text_zipf_fit",
    "pipeline_domain_mix_report",
    "layout_file_sizing_audit",
    "join_shuffle_hash_hint",
    "agg_heavy_hitters_exact",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "join_lateral_topk",
    "set_union_by_name_evolved",
    # 32-50: the first nineteen r6°-evidence names, registration
    # order (tpch_q11 displaced past the boundary by the
    # udf_pandas_vectorized insertion — it leads the round-14 queue)
    "graph_label_propagation",
    "agg_weighted_median",
    "agg_gini_activity",
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
    "agg_jensen_shannon_drift",
    "pipeline_token_budget_alloc",
    "graph_bfs_levels",
    "agg_cohens_kappa",
    # --- 50-entry grading boundary; below = round-14 queue ---
    "tpch_q11_important_parts",
    "text_source_similarity_matrix",
    "agg_chi_square_independence",
    "events_rolling_wau",
    "text_bpe_pair_stats",
    "scan_table_profile",
    "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q16_parts_supplier_counts",
    "tpch_q20_excess_stock_suppliers",
]


def _reorder() -> None:
    reg = _registry.REGISTRY
    missing = [n for n in _GRADE_FIRST if n not in reg]
    if missing:  # fail loudly at import — a typo here silently ungrades a query
        raise RuntimeError(f"_GRADE_FIRST names not registered: {missing}")
    if len(set(_GRADE_FIRST)) != len(_GRADE_FIRST):
        dupes = sorted({n for n in _GRADE_FIRST if _GRADE_FIRST.count(n) > 1})
        # a duplicate's second entry is DEAD (first-wins) — the queue
        # it appears to define doesn't exist; fail loudly instead
        raise RuntimeError(f"_GRADE_FIRST has duplicate names: {dupes}")
    ordered = {n: reg[n] for n in _GRADE_FIRST}
    ordered.update((n, q) for n, q in reg.items() if n not in ordered)
    reg.clear()
    reg.update(ordered)


_reorder()
