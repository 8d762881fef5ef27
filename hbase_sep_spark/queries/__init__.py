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

# Driver-grading prefix for round 9 (standing rotation policy; round 8
# graded exactly positions 1-50 — 50/50 green, CORRECTNESS_r08).
# Round-9 goals per VERDICT-r8: (1) drain the round-8c/8d
# changed-since-green null-sweep tail the r8 bound cut off, (2) burn
# the r1 stale pre-regeneration block, (5) re-grade the six r3°
# streaming names whose evidence predates both the regeneration and
# the round-8 source rewrite.  ast_diff effc656..HEAD enumerates 4
# changed names — PLUS the 8 json_int consumers it CANNOT see (their
# oracles are runtime f-string interpolations of json_int_sql(); a
# helper change alters the rendered SQL without touching the query
# module's AST — round-9 depth gate).  Changed-since-green leads.
# 1-4   = changed round 9 (ast-visible): join_asof_latest_event
#         (VERDICT-r8 item 4 perf fix — the click pre-dedup groupBy
#         exchange is gone; exact-ts ties resolve inside the one
#         window via the event_id sort key; 10x paired 2.24x ->
#         1.41x, 30x 0.50x; plan pinned), then the physical-layout
#         sweep fixes (multi-file row-permuted tables; 279/279 on
#         the mutated fixture): udaf_pandas_group (scan-order-
#         dependent float mean → exact integer cents, impl AND
#         oracle changed), scan_rowgroup_stats_audit (directory-
#         table audit), stream_bootstrap_then_tail (segment-aware
#         feed_total).
# 5-12  = changed round 9 (helper-driven, ast-invisible): the
#         nesting-depth gate — Jackson caps depth ~1000 and NULLs
#         the whole payload where yyjson extracts fine; gated by the
#         MAX_JSON_OPENERS length proxy in json_int/json_int_sql/
#         json_gate (a counted-repetition regex fatally
#         StackOverflows the JVM — portable.py comment).  Every
#         json consumer's impl AND rendered oracle changed:
#         events_payload_extract, filter_null_handling, cast_types,
#         agg_bitwise, agg_regr_slope, json_extract_props,
#         json_to_map, map_lambda_ops.  279/279 on the
#         depth-augmented hostile fixture; zero gate hits on clean
#         data (outputs provably unchanged at fixture scale — same
#         strict-rule placement as the r6 hash-hardened block).
# 13-30 = the 18 round-8c/8d null-sweep-changed names the r8 bound
#         displaced (impl AND oracle changed — two-sided null-time /
#         null-key drops — their current form has never been
#         driver-graded).
# 31-50 = the r1° stale block, oldest evidence in the repo (first 20
#         of 25 sql-hash names; the agg tail and
#         agg_approx_count_distinct rotate behind).
# --- bound ---
# 51-55 = the last five r1° names (agg_min_max_stats, agg_corr,
#         agg_rollup, agg_cube, agg_grouping_sets — lead round 10),
# 56-61 = the six r3° streaming rows-only names (VERDICT-r8 item 5
#         allows round-10), then
# 62+   = agg_approx_count_distinct (rows-only r1), the rows-only
#         r7-changed vector/scan names (local oracle/property
#         evidence strong), the stale r2 tail (18), then the r3
#         block remainder in grade-age order; r4-r8 greens follow in
#         registration order.  All prefix names re-verified against
#         the local oracle on current data before commit
#         (tests.harness + chunked plain-session sweep).
_GRADE_FIRST = [
    # changed round 9 (single-exchange as-of plan + layout sweep)
    "join_asof_latest_event",
    "udaf_pandas_group",
    "scan_rowgroup_stats_audit",
    "stream_bootstrap_then_tail",
    # changed round 9 via the json_int depth gate (helper-driven;
    # ast_diff-invisible — see comment block above)
    "events_payload_extract",
    "filter_null_handling",
    "cast_types",
    "agg_bitwise",
    "agg_regr_slope",
    "json_extract_props",
    "json_to_map",
    "map_lambda_ops",
    # round-8c/8d null-sweep changed, displaced past the r8 bound —
    # never driver-graded in their current two-sided-null-drop form
    "win_moving_avg",
    "win_first_last",
    "win_sessionize_batch",
    "win_funnel_conversion",
    "win_nth_value",
    "win_period_over_period",
    "win_conditional_reset_sum",
    "win_leave_one_out_avg",
    "win_streak_longest",
    "win_hampel_outlier",
    "events_transition_matrix",
    "events_order_repair",
    "events_incremental_agg_merge",
    "events_session_duration_histogram",
    "ts_ewma_halflife",
    "ts_max_drawdown",
    "agg_spearman_corr",
    "agg_theil_sen_slope",
    # stale round-1 greens (graded once, pre-regeneration data)
    "project_alias",
    "filter_eq",
    "filter_range_between",
    "filter_in",
    "filter_like",
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
    "agg_having",
    "agg_count_distinct",
    # --- ~50-entry grading boundary; positions below pay off only if
    # the driver's bound is larger, and set the round-10 queue order.
    "agg_min_max_stats",
    "agg_corr",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    # r3° streaming rows-only (VERDICT-r8 item 5: evidence predates
    # the regeneration and the r8 sep_events source rewrite)
    "stream_tumbling_count",
    "stream_sliding_avg",
    "stream_session_window",
    "stream_watermark_late",
    "stream_static_join",
    "stream_foreach_batch_sink",
    "agg_approx_count_distinct",
    # rows-only changed-since-green (r7 vector hardening + scan
    # refactors): driver check is rows-only, re-grade adds little
    # over local oracle/property evidence (round-6/7 precedent).
    "simsearch_ivf_coarse",
    "simsearch_quantized_rerank",
    "vec_pca_project",
    "vec_kmeans_lloyd",
    "scan_incremental_manifest",
    # stale round-2 greens (sets tail, scalars, semistructured, UDFs,
    # LLM ops)
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
    "arr_construct_contains",
    "arr_explode",
    "arr_sort_distinct_slice",
    "udf_python_scalar",
    "udf_pandas_vectorized",
    "udtf_python",
    "dedup_minhash_near",
    # round-3 greens in their r3 grading order (the next-stalest)
    "text_tokenize_wordcount",
    "text_ngrams",
    "text_tfidf",
    "text_lang_filter_stats",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_langid_heuristic",
    "text_quality_score",
    "dedup_clusters",
    "sample_stratified_docs",
    "text_chunk_documents",
    "text_redact_numbers",
    "reshape_pivot",
    "reshape_unpivot",
    "subq_scalar_correlated",
    "subq_in_uncorrelated",
    "agg_approx_percentile",
    "join_range_binned",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "source_schema_evolution",
    "stream_latest_op_wins",
    "stream_stream_interval_join",
    "stream_incremental_upsert_view",
    "agg_collect_sorted",
    "pipeline_sequence_pack",
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
