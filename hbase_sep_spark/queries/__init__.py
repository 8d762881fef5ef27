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

# Driver-grading prefix for round 8 (standing rotation policy; round 7
# graded exactly positions 1-50 — 50/50 green, CORRECTNESS_r07, which
# cleared the never-graded debt entirely).  Round-8 goals per
# VERDICT-r7: (1) burn the 100-name stale pre-regeneration-green debt,
# (4) land the SEP streaming core in the bound; per ADVICE-r7 item 2:
# changed-since-green outranks stale-green, so the round-7 fin()-gate
# changes lead.
# 1-8   = changed THIS round (round 8): source_csv_roundtrip
#         (splittable newline-token writer replaces multiLine),
#         agg_skew_kurtosis_portable (out-of-envelope degrades to
#         NULL instead of ANSI throw), agg_histogram (+0.0
#         negative-zero normalization on bin_min/bin_max),
#         json_to_map (duplicate-key payloads → NULL map both sides,
#         round-8 dupkey sweep), agg_bitmap_distinct_users (floor-mod
#         bit/bucket pair), join_skew_salted (floor-mod salt — the
#         silent-drop fix), multimodal_frame_sample (oracle floor-mod
#         frame_sig) — the last three from the round-8 negative-id
#         sweep — and text_token_count (explicit whitespace class
#         replaces the Java-vs-RE2-divergent \s, round-8
#         control-char sweep).
# 9-16  = changed round 8b (the lenient-JSON-parser sweep):
#         portable.json_int/json_int_sql grew the HOSTILE_JSON_RE
#         byte-identical gate (raw control chars, surrogate escapes,
#         NaN/Infinity literals, trailing commas, structural single
#         quotes — six probed silent divergences between Jackson and
#         yyjson), and every consumer oracle now interpolates
#         json_int_sql() instead of hand-copying the guard: impl AND
#         oracle changed for events_payload_extract,
#         filter_null_handling, cast_types, agg_bitwise,
#         agg_regr_slope, json_extract_props, map_lambda_ops (and
#         json_to_map, already at position 4).  text_fingerprint
#         closes the NUL-text class (DuckDB sha256 hashes wrong bytes
#         on composed NUL strings — NUL-sentinel substitution at the
#         scan edge, both sides); source_csv_roundtrip (position 1)
#         additionally gained the NUL token + trim-disabled options.
# 17-28 = round-7 fin()-gate changes never re-graded (the ADVICE-r7
#         item-2 list plus agg_conditional and sink_parquet_roundtrip,
#         which the same git diff shows changed in r7) — impl AND
#         oracle changed, highest re-grade value.
# 29-33 = round-6 hash-hardened greens (overflow-safe knuth_hash),
#         changed r6 and displaced past the bound twice — outputs
#         provably unchanged at fixture scale, but still
#         changed-since-green by the strict rule.
# 34-38 = rows-only priority: simsearch_lsh_bucketed (round-8
#         shuffle fix, VERDICT-r7 item 3 — value-hash proven
#         unchanged locally under two shuffle configs; id-pair
#         distinct measured 9.9× lighter at 100× data) and the SEP
#         semantics core VERDICT-r7 item 4 names in the bound
#         (stream_sep_source / stream_stateful_latest /
#         stream_dedup_watermark, driver evidence r3/pre-regen) —
#         all three changed AGAIN in round 8c (the source now
#         dead-letters NULL event-times; NaT crashed the Python
#         DataSource) — plus stream_bootstrap_then_tail (its
#         boundary read crashed on a NULL-ts boundary row).
# 39-50 = changed rounds 8c/8d (the null-ts sweep — 52 of 279
#         queries failed on a NULL-event-time feed, fixed with the
#         two-sided null-time drop — and the null-keys sweep — 23
#         failed on NULL user_id/event_type/lang, fixed per
#         scripts/gen_nullkeys_fixture.py's inventory): the §2
#         operators and the as-of/PIT family lead
#         (join_asof_latest_event — ALSO the stalest r1 green —
#         win_row_number/lag_lead/running_sum,
#         events_per_key_ordered/scd2_history, join_asof_nearest,
#         join_pit_scd2, agg_argmax_misc, map_keys_values,
#         win_running_distinct, ts_weekly_ohlc). Seven more
#         null-ts-changed names already sit in the 17-28 r7 block
#         (ts_autocorrelation, ts_cusum_drift, ts_rolling_zscore,
#         ts_seasonal_naive_mae, ts_stl_decompose_lite,
#         win_rolling_median, events_compact_changelog — changed in
#         BOTH sweeps); agg_kmv_distinct_sketch (null-keys-changed)
#         sits in the 29-33 r6 block.
# --- bound ---
# 51+   = the remaining 17 round-8c null-ts-changed names, the stale
#         r1 block (now fully past the bound — the null-ts changes
#         outrank it per the changed-since-green policy), the
#         remaining rows-only changed-since-green (r7 vector/scan
#         members — rows-only re-grades add little over the local
#         oracle/property evidence, round-6/7 precedent), the stale
#         r2 tail, then the r3 block in grade-age order; r4-r7
#         greens follow in registration order.  All prefix names
#         re-verified against the local oracle on current data
#         before commit (tests.harness + plain-session sweep).
_GRADE_FIRST = [
    # changed round 8
    "source_csv_roundtrip",
    "agg_skew_kurtosis_portable",
    "agg_histogram",
    "json_to_map",
    "agg_bitmap_distinct_users",
    "join_skew_salted",
    "multimodal_frame_sample",
    "text_token_count",
    # changed round 8b (lenient-JSON-parser gate on json_int/json_int_sql
    # and every consumer oracle; NUL-sentinel fingerprint; NUL-safe CSV
    # trip rides the source_csv_roundtrip entry above)
    "events_payload_extract",
    "filter_null_handling",
    "cast_types",
    "agg_bitwise",
    "agg_regr_slope",
    "json_extract_props",
    "map_lambda_ops",
    "text_fingerprint",
    # changed round 7 (fin() non-finite gate), never re-graded
    "agg_conditional",
    "agg_geometric_mean",
    "agg_ks_test",
    "agg_mannwhitney_u",
    "events_compact_changelog",
    "sink_parquet_roundtrip",
    "ts_autocorrelation",
    "ts_cusum_drift",
    "ts_rolling_zscore",
    "ts_seasonal_naive_mae",
    "ts_stl_decompose_lite",
    "win_rolling_median",
    # changed round 6 (hash hardening), never re-graded
    "agg_cms_freq_sketch",
    "pipeline_dataset_split",
    "agg_kmv_distinct_sketch",
    "sample_bernoulli_hash",
    "pipeline_mixture_sample",
    # rows-only: round-8 LSH shuffle fix + the SEP streaming core
    # (the source itself changed AGAIN in round 8c: NULL event-times
    # are dead-lettered at the transport edge — NaT crashed the
    # Python DataSource row converter) + the boundary-read fix
    "simsearch_lsh_bucketed",
    "stream_sep_source",
    "stream_stateful_latest",
    "stream_dedup_watermark",
    "stream_bootstrap_then_tail",
    # changed round 8c (null-ts sweep: time-ordered operators drop
    # null-time rows on both sides; 36 sql-hash queries changed —
    # the §2 operators and the as-of/PIT/SEP-semantics family take
    # the in-bound slots, the rest queue just past it)
    "join_asof_latest_event",
    "win_row_number",
    "win_lag_lead",
    "win_running_sum",
    "events_per_key_ordered",
    "events_scd2_history",
    "join_asof_nearest",
    "join_pit_scd2",
    "agg_argmax_misc",
    # changed round 8d (null-keys sweep): the two names not already
    # in the bound above (agg_argmax_misc, agg_kmv_distinct_sketch
    # and the as-of family changed in BOTH null sweeps and already
    # sit in-bound)
    "map_keys_values",
    "win_running_distinct",
    "ts_weekly_ohlc",
    # --- ~50-entry grading boundary; positions below pay off only if
    # the driver's bound is larger, and set the round-9 queue order.
    # remaining round-8c null-ts-changed names
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
    "agg_min_max_stats",
    "agg_corr",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
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
    "udaf_pandas_group",
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
    "stream_tumbling_count",
    "stream_sliding_avg",
    "stream_session_window",
    "stream_watermark_late",
    "stream_latest_op_wins",
    "stream_static_join",
    "stream_foreach_batch_sink",
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
