"""Graded query implementations, one module per SURVEY.md §2 block.

Importing this package registers every batch query into
`hbase_sep_spark.registry.REGISTRY`.

Registration order IS the driver's grading order, and the driver
grades a bounded prefix (~50 entries per round).  The EXPLICIT
`_GRADE_FIRST` list below — not module import order — determines the
prefix.  Policy each round: never-graded names first, then any
sql-hash query whose implementation or oracle changed since its last
green grade, then the stalest old greens for regression
re-confirmation.  New queries added mid-round go after the ~50
boundary and rotate to the front next round.
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

# Driver-grading prefix for round 4 (VERDICT r3 item 1 + ADVICE):
# 1-11  = the 11 round-3 additions never driver-graded (were at 51-61),
# 12-16 = sql-hash queries whose implementation OR oracle changed after
#         their last green grade (must re-enter the prefix per the
#         project invariant): win_running_sum / win_range_frame /
#         agg_median_percentile (changed r3 after r2 grade, flagged by
#         ADVICE), pipeline_sequence_pack + pipeline_training_prep
#         (shard-key NULL fix this round),
# 17-43 = 27 round-4 additions (never graded — inside the prefix so
#         CORRECTNESS_r04 covers them; with a 50-bound the only
#         never-graded queries left after round 4 are the five at
#         positions 51-55: sql_recursive_cte, win_period_over_period,
#         events_transition_matrix, events_hourly_seasonality,
#         agg_skew_kurtosis_portable),
# 44-50 = oldest driver-greens (round-1 set) for regression
#         re-confirmation of stale grades; the rest of the r1 set
#         follows the boundary and rotates in next round.
_GRADE_FIRST = [
    # never graded (round-3 additions)
    "text_contamination_check",
    "win_funnel_conversion",
    "multimodal_frame_sample",
    "join_asof_tolerance",
    "agg_hll_sketch_union",
    "vec_pca_project",
    "agg_mode_exact",
    "join_nullsafe_eq",
    "scalar_try_safe_arith",
    "events_compact_changelog",
    "sample_bernoulli_hash",
    # changed since last green grade
    "win_running_sum",
    "win_range_frame",
    "agg_median_percentile",
    "pipeline_sequence_pack",
    "pipeline_training_prep",
    # never graded (round-4 additions, both batches)
    "events_retention_cohort",
    "win_streak_longest",
    "text_entropy_score",
    "text_repetition_ratio",
    "pipeline_mixture_sample",
    "vec_centroid_distance",
    "dedup_keep_best",
    "graph_pagerank",
    "ts_daily_gapfill_ffill",
    "ts_linear_interpolate",
    "agg_cms_freq_sketch",
    "pipeline_dataset_split",
    "dedup_containment_ngram",
    "agg_kmv_distinct_sketch",
    "ts_rolling_zscore",
    "vec_matryoshka_truncate",
    "dedup_clusters_exact",
    "stream_scd2_maintain",
    "stream_anomaly_score",
    "join_asof_nearest",
    "agg_weighted_avg",
    "win_pct_of_total",
    "events_cdc_net_changes",
    "stream_windowed_distinct_hll",
    "pipeline_vocab_coverage",
    "join_pit_scd2",
    "events_silence_alert",
    # stale round-1 greens, oldest grades first
    "scan_parquet",
    "scan_events_feed",
    "events_payload_extract",
    "events_table_filter",
    "events_latest_per_key",
    "events_dedup_redelivery",
    "events_per_key_ordered",
    # --- ~50-entry grading boundary (driver grades a bounded prefix).
    # Positions 51+ cost nothing and pay off if the bound is larger:
    # first the one post-boundary round-4 addition (rotate forward
    # next round), then the remaining stale round-1/round-2 greens.
    "sql_recursive_cte",
    "win_period_over_period",
    "events_transition_matrix",
    "events_hourly_seasonality",
    "agg_skew_kurtosis_portable",
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
