#!/usr/bin/env python
"""Generate COVERAGE.md from the live registry: one row per
registered query — the artifact for checking SURVEY.md §2 line by
line. Rerun after adding operators: python scripts/gen_coverage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_sep_spark.registry import load_all

SURVEY_NAMES = set(
    """scan_parquet scan_events_feed events_payload_extract events_table_filter
    events_latest_per_key events_dedup_redelivery events_per_key_ordered
    stream_sep_source sink_parquet_roundtrip project_alias filter_eq
    filter_range_between filter_in filter_like filter_null_handling
    filter_boolean_combo select_distinct join_inner_broadcast
    join_inner_shuffle join_multiway_star join_left_outer join_right_outer
    join_full_outer join_left_semi join_left_anti join_cross join_theta_range
    join_interval_events join_asof_latest_event agg_global agg_groupby_basic
    agg_having agg_count_distinct agg_approx_count_distinct agg_min_max_stats
    agg_median_percentile agg_corr agg_rollup agg_cube agg_grouping_sets
    agg_collect_sorted agg_conditional win_row_number win_rank_dense win_ntile
    win_lag_lead win_running_sum win_moving_avg win_first_last
    win_percent_rank_cume win_range_frame sort_multi_nulls limit_topn
    topk_per_group set_union_all set_union_distinct set_intersect set_except
    set_intersect_all str_basic str_regex str_split_pad date_parts
    date_trunc_arith math_basic cond_case_coalesce cast_types
    json_extract_props json_to_map arr_construct_contains arr_explode
    arr_sort_distinct_slice arr_lambda_transform arr_lambda_filter_agg
    map_keys_values stream_tumbling_count stream_sliding_avg
    stream_session_window stream_watermark_late stream_dedup_watermark
    stream_stateful_latest stream_static_join stream_foreach_batch_sink
    dedup_exact_docs dedup_minhash_near simsearch_cosine_topk
    simsearch_knn_join vec_normalize_norm text_tokenize_wordcount text_ngrams
    text_tfidf text_lang_filter_stats multimodal_struct_cols udf_python_scalar
    udf_pandas_vectorized udaf_pandas_group udtf_python""".split()
)


def main() -> None:
    registry = load_all()
    lines = [
        "# COVERAGE — generated from the query registry",
        "",
        "Run `python scripts/gen_coverage.py` to regenerate.",
        "",
        f"**{len(registry)} queries**: "
        f"{sum(1 for q in registry.values() if q.name in SURVEY_NAMES)}/97 SURVEY §2 names, "
        f"{sum(1 for q in registry.values() if q.name not in SURVEY_NAMES)} extensions; "
        f"{sum(1 for q in registry.values() if q.oracle)} sql-hash (DuckDB oracle), "
        f"{sum(1 for q in registry.values() if not q.oracle)} rows-only.",
        "",
        "| query | §2 | check | summary |",
        "|---|---|---|---|",
    ]
    missing = SURVEY_NAMES - set(registry)
    for name in sorted(registry):
        q = registry[name]
        doc = (q.fn.__doc__ or "").strip().splitlines()
        summary = doc[0].rstrip(".") if doc else ""
        inv = q.section if name in SURVEY_NAMES else f"ext ({q.section})"
        check = "sql-hash" if q.oracle else "rows-only"
        lines.append(f"| `{name}` | {inv} | {check} | {summary} |")
    if missing:
        lines += ["", f"**MISSING SURVEY NAMES: {sorted(missing)}**"]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(registry)} queries, missing={sorted(missing) or 'none'}")


if __name__ == "__main__":
    main()
