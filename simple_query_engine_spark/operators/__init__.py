"""Operator catalog.

Each submodule exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → equivalent DuckDB SQL, or absent for
non-SQL-expressible operators).  ``__spark_entry__.py`` merges them into the
driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver's per-round correctness gate records verdicts for the FIRST 50
# entries of ``queries()`` in registration order (verified against
# CORRECTNESS_r01/r02: both files hold exactly entries 1-50).  The catalog is
# larger than the window, so we rotate: ``_ROTATION_FRONT`` pins the queries
# that have not yet received a driver verdict to the front of the dict;
# everything else (already green in CORRECTNESS_r01/r02) follows in module
# order.  ROUND3_NOTES.md tracks which round certified which query.
#
# Round-8 front window (exactly 50 = the driver's window size), in
# priority order (the r08 queue laid out in ROUND7_NOTES.md):
#   1. the queries added THIS round (quality.py analytics suite, plus any
#      later additions — each new entry displaces one tail name);
#   2. function-level re-certs: events_sessionize_gap (its gap-labeling
#      block was refactored into the shared _labeled_events helper in r07;
#      the helper itself is r07-certified via markov + top_paths, this
#      re-certifies the original consumer);
#   3. the 16 r01/r02-stale names displaced from the r07 front by that
#      round's new-query growth;
#   4. the age queue oldest-first: relational2 ×10 (r01), relational3 ×4
#      (r02), then relational4 (r04/r05, minus the two r07-certified
#      names) and udx (r03) as slots remain.  Still queued for r09+:
#      the rest of relational4/udx, multimodal ×4, dml ×5, remaining
#      streaming, then the r06/r07-certified bulk.
# ROUND8_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. added this round ---
    "stats_expectations",
    "stats_drift_psi",
    "events_rfm_segments",
    "events_trailing_features",
    "text_zipf_slope",
    "text_ngram_novelty",
    "graph_triangles_neardup",
    "sim_sq_rerank",
    "storage_zorder_prune",
    "pipeline_url_dedup",
    "events_rolling_wau",
    "stream_watermark_late_drop",
    # --- 2. function-changed re-certs (1) ---
    "events_sessionize_gap",
    # --- 3. displaced from the r07 front (16, r01/r02 certs) ---
    "case_in_between",
    "math_funcs",
    "json_funcs",
    "subquery_above_avg",
    "distinct_rows",
    "set_except",
    "string_funcs",
    "date_funcs",
    "set_intersect",
    "set_union",
    "sort_topk",
    "sort_multi_key",
    "window_rank_dense",
    "window_lag_lead",
    "window_running_sum",
    "window_topn_per_group",
    # --- 4a. age queue: relational2 (10, r01) ---
    "array_funcs",
    "union_by_name",
    "null_handling",
    "grouping_sets",
    "udf_pandas_score",
    "string_advanced",
    "date_advanced",
    "subquery_in",
    "agg_approx_distinct",
    "agg_quantile_sketch",
    # --- 4b. age queue: relational3 (4, r02) ---
    "window_range_frame",
    "window_distribution",
    "agg_string_concat",
    "events_time_rollup",
    # --- 4c. age queue: relational4 (r04/r05) + udx (r03) fill the rest ---
    "conditional_funcs",
    "agg_percentiles_exact",
    "bitwise_funcs",
    "regexp_count_funcs",
    "window_value_picks",
    "map_funcs",
    "variant_funcs",
    "agg_mode_median",
]


def _rotated(merged: dict) -> dict:
    ordered = {}
    for name in _ROTATION_FRONT:
        if name in merged:  # oracle dicts may lack rows-only entries
            ordered[name] = merged.pop(name)
    ordered.update(merged)
    return ordered


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for module in _modules():
        merged.update(module.QUERIES)
    missing = [n for n in _ROTATION_FRONT if n not in merged]
    if missing:  # typo guard: every front entry must exist in the catalog
        raise KeyError(f"_ROTATION_FRONT names not in catalog: {missing}")
    return _rotated(merged)


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for module in _modules():
        merged.update(module.ORACLES)
    return _rotated(merged)


def _modules():
    from simple_query_engine_spark.operators import (
        curation,
        dedup,
        dml,
        multimodal,
        parity,
        quality,
        relational,
        pipeline,
        relational2,
        relational3,
        relational4,
        replq,
        sessions,
        similarity,
        storage,
        streaming_ops,
        text,
        tpch,
        udx,
    )

    return (
        parity,
        relational,
        relational2,
        relational3,
        relational4,
        sessions,
        tpch,
        text,
        dedup,
        similarity,
        storage,
        streaming_ops,
        multimodal,
        pipeline,
        curation,
        quality,
        udx,
        dml,
        replq,
    )
