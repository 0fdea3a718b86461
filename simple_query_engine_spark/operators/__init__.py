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
# Round-15 front window (exactly 50 = the driver's window size), per
# VERDICT r14 item 1: the 4 names queued at r14 close (3 semantic
# changes + 1 never-certified new entry) lead the front, followed by
# the age queue — all 21 names whose newest green cert is r09 (they
# would cross front_audit's MAX_CERT_AGE = 6 bar at r16) and the 25
# oldest r10-era names, in registration order.  4 + 21 + 25 = exactly
# 50; after a green r15 the oldest surviving cert is r10 (23 names,
# scheduled for the r16 front alongside the oldest r11 certs).
# ROUND15_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. the r14 close queue: 3 stats_columns semantic changes +
    #     the real-bytes PPM decode entry (never certified) ---
    "dml_merge_upsert",
    "stream_upsert_managed",
    "pipeline_incremental_curation",
    "multimodal_ppm_decode",
    # --- 2. age queue: all 21 r09-era certs, registration order ---
    "date_funcs",
    "subquery_above_avg",
    "distinct_rows",
    "join_fuzzy_blocked",
    "dedup_keep_latest",
    "sim_sq_rerank",
    "sim_pq_rerank",
    "join_dpp_partitioned",
    "stream_static_enrich",
    "stream_dedup_within_watermark",
    "stream_watermark_late_drop",
    "window_tumbling_counts",
    "window_sliding_counts",
    "window_session_counts",
    "pipeline_quality_prune_curve",
    "sketch_kmv_overlap",
    "udf_grouped_map_zscore",
    "zscore_window",
    "udaf_weighted_avg",
    "udtf_bigrams",
    "join_salted_skew",
    # --- 3. age queue: the 25 oldest r10-era certs, registration
    #     order ---
    "join_asof",
    "funnel_conversion",
    "agg_correlation",
    "join_range",
    "pivot_status",
    "sample_hash",
    "agg_stats",
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
    "window_range_frame",
    "window_distribution",
    "agg_string_concat",
    "events_time_rollup",
    "conditional_funcs",
    "bitwise_funcs",
    "regexp_count_funcs",
    "window_value_picks",
]

# Entries added or function-changed THIS round that could not displace the
# front (the front is full).  They sit immediately after the front in
# registration order and lead the NEXT round's front.  tools/front_audit.py
# treats queue membership as "pending" for the no-name-falls-through
# invariant.  At round-14 open the queue holds only names whose entry
# functions r14 changes semantically (VERDICT r13 items 2/4); the r13
# close left it empty.
_ROTATION_QUEUE: list[str] = [
    # VERDICT r14 item 2: the kNN family quantizer is now ADAPTIVE
    # (K = max(floor, ⌊√N⌋) — `_adaptive_k` in operators/similarity.py),
    # retiring the measured O(N²/K) growth at fixed K.  knn_graph /
    # knn_density results change at every SF (K 8→22/44); semdedup's
    # floor (64) still binds locally so its results are unchanged, but
    # the function changed → re-certify all three in the r16 front.
    "sim_knn_graph",
    "sim_knn_density",
    "sim_semdedup",
    # VERDICT r14 item 3: new entry — trained adaptive-K IVF recall on
    # the derived CLUSTERABLE planted corpus (never certified).  Proves
    # the r14 recall@10 ≈ 0.49 was the near-orthogonal fixture, not the
    # index: planted recall = 1.0 at every SF.
    "sim_recall_floor_planted",
    # VERDICT r14 item 4: the standing-cluster state is now a persisted
    # managed-table snapshot (`_standing_labels_managed`) read by every
    # later run — values identical (oracle unchanged, equal-to-full-
    # recompute test still green), but the function changed → re-certify.
    "graph_components_incremental",
]



def _rotated(merged: dict) -> dict:
    ordered = {}
    for name in _ROTATION_FRONT + _ROTATION_QUEUE:
        if name in merged:  # oracle dicts may lack rows-only entries
            ordered[name] = merged.pop(name)
    ordered.update(merged)
    return ordered


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for module in _modules():
        merged.update(module.QUERIES)
    missing = [n for n in _ROTATION_FRONT + _ROTATION_QUEUE if n not in merged]
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
