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
# Round-13 front window (exactly 50 = the driver's window size), per
# VERDICT r12 item 1: ALL 23 names from r12's _ROTATION_QUEUE in queue
# order (3 never-certified + 20 function-changed by the r12 hardening
# waves, whose old certs those changes invalidated), then the age queue
# — the 17 remaining r06-era names and the 10 oldest r08-era names not
# already in the queue, both in registration order.  23 + 17 + 10 =
# exactly 50; after a green r13 the never-certified pool is EMPTY and
# no cert predates r08.  ROUND13_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. r12's full _ROTATION_QUEUE in queue order: 3 never-
    #     certified r12 additions + 20 function-changed by the r12
    #     managed/streaming/datasource hardening waves ---
    "dedup_cluster_keeper_quality",
    "sim_ivf_rebuild",
    "stream_decontamination",
    "dml_insert_append",
    "dml_delete_where",
    "dml_update_set",
    "dml_merge_upsert",
    "dml_time_travel",
    "dml_compact_files",
    "dml_schema_evolution",
    "dml_vacuum",
    "dml_change_feed",
    "dml_incremental_view",
    "dml_table_history",
    "dml_shallow_clone",
    "dml_restore_version",
    "dml_zorder_skipping",
    "pipeline_incremental_curation",
    "stream_upsert_managed",
    "stream_ttl_sessions",
    "source_python_datasource",
    "stream_python_datasource",
    "sink_python_datasource",
    # --- 2. age queue: the 17 remaining r06-era names, registration
    #     order ---
    "sim_neardup_pairs_baseline",
    "sim_neardup_lsh",
    "sim_neardup_planted",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_label_centroids",
    "events_partition_prune",
    "join_bucketed_revenue",
    "source_json_roundtrip",
    "source_csv_roundtrip",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "pipeline_corpus_curation",
    "sample_stratified",
    "sample_topk",
    "pipeline_pack_sequences",
    "text_decontamination",
    # --- 3. age queue: the 10 oldest r08-era names not already above,
    #     registration order ---
    "case_in_between",
    "math_funcs",
    "json_funcs",
    "join_null_safe",
    "stats_column_profile",
    "events_sessionize_gap",
    "events_rolling_wau",
    "events_top_paths",
    "events_markov_transitions",
    "events_attribution_last_touch",
]

# Entries added or function-changed THIS round that could not displace the
# front (the front is full).  They sit immediately after the front in
# registration order and lead the NEXT round's front.  tools/front_audit.py
# treats queue membership as "pending" for the no-name-falls-through
# invariant.  Empty at round-13 open: the full r12 queue moved into the
# front above (VERDICT r12 item 1).
_ROTATION_QUEUE: list[str] = []



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
