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
# Round-12 front window (exactly 50 = the driver's window size), per
# VERDICT r11 items 1 and 2: ALL 39 never-certified names from r11's
# post-close waves (the full r11 _ROTATION_QUEUE, in queue order), then
# the age queue — the 11 oldest r06-era names in registration order
# (17 r06 names remain for r13).  39 + 11 = exactly 50; after a green
# r12 every catalog name has faced the driver's oracle at least once
# except those 17, and no cert predates r06.  ROUND12_NOTES.md tracks
# the ledger.
_ROTATION_FRONT = [
    # --- 1. never driver-certified: r11's three post-close waves, in
    #     queue order (VERDICT r11 item 1) ---
    "dedup_substring_spans",
    "sim_semdedup",
    "text_quality_classifier",
    "pipeline_dsir_weights",
    "text_bm25_search",
    "sim_hybrid_retrieval",
    "stream_bm25_postings",
    "graph_kcore_neardup",
    "sim_knn_graph",
    "pipeline_mixture_sample",
    "dedup_cdc_chunks",
    "stream_mixture_sample",
    "sim_ivf_delete_topk",
    "sim_ivfadc_topk",
    "graph_components_incremental",
    "text_gopher_quality",
    "sim_knn_density",
    "sim_multiprobe_lsh",
    "graph_label_spread",
    "sim_range_search",
    "sim_diverse_topk",
    "join_interval_overlap",
    "multimodal_clip_pairs",
    "stream_clip_ingest",
    "sim_centroid_balance",
    "stats_source_overlap",
    "agg_weighted_median",
    "events_ema_features",
    "stats_k_anonymity",
    "text_decontamination_fuzzy",
    "events_forecast_holt",
    "events_new_vs_returning",
    "source_csv_dialect",
    "events_wow_growth",
    "agg_histogram_numeric",
    "stats_token_gini",
    "sim_power_iteration",
    "text_boilerplate_templates",
    "sketch_kmv_union",
    # --- 2. age queue: the 11 oldest r06-era names in registration
    #     order (17 r06 names remain for r13) ---
    "dedup_exact",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_planted_minhash",
    "dedup_incremental_minhash",
    "dedup_containment_planted",
    "dedup_simhash",
    "text_dup_ngram_coverage",
    "sim_topk_bruteforce",
]

# Entries added or function-changed THIS round that could not displace the
# front (the front is full).  They sit immediately after the front in
# registration order and lead the NEXT round's front.  tools/front_audit.py
# treats queue membership as "pending" for the no-name-falls-through
# invariant.
_ROTATION_QUEUE: list[str] = [
    # new in round 12
    "dedup_cluster_keeper_quality",
    "sim_ivf_rebuild",
    "stream_decontamination",
    # function-changed in round 12 (managed.py hardening: SQL NULL delete
    # semantics, atomic manifest commit, merge source materialization +
    # schema/duplicate-key parity guards, absolute-path normalization) —
    # all re-gated green locally at the close; queued for driver re-cert
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
    # function-changed in round 12 (streaming/datasource hardening:
    # watermark-proof TTL-session emission over pending intervals,
    # manifest-sink append merge + schema carriage, offset-regression
    # guard) — re-gated green locally; queued for driver re-cert
    "stream_ttl_sessions",
    "source_python_datasource",
    "stream_python_datasource",
    "sink_python_datasource",
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
