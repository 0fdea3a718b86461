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
# Round-11 front window (exactly 50 = the driver's window size), per
# VERDICT r10 items 1 and 7: the 4 never-certified round-10 additions
# (including sim_ivf_trained_topk, restored to the rotation after the
# front_audit FAIL), the 8 entries new in round 11, the 2 r10
# function-changed re-certs, then the age queue — all 15 r05-era names
# and the 21 oldest r06-era names.  4 + 8 + 2 + 15 + 21 = exactly 50;
# after this round the oldest cert anywhere in the catalog is r06.
# ROUND11_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. never driver-certified: the 4 round-10 additions (queued by
    #     r10's _ROTATION_QUEUE; sim_ivf_trained_topk restored per VERDICT
    #     r10 item 1) ---
    "pipeline_incremental_curation",
    "text_bpe_train",
    "sim_kmeans_train",
    "sim_ivf_trained_topk",
    # --- 2. new in round 11 (BPE encode round-trip + fertility,
    #     trained-IVF recall audit, filtered/append/hard-negative ANN,
    #     streaming vector ingest) ---
    "text_bpe_encode",
    "text_bpe_encode_docs",
    "sim_recall_audit_trained",
    "text_bpe_fertility",
    "sim_filtered_topk",
    "sim_ivf_append_topk",
    "sim_hard_negatives",
    "stream_vector_ingest",
    # --- 3. function-changed in r10, results hash-identical; re-cert ---
    "udtf_split_fields",
    "events_rfm_segments",
    # --- 4. age queue: the 15 names whose newest driver cert is r05 ---
    "agg_percentiles_exact",
    "variant_funcs",
    "agg_mode_median",
    "unpivot_metrics",
    "join_lateral_topn",
    "agg_hll_union",
    "source_orc_roundtrip",
    "source_python_datasource",
    "stream_python_datasource",
    "sink_python_datasource",
    "stream_session_counts",
    "stream_stateful_profiles",
    "stream_stream_join",
    "stream_restart_resume",
    "stream_dedup_user_counts",
    # --- 5. age queue: the 21 oldest r06-era names (28 r06 names remain
    #     for the r12 front) ---
    "events_retention_cohort",
    "events_user_streaks",
    "events_funnel_windowed",
    "events_quality_drift",
    "tpch_q3_shipping_priority",
    "tpch_q7_nation_trade",
    "tpch_q13_order_distribution",
    "tpch_q18_large_orders",
    "tpch_q4_priority_exists",
    "text_token_count",
    "text_bpe_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_rolling_hash",
    "text_word_freq",
    "text_length_histogram",
    "text_tfidf_top_terms",
    "text_unigram_surprisal",
    "text_repetition",
    "text_bigram_freq",
]

# Entries added or function-changed THIS round that could not displace the
# front (the front is full).  They sit immediately after the front in
# registration order and lead the NEXT round's front.  tools/front_audit.py
# treats queue membership as "pending" for the no-name-falls-through
# invariant.
_ROTATION_QUEUE: list[str] = [
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
