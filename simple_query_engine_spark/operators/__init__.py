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
# Round-17 front window (exactly 50 = the driver's window size), per
# VERDICT r16 item 1: the one name queued at r16 close (the streaming
# IVF ingest door — the only catalog entry never driver-certified)
# leads the front, followed by the age queue — the 24 names whose
# newest green cert is r11 (they would cross front_audit's
# MAX_CERT_AGE = 6 bar at r18) and the 25 oldest r12-era names, in
# registration order.  1 + 24 + 25 = exactly 50; after a green r17 the
# oldest surviving cert is r12 (21 names, scheduled for the r18 front
# alongside the oldest r13 certs).  ROUND17_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. the r16 close queue: streaming IVF ingest (new at r16,
    #     never driver-certified — VERDICT r16 "What's missing" #1) ---
    "stream_ivf_ingest",
    # --- 2. age queue: all 24 r11-era certs, registration order ---
    "text_lang_id",
    "text_fingerprint",
    "text_rolling_hash",
    "text_word_freq",
    "text_length_histogram",
    "text_tfidf_top_terms",
    "text_unigram_surprisal",
    "text_repetition",
    "text_bigram_freq",
    "sim_kmeans_train",
    "sim_ivf_trained_topk",
    "sim_filtered_topk",
    "sim_hard_negatives",
    "sim_ivf_append_topk",
    "sim_recall_audit_trained",
    "source_orc_roundtrip",
    "stream_session_counts",
    "stream_stateful_profiles",
    "stream_stream_join",
    "stream_restart_resume",
    "stream_dedup_user_counts",
    "stream_vector_ingest",
    "events_rfm_segments",
    "udtf_split_fields",
    # --- 3. age queue: the 25 oldest r12-era certs, registration
    #     order (the remaining 21 r12 names take the r18 front) ---
    "agg_weighted_median",
    "agg_histogram_numeric",
    "join_interval_overlap",
    "events_new_vs_returning",
    "events_wow_growth",
    "text_quality_classifier",
    "text_bm25_search",
    "text_gopher_quality",
    "text_boilerplate_templates",
    "dedup_exact",
    "dedup_substring_spans",
    "dedup_cdc_chunks",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_planted_minhash",
    "dedup_incremental_minhash",
    "dedup_containment_planted",
    "dedup_simhash",
    "graph_kcore_neardup",
    "graph_label_spread",
    "text_dup_ngram_coverage",
    "sim_topk_bruteforce",
    "sim_centroid_balance",
]

# Entries added or function-changed THIS round that could not displace the
# front (the front is full).  They sit immediately after the front in
# registration order and lead the NEXT round's front.  tools/front_audit.py
# treats queue membership as "pending" for the no-name-falls-through
# invariant.  At round-17 open the queue is empty (the r16 queue moved
# into the front); entries added or semantically changed during r17 are
# appended here as the round progresses.
_ROTATION_QUEUE: list[str] = [
    # r17 new entry — streaming near-dup cluster maintenance door
    # (readStream -> foreachBatch banded-join + reduced propagation ->
    # txn-stamped MERGE into the managed label snapshot).  Leads the r18
    # front.
    "stream_components_incremental",
    # r17 plan change: salted_join now pins SMJ (the 64x gate caught a
    # post-explode size misestimate planning a 77M-row broadcast that
    # OOM'd the driver).  Semantics untouched; re-gated at sf0.001+sf0.1.
    "join_salted_skew",
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
