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
# Round-14 front window (exactly 50 = the driver's window size), per
# VERDICT r13 item 1: pure age rotation — the 25 names whose newest
# green cert is r08 (they sit exactly at front_audit's MAX_CERT_AGE = 6
# bar this round), then the 25 oldest r09-era names, both in
# registration order.  25 + 25 = exactly 50; after a green r14 no cert
# predates r09.  ROUND14_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. age queue: all 25 r08-era certs (at the MAX_CERT_AGE bar),
    #     registration order ---
    "text_bigram_surprisal",
    "dedup_lsh_quality",
    "graph_pagerank_neardup",
    "graph_triangles_neardup",
    "sim_recall_audit",
    "sim_semantic_clusters",
    "storage_zorder_prune",
    "pipeline_url_dedup",
    "text_decontamination_bloom",
    "pipeline_domain_mix",
    "pipeline_attrition_report",
    "sketch_countmin_words",
    "pipeline_shuffle_shards",
    "pipeline_token_quota",
    "pipeline_pii_redaction",
    "pipeline_split_assign",
    "events_anomaly_mad",
    "stats_corpus_report",
    "stats_expectations",
    "stats_drift_psi",
    "events_trailing_features",
    "text_zipf_slope",
    "text_ngram_novelty",
    "repl_sql_passthrough",
    "repl_minilang_catalog",
    # --- 2. age queue: the 25 oldest r09-era names, registration
    #     order ---
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
]

# Entries added or function-changed THIS round that could not displace the
# front (the front is full).  They sit immediately after the front in
# registration order and lead the NEXT round's front.  tools/front_audit.py
# treats queue membership as "pending" for the no-name-falls-through
# invariant.  At round-14 open the queue holds only names whose entry
# functions r14 changes semantically (VERDICT r13 items 2/4); the r13
# close left it empty.
_ROTATION_QUEUE: list[str] = [
    # VERDICT r13 item 2: these three now create their managed tables
    # with stats_columns=[merge key] — the certified path exercises the
    # stats-pruned merge probes (function change → re-certify r15).
    "dml_merge_upsert",
    "stream_upsert_managed",
    "pipeline_incremental_curation",
    # VERDICT r13 item 4: new entry — real binary-PPM encode + decode
    # end-to-end with DuckDB-oracled pixel stats (never certified).
    "multimodal_ppm_decode",
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
