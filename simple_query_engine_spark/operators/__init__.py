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
# Round-7 front window (exactly 50 = the driver's window size), in
# priority order (VERDICT r06 "Next round" items 2 and 5):
#   1. the 4 names displaced from the r06 front (r05 certs): the three
#      *_python_datasource names + source_orc_roundtrip;
#   2. the 28 queries added THIS round (REPL SQL passthrough + catalog-mode
#      mini-language dispatch — VERDICT item 5; the Bloom-filter
#      decontamination variant — VERDICT item 6; domain-mixture
#      reweighting; per-source attrition report; the curation.py
#      second wave: Count-Min sketch, shard assignment, token quota,
#      PII redaction, MAD anomaly detection; the audit pair
#      dedup_lsh_quality + sim_recall_audit; stats_column_profile;
#      text_bigram_surprisal; pipeline_split_assign; events_top_paths;
#      join_null_safe; the continued-session trio: session Markov
#      transition matrix, embedding semantic-dedup clusters, and the
#      dataset-card corpus report; the lakehouse pair: small-file
#      compaction (OPTIMIZE), schema-evolution append, retention
#      vacuum, and the manifest-pruned change feed; last-touch
#      session attribution; the txn-stamped streaming managed-table
#      upsert; change-feed incremental view maintenance; integer-exact
#      PageRank over the near-dup graph);
#   3. function-level changes this round: the bucketed layout now writes
#      via materialize_once (race fix + two-source cache tag), the pack-id
#      stride moved to 2^40, and text_decontamination's shingle derivation
#      was factored into the shared helper the Bloom variant reuses;
#   4. the age queue, oldest first: parity ×4 + relational ×11 (r01/r02
#      certs, five rounds stale — VERDICT item 2).  Still queued for
#      r08+: relational2 ×17 (join_asof, funnel_conversion,
#      agg_correlation, join_range, pivot_status, sample_hash, agg_stats
#      displaced by the seven new-query additions, plus the original
#      ×10), relational3 ×4, relational4 ×11, udx ×5, multimodal ×4,
#      dml ×5, remaining streaming, and the r06-certified bulk.
# ROUND7_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. displaced from the r06 front (4) ---
    "source_python_datasource",
    "stream_python_datasource",
    "sink_python_datasource",
    "source_orc_roundtrip",
    # --- 2. added this round (28) ---
    "repl_sql_passthrough",
    "repl_minilang_catalog",
    "text_decontamination_bloom",
    "pipeline_domain_mix",
    "pipeline_attrition_report",
    "sketch_countmin_words",
    "pipeline_shuffle_shards",
    "pipeline_token_quota",
    "pipeline_pii_redaction",
    "events_anomaly_mad",
    "dedup_lsh_quality",
    "stats_column_profile",
    "sim_recall_audit",
    "text_bigram_surprisal",
    "pipeline_split_assign",
    "events_top_paths",
    "join_null_safe",
    "events_markov_transitions",
    "sim_semantic_clusters",
    "stats_corpus_report",
    "dml_compact_files",
    "dml_schema_evolution",
    "dml_vacuum",
    "dml_change_feed",
    "events_attribution_last_touch",
    "stream_upsert_managed",
    "dml_incremental_view",
    "graph_pagerank_neardup",
    # --- 3. function-level changes this round (3) ---
    "join_bucketed_revenue",
    "pipeline_pack_sequences",
    "text_decontamination",
    # --- 4a. stalest certs: parity (4, r01) ---
    "parity_project",
    "parity_filter_eq",
    "parity_filter_gt",
    "parity_project_filter_combo",
    # --- 4b. stalest certs: relational (11, r01/r02) ---
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
    # (case_in_between, math_funcs, json_funcs, subquery_above_avg,
    # distinct_rows moved to the r08 age queue as section 2 grew to 17,
    # then set_except, string_funcs, date_funcs, set_intersect, set_union,
    # sort_topk, sort_multi_key, window_rank_dense, window_lag_lead,
    # window_running_sum, window_topn_per_group followed as the
    # continued-session additions grew section 2 to 28 — 4b now counts 11)
    # (the 7 r01-stale relational2 names that briefly held section 4c —
    # join_asof, funnel_conversion, agg_correlation, join_range,
    # pivot_status, sample_hash, agg_stats — moved to the FRONT of the
    # r08 age queue when the seven new-query entries joined section 2)
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
        udx,
        dml,
        replq,
    )
