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
# Round-16 front window (exactly 50 = the driver's window size), per
# VERDICT r15 item 1: the 5 names queued at r15 close (the adaptive-K
# kNN trio, the never-certified planted-recall entry, and the
# components state-handoff rewire) lead the front, followed by the age
# queue — all 23 names whose newest green cert is r10 (they would
# cross front_audit's MAX_CERT_AGE = 6 bar at r17) and the 22 oldest
# r11-era names, in registration order.  5 + 23 + 22 = exactly 50;
# after a green r16 the oldest surviving cert is r11 (24 names,
# scheduled for the r17 front alongside the oldest r12 certs).
# ROUND16_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. the r15 close queue: the adaptive-K kNN trio, the new
    #     planted-recall entry (never certified), and the persisted
    #     components standing-state rewire ---
    "sim_knn_graph",
    "sim_knn_density",
    "sim_semdedup",
    "sim_recall_floor_planted",
    "graph_components_incremental",
    # --- 2. age queue: all 23 r10-era certs, registration order ---
    "map_funcs",
    "events_resample_locf",
    "tpch_q22_idle_balances",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "tpch_q19_brand_bands",
    "tpch_q9_nation_profit",
    "tpch_q12_late_lines",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q11_important_parts",
    "tpch_q20_volume_suppliers",
    "tpch_q21_sole_late_supplier",
    "multimodal_meta",
    "multimodal_frame_dedup",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    # --- 3. age queue: the 22 oldest r11-era certs, registration
    #     order (the remaining 24 r11 names take the r17 front) ---
    "agg_percentiles_exact",
    "variant_funcs",
    "agg_mode_median",
    "unpivot_metrics",
    "join_lateral_topn",
    "agg_hll_union",
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
    "text_bpe_train",
    "text_bpe_encode",
    "text_bpe_encode_docs",
    "text_bpe_fertility",
    "text_quality_score",
]

# Entries added or function-changed THIS round that could not displace the
# front (the front is full).  They sit immediately after the front in
# registration order and lead the NEXT round's front.  tools/front_audit.py
# treats queue membership as "pending" for the no-name-falls-through
# invariant.  At round-16 open the queue is empty (the r15 queue moved
# into the front); entries added or semantically changed during r16 are
# appended here as the round progresses.
_ROTATION_QUEUE: list[str] = [
    # VERDICT r15 item 5: new entry — streaming IVF vector-index ingest
    # door (readStream -> foreachBatch -> txn-stamped incremental IVF
    # append through the managed layer).  Added r16, leads the r17 front.
    "stream_ivf_ingest",
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
