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
# Round-10 front window (exactly 50 = the driver's window size), per
# VERDICT r09 item 1: the 4 entries that have never held a driver verdict
# (added late in r09, 3-SF green locally in RUNLOG_r09.txt), then ALL 46
# names whose newest driver cert is r04-era.  4 + 46 = exactly 50; after
# this round every catalog name's driver cert is r05+ and the stale tail
# is fully retired.  ROUND10_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. never driver-certified (4) ---
    "multimodal_frame_dedup",
    "dml_shallow_clone",
    "dml_restore_version",
    "events_resample_locf",
    # --- 2. the 46 r04-era names (newest driver green = r04) ---
    # tpch (16)
    "tpch_q2_min_cost_supplier",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q9_nation_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_lines",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity",
    "tpch_q19_brand_bands",
    "tpch_q20_volume_suppliers",
    "tpch_q21_sole_late_supplier",
    "tpch_q22_idle_balances",
    # multimodal (4)
    "multimodal_meta",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    # relational4 / aggregates / windows / events bulk (26)
    "agg_approx_distinct",
    "agg_correlation",
    "agg_quantile_sketch",
    "agg_stats",
    "agg_string_concat",
    "array_funcs",
    "bitwise_funcs",
    "conditional_funcs",
    "date_advanced",
    "events_time_rollup",
    "funnel_conversion",
    "grouping_sets",
    "join_asof",
    "join_range",
    "map_funcs",
    "null_handling",
    "pivot_status",
    "regexp_count_funcs",
    "sample_hash",
    "string_advanced",
    "subquery_in",
    "udf_pandas_score",
    "union_by_name",
    "window_distribution",
    "window_range_frame",
    "window_value_picks",
]

# Entries added or function-changed THIS round that could not displace the
# front (the stale-tail retirement takes the full window).  They sit
# immediately after the front in registration order and lead the NEXT
# round's front.  tools/front_audit.py treats queue membership as "pending"
# for the no-name-falls-through invariant.
_ROTATION_QUEUE: list[str] = [
    # added this round (never driver-certified; cert r11):
    "pipeline_incremental_curation",
    "text_bpe_train",
    "sim_kmeans_train",
    "sim_ivf_trained_topk",
    # function-changed this round (results hash-identical; re-cert r11):
    "udtf_split_fields",       # final field now takes the LAST token
    "events_rfm_segments",     # two-phase range rank replaced global NTILEs
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
