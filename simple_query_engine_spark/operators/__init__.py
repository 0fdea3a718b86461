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
# Round-4 front window (exactly 50 = the driver's window size), in
# priority order:
#   1. the 25 names with no driver-green row after r03: 22 never-checked
#      (remaining tpch_*, agg_string_concat, events_time_rollup, all of
#      relational4), the 2 sketches whose tolerance-banded oracles have
#      never been driver-run, and multimodal_resize (r03 err — output
#      contract fixed this round);
#   2. 4 re-checks for queries whose semantics changed this round
#      (de-vacuated near-dup pair set, hash-sampled IVF centroids,
#      recency-predicate q22);
#   3. 21 stale-certification backfills: names last certified in r01/r02
#      whose modules have changed since (all 15 remaining relational2
#      entries, the 3 untouched multimodal entries, relational3's 2
#      window queries, and sim_ann_lsh from the edited similarity
#      module).
# ROUND4_NOTES.md tracks the ledger.
_ROTATION_FRONT = [
    # --- 1. first-verdict names (25) ---
    "multimodal_resize",
    "agg_approx_distinct",
    "agg_quantile_sketch",
    "agg_string_concat",
    "events_time_rollup",
    "conditional_funcs",
    "bitwise_funcs",
    "regexp_count_funcs",
    "window_value_picks",
    "map_funcs",
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
    # --- 2. changed-this-round re-checks (4) ---
    "sim_neardup_pairs_baseline",
    "sim_neardup_lsh",
    "sim_ivf_topk",
    "tpch_q22_idle_balances",
    # --- 3. stale-certification backfill (21) ---
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
    "multimodal_meta",
    "multimodal_features",
    "multimodal_frame_sample",
    "window_range_frame",
    "window_distribution",
    "sim_ann_lsh",
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
