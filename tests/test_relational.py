"""Relational operator tests: result sanity at sf0.001 + physical-plan
shape assertions (the scale contract: pushdown, broadcast, top-k)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_query_engine_spark.operators import relational as R


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def plan_of(df) -> str:
    import contextlib
    import io

    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        df.explain("formatted")
    return buffer.getvalue()


def test_pricing_summary_pushes_filter_to_scan(spark, sf):
    plan = plan_of(R.q_agg_pricing_summary(spark, sf))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_broadcast_dim_join_plans_broadcast(spark, sf):
    plan = plan_of(R.q_join_broadcast_dim(spark, sf))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_topk_plans_take_ordered(spark, sf):
    plan = plan_of(R.q_sort_topk(spark, sf))
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reaches_scan(spark, sf):
    plan = plan_of(R.q_sort_topk(spark, sf))
    # The lineitem scan must read only the 3 projected columns.
    scan_schema = plan.split("ReadSchema")[1][:250]
    assert "l_extendedprice" in scan_schema
    assert "l_comment" not in scan_schema and "l_shipdate" not in scan_schema


def test_semi_anti_partition_customers(spark, sf):
    semi = R.q_join_semi(spark, sf).count()
    # semi(open orders) + customers without open orders == all customers
    customer_count = spark.read.parquet(f"{sf}/customer.parquet").count()
    assert 0 < semi <= customer_count


def test_left_outer_keeps_all_nations(spark, sf):
    rows = R.q_join_left_outer_agg(spark, sf).collect()
    assert len(rows) == 25  # every nation survives, even customer-less ones
    total = sum(r.customer_count for r in rows)
    assert total == spark.read.parquet(f"{sf}/customer.parquet").count()


def test_rollup_grand_total_consistent(spark, sf):
    rows = {(r.returnflag, r.linestatus): r.row_count for r in R.q_agg_rollup(spark, sf).collect()}
    grand = rows[("ALL", "ALL")]
    leaves = sum(v for (rf, ls), v in rows.items() if rf != "ALL" and ls != "ALL")
    assert grand == leaves == spark.read.parquet(f"{sf}/lineitem.parquet").count()


def test_window_topn_rank_bounds(spark, sf):
    ranks = R.q_window_topn_per_group(spark, sf).select("price_rank").distinct().collect()
    assert {r.price_rank for r in ranks} <= {1, 2}


def test_set_ops_algebra(spark, sf):
    union = R.q_set_union(spark, sf).count()
    intersect = R.q_set_intersect(spark, sf).count()
    customer_nations = (
        spark.read.parquet(f"{sf}/customer.parquet").select("c_nationkey").distinct().count()
    )
    supplier_nations = (
        spark.read.parquet(f"{sf}/supplier.parquet").select("s_nationkey").distinct().count()
    )
    # inclusion-exclusion
    assert union == customer_nations + supplier_nations - intersect


def test_variant_roundtrip_and_malformed_contract(spark):
    """VARIANT: typed path extraction round-trips values; try_parse_json
    maps malformed input to NULL while parse_json raises — the permissive
    vs strict contract callers choose between."""
    df = spark.createDataFrame(
        [('{"a": {"b": 7}, "s": "x"}',), ("not json",)], ["doc"]
    )
    lenient = df.select(
        F.variant_get(F.try_parse_json("doc"), "$.a.b", "long").alias("b"),
        F.variant_get(F.try_parse_json("doc"), "$.s", "string").alias("s"),
    ).collect()
    assert {(r.b, r.s) for r in lenient} == {(None, None), (7, "x")}
    with pytest.raises(Exception):  # strict parse fails on the malformed row
        df.select(F.parse_json("doc")).collect()


def test_percentiles_exact_ordering_and_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from simple_query_engine_spark.operators.relational4 import (
        q_agg_percentiles_exact,
    )

    rows = q_agg_percentiles_exact(spark, sf_dir).collect()
    assert rows
    bounds = {
        r.l_returnflag: r
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for r in rows:
        assert r.p25 <= r.p50 <= r.p75
        assert bounds[r.l_returnflag].lo <= r.p25
        assert r.p75 <= bounds[r.l_returnflag].hi


def test_topn_per_group_uses_rank_limit_pushdown(spark, sf):
    """window_topn_per_group must keep Spark's WindowGroupLimit pushdown:
    a Partial group-limit BEFORE the exchange bounds the shuffle to
    n × |groups| rows.  Losing this (e.g. by restructuring the filter so
    Catalyst can't see the rank bound) is the 100 TB regression."""
    plan = plan_of(R.q_window_topn_per_group(spark, sf))
    assert "WindowGroupLimit" in plan
    # The map-side (pre-exchange) group limit: rank fn, limit 2, Partial.
    assert "row_number(), 2, Partial" in plan


def test_weighted_median_matches_python_model(spark, sf_dir):
    """Pure-Python weighted-median recompute: merge equal cents, scan
    cumulative quantity, pick the first cents with 2*cum >= total — exact
    per-group equality, plus the defining property (the weighted median
    splits UNIT mass in half: weight strictly below <= half, weight at or
    below >= half)."""
    from collections import defaultdict

    from simple_query_engine_spark.operators.relational4 import (
        q_agg_weighted_median,
    )

    groups: dict[tuple, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        cents = int(round(r.l_extendedprice * 100))
        groups[(r.l_returnflag, r.l_linestatus)][cents] += int(r.l_quantity)
    expected = {}
    for g, cw in groups.items():
        total = sum(cw.values())
        cum = 0
        for cents in sorted(cw):
            cum += cw[cents]
            if 2 * cum >= total:
                expected[g] = (cents, total)
                break
    got = {
        (r.l_returnflag, r.l_linestatus): (r.weighted_median_cents, r.total_units)
        for r in q_agg_weighted_median(spark, sf_dir).collect()
    }
    assert got == expected
    for g, (med, total) in got.items():
        below = sum(w for c, w in groups[g].items() if c < med)
        at_or_below = sum(w for c, w in groups[g].items() if c <= med)
        assert 2 * below < total or 2 * below == total
        assert 2 * at_or_below >= total


def test_histogram_buckets_partition_all_orders(spark, sf_dir):
    """Histogram invariants: bucket masses sum to the table, effective
    ranges sit inside the declared bucket bounds (after clamping), and
    shares are the exact integer ppm of the counts."""
    from simple_query_engine_spark.operators.relational4 import (
        HIST_BINS,
        HIST_HI,
        HIST_LO,
        q_agg_histogram_numeric,
    )

    rows = q_agg_histogram_numeric(spark, sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    total = sum(r.n_orders for r in rows)
    width = (HIST_HI - HIST_LO) // HIST_BINS
    for r in rows:
        assert 0 <= r.bucket < HIST_BINS
        assert r.share_ppm == r.n_orders * 1_000_000 // total
        if 0 < r.bucket < HIST_BINS - 1:  # interior buckets: exact bounds
            assert r.bucket_lo * 100 <= r.min_cents <= r.max_cents < r.bucket_hi * 100
