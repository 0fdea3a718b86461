"""Adaptive Query Execution evidence: the runtime re-planning the
engine relies on at 100 TB is exercised and pinned on this data.

Two behaviors matter most for the catalog's join/agg shapes:
- runtime SMJ → broadcast conversion when the built side turns out
  small (statistics lie at scale; AQE corrects them per-stage);
- post-shuffle partition coalescing (a 32-partition shuffle of tiny
  data collapses to few real partitions — at production scale this is
  what keeps reducer counts proportional to data, not config).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from simple_query_engine_spark.sources.catalog import table


def _final_plan(df) -> str:
    # Materialize THIS DataFrame's own execution first (a sink write
    # would plan a separate query): after collect(), explain() shows the
    # adaptive plan with isFinalPlan=true.
    df.collect()
    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        df.explain()
    return buffer.getvalue()


def test_aqe_converts_smj_to_broadcast_at_runtime(spark, sf_dir):
    """Static planning must pick SortMergeJoin (broadcast threshold off
    via a hint-free, statistics-blind shape), AQE must flip it to a
    broadcast join once the real build-side size is known."""
    previous = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Static planner: never broadcast.  AQE's own threshold FALLS
        # BACK to the static one when unset, so it must be pinned
        # explicitly — the runtime flip is then AQE's alone, driven by
        # the build side's MEASURED post-shuffle size.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
        nation = table(spark, sf_dir, "nation")
        customer = table(spark, sf_dir, "customer")
        joined = (
            customer.join(nation, customer["c_nationkey"] == nation["n_nationkey"])
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_customers"))
        )
        plan = _final_plan(joined)
        assert "AdaptiveSparkPlan isFinalPlan=true" in plan, plan
        # Adaptive explain prints final plan then "== Initial Plan ==":
        # the SMJ must survive only in the initial section.
        final_section = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in final_section, plan
        assert "SortMergeJoin" not in final_section, plan
        assert "SortMergeJoin" in plan, plan  # statically it WAS an SMJ
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", previous)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_aqe_coalesces_post_shuffle_partitions(spark, sf_dir):
    """A groupBy over tiny data shuffles into spark.sql.shuffle.partitions
    (32) map-side buckets; AQE must coalesce the reducer side well below
    that (AQEShuffleRead with coalesced partitions in the final plan)."""
    orders = table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    plan = _final_plan(agg)
    assert "AdaptiveSparkPlan isFinalPlan=true" in plan, plan
    assert "AQEShuffleRead coalesced" in plan, plan
    # The observable effect: far fewer result partitions than configured.
    configured = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert agg.rdd.getNumPartitions() < configured
