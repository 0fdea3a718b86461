"""Partition-pruning exhibit: the scan over the date-partitioned events
copy must prune at the directory level (PartitionFilters), not merely push
the predicate into row groups (PushedFilters)."""

from __future__ import annotations

import contextlib
import io

from simple_query_engine_spark.operators.storage import (
    partitioned_events,
    q_events_partition_prune,
)


def plan_of(df) -> str:
    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        df.explain("formatted")
    return buffer.getvalue()


def test_scan_has_partition_filters(spark, sf_dir):
    plan = plan_of(q_events_partition_prune(spark, sf_dir))
    partition_filter_lines = [
        line for line in plan.splitlines() if "PartitionFilters" in line
    ]
    assert partition_filter_lines, plan
    line = partition_filter_lines[0]
    assert "event_date" in line and "isnotnull" in line, line
    # The predicate prunes directories, so it must NOT appear as a row-level
    # pushed filter (the scan may have no PushedFilters line at all — the
    # partition predicate was consumed entirely at planning time).
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert all("event_date" not in l for l in pushed), pushed


def scanned_file_count(df) -> int:
    """The FileSourceScan's post-execution numFiles metric — the number of
    files the scan actually opened (inputFiles() would report the whole
    relation's listing, pre-pruning)."""
    df.collect()
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    return int(scan.metrics().apply("numFiles").value())


def test_pruned_scan_reads_fewer_files(spark, sf_dir):
    full = partitioned_events(spark, sf_dir)
    from pyspark.sql import functions as F

    assert len(full.inputFiles()) >= 30  # one directory per event day
    pruned = full.filter(F.col("event_date") == "2024-01-08")
    assert scanned_file_count(pruned) == 1


def test_partitioned_copy_is_lossless(spark, sf_dir):
    from simple_query_engine_spark.sources.catalog import table

    original = table(spark, sf_dir, "events")
    copy = partitioned_events(spark, sf_dir)
    assert copy.count() == original.count()
    assert copy.selectExpr("sum(event_id)").collect()[0][0] == (
        original.selectExpr("sum(event_id)").collect()[0][0]
    )
