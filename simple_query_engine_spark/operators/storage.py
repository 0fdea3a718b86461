"""Partitioned-layout operators — the partition-pruning exhibit.

The reference engine keeps one in-memory table and scans it per query
(reference ``src/query_engine.rs:61-118``); its "index" is a sorted
column.  The Spark-native equivalent of indexing at 100 TB is *layout*:
write the fact table hive-partitioned by date so a time-bounded query
prunes whole directories at planning time — ``PartitionFilters`` in the
scan node, distinct from row-group-level ``PushedFilters``.  A one-week
query over a 30-day table then lists and reads ~23% of the files before a
single row is decoded; at 100 TB that is the difference between a 100 TB
scan and a few-TB scan.

``q_events_partition_prune`` materializes the date-partitioned copy once
per scale dir (a real pipeline maintains it as its canonical layout),
reads it back with a partition-column predicate, and aggregates.  The
DuckDB oracle runs the same week-window aggregate on the *original*
unpartitioned events table, so the check proves the partitioned layout is
lossless and the pruned scan returns exactly the rows the predicate
selects.  The plan assertion (``tests/test_storage.py``) pins
``PartitionFilters`` — not just ``PushedFilters`` — on the scan.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_query_engine_spark.sources.catalog import table
from simple_query_engine_spark.sources.sinks import write_parquet

PRUNE_WEEK_START = "2024-01-08"
PRUNE_WEEK_END = "2024-01-14"


def _partitioned_events_path(sf_dir: str) -> str:
    """Deterministic per-scale cache path; the source file's size is part
    of the tag so a regenerated testdata set invalidates the copy."""
    source = os.path.join(sf_dir, "events.parquet")
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{os.path.getsize(source)}"
    return os.path.join(tempfile.gettempdir(), f"sqe_events_by_day_{tag}")


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as date-partitioned parquet (written on first use).

    ``event_date`` becomes the hive partition key.  The write goes through
    :func:`write_parquet`, the same sink a production pipeline would use.
    """
    path = _partitioned_events_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        events = table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        write_parquet(events, path, partition_by=["event_date"])
    return spark.read.parquet(path)


def q_events_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-window aggregate over the date-partitioned events copy.

    The ``event_date`` predicate is a partition filter: Spark prunes the
    other 23 day-directories during planning, before any file is opened.
    """
    events = partitioned_events(spark, sf_dir)
    return (
        events.filter(
            (F.col("event_date") >= F.lit(PRUNE_WEEK_START).cast("date"))
            & (F.col("event_date") <= F.lit(PRUNE_WEEK_END).cast("date"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


QUERIES = {
    "events_partition_prune": q_events_partition_prune,
}

ORACLES = {
    "events_partition_prune": f"""
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(SUM(value), 4) AS total_value
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '{PRUNE_WEEK_START}'
                                   AND DATE '{PRUNE_WEEK_END}'
        GROUP BY event_type
    """,
}
