"""foreachBatch parquet sink: on-disk result equals the batch aggregation,
partitioned layout is per-window."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from simple_query_engine_spark.streaming.sinks import run_streaming_to_parquet
from simple_query_engine_spark.operators.streaming_ops import q_batch_tumbling


def test_foreachbatch_parquet_matches_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "rollup")
    on_disk = run_streaming_to_parquet(spark, f"{sf_dir}/events.parquet", out)
    got = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in on_disk.collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in q_batch_tumbling(spark, sf_dir).collect()
    }
    assert got == expected
    # Hive-partitioned by window start → partition pruning on re-read.
    partitions = [d for d in os.listdir(out) if d.startswith("window_start=")]
    assert len(partitions) > 10
    one_start = int(partitions[0].split("=")[1])
    pruned = spark.read.parquet(out).filter(F.col("window_start") == one_start)
    assert pruned.count() == sum(1 for (ws, _t) in expected if ws == one_start)
