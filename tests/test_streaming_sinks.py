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


def test_file_sink_exactly_once_across_midflight_kill(spark, sf_dir, tmp_path):
    """Native parquet sink + checkpoint: stop() the query mid-run (1-file
    triggers), restart with the same checkpoint/sink, and the committed
    output equals the input exactly once — no loss, no re-emission,
    wherever the kill landed between batch commits."""
    import time

    from simple_query_engine_spark.sources.catalog import table
    from simple_query_engine_spark.streaming.sinks import run_resumable_file_sink

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "user_id"
    )
    events.repartition(8).write.parquet(src)

    query = run_resumable_file_sink(
        spark, src, out, ckpt, max_files_per_trigger=1, await_termination=False
    )
    deadline = time.time() + 60
    while not query.recentProgress and time.time() < deadline:
        time.sleep(0.1)
    query.stop()  # kill between batch commits
    query.awaitTermination()

    run_resumable_file_sink(spark, src, out, ckpt)  # restart, drain the rest
    final = spark.read.parquet(out)
    n = events.count()
    assert final.count() == n
    assert final.select("event_id").distinct().count() == n
