"""Streaming sinks beyond the in-memory test sink.

``foreachBatch`` is the production workhorse: each micro-batch arrives as
a regular DataFrame plus a monotonic batch id, and the callback performs
an idempotent write (the batch id makes retries exactly-once for sinks
without native streaming support).  Here: windowed aggregates upserted to
a parquet directory partitioned by window start — at scale this is the
hourly-rollup table a 100 TB event stream continuously maintains, with
per-partition dynamic overwrite so a replayed batch rewrites only its own
windows.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_query_engine_spark.streaming.windows import (
    WATERMARK,
    tumbling_window_counts,
)


def run_streaming_to_parquet(
    spark: SparkSession,
    events_path: str,
    output_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream → watermarked tumbling agg → foreachBatch parquet upsert.

    Returns the final on-disk table.  Partitioned by window start so a
    re-delivered batch overwrites exactly the windows it carries
    (``partitionOverwriteMode=dynamic``), never the whole table.
    """
    from simple_query_engine_spark.streaming.windows import read_event_stream

    # Scope the overwrite-mode change to this query: leaking
    # partitionOverwriteMode=dynamic would silently change every later
    # partitioned mode='overwrite' write in the session from full-table to
    # partial overwrite.
    previous_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        stream = read_event_stream(spark, events_path, max_files_per_trigger)
        windowed = tumbling_window_counts(stream.withWatermark("ts", WATERMARK))

        def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("window_start")
                .parquet(output_path)
            )

        checkpoint = os.path.join(
            tempfile.gettempdir(), f"ckpt_fb_{uuid.uuid4().hex[:8]}"
        )
        query = (
            windowed.writeStream.foreachBatch(upsert_batch)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", previous_mode)
    return spark.read.parquet(output_path)
