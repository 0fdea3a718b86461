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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        stream = reader.parquet(os.path.dirname(events_path))
    else:
        stream = reader.parquet(events_path)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
    return spark.read.parquet(output_path)
