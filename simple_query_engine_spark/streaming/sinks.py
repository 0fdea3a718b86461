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


def run_resumable_file_sink(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    select_cols: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
):
    """One run of a NATIVE parquet file sink with a durable checkpoint.

    Restart-resume is the contract: call again — after the query finished,
    after new input files arrived, or after a mid-flight ``stop()`` — with
    the same ``checkpoint_dir``/``output_path`` and the restarted query
    resumes from the checkpoint's recorded source offsets, while the
    sink's ``_spark_metadata`` commit log exposes only whole committed
    batches to readers.  Together they make the total output exactly-once
    across any number of restarts — the property a 100 TB continuous
    pipeline leans on every time an executor or driver dies.

    Returns the running ``StreamingQuery`` when ``await_termination`` is
    False (callers kill it mid-flight in tests); otherwise blocks until the
    availableNow run drains and returns None.
    """
    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    if select_cols:
        stream = stream.select(*select_cols)
    query = (
        stream.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not await_termination:
        return query
    query.awaitTermination()
    return None
