"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming, let alone custom state (SURVEY.md §2.2);
this is the extension slice's "arbitrary stateful operator" exhibit: a
per-user running profile (event count, value sum, last event time) whose
state persists across micro-batches.

Scale notes: state is keyed by user_id and partitioned by the groupBy
shuffle — state volume is O(distinct users), not O(events); the state store
checkpoints incrementally.  With a watermark-driven timeout
(``GroupStateTimeout.EventTimeTimeout``) idle users' state would be evicted;
kept ``NoTimeout`` here because the replay is finite.

(Spark 4's successor API, ``transformWithStateInPandas`` +
``StatefulProcessor``/ValueState, was evaluated but its Python driver
worker requires ``google.protobuf``, which this environment does not ship
— verified failing with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE —
so the stable ``applyInPandasWithState`` API carries the custom-state
exhibit.)
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("event_count", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_epoch", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_count", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_epoch", T.LongType()),
    ]
)


def _update_user_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Merge this batch's events into the user's running state and emit the
    updated profile.  Pure-pandas per group; Arrow moves the batches."""
    (user_id,) = key
    if state.exists:
        event_count, value_sum, last_epoch = state.get
    else:
        event_count, value_sum, last_epoch = 0, 0.0, 0
    for pdf in batches:
        event_count += len(pdf)
        value_sum += float(pdf["value"].sum())
        batch_last = int(pdf["epoch"].max()) if len(pdf) else 0
        last_epoch = max(last_epoch, batch_last)
    state.update((event_count, value_sum, last_epoch))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "event_count": [event_count],
            "value_sum": [round(value_sum, 2)],
            "last_epoch": [last_epoch],
        }
    )


def run_stateful_user_profiles(
    spark: SparkSession,
    events_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream → groupBy(user_id) → applyInPandasWithState → memory sink.

    On a single-batch replay the final profile equals the batch aggregation
    (count/sum/max per user) — which is what the DuckDB oracle checks; a
    multi-batch replay (tests) additionally proves state carries across
    batches (update-mode emits one row per user per touching batch; the
    LAST row per user is the final profile).
    """
    from simple_query_engine_spark.streaming.windows import read_event_stream

    stream = read_event_stream(spark, events_path, max_files_per_trigger)
    events = stream.select(
        "user_id", "value", F.col("ts").cast("long").alias("epoch")
    )
    profiles = events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink_name = f"profiles_{uuid.uuid4().hex[:8]}"
    checkpoint = os.path.join(tempfile.gettempdir(), f"ckpt_{sink_name}")
    query = (
        profiles.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(sink_name)
