"""Behavioral event analytics: gap sessionization and cohort retention.

Both are classic warehouse shapes the streaming module's time windows
cannot express:

- **gap sessionization** (batch): a session breaks when a user is idle for
  more than SESSION_GAP_SEC — the boundary depends on the *previous event*,
  not a fixed grid, so it's a lag-compare + running-sum-of-breaks window
  pipeline (the streaming twin is ``stream_session_counts``'s
  ``session_window``, which only Structured Streaming grows incrementally).
- **cohort retention**: users grouped by first-activity week, activity
  counted per week offset — the retention-matrix query behind every
  engagement dashboard.

Scale shape: everything partitions by ``user_id`` — one hash shuffle each;
the session-stats aggregation groups on ``(user_id, session_seq)``, a
superset of the window's partitioning key, so Catalyst reuses the exchange
(hash on user_id already clusters every group) and only partial aggregation
follows the window.  Timestamp arithmetic uses ``unix_micros`` — exact
integer microseconds, no float epoch — so gap comparisons are bit-identical
with the DuckDB oracle's ``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_query_engine_spark.sources.catalog import table

SESSION_GAP_SEC = 30 * 60


def q_events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap sessions: a new session starts when the gap since the
    user's previous event exceeds SESSION_GAP_SEC.

    Plan: one window over (user_id, ts, event_id) computes the lag and a
    running count of session breaks (the standard gaps-and-islands
    labeling); the follow-up groupBy reuses the same hash partitioning.
    ``event_id`` tie-breaks equal timestamps so labeling is deterministic.
    """
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    prev_micros = F.lag(micros).over(w)
    is_break = F.when(
        prev_micros.isNull()
        | (micros - prev_micros > SESSION_GAP_SEC * 1_000_000),
        1,
    ).otherwise(0)
    labeled = events.select(
        "user_id",
        "ts",
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_seq"),
    )
    return labeled.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000"
        ).alias("duration_sec"),
    )


def q_events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-activity
    week, distinct-user counts per (cohort_week, week_offset).

    Plan: distinct (user, week) pairs (map-side partial distinct), a
    user-partitioned window min for the cohort week, then a count-distinct
    aggregation over the (cohort, offset) grid — the result is
    |weeks|² rows no matter the corpus size.
    """
    events = table(spark, sf_dir, "events")
    weekly = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    cohort = F.min("active_week").over(Window.partitionBy("user_id"))
    with_cohort = weekly.select(
        "user_id",
        F.to_date(cohort).alias("cohort_week"),
        F.expr(
            "datediff(active_week, min(active_week) over "
            "(partition by user_id)) div 7"
        ).alias("week_offset"),
    )
    return with_cohort.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").alias("n_users")
    )


def q_events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (gaps-and-islands on
    the calendar): distinct active days, island anchor = day minus its
    per-user row number (consecutive days share one anchor date), then
    island sizes → per-user max.

    Shape: distinct (user, day) collapses map-side before its shuffle; the
    row-number window and both aggregations cluster on user_id, so after
    the distinct only user_id-hashed exchanges of ≤ |users × days| rows
    remain.
    """
    events = table(spark, sf_dir, "events")
    days = events.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = (
        days.withColumn("anchor", F.date_sub(F.col("d"), F.row_number().over(w)))
        .groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("streak"))
    )
    return islands.groupBy("user_id").agg(
        F.max("streak").alias("longest_streak"),
        F.sum("streak").alias("n_active_days"),
    )


QUERIES = {
    "events_sessionize_gap": q_events_sessionize_gap,
    "events_retention_cohort": q_events_retention_cohort,
    "events_user_streaks": q_events_user_streaks,
}

ORACLES = {
    "events_sessionize_gap": f"""
        WITH labeled AS (
            SELECT user_id, ts,
                   -- CAST: DuckDB widens SUM(int) to HUGEINT (int128); Spark's
                   -- sum is LongType and the driver hash is type-sensitive
                   -- (repo convention, see relational.py).
                   CAST(SUM(CASE WHEN prev_us IS NULL
                            OR epoch_us(ts) - prev_us > {SESSION_GAP_SEC * 1_000_000}
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM (
                SELECT user_id, ts, event_id,
                       LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS prev_us
                FROM events
            )
        )
        SELECT user_id, session_seq,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
        FROM labeled GROUP BY user_id, session_seq
    """,
    "events_retention_cohort": """
        WITH weekly AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
            FROM events
        ), with_cohort AS (
            SELECT user_id,
                   CAST(MIN(active_week) OVER (PARTITION BY user_id) AS DATE)
                       AS cohort_week,
                   datediff('day',
                            MIN(active_week) OVER (PARTITION BY user_id),
                            active_week) // 7 AS week_offset
            FROM weekly
        )
        SELECT cohort_week, week_offset,
               COUNT(DISTINCT user_id) AS n_users
        FROM with_cohort GROUP BY cohort_week, week_offset
    """,
    "events_user_streaks": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), islands AS (
            SELECT user_id,
                   d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                            AS INT) AS anchor
            FROM days
        ), sized AS (
            SELECT user_id, anchor, COUNT(*) AS streak
            FROM islands GROUP BY user_id, anchor
        )
        SELECT user_id,
               MAX(streak) AS longest_streak,
               -- CAST: SUM(BIGINT) widens to HUGEINT in DuckDB; Spark emits
               -- LongType and the driver hash is type-sensitive.
               CAST(SUM(streak) AS BIGINT) AS n_active_days
        FROM sized GROUP BY user_id
    """,
}
