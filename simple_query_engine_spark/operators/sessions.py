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


def _labeled_events(events: DataFrame, *cols: str) -> DataFrame:
    """Gap-session labeling shared by sessionize / top-paths / markov:
    the requested columns plus a ``session_seq`` from the standard
    gaps-and-islands pipeline (lag-compare on exact integer microseconds,
    running sum of breaks, (ts, event_id) tie-break).  ONE definition so
    the gap predicate can never diverge between operators that must
    reconcile (``test_markov_transitions_reconcile_with_sessionize``)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    prev_micros = F.lag(micros).over(w)
    is_break = F.when(
        prev_micros.isNull()
        | (micros - prev_micros > SESSION_GAP_SEC * 1_000_000),
        1,
    ).otherwise(0)
    return events.select(
        *cols,
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_seq"),
    )


def q_events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap sessions: a new session starts when the gap since the
    user's previous event exceeds SESSION_GAP_SEC.

    Plan: one window over (user_id, ts, event_id) computes the lag and a
    running count of session breaks (the standard gaps-and-islands
    labeling); the follow-up groupBy reuses the same hash partitioning.
    ``event_id`` tie-breaks equal timestamps so labeling is deterministic.
    """
    events = table(spark, sf_dir, "events")
    labeled = _labeled_events(events, "user_id", "ts")
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


FUNNEL_STEP_WINDOW_SEC = 60 * 60


def q_events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel: view → click → purchase, each step within
    FUNNEL_STEP_WINDOW_SEC of the PREVIOUS step's qualifying event — the
    conversion-window semantics real event pipelines use (unlike
    ``funnel_conversion``'s single fixed anchor).  Step semantics: a user's
    step-2 time is their FIRST click inside (first_view, first_view+W];
    step 3 is the first purchase inside (step2, step2+W].

    Shape at 100 TB: each step is a user_id-keyed partial aggregation over
    a pushed-down event_type filter; the step-N⋈step-N+1 joins are
    user-keyed equi-joins whose left side shrinks monotonically (funnel
    users ⊆ previous step's users), and the final rollup is a single-row
    summary.  Timestamp math is integer microseconds (``unix_micros`` /
    ``epoch_us``) — no float epoch, bit-identical across engines.
    """
    events = table(spark, sf_dir, "events")
    window_us = FUNNEL_STEP_WINDOW_SEC * 1_000_000

    def step_events(etype: str) -> DataFrame:
        return events.filter(F.col("event_type") == etype).select(
            "user_id", F.unix_micros(F.col("ts")).alias("us")
        )

    views = step_events("view").groupBy("user_id").agg(F.min("us").alias("v_us"))
    clicks = (
        step_events("click")
        .join(views, "user_id")
        .filter((F.col("us") > F.col("v_us")) & (F.col("us") <= F.col("v_us") + window_us))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    purchases = (
        step_events("purchase")
        .join(clicks, "user_id")
        .filter((F.col("us") > F.col("c_us")) & (F.col("us") <= F.col("c_us") + window_us))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    return (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("step1_users"),
            F.count("c_us").alias("step2_users"),
            F.count("p_us").alias("step3_users"),
            F.round(F.count("c_us") / F.count(F.lit(1)), 4).alias("rate_view_click"),
            F.round(F.count("p_us") / F.count(F.lit(1)), 4).alias("rate_view_purchase"),
        )
    )


def q_events_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weekly quality drift of CONSUMED content: view events
    joined to the documents they reference (``props.k``), token/stopword
    stats rolled up by source × week, with a week-over-week delta — the
    monitoring query a production curation pipeline runs daily to catch a
    source going bad.

    Shape at 100 TB: view events collapse map-side to (doc_id, week)
    counts BEFORE the doc-keyed join (join input is |docs × weeks| rows,
    not |events|); per-doc token stats are computed scan-side with no
    shuffle; the final rollup groups on (source, week) — a tiny grid — and
    the drift lag windows over that grid.  Determinism: the quality ratios
    are single divisions of exact integer sums (micro-averaged), never
    float accumulations, so partitioning order cannot flip the hash.
    """
    from simple_query_engine_spark.operators.text import _normalized

    events = table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    viewed = (
        events.select(
            F.get_json_object("props", "$.k").cast("long").alias("doc_id"),
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"),
        )
        .groupBy("doc_id", "week")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    tokens = F.split(_normalized(F.col("text")), " ")
    docstats = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens).alias("n_tokens"),
        F.size(
            F.filter(tokens, lambda t: t.isin("the", "a", "of", "and", "to"))
        ).alias("n_stop"),
    )
    weekly = (
        viewed.join(docstats, "doc_id")
        .groupBy("source", "week")
        .agg(
            F.sum("n_views").alias("n_views"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.round(
                F.sum(F.col("n_views") * F.col("n_tokens")) / F.sum("n_views"), 4
            ).alias("tokens_per_view"),
            F.round(
                F.sum(F.col("n_views") * F.col("n_stop"))
                / F.sum(F.col("n_views") * F.col("n_tokens")),
                4,
            ).alias("stop_ratio"),
        )
    )
    w = Window.partitionBy("source").orderBy("week")
    return weekly.withColumn(
        "stop_ratio_drift",
        F.round(F.col("stop_ratio") - F.lag("stop_ratio").over(w), 4),
    )


PATH_MAX_STEPS = 8  # truncate session paths to their first 8 steps
PATH_TOP_K = 20


def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K session paths: the most common ordered sequences of event
    types within a gap session (truncated to PATH_MAX_STEPS) — the path
    analysis a product-analytics pipeline runs after sessionization, and
    the free-form generalization of ``events_funnel_windowed``'s fixed
    funnel.

    Shape at 100 TB: same single-exchange gaps-and-islands labeling as
    ``events_sessionize_gap`` (the per-session aggregate reuses the
    user_id hash partitioning), then a path-keyed count with map-side
    combine and a TakeOrderedAndProject top-K.  The per-session
    collect_list is bounded by session length and truncated to
    PATH_MAX_STEPS before it becomes a join/shuffle key, so the path
    column is ≤ ~8 event-type names wide regardless of corpus size.
    Determinism: (ts, event_id) orders every list; ties cannot occur.
    """
    events = table(spark, sf_dir, "events")
    labeled = _labeled_events(events, "user_id", "ts", "event_id", "event_type")
    ordered_types = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros(F.col("ts")).alias("us"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("et"),
                )
            )
        ),
        lambda s: s["et"],
    )
    per_session = labeled.groupBy("user_id", "session_seq").agg(
        F.array_join(F.slice(ordered_types, 1, PATH_MAX_STEPS), " > ").alias("path")
    )
    return (
        per_session.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOP_K)
    )


def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session Markov chain: event-type transition counts and conditional
    probabilities within gap sessions — the transition matrix behind
    next-action prediction and flow dashboards (the pairwise complement
    of ``events_top_paths``' full-path histogram).

    Plan shape at 100 TB: the SAME single user_id exchange as
    ``events_sessionize_gap`` — the labeling window and the two ``lead``
    columns share one partitioning and one sort (three window functions,
    zero extra exchanges) — then a (from_type, to_type) count whose
    map-side combine collapses each task's output to ≤ |event types|²
    rows before the shuffle; the probability denominator is a window over
    ``from_type`` on that bounded table, never a second corpus pass.
    A transition is counted only when the next event belongs to the SAME
    session (``to_seq == session_seq``), so session boundaries never
    fabricate cross-session edges.

    Determinism: (ts, event_id) totally orders each user's events, so
    every ``lead`` is unique; counts are exact integers and the single
    probability division is one float op on two exact longs.
    """
    events = table(spark, sf_dir, "events")
    labeled = _labeled_events(events, "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = labeled.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
        "session_seq",
        F.lead("session_seq").over(w).alias("to_seq"),
    )
    counts = (
        steps.filter(F.col("to_seq") == F.col("session_seq"))
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total = F.sum("n_transitions").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions") / total, 6).alias("p_transition"),
    )



def q_events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the nearest
    PRECEDING non-purchase event in the SAME gap session ('direct' when a
    session opens with a purchase) — the credit-assignment query behind
    every conversion dashboard, and a consumer of the shared
    ``_labeled_events`` pipeline.

    Shape at 100 TB: the attribution window partitions by
    (user_id, session_seq) — hashpartitioning(user_id) already clusters
    every session, so Catalyst reuses the labeling exchange (one corpus
    shuffle total, plan-asserted in tests); the rollup groups the
    purchase subset by touch type (bounded |types| rows after map-side
    combine).  Determinism: (ts, event_id) totally orders each session;
    ``last(..., ignorenulls)`` over a deterministic order is exact.
    """
    events = table(spark, sf_dir, "events")
    labeled = _labeled_events(events, "user_id", "ts", "event_id", "event_type")
    w = (
        Window.partitionBy("user_id", "session_seq")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    attributed = labeled.select(
        "user_id",
        "event_type",
        F.coalesce(touch, F.lit("direct")).alias("touch_type"),
    ).filter(F.col("event_type") == "purchase")
    return attributed.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_distinct("user_id").alias("n_users"),
    )


WAU_WINDOW_DAYS = 7


def q_events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily NEW vs RETURNING active users + the cumulative distinct-user
    curve — the growth-accounting table behind every DAU dashboard.  A
    running COUNT(DISTINCT) window is unbounded state and unexpressible
    as a frame; the first-seen reformulation makes it linear: a user is
    NEW on min(active day), so dau splits by a first-seen join and the
    cumulative distinct count is just the running SUM of new_users.

    Shape at 100 TB: distinct (user, day) collapses map-side (the
    ``events_user_streaks`` discipline); first-seen is one user-keyed
    partial aggregate; the final running sum windows over |days| rows.
    All counts exact integers."""
    events = table(spark, sf_dir, "events")
    days = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    first_seen = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    flagged = days.join(first_seen, "user_id").select(
        "day", (F.col("day") == F.col("first_day")).cast("long").alias("is_new")
    )
    daily = flagged.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau"),
        F.sum("is_new").alias("new_users"),
        (F.count(F.lit(1)) - F.sum("is_new")).alias("returning_users"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "dau",
        "new_users",
        "returning_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


_NEW_VS_RETURNING_SQL = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ), first_seen AS (
        SELECT user_id, MIN(day) AS first_day FROM days GROUP BY user_id
    ), daily AS (
        SELECT d.day,
               CAST(COUNT(*) AS BIGINT) AS dau,
               CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
                    AS BIGINT) AS new_users,
               CAST(COUNT(*) - SUM(CASE WHEN d.day = f.first_day
                                        THEN 1 ELSE 0 END)
                    AS BIGINT) AS returning_users
        FROM days d JOIN first_seen f USING (user_id)
        GROUP BY d.day
    )
    SELECT day, dau, new_users, returning_users,
           CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_users
    FROM daily
"""


def q_events_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth by event type in exact integer ppm — the
    dashboard trend table: weekly counts on the (type, week) grid, the
    previous week via LAG, and growth = (cur − prev)·10⁶ div prev.
    Growth can be NEGATIVE; both engines' integer division truncates
    toward zero (the r11-verified engine fact, see
    quality._holt_floordiv's note), so the ppm is engine-identical at
    any sign.  First weeks carry NULL growth (nothing to compare).

    Shape at 100 TB: the weekly rollup partial-aggregates map-side to a
    |types|·|weeks| grid; the LAG window partitions by type over that
    tiny grid."""
    events = table(spark, sf_dir, "events")
    weekly = events.groupBy(
        "event_type", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("week")
    return weekly.select(
        "event_type",
        "week",
        "cnt",
        F.lag("cnt").over(w).alias("prev_cnt"),
    ).withColumn(
        "growth_ppm",
        F.expr("(cnt - prev_cnt) * 1000000 div prev_cnt"),
    )


_WOW_GROWTH_SQL = """
    WITH weekly AS (
        SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, cnt,
           LAG(cnt) OVER (PARTITION BY event_type ORDER BY week) AS prev_cnt,
           (cnt - LAG(cnt) OVER (PARTITION BY event_type ORDER BY week))
               * 1000000
               // LAG(cnt) OVER (PARTITION BY event_type ORDER BY week)
               AS growth_ppm
    FROM weekly
"""


def q_events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU) + same-day actives (DAU)
    + the DAU/WAU stickiness ratio — the engagement dashboard's headline
    series.  Rolling DISTINCT counts can't ride a window frame (no
    count-distinct-over-window in either engine); the standard exact
    reformulation: compact the stream to distinct (user, day) activity
    first, then each activity day CONTRIBUTES to the 7 window-ends it
    falls inside (an explode by 0..6 day offsets), and the per-window
    distinct count runs as an ordinary grouped count-distinct.

    Shape at 100 TB: the (user, day) compaction is the only stream-scale
    shuffle (map-side combined); the ×7 explode multiplies the COMPACT
    activity table, not the event stream; window-ends past the corpus's
    last day are clipped by a broadcast 1-row max.  All counts are exact
    integers; the stickiness ratio is one float division, round 4.
    """
    events = table(spark, sf_dir, "events")
    active = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    bounds = active.agg(F.max("day").alias("max_day"))
    exploded = active.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(WAU_WINDOW_DAYS - 1))).alias("k"),
    ).select("user_id", F.expr("date_add(day, k)").alias("window_end"))
    wau = (
        exploded.crossJoin(F.broadcast(bounds))
        .filter(F.col("window_end") <= F.col("max_day"))
        .groupBy("window_end")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    dau = active.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    return (
        wau.join(dau, wau.window_end == dau.day, "left")
        .select(
            "window_end",
            "wau",
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            F.round(F.coalesce(F.col("dau"), F.lit(0)) / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
    )


def q_events_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series RESAMPLE with gap-fill — the feature-engineering
    primitive that turns an irregular event stream into a dense hourly
    series: each user gets every hour between their first and last
    event, and empty hours carry the LAST OBSERVED value forward (LOCF —
    deliberately not linear interpolation, whose division is both a
    cross-engine float hazard and a look-ahead leak for training
    features; LOCF is the point-in-time-correct fill).

    Mechanics: collapse to one observation per (user, hour) — the
    latest event wins, (ts, event_id)-deterministic — then explode each
    user's [first_hour, last_hour] range and fill with
    ``last_value(..., ignorenulls)`` over the per-user hour order.  The
    output aggregates the filled series per user (hours, observed vs
    filled counts, integer-cents sum over ALL grid hours — exact under
    any order), so the result stays user-count-sized while certifying
    every filled cell.

    Scale shape: one hash shuffle on user_id which BOTH windows and the
    final aggregate reuse (exchange reuse as in sessionize); the grid
    explode multiplies the per-user span table, not the event stream.
    A user's span is bounded by the retention window at production
    scale (the classic guard is capping the explode range).
    """
    events = table(spark, sf_dir, "events")
    w_latest = Window.partitionBy("user_id", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    obs = (
        events.select(
            "user_id",
            F.floor(F.unix_micros("ts") / 3_600_000_000).cast("long").alias("hour"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w_latest))
        .filter(F.col("rn") == 1)
        .select("user_id", "hour", "cents")
    )
    spans = obs.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour")
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = grid.join(obs, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.col("cents").isNotNull().alias("observed"),
        F.last("cents", ignorenulls=True).over(w_fill).alias("filled_cents"),
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(F.col("observed").cast("long")).alias("n_observed"),
        (F.count(F.lit(1)) - F.sum(F.col("observed").cast("long"))).alias(
            "n_filled"
        ),
        F.sum("filled_cents").alias("series_cents"),
    )


# Maintenance window per active day: [02:00, 04:00) — the interval table
# the overlap join matches sessions against.
MAINT_START_HOUR = 2
MAINT_END_HOUR = 4
OVERLAP_BUCKET_US = 3600 * 1_000_000  # 1-hour join buckets


def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join — interval × interval, the join shape
    point-in-range (``join_range``) and as-of (``join_asof``) don't
    cover: which user sessions overlap a nightly maintenance window
    ([0{MAINT_START_HOUR}:00, 0{MAINT_END_HOUR}:00) on every active
    day), and by how many seconds.  The warehouse use is incident /
    deploy / outage attribution: "which sessions were exposed to the
    event window".

    Scale mechanics — the reason this is bucketized, not a theta join:
    a raw ``s.start < w.end AND s.end >= w.start`` predicate compiles to
    BroadcastNestedLoopJoin (all-pairs when both sides are large).
    Instead both interval sets explode into the 1-hour buckets they
    touch, the join is an EQUI-join on the bucket key, pairs dedup, and
    the true overlap predicate verifies — lossless, because any
    overlapping pair shares at least one bucket (the overlap region
    lives in some hour).  Candidate volume is Σ interval-length/bucket
    per side, linear in the data; bucket width is the dial matched to
    typical interval length.  Sessions reuse the SHARED gap-labeling
    pipeline (one user-keyed exchange); the maintenance table derives
    from the distinct active days, |days| rows.

    Exactness: all boundary arithmetic in integer microseconds
    (``unix_micros``/``epoch_us``); overlap_sec is a floored division of
    exact integers; the half-open window makes boundary ties
    deterministic on both engines."""
    events = table(spark, sf_dir, "events")
    sessions = (
        _labeled_events(events, "user_id", "ts")
        .groupBy("user_id", "session_seq")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_start_us"),
            F.unix_micros(F.max("ts")).alias("s_end_us"),
        )
    )
    days = events.select(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    windows = days.select(
        F.to_date("day").alias("win_day"),
        (
            F.unix_micros(F.col("day"))
            + F.lit(MAINT_START_HOUR * 3600 * 1_000_000)
        ).alias("w_start_us"),
        (
            F.unix_micros(F.col("day"))
            + F.lit(MAINT_END_HOUR * 3600 * 1_000_000)
        ).alias("w_end_us"),
    )
    bucket = lambda lo, hi: F.explode(  # noqa: E731
        F.sequence(
            F.expr(f"{lo} div {OVERLAP_BUCKET_US}"),
            F.expr(f"{hi} div {OVERLAP_BUCKET_US}"),
        )
    ).alias("bucket")
    s_b = sessions.select(
        "user_id", "session_seq", "s_start_us", "s_end_us",
        bucket("s_start_us", "s_end_us"),
    )
    w_b = windows.select(
        "win_day", "w_start_us", "w_end_us", bucket("w_start_us", "w_end_us")
    )
    pairs = (
        s_b.join(w_b, "bucket")
        .drop("bucket")
        .distinct()
        .filter(
            (F.col("s_start_us") < F.col("w_end_us"))
            & (F.col("s_end_us") >= F.col("w_start_us"))
        )
    )
    return pairs.select(
        "user_id",
        "session_seq",
        "win_day",
        F.expr(
            "(least(s_end_us, w_end_us - 1) - greatest(s_start_us, w_start_us))"
            " div 1000000"
        ).alias("overlap_sec"),
    )


def _labeled_cte(extra_cols: str = "") -> str:
    """The gap-labeling CTE every session-shaped oracle shares — the SQL
    twin of :func:`_labeled_events`, defined ONCE (it was five verbatim
    copies; a tie-break or gap-predicate change missed in one copy would
    silently break only that operator's reconciliation).  ``extra_cols``
    carries additional event columns through (e.g. ``", event_type"``).
    event_id rides in the output select for the callers that order by it
    downstream; unused otherwise."""
    return f"""labeled AS (
            SELECT user_id, ts, event_id{extra_cols},
                   -- CAST: DuckDB widens SUM(int) to HUGEINT (int128); Spark's
                   -- sum is LongType and the driver hash is type-sensitive
                   -- (repo convention, see relational.py).
                   CAST(SUM(CASE WHEN prev_us IS NULL
                            OR epoch_us(ts) - prev_us > {SESSION_GAP_SEC * 1_000_000}
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM (
                SELECT user_id, ts, event_id{extra_cols},
                       LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS prev_us
                FROM events
            )
        )"""


_INTERVAL_OVERLAP_ORACLE = f"""
        WITH {_labeled_cte()}, sessions AS (
            SELECT user_id, session_seq,
                   epoch_us(MIN(ts)) AS s_start_us,
                   epoch_us(MAX(ts)) AS s_end_us
            FROM labeled GROUP BY user_id, session_seq
        ), windows AS (
            SELECT CAST(day AS DATE) AS win_day,
                   epoch_us(day) + {MAINT_START_HOUR * 3600 * 1_000_000} AS w_start_us,
                   epoch_us(day) + {MAINT_END_HOUR * 3600 * 1_000_000} AS w_end_us
            FROM (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
        )
        SELECT s.user_id, s.session_seq, w.win_day,
               (least(s.s_end_us, w.w_end_us - 1)
                - greatest(s.s_start_us, w.w_start_us)) // 1000000 AS overlap_sec
        FROM sessions s JOIN windows w
          ON s.s_start_us < w.w_end_us AND s.s_end_us >= w.w_start_us
"""


QUERIES = {
    "events_sessionize_gap": q_events_sessionize_gap,
    "join_interval_overlap": q_join_interval_overlap,
    "events_resample_locf": q_events_resample_locf,
    "events_rolling_wau": q_events_rolling_wau,
    "events_new_vs_returning": q_events_new_vs_returning,
    "events_wow_growth": q_events_wow_growth,
    "events_top_paths": q_events_top_paths,
    "events_markov_transitions": q_events_markov_transitions,
    "events_attribution_last_touch": q_events_attribution_last_touch,
    "events_retention_cohort": q_events_retention_cohort,
    "events_user_streaks": q_events_user_streaks,
    "events_funnel_windowed": q_events_funnel_windowed,
    "events_quality_drift": q_events_quality_drift,
}

ORACLES = {
    # Same LOCF resample: latest-observation-per-hour, per-user hourly
    # grid via generate_series, IGNORE NULLS last_value fill.
    "events_resample_locf": """
        WITH obs AS (
            SELECT user_id, hour, cents FROM (
                SELECT user_id,
                       epoch_us(ts) // 3600000000 AS hour,
                       CAST(ROUND(value * 100) AS BIGINT) AS cents,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, epoch_us(ts) // 3600000000
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        ), grid AS (
            SELECT user_id, unnest(generate_series(MIN(hour), MAX(hour)))
                       AS hour
            FROM obs GROUP BY user_id
        ), filled AS (
            SELECT g.user_id,
                   o.cents IS NOT NULL AS observed,
                   last_value(o.cents IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS filled_cents
            FROM grid g LEFT JOIN obs o
              ON o.user_id = g.user_id AND o.hour = g.hour
        )
        SELECT user_id,
               COUNT(*) AS n_hours,
               CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_observed,
               CAST(COUNT(*) - SUM(CASE WHEN observed THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_filled,
               CAST(SUM(filled_cents) AS BIGINT) AS series_cents
        FROM filled GROUP BY user_id
    """,
    "events_rolling_wau": f"""
        WITH active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), bounds AS (
            SELECT MAX(day) AS max_day FROM active
        ), exploded AS (
            -- DATE + INTEGER is the only arithmetic overload both engines
            -- share; range() yields BIGINT, so cast.
            SELECT user_id, day + CAST(k AS INT) AS window_end
            FROM active,
                 (SELECT unnest(range({WAU_WINDOW_DAYS})) AS k)
        ), wau AS (
            SELECT window_end, COUNT(DISTINCT user_id) AS wau
            FROM exploded, bounds
            WHERE window_end <= max_day
            GROUP BY window_end
        ), dau AS (
            SELECT day, COUNT(DISTINCT user_id) AS dau FROM active GROUP BY day
        )
        SELECT w.window_end, w.wau,
               COALESCE(d.dau, 0) AS dau,
               ROUND(COALESCE(d.dau, 0) / CAST(w.wau AS DOUBLE), 4)
                   AS stickiness
        FROM wau w LEFT JOIN dau d ON d.day = w.window_end
    """,
    "join_interval_overlap": _INTERVAL_OVERLAP_ORACLE,
    "events_new_vs_returning": _NEW_VS_RETURNING_SQL,
    "events_wow_growth": _WOW_GROWTH_SQL,
    "events_sessionize_gap": f"""
        WITH {_labeled_cte()}
        SELECT user_id, session_seq,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
        FROM labeled GROUP BY user_id, session_seq
    """,
    # Same labeling CTE as the sessionize oracle; DuckDB's ordered list()
    # aggregate is the twin of array_sort(collect_list(struct(...))).
    "events_top_paths": f"""
        WITH {_labeled_cte(", event_type")}, per_session AS (
            SELECT user_id, session_seq,
                   array_to_string(
                       (list(event_type ORDER BY ts, event_id))[1:{PATH_MAX_STEPS}],
                       ' > ') AS path
            FROM labeled GROUP BY user_id, session_seq
        )
        SELECT path, COUNT(*) AS n_sessions
        FROM per_session GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT {PATH_TOP_K}
    """,
    # Same labeling CTE again; the two LEADs reuse the identical window.
    "events_markov_transitions": f"""
        WITH {_labeled_cte(", event_type")}, steps AS (
            SELECT event_type AS from_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type,
                   session_seq,
                   LEAD(session_seq) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS to_seq
            FROM labeled
        ), counts AS (
            SELECT from_type, to_type, COUNT(*) AS n_transitions
            FROM steps WHERE to_seq = session_seq
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n_transitions,
               ROUND(n_transitions /
                     CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
                          AS DOUBLE), 6) AS p_transition
        FROM counts
    """,
    "events_attribution_last_touch": f"""
        WITH {_labeled_cte(", event_type")}, attributed AS (
            SELECT user_id, event_type,
                   COALESCE(
                       LAST_VALUE(CASE WHEN event_type <> 'purchase'
                                       THEN event_type END IGNORE NULLS)
                           OVER (PARTITION BY user_id, session_seq
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING),
                       'direct') AS touch_type
            FROM labeled
        )
        SELECT touch_type,
               COUNT(*) AS n_purchases,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM attributed WHERE event_type = 'purchase'
        GROUP BY touch_type
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
    "events_funnel_windowed": f"""
        WITH views AS (
            SELECT user_id, MIN(epoch_us(ts)) AS v_us
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ), clicks AS (
            SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
            FROM events e JOIN views v ON e.user_id = v.user_id
            WHERE e.event_type = 'click'
              AND epoch_us(e.ts) > v.v_us
              AND epoch_us(e.ts) <= v.v_us + {FUNNEL_STEP_WINDOW_SEC * 1_000_000}
            GROUP BY e.user_id
        ), purchases AS (
            SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
            FROM events e JOIN clicks c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase'
              AND epoch_us(e.ts) > c.c_us
              AND epoch_us(e.ts) <= c.c_us + {FUNNEL_STEP_WINDOW_SEC * 1_000_000}
            GROUP BY e.user_id
        )
        SELECT COUNT(*) AS step1_users,
               COUNT(c.c_us) AS step2_users,
               COUNT(p.p_us) AS step3_users,
               ROUND(COUNT(c.c_us) / CAST(COUNT(*) AS DOUBLE), 4)
                   AS rate_view_click,
               ROUND(COUNT(p.p_us) / CAST(COUNT(*) AS DOUBLE), 4)
                   AS rate_view_purchase
        FROM views v
        LEFT JOIN clicks c ON v.user_id = c.user_id
        LEFT JOIN purchases p ON v.user_id = p.user_id
    """,
    "events_quality_drift": None,  # filled below (needs text._TOKENS)
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


def _quality_drift_oracle() -> str:
    # Deferred import: text._TOKENS is the single source of truth for the
    # oracle-side tokenization (same convention as dedup/pipeline).
    from simple_query_engine_spark.operators.text import _TOKENS

    return f"""
        WITH viewed AS (
            SELECT CAST(props->>'$.k' AS BIGINT) AS doc_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week,
                   COUNT(*) AS n_views
            FROM events WHERE event_type = 'view'
            GROUP BY 1, 2
        ), docstats AS (
            SELECT doc_id, source,
                   len({_TOKENS}) AS n_tokens,
                   len(list_filter({_TOKENS},
                       t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop
            FROM documents
        ), weekly AS (
            SELECT source, week,
                   CAST(SUM(n_views) AS BIGINT) AS n_views,
                   COUNT(DISTINCT doc_id) AS n_docs,
                   ROUND(SUM(n_views * n_tokens)
                         / CAST(SUM(n_views) AS DOUBLE), 4) AS tokens_per_view,
                   ROUND(SUM(n_views * n_stop)
                         / CAST(SUM(n_views * n_tokens) AS DOUBLE), 4) AS stop_ratio
            FROM viewed JOIN docstats USING (doc_id)
            GROUP BY source, week
        )
        SELECT source, week, n_views, n_docs, tokens_per_view, stop_ratio,
               ROUND(stop_ratio - LAG(stop_ratio)
                     OVER (PARTITION BY source ORDER BY week), 4)
                   AS stop_ratio_drift
        FROM weekly
    """


ORACLES["events_quality_drift"] = _quality_drift_oracle()
