"""Gap-sessionization and cohort-retention invariants on the events table."""

from __future__ import annotations

from collections import defaultdict

from simple_query_engine_spark.operators import sessions as SS


def test_sessionize_partitions_all_events(spark, sf_dir):
    sessions = SS.q_events_sessionize_gap(spark, sf_dir).collect()
    total_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in sessions) == total_events


def test_sessionize_gap_semantics(spark, sf_dir):
    """Consecutive sessions of one user are separated by more than the gap;
    session_seq numbering is dense from 1; durations are non-negative."""
    sessions = SS.q_events_sessionize_gap(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in sessions:
        assert r.duration_sec >= 0
        assert r.session_end >= r.session_start
        by_user[r.user_id].append(r)
    for user_sessions in by_user.values():
        user_sessions.sort(key=lambda r: r.session_seq)
        assert [r.session_seq for r in user_sessions] == list(
            range(1, len(user_sessions) + 1)
        )
        for prev, nxt in zip(user_sessions, user_sessions[1:]):
            gap = (nxt.session_start - prev.session_end).total_seconds()
            assert gap > SS.SESSION_GAP_SEC


def test_retention_cohort_matrix_shape(spark, sf_dir):
    rows = SS.q_events_retention_cohort(spark, sf_dir).collect()
    assert rows
    cohort_size = {}
    for r in rows:
        assert r.week_offset >= 0
        if r.week_offset == 0:
            cohort_size[r.cohort_week] = r.n_users
    # Offset 0 exists for every cohort (the first-activity week itself) and
    # bounds every later offset's user count.
    for r in rows:
        assert r.cohort_week in cohort_size
        assert r.n_users <= cohort_size[r.cohort_week]
    n_users_total = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(cohort_size.values()) == n_users_total


def test_sessionize_boundary_semantics(spark, tmp_path):
    """Crafted corpus pinning the exact break rule: a gap of exactly
    SESSION_GAP_SEC stays in-session (break requires strictly greater),
    one second more breaks; equal timestamps order by event_id."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    sec = dt.timedelta(seconds=1)
    rows = [
        # user 7: gap == GAP (no break), then GAP+1 (break)
        (1, t0, 7),
        (2, t0 + SS.SESSION_GAP_SEC * sec, 7),
        (3, t0 + (2 * SS.SESSION_GAP_SEC + 1) * sec, 7),
        # user 8: two events at the SAME timestamp plus a far later one
        (4, t0, 8),
        (5, t0, 8),
        (6, t0 + (SS.SESSION_GAP_SEC + 1) * sec, 8),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r.user_id, r.session_seq): r
        for r in SS.q_events_sessionize_gap(spark, str(tmp_path)).collect()
    }
    assert set(out) == {(7, 1), (7, 2), (8, 1), (8, 2)}
    # user 7: first session spans the exactly-GAP gap (2 events, duration GAP)
    assert out[(7, 1)].n_events == 2
    assert out[(7, 1)].duration_sec == SS.SESSION_GAP_SEC
    assert out[(7, 2)].n_events == 1
    # user 8: simultaneous events share a session; the +GAP+1 event breaks
    assert out[(8, 1)].n_events == 2
    assert out[(8, 1)].duration_sec == 0
    assert out[(8, 2)].n_events == 1


def test_user_streaks_invariants(spark, sf_dir):
    rows = SS.q_events_user_streaks(spark, sf_dir).collect()
    assert rows
    by_user = {r.user_id: r for r in rows}
    days = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "to_date(ts) AS d")
        .distinct()
        .collect()
    )
    from collections import defaultdict

    expected_days = defaultdict(set)
    for r in days:
        expected_days[r.user_id].add(r.d)
    assert set(by_user) == set(expected_days)
    for user_id, r in by_user.items():
        assert r.n_active_days == len(expected_days[user_id])
        assert 1 <= r.longest_streak <= r.n_active_days
        # Python re-derivation of the longest consecutive run.
        ds = sorted(expected_days[user_id])
        best = run = 1
        for prev, nxt in zip(ds, ds[1:]):
            run = run + 1 if (nxt - prev).days == 1 else 1
            best = max(best, run)
        assert r.longest_streak == best


def _plan_of(df) -> str:
    import contextlib
    import io

    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        df.explain("formatted")
    return buffer.getvalue()


def test_sessionize_plan_has_single_exchange(spark, sf_dir):
    """The scale property: both windows AND the session-stats groupBy run
    on one hash exchange over user_id (Catalyst's subset-clustering rule
    lets hashpartitioning(user_id) satisfy the (user_id, session_seq)
    aggregation).  A second Exchange node appearing here means the
    exchange-reuse regressed."""
    plan = _plan_of(SS.q_events_sessionize_gap(spark, sf_dir))
    # Detail-section headers ("(3) Exchange") appear once per physical node.
    exchange_nodes = [
        line for line in plan.splitlines()
        if line.lstrip().startswith("(") and "Exchange" in line
    ]
    assert len(exchange_nodes) == 1, exchange_nodes


def test_streaks_plan_deduplicates_before_user_shuffle(spark, sf_dir):
    """The distinct (user, day) aggregation must collapse map-side (a
    partial HashAggregate BEFORE the first Exchange), so raw events never
    shuffle."""
    plan = _plan_of(SS.q_events_user_streaks(spark, sf_dir))
    first_exchange = plan.index("Exchange")
    assert "HashAggregate" in plan[:first_exchange]


def test_sessionize_differential_random(spark, tmp_path):
    """Differential check against a pure-Python sessionizer over a random
    corpus whose gaps are biased to straddle the break boundary (1799 /
    1800 / 1801 s) with random microsecond fractions."""
    import datetime as dt
    import random

    rng = random.Random(20250813)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(30):
        t = t0 + dt.timedelta(seconds=rng.randrange(0, 86400))
        for _ in range(rng.randrange(1, 40)):
            rows.append((eid, t, user))
            eid += 1
            t += dt.timedelta(
                seconds=rng.choice([1, 60, 1799, 1800, 1801, 3600, 90000]),
                microseconds=rng.randrange(0, 1_000_000),
            )
    spark.createDataFrame(rows, ["event_id", "ts", "user_id"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))

    # Pure-Python model: break when the gap strictly exceeds the threshold.
    expected = {}
    by_user = {}
    for event_id, ts, user in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        sessions = by_user.setdefault(user, [])
        if not sessions or (
            ts - sessions[-1][-1] > dt.timedelta(seconds=SS.SESSION_GAP_SEC)
        ):
            sessions.append([ts])
        else:
            sessions[-1].append(ts)
    for user, sessions in by_user.items():
        for seq, times in enumerate(sessions, start=1):
            expected[(user, seq)] = (
                len(times),
                times[0],
                times[-1],
                int((times[-1] - times[0]).total_seconds()),
            )

    actual = {
        (r.user_id, r.session_seq): (
            r.n_events,
            r.session_start,
            r.session_end,
            r.duration_sec,
        )
        for r in SS.q_events_sessionize_gap(spark, str(tmp_path)).collect()
    }
    assert actual == expected


def test_top_paths_reconciles_with_sessionize(spark, sf_dir):
    """Every session contributes exactly one path, paths are truncated to
    PATH_MAX_STEPS, and short sessions' path length equals their event
    count (cross-checked against the sessionize operator's output)."""
    n_sessions = SS.q_events_sessionize_gap(spark, sf_dir).count()
    import pyspark.sql.functions as F

    from simple_query_engine_spark.sources.catalog import table
    from pyspark.sql.window import Window

    # Re-derive per-session paths WITHOUT the top-K limit.
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    prev = F.lag(micros).over(w)
    is_break = F.when(
        prev.isNull() | (micros - prev > SS.SESSION_GAP_SEC * 1_000_000), 1
    ).otherwise(0)
    labeled = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(is_break)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    per_session = labeled.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    assert per_session.count() == n_sessions
    rows = SS.q_events_top_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= SS.PATH_TOP_K
    for r in rows:
        assert 1 <= len(r.path.split(" > ")) <= SS.PATH_MAX_STEPS
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(counts) <= n_sessions


def test_funnel_windowed_step_anchoring(spark, tmp_path):
    """Crafted corpus pinning the conversion-window rule: each step's
    window anchors to the PREVIOUS step's qualifying event, boundaries are
    (prev, prev + W] — strictly after, inclusive end."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    W = SS.FUNNEL_STEP_WINDOW_SEC // 60  # window in minutes
    rows = [
        # user 1: full conversion well inside both windows
        (1, t0, 1, "view"),
        (2, t0 + 30 * m, 1, "click"),
        (3, t0 + 50 * m, 1, "purchase"),
        # user 2: click outside the view window -> stops at step 1,
        # even though a purchase exists
        (4, t0, 2, "view"),
        (5, t0 + (W + 1) * m, 2, "click"),
        (6, t0 + (W + 2) * m, 2, "purchase"),
        # user 3: purchase > W after the VIEW but <= W after the CLICK ->
        # converts (window anchors to step 2, not step 1)
        (7, t0, 3, "view"),
        (8, t0 + 10 * m, 3, "click"),
        (9, t0 + (W + 5) * m, 3, "purchase"),
        # user 4: click exactly AT the window boundary (inclusive) counts;
        # purchase BEFORE the click does not
        (10, t0, 4, "view"),
        (11, t0 + 5 * m, 4, "purchase"),
        (12, t0 + W * m, 4, "click"),
        # user 5: view only
        (13, t0, 5, "view"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, et, 1.0, '{"k": 1}') for i, ts, u, et in rows],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    row = SS.q_events_funnel_windowed(spark, str(tmp_path)).collect()[0]
    assert row.step1_users == 5
    assert row.step2_users == 3  # users 1, 3, 4
    assert row.step3_users == 2  # users 1, 3
    assert row.rate_view_click == 0.6
    assert row.rate_view_purchase == 0.4


def test_quality_drift_micro_average_and_lag(spark, sf_dir):
    """The weekly ratios must equal the integer-sum micro-average of a
    pure-Python re-derivation, and the drift column must be the rounded
    difference from the source's previous week (null on its first week)."""
    import json

    rows = SS.q_events_quality_drift(spark, sf_dir).collect()
    assert rows
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'view'")
        .selectExpr("props", "cast(date_trunc('week', ts) as date) AS week")
        .collect()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    stats = {}
    for d in docs:
        toks = [t for t in " ".join(d.text.lower().split()).split(" ")]
        stats[d.doc_id] = (
            d.source,
            len(toks),
            sum(1 for t in toks if t in ("the", "a", "of", "and", "to")),
        )
    agg = defaultdict(lambda: [0, set(), 0, 0])  # views, docs, tok_sum, stop_sum
    for e in events:
        doc_id = json.loads(e.props)["k"]
        if doc_id not in stats:
            continue
        source, n_tok, n_stop = stats[doc_id]
        a = agg[(source, e.week)]
        a[0] += 1
        a[1].add(doc_id)
        a[2] += n_tok
        a[3] += n_stop
    by_key = {(r.source, r.week): r for r in rows}
    assert set(by_key) == set(agg)
    prev = {}
    for (source, week), r in sorted(by_key.items()):
        n_views, doc_set, tok_sum, stop_sum = agg[(source, week)]
        assert r.n_views == n_views
        assert r.n_docs == len(doc_set)
        assert r.tokens_per_view == round(tok_sum / n_views, 4)
        assert r.stop_ratio == round(stop_sum / tok_sum, 4)
        if source in prev:
            assert r.stop_ratio_drift == round(r.stop_ratio - prev[source], 4)
        else:
            assert r.stop_ratio_drift is None
        prev[source] = r.stop_ratio


def test_markov_transitions_reconcile_with_sessionize(spark, sf_dir):
    """A session of length L contributes exactly L-1 transitions, so the
    transition total must equal n_events - n_sessions from the
    independently-certified sessionize operator; per-from_type
    probabilities must use the from_type total as denominator."""
    from simple_query_engine_spark.operators.sessions import (
        q_events_markov_transitions,
        q_events_sessionize_gap,
    )

    rows = q_events_markov_transitions(spark, sf_dir).collect()
    sessions = q_events_sessionize_gap(spark, sf_dir).collect()
    n_events = sum(s.n_events for s in sessions)
    assert sum(r.n_transitions for r in rows) == n_events - len(sessions)

    from collections import defaultdict

    totals = defaultdict(int)
    for r in rows:
        totals[r.from_type] += r.n_transitions
    for r in rows:
        assert r.p_transition == round(r.n_transitions / totals[r.from_type], 6)


def test_markov_transitions_against_python_model(spark, sf_dir):
    """Full pure-Python re-derivation: sessionize by the 30-min gap, count
    within-session consecutive (from, to) event-type pairs."""
    from collections import defaultdict

    from simple_query_engine_spark.operators.sessions import (
        SESSION_GAP_SEC,
        q_events_markov_transitions,
    )

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for e in events:
        by_user[e.user_id].append(e)
    counts = defaultdict(int)
    gap_us = SESSION_GAP_SEC * 1_000_000
    for evs in by_user.values():
        evs.sort(key=lambda e: (e.us, e.event_id))
        for prev, cur in zip(evs, evs[1:]):
            if cur.us - prev.us <= gap_us:  # same session
                counts[(prev.event_type, cur.event_type)] += 1
    rows = q_events_markov_transitions(spark, sf_dir).collect()
    assert {(r.from_type, r.to_type): r.n_transitions for r in rows} == dict(counts)


def test_markov_plan_single_corpus_exchange(spark, sf_dir):
    """The scale property: the labeling window, both leads, and the
    (from, to) count all run off ONE corpus-scale hash exchange over
    user_id; the only other exchanges operate on the bounded ≤ |types|²
    transition table (the count's shuffle and the probability window)."""
    plan = _plan_of(SS.q_events_markov_transitions(spark, sf_dir))
    exchange_nodes = [
        line for line in plan.splitlines()
        if line.lstrip().startswith("(") and "Exchange" in line
    ]
    # user_id exchange + post-aggregate (from,to) exchange + from_type
    # window exchange — anything more means the window sharing regressed.
    assert len(exchange_nodes) <= 3, exchange_nodes
    assert plan.count("hashpartitioning(user_id") == 1, (
        "labeling window and leads must share one user_id exchange"
    )


def test_attribution_against_python_model(spark, sf_dir):
    """Pure-Python re-derivation: sessionize, then walk each session
    crediting every purchase to the last preceding non-purchase event."""
    from collections import defaultdict

    from simple_query_engine_spark.operators.sessions import (
        SESSION_GAP_SEC,
        q_events_attribution_last_touch,
    )

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for e in events:
        by_user[e.user_id].append(e)
    counts = defaultdict(int)
    users = defaultdict(set)
    gap_us = SESSION_GAP_SEC * 1_000_000
    for uid, evs in by_user.items():
        evs.sort(key=lambda e: (e.us, e.event_id))
        prev_us, touch = None, "direct"
        for e in evs:
            if prev_us is None or e.us - prev_us > gap_us:
                touch = "direct"  # session boundary resets the credit
            if e.event_type == "purchase":
                counts[touch] += 1
                users[touch].add(uid)
            elif e.event_type is not None:  # NULL types are transparent,
                touch = e.event_type        # matching last(..., ignorenulls)
            prev_us = e.us
    rows = q_events_attribution_last_touch(spark, sf_dir).collect()
    assert {r.touch_type: (r.n_purchases, r.n_users) for r in rows} == {
        t: (counts[t], len(users[t])) for t in counts
    }


def test_attribution_plan_single_corpus_exchange(spark, sf_dir):
    """The (user_id, session_seq) attribution window must reuse the
    labeling window's user_id exchange — one corpus shuffle total."""
    from simple_query_engine_spark.operators.sessions import (
        q_events_attribution_last_touch,
    )

    plan = _plan_of(q_events_attribution_last_touch(spark, sf_dir))
    assert plan.count("hashpartitioning(user_id") == 1


def test_rolling_wau_matches_python_model(spark, sf_dir, tables):
    """Exact re-derivation of the 7-day rolling distinct-user counts."""
    from simple_query_engine_spark.operators.sessions import (
        WAU_WINDOW_DAYS,
        q_events_rolling_wau,
    )
    from pyspark.sql import functions as F
    import datetime

    active = {
        (r.user_id, r.day)
        for r in tables["events"]
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    }
    days = sorted({d for _, d in active})
    max_day = days[-1]
    got = {r.window_end: r for r in q_events_rolling_wau(spark, sf_dir).collect()}
    expect_ends = set()
    for d in days:
        for k in range(WAU_WINDOW_DAYS):
            e = d + datetime.timedelta(days=k)
            if e <= max_day:
                expect_ends.add(e)
    assert set(got) == expect_ends
    for end in expect_ends:
        lo = end - datetime.timedelta(days=WAU_WINDOW_DAYS - 1)
        wau_users = {u for u, d in active if lo <= d <= end}
        dau_users = {u for u, d in active if d == end}
        r = got[end]
        assert r.wau == len(wau_users), end
        assert r.dau == len(dau_users), end
        assert r.stickiness == round(len(dau_users) / len(wau_users), 4)
        assert r.dau <= r.wau


def test_interval_overlap_bucketization_is_lossless(spark, sf_dir):
    """The bucketized equi-join must return EXACTLY the pairs a direct
    range-predicate model finds over the same sessions and maintenance
    windows — bucketization is a physical rewrite, not an approximation —
    with the same integer overlap seconds; and it must be non-vacuous
    (some session overlaps a maintenance window at the corpus's event
    density)."""
    import datetime

    from simple_query_engine_spark.operators.sessions import (
        MAINT_END_HOUR,
        MAINT_START_HOUR,
        q_events_sessionize_gap,
        q_join_interval_overlap,
    )

    sessions = {
        (r.user_id, r.session_seq): (
            int(r.session_start.timestamp() * 1_000_000),
            int(r.session_end.timestamp() * 1_000_000),
        )
        for r in q_events_sessionize_gap(spark, sf_dir).collect()
    }
    days = sorted(
        {
            datetime.datetime.fromtimestamp(us // 1_000_000).date()
            for us, _ in sessions.values()
        }
        | {
            datetime.datetime.fromtimestamp(us // 1_000_000).date()
            for _, us in sessions.values()
        }
    )
    windows = {}
    for d in days:
        day_us = int(
            datetime.datetime(d.year, d.month, d.day).timestamp() * 1_000_000
        )
        windows[d] = (
            day_us + MAINT_START_HOUR * 3600 * 1_000_000,
            day_us + MAINT_END_HOUR * 3600 * 1_000_000,
        )
    expected = {}
    for (u, seq), (s0, s1) in sessions.items():
        for d, (w0, w1) in windows.items():
            if s0 < w1 and s1 >= w0:
                expected[(u, seq, d)] = (min(s1, w1 - 1) - max(s0, w0)) // 1_000_000

    got = {
        (r.user_id, r.session_seq, r.win_day): r.overlap_sec
        for r in q_join_interval_overlap(spark, sf_dir).collect()
    }
    assert got == expected
    assert got  # non-vacuous at the corpus event density


def test_new_vs_returning_matches_python(spark, sf_dir):
    """Python recompute of the growth-accounting table: per-day new /
    returning splits by first-seen day, cumulative distinct users equals
    the running sum of new users AND the true distinct-user count."""
    from collections import defaultdict

    from simple_query_engine_spark.operators.sessions import (
        q_events_new_vs_returning,
    )

    active = defaultdict(set)
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        active[r.ts.date()].add(r.user_id)
    first = {}
    for d in sorted(active):
        for u in active[d]:
            first.setdefault(u, d)
    expected = {}
    seen = set()
    for d in sorted(active):
        new = {u for u in active[d] if first[u] == d}
        seen |= active[d]
        expected[d] = (len(active[d]), len(new), len(active[d]) - len(new), len(seen))
    got = {
        r.day: (r.dau, r.new_users, r.returning_users, r.cum_users)
        for r in q_events_new_vs_returning(spark, sf_dir).collect()
    }
    assert got == expected
    assert any(ret > 0 for _, _, ret, _ in got.values())


def test_wow_growth_matches_python(spark, sf_dir):
    """Python recompute of weekly counts + truncating ppm growth; first
    weeks carry NULL growth."""
    from collections import defaultdict
    import datetime

    from simple_query_engine_spark.operators.sessions import q_events_wow_growth

    weekly = defaultdict(int)
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        d = r.ts.date()
        monday = d - datetime.timedelta(days=d.weekday())
        weekly[(r.event_type, monday)] += 1
    expected = {}
    by_type = defaultdict(list)
    for (et, wk), c in weekly.items():
        by_type[et].append((wk, c))
    for et, lst in by_type.items():
        lst.sort()
        prev = None
        for wk, c in lst:
            if prev is None:
                expected[(et, wk)] = (c, None, None)
            else:
                diff = (c - prev) * 1_000_000
                q = abs(diff) // prev
                expected[(et, wk)] = (c, prev, q if diff >= 0 else -q)
            prev = c
    got = {
        (r.event_type, r.week): (r.cnt, r.prev_cnt, r.growth_ppm)
        for r in q_events_wow_growth(spark, sf_dir).collect()
    }
    assert got == expected
    assert any(g is not None and g < 0 for _, _, g in got.values())
