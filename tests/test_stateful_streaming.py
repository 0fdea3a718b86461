"""Custom stateful operator tests: cross-batch state accumulation and the
single-batch == batch-aggregate equivalence."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from simple_query_engine_spark.streaming.stateful import run_stateful_user_profiles


def test_single_batch_equals_batch_aggregate(spark, sf_dir, tables):
    result = run_stateful_user_profiles(spark, f"{sf_dir}/events.parquet")
    got = {r.user_id: (r.event_count, r.value_sum, r.last_epoch) for r in result.collect()}
    expected_rows = (
        tables["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("vsum"),
            F.max(F.col("ts").cast("long")).alias("last"),
        )
        .collect()
    )
    expected = {r.user_id: (r.cnt, r.vsum, r.last) for r in expected_rows}
    assert set(got) == set(expected)
    for user_id, (cnt, vsum, last) in expected.items():
        g_cnt, g_vsum, g_last = got[user_id]
        assert g_cnt == cnt and g_last == last
        assert abs(g_vsum - vsum) <= 0.02


def test_state_carries_across_batches(spark, tmp_path):
    """Same user appears in two micro-batches; the final emitted profile
    must reflect BOTH batches (update mode emits once per touching batch;
    the max-count row is the final state)."""
    import datetime as dt

    input_dir = str(tmp_path / "ev")
    os.makedirs(input_dir)
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    batches = [
        ("b1", [(t0, 7, 1.0), (t0, 8, 2.0)]),
        ("b2", [(t0.replace(hour=10), 7, 3.0)]),
    ]
    for i, (name, rows) in enumerate(batches):
        spark.createDataFrame(
            rows, "ts timestamp, user_id long, value double"
        ).coalesce(1).write.parquet(f"{input_dir}/{name}")
        for part in glob.glob(f"{input_dir}/{name}/*.parquet"):
            os.utime(part, (1_000_000 * (i + 1),) * 2)

    result = run_stateful_user_profiles(
        spark, f"{input_dir}/*", max_files_per_trigger=1
    )
    rows = result.collect()
    final = {}
    for r in rows:
        prev = final.get(r.user_id)
        if prev is None or r.event_count > prev.event_count:
            final[r.user_id] = r
    # user 7: 1 event in batch 1 + 1 in batch 2 → final count 2, sum 4.0
    assert final[7].event_count == 2
    assert abs(final[7].value_sum - 4.0) <= 1e-9
    assert final[8].event_count == 1
    # update mode emitted user 7 twice (once per touching batch)
    assert sum(1 for r in rows if r.user_id == 7) == 2


def test_ttl_sessions_state_survives_checkpoint_restart(spark, tmp_path):
    """An OPEN session's state must survive a query restart: run 1 drains
    two events (session open, nothing emitted), run 2 resumes from the
    SAME checkpoint, extends the session with a third event, and the
    watermark-timeout then emits ONE session covering all three events —
    impossible unless the state store was restored on resume."""
    import datetime as dt

    from simple_query_engine_spark.streaming.stateful import (
        run_ttl_session_counts,
    )

    input_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    def add_batch(name, order, rows):
        spark.createDataFrame(rows, "ts timestamp, user_id long").coalesce(
            1
        ).write.parquet(f"{input_dir}/{name}")
        for part in glob.glob(f"{input_dir}/{name}/*.parquet"):
            os.utime(part, (1_000_000 * order,) * 2)

    out = str(tmp_path / "out")
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    add_batch("b1", 1, [(t0, 7), (t0 + dt.timedelta(minutes=5), 7)])
    first = run_ttl_session_counts(
        spark,
        f"{input_dir}/*",
        max_files_per_trigger=1,
        checkpoint_dir=ckpt,
        output_dir=out,
    )
    assert first.filter(F.col("user_id") == 7).count() == 0  # still open

    # Third event within the gap of the open session, then two sentinel
    # batches to march the watermark past the session's timeout.
    add_batch("b2", 2, [(t0 + dt.timedelta(minutes=8), 7)])
    add_batch("b3", 3, [(t0 + dt.timedelta(hours=3), -1)])
    add_batch("b4", 4, [(t0 + dt.timedelta(hours=6), -1)])
    second = run_ttl_session_counts(
        spark,
        f"{input_dir}/*",
        max_files_per_trigger=1,
        checkpoint_dir=ckpt,
        output_dir=out,
    )
    rows = second.filter(F.col("user_id") == 7).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r.n_events == 3  # 2 pre-restart events + 1 post-restart
    assert r.session_start == int(t0.timestamp())
    assert r.session_end == int((t0 + dt.timedelta(minutes=8)).timestamp())


def test_ttl_sessions_late_admitted_event_bridges_sessions(spark, tmp_path):
    """A late-but-watermark-admitted event that lands INSIDE the gap
    between two already-seen events must produce ONE session — the
    reason emission is watermark-proof: a data-path closer that emits
    the moment a later event arrives past the gap would have already
    emitted a phantom [t0, t0] session that append mode can never
    retract (the watermark is 1 h, the gap only 600 s, so such late
    events are legal)."""
    import datetime as dt

    from simple_query_engine_spark.streaming.stateful import (
        run_ttl_session_counts,
    )

    input_dir = str(tmp_path / "ev")
    os.makedirs(input_dir)

    def add_batch(name, order, rows):
        spark.createDataFrame(rows, "ts timestamp, user_id long").coalesce(
            1
        ).write.parquet(f"{input_dir}/{name}")
        for part in glob.glob(f"{input_dir}/{name}/*.parquet"):
            os.utime(part, (1_000_000 * order,) * 2)

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    add_batch("b1", 1, [(t0, 7)])
    # 1000 s later: past the 600 s gap — a naive closer emits [t0, t0] now.
    add_batch("b2", 2, [(t0 + dt.timedelta(seconds=1000), 7)])
    # Late by 500 s (well inside the 1 h watermark): bridges the two.
    add_batch("b3", 3, [(t0 + dt.timedelta(seconds=500), 7)])
    # Sentinels march the watermark past the session's TTL.
    add_batch("b4", 4, [(t0 + dt.timedelta(hours=3), -1)])
    add_batch("b5", 5, [(t0 + dt.timedelta(hours=6), -1)])

    sessions = run_ttl_session_counts(
        spark, f"{input_dir}/*", max_files_per_trigger=1
    ).filter(F.col("user_id") == 7)
    rows = sessions.collect()
    assert len(rows) == 1, [tuple(r) for r in rows]
    (r,) = rows
    assert r.session_start == int(t0.timestamp())
    assert r.session_end == int((t0 + dt.timedelta(seconds=1000)).timestamp())
    assert r.n_events == 3


def test_merge_session_intervals_equals_point_sessionization():
    """Property: for ANY multiset of event epochs, arbitrarily pre-grouped
    into (start, last, n) intervals (the state a batch split could have
    produced), `_merge_session_intervals` must equal the gap
    sessionization computed directly from the sorted points — the
    interval algebra is exact, independent of how batches carved it."""
    pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from simple_query_engine_spark.streaming.stateful import (
        TTL_SESSION_GAP_SEC,
        _merge_session_intervals,
    )

    @settings(max_examples=300, deadline=None)
    @given(data=st.data())
    def prop(data):
        # Epochs drawn near multiples of the gap so boundary cases
        # (exactly-gap spacing) occur often.
        points = sorted(
            data.draw(
                st.lists(
                    st.integers(0, 20).flatmap(
                        lambda k: st.integers(
                            k * TTL_SESSION_GAP_SEC - 2,
                            k * TTL_SESSION_GAP_SEC + 2,
                        )
                    ),
                    min_size=1,
                    max_size=25,
                )
            )
        )
        points = [max(0, p) for p in points]
        # Ground truth: sort-scan gap sessionization of the raw points
        # (gap-EXCLUSIVE close: > gap starts a new session, matching the
        # stateful op's close rule).
        want = []
        for p in sorted(points):
            if want and p - want[-1][1] <= TTL_SESSION_GAP_SEC:
                s, l, n = want[-1]
                want[-1] = (s, max(l, p), n + 1)
            else:
                want.append((p, p, 1))
        # Arbitrary pre-grouping: split the sorted points into random
        # consecutive runs; each run becomes one already-merged interval
        # IF its internal gaps qualify, else stays as point intervals —
        # model both by sessionizing each run independently.
        runs = []
        rest = sorted(points)
        while rest:
            k = data.draw(st.integers(1, len(rest)))
            run, rest = rest[:k], rest[k:]
            for p in run:
                if runs and runs[-1][3] and p - runs[-1][1] <= TTL_SESSION_GAP_SEC:
                    s, l, n, _ = runs[-1]
                    runs[-1] = (s, max(l, p), n + 1, True)
                else:
                    runs.append((p, p, 1, bool(runs) and data.draw(st.booleans())))
        intervals = [(s, l, n) for s, l, n, _ in runs]
        shuffled = data.draw(st.permutations(intervals))  # order-insensitive
        got = _merge_session_intervals(shuffled)
        assert got == want, (points, intervals)

    prop()
