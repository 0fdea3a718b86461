"""Invariants for the quality.py round-8 analytics operators.

The cross-engine value check lives in the oracle gate; these tests pin
the properties the gate can't see: expectation-failure detection, the PSI
math against a pure-Python recomputation (including the quantization),
NTILE balance, trailing-window semantics against pandas, the Zipf OLS
re-derivation, and novelty accounting identities.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simple_query_engine_spark.operators.quality import (
    LN_SCALE,
    PSI_SPLIT,
    RFM_TILES,
    ZIPF_TOP,
    _check_rows,
    q_events_rfm_segments,
    q_events_trailing_features,
    q_stats_drift_psi,
    q_stats_expectations,
    q_text_ngram_novelty,
    q_text_zipf_slope,
)


def test_expectations_all_pass_on_clean_testdata(spark, sf_dir):
    rows = q_stats_expectations(spark, sf_dir).collect()
    assert len(rows) == 7
    by_name = {(r.table_name, r.check_name): r for r in rows}
    assert ("lineitem", "orderkey_in_orders") in by_name
    for r in rows:
        assert r.n_violations == 0, r
        assert r.passed == 1, r
        assert r.n_rows > 0, r


def test_expectations_detect_planted_violations(spark):
    """A dirty relation must surface exact violation counts per check."""
    df = spark.createDataFrame(
        [(1, "F"), (1, "O"), (2, None), (None, "X")],
        "key long, status string",
    )
    rows = _check_rows(
        df,
        "dirty",
        {
            "key_not_null": F.sum(F.col("key").isNull().cast("int")),
            "key_unique": F.count(F.lit(1)) - F.countDistinct("key"),
            "status_accepted": F.sum(
                (F.col("status").isNull() | ~F.col("status").isin("F", "O"))
                .cast("int")
            ),
        },
    ).collect()
    got = {r.check_name: (r.n_violations, r.passed) for r in rows}
    # countDistinct ignores the NULL key: 4 rows, 2 distinct non-null keys.
    assert got == {
        "key_not_null": (1, 0),
        "key_unique": (2, 0),
        "status_accepted": (2, 0),
    }
    assert all(r.n_rows == 4 for r in rows)


def test_psi_matches_python_model(spark, sf_dir, tables):
    """Exact re-derivation of the PSI including the quantized-ln integer
    math — psi_contrib and psi_total must equal the model bit-for-bit
    after the same final rounding."""
    events = tables["events"].select("event_type", "ts").collect()
    ref, cur = {}, {}
    split = PSI_SPLIT
    for r in events:
        book = ref if str(r.ts) < split else cur
        book[r.event_type] = book.get(r.event_type, 0) + 1
    types = sorted(set(ref) | set(cur))
    r_s = {t: ref.get(t, 0) + 1 for t in types}
    c_s = {t: cur.get(t, 0) + 1 for t in types}
    big_r, big_c = sum(r_s.values()), sum(c_s.values())

    def qln(x: int) -> int:
        return round(math.log(x) * LN_SCALE)

    nums = {
        t: (c_s[t] * big_r - r_s[t] * big_c)
        * (qln(c_s[t]) + qln(big_r) - qln(r_s[t]) - qln(big_c))
        for t in types
    }
    denom = big_c * big_r * float(LN_SCALE)
    total = round(sum(nums.values()) / denom, 6)
    got = {r.event_type: r for r in q_stats_drift_psi(spark, sf_dir).collect()}
    assert sorted(got) == types
    for t in types:
        assert got[t].n_ref == ref.get(t, 0)
        assert got[t].n_cur == cur.get(t, 0)
        assert got[t].psi_contrib == round(nums[t] / denom, 6), t
        assert got[t].psi_total == total
        # Each PSI term is non-negative up to ln-quantization noise.
        assert got[t].psi_contrib >= -1e-6


def test_rfm_tiles_partition_users(spark, sf_dir, tables):
    seg = q_events_rfm_segments(spark, sf_dir).collect()
    n_users = tables["events"].select("user_id").distinct().count()
    assert sum(r.n_users for r in seg) == n_users
    for r in seg:
        for s in (r.r_score, r.f_score, r.m_score):
            assert 1 <= s <= RFM_TILES
    # NTILE balance: per axis, tile sizes differ by at most one.
    for axis in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in seg:
            sizes[r[axis]] = sizes.get(r[axis], 0) + r.n_users
        assert max(sizes.values()) - min(sizes.values()) <= 1, (axis, sizes)


def test_rfm_has_no_unpartitioned_window(spark, sf_dir):
    """The r09 verdict's one scale-killer: the old implementation ran three
    global-order NTILE windows (single reducer over |users|).  The
    two-phase range rank must leave ZERO unpartitioned Window nodes in the
    executed plan — every Window partitions by the range-bucket salt."""
    plan = (
        q_events_rfm_segments(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window " in ln]
    assert windows, "expected the per-bucket row_number windows in the plan"
    for ln in windows:
        # A partitioned Window prints its partition spec; the only
        # partitioning key this query uses is the range-bucket salt _b.
        assert "_b#" in ln, f"unpartitioned Window in plan: {ln.strip()}"


def test_distributed_ntile_matches_builtin_ntile(spark, sf_dir):
    """The two-phase rank→tile arithmetic must be bit-identical to
    Spark's own NTILE over the same total order, including the
    remainder-to-front rule (checked at N % T != 0) and desc orders.

    Uses the REAL sf_dir as the cache tag (with test-unique keys):
    session_cache evicts every cache tagged with a different dir, so a
    fake dir here would flush the shared shingle/signature caches other
    tests in the session reuse (ordering-dependent slowdown)."""
    from pyspark.sql.window import Window

    from simple_query_engine_spark.operators.quality import _distributed_ntile

    df = spark.range(103).select(
        F.col("id").alias("user_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(59))).alias("metric"),
    )
    for order, key in (
        ([F.col("metric").asc(), F.col("user_id").asc()], "_ntile_test_asc"),
        ([F.col("metric").desc(), F.col("user_id").asc()], "_ntile_test_desc"),
    ):
        got = {
            r.user_id: r.tile
            for r in _distributed_ntile(
                df, 4, order, "tile", sf_dir, key
            ).collect()
        }
        want = {
            r.user_id: r.tile
            for r in df.select(
                "user_id", F.ntile(4).over(Window.orderBy(*order)).alias("tile")
            ).collect()
        }
        assert got == want


def test_trailing_features_match_pandas(spark, sf_dir, tables):
    """Independent pandas re-derivation of the trailing frames for every
    user: peaks and totals must match exactly."""
    ev = (
        tables["events"]
        .select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .toPandas()
    )
    got = {r.user_id: r for r in q_events_trailing_features(spark, sf_dir).collect()}
    assert set(got) == set(ev.user_id.unique())
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values("t").reset_index(drop=True)
        c1 = c24 = v24 = 0
        for i in range(len(g)):
            t = g.t[i]
            in1 = (g.t >= t - 3_600_000_000 + 1) & (g.t <= t)
            in24 = (g.t >= t - 86_400_000_000 + 1) & (g.t <= t)
            c1 = max(c1, int(in1.sum()))
            c24 = max(c24, int(in24.sum()))
            v24 = max(v24, int(g.cents[in24].sum()))
        r = got[uid]
        assert (r.peak_1h_events, r.peak_24h_events, r.peak_24h_cents) == (
            c1,
            c24,
            v24,
        ), uid
        assert r.n_events == len(g)
        assert r.total_cents == int(g.cents.sum())
        assert r.peak_1h_events <= r.peak_24h_events <= r.n_events


def test_zipf_slope_matches_python_ols(spark, sf_dir, tables):
    import re
    from collections import Counter

    texts = [r.text for r in tables["documents"].select("text").collect()]
    counts = Counter()
    for t in texts:
        # text._normalized: lowercase + whitespace collapse + trim.
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        for w in norm.split(" "):
            if w:
                counts[w] += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    pts = [
        (round(math.log(i + 1) * LN_SCALE), round(math.log(n) * LN_SCALE))
        for i, (_, n) in enumerate(top)
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = round((k * sxy - sx * sy) / float(k * sxx - sx * sx), 6)
    row = q_text_zipf_slope(spark, sf_dir).collect()[0]
    # The synthetic corpus vocabulary is smaller than ZIPF_TOP, so the
    # fit covers the whole (bounded) vocabulary.
    assert row.n_words == k <= ZIPF_TOP
    assert row.zipf_slope == slope
    assert row.zipf_slope < 0  # frequency decreases with rank


def test_ngram_novelty_accounting(spark, sf_dir):
    rows = q_text_ngram_novelty(spark, sf_dir).collect()
    by_doc = {r.doc_id: r for r in rows}
    # The earliest doc can only contain first-seen grams.
    first = min(by_doc)
    assert by_doc[first].novelty_rate == 1.0
    assert by_doc[first].n_novel == by_doc[first].n_grams
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams, r
    # Every distinct gram digest is novel in exactly one doc: the novel
    # total equals the corpus-wide distinct digest count.
    from simple_query_engine_spark.functions.hashing import md5_prefix_long
    from simple_query_engine_spark.operators.dedup import _shingles

    n_distinct = (
        _shingles(spark, sf_dir)
        .select(md5_prefix_long(F.col("shingle"), 15).alias("gh"))
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == n_distinct


def test_ema_features_match_python_recursion(spark, sf_dir):
    """Pure-Python recursive EMA over each user's time-ordered cents
    sequence — exact equality, proving the array-fold formulation IS the
    recursion (and that fixed-point integer decay is engine-stable)."""
    from collections import defaultdict

    from simple_query_engine_spark.operators.quality import (
        EMA_DEN,
        EMA_KEEP,
        EMA_MIX,
        q_events_ema_features,
    )
    from simple_query_engine_spark.sources.catalog import table as _table

    seqs = defaultdict(list)
    for r in _table(spark, sf_dir, "events").collect():
        seqs[r.user_id].append((r.ts, r.event_id, int(round(r.value * 100))))
    expected = {}
    for uid, evs in seqs.items():
        evs.sort()
        state = evs[0][2]
        for _, _, cents in evs[1:]:
            state = (state * EMA_KEEP + cents * EMA_MIX) // EMA_DEN
        expected[uid] = (len(evs), evs[-1][2], state)
    got = {
        r.user_id: (r.n_events, r.last_cents, r.ema_cents)
        for r in q_events_ema_features(spark, sf_dir).collect()
    }
    assert got == expected
    # non-vacuous: the EMA differs from the last value somewhere
    assert any(e != l for _, l, e in got.values())


def test_holt_forecast_matches_python_recursion(spark, sf_dir):
    """Pure-Python Holt recursion (truncating integer division, l0 =
    first count, b0 = 0) over each type's day-ordered counts — exact
    equality.  This is also the regression pin for the DuckDB
    list_reduce struct-mutation hazard documented in _holt_oracle_sql:
    the Spark fold must equal the FUNCTIONAL recursion."""
    from collections import defaultdict

    from simple_query_engine_spark.operators.quality import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_DEN,
        q_events_forecast_holt,
    )
    from simple_query_engine_spark.sources.catalog import table as _table

    daily = defaultdict(lambda: defaultdict(int))
    for r in _table(spark, sf_dir, "events").collect():
        daily[r.event_type][r.ts.date()] += 1

    def tdiv(v):
        q = abs(v) // HOLT_DEN
        return q if v >= 0 else -q

    expected = {}
    for et, days in daily.items():
        xs = [days[d] for d in sorted(days)]
        l, b = xs[0], 0
        for x in xs[1:]:
            ln = tdiv(HOLT_ALPHA * x + (HOLT_DEN - HOLT_ALPHA) * (l + b))
            b = tdiv(HOLT_BETA * (ln - l) + (HOLT_DEN - HOLT_BETA) * b)
            l = ln
        expected[et] = (len(xs), xs[-1], l, b, l + b)
    got = {
        r.event_type: (r.n_days, r.last_cnt, r.level, r.trend, r.forecast_next)
        for r in q_events_forecast_holt(spark, sf_dir).collect()
    }
    assert got == expected
    # non-vacuous: smoothing moved some level away from the raw last count
    assert any(l != last for _, last, l, _, _ in got.values())
