"""Invariants for the curation.py second-wave operators.

The cross-engine value check lives in the oracle gate; these tests pin
the properties the gate can't see: sketch one-sidedness, the hierarchical
prefix-sum equivalence, planted-PII recall, and the MAD math against an
independent numpy recomputation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_query_engine_spark.operators.curation import (
    PII_EMAIL_MOD,
    PII_PHONE_MOD,
    QUOTA_SALTS,
    QUOTA_TOKENS,
    SHUFFLE_SHARDS,
    _normalized,
    _pii_text,
    q_events_anomaly_mad,
    q_pipeline_pii_redaction,
    q_pipeline_shuffle_shards,
    q_pipeline_token_quota,
    q_sketch_countmin_words,
)
from simple_query_engine_spark.operators.text import q_word_freq


def test_countmin_never_undercounts_and_matches_exact_topk(spark, sf_dir):
    rows = q_sketch_countmin_words(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.est_n >= r.exact_n, r
        assert r.overcount == r.est_n - r.exact_n
    # The top-K words and exact counts agree with the independent
    # text_word_freq operator (same normalization, same tie-break).
    freq = {r[0]: r[1] for r in q_word_freq(spark, sf_dir).collect()}
    assert {r.word: r.exact_n for r in rows} == freq


def test_countmin_against_python_model(spark, sf_dir):
    """Exact pure-Python re-derivation of the sketch: same normalization,
    same per-row md5 bucket hash, same cell sums — est_n must equal the
    model's min-over-depths cell value exactly, not just bound it."""
    import hashlib
    import re
    from collections import Counter

    from simple_query_engine_spark.operators.curation import (
        CMS_DEPTH,
        CMS_WIDTH,
        q_sketch_countmin_words,
    )
    from simple_query_engine_spark.sources.catalog import table

    texts = [r.text for r in table(spark, sf_dir, "documents").select("text").collect()]
    counts = Counter()
    for t in texts:
        counts.update(re.sub(r"\s+", " ", t.lower()).strip().split(" "))

    def pos(word, d):
        return int(hashlib.md5(f"{d}:{word}".encode()).hexdigest()[:5], 16) % CMS_WIDTH

    cells = Counter()
    for word, n in counts.items():
        for d in range(CMS_DEPTH):
            cells[(d, pos(word, d))] += n
    for r in q_sketch_countmin_words(spark, sf_dir).collect():
        assert r.exact_n == counts[r.word]
        assert r.est_n == min(cells[(d, pos(r.word, d))] for d in range(CMS_DEPTH)), r


def test_token_quota_matches_single_window(spark, sf_dir):
    """The salted two-phase prefix sum must equal the naive one-window
    plan exactly (same global (salt, hash, doc_id) order)."""
    from simple_query_engine_spark.functions.hashing import md5_prefix_long
    from simple_query_engine_spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(_normalized(F.col("text")), " ")).alias("n_tokens"),
        md5_prefix_long(F.col("doc_id").cast("string"), 8).alias("hash_key"),
        F.pmod(F.col("doc_id"), F.lit(QUOTA_SALTS)).alias("salt"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("salt", "hash_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = docs.withColumn(
        "tokens_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).filter(F.col("tokens_before") < QUOTA_TOKENS)
    naive = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )
    got = sorted(map(tuple, q_pipeline_token_quota(spark, sf_dir).collect()))
    assert got == sorted(map(tuple, naive.collect()))
    # Budget semantics (start-offset rule): the kept set overshoots the
    # quota by LESS than its largest kept document, and a source whose
    # total reaches the quota keeps at least the quota.
    stats = {
        r.source: r
        for r in kept.groupBy("source")
        .agg(
            F.sum("n_tokens").alias("tokens_kept"),
            F.max("n_tokens").alias("max_kept"),
        )
        .collect()
    }
    totals = {
        r.source: r.total
        for r in docs.groupBy("source").agg(F.sum("n_tokens").alias("total")).collect()
    }
    assert set(stats) == set(totals)
    for src, r in stats.items():
        assert r.tokens_kept - r.max_kept < QUOTA_TOKENS, src
        if totals[src] >= QUOTA_TOKENS:
            assert r.tokens_kept >= QUOTA_TOKENS, src
        else:
            assert r.tokens_kept == totals[src], src


def test_token_quota_differential_random(spark, tmp_path):
    """Differential check against a pure-Python quota model over a random
    corpus with skewed per-source doc counts and token lengths biased to
    straddle the budget boundary (so the one-past-quota overshoot rule is
    exercised on every source)."""
    import hashlib
    import random

    from simple_query_engine_spark.operators.curation import (
        q_pipeline_token_quota,
    )

    rng = random.Random(20260814)
    rows = []
    doc_id = 0
    for s in range(12):
        for _ in range(rng.randrange(1, 120)):
            n_tokens = rng.choice([1, 3, 50, 499, 500, 501, 1200, 5000])
            rows.append((doc_id, f"src{s}", " ".join(["tok"] * n_tokens)))
            doc_id += 3  # gaps: ids need not be dense
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    def h8(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    expected = {}
    by_source: dict[str, list[tuple]] = {}
    for i, src, text in rows:
        by_source.setdefault(src, []).append((i % QUOTA_SALTS, h8(i), i, len(text.split(" "))))
    for src, docs in by_source.items():
        running, kept, toks = 0, 0, 0
        for _, _, _, n in sorted(docs):
            if running < QUOTA_TOKENS:
                kept += 1
                toks += n
            running += n
        expected[src] = (kept, toks)
    actual = {
        r.source: (r.n_kept, r.tokens_kept)
        for r in q_pipeline_token_quota(spark, str(tmp_path)).collect()
    }
    assert actual == expected


def test_shuffle_shards_partition_the_corpus(spark, sf_dir):
    from simple_query_engine_spark.sources.catalog import table

    rows = q_pipeline_shuffle_shards(spark, sf_dir).collect()
    assert all(0 <= r.shard < SHUFFLE_SHARDS for r in rows)
    total = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    assert all(r.min_hash <= r.max_hash for r in rows)


def test_pii_redaction_scrubs_realistic_addresses(spark, sf_dir):
    """The email pattern must consume dotted local parts and multi-label
    domains in ONE match — a single-dot pattern leaves PII fragments
    ('john.[EMAIL].com') in the scrubbed output."""
    from simple_query_engine_spark.operators.curation import EMAIL_RE

    rows = spark.createDataFrame(
        [
            ("contact john.doe@gmail.com today",),
            ("or user7@mail.example.com now",),
            ("no pii here",),
        ],
        ["t"],
    ).select(F.regexp_replace(F.col("t"), EMAIL_RE, "[EMAIL]").alias("clean"))
    got = [r.clean for r in rows.collect()]
    assert got == [
        "contact [EMAIL] today",
        "or [EMAIL] now",
        "no pii here",
    ]


def test_pii_redaction_recall_and_scrub(spark, sf_dir):
    rows = q_pipeline_pii_redaction(spark, sf_dir).collect()
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % PII_EMAIL_MOD == 0 else 0), r
        assert r.n_phones == (1 if r.doc_id % PII_PHONE_MOD == 0 else 0), r
    # The redacted text itself (not just the fingerprint) contains no PII.
    from simple_query_engine_spark.operators.curation import EMAIL_RE, PHONE_RE
    from simple_query_engine_spark.sources.catalog import table

    redacted = table(spark, sf_dir, "documents").select(
        F.regexp_replace(
            F.regexp_replace(_pii_text(), EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        ).alias("clean")
    )
    leftovers = redacted.filter(
        F.col("clean").rlike(EMAIL_RE) | F.col("clean").rlike(PHONE_RE)
    ).count()
    assert leftovers == 0


def test_split_assign_against_python_model(spark, sf_dir):
    import hashlib

    from simple_query_engine_spark.operators.curation import (
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        q_pipeline_split_assign,
    )

    from simple_query_engine_spark.sources.catalog import table

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(_normalized(F.col("text")), " ")).alias("n"))
        .collect()
    )
    expect: dict[str, list[int]] = {"train": [], "val": [], "test": []}
    for r in docs:
        bucket = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 100
        split = (
            "train"
            if bucket < SPLIT_TRAIN_PCT
            else "val"
            if bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT
            else "test"
        )
        expect[split].append(r.n)
    got = {r.split: r for r in q_pipeline_split_assign(spark, sf_dir).collect()}
    total = sum(sum(v) for v in expect.values())
    for split, toks in expect.items():
        assert got[split].n_docs == len(toks)
        assert got[split].split_tokens == sum(toks)
        assert got[split].token_share == round(sum(toks) / total, 4)
    assert abs(sum(r.token_share for r in got.values()) - 1.0) < 5e-4


def test_bigram_surprisal_against_python_model(spark, sf_dir):
    import math
    import re
    from collections import Counter

    from simple_query_engine_spark.operators.text import (
        SURPRISAL_LN_SCALE,
        q_bigram_surprisal,
    )
    from simple_query_engine_spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def toks(text):
        return re.sub(r"\s+", " ", text.lower()).strip().split(" ")

    def q(x):  # round-half-away-from-zero, as both engines' ROUND
        return math.floor(x * SURPRISAL_LN_SCALE + 0.5)

    bg, pre, doc_grams = Counter(), Counter(), {}
    for r in docs:
        words = toks(r.text)
        grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        if grams:
            doc_grams[r.doc_id] = grams
            for g in grams:
                bg[g] += 1
                pre[g.split(" ")[0]] += 1
    got = {r.doc_id: r for r in q_bigram_surprisal(spark, sf_dir).collect()}
    assert set(got) == set(doc_grams)
    for doc_id, grams in doc_grams.items():
        sum_s = sum(q(math.log(pre[g.split(" ")[0]])) - q(math.log(bg[g])) for g in grams)
        expect = round(sum_s / (len(grams) * float(SURPRISAL_LN_SCALE)), 4)
        r = got[doc_id]
        assert r.n_bigrams == len(grams)
        assert r.avg_bigram_surprisal == expect, (doc_id, r.avg_bigram_surprisal, expect)


def test_anomaly_mad_against_numpy(spark, sf_dir):
    from simple_query_engine_spark.sources.catalog import table

    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in daily:
        by_type.setdefault(r.event_type, []).append(r.n)
    got = {r.event_type: r for r in q_events_anomaly_mad(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for t, counts in by_type.items():
        arr = np.array(sorted(counts), dtype=float)
        med = float(np.median(arr))
        dev = np.abs(arr - med)
        mad = float(np.median(np.sort(dev)))
        r = got[t]
        assert r.n_days == len(counts)
        assert r.med_daily == round(med, 1)
        assert r.mad_daily == round(mad, 1)
        assert r.n_anomalies == int((dev > 3.0 * mad).sum())


def test_corpus_report_quantiles_match_percentile_disc(spark, sf_dir):
    """The histogram-derived p50/p90 must equal Spark's own
    ``percentile_disc`` per (source, lang) group — pins the cumulative-
    count derivation to the standard discrete-quantile semantics the
    operator avoids collecting per-group values for."""
    from simple_query_engine_spark.operators.curation import (
        _normalized,
        q_stats_corpus_report,
    )
    from simple_query_engine_spark.sources.catalog import table

    rows = {(r.source, r.lang): r for r in q_stats_corpus_report(spark, sf_dir).collect()}
    ref = (
        table(spark, sf_dir, "documents")
        .select(
            "source",
            "lang",
            F.size(F.split(_normalized(F.col("text")), " ")).alias("n_tokens"),
        )
        .groupBy("source", "lang")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)").alias("p50"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_tokens)").alias("p90"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .collect()
    )
    assert {(r.source, r.lang) for r in ref} == set(rows)
    for r in ref:
        got = rows[(r.source, r.lang)]
        assert (got.p50_tokens, got.p90_tokens) == (r.p50, r.p90), (r.source, r.lang)
        assert (got.n_docs, got.total_tokens) == (r.n_docs, r.total_tokens)


def test_corpus_report_dup_accounting_matches_dedup_exact(spark, sf_dir):
    """n_exact_dup_docs totals every member of a duplicated-text group —
    reconciled against the independently-certified dedup_exact operator."""
    from simple_query_engine_spark.operators.curation import q_stats_corpus_report
    from simple_query_engine_spark.operators.dedup import q_dedup_exact

    report = q_stats_corpus_report(spark, sf_dir).collect()
    groups = q_dedup_exact(spark, sf_dir).collect()
    expected_dups = sum(g.dup_count for g in groups if g.dup_count > 1)
    assert sum(r.n_exact_dup_docs for r in report) == expected_dups
    for r in report:
        assert r.dup_rate == round(r.n_exact_dup_docs / r.n_docs, 6)


def test_corpus_report_plan_bounded_exchanges(spark, sf_dir):
    """Scale shape: beyond the scan, only the md5-digest dup window may
    shuffle corpus-sized data (one text_hash exchange); every later
    exchange operates on the bounded (source, lang, n_tokens) histogram.
    No per-group value collection (percentile_disc / collect_list) may
    appear anywhere in the plan."""
    import contextlib
    import io

    from simple_query_engine_spark.operators.curation import q_stats_corpus_report

    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        q_stats_corpus_report(spark, sf_dir).explain("formatted")
    plan = buffer.getvalue()
    exchange_nodes = [
        line for line in plan.splitlines()
        if line.lstrip().startswith("(") and "Exchange" in line
    ]
    assert len(exchange_nodes) <= 4, exchange_nodes
    assert plan.count("hashpartitioning(text_hash") == 1
    assert "percentile" not in plan and "collect_list" not in plan


def test_source_overlap_matches_python_recompute(spark, sf_dir):
    """Cross-source duplicate matrix: full Python recompute over
    (digest, source) sets — exact pair counts.  The synthetic corpus only
    carries exact duplicates at sf0.1 (measured: 8 cross-source groups;
    none below), so the corpus check may legitimately be empty-equals-
    empty here; DETECTION power is pinned on the planted fixture below
    (corpus-honesty convention)."""
    import hashlib
    from collections import defaultdict
    from itertools import combinations

    from simple_query_engine_spark.operators.curation import (
        q_stats_source_overlap,
    )

    srcs = defaultdict(set)
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        srcs[hashlib.md5(r.text.encode()).hexdigest()].add(r.source)
    expected = defaultdict(int)
    for members in srcs.values():
        for a, b in combinations(sorted(members), 2):
            expected[(a, b)] += 1
    got = {
        (r.source_a, r.source_b): r.n_shared_digests
        for r in q_stats_source_overlap(spark, sf_dir).collect()
    }
    assert got == dict(expected)


def test_source_overlap_detects_planted_mirrors(spark, tmp_path):
    """Planted mirror detection: srcB copies 3 docs from srcA, srcC
    copies 1 from srcA and 1 from srcB — the matrix must show exactly
    those pair counts (and a doc copied by BOTH B and C increments three
    cells: AB, AC, BC)."""
    from simple_query_engine_spark.operators.curation import (
        q_stats_source_overlap,
    )

    rows = []
    did = 0
    def add(text, src):
        nonlocal did
        rows.append((did, text, "en", src, len(text)))
        did += 1
    for i in range(5):
        add(f"alpha unique doc {i} body words", "srcA")
    # B mirrors A's docs 0,1,2; C mirrors A's doc 0 and B-only doc
    for i in range(3):
        add(f"alpha unique doc {i} body words", "srcB")
    add("beta b-only doc body", "srcB")
    add("alpha unique doc 0 body words", "srcC")
    add("beta b-only doc body", "srcC")
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.source_a, r.source_b): r.n_shared_digests
        for r in q_stats_source_overlap(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("srcA", "srcB"): 3,  # docs 0,1,2 mirrored
        ("srcA", "srcC"): 1,  # doc 0 mirrored twice over -> also BC below
        ("srcB", "srcC"): 2,  # doc 0 (via B's mirror) + the b-only doc
    }


def test_k_anonymity_histogram_matches_python(spark, sf_dir):
    """Python recompute of the quasi-identifier class-size histogram:
    exact per-size class/doc counts, risk flags at the k threshold, and
    the histogram's doc mass must equal the corpus size."""
    from collections import Counter

    from simple_query_engine_spark.operators.curation import (
        K_ANON_K,
        K_ANON_LEN_BUCKET,
        q_stats_k_anonymity,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    classes = Counter(
        (r.source, r.lang, r.n_chars // K_ANON_LEN_BUCKET) for r in docs
    )
    hist = Counter(classes.values())
    expected = {
        size: (n, size * n, int(size < K_ANON_K)) for size, n in hist.items()
    }
    got = {
        r.class_size: (r.n_classes, r.n_docs, r.at_risk)
        for r in q_stats_k_anonymity(spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(nd for _, nd, _ in got.values()) == len(docs)


def test_token_gini_matches_python_and_planted_extremes(spark, sf_dir, tmp_path):
    """Python recompute of the corpus Gini (exact ppm), plus the
    boundary behaviors on planted corpora: a perfectly uniform source
    split gives gini 0; an extreme concentration approaches
    (n-1)/n."""
    import re
    from collections import defaultdict

    from simple_query_engine_spark.operators.curation import (
        q_stats_token_gini,
    )

    mass = defaultdict(int)
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        mass[r.source] += len(re.sub(r"\s+", " ", r.text.lower()).strip().split(" "))
    xs = sorted(mass.values())
    n, s = len(xs), sum(xs)
    want = (2 * sum(i * x for i, x in enumerate(xs, 1)) - (n + 1) * s) * 1_000_000 // (n * s)
    row = q_stats_token_gini(spark, sf_dir).collect()[0]
    assert (row.n_sources, row.total_tokens, row.gini_ppm) == (n, s, want)

    # planted extremes
    uniform = [(i, "a b c d", "en", f"s{i % 4}", 7) for i in range(8)]
    spark.createDataFrame(
        uniform, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "u" / "documents.parquet"))
    assert q_stats_token_gini(spark, str(tmp_path / "u")).collect()[0].gini_ppm == 0
    skew = [(0, "w " * 399 + "w", "en", "big", 800)] + [
        (i, "w", "en", f"tiny{i}", 1) for i in range(1, 4)
    ]
    spark.createDataFrame(
        skew, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "s" / "documents.parquet"))
    g = q_stats_token_gini(spark, str(tmp_path / "s")).collect()[0].gini_ppm
    assert g > 700_000  # 4 sources, one holds ~99% of mass -> near 3/4


def test_kmv_union_estimator_matches_python_and_is_sane(spark, sf_dir):
    """Python recompute of the merged-sketch union estimator (same 48-bit
    md5 hashes, same (k-1)*M // h_k rule with the small-set fallback) —
    exact equality; and the estimate lands within the standard KMV
    relative-error envelope (~1/sqrt(k)*3) of the exact union."""
    import datetime
    import hashlib

    from simple_query_engine_spark.operators.curation import (
        KMV_EPOCH,
        KMV_HASH_SPACE,
        KMV_K,
        KMV_TYPE_A,
        KMV_TYPE_B,
        KMV_UNION_HEX,
        q_sketch_kmv_union,
    )

    epoch = datetime.date.fromisoformat(KMV_EPOCH)
    sides = {KMV_TYPE_A: set(), KMV_TYPE_B: set()}
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        if r.event_type in sides:
            day = (r.ts.date() - epoch).days
            h = int(
                hashlib.md5(f"{r.user_id}:{day}".encode()).hexdigest()[
                    :KMV_UNION_HEX
                ],
                16,
            )
            sides[r.event_type].add(h)
    a, b = sides[KMV_TYPE_A], sides[KMV_TYPE_B]
    merged = sorted(sorted(a)[: KMV_K] + sorted(b)[: KMV_K])
    merged = sorted(set(merged))[: KMV_K]
    k_used, theta = len(merged), max(merged)
    exact = len(a | b)
    est = k_used if k_used < KMV_K else (k_used - 1) * KMV_HASH_SPACE // theta
    row = q_sketch_kmv_union(spark, sf_dir).collect()[0]
    assert (row.k_used, row.theta_hash, row.exact_union, row.union_est) == (
        k_used,
        theta,
        exact,
        est,
    )
    assert row.err_ppm == abs(est - exact) * 1_000_000 // exact
    if k_used == KMV_K:  # estimator regime: check the error envelope
        assert abs(est - exact) / exact < 3 / (KMV_K ** 0.5)


def test_split_expr_and_split_sql_agree_per_row(spark):
    """The r14 single-sourcing contract: the Spark split stamp
    (split_expr) and its generated DuckDB twin (split_sql) must assign
    byte-identical splits per doc_id — the leak-free guarantee of the
    pair manifest rides on this equivalence, so it gets a direct
    cross-engine pin, not just the certified entries' indirect one."""
    import duckdb

    from simple_query_engine_spark.operators.curation import split_expr, split_sql
    from pyspark.sql import functions as F

    ids = list(range(500)) + [10**12 + i for i in range(100)]
    spark_rows = {
        r["doc_id"]: r["split"]
        for r in spark.createDataFrame([(i,) for i in ids], "doc_id long")
        .select("doc_id", split_expr(F.col("doc_id")).alias("split"))
        .collect()
    }
    con = duckdb.connect()
    values = ", ".join(f"({i})" for i in ids)
    duck_rows = dict(
        con.execute(
            f"SELECT doc_id, {split_sql()} AS split "
            f"FROM (VALUES {values}) AS t(doc_id)"
        ).fetchall()
    )
    assert spark_rows == duck_rows
    assert set(spark_rows.values()) == {"train", "val", "test"}
