"""Amplified-testdata invariants: key-shifted replication must scale fact
tables and their join results exactly linearly (k×), or the amplified
bench would measure a different workload, not a bigger one."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tools.amplify_testdata import amplify_dir


K = 3


@pytest.fixture(scope="module")
def amp_dir(spark, sf_dir):
    dst = tempfile.mkdtemp(prefix="sqe_amp_test_")
    amplify_dir(spark, sf_dir, K, dst)
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


def test_fact_tables_scale_k_times(spark, sf_dir, amp_dir):
    for name in ("lineitem", "orders", "customer", "events"):
        base = spark.read.parquet(f"{sf_dir}/{name}.parquet").count()
        amp = spark.read.parquet(f"{amp_dir}/{name}.parquet").count()
        assert amp == K * base, name


def test_dimensions_are_not_replicated(spark, sf_dir, amp_dir):
    for name in ("region", "nation", "documents", "embeddings"):
        base = spark.read.parquet(f"{sf_dir}/{name}.parquet").count()
        amp = spark.read.parquet(f"{amp_dir}/{name}.parquet").count()
        assert amp == base, name


def test_hot_key_mode_manufactures_skew(spark, sf_dir):
    """hot_fraction rewrites ~that share of lineitem rows to ONE order key
    (the uniform testdata never exercises skew without it); every rewritten
    row still joins (HOT_ORDER_KEY exists in replica 0 of orders)."""
    from tools.amplify_testdata import HOT_ORDER_KEY

    dst = tempfile.mkdtemp(prefix="sqe_amp_hot_test_")
    try:
        amplify_dir(spark, sf_dir, 2, dst, hot_fraction=0.5)
        li = spark.read.parquet(f"{dst}/lineitem.parquet")
        total = li.count()
        hot = li.filter(F.col("l_orderkey") == HOT_ORDER_KEY).count()
        assert 0.4 <= hot / total <= 0.6, hot / total
        orders = spark.read.parquet(f"{dst}/orders.parquet")
        assert orders.filter(F.col("o_orderkey") == HOT_ORDER_KEY).count() == 1
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_keys_stay_unique_and_joins_scale_linearly(spark, sf_dir, amp_dir):
    orders = spark.read.parquet(f"{amp_dir}/orders.parquet")
    assert orders.count() == orders.select("o_orderkey").distinct().count()

    def revenue(d):
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        od = spark.read.parquet(f"{d}/orders.parquet")
        return (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            )
            .collect()[0]
        )

    base, amp = revenue(sf_dir), revenue(amp_dir)
    # FK offsets applied to BOTH sides: row count exactly k×, no cross-
    # replica matches (which would make it super-linear).
    assert amp.n == K * base.n
    assert abs(amp.rev - K * base.rev) <= 1e-6 * abs(K * base.rev)


@pytest.fixture(scope="module")
def corpus_amp_dir(spark, sf_dir):
    dst = tempfile.mkdtemp(prefix="sqe_amp_corpus_test_")
    amplify_dir(spark, sf_dir, K, dst, corpus=True)
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


def test_corpus_mode_scales_documents_and_embeddings(spark, sf_dir, corpus_amp_dir):
    for name in ("documents", "embeddings"):
        base = spark.read.parquet(f"{sf_dir}/{name}.parquet").count()
        amp = spark.read.parquet(f"{corpus_amp_dir}/{name}.parquet").count()
        assert amp == K * base, name
    # Facts copy as-is in corpus mode.
    for name in ("lineitem", "orders"):
        base = spark.read.parquet(f"{sf_dir}/{name}.parquet").count()
        amp = spark.read.parquet(f"{corpus_amp_dir}/{name}.parquet").count()
        assert amp == base, name


def test_corpus_replicas_share_no_tokens(spark, corpus_amp_dir):
    """The whole point of token retagging: replicas are disjoint token
    universes, so dup/near-dup structure can only grow linearly (within
    replicas), never quadratically (across them)."""
    from tools.amplify_testdata import REPLICA_OFFSET

    docs = spark.read.parquet(f"{corpus_amp_dir}/documents.parquet")
    # Split on the normalization whitespace class, not a literal space —
    # a literal-space split would miss a tab/newline-carried fragment
    # leak (ADVICE r14), exactly the hazard the amplifier now guards.
    token = F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    replica = (F.col("doc_id") / REPLICA_OFFSET).cast("long").alias("rep")
    toks = docs.select(replica, token).distinct()
    shared = (
        toks.groupBy("tok")
        .agg(F.countDistinct("rep").alias("n_reps"))
        .filter(F.col("n_reps") > 1)
        .count()
    )
    assert shared == 0


def test_corpus_exact_dup_groups_grow_linearly(spark, sf_dir, corpus_amp_dir):
    """Every byte-identical text group replicates within each replica:
    group COUNT scales k×, max group SIZE stays flat."""

    def profile(d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        groups = docs.groupBy(F.md5("text")).agg(F.count(F.lit(1)).alias("n"))
        dup = groups.filter(F.col("n") > 1)
        return dup.count(), (dup.agg(F.max("n")).collect()[0][0] or 0)

    base_groups, base_max = profile(sf_dir)
    amp_groups, amp_max = profile(corpus_amp_dir)
    assert amp_groups == K * base_groups
    assert amp_max == base_max


def test_corpus_embeddings_rotate_and_align(spark, sf_dir, corpus_amp_dir):
    """Replica vectors are rotations (same element multiset, distinct
    ordering) and vec_id stays aligned with the amplified doc_id space."""
    from tools.amplify_testdata import REPLICA_OFFSET

    emb = spark.read.parquet(f"{corpus_amp_dir}/embeddings.parquet")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert emb.select("vec_id").distinct().count() == K * base.count()
    first = (
        emb.filter(
            F.col("vec_id") % REPLICA_OFFSET == F.lit(0)  # the vec_id-0 family
        )
        .orderBy("vec_id")
        .collect()
    )
    assert len(first) == K
    v0 = first[0]["embedding"]
    v1 = first[1]["embedding"]
    assert v1 != v0 and sorted(v1) == sorted(v0)
    assert v1 == v0[1:] + v0[:1]  # replica 1 = rotate left by 1


def test_corpus_amplifier_tags_every_whitespace_token(spark):
    """ADVICE r14 regression: a source doc whose tokens are separated by
    tab / newline / double space must STILL share no normalized tokens
    across replicas — the amplifier splits on the same whitespace class
    the engine's _NORM collapses, so no untagged fragment survives."""
    from tools.amplify_testdata import _amplified_documents

    df = spark.createDataFrame(
        [(0, "alpha\tbeta\ngamma  delta ", "en", "s", 24)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    amp = _amplified_documents(df, 3)
    toks = amp.select(
        (F.col("doc_id") / 10**12).cast("long").alias("rep"),
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "").distinct()
    shared = (
        toks.groupBy("tok")
        .agg(F.countDistinct("rep").alias("n_reps"))
        .filter(F.col("n_reps") > 1)
        .count()
    )
    assert shared == 0
    # and every replica still carries all four tokens
    per_rep = toks.groupBy("rep").count().collect()
    assert {r["count"] for r in per_rep} == {4}
