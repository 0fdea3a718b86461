"""Invariants for dedup_lsh_quality and stats_column_profile (the
cross-engine values are pinned by the oracle gate; these pin internal
consistency against independently computed ground truth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_query_engine_spark.operators.dedup import (
    q_dedup_lsh_quality,
    q_dedup_minhash_lsh,
    q_dedup_ngram_jaccard,
)
from simple_query_engine_spark.operators.relational4 import (
    _PROFILE_COLS,
    q_stats_column_profile,
)
from simple_query_engine_spark.sources.catalog import table


def test_lsh_quality_reconciles_with_pair_sets(spark, sf_dir):
    row = q_dedup_lsh_quality(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    est = {
        (p.doc_id_a, p.doc_id_b): p.est_jaccard
        for p in q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    exact = {
        (p.doc_id_a, p.doc_id_b): p.jaccard
        for p in q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    matched = set(est) & set(exact)
    assert r.n_lsh_pairs == len(est)
    assert r.n_exact_pairs == len(exact)
    assert r.n_matched == len(matched)
    errs = [round(abs(est[k] - exact[k]) * 10_000) for k in matched]
    assert r.max_abs_err_e4 == max(errs)
    assert r.mean_abs_err == round(sum(errs) / len(errs) / 10_000.0, 6)
    # The estimate should track exact Jaccard reasonably at 64 hashes.
    assert r.mean_abs_err < 0.2


def test_recall_audit_reconciles_with_topk_sets(spark, sf_dir):
    from simple_query_engine_spark.operators.similarity import (
        TOP_K,
        q_sim_ivf_topk,
        q_sim_recall_audit,
        q_sim_topk_bruteforce,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in q_sim_topk_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in q_sim_ivf_topk(spark, sf_dir).collect()
    }
    rows = q_sim_recall_audit(spark, sf_dir).collect()
    for r in rows:
        q_exact = {p for p in exact if p[0] == r.query_id}
        hits = q_exact & approx
        assert r.n_exact == TOP_K == len(q_exact)
        assert r.n_hits == len(hits)
        assert r.recall_at_k == round(len(hits) / TOP_K, 4)
        assert 0.0 <= r.recall_at_k <= 1.0


def test_null_safe_join_routes_null_group(spark, sf_dir):
    """The NULL-key group must reach its stats row (n_customers ==
    stats_n everywhere, NULL row present); a plain '=' join drops it —
    asserted directly as the contrast."""
    from pyspark.sql import functions as F2

    from simple_query_engine_spark.operators.relational4 import q_join_null_safe

    rows = q_join_null_safe(spark, sf_dir).collect()
    segs = {r.seg for r in rows}
    assert None in segs  # BUILDING → NULL group exists and joined
    for r in rows:
        assert r.n_customers == r.stats_n, r
    customer = table(spark, sf_dir, "customer")
    seg = F2.nullif(F2.col("c_mktsegment"), F2.lit("BUILDING"))
    cust = customer.select(seg.alias("seg"))
    stats = cust.groupBy(F2.col("seg").alias("s2")).count()
    plain = cust.join(stats, cust["seg"] == stats["s2"])
    assert plain.filter(F2.col("seg").isNull()).count() == 0  # '=' drops NULLs
    assert plain.count() == sum(r.n_customers for r in rows if r.seg is not None)


def test_column_profile_matches_direct_queries(spark, sf_dir):
    rows = {r.column_name: r for r in q_stats_column_profile(spark, sf_dir).collect()}
    assert set(rows) == set(_PROFILE_COLS)
    lineitem = table(spark, sf_dir, "lineitem")
    n = lineitem.count()
    for c in ("l_orderkey", "l_returnflag"):
        direct = lineitem.agg(
            F.countDistinct(c).alias("nd"),
            F.min(c).cast("string").alias("lo"),
            F.max(c).cast("string").alias("hi"),
        ).collect()[0]
        r = rows[c]
        assert r.n_rows == n
        assert r.n_nulls == 0
        assert r.n_distinct == direct.nd
        assert r.min_val == direct.lo and r.max_val == direct.hi
    assert rows["l_returnflag"].n_distinct == 3
