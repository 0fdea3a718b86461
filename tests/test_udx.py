"""Extended UDF-surface tests: grouped-map semantics, UDAF math, UDTF
bounds (the oracle gate covers engine parity; these pin the semantics)."""

from __future__ import annotations

from simple_query_engine_spark.operators import udx as U


def test_grouped_map_zscores_are_standardized(spark, sf_dir):
    rows = U.q_udf_grouped_map_zscore(spark, sf_dir).collect()
    by_lang: dict[str, list[float]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.z_score)
    for lang, zs in by_lang.items():
        mean = sum(zs) / len(zs)
        assert abs(mean) < 1e-2, f"{lang}: mean z {mean}"
        if len(zs) > 1:
            var = sum(z * z for z in zs) / len(zs)
            assert abs(var - 1.0) < 0.05, f"{lang}: z variance {var}"


def test_window_twin_equals_grouped_map(spark, sf_dir):
    """The JVM-side window z-score (production path) must emit exactly the
    grouped-map UDF's rows."""
    udf_rows = sorted(
        map(tuple, U.q_udf_grouped_map_zscore(spark, sf_dir).collect())
    )
    win_rows = sorted(map(tuple, U.q_zscore_window(spark, sf_dir).collect()))
    assert udf_rows == win_rows


def test_weighted_avg_bounded_by_price_range(spark, sf_dir):
    prices = U.table(spark, sf_dir, "lineitem").selectExpr(
        "min(l_extendedprice) AS lo", "max(l_extendedprice) AS hi"
    ).collect()[0]
    for r in U.q_udaf_weighted_avg(spark, sf_dir).collect():
        assert prices.lo <= r.weighted_avg_price <= prices.hi


def test_udtf_emits_bounded_bigrams(spark, sf_dir):
    rows = U.q_udtf_bigrams(spark, sf_dir).collect()
    assert rows, "UDTF produced no rows"
    assert all(r.doc_id < U.UDTF_MAX_DOC_ID for r in rows)
    assert all(len(r.bigram.split(" ")) == 2 for r in rows)
    # positions are dense per doc: max(pos) + 1 == count(bigrams)
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    for doc_id, positions in by_doc.items():
        assert sorted(positions) == list(range(len(positions)))


def test_split_fields_udtf_schema_follows_argument(spark):
    """Polymorphism pinned: the SAME UDTF yields different output schemas
    for different constant field lists (analyze-time schema), and a
    non-constant field list is rejected at planning."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from simple_query_engine_spark.operators.udx import _make_split_fields_udtf

    spark.udtf.register("split_fields_t", _make_split_fields_udtf())
    spark.createDataFrame(
        [("alpha beta gamma",)], "s string"
    ).createOrReplaceTempView("t_sf")

    two = spark.sql(
        "SELECT f.* FROM t_sf, LATERAL split_fields_t(s, 'a, b') f"
    )
    assert two.columns == ["a", "b"]
    # The FINAL field takes the LAST token (split_part -1 semantics): a
    # 3-token input to a 2-field list yields (first, last), mirroring the
    # udtf_split_fields oracle so longer names cannot silently diverge.
    assert two.collect()[0] == ("alpha", "gamma")

    three = spark.sql(
        "SELECT f.* FROM t_sf, LATERAL split_fields_t(s, 'x,y,z') f"
    )
    assert three.columns == ["x", "y", "z"]
    assert three.collect()[0] == ("alpha", "beta", "gamma")

    with pytest.raises(Exception, match="constant string"):
        spark.sql(
            "SELECT f.* FROM t_sf, LATERAL split_fields_t(s, s) f"
        ).collect()
