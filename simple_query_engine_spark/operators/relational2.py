"""Advanced relational operators: as-of join, range join, pivot,
deterministic hash sampling, statistical aggregates, array/struct/map
functions, union-by-name, null-path handling, grouping sets, a pandas-UDF
scalar op, and advanced string/date functions.

The as-of join is the flagship *custom operator* here: Spark has no ASOF
JOIN, and the naive formulation (range join + per-left-row top-1) explodes
to O(candidate pairs).  The implementation below uses the production-scale
pattern instead — union both sides tagged, one sort per user partition, and
a running ``last(ignorenulls)`` window — one shuffle, zero pair blow-up,
identical semantics to DuckDB's ASOF (ties resolved toward the later row).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from simple_query_engine_spark.sources.catalog import table


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the latest click by the same user at or
    before it (ASOF backward join).

    Scale shape: tag clicks and purchases, union, ONE window sort per
    user_id, running last(click_ts).  No range join, no per-row subquery —
    the cost is a single shuffle on user_id regardless of event volume.
    """
    events = table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("tag"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("tag"),
    )
    # At equal ts the click sorts first (tag 0 < 1), so a same-instant click
    # is visible to the purchase — matching ASOF's `<=`.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.col("last_click_ts").cast("long").alias("last_click_epoch"),
        )
    )


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: orders bucketed into inline price bands.

    The band table is tiny and broadcast → BroadcastNestedLoopJoin with a
    range predicate; the fact side streams once, no shuffle.
    """
    orders = table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("low", 0.0, 100_000.0),
            ("mid", 100_000.0, 300_000.0),
            ("high", 300_000.0, 1e12),
        ],
        ["band_name", "lo", "hi"],
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority × status, statuses as columns."""
    orders = table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via content hashing (md5 of the key).

    Unlike TABLESAMPLE/rand(), hash-sampling is reproducible across engines,
    retries and partitionings — the property a 100 TB pipeline needs for
    consistent holdout sets.
    """
    from simple_query_engine_spark.functions.hashing import md5_prefix_long

    orders = table(spark, sf_dir, "orders")
    bucket = md5_prefix_long(F.col("o_orderkey").cast("string"), 4) % 10
    return orders.filter(bucket == 0).select("o_orderkey", "o_custkey", "o_totalprice")


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/median per group."""
    lineitem = table(spark, sf_dir, "lineitem")
    # Median uses percentile_disc (an ACTUAL data value) rather than the
    # interpolated percentile: with even counts, interpolation of 2-decimal
    # values lands exactly on the half-cent, where the engines' different
    # interpolation formulas ((1-d)a+db vs a+d(b-a)) diverge by one ulp and
    # round to different cents (caught at sf0.001).
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.variance("l_extendedprice"), 2).alias("price_variance"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("price_median"),
        F.round(F.min("l_extendedprice"), 2).alias("price_min"),
        F.round(F.max("l_extendedprice"), 2).alias("price_max"),
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage over the embedding column."""
    embeddings = table(spark, sf_dir, "embeddings")
    # first/last are pass-through values: both engines widen the same
    # float32 to the identical double, so NO rounding — rounding would
    # CREATE a half-boundary hazard (hit at sf0.1: one value rounded to
    # -0.0001 in Spark and -0.0 in DuckDB under differing half modes).
    return embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", -1).cast("double").alias("last_val"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 8),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            4,
        ).alias("head_sum"),
    )


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with missing columns: customers + suppliers as one
    entity table (supplier rows have no market segment → NULL)."""
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("kind"),
    )
    supplier = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return customer.unionByName(supplier, allowMissingColumns=True)


def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-path algebra: outer join, COALESCE, IS NULL flags."""
    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    return (
        nation.join(supplier, nation.n_nationkey == supplier.s_nationkey, "left_outer")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("supplier_count"),
            F.coalesce(F.round(F.avg("s_acctbal"), 2), F.lit(-1.0)).alias("avg_acctbal"),
            (F.count("s_suppkey") == 0).alias("has_no_suppliers"),
        )
        .withColumnRenamed("n_name", "nation_name")
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS row_count
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


_SCORE_RESULT = T.DoubleType()


@F.pandas_udf(_SCORE_RESULT)
def _log_score(n_chars: pd.Series) -> pd.Series:
    """Arrow-batched scalar UDF (deterministic, so oracle-checkable):
    score = round(10 * ln(1 + n_chars), 4)."""
    import numpy as np

    return pd.Series(10.0 * np.log1p(n_chars.to_numpy(dtype="float64"))).round(4)


def q_udf_pandas_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized-UDF surface: Arrow batches in, numpy math, Arrow out.
    (Anything expressible as built-ins should be built-ins — this exists to
    pin the UDF machinery itself.)"""
    documents = table(spark, sf_dir, "documents")
    return documents.select("doc_id", _log_score(F.col("n_chars")).alias("log_score"))


def q_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / split_part / translate / lpad coverage."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.translate("p_brand", "Brand#", "brand-").alias("brand_translated"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
    )


def q_date_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_add / datediff / last_day / dayofweek / date_format coverage.

    ``dow_sunday1`` carries Spark's native 1=Sunday convention (the column
    name states it); the DuckDB oracle shifts its 0=Sunday convention by
    +1 to match.
    """
    orders = table(spark, sf_dir, "orders")
    order_date = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_add(order_date, 30).cast("string").alias("due_date"),
        F.datediff(order_date, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.last_day(order_date).cast("string").alias("month_end"),
        F.dayofweek(order_date).alias("dow_sunday1"),
        F.date_format(order_date, "yyyy-MM").alias("order_month"),
    )


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts per event_type, validated
    in-plan against the exact count.  At 100 TB approx_count_distinct is
    the only viable form — fixed-size sketches merge map-side instead of
    shuffling every distinct value.

    Raw sketch estimates are engine-specific, so the emitted columns are
    the tolerance-banded form: the exact count plus a flag that the HLL
    estimate (rsd=0.02) landed within ±5% of it (2.5σ — and deterministic
    for fixed data, verified at every test scale).  The oracle computes
    the exact count and asserts the flag, turning a permanently
    rows-only sketch row into a hash-checked one; the tighter ≤5%/≤2%
    behavior is additionally pinned in tests.
    """
    events = table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.countDistinct("user_id")
    return events.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.05 * exact.cast("double")
        ).alias("hll_within_5pct"),
    )


def q_agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch) per group, validated
    in-plan against exact percentile bounds.  The sketch analog of HLL for
    order statistics: at 100 TB, exact percentiles of a high-cardinality
    column require a full sort or large state; the sketch is fixed-size
    and merges map-side.

    GK with accuracy=1000 guarantees rank error ≤ N/1000; the emitted
    columns are the tolerance-banded form: per-group row count plus flags
    that each sketch value lies between the exact percentiles at p ∓ 0.01
    (10× the guarantee).  The oracle recomputes the group skeleton and
    asserts the flags — hash-checked instead of permanently rows-only;
    exact error bounds are additionally pinned in tests.
    """
    lineitem = table(spark, sf_dir, "lineitem")

    def within_band(p: float):
        approx = F.percentile_approx("l_extendedprice", F.lit(p), F.lit(1000))
        lo = F.percentile("l_extendedprice", F.lit(max(p - 0.01, 0.0)))
        hi = F.percentile("l_extendedprice", F.lit(min(p + 0.01, 1.0)))
        return (approx >= lo) & (approx <= hi)

    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        within_band(0.5).alias("median_within_band"),
        within_band(0.99).alias("p99_within_band"),
    )


def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery: orders from BUILDING-segment customers, per status."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS order_count
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderstatus
        """
    )


def q_agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation + sample
    covariance (quantity vs extended price)."""
    lineitem = table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: of users who signed up, how many purchased within 24 h
    of their first signup — two conditional aggregations and one equi-join
    on user_id, no event-sequence explosion.
    """
    events = table(spark, sf_dir, "events")
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    converted = (
        signups.join(purchases, "user_id", "left")
        .withColumn(
            "in_window",
            (F.col("purchase_ts") >= F.col("first_signup"))
            & (
                F.col("purchase_ts")
                <= F.col("first_signup") + F.expr("INTERVAL 24 HOURS")
            ),
        )
        .groupBy("user_id")
        .agg(F.max(F.coalesce("in_window", F.lit(False))).alias("converted"))
    )
    return converted.agg(
        F.count(F.lit(1)).alias("signup_users"),
        F.sum(F.col("converted").cast("long")).alias("converted_users"),
        F.round(
            F.sum(F.col("converted").cast("long")) / F.count(F.lit(1)), 4
        ).alias("conversion_rate"),
    )


QUERIES = {
    "join_asof": q_join_asof,
    "funnel_conversion": q_funnel_conversion,
    "agg_correlation": q_agg_correlation,
    "join_range": q_join_range,
    "pivot_status": q_pivot_status,
    "sample_hash": q_sample_hash,
    "agg_stats": q_agg_stats,
    "array_funcs": q_array_funcs,
    "union_by_name": q_union_by_name,
    "null_handling": q_null_handling,
    "grouping_sets": q_grouping_sets,
    "udf_pandas_score": q_udf_pandas_score,
    "string_advanced": q_string_advanced,
    "date_advanced": q_date_advanced,
    "subquery_in": q_subquery_in,
    "agg_approx_distinct": q_agg_approx_distinct,
    "agg_quantile_sketch": q_agg_quantile_sketch,
}

from simple_query_engine_spark.functions.hashing import md5_prefix_long_sql

_sample_hash_sql = md5_prefix_long_sql("CAST(o_orderkey AS VARCHAR)", 4)

ORACLES = {
    "agg_correlation": """
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
               ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "funnel_conversion": """
        WITH signups AS (
            SELECT user_id, MIN(ts) AS first_signup
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), converted AS (
            SELECT s.user_id,
                   MAX(COALESCE(p.ts >= s.first_signup
                                AND p.ts <= s.first_signup + INTERVAL 24 HOUR,
                                FALSE)) AS converted
            FROM signups s
            LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
              ON s.user_id = p.user_id
            GROUP BY s.user_id
        )
        SELECT COUNT(*) AS signup_users,
               CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS converted_users,
               ROUND(SUM(CASE WHEN converted THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 4) AS conversion_rate
        FROM converted
    """,
    "join_asof": """
        SELECT p.event_id AS purchase_id,
               p.user_id,
               CAST(floor(epoch(MAX(c.ts))) AS BIGINT) AS last_click_epoch
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id AND c.ts <= p.ts
        GROUP BY p.event_id, p.user_id
    """,
    "join_range": """
        SELECT band_name,
               COUNT(*) AS order_count,
               ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders
        JOIN (VALUES ('low', 0.0, 100000.0),
                     ('mid', 100000.0, 300000.0),
                     ('high', 300000.0, 1e12)) AS bands(band_name, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band_name
    """,
    "pivot_status": """
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
        FROM orders GROUP BY o_orderpriority
    """,
    "sample_hash": f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE {_sample_hash_sql} % 10 = 0
    """,
    "agg_stats": """
        SELECT l_returnflag,
               ROUND(stddev_samp(l_extendedprice), 2) AS price_stddev,
               ROUND(var_samp(l_extendedprice), 2) AS price_variance,
               CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE) AS price_median,
               ROUND(MIN(l_extendedprice), 2) AS price_min,
               ROUND(MAX(l_extendedprice), 2) AS price_max
        FROM lineitem GROUP BY l_returnflag
    """,
    "array_funcs": """
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               embedding[1]::DOUBLE AS first_val,
               embedding[len(embedding)]::DOUBLE AS last_val,
               ROUND(list_sum(list_transform(embedding[1:8], x -> x::DOUBLE)), 4) AS head_sum
        FROM embeddings
    """,
    "union_by_name": """
        SELECT c_custkey AS entity_id, c_name AS name,
               ROUND(c_acctbal, 2) AS acctbal,
               c_mktsegment AS mktsegment, 'customer' AS kind
        FROM customer
        UNION ALL
        SELECT s_suppkey, s_name, ROUND(s_acctbal, 2), NULL, 'supplier'
        FROM supplier
    """,
    "null_handling": """
        SELECT n_name AS nation_name,
               COUNT(s_suppkey) AS supplier_count,
               COALESCE(ROUND(AVG(s_acctbal), 2), -1.0) AS avg_acctbal,
               COUNT(s_suppkey) = 0 AS has_no_suppliers
        FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        GROUP BY n_name
    """,
    "grouping_sets": """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS row_count
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "udf_pandas_score": """
        SELECT doc_id, ROUND(10.0 * ln(1 + n_chars), 4) AS log_score
        FROM documents
    """,
    "string_advanced": """
        SELECT p_partkey,
               regexp_extract(p_brand, '(\\d+)', 1) AS brand_num,
               split_part(p_type, ' ', 1) AS type_first_word,
               translate(p_brand, 'Brand#', 'brand-') AS brand_translated,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
        FROM part
    """,
    "date_advanced": """
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
               CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INT) AS days_since_epoch_start,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow_sunday1,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS order_month
        FROM orders
    """,
    "subquery_in": """
        SELECT o_orderstatus, COUNT(*) AS order_count
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderstatus
    """,
    # Tolerance-banded sketch oracles: the Spark side validates its own
    # sketch against exact values computed in the same plan and emits
    # portable (exact value, in-band flag) columns; the oracle recomputes
    # the exact side and asserts the flags.  Deterministic for fixed data —
    # verified at every test scale before shipping.
    "agg_approx_distinct": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS hll_within_5pct
        FROM events GROUP BY event_type
    """,
    "agg_quantile_sketch": """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               TRUE AS median_within_band,
               TRUE AS p99_within_band
        FROM lineitem GROUP BY l_returnflag
    """,
}
