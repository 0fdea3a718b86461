"""Relational completion — everything SURVEY.md §2.2 lists as absent from the
reference, expressed as idiomatic DataFrame/Spark-SQL plans.

Scale notes (the 100 TB design point), per operator family:

- **Joins**: dimension joins (nation/region/supplier) are explicitly
  ``broadcast()`` — at any scale the dims stay small, so no shuffle of the
  fact side.  Fact-fact joins (orders ⋈ lineitem) shuffle on the join key;
  AQE (on by default, session.py) converts to broadcast when the build side
  turns out small and splits skewed partitions.
- **Aggregations**: ``groupBy().agg()`` gets map-side partial aggregation
  from Catalyst automatically (HashAggregate partial → exchange → final);
  low-cardinality group keys (returnflag × linestatus = 6 groups) reduce the
  shuffle to bytes regardless of input size.
- **Windows**: every window spec partitions by a key (never a global window
  without PARTITION BY, which would single-task at scale) and orders with a
  unique tie-break so results are deterministic.
- **Top-k**: ``orderBy().limit(k)`` plans as TakeOrderedAndProject — per-
  partition top-k then a k-row merge on the driver; never a global sort.

Aliasing: every computed column is aliased identically here and in the
DuckDB oracle (driver hashes after sorting columns by name).  Double-typed
aggregates are ``round``-ed so summation-order differences between engines
cannot leak into the hash.  Sums of BIGINT are cast to BIGINT in DuckDB
(whose SUM(BIGINT) widens to HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_query_engine_spark.sources.catalog import table


# --- aggregation family ---


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter → 6-group hash aggregate.

    At 100 TB: the shipdate predicate pushes to the Parquet scan (row-group
    min/max skip), partial aggregation makes the shuffle 6 rows per task.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — Catalyst plans expand + two-phase agg."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.countDistinct("o_custkey").alias("distinct_customers"),
    )


def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("order_count") >= 3)
    )


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus); NULL group keys coalesced to
    'ALL' so the subtotal rows hash identically across engines."""
    lineitem = table(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("row_count"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "row_count",
        )
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "order_count",
        )
    )


# --- join family ---


def q_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact(customer) ⋈ broadcast(nation) ⋈ broadcast(region).

    Dims are broadcast explicitly — zero shuffle of the fact side at any
    scale; the plan should show BroadcastHashJoin twice.
    """
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .withColumnRenamed("r_name", "region_name")
    )


def q_join_large_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (orders ⋈ lineitem) on the natural key.

    At scale this is the canonical shuffle join: both sides hash-partition on
    orderkey; AQE handles skew.  Aggregation after the join is partial-first.
    """
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers having at least one open order (EXISTS)."""
    customer = table(spark, sf_dir, "customer")
    open_orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no orders at all (NOT EXISTS)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


def q_join_left_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving dimension rows with no facts (NULL path)."""
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    return (
        nation.join(customer, nation.n_nationkey == customer.c_nationkey, "left_outer")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("customer_count"))
        .withColumnRenamed("n_name", "nation_name")
    )


def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join down the hierarchy: region → nation → customer → orders.

    Catalyst reorders/broadcasts; only the customer⋈orders edge shuffles.
    """
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .withColumnRenamed("r_name", "region_name")
        .withColumnRenamed("o_orderstatus", "orderstatus")
    )


# --- window family ---


def q_window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by price — ROW_NUMBER with a unique
    tie-break (orderkey) so ranks are deterministic across engines."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "price_rank")
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order date (unique tie-break)."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD: price delta between a customer's consecutive orders."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w), 2
        ).alias("price_delta"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
    )


def q_window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK vs DENSE_RANK on a column with ties (part size within brand)."""
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size"), F.col("p_partkey"))
    return part.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).alias("size_rank"),
        F.dense_rank().over(w).alias("size_dense_rank"),
    )


# --- sort / limit / top-k ---


def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — plans as TakeOrderedAndProject (per-partition top-k +
    k-row driver merge), never a full global sort."""
    lineitem = table(spark, sf_dir, "lineitem")
    return (
        lineitem.orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    )


def q_sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with LIMIT (ascending + descending mix).
    s_suppkey completes the total order — (nationkey, acctbal) alone is
    not unique, and a tie straddling the LIMIT boundary would make the
    returned row SET engine-arbitrary."""
    supplier = table(spark, sf_dir, "supplier")
    return (
        supplier.orderBy(
            F.col("s_nationkey"), F.col("s_acctbal").desc(), F.col("s_suppkey")
        )
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .limit(100)
    )


# --- set operations ---


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer and supplier nation keys."""
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of nation keys present on both sides."""
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): nations with customers but no suppliers.

    ``subtract`` is Spark's EXCEPT DISTINCT.  (An earlier revision used
    ``exceptAll().distinct()``, which is multiset difference — it keeps a
    key whenever the left *multiplicity* exceeds the right, a different
    relation from the documented semantics.)
    """
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


# --- expression / scalar-function family ---


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage: UPPER/LOWER/LENGTH/SUBSTR/CONCAT/LIKE."""
    part = table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction + grouping by calendar month."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            "o_totalprice",
        )
        .groupBy("order_year", "order_month")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("month_total"),
        )
    )


def q_case_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN + IN + BETWEEN predicate algebra."""
    lineitem = table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_returnflag").isin("A", "N"))
        .select(
            F.when(F.col("l_quantity") < 10, "low")
            .when(F.col("l_quantity").between(10, 25), "mid")
            .otherwise("high")
            .alias("qty_bucket"),
            "l_returnflag",
        )
        .groupBy("qty_bucket", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("line_count"))
        .withColumnRenamed("l_returnflag", "returnflag")
    )


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function coverage kept JVM-side (whole-stage codegen)."""
    lineitem = table(spark, sf_dir, "lineitem")
    return lineitem.filter(F.col("l_orderkey") <= 100).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil("l_discount" ).cast("long").alias("disc_ceil"),
        F.round(F.abs(F.col("l_quantity") - 25), 2).alias("qty_dev"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod"),
    )


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column."""
    events = table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum("k_value").alias("k_sum"),
            F.round(F.avg("k_value"), 4).alias("k_avg"),
        )
    )


def q_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via Spark SQL: orders above the average total price.

    The threshold is ROUND(AVG, 2): an unrounded double AVG is
    summation-order dependent (Spark's partial-agg order vs DuckDB's
    sequential sum differ in the last ulps), and any o_totalprice —
    itself a 2-decimal domain — falling between the two engines' raw
    averages would flip in or out of the result."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT ROUND(AVG(o_totalprice), 2) FROM orders)
        """
    )


def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection (dropDuplicates)."""
    lineitem = table(spark, sf_dir, "lineitem")
    return lineitem.select("l_returnflag", "l_linestatus").distinct()


QUERIES = {
    "agg_pricing_summary": q_agg_pricing_summary,
    "agg_count_distinct": q_agg_count_distinct,
    "agg_having": q_agg_having,
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "join_broadcast_dim": q_join_broadcast_dim,
    "join_large_revenue": q_join_large_revenue,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_left_outer_agg": q_join_left_outer_agg,
    "join_multiway": q_join_multiway,
    "window_topn_per_group": q_window_topn_per_group,
    "window_running_sum": q_window_running_sum,
    "window_lag_lead": q_window_lag_lead,
    "window_rank_dense": q_window_rank_dense,
    "sort_topk": q_sort_topk,
    "sort_multi_key": q_sort_multi_key,
    "set_union": q_set_union,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "string_funcs": q_string_funcs,
    "date_funcs": q_date_funcs,
    "case_in_between": q_case_in_between,
    "math_funcs": q_math_funcs,
    "json_funcs": q_json_funcs,
    "subquery_above_avg": q_subquery_above_avg,
    "distinct_rows": q_distinct_rows,
}

ORACLES = {
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_count_distinct": """
        SELECT o_orderstatus,
               COUNT(*) AS order_count,
               COUNT(DISTINCT o_custkey) AS distinct_customers
        FROM orders GROUP BY o_orderstatus
    """,
    "agg_having": """
        SELECT o_custkey,
               COUNT(*) AS order_count,
               ROUND(SUM(o_totalprice), 2) AS total_spent
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
    "agg_rollup": """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS row_count
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_cube": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS orderpriority,
               COUNT(*) AS order_count
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "join_broadcast_dim": """
        SELECT r_name AS region_name,
               COUNT(*) AS customer_count,
               ROUND(AVG(c_acctbal), 4) AS avg_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "join_large_revenue": """
        SELECT o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               COUNT(*) AS line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    "join_anti": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_left_outer_agg": """
        SELECT n_name AS nation_name, COUNT(c_custkey) AS customer_count
        FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        GROUP BY n_name
    """,
    "join_multiway": """
        SELECT r_name AS region_name, o_orderstatus AS orderstatus,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, o_orderstatus
    """,
    "window_topn_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, price_rank FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
            FROM orders
        ) WHERE price_rank <= 2
    """,
    "window_running_sum": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        FROM orders
    """,
    "window_lag_lead": """
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice - LAG(o_totalprice, 1) OVER w, 2) AS price_delta,
               ROUND(LEAD(o_totalprice, 1) OVER w, 2) AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window_rank_dense": """
        SELECT p_brand, p_partkey,
               RANK() OVER w AS size_rank,
               DENSE_RANK() OVER w AS size_dense_rank
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_size, p_partkey)
    """,
    "sort_topk": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
    "sort_multi_key": """
        SELECT s_suppkey, s_nationkey, s_acctbal
        FROM supplier ORDER BY s_nationkey, s_acctbal DESC, s_suppkey LIMIT 100
    """,
    "set_union": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "set_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "set_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "string_funcs": """
        SELECT p_partkey,
               UPPER(p_brand) AS brand_upper,
               LOWER(p_type) AS type_lower,
               LENGTH(p_name) AS name_len,
               SUBSTR(p_type, 1, 5) AS type_prefix,
               CONCAT_WS('|', p_brand, p_type) AS brand_type
        FROM part WHERE p_name LIKE '%a%'
    """,
    "date_funcs": """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
               COUNT(*) AS order_count,
               ROUND(SUM(o_totalprice), 2) AS month_total
        FROM orders GROUP BY 1, 2
    """,
    "case_in_between": """
        SELECT CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity BETWEEN 10 AND 25 THEN 'mid'
                    ELSE 'high' END AS qty_bucket,
               l_returnflag AS returnflag,
               COUNT(*) AS line_count
        FROM lineitem
        WHERE l_returnflag IN ('A', 'N')
        GROUP BY 1, 2
    """,
    "math_funcs": """
        SELECT l_orderkey, l_linenumber,
               ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               CAST(CEIL(l_discount) AS BIGINT) AS disc_ceil,
               ROUND(ABS(l_quantity - 25), 2) AS qty_dev,
               l_orderkey % 7 AS key_mod
        FROM lineitem WHERE l_orderkey <= 100
    """,
    "json_funcs": """
        SELECT event_type,
               COUNT(*) AS event_count,
               CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
               ROUND(AVG(CAST(props->>'$.k' AS BIGINT)), 4) AS k_avg
        FROM events GROUP BY event_type
    """,
    "subquery_above_avg": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT ROUND(AVG(o_totalprice), 2) FROM orders)
    """,
    "distinct_rows": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
}
