"""Advanced window frames and ordered aggregation.

- RANGE frames (value-based window bounds) vs the ROWS frames elsewhere —
  a trailing-30-day revenue window per customer, the classic "sliding
  business window" that ROWS cannot express when events are irregular.
- ntile / percent_rank / cume_dist — distribution ranks.
- Ordered string aggregation — deterministic via sort-before-join (Spark
  has no ORDER BY inside collect_list; sorting the collected array gives
  the engine-portable equivalent of DuckDB's ``string_agg(... ORDER BY)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_query_engine_spark.sources.catalog import table

TRAILING_DAYS = 30


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer: RANGE frame over epoch days.

    The frame bound is a *value* offset on the ordering key (days), so two
    orders 40 days apart never share a frame regardless of row adjacency.
    """
    orders = table(spark, sf_dir, "orders")
    with_day = orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        # o_orderdate arrives as TIMESTAMP already (session.py disables
        # parquet NTZ inference), so the cast is a defensive no-op; then
        # epoch seconds → days, the same floor-division DuckDB's
        # epoch()//86400 performs.
        (F.col("o_orderdate").cast("timestamp").cast("long") / 86400)
        .cast("long")
        .alias("order_day"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-TRAILING_DAYS, 0)
    )
    return with_day.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("price").over(w), 2).alias("trailing_30d_spend"),
        F.count(F.lit(1)).over(w).alias("trailing_30d_orders"),
    )


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over customer balances per segment."""
    customer = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("balance_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("balance_cume_dist"),
    )


def q_agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: nation names per region, comma-joined in
    sorted order (sort-after-collect makes it deterministic and portable)."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nation_list"
            ),
            F.count(F.lit(1)).alias("nation_count"),
        )
        .withColumnRenamed("r_name", "region_name")
    )


def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (the "hypertable" continuous-aggregate shape):
    hourly event stats that roll up to daily subtotals and a grand total in
    one pass — ``ROLLUP(day, hour)`` plans a single shuffle with partial
    aggregation; at scale this replaces maintaining three separate
    aggregate tables.  NULL day/hour rows are the subtotal levels (the
    standard rollup encoding, portable across engines)."""
    events = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("long").alias("day_epoch")
    hour = F.date_trunc("hour", F.col("ts")).cast("long").alias("hour_epoch")
    return events.rollup(day, hour).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


QUERIES = {
    "window_range_frame": q_window_range_frame,
    "window_distribution": q_window_distribution,
    "agg_string_concat": q_agg_string_concat,
    "events_time_rollup": q_events_time_rollup,
}

ORACLES = {
    "window_range_frame": f"""
        WITH with_day AS (
            SELECT o_custkey, o_orderkey,
                   ROUND(o_totalprice, 2) AS price,
                   CAST(floor(epoch(o_orderdate)) // 86400 AS BIGINT) AS order_day
            FROM orders
        )
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(price) OVER w, 2) AS trailing_30d_spend,
               COUNT(*) OVER w AS trailing_30d_orders
        FROM with_day
        WINDOW w AS (PARTITION BY o_custkey ORDER BY order_day
                     RANGE BETWEEN {TRAILING_DAYS} PRECEDING AND CURRENT ROW)
    """,
    "window_distribution": """
        SELECT c_custkey, c_mktsegment,
               NTILE(4) OVER w AS balance_quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS balance_pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS balance_cume_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    "agg_string_concat": """
        SELECT r_name AS region_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nation_list,
               COUNT(*) AS nation_count
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "events_time_rollup": """
        SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
               CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS value_sum
        FROM events
        GROUP BY ROLLUP (1, 2)
    """,
}
