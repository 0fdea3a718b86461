"""TPC-H-shaped analytical queries, adapted to the synthetic star schema.

Each query is ONE dialect-neutral SQL string executed verbatim by both
``spark.sql`` (over temp views) and the DuckDB oracle — the strongest
possible parity statement: not "equivalent" formulations, the *same* text.
Dialect-neutral means: ANSI joins, ROUND on double aggregates, timestamp
literals instead of INTERVAL arithmetic, no vendor functions.

Catalyst plans these with the full optimizer pipeline — predicate pushdown
into the parquet scans, broadcast of the dimension tables, partial
aggregation — with zero engine code here; that IS the design stance
(SURVEY.md §7.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from simple_query_engine_spark.sources.catalog import load_tables

# Q3-shaped: shipping-priority revenue for a market segment before a date.
_Q3 = """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
"""

# Q5-shaped: revenue by nation through the full region hierarchy.
_Q5 = """
    SELECT n_name AS nation_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
"""

# Q14-shaped: share of revenue from a part-type family (conditional
# aggregation over a fact-dimension join).
_Q14 = """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'STANDARD%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS standard_revenue_pct,
           COUNT(*) AS line_count
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
"""

# Q19-shaped: disjunctive multi-attribute predicate (brand × quantity bands)
# — the optimizer must not collapse the OR into a cross product.
_Q19 = """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND l_quantity >= 20 AND l_quantity <= 40)
"""

# Q10-shaped: top returned-item customers by lost revenue.
_Q10 = """
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           n_name AS nation_name
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""

# Q6-shaped: forecast revenue change — tight single-scan aggregate whose
# three predicates all push into the parquet scan.
_Q6 = """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue_delta,
           COUNT(*) AS qualifying_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
"""

# Q4-shaped: order counts per priority where at least one line is a
# high-quantity return (decorrelated EXISTS → semi-join).
_Q4 = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 45
      )
    GROUP BY o_orderpriority
"""

# Q7-shaped: trade volume between customer-nation / supplier-nation pairs
# (two independent dimension paths out of the same fact row).
_Q7 = """
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS volume
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE cn.n_name <> sn.n_name
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY cn.n_name, sn.n_name
"""

# Q13-shaped: distribution of customers by order count (count-of-counts,
# outer join preserving zero-order customers).
_Q13 = """
    SELECT order_count, COUNT(*) AS customer_count
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS order_count
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    GROUP BY order_count
"""

# Q18-shaped: customers whose single order exceeds a quantity threshold
# (IN over a HAVING subquery).
_Q18 = """
    SELECT c_custkey, c_name, o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice,
           CAST(qty_sum AS DOUBLE) AS total_quantity
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN (
        SELECT l_orderkey, SUM(l_quantity) AS qty_sum
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    ) big ON big.l_orderkey = o_orderkey
"""

# Q22-shaped: wealthy customers gone idle (anti-join + scalar subquery
# over an aggregate).  "Idle" = no orders since 2000-01-01: the synthetic
# corpus gives every customer at least one order overall (measured: 0
# order-less customers at sf ≤ 0.01), so the classic no-orders-ever
# predicate returns an empty — hence vacuously hash-matching — result.
# The recency cutoff keeps the exact Q22 plan shape (correlated NOT
# EXISTS → anti-join, scalar aggregate subquery) with a non-empty
# result at every SF (5 / 55 / 646 customers at sf 0.001 / 0.01 / 0.1).
_Q22 = """
    SELECT c_mktsegment,
           COUNT(*) AS customer_count,
           ROUND(SUM(c_acctbal), 2) AS total_balance
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
"""

# Q12-shaped: late-shipment counts by order priority (conditional count
# over a fact-fact join with date-interval arithmetic).
_Q12 = """
    SELECT o_orderpriority,
           COUNT(*) AS line_count,
           CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_orderpriority
"""

# Q15-shaped: the top revenue supplier(s) over a quarter (CTE reused by
# both the ranking aggregate and the scalar MAX subquery).
_Q15 = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""

# Q16-shaped: distinct supplier counts per part attribute band (the
# distinct aggregate rides on a fact-dimension join; no partsupp table in
# this schema, lineitem plays supply evidence).
_Q16 = """
    SELECT p_brand, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13)
    GROUP BY p_brand, p_size
"""

# Q17-shaped: revenue from small-quantity lines of one brand, where
# "small" is relative to the part's own average (correlated scalar
# subquery — Catalyst decorrelates it into an aggregate + join).
_Q17 = """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_weekly_revenue,
           COUNT(*) AS qualifying_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""

# Q9-shaped: profit proxy by supplier nation and order year (five-way
# join, two dimension paths, LIKE filter on the part name).
_Q9 = """
    SELECT n_name AS nation_name,
           CAST(year(o_orderdate) AS INT) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS profit_proxy
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
"""

# Q2-shaped: min-cost supplier per part (no partsupp table in this schema;
# lineitem plays supply evidence, and the cost proxy is MIN(l_extendedprice)
# — a pass-through value, so the correlated min-equality is exact in both
# engines with no float-rounding hazard).
_Q2 = """
    WITH supply AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(l_extendedprice) AS min_price
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, s_name, n_name AS supp_nation, min_price
    FROM part
    JOIN supply ON partkey = p_partkey
    JOIN supplier ON s_suppkey = suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size = 7
      AND min_price = (SELECT MIN(min_price) FROM supply s2
                       WHERE s2.partkey = p_partkey)
"""

# Q8-shaped: one supplier nation's market share of a region's revenue by
# order year (two nation paths; the share is a ratio of conditional sums).
_Q8 = """
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = cn.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
    ) nation_volume
    GROUP BY o_year
"""

# Q11-shaped: parts representing an outsized share of one nation's supply
# value (HAVING-style threshold from a scalar subquery over the same CTE).
_Q11 = """
    WITH nation_value AS (
        SELECT l_partkey AS partkey, SUM(l_extendedprice) AS part_value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_2'
        GROUP BY l_partkey
    )
    SELECT partkey, ROUND(part_value, 2) AS part_value
    FROM nation_value
    WHERE part_value > (SELECT 0.001 * SUM(part_value) FROM nation_value)
"""

# Q20-shaped: suppliers who moved real volume of a part family in a year
# (IN over a grouped HAVING subquery; quantities are integral, so the
# HAVING threshold is exact in both engines).
_Q20 = """
    SELECT s_name, n_name AS supp_nation
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%widget%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 50
    )
"""

# Q21-shaped: suppliers who were the SOLE late shipper on finished
# multi-supplier orders ("late" = shipped >90 days after the order date —
# this schema has no commit/receipt dates).  EXISTS + NOT EXISTS over the
# same per-(order, supplier) CTE; Catalyst decorrelates to semi/anti joins.
_Q21 = """
    WITH line_status AS (
        SELECT l_orderkey AS orderkey, l_suppkey AS suppkey,
               MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM line_status l1
    JOIN supplier ON s_suppkey = l1.suppkey
    WHERE l1.is_late = 1
      AND EXISTS (SELECT 1 FROM line_status l2
                  WHERE l2.orderkey = l1.orderkey
                    AND l2.suppkey <> l1.suppkey)
      AND NOT EXISTS (SELECT 1 FROM line_status l3
                      WHERE l3.orderkey = l1.orderkey
                        AND l3.suppkey <> l1.suppkey
                        AND l3.is_late = 1)
    GROUP BY s_name
"""

_SQL = {
    "tpch_q3_shipping_priority": _Q3,
    "tpch_q7_nation_trade": _Q7,
    "tpch_q13_order_distribution": _Q13,
    "tpch_q18_large_orders": _Q18,
    "tpch_q22_idle_balances": _Q22,
    "tpch_q4_priority_exists": _Q4,
    "tpch_q5_local_volume": _Q5,
    "tpch_q6_forecast_revenue": _Q6,
    "tpch_q10_returned_items": _Q10,
    "tpch_q14_promo_share": _Q14,
    "tpch_q19_brand_bands": _Q19,
    "tpch_q9_nation_profit": _Q9,
    "tpch_q12_late_lines": _Q12,
    "tpch_q15_top_supplier": _Q15,
    "tpch_q16_supplier_counts": _Q16,
    "tpch_q17_small_quantity": _Q17,
    "tpch_q2_min_cost_supplier": _Q2,
    "tpch_q8_market_share": _Q8,
    "tpch_q11_important_parts": _Q11,
    "tpch_q20_volume_suppliers": _Q20,
    "tpch_q21_sole_late_supplier": _Q21,
}
# Q1's pricing-summary shape is covered by agg_pricing_summary
# (operators/relational.py) in DataFrame-API form — all 22 TPC-H query
# shapes now have a catalog analogue.


def _runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)  # registers the temp views the SQL names
        return spark.sql(sql)

    return run


QUERIES = {name: _runner(sql) for name, sql in _SQL.items()}
# The oracle is the SAME string the Spark side executes.
ORACLES = dict(_SQL)
