"""REPL dispatch surface as certified catalog entries.

The interactive REPL (``repl.py``, reference op #9 — ``src/main.rs:19-63``)
has two query dialects per input line: full Spark SQL against the
multi-table catalog, and the reference mini-language against a default
table.  ``tests/test_repl.py`` pins the loop mechanics (prompts, errors,
exit commands, row cap), but until round 7 neither dialect's *dispatch
path* sat under the driver's oracle gate.  These entries route through
``repl.dispatch`` — the exact function the interactive loop calls — so a
green verdict certifies what a REPL user actually executes:

- ``repl_sql_passthrough``: a catalog-mode SQL line (multi-table join +
  aggregate over the views ``load_tables`` registers).
- ``repl_minilang_catalog``: a mini-language line against the catalog's
  default table — the reference grammar running in the extended
  multi-table mode (the reference itself is single-table,
  ``src/query.rs:5-8``).

Scale: both are thin entry points — the SQL line plans through Catalyst
exactly as the equivalent DataFrame query would (broadcast dim join,
partial aggs); dispatch adds nothing to the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from simple_query_engine_spark.repl import dispatch
from simple_query_engine_spark.sources.catalog import load_tables

_SQL_LINE = (
    "SELECT n_name, COUNT(*) AS n_customers, "
    "ROUND(SUM(c_acctbal), 2) AS total_acctbal "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name"
)

_MINILANG_LINE = "PROJECT o_orderpriority, o_totalprice FILTER o_totalprice > 200000"


def q_repl_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return dispatch(spark, _SQL_LINE)


def q_repl_minilang_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir)
    return dispatch(spark, _MINILANG_LINE, tables["orders"])


QUERIES = {
    "repl_sql_passthrough": q_repl_sql_passthrough,
    "repl_minilang_catalog": q_repl_minilang_catalog,
}

ORACLES = {
    # The SQL line IS the oracle (modulo DuckDB's BIGINT count): the whole
    # point of the passthrough surface is that the user's SQL means the
    # same thing on both engines.
    "repl_sql_passthrough": """
        SELECT n_name, COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    # Mini-language semantics (SURVEY §2.1 #5/#6): column-typed literal
    # comparison, projection in user order.
    "repl_minilang_catalog": """
        SELECT o_orderpriority, o_totalprice
        FROM orders
        WHERE o_totalprice > 200000
    """,
}
