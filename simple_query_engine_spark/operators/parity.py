"""Reference-parity queries (SURVEY.md §2.1 ops #4-#8).

Each query goes through the real mini-language front-end — ``parse`` →
``execute`` — so the driver's correctness gate exercises the parser, the
literal-typing rules, and the translator, not just hand-built DataFrames.
The single reference table is played by ``lineitem`` (the reference has no
table names in its grammar; the table is whatever was loaded,
reference ``src/main.rs:20-29``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from simple_query_engine_spark.executor import execute
from simple_query_engine_spark.minilang.parser import parse
from simple_query_engine_spark.sources.catalog import table


def _run(spark: SparkSession, sf_dir: str, query_text: str) -> DataFrame:
    return execute(parse(query_text), table(spark, sf_dir, "lineitem"))


def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure projection, duplicates-of-a-column legal, user column order
    (reference ``src/query_engine.rs:43-60``)."""
    return _run(spark, sf_dir, "PROJECT l_orderkey, l_returnflag, l_linestatus")


def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter via the index-free Catalyst path; all matching rows
    including at the column minimum (reference ``src/query_engine.rs:97-117``,
    intended semantics per SURVEY.md §2 Note A)."""
    return _run(
        spark, sf_dir, 'PROJECT l_orderkey, l_linenumber, l_quantity FILTER l_returnflag = "A"'
    )


def q_filter_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greater-than filter (reference ``src/query_engine.rs:73-95``); literal
    typed against the column's type (SURVEY.md §7.1.1)."""
    return _run(spark, sf_dir, "PROJECT l_orderkey, l_extendedprice FILTER l_quantity > 45")


def q_project_filter_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter on a column that is NOT projected — pins the fixed
    filter-before-project pipeline (reference ``src/query_engine.rs:26-33``)."""
    return _run(spark, sf_dir, "PROJECT l_returnflag, l_linestatus FILTER l_discount > 0.08")


QUERIES = {
    "parity_project": q_project,
    "parity_filter_eq": q_filter_eq,
    "parity_filter_gt": q_filter_gt,
    "parity_project_filter_combo": q_project_filter_combo,
}

ORACLES = {
    "parity_project": "SELECT l_orderkey, l_returnflag, l_linestatus FROM lineitem",
    "parity_filter_eq": (
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
        " WHERE l_returnflag = 'A'"
    ),
    "parity_filter_gt": (
        "SELECT l_orderkey, l_extendedprice FROM lineitem WHERE l_quantity > 45"
    ),
    "parity_project_filter_combo": (
        "SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_discount > 0.08"
    ),
}
