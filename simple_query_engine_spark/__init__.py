"""simple_query_engine_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the observable query semantics of
``amoilanen/simple-query-engine`` (reference: ``/root/reference``, a ~960-LoC
single-table Rust engine — see SURVEY.md), widened to a full relational +
streaming + LLM-data-pipeline operator suite.

Design stance (SURVEY.md §7.0): we write *no* execution engine, *no* indexes,
*no* custom optimizer rules.  Every operator is declared through the DataFrame
/ Spark SQL API so Catalyst + Tungsten pick the physical strategy (predicate
pushdown, column pruning, broadcast vs sort-merge joins, AQE skew handling,
whole-stage codegen).  Python-side work is limited to parsing the reference's
two-clause mini-language and to Arrow-batched pandas UDFs where DataFrame
primitives genuinely cannot express the semantics (e.g. multimodal decode).
"""

from simple_query_engine_spark.session import get_spark, stop_spark
from simple_query_engine_spark.minilang.ast import Filter, FilterType, Query
from simple_query_engine_spark.minilang.parser import QueryParseError, parse
from simple_query_engine_spark.executor import QueryExecutionError, execute
from simple_query_engine_spark.sources.catalog import TABLE_NAMES, load_tables

__all__ = [
    "Filter",
    "FilterType",
    "Query",
    "QueryParseError",
    "QueryExecutionError",
    "TABLE_NAMES",
    "execute",
    "get_spark",
    "load_tables",
    "parse",
    "stop_spark",
]

__version__ = "0.1.0"
