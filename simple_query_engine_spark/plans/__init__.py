"""Logical-plan layer.

This engine deliberately has no plan representation of its own beyond the
mini-language AST: ``Query``/``Filter`` (the front-end's logical plan) are
translated directly to DataFrame operations (``executor.execute``), at
which point Catalyst's analyzed/optimized/physical plans take over
(SURVEY.md §4 — zero custom optimizer rules, by design).  This package
re-exports that pipeline as the "plans" surface:

    parse(text) → Query            (logical plan, front-end)
    execute(query, df) → DataFrame  (Catalyst logical plan)
    df.explain("formatted")         (optimized + physical plan)
"""

from simple_query_engine_spark.executor import QueryExecutionError, execute
from simple_query_engine_spark.minilang.ast import Filter, FilterType, Query
from simple_query_engine_spark.minilang.parser import QueryParseError, parse

__all__ = [
    "Filter",
    "FilterType",
    "Query",
    "QueryExecutionError",
    "QueryParseError",
    "execute",
    "parse",
]
