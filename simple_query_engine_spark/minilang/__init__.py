from simple_query_engine_spark.minilang.ast import Filter, FilterType, Query
from simple_query_engine_spark.minilang.parser import QueryParseError, parse

__all__ = ["Filter", "FilterType", "Query", "QueryParseError", "parse"]
