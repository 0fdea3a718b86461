"""Parser for the ``PROJECT ... [FILTER ...]`` mini-language.

Re-implements, from the behavioral spec in SURVEY.md §3.2, the grammar of the
reference's recursive-descent parser (reference ``src/query.rs:11-84``) —
not its code.  Semantics preserved:

- tokens are whitespace-separated (``src/query.rs:12``); arbitrary blanks OK
- first token must be the keyword ``PROJECT`` (``src/query.rs:30-35``)
- projection columns: a token with a *trailing* comma means "more columns
  follow"; a comma inside a token does NOT split it (``a,b`` is one column
  name, ``src/query.rs:36-48``); a bare token is the last column; ``FILTER``
  stops the projection list
- empty projection is an error (``src/query.rs:49-53``)
- optional filter clause is exactly four tokens ``FILTER col op value`` at
  fixed offsets (``src/query.rs:62-77``); op ∈ {``>``, ``=``}
  (``src/query.rs:100-108``); surrounding double-quotes are trimmed from the
  value (``src/query.rs:70``)
- any trailing tokens after the filter are an error (``src/query.rs:14-18``)

Deviation (SURVEY.md §7.1.1): the literal's type is NOT sniffed here; the raw
text plus a quoted flag go into the AST and the executor types the literal
against the target column's Spark type.
"""

from __future__ import annotations

from simple_query_engine_spark.minilang.ast import Filter, FilterType, Query

_PROJECT_KEYWORD = "PROJECT"
_FILTER_KEYWORD = "FILTER"


class QueryParseError(ValueError):
    """Raised for any malformed mini-language query."""


def parse(query_text: str) -> Query:
    """Parse a mini-language query string into a :class:`Query`."""
    tokens = query_text.split()
    columns, position = _parse_projection(tokens)
    filter_, position = _parse_filter(tokens, position)
    if position < len(tokens):
        raise QueryParseError(
            f"Unexpected trailing input starting at '{tokens[position]}'"
        )
    return Query(column_names=tuple(columns), filter=filter_)


def _parse_projection(tokens: list[str]) -> tuple[list[str], int]:
    if not tokens or tokens[0] != _PROJECT_KEYWORD:
        found = tokens[0] if tokens else "<end of input>"
        raise QueryParseError(
            f"Expected keyword '{_PROJECT_KEYWORD}' at the start of the query, found '{found}'"
        )
    columns: list[str] = []
    position = 1
    while position < len(tokens):
        token = tokens[position]
        if token == _FILTER_KEYWORD:
            break
        if token.endswith(","):
            columns.append(token[:-1])
            position += 1
            continue
        columns.append(token)
        position += 1
        break
    if not columns:
        raise QueryParseError("Projection must list at least one column")
    return columns, position


def _parse_filter(tokens: list[str], position: int) -> tuple[Filter | None, int]:
    if position >= len(tokens):
        return None, position
    if tokens[position] != _FILTER_KEYWORD:
        raise QueryParseError(
            f"Expected keyword '{_FILTER_KEYWORD}', found '{tokens[position]}'"
        )
    if position + 1 >= len(tokens):
        raise QueryParseError("Filter is missing a column name")
    if position + 2 >= len(tokens):
        raise QueryParseError("Filter is missing an operator")
    if position + 3 >= len(tokens):
        raise QueryParseError("Filter is missing a value")
    column_name = tokens[position + 1]
    operator_token = tokens[position + 2]
    raw_value = tokens[position + 3]
    try:
        filter_type = FilterType(operator_token)
    except ValueError:
        raise QueryParseError(
            f"Unknown filter operator '{operator_token}', expected '>' or '='"
        ) from None
    value = raw_value.strip('"')
    return (
        Filter(
            column_name=column_name,
            filter_type=filter_type,
            value=value,
            quoted=value != raw_value,
        ),
        position + 4,
    )
