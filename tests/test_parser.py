"""Parser tests — ports of the reference's 12 parser cases
(reference ``src/query.rs:110-267``) plus the quote/comma subtleties
documented in SURVEY.md §3.2."""

from __future__ import annotations

import pytest

from simple_query_engine_spark.minilang.ast import Filter, FilterType, Query
from simple_query_engine_spark.minilang.parser import QueryParseError, parse


# --- happy paths (reference src/query.rs:114-168, 193-201) ---


def test_multi_column_projection_no_filter():
    assert parse("PROJECT a, b, c") == Query(column_names=("a", "b", "c"))


def test_single_column_projection():
    assert parse("PROJECT a") == Query(column_names=("a",))


def test_projection_with_greater_filter():
    query = parse("PROJECT a, b FILTER c > 10")
    assert query.column_names == ("a", "b")
    assert query.filter == Filter("c", FilterType.GREATER, "10", quoted=False)


def test_projection_with_equal_filter():
    query = parse("PROJECT a FILTER b = 42")
    assert query.filter == Filter("b", FilterType.EQUAL, "42", quoted=False)


def test_quoted_string_literal():
    query = parse('PROJECT a FILTER b = "hello"')
    assert query.filter == Filter("b", FilterType.EQUAL, "hello", quoted=True)


def test_quoted_integer_literal_quotes_trimmed():
    # Reference trims quotes before sniffing (src/query.rs:70); we record
    # quotedness but keep the raw text for column-typed literals (§7.1.1).
    query = parse('PROJECT a FILTER b = "42"')
    assert query.filter == Filter("b", FilterType.EQUAL, "42", quoted=True)


def test_arbitrary_blanks_between_tokens():
    assert parse("  PROJECT   a,    b   FILTER   c   >   5  ") == parse(
        "PROJECT a, b FILTER c > 5"
    )


def test_comma_inside_token_is_one_column_name():
    # 'a,b' without a space is ONE column name (src/query.rs:36-48).
    assert parse("PROJECT a,b").column_names == ("a,b",)


def test_filter_stops_projection_even_after_trailing_comma():
    query = parse("PROJECT a, FILTER b > 1")
    assert query.column_names == ("a",)
    assert query.filter is not None


# --- error paths (reference src/query.rs:170-191, 203-266) ---


def test_empty_query_is_error():
    with pytest.raises(QueryParseError, match="PROJECT"):
        parse("")


def test_wrong_leading_keyword():
    with pytest.raises(QueryParseError, match="PROJECT"):
        parse("SELECT a")


def test_empty_projection_is_error():
    with pytest.raises(QueryParseError, match="at least one column"):
        parse("PROJECT FILTER a > 1")


def test_missing_filter_column():
    with pytest.raises(QueryParseError, match="column"):
        parse("PROJECT a FILTER")


def test_missing_filter_operator():
    with pytest.raises(QueryParseError, match="operator"):
        parse("PROJECT a FILTER b")


def test_missing_filter_value():
    with pytest.raises(QueryParseError, match="value"):
        parse("PROJECT a FILTER b >")


def test_unknown_operator():
    with pytest.raises(QueryParseError, match="operator"):
        parse("PROJECT a FILTER b >= 1")


def test_filter_keyword_typo():
    with pytest.raises(QueryParseError, match="FILTER"):
        parse("PROJECT a FLTER b > 1")


def test_trailing_garbage_is_error():
    with pytest.raises(QueryParseError, match="trailing"):
        parse("PROJECT a FILTER b > 1 extra")
