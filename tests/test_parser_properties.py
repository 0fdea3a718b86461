"""Property-based parser tests (hypothesis) — round-trips and invariants
the 12 example-based cases can't pin exhaustively."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from simple_query_engine_spark.minilang.ast import FilterType
from simple_query_engine_spark.minilang.parser import QueryParseError, parse

# Identifiers that can't collide with keywords or grammar punctuation.
identifier = st.from_regex(r"[a-z_][a-z0-9_]{0,20}", fullmatch=True).filter(
    lambda s: s not in ("PROJECT", "FILTER")
)
literal = st.from_regex(r"[a-zA-Z0-9_.\-]{1,12}", fullmatch=True)


@given(st.lists(identifier, min_size=1, max_size=8))
@settings(max_examples=200)
def test_projection_roundtrip(columns):
    query = parse("PROJECT " + ", ".join(columns))
    assert list(query.column_names) == columns
    assert query.filter is None


@given(
    st.lists(identifier, min_size=1, max_size=5),
    identifier,
    st.sampled_from([">", "="]),
    literal,
)
@settings(max_examples=200)
def test_filter_roundtrip(columns, filter_col, op, value):
    text = f"PROJECT {', '.join(columns)} FILTER {filter_col} {op} {value}"
    query = parse(text)
    assert list(query.column_names) == columns
    assert query.filter is not None
    assert query.filter.column_name == filter_col
    assert query.filter.filter_type is FilterType(op)
    assert query.filter.value == value


@given(
    st.lists(identifier, min_size=1, max_size=5),
    identifier,
    st.sampled_from([">", "="]),
    literal,
)
@settings(max_examples=100)
def test_quoted_literal_roundtrip(columns, filter_col, op, value):
    text = f'PROJECT {", ".join(columns)} FILTER {filter_col} {op} "{value}"'
    query = parse(text)
    assert query.filter.value == value
    assert query.filter.quoted is True


@given(
    st.integers(min_value=1, max_value=6),
    st.lists(identifier, min_size=1, max_size=4),
)
@settings(max_examples=100)
def test_whitespace_insensitive(pad_width, columns):
    pad = " " * pad_width
    canonical = parse("PROJECT " + ", ".join(columns))
    padded = parse(f"{pad}PROJECT{pad}" + f",{pad}".join(columns) + pad)
    assert padded == canonical


@given(st.text(max_size=30).filter(lambda s: not s.lstrip().startswith("PROJECT")))
@settings(max_examples=200)
def test_non_project_prefix_always_errors(text):
    try:
        parse(text)
        assert False, "expected parse error"
    except QueryParseError:
        pass
