"""Executor tests — ports of the reference's 10 engine cases
(reference ``src/query_engine.rs:134-336``), asserted as *bags* of rows
(SURVEY.md §2 Note B: result order is unspecified)."""

from __future__ import annotations

import pytest

from simple_query_engine_spark.executor import QueryExecutionError, execute
from simple_query_engine_spark.minilang.parser import parse


@pytest.fixture(scope="module")
def df(spark):
    # Mirror of the reference's 5-row fixture (src/query_engine.rs:141-151).
    return spark.createDataFrame(
        [
            ("a", 1, 10),
            ("b", 2, 20),
            ("c", 3, 30),
            ("d", 4, 40),
            ("e", 5, 50),
        ],
        ["name", "rank", "score"],
    )


@pytest.fixture(scope="module")
def dup_df(spark):
    # Mirror of the 6-row duplicates fixture (src/query_engine.rs:274-281).
    return spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 2), ("d", 2), ("e", 3), ("f", 1)],
        ["name", "grade"],
    )


def bag(df):
    return sorted(tuple(row) for row in df.collect())


def test_greater_filter_with_projection(df):
    result = execute(parse("PROJECT name FILTER rank > 3"), df)
    assert bag(result) == [("d",), ("e",)]


def test_equal_filter_with_projection(df):
    result = execute(parse("PROJECT name, score FILTER rank = 2"), df)
    assert bag(result) == [("b", 20)]


def test_no_filter_passthrough(df):
    result = execute(parse("PROJECT name, rank, score"), df)
    assert bag(result) == [
        ("a", 1, 10),
        ("b", 2, 20),
        ("c", 3, 30),
        ("d", 4, 40),
        ("e", 5, 50),
    ]


def test_filter_on_non_projected_column(df):
    result = execute(parse("PROJECT name FILTER score > 35"), df)
    assert bag(result) == [("d",), ("e",)]


def test_duplicate_projection_allowed(df):
    result = execute(parse("PROJECT name, name FILTER rank = 1"), df)
    assert result.columns == ["name", "name"]
    assert bag(result) == [("a", "a")]


def test_empty_result_greater(df):
    assert bag(execute(parse("PROJECT name FILTER rank > 100"), df)) == []


def test_empty_result_equal(df):
    assert bag(execute(parse("PROJECT name FILTER rank = 100"), df)) == []


def test_missing_projection_column_errors(df):
    with pytest.raises(QueryExecutionError, match="nope"):
        execute(parse("PROJECT nope"), df)


def test_missing_filter_column_errors(df):
    with pytest.raises(QueryExecutionError, match="nope"):
        execute(parse("PROJECT name FILTER nope = 1"), df)


def test_equality_returns_all_duplicates(dup_df):
    # Intended semantics: ALL rows matching, including at the column minimum
    # — the reference's index path panics/drops rows there (SURVEY §2 Note A).
    result = execute(parse("PROJECT name FILTER grade = 2"), dup_df)
    assert bag(result) == [("b",), ("c",), ("d",)]


def test_equality_at_column_minimum_returns_all(dup_df):
    # Exercises reference bug #1/#2 territory: value at sorted position 0.
    result = execute(parse("PROJECT name FILTER grade = 1"), dup_df)
    assert bag(result) == [("a",), ("f",)]


def test_greater_with_duplicates(dup_df):
    result = execute(parse("PROJECT name FILTER grade > 1"), dup_df)
    assert bag(result) == [("b",), ("c",), ("d",), ("e",)]


def test_cross_type_literal_matches_nothing(df):
    # 'abc' cannot be typed as the integer column's type → no rows
    # (reference: cross-type equality always false, src/value.rs:4).
    assert bag(execute(parse("PROJECT name FILTER rank = abc"), df)) == []


def test_string_column_integer_like_literal(df):
    # Against a string column the literal stays a string.
    assert bag(execute(parse('PROJECT rank FILTER name = "a"'), df)) == [(1,)]


# ---------------------------------------------------------------------------
# Differential property test: random queries vs an independent Python model
# of the declared semantics (SURVEY §7.1) — filter-before-project, literals
# typed by the COLUMN's type with match-nothing for unrepresentable forms,
# results compared as bags.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_MODEL_ROWS = [
    ("a", 1, 10),
    ("b", 2, 20),
    ("c", 2, 20),
    ("d", 3, 30),
    ("e", 5, 50),
    ("f", 1, 10),
    ("1", 4, 40),   # digit-like string value
    ("", 0, 0),     # empty string + column minimum
]
_MODEL_COLS = {"name": str, "rank": int, "score": int}

_LITERALS = st.sampled_from(
    # present values, absent values, and forms Python parses but the
    # literal grammar must reject
    ["a", "e", "zz", "1", "2", "0", "-1", "99", "1_2", "+5", "nan", '"2"', '"a"']
)


def _model_literal(text: str, col_type):
    import re

    if text.startswith('"') and text.endswith('"') and len(text) >= 2:
        text = text[1:-1]  # parser strips quotes before typing
    if col_type is int:
        return int(text) if re.fullmatch(r"-?\d+", text) else None
    return text


def _model_execute(project, filt):
    rows = _MODEL_ROWS
    if filt is not None:
        col, op, raw = filt
        idx = list(_MODEL_COLS).index(col)
        lit = _model_literal(raw, _MODEL_COLS[col])
        if lit is None:
            rows = []
        elif op == "=":
            rows = [r for r in rows if r[idx] == lit]
        else:
            rows = [r for r in rows if r[idx] > lit]
    out_idx = [list(_MODEL_COLS).index(c) for c in project]
    return sorted(tuple(r[i] for i in out_idx) for r in rows)


@pytest.fixture(scope="module")
def prop_df(spark):
    return spark.createDataFrame(_MODEL_ROWS, list(_MODEL_COLS))


@given(
    project=st.lists(st.sampled_from(list(_MODEL_COLS)), min_size=1, max_size=4),
    filt=st.one_of(
        st.none(),
        st.tuples(
            st.sampled_from(list(_MODEL_COLS)),
            st.sampled_from(["=", ">"]),
            _LITERALS,
        ),
    ),
)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_executor_matches_reference_model(prop_df, project, filt):
    query = "PROJECT " + ", ".join(project)
    if filt is not None:
        query += f" FILTER {filt[0]} {filt[1]} {filt[2]}"
    got = bag(execute(parse(query), prop_df))
    assert got == _model_execute(project, filt), query
