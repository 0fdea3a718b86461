"""Property tests for literal typing against column types (SURVEY.md
§7.1.1 — column-level typing replaces the reference's per-cell sniffing)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from simple_query_engine_spark.executor import _type_literal


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200)
def test_integers_round_trip_against_long(value):
    assert _type_literal(str(value), T.LongType()) == value


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
@settings(max_examples=200)
def test_floats_round_trip_against_double(value):
    assert _type_literal(repr(value), T.DoubleType()) == value


@given(st.text(max_size=30))
@settings(max_examples=200)
def test_any_text_is_valid_against_string(value):
    assert _type_literal(value, T.StringType()) == value


@given(st.text(max_size=20).filter(lambda s: not _is_intlike(s)))
@settings(max_examples=200)
def test_non_numeric_text_is_none_against_long(value):
    assert _type_literal(value, T.LongType()) is None


def _is_intlike(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


@given(st.sampled_from(["true", "True", "FALSE", "false", "TRUE"]))
def test_boolean_literals(value):
    assert _type_literal(value, T.BooleanType()) == (value.lower() == "true")


@given(st.text(max_size=10).filter(lambda s: s.lower() not in ("true", "false")))
@settings(max_examples=100)
def test_non_boolean_text_is_none_against_boolean(value):
    assert _type_literal(value, T.BooleanType()) is None


def test_python_permissive_numeric_forms_are_rejected():
    """Forms Python's int()/float() accept but the literal grammar does not
    must fall through to match-nothing (None), not silently re-parse:
    '1_2' is NOT 12, '+5' is NOT 5, 'nan'/'inf' are not column values."""
    assert _type_literal("1_2", T.LongType()) is None
    assert _type_literal("+5", T.LongType()) is None
    assert _type_literal("١٢", T.LongType()) is None  # Unicode digits
    assert _type_literal("١٢.٥", T.DoubleType()) is None
    assert _type_literal(" 5", T.LongType()) is None
    assert _type_literal("5 ", T.LongType()) is None
    for bad in ("nan", "NaN", "inf", "Infinity", "-inf", "+5.0", "1_000.5", " 1.5"):
        assert _type_literal(bad, T.DoubleType()) is None, bad
        assert _type_literal(bad, T.DecimalType(10, 2)) is None, bad
    # ...while legitimate literal shapes still parse.
    assert _type_literal("-5", T.LongType()) == -5
    assert _type_literal("1e3", T.DoubleType()) == 1000.0
    assert _type_literal(".5", T.DoubleType()) == 0.5
    assert _type_literal("-2.25", T.DoubleType()) == -2.25


def test_dates_and_timestamps():
    import datetime as dt

    assert _type_literal("2024-01-15", T.DateType()) == dt.date(2024, 1, 15)
    assert _type_literal("2024-01-15 10:30:00", T.TimestampType()) == dt.datetime(
        2024, 1, 15, 10, 30
    )
    assert _type_literal("not-a-date", T.DateType()) is None


def test_plans_layer_reexports():
    from simple_query_engine_spark import plans

    assert plans.parse("PROJECT a").column_names == ("a",)
    assert plans.Query(("a",)).filter is None
