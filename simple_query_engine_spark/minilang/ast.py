"""AST for the reference's two-clause query mini-language.

Mirrors the observable shape of the reference's ``Query`` / ``Filter`` /
``FilterType`` (reference ``src/query.rs:4-8`` and ``src/query.rs:87-108``):
a list of projected column names plus an optional single-predicate filter.

One deliberate deviation (SURVEY.md §7.1.1): the reference type-sniffs the
filter literal at *parse* time (``src/query.rs:70-72`` — strip quotes, then
all-digits ⇒ u64 else Text).  We keep the raw literal text (plus whether it
was quoted) in the AST and let the *executor* type it against the target
column's Spark type — column-level typing, not per-cell.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


class FilterType(Enum):
    """The two comparison operators the mini-language supports."""

    GREATER = ">"
    EQUAL = "="


@dataclass(frozen=True)
class Filter:
    """``FILTER column_name op value`` — exactly one predicate, no boolean
    connectives (reference grammar, ``src/query.rs:62-84``)."""

    column_name: str
    filter_type: FilterType
    value: str  # raw literal text, quotes already stripped
    # Informational: True when the literal was written as "...".  The
    # executor deliberately ignores it (literals are typed by the target
    # column, SURVEY.md §7.1.1); preserved so tooling/tests can observe
    # what the user wrote, mirroring the reference's quote-trim step.
    quoted: bool = False


@dataclass(frozen=True)
class Query:
    """``PROJECT col, ... [FILTER col op value]``."""

    column_names: tuple[str, ...]
    filter: Filter | None = None
