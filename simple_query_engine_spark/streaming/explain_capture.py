"""Capture streaming micro-batch physical plans for the plan audit.

Batch queries return a DataFrame whose plan ``tools/plan_audit.py`` can
``explain`` directly; the streaming entries instead RUN their query
(``availableNow`` → ``awaitTermination``) and return only the sink's
contents, so the micro-batch plan — the thing whose broadcast/stateless/
single-stateful-operator shape the docstrings claim — was never
mechanically checkable (VERDICT r12 item 5).

Spark keeps a terminated query's ``lastExecution``, so
``explainInternal`` still returns the LAST micro-batch's physical plan
after ``awaitTermination`` (verified: an ``availableNow`` memory-sink
query yields its full plan post-termination).  Every runner calls
:func:`record_explain` right after ``awaitTermination``; the registry
maps a stable label to the captured plan text, and ``plan_audit`` reads
it back after invoking each ``stream_*`` catalog entry.

The capture is best-effort by design: a plan that cannot be captured
(no batch ever ran, gateway already torn down) must never fail the
QUERY — correctness gates don't depend on the audit trail.
"""

from __future__ import annotations

# label -> the last captured micro-batch physical plan (text).  One entry
# may record several labels (e.g. a restart-resume entry runs two queries).
LAST_EXPLAINS: dict[str, str] = {}


def record_explain(query, label: str) -> None:
    """Store ``query``'s last micro-batch physical plan under ``label``."""
    try:
        LAST_EXPLAINS[label] = query._jsq.explainInternal(False)
    except Exception:
        pass  # audit trail only — never fail the query over it


def reset() -> None:
    LAST_EXPLAINS.clear()
