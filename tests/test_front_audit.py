"""Unit tests for the rotation-ledger auditor (tools/front_audit.py).

VERDICT r12 item 2: the staleness policy (no cert older than MAX_CERT_AGE
rounds unless scheduled for re-cert) and the queue bound (queue must fit
in one driver window) must be mechanical, not prose.  These tests exercise
the pure ``audit()`` core on synthetic ledgers — no SparkSession needed —
and pin that the REAL repo ledger passes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from front_audit import MAX_CERT_AGE, WINDOW, audit, load_verdicts  # noqa: E402


def _ledger(n_extra: int = 10):
    """A minimal green ledger: WINDOW front names + n_extra certified names."""
    front = [f"f{i:03d}" for i in range(WINDOW)]
    rest = [f"x{i:03d}" for i in range(n_extra)]
    names = front + rest
    newest_green = {n: 10 for n in rest}
    return names, front, newest_green


def test_green_ledger_passes():
    names, front, newest_green = _ledger()
    assert audit(names, front, [], newest_green, latest_round=12) == []


def test_stale_cert_fails():
    names, front, newest_green = _ledger()
    # one name's newest cert slips past the age bar and is not scheduled
    newest_green["x000"] = 12 - MAX_CERT_AGE - 1
    failures = audit(names, front, [], newest_green, latest_round=12)
    assert len(failures) == 1 and "x000" in failures[0] and "older than" in failures[0]


def test_stale_cert_exempt_when_scheduled():
    names, front, newest_green = _ledger()
    newest_green["x000"] = 12 - MAX_CERT_AGE - 1
    # scheduled via the queue → exempt
    assert audit(names, front, ["x000"], newest_green, latest_round=12) == []
    # scheduled via the front → exempt (swap it into the front)
    front2 = ["x000"] + front[:-1]
    names2 = front2 + [n for n in names if n not in front2]
    newest_green2 = dict(newest_green)
    newest_green2[front[-1]] = 12  # the displaced name needs a green cert
    assert audit(names2, front2, [], newest_green2, latest_round=12) == []


def test_cert_exactly_at_age_bar_passes():
    names, front, newest_green = _ledger()
    newest_green["x000"] = 12 - MAX_CERT_AGE  # == bar, not past it
    assert audit(names, front, [], newest_green, latest_round=12) == []


def test_never_certified_outside_ledger_fails():
    names, front, newest_green = _ledger()
    del newest_green["x001"]
    failures = audit(names, front, [], newest_green, latest_round=12)
    assert len(failures) == 1 and "x001" in failures[0] and "NO green verdict" in failures[0]


def test_oversized_queue_fails():
    names, front, newest_green = _ledger()
    queue = [f"q{i:03d}" for i in range(WINDOW + 1)]
    names = names + queue
    failures = audit(names, front, queue, newest_green, latest_round=12)
    assert any("more than one driver window" in f for f in failures)


def test_short_front_fails():
    names, front, newest_green = _ledger()
    failures = audit(names, front[:-1], [], newest_green, latest_round=12)
    assert any("window is" in f for f in failures)


def test_front_queue_overlap_fails():
    names, front, newest_green = _ledger()
    failures = audit(names, front, [front[0]], newest_green, latest_round=12)
    assert any("BOTH front and queue" in f for f in failures)


def test_ledger_name_not_in_catalog_fails():
    names, front, newest_green = _ledger()
    failures = audit(names, front, ["ghost_entry"], newest_green, latest_round=12)
    assert any("not in catalog" in f for f in failures)


def test_real_repo_ledger_is_green():
    import __spark_entry__ as entry
    from simple_query_engine_spark.operators import _ROTATION_FRONT, _ROTATION_QUEUE

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest_green, latest_round = load_verdicts(repo)
    names = list(entry.queries())
    assert audit(names, _ROTATION_FRONT, _ROTATION_QUEUE, newest_green, latest_round) == []
