"""Audit the driver-certification rotation ledger.

Checks the invariants the hand-maintained ``_ROTATION_FRONT`` must hold:

1. the front is EXACTLY the driver's window size (50) — a short front
   wastes certification slots, a long one silently pushes names out;
2. every front name exists in the catalog (the registration typo guard,
   re-checked here without building a SparkSession);
3. every catalog name holds a green verdict in SOME CORRECTNESS_r*.json,
   OR sits in the current front (pending this round's verdict), OR sits
   in ``_ROTATION_QUEUE`` (added this round, explicitly queued to lead
   the NEXT round's front) — i.e. no name can fall through the rotation
   entirely;
4. STALENESS (VERDICT r12 item 2): no catalog name's newest green cert
   may be older than ``MAX_CERT_AGE`` rounds behind the latest recorded
   CORRECTNESS round, unless the name sits in the current front or the
   queue (i.e. is already scheduled for re-certification).  This turns
   the "retire old certs" discipline from verdict prose into a gate;
5. QUEUE BOUND (VERDICT r12 item 2): ``_ROTATION_QUEUE`` must fit in one
   driver window — a longer queue means new/changed entries would wait
   more than one round for their first verdict;
6. prints the cert-age table (name → newest round with a green verdict)
   so the next round's age queue can be read off directly.

Usage: python tools/front_audit.py   (exit 1 on any violation)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
# A cert is stale when latest_round - newest_green > MAX_CERT_AGE.  At 265
# catalog names and a 50-slot window the natural rotation period is ~5.3
# rounds, so 6 gives one round of slack without letting any cert rot.
MAX_CERT_AGE = 6


def load_verdicts(repo: str) -> tuple[dict[str, int], int]:
    """Newest green round per name + the latest recorded round."""
    newest_green: dict[str, int] = {}
    latest_round = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        latest_round = max(latest_round, rnd)
        with open(path) as fh:
            for name, verdict in json.load(fh).items():
                ok = verdict.get("hash_match") or (
                    verdict.get("rows_match") and verdict.get("err") is None
                )
                if ok:
                    newest_green[name] = max(newest_green.get(name, 0), rnd)
    return newest_green, latest_round


def audit(
    names: list[str],
    front: list[str],
    queue: list[str],
    newest_green: dict[str, int],
    latest_round: int,
) -> list[str]:
    """Pure invariant check — returns the list of violations (empty = green).

    ``names`` is the catalog in registration order, ``front``/``queue`` the
    ledger lists, ``newest_green`` name → newest green round, and
    ``latest_round`` the newest CORRECTNESS round on disk.
    """
    failures: list[str] = []
    if len(front) != WINDOW:
        failures.append(f"_ROTATION_FRONT has {len(front)} names, window is {WINDOW}")
    overlap = set(front) & set(queue)
    if overlap:
        failures.append(f"names in BOTH front and queue: {sorted(overlap)}")
    missing = [n for n in front + queue if n not in names]
    if missing:
        failures.append(f"ledger names not in catalog: {missing}")
    never = [
        n for n in names if n not in newest_green and n not in front and n not in queue
    ]
    if never:
        failures.append(
            f"{len(never)} names hold NO green verdict and are NOT in the "
            f"current front or queue: {never}"
        )
    stale = [
        n
        for n in names
        if n in newest_green
        and latest_round - newest_green[n] > MAX_CERT_AGE
        and n not in front
        and n not in queue
    ]
    if stale:
        failures.append(
            f"{len(stale)} names hold certs older than {MAX_CERT_AGE} rounds "
            f"(latest round r{latest_round:02d}) and are NOT scheduled for "
            f"re-certification: {stale}"
        )
    if len(queue) > WINDOW:
        failures.append(
            f"_ROTATION_QUEUE holds {len(queue)} names — more than one driver "
            f"window ({WINDOW}); entries would wait >1 round for a verdict"
        )
    return failures


def main() -> int:
    import __spark_entry__ as entry
    from simple_query_engine_spark.operators import _ROTATION_FRONT, _ROTATION_QUEUE

    queries = entry.queries()
    names = list(queries)
    front = names[:WINDOW]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest_green, latest_round = load_verdicts(repo)

    failures = audit(names, _ROTATION_FRONT, _ROTATION_QUEUE, newest_green, latest_round)

    if _ROTATION_QUEUE:
        print(f"  queued for next round's front: {len(_ROTATION_QUEUE)} names")

    by_age: dict[int, list[str]] = {}
    for n in names:
        by_age.setdefault(newest_green.get(n, 0), []).append(n)
    print(f"catalog: {len(names)} names; front: {len(front)}; latest round: r{latest_round:02d}")
    for rnd in sorted(by_age):
        label = f"r{rnd:02d}" if rnd else "PENDING (this round's front)"
        print(f"  newest green {label}: {len(by_age[rnd])} names")
    oldest = [n for rnd in sorted(by_age) if rnd for n in by_age[rnd]][:15]
    print("  age-queue head (oldest certs first):", ", ".join(oldest))

    if failures:
        print("\nFAIL")
        for f in failures:
            print(" -", f)
        return 1
    print("\nledger invariants hold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
