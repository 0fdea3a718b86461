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
4. prints the cert-age table (name → newest round with a green verdict)
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


def main() -> int:
    import __spark_entry__ as entry

    queries = entry.queries()
    names = list(queries)
    front = names[:WINDOW]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as fh:
            for name, verdict in json.load(fh).items():
                ok = verdict.get("hash_match") or (
                    verdict.get("rows_match") and verdict.get("err") is None
                )
                if ok:
                    newest_green[name] = max(newest_green.get(name, 0), rnd)

    failures = []
    from simple_query_engine_spark.operators import _ROTATION_FRONT, _ROTATION_QUEUE

    if len(_ROTATION_FRONT) != WINDOW:
        failures.append(
            f"_ROTATION_FRONT has {len(_ROTATION_FRONT)} names, window is {WINDOW}"
        )
    overlap = set(_ROTATION_FRONT) & set(_ROTATION_QUEUE)
    if overlap:
        failures.append(f"names in BOTH front and queue: {sorted(overlap)}")
    never = [
        n
        for n in names
        if n not in newest_green and n not in front and n not in _ROTATION_QUEUE
    ]
    if never:
        failures.append(
            f"{len(never)} names hold NO green verdict and are NOT in the "
            f"current front or queue: {never}"
        )
    if _ROTATION_QUEUE:
        print(f"  queued for next round's front: {len(_ROTATION_QUEUE)} names")

    by_age: dict[int, list[str]] = {}
    for n in names:
        by_age.setdefault(newest_green.get(n, 0), []).append(n)
    print(f"catalog: {len(names)} names; front: {len(front)}")
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
