#!/bin/bash
# Round-14 close sweep: 3-SF full-catalog oracle gate + types scan +
# local[5] determinism + the 32x amplified-correctness gate (VERDICT r13
# item 3 — part of the close checklist from this round on), written to
# RUNLOG_r14.txt.  Run detached (nohup) because the whole sequence
# exceeds interactive timeouts.
cd /root/repo
{
  echo "=== RUNLOG r14 — full catalog sweep at HEAD $(git rev-parse --short HEAD) ($(date -u +%Y-%m-%dT%H:%MZ)) ==="
  # Keep EVERY per-query FAIL line (the runlog is the permanent failure
  # record — a tail cap would silently drop named failures past the cap)
  # plus the one aggregate summary line per leg.
  for sf in sf0.001 sf0.01 sf0.1; do
    echo "--- $sf ---"
    python tools/check_correctness.py /root/testdata/$sf 2>&1 \
      | grep -vE "WARN|INFO|Using|Setting|To adjust|^\[Stage" \
      | grep -E "FAIL|ok, "
  done
  echo "--- types-only scan (sf0.01) ---"
  python tools/check_correctness.py /root/testdata/sf0.01 --types-only 2>&1 | tail -2
  echo "--- local[5] determinism (sf0.01) ---"
  SPARK_GRAFT_CPUS=5 python tools/check_correctness.py /root/testdata/sf0.01 2>&1 \
    | grep -vE "WARN|INFO|Using|Setting|To adjust|^\[Stage" \
    | grep -E "FAIL|ok, "
  echo "--- amplified correctness (sf0.1 x32, fact-bound gate) ---"
  python tools/amplified_correctness.py /root/testdata/sf0.1 32 2>&1 \
    | grep -vE "WARN|INFO|Using|Setting|To adjust|^\[Stage" \
    | grep -E "FAIL|ok |failed at|wrote"
  echo "--- amplified correctness (sf0.1 x8, corpus-bound gate) ---"
  python tools/amplified_correctness.py --corpus /root/testdata/sf0.1 8 2>&1 \
    | grep -vE "WARN|INFO|Using|Setting|To adjust|^\[Stage" \
    | grep -E "FAIL|ok |failed at|wrote"
  echo "=== sweep done ($(date -u +%Y-%m-%dT%H:%MZ)) ==="
} > RUNLOG_r14.txt 2>&1
