"""Measure IVF recall@k under REALISTIC corpus growth.

The latency probe (tools/ann_scale_probe.py) amplifies by identical
copies — fine for wall time, wrong for recall (clones tie with their
originals).  This probe uses the r14 corpus amplifier's ROTATED replicas
(distinct vectors, within-replica geometry preserved,
tools/amplify_testdata.py corpus mode) and re-runs the certified
recall audit (`sim_recall_audit_trained` — trained-IVF search vs the
exact brute-force top-k, fixed query set = replica 0) at 1x and kx.

What it quantifies: the recall cost of a FIXED quantizer (KMEANS_K
cells, KMEANS_NPROBE probes) as N grows — the decision input for the
rebuild-on-drift policy, complementing the corpus gate's latency
finding (sim_knn_density O(N^2/K) at fixed K).

The certified entries fix the query set at NUM_QUERY_VECTORS (= the
driver-checked result shape); a 5-query recall estimate is thin for a
MEASUREMENT, so the probe widens the module constant in-process to
PROBE_QUERIES before running — search/audit code reads the constant at
call time, certified paths and oracles are untouched.

Usage: python tools/ann_recall_probe.py [k] [sf_dir]
Prints one JSON line; the round notes append it to ANN_SCALE.json
under "recall_under_growth".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = 50  # widened query set (see module docstring)


def _audit(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from simple_query_engine_spark.functions.caching import evict_all
    from simple_query_engine_spark.operators.similarity import (
        q_sim_recall_audit_trained,
    )
    from simple_query_engine_spark.sources.catalog import table

    evict_all()  # fresh quantizer/caches per corpus
    n_vectors = table(spark, sf_dir, "embeddings").count()
    start = time.time()
    rows = q_sim_recall_audit_trained(spark, sf_dir).collect()
    wall = time.time() - start
    n_exact = sum(r["n_exact"] for r in rows)
    n_hits = sum(r["n_hits"] for r in rows)
    return {
        "n_vectors": n_vectors,
        "n_queries": len(rows),
        "n_exact": n_exact,
        "n_hits": n_hits,
        "recall_at_k": round(n_hits / n_exact, 4) if n_exact else None,
        "min_query_recall": min(float(r["recall_at_k"]) for r in rows),
        "audit_wall_sec": round(wall, 2),
    }


def _planted_audit(spark, sf_dir: str) -> dict:
    """Same rollup over the PLANTED clusterable corpus
    (sim_recall_floor_planted, r15): recall where the fixture has real
    cluster structure — the number that measures the index, not the
    near-orthogonal corpus's nprobe/K sampling floor."""
    from simple_query_engine_spark.functions.caching import evict_all
    from simple_query_engine_spark.operators.similarity import (
        q_sim_recall_floor_planted,
    )
    from simple_query_engine_spark.sources.catalog import table

    evict_all()
    n_vectors = table(spark, sf_dir, "embeddings").count()
    start = time.time()
    rows = q_sim_recall_floor_planted(spark, sf_dir).collect()
    wall = time.time() - start
    n_exact = sum(r["n_exact"] for r in rows)
    n_hits = sum(r["n_hits"] for r in rows)
    return {
        "n_vectors": n_vectors,
        "n_queries": len(rows),
        "n_exact": n_exact,
        "n_hits": n_hits,
        "recall_at_k": round(n_hits / n_exact, 4) if n_exact else None,
        "min_query_recall": min(float(r["recall_at_k"]) for r in rows),
        "audit_wall_sec": round(wall, 2),
    }


def _nprobe_sweep(spark, sf_dir: str, values: list[int]) -> list[dict]:
    """Recall/wall curve over nprobe (VERDICT r15 item 4): the module
    constant is widened in-process per point — ``_probe_cells`` reads it
    at call time, so the certified paths and oracles are untouched; the
    per-point ``evict_all`` inside ``_audit`` keeps the trained quantizer
    caches from leaking between points."""
    from simple_query_engine_spark.operators import similarity

    out = []
    orig = similarity.KMEANS_NPROBE
    try:
        for nprobe in values:
            similarity.KMEANS_NPROBE = nprobe
            point = _audit(spark, sf_dir)
            point["nprobe"] = nprobe
            out.append(point)
    finally:
        similarity.KMEANS_NPROBE = orig
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sweep = "--nprobe-sweep" in sys.argv

    from simple_query_engine_spark.operators import similarity
    from simple_query_engine_spark.session import get_spark
    from tools.amplify_testdata import ensure_amplified

    similarity.NUM_QUERY_VECTORS = PROBE_QUERIES  # probe-only widening
    spark = get_spark(app_name="ann-recall-probe")
    amp_dir = ensure_amplified(spark, sf_dir, k, corpus=True)

    if sweep:
        values = [1, 2, 3, 4, 6, 8]  # of KMEANS_K = 8 cells
        out = {
            "what": (
                "raw-corpus recall@k vs nprobe (sim_recall_audit_trained, "
                "fixed K=8 quantizer, 50-query probe set) at 1x and "
                f"{k}x rotated-replica growth — the operating-point curve "
                "for the near-orthogonal production analogue"
            ),
            "base": _nprobe_sweep(spark, sf_dir, values),
            f"x{k}": _nprobe_sweep(spark, amp_dir, values),
        }
    else:
        out = {
            "what": (
                "trained-IVF recall@k vs exact brute force (sim_recall_audit_"
                "trained), fixed replica-0 query set, fixed KMEANS_K/NPROBE, "
                "rotated-replica corpus growth (amplify_testdata corpus mode)"
            ),
            "base": _audit(spark, sf_dir),
            f"x{k}": _audit(spark, amp_dir),
            "planted_base": _planted_audit(spark, sf_dir),
            f"planted_x{k}": _planted_audit(spark, amp_dir),
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
