"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>,
     "suite2_version": ..., "suite2_value": ..., "suite2_queries": {...},
     "suite3_version": ..., "suite3_value": ..., "suite3_queries": {...}}

"value"/"queries" are the FROZEN r01 headline suite (cross-round
continuity); "suite2_*" is the versioned heavy-operator suite added in
r07; "suite3_*" is the fixed-round iterative group split out in r12
(same three-pass warm protocol, same calibration applies to all three).

Each query executes fully via the `noop` sink (forces the whole plan —
df.count() would let Catalyst prune projections and under-report).  A
warm-up run of the flagship query is excluded so JVM/codegen startup isn't
billed to the first query.

Set SPARK_GRAFT_BENCH_AMPLIFY=k (k > 1) to bench against a k×-amplified
copy of the fact tables (key-shifted replicas; see
tools/amplify_testdata.py) — lifts per-query cost above the local job-
scheduling floor so deltas measure operator work.  The JSON then carries
an extra "amplify" field; "sf" stays the base scale factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # name_in_queries()  (one per operator family)
    "parity_project_filter_combo",
    "agg_pricing_summary",
    "agg_count_distinct",
    "join_broadcast_dim",
    "join_large_revenue",
    "window_topn_per_group",
    "join_asof",
    "sort_topk",
    "date_funcs",
    "json_funcs",
    "window_tumbling_counts",
    "window_session_counts",
    "text_fingerprint",
    "text_word_freq",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "tpch_q3_shipping_priority",
    "pipeline_corpus_curation",
]

# Second, VERSIONED suite (VERDICT r06 item 3): the heavy operators added
# after the headline suite froze at r01 get round-over-round perf tracking
# too.  The headline list above stays frozen for cross-round continuity;
# this list may grow — bump SUITE2_VERSION whenever it changes so a
# round-over-round comparison knows when the totals became incomparable.
# r11a = r09a +4: the round-10/11 heavies (k-means train, trained-IVF
# top-k, BPE merge-rule training, CDC incremental curation)
# r12a: the fixed-round graph iteratives moved OUT to SUITE3_ITERATIVE
# (VERDICT r11 item 6 — their wall time is rounds × local scheduler
# floor, which was masking regressions in the other members).
# r13a = r12a +1: dedup_cluster_keeper_quality (VERDICT r12 item 4 —
# the r12 additions need suite rows so regressions in them are visible).
# r14a = r13a +1: multimodal_ppm_decode (the r14 addition — real PPM
# encode + decode through two mapInPandas stages; the suite's only
# Python-boundary-heavy member, so Arrow-path regressions show here).
# r15a = r14a +1: sim_recall_floor_planted (the r15 addition — derived
# planted corpus + adaptive-K training + IVF search + brute-force
# reconciliation).  NOTE r15 member-semantics change, list unchanged:
# sim_semdedup and sim_knn_density now train the adaptive K = max(floor,
# ⌊√N⌋) quantizer (at sf0.1 semdedup's floor binds → comparable;
# knn_density trains 44 cells vs 8 → its row is NOT comparable r14→r15).
# r16a = r15a +1: stream_ivf_ingest (the r16 addition — staged 4-batch
# stream replay, per-batch managed txn-append of centroid assignments,
# post-drain nprobe search; the suite's only streaming+managed member).
# r17: suite2 membership UNCHANGED (version stays r16a — totals stay
# comparable to the r16 rows).  The r17 addition
# stream_components_incremental goes to SUITE3_ITERATIVE below with its
# batch twin graph_components_incremental: its wall is pointer-doubling
# rounds × micro-batch/commit floor (measured ~30 s warm at sf0.1,
# data-invariant), exactly the scheduler-floor signature suite3
# quarantines.  NOT in the corpus-amplified gate: its planted ids are
# doc_id + PLANT_DOC_OFFSET and the collision guard correctly rejects
# amplified ids >= the offset — same exclusion as
# dedup_incremental_minhash / graph_components_incremental.
SUITE2_VERSION = "r16a"
SUITE2 = [
    "dedup_substring_spans",
    "sim_semdedup",
    "text_quality_classifier",
    "pipeline_dsir_weights",
    "text_bm25_search",
    "sim_hybrid_retrieval",
    "sim_kmeans_train",
    "sim_ivf_trained_topk",
    "text_bpe_train",
    "pipeline_incremental_curation",
    "sim_pq_rerank",
    "dedup_keep_latest",
    "dml_zorder_skipping",
    "text_ngram_novelty",
    "sim_sq_rerank",
    "dedup_incremental_minhash",
    "dedup_containment_planted",
    "pipeline_pack_sequences",
    "events_quality_drift",
    "events_funnel_windowed",
    "text_unigram_surprisal",
    "text_repetition",
    "text_decontamination_bloom",
    "sample_topk",
    "dedup_lsh_quality",
    "sketch_countmin_words",
    "pipeline_token_quota",
    "stats_corpus_report",
    "text_gopher_quality",
    "sim_knn_density",
    "sim_multiprobe_lsh",
    "dedup_cluster_keeper_quality",
    "multimodal_ppm_decode",
    "sim_recall_floor_planted",
    "stream_ivf_ingest",
]

# Third suite: the fixed-round ITERATIVE graph/cluster operators.  Their
# sf0.1 wall time is dominated by rounds × the local job-scheduling floor
# (not a data term), so they get their own timing group — a regression in
# SUITE2's data-bound members stays visible, and a scheduler-floor wobble
# here can't masquerade as an operator regression there.
# r13a = r12a + sim_ivf_rebuild (VERDICT r12 item 4): two fixed-iteration
# k-means trainings + two searches — scheduler-floor-bound like its
# siblings, and the heaviest single catalog entry, so a regression in it
# must be visible somewhere.
SUITE3_VERSION = "r13a"
SUITE3_ITERATIVE = [
    "sim_semantic_clusters",
    "graph_pagerank_neardup",
    "graph_triangles_neardup",
    "graph_label_spread",
    "graph_components_incremental",
    "sim_ivf_rebuild",
    # r17: the streaming twin of graph_components_incremental — 3
    # micro-batches × (banded joins + reduced propagation + MERGE
    # commit); wall is round/commit floor, not a data term.
    "stream_components_incremental",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from simple_query_engine_spark.session import get_spark

    import __spark_entry__ as entrymod

    # Local-mode Spark defaults to a 1g driver heap — fine for the base
    # SF but an OOM at 32×-amplified cached fact tables.  The bench rig
    # has 128 GiB; claim a realistic slice (bench session only — tests
    # and the driver harness keep their own sizing).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(
        app_name="sqe-spark-bench",
        extra_conf={"spark.driver.memory": driver_mem},
    )
    queries = entrymod.queries()

    amplify = int(os.environ.get("SPARK_GRAFT_BENCH_AMPLIFY", "0") or 0)
    if amplify > 1:
        from tools.amplify_testdata import ensure_amplified

        sf_dir = ensure_amplified(spark, sf_dir, amplify)

    def run(name: str) -> float:
        start = time.time()
        df = queries[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.time() - start

    # Load-once/query-many: cache the input tables before timing — the
    # engine's documented usage pattern (REPL caches after load, mirroring
    # the reference's eager load+index amortized across queries).
    from simple_query_engine_spark.sources.catalog import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.cache().count()

    # Warm-up: JVM + codegen, not billed.
    run("agg_pricing_summary")

    # Three passes per query: pass 1 pays one-time whole-stage-codegen
    # compilation for each plan shape (~0.5-1 s/query on this JVM); passes
    # 2-3 are the steady-state latency a resident engine delivers.  Report
    # the min (standard warm-run practice); keep the cold total for
    # transparency.  The shared host has measurably fast and slow phases
    # (same commit, same data: 3× wall-clock swings hours apart), so the
    # JSON also carries a calibration probe — the warm time of a fixed
    # JVM-side sum over 500M longs — letting round-over-round comparisons
    # normalize out host speed.
    def three_pass(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        cold = {name: round(run(name), 3) for name in names}
        warm = {name: round(min(cold[name], run(name)), 3) for name in names}
        warm = {name: round(min(warm[name], run(name)), 3) for name in names}
        return cold, warm

    cold, timings = three_pass(HEADLINE)
    cold2, timings2 = three_pass(SUITE2)
    cold3, timings3 = three_pass(SUITE3_ITERATIVE)

    def _calibrate() -> float:
        probe = lambda: spark.range(500_000_000, numPartitions=32).selectExpr(
            "sum(id * 2)"
        ).collect()
        probe()  # codegen warm-up, not billed
        start = time.time()
        probe()
        return round(time.time() - start, 3)

    total = round(sum(timings.values()), 3)
    calibration = _calibrate()
    # Host-phase stamp (VERDICT r08 item 8): the shared host has measured
    # fast (calibration 0.08-0.15 s) and slow (0.85 s) phases — identical
    # code swings ~3× in wall-clock with it.  Stamp the phase into the
    # JSON so a slow-phase number can never be read as a code regression;
    # round-over-round comparisons should only pair same-phase files (see
    # BASELINE.md "host-speed variance").
    FAST_CALIBRATION_MAX = 0.25
    host_phase = "fast" if calibration <= FAST_CALIBRATION_MAX else "slow"
    if host_phase == "slow":
        print(
            f"WARNING: calibration probe {calibration}s > "
            f"{FAST_CALIBRATION_MAX}s - host is in a slow phase; timings are "
            "not comparable to fast-phase rounds. Re-run for an anchor.",
            file=sys.stderr,
        )
    payload = {
        "metric": "headline_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cold_value": round(sum(cold.values()), 3),
        # Per-query FIRST-invocation times (pass 1 of 3, includes one-time
        # whole-stage-codegen + any in-session materializations), so both
        # the amortized (warm-min) and per-invocation stories are visible
        # per query (VERDICT r17 item 7).  Additions only — the frozen
        # "queries" warm-min contract is untouched.
        "first_invocation_queries": cold,
        "suite2_first_invocation_queries": cold2,
        "suite3_first_invocation_queries": cold3,
        "suite2_version": SUITE2_VERSION,
        "suite2_value": round(sum(timings2.values()), 3),
        "suite2_queries": timings2,
        "suite2_cold_value": round(sum(cold2.values()), 3),
        "suite3_version": SUITE3_VERSION,
        "suite3_value": round(sum(timings3.values()), 3),
        "suite3_queries": timings3,
        "suite3_cold_value": round(sum(cold3.values()), 3),
        "calibration_jvm_sum_sec": calibration,
        "host_phase": host_phase,
        # Effective parallelism, straight from the live context, so the
        # driver can verify the $SPARK_GRAFT_CPUS contract from data
        # instead of inferring it from scaling ratios (VERDICT r17 item 2a
        # — at sf0.1 every query sits at the job-scheduling floor and the
        # 8-vs-32-core ratio proves nothing).
        "cpus": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
    }
    if amplify > 1:
        payload["amplify"] = amplify
    line = json.dumps(payload)
    # The one-line JSON is ~4 KB and the driver's finite tail capture has
    # truncated it before (r16 lost its automated round-over-round
    # comparison to a decapitated line) — ALSO write it to a file next to
    # the repo so the payload can never be erased by a capture window
    # (VERDICT r17 item 2b).
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # stdout line is still the contract; the file is belt-and-braces
    print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
