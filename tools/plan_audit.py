"""Generate PLANS.md — a physical-plan audit of the headline queries.

For each bench headline query, captures the properties that matter at
scale: join strategies chosen, filters pushed into the parquet scan,
columns pruned at the scan, number of shuffle exchanges.

Usage: python tools/plan_audit.py [sf_dir]   (writes PLANS.md at repo root)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        df.explain("formatted")
    return buffer.getvalue()


def _tree_depth(line: str) -> int:
    """Indent depth of a formatted-explain tree line (position of the node
    name after the tree-drawing characters)."""
    return len(line) - len(line.lstrip(" :+-*"))


def collapse_cached(plan: str) -> str:
    """Drop the lineage UNDER every InMemoryTableScan — the plan that runs
    when the cache is populated reads the cached relation, so counting its
    construction subtree misrepresents the runtime shape (r09 verdict:
    graph_triangles_neardup showed 60 BHJ / 194 exchanges from expanded
    cached lineage).  The scan node itself is kept; detail blocks of
    dropped nodes are dropped with it.

    A MATERIALIZED cache built under AQE additionally appends nested
    ``== Final Plan ==`` / ``== Initial Plan ==`` dumps of its
    construction — and those blocks print at a SHALLOWER indent than the
    InMemoryTableScan they belong to, dodging the subtree drop (found by
    the streaming audit: vector ingest's micro-batch read 34 joins / 124
    exchanges of pure centroid-training lineage).  Subtrees rooted at
    those markers are construction history, never the executing plan
    (the audit explains batch queries before execution, and streaming
    micro-batches run with AQE off), so they drop by the same rule."""
    lines = plan.splitlines()
    # The tree section ends at the first line of the "(n) Node" details.
    tree_end = next(
        (i for i, ln in enumerate(lines) if re.match(r"^\(\d+\) ", ln)), len(lines)
    )
    kept_tree: list[str] = []
    skip_deeper_than: int | None = None  # strict: subtree under a kept scan node
    skip_at_or_deeper: int | None = None  # inclusive: marker dumps print their
    # content at the SAME depth as the marker line (the "+- " prefix eats the
    # visual offset), so the marker mode must swallow equal-depth lines too
    for ln in lines[:tree_end]:
        if not ln.strip():
            kept_tree.append(ln)
            continue
        d = _tree_depth(ln)
        if skip_at_or_deeper is not None:
            if d >= skip_at_or_deeper:
                continue
            skip_at_or_deeper = None
        if skip_deeper_than is not None:
            if d > skip_deeper_than:
                continue
            skip_deeper_than = None
        node = ln.lstrip(" :+-*")
        if node.startswith(("== Final Plan ==", "== Initial Plan ==")):
            skip_at_or_deeper = d
            continue  # the marker itself is dropped with its dump
        kept_tree.append(ln)
        if node.startswith("InMemoryTableScan"):
            skip_deeper_than = d
    kept_ids = {int(m) for ln in kept_tree for m in re.findall(r"\((\d+)\)", ln)}
    kept_details: list[str] = []
    keeping = True
    for ln in lines[tree_end:]:
        m = re.match(r"^\((\d+)\) ", ln)
        if m:
            keeping = int(m.group(1)) in kept_ids
        if keeping:
            kept_details.append(ln)
    return "\n".join(kept_tree) + "\n" + "\n".join(kept_details)


def table_row(info: dict) -> str:
    """One PLANS.md markdown row from an ``audit()`` dict — shared by the
    main query loop and the iterative-bodies loop so a new audit column
    can't desynchronize the two tables."""
    joins = info["joins"]
    join_str = (
        f"{joins['broadcast_hash']}/{joins['sort_merge']}/"
        f"{joins['shuffled_hash']}/{joins['broadcast_nested_loop']}"
    )
    cols = ", ".join(info["scan_columns"][:6]) + (
        "…" if len(info["scan_columns"]) > 6 else ""
    )
    return (
        f"| {info['query']} | {join_str} | {info['exchanges']} | "
        f"{info['cached_scans']} | "
        f"{info['pushed_filters']} | `{cols}` | "
        f"{'✓' if info['take_ordered'] else ''} | {'✓' if info['partial_agg'] else ''} |"
    )


def streaming_audit(label: str, plan: str) -> dict:
    """Metrics for ONE captured micro-batch physical plan (simple-mode
    ``explainInternal`` text, not formatted explain).  What matters for a
    stream at scale: how many STATEFUL operators the batch carries (each
    is a state store + a REQUIRED_BY_STATEFUL_OPERATOR shuffle), whether
    enrichment joins broadcast, and whether scans still push/prune.

    Cached-lineage collapse applies here exactly as in the batch audit:
    a stream joining a session-cached static side (e.g. vector ingest's
    trained centroids) prints the cache's CONSTRUCTION lineage under
    every InMemoryTableScan, which would misread as per-batch work —
    at runtime the batch serves those scans from memory.  The tree-walk
    collapse works on simple-mode text too (same tree-drawing chars; the
    formatted-details pass just finds nothing).

    STATEFUL counts come from the RAW text: a cached STATIC relation's
    dump can never contain a streaming stateful operator, so raw counts
    are exact by construction — and comparing them against the collapsed
    text detects over-collapse (the indent-heuristic dump skip swallowing
    a legitimate sibling subtree), which flags the row instead of
    silently under-reporting."""

    def count_stateful(text: str) -> dict:
        return {
            # agg state (StateStoreSave; Restore is its read half)
            "agg": len(re.findall(r"\bStateStoreSave\b", text)),
            "session_agg": len(re.findall(r"\bSessionWindowStateStoreSave\b", text)),
            # both the JVM and the Pandas (applyInPandasWithState) variants
            "flatmap_state": len(
                re.findall(r"\bFlatMapGroups(?:InPandas)?WithState", text)
            ),
            "dedup": len(re.findall(r"\bStreamingDeduplicate", text)),
            "stream_join": len(re.findall(r"\bStreamingSymmetricHashJoin\b", text)),
        }

    stateful = count_stateful(plan)  # raw: exact for stateful ops
    plan = collapse_cached(plan)
    pushed = [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p.strip()]
    return {
        "label": label,
        # over-collapse detector: stateful ops never live in cached dumps,
        # so any difference means the collapse dropped real tree
        "collapse_suspect": count_stateful(plan) != stateful,
        "stateful_total": sum(stateful.values()),
        "stateful": {k: v for k, v in stateful.items() if v},
        # both broadcast-build shapes: hash (equi) and nested-loop (the
        # packed-array cross joins — build side is a broadcast 1-row pack)
        "broadcast_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan))
        + len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "other_joins": len(re.findall(r"\bSortMergeJoin\b", plan))
        + len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "cached_scans": plan.count("InMemoryTableScan"),
        "watermark": "EventTimeWatermark" in plan,
        "pushed_filters": len(pushed),
        "arrow_python": len(
            re.findall(
                r"\bArrowEvalPython|\bMapInPandas|\bPythonMapInArrow"
                r"|\bFlatMapGroupsInPandas",
                plan,
            )
        ),
    }


def streaming_row(info: dict) -> str:
    stateful_str = (
        ", ".join(f"{k}×{v}" if v > 1 else k for k, v in info["stateful"].items())
        or "—"
    )
    label = info["label"] + (" ⚠ over-collapse" if info["collapse_suspect"] else "")
    return (
        f"| {label} | {info['stateful_total']} ({stateful_str}) | "
        f"{info['broadcast_joins']}/{info['other_joins']} | {info['exchanges']} | "
        f"{info['cached_scans'] or ''} | "
        f"{'✓' if info['watermark'] else ''} | {info['pushed_filters']} | "
        f"{info['arrow_python'] or ''} |"
    )


def audit(name: str, plan: str) -> dict:
    plan = collapse_cached(plan)
    tree = plan.split("\n(", 1)[0]  # node counts come from the TREE alone
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed_nonempty = [p for p in pushed if p.strip()]
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = sorted({col.split(":")[0] for s in schemas for col in s.split(",") if col})
    return {
        "query": name,
        "joins": {
            "broadcast_hash": tree.count("BroadcastHashJoin"),
            "sort_merge": tree.count("SortMergeJoin"),
            "shuffled_hash": tree.count("ShuffledHashJoin"),
            "broadcast_nested_loop": tree.count("BroadcastNestedLoopJoin"),
        },
        "exchanges": len(re.findall(r"\bExchange\b", tree)),
        "cached_scans": tree.count("InMemoryTableScan"),
        "pushed_filters": len(pushed_nonempty),
        "scan_columns": read_cols[:12],
        "take_ordered": "TakeOrderedAndProject" in plan,
        "partial_agg": "partial_" in plan,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from simple_query_engine_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    queries = entrymod.queries()

    lines = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}` (regenerate after",
        "changing any operator).  Shows what Catalyst chose: join strategies,",
        "predicate pushdown into the parquet scans, column pruning, shuffle",
        "count.  Streaming/stateful queries are skipped (their plans are per-",
        "micro-batch).",
        "",
        "| query | joins (BHJ/SMJ/SHJ/BNLJ) | exchanges | cached scans | pushed filters | scan reads only | top-k op | partial agg |",
        "|---|---|---|---|---|---|---|---|",
    ]
    # Headline bench queries plus the round-2 scale exhibits whose plan
    # shape is the point (partition pruning, two-phase sampling, bucketed
    # LSH, salted join, five-way TPC-H join).
    extra = [
        "events_partition_prune",
        "sample_stratified",
        "sim_ann_lsh",
        "sim_neardup_lsh",
        "join_salted_skew",
        "tpch_q9_nation_profit",
        "sim_ivf_topk",
        "events_sessionize_gap",
        "events_retention_cohort",
        "events_user_streaks",
        "dedup_planted_minhash",
        "dedup_containment_planted",
        "sim_neardup_planted",
        "text_dup_ngram_coverage",
        "text_unigram_surprisal",
        "agg_percentiles_exact",
        "dedup_incremental_minhash",
        "join_bucketed_revenue",
        "events_funnel_windowed",
        "events_quality_drift",
        "sample_topk",
        "pipeline_pack_sequences",
        "text_repetition",
        "text_bigram_freq",
        "text_decontamination",
        "text_decontamination_bloom",
        "repl_sql_passthrough",
        "pipeline_domain_mix",
        "pipeline_attrition_report",
        "sketch_countmin_words",
        "pipeline_shuffle_shards",
        "pipeline_token_quota",
        "pipeline_pii_redaction",
        "events_anomaly_mad",
        "dedup_lsh_quality",
        "stats_column_profile",
        "sim_recall_audit",
        "text_bigram_surprisal",
        "pipeline_split_assign",
        "events_top_paths",
        "join_null_safe",
        "events_markov_transitions",
        "stats_corpus_report",
        "events_attribution_last_touch",
        # round-8 additions
        "sim_sq_rerank",
        "graph_triangles_neardup",
        "text_zipf_slope",
        "text_ngram_novelty",
        "stats_expectations",
        "stats_drift_psi",
        "events_rfm_segments",
        "events_trailing_features",
        "events_rolling_wau",
        "pipeline_url_dedup",
        "storage_zorder_prune",
        # round-9 additions (dml_zorder_skipping is covered by the DML
        # note below; stream_ttl_sessions / stream_static_enrich by the
        # streaming skip)
        "sim_pq_rerank",
        "dedup_keep_latest",
        "join_dpp_partitioned",
        "join_fuzzy_blocked",
        "sketch_kmv_overlap",
        "pipeline_quality_prune_curve",
        "multimodal_frame_dedup",
        "events_resample_locf",
        # round-10 additions (pipeline_incremental_curation is DML-backed —
        # covered by the DML note below)
        "text_bpe_train",
        "sim_kmeans_train",
        "sim_ivf_trained_topk",
        # round-11 additions
        "text_bpe_encode",
        "text_bpe_encode_docs",
        "sim_recall_audit_trained",
        "sim_filtered_topk",
        "sim_ivf_append_topk",
        "sim_hard_negatives",
        "text_bpe_fertility",
        # round-11 continued-session additions
        "dedup_substring_spans",
        "sim_semdedup",
        "text_quality_classifier",
        "pipeline_dsir_weights",
        "text_bm25_search",
        "sim_hybrid_retrieval",
        # round-11 second-continuation additions (graph_kcore_neardup and
        # graph_components_incremental are deliberately absent for the same
        # reason as sim_semantic_clusters: constructing their DataFrames runs
        # the materialized propagation/peel rounds and the returned plan is
        # a union of scratch scans)
        "pipeline_mixture_sample",
        "dedup_cdc_chunks",
        # round-11 third-continuation additions
        "text_gopher_quality",
        "sim_knn_density",
        "sim_multiprobe_lsh",
        "sim_range_search",
        "sim_diverse_topk",
        "join_interval_overlap",
        "multimodal_clip_pairs",
        "sim_centroid_balance",
        "stats_source_overlap",
        "agg_weighted_median",
        "events_ema_features",
        "stats_k_anonymity",
        "text_decontamination_fuzzy",
        "events_forecast_holt",
        "events_new_vs_returning",
        "source_csv_dialect",
        "events_wow_growth",
        "agg_histogram_numeric",
        "stats_token_gini",
        "sim_power_iteration",
        "text_boilerplate_templates",
        "sketch_kmv_union",
        "sim_knn_graph",
        "sim_ivf_delete_topk",
        "sim_ivfadc_topk",
        # round-12 additions (dedup_cluster_keeper_quality is absent for
        # the sim_semantic_clusters reason below — its components run
        # eagerly; its ROUND body is covered by the iterative section)
        "sim_ivf_rebuild",
        # round-14 addition: the real-PPM decode entry — the point of its
        # row is that BOTH Python boundaries are Arrow mapInPandas stages
        # over a pruned 2-column scan (no shuffle between them).
        "multimodal_ppm_decode",
        # round-15 addition: planted-recall floor — a broadcast C-row
        # derived corpus feeding the adaptive-K trained search plus the
        # |Q|-broadcast brute-force reconciliation (training itself runs
        # eagerly through session caches, like sim_kmeans_train's row).
        "sim_recall_floor_planted",
        # VERDICT r11 item 7: the two fixed-round iteratives whose loops
        # do NOT materialize per round (rank/label tables never self-join,
        # so lineage stays linear) — their full unrolled plans audit like
        # any other query.
        "graph_pagerank_neardup",
        "graph_label_spread",
        # sim_semantic_clusters / graph_kcore_neardup /
        # graph_components_incremental construct eagerly: building their
        # DataFrames RUNS the materialized propagation/peel rounds (the
        # parquet lineage-truncation discipline), so the returned plan is
        # a scratch-scan aggregate.  Their REPEATING round bodies are
        # audited un-materialized in the iterative section below.
    ]
    # DML queries are deliberately absent: calling them executes the
    # mutation chain eagerly and the returned DataFrame's plan is just the
    # final read+agg — the interesting copy-on-write file pruning happens
    # inside ManagedTable and is pinned in tests/test_managed.py instead.
    for name in HEADLINE + [n for n in extra if n in queries]:
        if name.startswith("stream_"):
            continue
        df = queries[name](spark, sf_dir)
        lines.append(table_row(audit(name, plan_of(df))))
    # Iterative round-body audit (VERDICT r11 item 7): the operators whose
    # loops materialize each round to scratch parquet (lineage truncation)
    # can't be audited end-to-end — the plan that matters at scale is the
    # ROUND BODY that repeats.  Build one round un-materialized and audit
    # that.
    from pyspark.sql import functions as F

    from simple_query_engine_spark.operators import dedup as D

    pairs = D.q_dedup_minhash_lsh(spark, sf_dir).select("doc_id_a", "doc_id_b")
    edges = D._symmetric_edges(pairs)
    labels0 = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    alive0 = edges.select(F.col("src").alias("node")).distinct()
    iterative_bodies = {
        # one min-label propagation + pointer-doubling round — the body of
        # dedup_clusters(_lsh), dedup_cluster_keeper_quality,
        # sim_semantic_clusters, and graph_components_incremental
        "iterative:components_round": D._propagation_round(edges, labels0),
        # one synchronized k-core peel round (graph_kcore_neardup)
        "iterative:kcore_peel_round": D._kcore_round(edges, alive0),
    }
    lines += [
        "",
        "## Iterative round bodies (audited un-materialized)",
        "",
        "The eager iteratives (`sim_semantic_clusters`,",
        "`graph_kcore_neardup`, `graph_components_incremental`,",
        "`dedup_clusters*`, `dedup_cluster_keeper_quality`) materialize",
        "each round to scratch parquet, so their end-to-end plan is a",
        "scratch-scan aggregate.  The rows below audit ONE un-materialized",
        "round body over the real LSH edge list — the plan shape that",
        "repeats R times at scale.",
        "",
        "| round body | joins (BHJ/SMJ/SHJ/BNLJ) | exchanges | cached scans | pushed filters | scan reads only | top-k op | partial agg |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, df in iterative_bodies.items():
        lines.append(table_row(audit(name, plan_of(df))))
    # Streaming micro-batch audit (VERDICT r12 item 5): every runner
    # records its query's LAST micro-batch physical plan after
    # awaitTermination (explain_capture); invoking each stream_* entry
    # populates the registry, and the rows below make the docstring claims
    # (stateless projection, ONE stateful aggregation, broadcast
    # enrichment) mechanically checkable like the batch plans.
    from simple_query_engine_spark.streaming import explain_capture

    lines += [
        "",
        "## Streaming (one micro-batch per query)",
        "",
        "Each row audits a captured LAST-micro-batch physical plan of a",
        "`stream_*` entry (one entry can run several queries — restart,",
        "ingest + read-back).  `stateful ops` counts state stores in the",
        "batch (each adds a REQUIRED_BY_STATEFUL_OPERATOR shuffle and",
        "checkpointed state); `joins BHJ/other` separates broadcast",
        "enrichment (static side stays executor-resident) from shuffle",
        "joins; `cached scans` counts session-cache hits (their",
        "construction lineage is collapsed exactly as in the batch audit —",
        "the batch reads them from memory); `python` counts Arrow-batched",
        "Python operators (empty = the batch stays JVM-side end to end).",
        "",
        "| stream query [captured plan] | stateful ops | joins BHJ/other | exchanges | cached scans | watermark | pushed filters | python |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in sorted(n for n in queries if n.startswith("stream_")):
        explain_capture.reset()
        queries[name](spark, sf_dir)
        if not explain_capture.LAST_EXPLAINS:
            lines.append(f"| {name} | (no plan captured) | | | | | | |")
            continue
        for label, plan in explain_capture.LAST_EXPLAINS.items():
            lines.append(streaming_row(streaming_audit(f"{name} [{label}]", plan)))
    lines += [
        "",
        "Reading guide: BHJ = BroadcastHashJoin (dimension sides broadcast,",
        "no fact shuffle); node counts come from the plan TREE with every",
        "InMemoryTableScan's construction lineage COLLAPSED (the runtime",
        "shape once caches are populated — cached-subtree expansion inflated",
        "earlier rounds' counts); `cached scans` is how many such cached",
        "reads the plan contains; `pushed filters` counts scans with",
        "non-empty `PushedFilters`; `scan reads only` shows the pruned",
        "ReadSchema — unreferenced columns must not appear.",
    ]
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
