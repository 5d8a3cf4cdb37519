#!/usr/bin/env python
"""Generate COVERAGE.md — SURVEY §2 operator inventory → where each ID
is implemented and how it is verified (oracle query / rows-only query /
tests / library). Run from the repo root:

    python scripts/gen_coverage.py > COVERAGE.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_stream_processor_spark.plans import all_specs  # noqa: E402

# Every SURVEY §2 ID, section by section.
INVENTORY: dict[str, list[str]] = {
    "S — scans / sources / sinks": [f"S{i}" for i in range(1, 12)],
    "P — projections / filters": [f"P{i}" for i in range(1, 8)],
    "J — joins": [f"J{i}" for i in range(1, 9)],
    "A — aggregations": [f"A{i}" for i in range(1, 9)],
    "W — window functions": [f"W{i}" for i in range(1, 6)],
    "O — sorts / limits / set ops": [f"O{i}" for i in range(1, 8)],
    "F — scalar functions": [f"F{i}" for i in range(1, 18)],
    "T — streaming": [f"T{i}" for i in range(1, 12)],
    "U — UDF / UDAF / UDTF": [f"U{i}" for i in range(1, 5)],
    "L — LLM-pipeline ops": [f"L{i}" for i in range(1, 6)],
}

# Coverage that lives in the library / test suite rather than (only) in
# a registered query.
SUPPLEMENTAL: dict[str, list[str]] = {
    "S1": ["io.read_links", "tests/test_station.py::test_links_source_filters"],
    "S2": ["io.read_links (missing-file errors natively)"],
    "S3": ["sources/extractor.py (StubExtractor + YtDlpExtractor)"],
    "S4": ["sources/extractor.py YtDlpExtractor._extract_one (retry/backoff)"],
    "S5": ["sources/extractor.py YtDlpExtractor._extract_fallback (chain)"],
    "S6": ["pipeline/sink.write_json_array", "tests/test_station.py::test_station_pipeline_batch"],
    "S7": [
        "pipeline/sink.foreach_batch_overwrite (checkpointed overwrite-by-batch)",
        "pipeline/sink.write_partitioned (maxRecordsPerFile sizing + cluster_by, tests/test_scale_paths.py; zorder_by Morton layout for multi-dim stats pruning — one stats pass for all columns, operators/zorder.py + tests/test_zorder.py incl. the sf0.1 cluster_by-vs-zorder row-group pruning comparison; benched as zorder_write_pruned_read)",
    ],
    "S8": ["plans/setops.set_ops_suite (exceptAll change detection)", "set_ops_suite query (O7 form)"],
    "S9": ["io.load_table — every registered query scans parquet"],
    "S10": ["pipeline/sink round-trip read", "tests/test_station.py"],
    "S11": ["io.load_events_stream", "tests/test_streaming.py"],
    "T1": ["tests/test_station.py::test_station_pipeline_streaming_twin (availableNow)", "tests/test_streaming.py::test_checkpoint_restart_recovers_state (checkpoint-restart recovery; default + RocksDB state stores)"],
    "T2": ["io.load_events_stream file source", "tests/test_streaming.py"],
    "T3": ["pipeline/sink.foreach_batch_overwrite", "tests/test_station.py", "streaming/rollup.py incremental maintenance + idempotent backfill + tiered compaction (tests/test_rollup.py; CLI `rollup`; driver-oracle evidence: stream_window_counts rollup_1h leg routes through rollup_stats; benched as rollup_maintain_serve_v2 (session-conf control), with the state_partitions dial quantified as rollup_maintain_serve_v2_sized and the shipped 'auto' default as _auto / _auto_est — the latter deriving the open-group estimate from the source itself (estimate_open_groups; tests/test_rollup.py::test_auto_sizing_from_estimated_open_groups) — SCALE.md per-trigger commit-I/O table)"],
    "T4": ["sources/extractor.py YtDlpExtractor (rate cap + politeness delay params)"],
    "T5": ["streaming/analytics._maybe_watermark", "tests/test_streaming.py::test_watermark_drops_late_data"],
    "T7": [
        "three oracle legs inside stream_session_30m: session_window, the "
        "sliced hot-user escape, and the closed_sessions_batch stateful twin",
        "streaming/analytics.session_stats_sliced (time-slice-and-stitch "
        "bounded-per-task sessionizer; SCALE.md x8skew curve)",
        "tests/test_streaming.py::test_session_sliced_hot_user_and_boundaries",
    ],
    "T8": ["streaming/analytics.stream_dedup", "tests/test_streaming.py::test_stream_dedup_within_watermark"],
    "T9": [
        "oracle evidence via stream_session_30m's 'closed' leg "
        "(closed_sessions_batch — the batch twin the stateful tests pin "
        "exact equality against)",
        "streaming/stateful.running_user_totals (+ Spark-4 transformWithStateInPandas twin; "
        "the TWS twin needs the public `protobuf` package for Spark's state-server protocol — "
        "absent here and installs are disallowed in this environment (re-checked round 11, 2026-08-15: `import google.protobuf` still ModuleNotFoundError), so its test importorskips; "
        "the applyInPandasWithState twin runs and pins identical semantics)",
        "streaming/stateful.closed_user_sessions (EventTimeTimeout session closer)",
        "tests/test_streaming.py::test_stateful_running_totals",
        "tests/test_streaming.py::test_closed_user_sessions",
    ],
    "T10": ["tests/test_streaming.py::test_watermark_drops_late_data"],
    "T11": [
        "tests/test_streaming.py::test_streaming_metrics_progress",
        "pipeline observe metrics (batch observe() counters are oracle-checked via "
        "agg_counts_suite's observe: rows; StreamingQueryProgress itself is runtime "
        "telemetry with no batch-oracle form)",
    ],
    "U1": ["sources/extractor.py + pipeline/station.enrich_links", "tests/test_station.py"],
    "U4": ["operators/asof.asof_join_cogrouped (groupBy().cogroup().applyInPandas)"],
    "P4": ["io.read_links (trim + '#'-comment filter)", "tests/test_station.py::test_links_source_filters"],
    "A1": ["pipeline/sink.write_json_array post-write count", "every oracle query's row-count gate"],
    "O2": ["functions/scalar.file_extension (element_at(arr,-1))", "tests/test_functions.py property suite"],
    "A2": ["pipeline/station.build_station_records observe()", "tests/test_station.py"],
    "A5": [
        "operators/hll.py deterministic register-max HLL, mergeable + "
        "precision-guarded (tests/test_hll.py; wrong-p merge/estimate "
        "raises, tests/test_rollup.py)",
        "streaming/rollup.coarsen_rollup — coarser tier derived from "
        "persisted sketches, p from the v4 manifest/rows, pure plan "
        "builder when p is explicit (oracle leg rollup_1d_derived in "
        "stream_window_counts; tests/test_rollup.py::test_coarsen_rollup_day_equals_direct_from_facts)",
        "property oracle: sketch(A)+sketch(B) byte-equals sketch(A++B) "
        "on random multisets (tests/test_properties.py::test_hll_registers_pure_function_of_key_set)",
    ],

    "F1": ["functions/scalar.deterministic_uuid (seeded twin of uuid())"],
    "F2": ["functions/scalar.dual_timestamp (frozen run_ts)"],
    "J2": [
        "tests/test_scale_paths.py::test_bucketed_join_avoids_shuffle (co-located bucketed join)",
        "operators/salt.salted_join + tests/test_scale_paths.py (skew salting)",
    ],
    "J6": ["tests/test_scale_paths.py::test_stream_stream_time_range_join (watermarked stream-stream)"],
    "J7": [
        "operators/asof.asof_join_cogrouped (cogroup+applyInPandas twin, pinned equal to the JVM path)",
        "tests/test_operators.py::test_asof_cogrouped_twin_equals_jvm_path",
        "property oracle: pandas merge_asof on random inputs, incl. "
        "tolerance (tests/test_properties.py)",
    ],
    "J8": [
        "streaming/analytics.signup_purchase_attribution (stream-stream interval join)",
        "tests/test_streaming.py::test_stream_stream_interval_join_equals_batch",
    ],
    "L2": [
        "tests/test_llm.py::test_minhash_recall_vs_exact (LSH vs exact)",
        "llm/dedup.contamination_overlap (benchmark decontamination; hash==portable pinned)",
        "llm/dedup.streaming_near_dup_flags (stateless stream-static admission filter)",
        "llm/ingest.prepare_corpus_stream (continuous corpus ingestion: quality gate + "
        "near-dup admission + chunking + partitioned appends per micro-batch; "
        "stream==batch pinned)",
        "tests/test_streaming.py::test_streaming_corpus_ingestion_equals_batch",
        "tests/test_streaming.py::test_streaming_near_dup_flags_equals_batch",
    ],
    "L3": [
        "tests/test_llm.py::test_ivf_recall_vs_bruteforce",
        "llm/similarity.kmeans_centroids (trained IVF cells; training "
        "replayed in the llm_ivf_topk oracle)",
        "tests/test_llm.py::test_ivf_trained_centroids_recall_and_objective",
        "llm/similarity.pq_train/pq_encode/pq_topk_rerank (product "
        "quantization: m sub-codebooks, ADC shortlist + exact re-rank; "
        "batched form pq_topk_batch; zero-shuffle pq_encode_mapside; "
        "composed ivfpq_topk pinned equal to pure PQ at nprobe=all)",
        "tests/test_llm.py::test_pq_train_encode_matches_python_reference",
        "llm/similarity.ivf_assign_mapside (stateless cell routing — "
        "streaming ingest twin, stream==batch pinned)",
        "tests/test_streaming.py::test_streaming_ivf_assignment_equals_batch",
    ],
    "L4": [
        "llm/text.bpe_train + llm/bpe_merges.PRETRAINED_MERGES (learned "
        "subword tokenizer, frozen-table replay in the "
        "llm_doc_annotations oracle)",
        "tests/test_llm.py::test_bpe_train_matches_python_reference",
        "llm/quality_model.model_quality_filter (learned quality filter: "
        "logistic regression distilled from the rule filter's labels — "
        "standardized features, 32 full-batch GD rounds each one agg pass, "
        "map-side sigmoid inference; the TRAINING is replayed unrolled in "
        "the llm_corpus_filter_suite oracle)",
        "tests/test_llm.py::test_logreg_train_matches_python_reference",
    ],
    "L5": ["tests/test_llm.py (decoder seam, parquet round trip)"],
}


# Round-1 query name → where it lives after the ≤50-entry consolidation.
RENAMES: list[tuple[str, str]] = [
    ("scalar_math_suite / scalar_string_suite / scalar_datetime_suite", "`scalar_suite`"),
    ("win_ranking / win_lag_lead / win_frames", "`win_suite`"),
    ("win_percentiles + agg_argmax", "`agg_percentile_argmax`"),
    ("agg_rollup / agg_cube", "`agg_rollup_cube`"),
    ("agg_approx_distinct + corpus_counts", "`agg_counts_suite` (approx now oracle-checked via error-bound boolean)"),
    ("set_union_distinct / set_intersect_except", "`set_ops_suite`"),
    ("join_left_outer / join_full_outer", "`join_outer_suite`"),
    ("join_semi / join_anti", "`join_semi_anti`"),
    ("sql_correlated_scalar_subquery / sql_exists_subquery", "`sql_subquery_suite`"),
    ("stream_tumbling_1h / stream_sliding_1h_15m", "`stream_window_counts`"),
    ("llm_dedup_exact / llm_dedup_canonical", "`llm_dedup_groups`"),
    ("llm_ngram_jaccard_pairs / llm_minhash_pairs_portable / llm_simhash_pairs_portable", "`llm_near_dup_pairs` (3 labeled legs)"),
    ("llm_langid / llm_fingerprints", "`llm_doc_annotations`"),
    ("llm_token_counts", "`llm_text_quality` (BPE columns)"),
    ("llm_hash_sample / llm_stratified_sample", "`llm_sampling_suite`"),
    ("llm_frame_sample / llm_multimodal_features", "`llm_multimodal_suite`"),
    ("llm_minhash_pairs / llm_simhash_pairs (xxhash64)", "`llm_near_dup_pairs_prod` since r10 (rows-only by design — no DuckDB xxhash64; exact-verified + portable-twin-pinned); also bench + tests (`llm/dedup.py`)"),
    ("dedup_distinct_pairs", "`set_ops_suite` 'distinct_pairs' leg (r10 — freed the driver-window slot `llm_near_dup_pairs_prod` uses)"),
    ("scan_filter_project", "unregistered — S9/P7 via `q1_pricing_summary`; plan test + bench keep the builder"),
    ("join_broadcast_dim", "unregistered — J1 via `join_revenue_by_nation`"),
]


def expand(ids_field: str) -> set[str]:
    """'F1-F14,P2' -> {'F1',...,'F14','P2'}"""
    out: set[str] = set()
    for part in ids_field.split(","):
        part = part.strip()
        m = re.fullmatch(r"([A-Z])(\d+)-(?:[A-Z])?(\d+)", part)
        if m:
            prefix, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))
            out.update(f"{prefix}{i}" for i in range(lo, hi + 1))
        elif part:
            out.add(part)
    return out


def main() -> None:
    specs = all_specs()
    by_id: dict[str, list[str]] = {}
    for name, spec in sorted(specs.items()):
        kind = "oracle" if spec.oracle else "rows-only"
        for sid in expand(spec.survey_ids):
            by_id.setdefault(sid, []).append(f"`{name}` ({kind})")

    print("# COVERAGE — SURVEY §2 inventory → implementation & verification")
    print()
    print("Generated by `scripts/gen_coverage.py` from the query registry;")
    print("'oracle' = DuckDB hash-compared by the driver at sf0.01,")
    print("'rows-only' = driver row-count check + semantics pinned in tests.")
    print()
    total, covered = 0, 0
    for section, ids in INVENTORY.items():
        print(f"## {section}\n")
        print("| ID | registered queries | library / tests |")
        print("|---|---|---|")
        for sid in ids:
            total += 1
            queries = by_id.get(sid, [])
            supp = SUPPLEMENTAL.get(sid, [])
            if queries or supp:
                covered += 1
            print(
                f"| {sid} | {'; '.join(queries) or '—'} | {'; '.join(supp) or '—'} |"
            )
        print()
    print(f"**{covered}/{total} inventory IDs covered.**")
    print()
    print("## Round-1 → round-2 query renames")
    print()
    print("The registry was consolidated to ≤50 entries (all oracle-paired) so")
    print("the driver's 50-query CORRECTNESS window covers every query. Where a")
    print("round-1 query name appears in older VERDICT/BENCH records:")
    print()
    print("| round-1 query | now |")
    print("|---|---|")
    for old, new in RENAMES:
        print(f"| {old} | {new} |")


if __name__ == "__main__":
    main()
