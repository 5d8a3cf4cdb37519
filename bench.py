#!/usr/bin/env python
"""Headline benchmark — runs the engine's representative query mix at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints TWO JSON lines — a detail line,
then a compact headline line LAST:

    {"metric": "headline_query_mix_detail",
     "spread": {"q1": {min,med,max}, ...},
     "phases": {<lifecycle legs>: {setup,maintain,compact,serve,
                                   commit_io_s}},
     "roles": {<lifecycle legs>: "<what this leg represents>"}}
    {"metric": "headline_query_mix_total", "value": <total sec>,
     "unit": "sec", "queries": {"q1": <median sec>, ...}, "sf": 0.1,
     "timed_passes": 3, "commit_io_s": {<lifecycle legs>: sec},
     "load_1m": <1-min load at start>, "comparable": <load < gate>}

The split exists because the driver's wrapper captures only the last
~2000 characters of stdout: r9's single line grew to ~2.9 KB (spread +
dual-phase blocks) and the driver's own artifact refresh truncated it
to unparseable ("parsed": null). The final line is now guaranteed
<= 2000 chars (asserted) and self-sufficient for the pin contract;
scripts/gauntlet.sh merges both lines into BENCH_<tag>.json so the
committed artifact keeps full fidelity.

Recorded times are the median of 3 back-to-back timed passes after 2
warm passes (r8: two idle same-head single-pass runs differed 20%);
``spread`` carries each query's min/med/max so a reader sees the
achieved noise floor, ``comparable`` says whether the load gate was
met, and scripts/check_bench_pins.py reads the medians against
BENCH_BASELINE.json's pinned bars. ``commit_io_s`` is the summed
state-store ``commitTimeMs`` of each lifecycle leg's maintenance
drain, from the pass whose wall time is the recorded median — the
fsync-I/O axis r9 root-caused the maintain phase's cross-process
bimodality to (REHEARSAL.md: wall medians 7.4/10.5 s are machine
fsync-latency modes, not code): a wall regression WITHOUT a matching
commit-I/O move is a code regression; one WITH it is the machine.

Query mix rationale: one per engine pillar — scan+agg (TPC-H Q1 shape),
multi-way join, rollup, window ranking, top-k sort, event-time windows,
sessionization, and the LLM ops (exact dedup, MinHash+LSH near-dup as
the scale path, cosine top-k, text quality). Execution via the noop
sink: full computation, zero driver materialization — what a cluster
run would measure.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from video_stream_processor_spark.io import load_table  # noqa: E402
from video_stream_processor_spark.llm.dedup import (  # noqa: E402
    exact_dedup_groups,
    minhash_near_dup_pairs,
)
from video_stream_processor_spark.llm.similarity import (  # noqa: E402
    cosine_topk,
    pq_topk_rerank,
    pq_train,
)
from video_stream_processor_spark.plans import all_specs  # noqa: E402
from video_stream_processor_spark.plans.relational import (  # noqa: E402
    scan_filter_project,
)
from video_stream_processor_spark.session import get_spark  # noqa: E402
from video_stream_processor_spark.streaming.analytics import (  # noqa: E402
    session_stats,
    tumbling_stats,
)


# The mix keeps BENCH_r01's 13 query names/computations verbatim so
# per-query times stay comparable round over round (BENCH_BASELINE.json
# pins the r01 bar). Queries the ≤50-entry registry consolidation
# merged or unregistered run here via their underlying builders.
def _agg_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def _win_ranking(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


def _llm_text_quality_pinned(spark, sf_dir):
    """The r01-pinned computation for the ``llm_text_quality`` bar:
    the per-lang quality profile WITHOUT the BPE-budget and unigram-LM
    legs that the registered query absorbed in later rounds. The
    registry consolidation changed what the registered name computes;
    the pin only means something against the same computation, so the
    pinned name runs the pinned plan and the enriched registered query
    is timed separately as ``llm_text_quality_full`` (new entry, no
    pin)."""
    from video_stream_processor_spark.llm.text import quality_columns

    q = quality_columns()
    per_doc = load_table(spark, sf_dir, "documents").select(
        "lang", *[v.alias(k) for k, v in q.items()]
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg("n_distinct_tokens"), 6).alias("avg_distinct_tokens"),
        F.round(F.avg("stopword_ratio"), 6).alias("avg_stopword_ratio"),
        F.round(F.avg("avg_token_len"), 6).alias("avg_token_len"),
    )


EXTRA_BUILDERS = {
    "scan_filter_project": scan_filter_project,
    "agg_rollup": _agg_rollup,
    "win_ranking": _win_ranking,
    "stream_tumbling_1h": lambda s, d: tumbling_stats(
        load_table(s, d, "events"), size="1 hour"
    ),
    # r01-pinned single-leg sessionization: the registered query grew
    # to a 3-leg union (session_window + sliced escape + closed-twin)
    # in r7, which broke the pin contract for one round — the pinned
    # name runs the pinned computation again; the 3-leg registry form
    # is timed separately as stream_session_30m_full (no pin).
    "stream_session_30m": lambda s, d: session_stats(
        load_table(s, d, "events"), gap="30 minutes"
    ),
    "llm_dedup_exact": lambda s, d: exact_dedup_groups(
        load_table(s, d, "documents")
    ),
    "llm_minhash_pairs": lambda s, d: minhash_near_dup_pairs(
        load_table(s, d, "documents"), threshold=0.5
    ),
    "llm_text_quality": _llm_text_quality_pinned,
    # r01-pinned single-query form; the registered query is now the
    # batched suite (timed separately below).
    "llm_cosine_topk": lambda s, d: cosine_topk(
        load_table(s, d, "embeddings"), query_vec_id=0, k=10
    ),
    # steady-state PQ serve: trainer memoizes per session and the code
    # table is memo-materialized (at scale it is a WRITTEN table), so
    # this times the ADC shortlist + exact re-rank — the per-query cost
    "llm_pq_rerank": lambda s, d: _pq_rerank_served(s, d),
    # r5: round-4 surfaces enter the bench mix (VERDICT r4 task 2).
    # Re-pinned _v2 in r8: v1's bar (6.46 s, first-set r5) measured the
    # estimate-only rollup format; r7's format v3 added the mergeable
    # HLL register sketch (two-phase stateful agg + per-window heal in
    # the serving read) — a different workload, so it gets its own name
    # and its first idle number sets the v2 bar.
    "rollup_maintain_serve_v2": lambda s, d: _rollup_maintain_serve(s, d),
    # r9: the same lifecycle with the stateful shuffle SIZED to the
    # drain (8 state stores instead of the session's 32). Probe-
    # measured at sf0.1, state-store delta-commit I/O is ~85% of
    # addBatch under the default, and its fsync jitter is what made
    # the v2 leg's cross-run timings bimodal; sizing cuts summed
    # commit I/O ~20x and the wall ~30%. The pinned v2 leg is
    # untouched (artifact-honesty rule); this twin quantifies the
    # state_partitions dial in the artifact of record.
    "rollup_maintain_serve_v2_sized": lambda s, d: _rollup_maintain_serve(
        s, d, state_partitions=8
    ),
    # r10: the lifecycle at the NEW DEFAULT — state_partitions="auto"
    # (fresh checkpoint every call, so each pass derives the sizing
    # like a first start would). The r9 verdict ordered the
    # volume-derived sizing made the default and its "done" bar is
    # "new-checkpoint default measurably matches the sized leg": at
    # this session (32 shuffle partitions, p=12) the derivation lands
    # on 8 — the same plan as v2_sized — so this leg's number IS that
    # measurement, in the artifact of record. The pinned v2 leg keeps
    # explicit None (session conf) for bar comparability.
    "rollup_maintain_serve_v2_auto": lambda s, d: _rollup_maintain_serve(
        s, d, state_partitions="auto"
    ),
    # r11: the auto lifecycle with expected_open_groups ESTIMATED from
    # the staged source itself instead of the static default 8 — the
    # r10 verdict's item 4 ("derive the sizing's one free parameter
    # from data"), measured in the artifact of record. Since r14 the
    # estimate is PERSISTED next to the staged source keyed by a data
    # fingerprint (cached_open_groups, r13 verdict item 3): the first
    # warm pass computes and caches it, every later pass — i.e. every
    # TIMED pass — reads it, which is what ships (a production
    # maintainer re-estimates only when the landing data changes, not
    # per start). The setup phase therefore carries the fingerprint
    # check, not the 0.45-0.68 s occupancy pre-scan, and the artifact
    # stamps open_groups_src=cached|computed so "read, not recomputed"
    # is checkable from the artifact alone.
    "rollup_maintain_serve_v2_auto_est": lambda s, d: _rollup_maintain_serve(
        s, d, state_partitions="auto", expected_open_groups="estimate"
    ),
    "zorder_write_pruned_read": lambda s, d: _zorder_write_pruned_read(s, d),
}

#: What each rollup lifecycle leg REPRESENTS, stamped into the bench
#: detail line (r10 verdict nit: once the library default became
#: state_partitions="auto", nothing in the artifact said the pinned v2
#: leg is the session-conf CONTROL — a reader skimming BENCH_r10.json
#: could take its 11.4 s as the product number). The pinned leg keeps
#: running None for bar continuity; the artifact now says so itself,
#: and scripts/check_bench_pins.py prints the role next to each leg's
#: wall/commit-I/O line.
LEG_ROLES = {
    "rollup_maintain_serve_v2": (
        "session-conf control (state_partitions=None, 32 stores; "
        "pinned bar, NOT the shipped default)"
    ),
    "rollup_maintain_serve_v2_sized": (
        "hand-sized twin (state_partitions=8; quantifies the dial)"
    ),
    "rollup_maintain_serve_v2_auto": (
        "static-open-groups control (state_partitions='auto' with the "
        "static default 8; demoted since r14 to "
        "SPARK_GRAFT_BENCH_CONTROL=1 runs — the shipped default is "
        "the _auto_est leg)"
    ),
    "rollup_maintain_serve_v2_auto_est": (
        "shipped default (state_partitions='auto' + persisted "
        "data-estimated open groups: cached_open_groups reads the "
        "fingerprint-keyed estimate cached at first start — "
        "open_groups_src says cached vs computed). Sizing rationale "
        "(r13 store-count sweep, SCALE.md): the derived 6 stores sit "
        "ON the wall-optimal 6-8 plateau (spreads overlap) at 0.57x "
        "the static default's state-commit I/O — the fsync axis that "
        "dominates at scale with remote checkpoints"
    ),
}


_ROLLUP_SRC: dict[str, str] = {}
_TMP_ROOT: list[str] = []


def _tmp_root() -> str:
    """Per-PROCESS private scratch root (mkdtemp): two concurrent bench
    invocations — or a stale dir owned by another process — must not
    rmtree each other's staging/checkpoint dirs mid-run. Removed at
    exit; the per-session source memo lives inside it."""
    if not _TMP_ROOT:
        import atexit

        root = tempfile.mkdtemp(prefix="vsp_bench_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _TMP_ROOT.append(root)
    return _TMP_ROOT[0]


def _rollup_events_src(s, d: str) -> str:
    """Stage events as a multi-file parquet dir once per (session, sf):
    the streaming file source replays one file per trigger, so the
    watermark advances across micro-batches and append-mode windows
    actually close (a single-file source would emit nothing). At scale
    events already land as a multi-file table — the staging is fixture
    adaptation, not part of the measured pipeline, hence memoized
    outside the timed region (the warm passes populate it)."""
    if d not in _ROLLUP_SRC:
        # name by a digest of the FULL path: two sf dirs sharing a
        # basename must not silently share (and restage) one directory
        tag = hashlib.sha256(d.rstrip("/").encode()).hexdigest()[:12]
        src = os.path.join(_tmp_root(), f"rollup_src_{tag}")
        shutil.rmtree(src, ignore_errors=True)
        # 4 time-ranged files → 4 triggers: enough watermark advances
        # to close and append most windows, without paying 8+ rounds of
        # state-store commit overhead in every bench pass
        load_table(s, d, "events").repartitionByRange(4, "ts").write.parquet(src)
        # replay in TIME order (part-00000 holds the lowest ts range):
        # the file source processes oldest-mtime first, and the write's
        # own mtimes land in arbitrary task-completion order — an
        # out-of-order replay would advance the watermark early and
        # silently drop whole files as late, making the pinned legs
        # measure a run-varying workload (same fix as
        # scripts/rollup_state_smoke.py, where this was root-caused)
        t0 = 1_700_000_000
        for i, f in enumerate(sorted(os.listdir(src))):
            os.utime(os.path.join(src, f), (t0 + i * 10, t0 + i * 10))
        _ROLLUP_SRC[d] = src
    return _ROLLUP_SRC[d]


#: Eager sub-phase seconds of the LAST _rollup_maintain_serve call —
#: the r7 lesson ("+69% with no decomposition") made explicit: the
#: lifecycle leg's artifact now names where its seconds go. maintain
#: and compact run eagerly inside the builder; serve is the remainder
#: (the noop write of the lazy tiered read), derived in main().
_ROLLUP_PHASES: dict[str, float] = {}

#: Summed state-store commitTimeMs (as seconds) of the LAST
#: _rollup_maintain_serve drain, from StreamingQueryProgress — the
#: per-trigger delta-file fsync I/O that dominates maintain at small
#: trigger volume (r9 probe: 80.1 s at 32 state partitions vs 4.2 s
#: at 8, same rows). Recorded next to the wall phases so a maintain
#: regression is attributable: wall up + commit I/O up = fsync regime
#: shift (machine); wall up + commit I/O flat = code.
_ROLLUP_COMMIT_S: list[float] = [0.0]

#: Sizing the LAST _rollup_maintain_serve drain actually ran at —
#: (state stores, resolved open-groups parameter). The store count is
#: OBSERVED (max stateOperators[].numShufflePartitions over the
#: drain's progress events), not re-derived, so the artifact records
#: what the query really did; open_groups is the resolved value the
#: auto derivation was fed (the estimate, for the _auto_est leg), and
#: None for legs whose sizing never consumes the parameter (the
#: session-conf control and the explicit-int sized twin) — stamping
#: the dead default there would read as a fed-vs-observed divergence,
#: the exact confusion the stamp exists to remove (r12 review).
#: r11 verdict item 1a: the auto_est leg ran 1.1-2.5 s slower with
#: 1.6-1.8x the commit I/O of the static default and NOTHING in the
#: artifact said the estimator had derived a different store count —
#: sizing divergence must be diagnosable from the artifact alone.
_ROLLUP_SIZING: list[tuple[int, int | None]] = [(0, None)]

#: Provenance of the LAST drain's open-groups estimate — "cached"
#: (read from the fingerprint-keyed sidecar; the shipped steady state)
#: or "computed" (estimated fresh: first start or stale fingerprint);
#: None for legs that never estimate. Stamped into the artifact as
#: open_groups_src (r13 verdict item 3's done-bar: the stamp must show
#: the estimate was READ, not recomputed).
_ROLLUP_EST_SRC: list[str | None] = [None]


def _rollup_maintain_serve(s, d, state_partitions=None, expected_open_groups=8):
    """The incremental-rollup lifecycle end to end: streaming
    maintenance (availableNow, watermark-closed appends) into the live
    table, tiered compaction into the base, then the serving read
    (compacted base + live tail) — the timed unit is everything a
    refresh cycle costs. Fresh output dirs per call so warm and timed
    passes do identical work."""
    from video_stream_processor_spark.streaming.rollup import (
        compact_rollup,
        read_rollup_tiered,
        start_rollup_maintenance,
    )

    # r8-advisor: the derived 'serve' remainder used to absorb this
    # pre-maintain setup (rmtree + the batch schema read of the source
    # parquet); record setup as its own phase so serve is purely the
    # tiered-read noop write.
    t_enter = time.perf_counter()
    src = _rollup_events_src(s, d)
    _ROLLUP_EST_SRC[0] = None
    if expected_open_groups == "estimate":
        # data-derived sizing parameter (r10 verdict item 4), since
        # r14 via the PERSISTED estimate (r13 verdict item 3): the
        # occupancy pre-scan runs once per distinct source fingerprint
        # and is cached next to the staged source; steady-state starts
        # — every timed pass after the first warm one — read it. Still
        # inside the timed region so setup honestly carries whatever
        # the resolution really cost this pass (fingerprint walk when
        # cached, full pre-scan when not), with the provenance stamped.
        from video_stream_processor_spark.streaming.rollup import (
            cached_open_groups,
        )

        expected_open_groups, _ROLLUP_EST_SRC[0] = cached_open_groups(
            s, src, size="1 day", watermark="30 minutes"
        )
    out = os.path.join(_tmp_root(), "rollup_out")
    shutil.rmtree(out, ignore_errors=True)
    live, base, ckpt = (os.path.join(out, x) for x in ("live", "base", "ckpt"))
    stream = (
        s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # Daily windows, not hourly: the fixture's 150-day span at sf0.1
    # would mean ~3600 hourly partition DIRS for ~1M events (~300 rows
    # each) — at that ratio the timing measures local-FS directory
    # churn, not the operator. Daily keeps per-partition volume
    # representative of what an hourly partition holds at cluster
    # scale; the aggregation/compaction/serving plans are identical.
    t0 = time.perf_counter()
    q = start_rollup_maintenance(
        stream,
        live,
        ckpt,
        size="1 day",
        watermark="30 minutes",
        state_partitions=state_partitions,
        expected_open_groups=expected_open_groups,
    )
    # bounded wait: a hung stream must not cost the round its bench
    # artifact (availableNow drains in seconds here; 600 s is headroom)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("rollup maintenance did not drain within 600s")
    t1 = time.perf_counter()
    # commit_io_s sums over recentProgress, which Spark caps at
    # spark.sql.streaming.numRecentProgressUpdates entries (default
    # 100). The 4-file staging drains in ~5 triggers, but if the
    # staging or trigger cadence ever grows past the retention window
    # the sum would silently undercount — corrupting the wall-vs-
    # commit-I/O attribution axis (r10 advisor). Fail loudly instead.
    progress = q.recentProgress
    retention = int(
        s.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100")
    )
    if len(progress) >= retention:
        raise RuntimeError(
            f"lifecycle drain produced {len(progress)} progress entries, "
            f"at/over the numRecentProgressUpdates retention cap "
            f"{retention}: commit_io_s would silently undercount — raise "
            "the retention conf or shrink the staged trigger count"
        )
    _ROLLUP_COMMIT_S[0] = round(
        sum(
            so.get("commitTimeMs", 0)
            for pr in progress
            for so in (pr.get("stateOperators") or [])
        )
        / 1000.0,
        3,
    )
    _ROLLUP_SIZING[0] = (
        max(
            (
                int(so.get("numShufflePartitions") or 0)
                for pr in progress
                for so in (pr.get("stateOperators") or [])
            ),
            default=0,
        ),
        # only the auto derivation consumes expected_open_groups; the
        # control (session conf) and sized (explicit int) legs never
        # resolve it, so stamping the dead default would fake a
        # fed-vs-observed divergence (r12 review)
        int(expected_open_groups) if state_partitions == "auto" else None,
    )
    compact_rollup(s, live, base)
    t2 = time.perf_counter()
    _ROLLUP_PHASES["setup"] = round(t0 - t_enter, 3)
    _ROLLUP_PHASES["maintain"] = round(t1 - t0, 3)
    _ROLLUP_PHASES["compact"] = round(t2 - t1, 3)
    return read_rollup_tiered(s, live, base)


def _zorder_write_pruned_read(s, d):
    """write_partitioned(zorder_by=...) of lineitem + a pruned
    read-back filtering on the SECOND clustered dimension — times the
    Morton layout's full cost (one stats scan, range shuffle, sorted
    write) plus the scan it exists to accelerate. The filter range is
    derived from footer-served min/max (aggregatePushdown), so the
    leg is meaningful at any SF."""
    from video_stream_processor_spark.pipeline.sink import write_partitioned

    out = os.path.join(_tmp_root(), "zorder")
    shutil.rmtree(out, ignore_errors=True)
    li = load_table(s, d, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    write_partitioned(li, out, zorder_by=["l_partkey", "l_suppkey"], zorder_files=32)
    back = s.read.parquet(out)
    lo, hi = back.agg(F.min("l_suppkey"), F.max("l_suppkey")).first()
    span = max(hi - lo, 1)
    plo, phi = lo + int(span * 0.45), lo + int(span * 0.50)
    return back.filter(F.col("l_suppkey").between(plo, phi)).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


def _pq_rerank_served(s, d):
    from video_stream_processor_spark.llm.dedup import _memo_checkpoint
    from video_stream_processor_spark.llm.similarity import pq_encode

    emb = load_table(s, d, "embeddings")
    book = pq_train(emb, m=8, k=16, iters=2)
    codes = _memo_checkpoint(pq_encode(emb, book, m=8), "bench_pq_codes")
    return pq_topk_rerank(
        emb, book, query_vec_id=0, topk=10, oversample=10, codes=codes
    )

HEADLINE = [
    "q1_pricing_summary",
    "scan_filter_project",
    "join_revenue_by_nation",
    "join_asof_signup",
    "agg_rollup",
    "win_ranking",
    "sort_topk_offset",
    "stream_tumbling_1h",
    "stream_session_30m",
    "llm_dedup_exact",
    "llm_minhash_pairs",
    "llm_cosine_topk",
    "llm_text_quality",
    # New-in-r3 entries (no r01 pin; their first numbers set the bar):
    "llm_text_quality_full",
    "llm_cosine_topk_batch",
    # New-in-r4 (no pin; first number sets the bar):
    "llm_pq_rerank",
    # New-in-r5 (no pin; first number sets the bar):
    "zorder_write_pruned_read",
    # New-in-r8: the sketch-bearing rollup lifecycle (format v3),
    # re-pinned under a versioned name (see EXTRA_BUILDERS comment),
    # and the 3-leg registered sessionization suite. Since r12 the v2
    # session-conf CONTROL is demoted to SPARK_GRAFT_BENCH_CONTROL=1
    # runs (r11 verdict item 5): it was 26% of every bench wall
    # re-proving a root cause pinned since r9 on a configuration the
    # engine no longer ships; the _auto-vs-_sized pair keeps the
    # sizing-dial tripwire every round. Run the control leg on demand
    # (or every few rounds) to refresh its bar:
    #     SPARK_GRAFT_BENCH_CONTROL=1 python bench.py
    "rollup_maintain_serve_v2",
    "stream_session_30m_full",
    # New-in-r9 (no pin; first number sets the bar): the lifecycle
    # with the stateful shuffle sized to the drain — the
    # state_partitions dial, quantified next to the pinned default.
    "rollup_maintain_serve_v2_sized",
    # New-in-r10 (no pin; first number sets the bar): the lifecycle at
    # the auto default with the STATIC open-groups parameter. Demoted
    # since r14 to SPARK_GRAFT_BENCH_CONTROL=1 runs alongside the v2
    # session-conf control (r13 verdict item 3: collapse the three
    # rollup legs to the pair that measures what ships — the hand-sized
    # twin and the persisted-estimate default; this leg differed from
    # _auto_est only by the estimator pre-scan it was there to expose,
    # which the persisted estimate now amortizes away).
    "rollup_maintain_serve_v2_auto",
    # New-in-r11 (no pin; first number sets the bar): the auto
    # lifecycle with the open-groups parameter estimated from the
    # source itself (r10 verdict item 4); since r14 the estimate is
    # persisted + fingerprint-keyed (cached_open_groups), making this
    # THE shipped-default leg.
    "rollup_maintain_serve_v2_auto_est",
]

#: Legs that re-measure retired/control configurations: run only under
#: SPARK_GRAFT_BENCH_CONTROL=1 (r11 verdict item 5 demoted the v2
#: session-conf control; r13 verdict item 3 demoted the static
#: open-groups _auto twin). A cross-round "dropped" row for these is
#: the expected record of the demotion, not a regression.
CONTROL_LEGS = frozenset(
    {"rollup_maintain_serve_v2", "rollup_maintain_serve_v2_auto"}
)


# Timings are only bar-comparable on a quiet machine (r3 shipped a
# 133 s artifact at load 4.61 that re-ran at 12.8 s idle). Measured
# inflation on this box vs the starting 1-min load: 0.16 -> 0.8x,
# 1.18 -> 2.2x, 1.33 (5m 2.87) -> 5x — so both averages gate, and
# "quiet" means well under one busy core.
LOAD_GATE_1M = 1.0
LOAD_GATE_5M = 2.0

#: Idle band for `calibrate_ms` on this box (min-of-5 of the fixed
#: elementwise-numpy workload, measured at r15 head on an idle machine
#: — see REHEARSAL r15-calib-baseline). The band is ~1.6x the measured
#: idle minimum: same-window idle repeats sit within ~10% of each
#: other, while the r14 "post-suite machine mode" this stamp exists to
#: expose ran timed legs 2-17x slow — far outside it. A stamp above
#: the band marks the surrounding artifact's walls as taken in a
#: degraded machine window (checkers annotate; nothing gates on it).
CALIB_IDLE_BAND_MS = 230.0


def calibrate_ms(runs: int = 5) -> float:
    """Fixed-work single-thread CPU calibration: min-of-``runs`` wall
    time (ms) of a deterministic elementwise-numpy pass. Deliberately
    BLAS-free (r14 advisor: the first-cut 1200x1200 matmul ran on
    2-thread OpenBLAS and spread 3.5x run-to-run, so its documented
    ~1.8 s baseline never reproduced): elementwise ufuncs are
    single-threaded by construction, the output buffer is preallocated
    and warmed (first-touch page-in dominated the first pass at ~1.3 s
    vs 28 ms steady), and the MINIMUM over runs rejects scheduler
    preemption — a persistent machine-slow mode is the one thing that
    moves the best-of-N of a fixed single-thread workload."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.random(2_000_000)
    out = np.empty_like(a)

    def one() -> float:
        t0 = time.perf_counter()
        np.multiply(a, 1.0000001, out=out)
        for _ in range(40):
            np.add(out, 0.5, out=out)
            np.sqrt(out, out=out)
            np.multiply(out, 1.5, out=out)
        float(out.sum())
        return (time.perf_counter() - t0) * 1000

    one()  # warmup: page-in of the output buffer, ufunc dispatch
    return round(min(one() for _ in range(runs)), 1)


def _await_quiet_machine() -> tuple[float, bool]:
    """Sample load BEFORE any Spark work (the bench's own executor
    threads would otherwise dominate the reading); if the machine is
    hot, sleep-and-resample within a bounded budget. Returns
    (final 1-min load, comparable?) — a still-hot machine runs anyway
    (the driver needs its one JSON line) but the artifact
    self-describes as not bar-comparable."""
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "300"))
    poll = 20.0
    waited = 0.0
    while True:
        l1, l5, _ = os.getloadavg()
        quiet = l1 < LOAD_GATE_1M and l5 < LOAD_GATE_5M
        if quiet or waited >= max_wait:
            return round(l1, 2), quiet
        print(
            f"# load {l1:.2f}/{l5:.2f} >= gate {LOAD_GATE_1M}/"
            f"{LOAD_GATE_5M}: waiting for quiet machine "
            f"({waited:.0f}/{max_wait:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(poll)
        waited += poll


def main() -> None:
    load_1m, comparable = _await_quiet_machine()
    # fixed-work CPU stamp bracketing the whole run (r14 verdict item
    # 2's r15 follow-through): loadavg passed at 0.11-0.15 on BOTH r14
    # gauntlet smokes that then ran x8 legs 2-17x slow — the stamp
    # puts the machine's effective single-thread speed IN the
    # artifact, start and end, so a degraded window is visible to the
    # pins checker instead of costing manual dismissal runs
    calib_start_ms = calibrate_ms()
    # control legs run only on request (r11 verdict item 5 / r13
    # verdict item 3; see CONTROL_LEGS) — the mix drops them by
    # default so a dropped-query row in the cross-round classification
    # is the expected record of the demotion, not a silent
    # disappearance
    mix = [
        q
        for q in HEADLINE
        if q not in CONTROL_LEGS
        or os.environ.get("SPARK_GRAFT_BENCH_CONTROL") == "1"
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # the sf field is informational; an unconventional dir name (e.g.
    # sf0.1-idle) must not cost the round its one JSON line
    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="vsp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Self-describing parallelism (r15 verdict item 2): the driver's
    # scaling harness flagged suspect_cpus_ignored even though
    # SPARK_GRAFT_CPUS is honored (session.py builds local[N] from it)
    # because nothing in the artifact said what parallelism the session
    # actually ran. Stamp the RESOLVED values — observed from the live
    # SparkContext, not re-derived from the env — into both JSON lines.
    sc = spark.sparkContext
    default_parallelism = sc.defaultParallelism
    master = sc.master
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    specs = all_specs()
    builders = {name: spec.builder for name, spec in specs.items()}
    # the enriched registered queries (timed under their own new names)
    builders["llm_text_quality_full"] = specs["llm_text_quality"].builder
    builders["llm_cosine_topk_batch"] = specs["llm_cosine_topk"].builder
    builders["stream_session_30m_full"] = specs["stream_session_30m"].builder
    builders.update(EXTRA_BUILDERS)

    # Warm passes: whole-stage-codegen compilation (janino) of a complex
    # aggregate costs seconds ONCE per JVM, and C2 JIT needs a repeat to
    # settle; a resident cluster session pays both once across thousands
    # of queries. Measure steady state.
    def run(name: str) -> float:
        t0 = time.perf_counter()
        builders[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    for _ in range(2):
        for name in mix:
            run(name)

    # Median of 3 timed passes per query (r8 verdict: two idle
    # same-head single-pass runs differed 20% — one pass per query
    # cannot tell a real 30% regression from machine drift). The 3
    # repeats run BACK TO BACK per query, not pass-major across the
    # mix: minutes-apart repeats would put slow machine drift INSIDE
    # each query's sample instead of between queries, which is the
    # noise the median is there to reject. The artifact records the
    # full min/med/max per query so a reader can see the achieved
    # noise floor instead of trusting one number.
    n_timed = 3
    samples: dict[str, list[float]] = {}
    phase_samples: dict[
        str, list[tuple[float, dict[str, float], float, tuple, str | None]]
    ] = {}
    lifecycle_legs = tuple(LEG_ROLES)

    # Memo provenance (r15 verdict item 7): some legs serve from a
    # derived table the warm passes memoized in-process (llm_minhash
    # shingle arrays / candidates, the PQ codes+trainer) — legitimate
    # steady-state-serving framing, but the artifact must SAY which
    # legs do, mirroring open_groups_src. A leg is stamped true iff any
    # of its timed passes was served a memoized checkpoint/artifact.
    def _memo_hit_total() -> int:
        from video_stream_processor_spark.llm.dedup import (
            _CKPT_LOCK,
            _MEMO_HITS,
        )

        with _CKPT_LOCK:
            return sum(_MEMO_HITS.values())

    served_from_memo: dict[str, bool] = {}
    for name in mix:
        ts = []
        for _ in range(n_timed):
            hits_before = _memo_hit_total()
            ts.append(run(name))
            served_from_memo[name] = (
                served_from_memo.get(name, False)
                or _memo_hit_total() > hits_before
            )
            if name in lifecycle_legs:
                # _ROLLUP_PHASES/_ROLLUP_COMMIT_S/_ROLLUP_SIZING hold
                # the latest invocation's eager phases, summed
                # state-commit I/O, and observed (stores, open_groups)
                # sizing; capture per pass so the reported
                # decomposition is the median pass's, not the last one's
                phase_samples.setdefault(name, []).append(
                    (
                        ts[-1],
                        dict(_ROLLUP_PHASES),
                        _ROLLUP_COMMIT_S[0],
                        _ROLLUP_SIZING[0],
                        _ROLLUP_EST_SRC[0],
                    )
                )
        samples[name] = ts

    def med(xs: list[float]) -> float:
        return sorted(xs)[len(xs) // 2]

    times = {name: med(ts) for name, ts in samples.items()}
    spread = {
        name: {"min": min(ts), "med": med(ts), "max": max(ts)}
        for name, ts in samples.items()
    }

    # name where each lifecycle leg's seconds went, from the pass whose
    # total IS the recorded median (serve = remainder after the eager
    # setup/maintain/compact phases — the tiered-read noop write;
    # commit_io_s is that same pass's summed state-store commitTimeMs,
    # which OVERLAPS the maintain wall and so stays out of the sum)
    phases = {}
    commit_io = {}
    for leg, leg_samples in phase_samples.items():
        med_t = times.get(leg)
        if med_t is None or not leg_samples:
            continue
        _, ph, commit_s, (stores, open_groups), est_src = min(
            leg_samples, key=lambda tp: abs(tp[0] - med_t)
        )
        eager = round(sum(ph.values()), 3)
        phases[leg] = {
            **ph,
            "serve": round(max(med_t - eager, 0.0), 3),
            "commit_io_s": commit_s,
            # observed state-store count (stateOperators[].
            # numShufflePartitions): the r11 auto_est over-sizing was
            # invisible precisely because it wasn't in the artifact
            # (r11 verdict item 1a)
            "state_stores": stores,
        }
        if open_groups is not None:
            # the open-groups parameter is stamped only for legs whose
            # auto derivation consumed it (r12 review: a dead default
            # on the control/sized legs would read as divergence)
            phases[leg]["open_groups"] = open_groups
        if est_src is not None:
            # cached = the fingerprint-keyed sidecar served the
            # estimate (the shipped steady state); computed = fresh
            # pre-scan this pass (first start / stale fingerprint)
            phases[leg]["open_groups_src"] = est_src
        commit_io[leg] = commit_s

    # Detail line first, compact headline LAST: the driver wrapper
    # captures only the final ~2000 chars of stdout, and r9's single
    # fat line was truncated mid-object by exactly that window.
    print(
        json.dumps(
            {
                "metric": "headline_query_mix_detail",
                "spread": spread,
                "phases": phases,
                # which legs' timed passes were served an in-process
                # memoized derived table (steady-state-serving framing;
                # see _memo_hit_total above) — provenance, like
                # open_groups_src, so a reader sees what each number
                # measures without reading the builders
                "served_from_memo": {
                    k: v for k, v in served_from_memo.items() if v
                },
                # resolved session parallelism (see stamps in main):
                # the scaling harness verifies SPARK_GRAFT_CPUS from
                # the artifact instead of suspecting it was ignored
                "default_parallelism": default_parallelism,
                "master": master,
                "cpus_env": cpus_env,
                # which lifecycle number is the shipped default vs the
                # pinned control — in the artifact itself, so a reader
                # (or the pins checker) never has to infer it from
                # bench.py's source (r10 verdict labeling nit)
                "roles": {k: v for k, v in LEG_ROLES.items() if k in phases},
            }
        )
    )
    headline = json.dumps(
        {
            "metric": "headline_query_mix_total",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "queries": times,
            "timed_passes": n_timed,
            # the lifecycle legs' state-commit I/O rides along in the
            # compact line too: it is the one detail a driver-side
            # refresh needs to tell an fsync-mode shift from a code
            # regression, and it is 2 small numbers
            "commit_io_s": commit_io,
            "sf": sf,
            # BENCH_BASELINE.json: timings only trustworthy at
            # machine load < ~2; recorded so a noisy round is
            # interpretable after the fact. comparable=false means
            # the load gate timed out still-hot: do NOT read these
            # numbers against any pinned bar.
            "load_1m": load_1m,
            "comparable": comparable,
            # run-bracketing CPU calibration (calibrate_ms): either
            # stamp above the band marks a degraded machine window —
            # START catches a pre-degraded window the load gate can't
            # see, END catches a mode that arrived mid-run (the r14
            # pattern: gate green, then leg loads 9-12 mid-smoke)
            "calib_ms": calib_start_ms,
            "calib_ms_end": calibrate_ms(),
            "calib_band_ms": CALIB_IDLE_BAND_MS,
            # observed parallelism of THIS run (r15 verdict item 2):
            # defaultParallelism + the resolved master string prove the
            # SPARK_GRAFT_CPUS contract from the artifact alone
            "default_parallelism": default_parallelism,
            "master": master,
            "cpus_env": cpus_env,
        }
    )
    # the whole point of the split — never hand the driver a final
    # line its 2000-char tail capture would truncate. The captured
    # window includes the trailing newline, so the line itself must
    # stay at most 1999 chars (r10 review: an exactly-2000-char line
    # would lose its first character). An unconditional raise, not
    # assert (r10 advisor): `python -O` strips asserts, and a silently
    # truncated final line is the exact r9 failure this check exists
    # to prevent.
    if len(headline) + 1 > 2000:
        raise SystemExit(
            f"final bench line grew to {len(headline)} chars: with its "
            "newline it overflows the driver's 2000-char tail window — "
            "move fields to the detail line"
        )
    print(headline)


if __name__ == "__main__":
    main()
