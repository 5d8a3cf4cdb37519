#!/usr/bin/env python
"""Generate PLANS.md — a physical-plan fingerprint for every registered
query, so plan quality is auditable from one table instead of re-running
``.explain`` by hand.

For each ``plans.all_specs()`` entry the query is *planned* (never
executed — ``explain`` stops at physical planning; builders that train
artifacts at build time do run their training jobs) against the given
sf dir, and the formatted plan is reduced to:

* ``exch``    — number of Exchange nodes (shuffles Catalyst kept);
* ``joins``   — join strategies present (BHJ/SMJ/SHJ/BNLJ/CP);
* ``pushed``  — a parquet scan carries non-empty PushedFilters;
* ``python``  — Python-eval nodes in the plan (the declared U-surface
  and mapInPandas seams only — cross-checked by
  tests/test_plans_quality.py::test_no_python_eval_outside_u_surface);
Codegen is NOT a column here: with AQE on, the pre-execution
formatted plan carries no codegen annotation — the executed-plan
codegen guards live in tests/test_plans_quality.py
(``test_q1_stays_in_codegen``, ``test_model_inference_map_side_only``).

Usage: python scripts/gen_plan_audit.py [sf_dir] (default sf0.001).
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_JOIN_NODES = [
    ("BroadcastHashJoin", "BHJ"),
    ("SortMergeJoin", "SMJ"),
    ("ShuffledHashJoin", "SHJ"),
    ("BroadcastNestedLoopJoin", "BNLJ"),
    ("CartesianProduct", "CP"),
]
# a physical node executes Python iff its name carries Python/InPandas/
# InArrow (BatchEvalPythonUDTF, ArrowAggregatePython, MapInPandas,
# FlatMapGroupsInPandas, ArrowEvalPython, ...)
def _is_python_node(head: str) -> bool:
    return "Python" in head or "InPandas" in head or "InArrow" in head


def fingerprint(plan: str) -> dict:
    # count only the numbered detail headers ("(5) Exchange") — the
    # formatted output also repeats every node in the tree sketch, which
    # would double-count
    heads = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, flags=re.M)
    joins = []
    for node, tag in _JOIN_NODES:
        n = sum(1 for h in heads if h == node)
        if n:
            joins.append(f"{tag}x{n}")
    pushed = bool(re.search(r"PushedFilters: \[[^\]]", plan))
    py = sorted({h for h in heads if _is_python_node(h)})
    return {
        "exch": sum(1 for h in heads if h == "Exchange"),
        "joins": " ".join(joins) or "-",
        "pushed": "yes" if pushed else "-",
        "python": " ".join(py) or "-",
    }


def _fp_of(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return fingerprint(buf.getvalue())


def bench_only_rows(spark, sf_dir: str) -> list[tuple[str, dict]]:
    """Fingerprints for the bench EXTRA_BUILDERS computations that are
    not registered queries (r8 verdict: the most expensive leg in the
    artifact of record must not be the only unaudited plan). Each
    builder is invoked exactly as bench.py invokes it — the lifecycle
    and z-order builders execute their write phases at the audit SF —
    and the returned frame is what gets fingerprinted. For the rollup
    lifecycle that frame IS the serve path (the tiered read); the
    maintain phase's aggregation is fingerprinted separately via the
    shared plan builder `rollup_stats` on the watermarked batch frame
    (identical expression tree; the streaming plan only swaps in
    StateStore exec nodes), and compact is a repartition+write of the
    live scan with no returned frame."""
    import bench
    from video_stream_processor_spark.io import load_table
    from video_stream_processor_spark.streaming.rollup import rollup_stats

    rows = []
    for name, builder in sorted(bench.EXTRA_BUILDERS.items()):
        df = builder(spark, sf_dir)
        label = (
            f"bench:{name}[serve]"
            if name.startswith("rollup_maintain_serve")
            else f"bench:{name}"
        )
        rows.append((label, _fp_of(df)))
    ev = load_table(spark, sf_dir, "events").withWatermark("ts", "30 minutes")
    rows.append(
        ("bench:rollup_maintain_serve_v2[maintain-agg]", _fp_of(rollup_stats(ev, "1 day")))
    )
    # sort on the label alone: a tuple sort would fall through to
    # comparing the fingerprint dicts (TypeError) on a label collision
    rows.sort(key=lambda r: r[0])
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from video_stream_processor_spark.plans import all_specs
    from video_stream_processor_spark.session import get_spark

    spark = get_spark(app_name="vsp-plan-audit", cpus=8, shuffle_partitions=8)
    rows = []
    t0 = time.time()
    for name, spec in sorted(all_specs().items()):
        df = spec.builder(spark, sf_dir)
        fp = _fp_of(df)
        rows.append((name, fp))
        print(f"# {name}: exch={fp['exch']} joins={fp['joins']} py={fp['python']}", file=sys.stderr)
    bench_rows = bench_only_rows(spark, sf_dir)
    for name, fp in bench_rows:
        print(f"# {name}: exch={fp['exch']} joins={fp['joins']} py={fp['python']}", file=sys.stderr)

    head = "\n".join(
        [
            "# PLANS — physical-plan fingerprints (generated; do not edit)",
            "",
            f"Generated by `scripts/gen_plan_audit.py` at sf_dir=`{sf_dir}`,",
            f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}, "
            f"{len(rows)} registered queries, {time.time() - t0:.1f}s.",
            "",
            "Columns: `exch` = Exchange (shuffle) nodes; `joins` = join",
            "strategies (BHJ broadcast-hash, SMJ sort-merge, SHJ shuffled-hash,",
            "BNLJ broadcast-nested-loop, CP cartesian); `pushed` = a parquet",
            "scan carries non-empty PushedFilters; `python` = Python-eval",
            "nodes (declared U-surface / mapInPandas seams only).",
            "Executed-plan codegen coverage is guarded in tests (AQE hides",
            "codegen ids from pre-execution formatted plans).",
            "",
            "Invariants enforced as tests, not just visible here",
            "(`tests/test_plans_quality.py`): no CartesianProduct outside the",
            "theta-join query, no Python eval outside the declared U-surface,",
            "broadcast joins on every fixed-size dim, pushdown/pruning on the",
            "scans, TakeOrderedAndProject for top-k, WindowGroupLimit for",
            "ranked sampling, single Exchange for stacked windows.",
            "",
            "| query | exch | joins | pushed | python |",
            "|---|---|---|---|---|",
        ]
    )
    def table(rs):
        return "\n".join(
            f"| {name} | {fp['exch']} | {fp['joins']} | {fp['pushed']} | {fp['python']} |"
            for name, fp in rs
        )

    bench_head = "\n".join(
        [
            "",
            "## Bench-only computations (bench.py EXTRA_BUILDERS)",
            "",
            "Same columns, for the pinned bench computations that are not",
            "registered queries (r9: the artifact of record's most expensive",
            "legs carry fingerprints too). `rollup_maintain_serve_v2` rows:",
            "`[serve]` is the frame the bench times (the tiered read);",
            "`[maintain-agg]` is the shared two-phase sketch aggregation the",
            "streaming maintainer plans (batch twin of the same builder —",
            "the streaming plan swaps in StateStore exec nodes); compact is",
            "a repartition+write of the live scan (no returned frame).",
            "Enforced invariants: tests/test_plans_quality.py::"
            "test_bench_only_builders_stay_jvm_side.",
            "",
            "| computation | exch | joins | pushed | python |",
            "|---|---|---|---|---|",
        ]
    )
    out = os.path.join(REPO, "PLANS.md")
    with open(out, "w") as f:
        f.write(
            head + "\n" + table(rows) + "\n" + bench_head + "\n"
            + table(bench_rows) + "\n"
        )
    print(f"# wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
