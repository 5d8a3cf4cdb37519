"""bench.py contract smoke — the driver records BENCH_r{N}.json from
bench.py's stdout; a crash there costs the round its performance
evidence (it happened in round 2). Run the real script as a
subprocess at the smallest SF and validate the two-line contract
(r10): a detail line (spread/phases), then a compact headline line
LAST that must fit the driver wrapper's 2000-char tail capture —
r9's single fat line truncated there and the driver's artifact
refresh recorded "parsed": null."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        # the smoke validates the contract, not timings — never wait
        # for a quiet machine here
        SPARK_GRAFT_BENCH_MAX_WAIT_S="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 2, out.stdout[-2000:]
    detail = json.loads(lines[0])
    payload = json.loads(lines[1])
    assert payload["metric"] == "headline_query_mix_total"
    assert detail["metric"] == "headline_query_mix_detail"
    # the final line is what the driver's ~2000-char tail capture must
    # parse (window includes the trailing newline); a driver-style
    # tail of the whole stdout must recover it
    assert len(lines[1]) + 1 <= 2000, len(lines[1])
    tail = out.stdout[-2000:]
    recovered = [
        ln for ln in tail.splitlines()
        if ln.startswith('{"metric": "headline_query_mix_total"')
    ]
    assert recovered and json.loads(recovered[-1]) == payload
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert isinstance(payload["value"], float)
    assert payload["queries"] and all(
        isinstance(v, float) for v in payload["queries"].values()
    )
    assert {"load_1m", "comparable"} <= set(payload)
    # r9: per-query noise-floor fields — 3 timed passes, min<=med<=max
    # per query, and the headline per-query number IS the median
    assert payload["timed_passes"] == 3
    assert set(detail["spread"]) == set(payload["queries"])
    for name, sp in detail["spread"].items():
        assert sp["min"] <= sp["med"] <= sp["max"], (name, sp)
        assert payload["queries"][name] == sp["med"], (name, sp)
    # the rollup lifecycle decomposition names where its seconds go,
    # including the r9 setup phase (r8-advisor: serve must not absorb
    # the builder's pre-maintain setup) and the r10 commit-I/O axis
    # (summed stateOperators commitTimeMs — separates an fsync regime
    # shift from a code regression); the compact headline carries the
    # same commit_io_s numbers for driver-side refreshes
    for leg in (
        "rollup_maintain_serve_v2",
        "rollup_maintain_serve_v2_sized",
        "rollup_maintain_serve_v2_auto",
    ):
        ph = detail["phases"][leg]
        assert {"setup", "maintain", "compact", "serve", "commit_io_s"} <= set(ph)
        # commitTimeMs is an integer-ms counter per store per batch;
        # the sized/auto legs' few stores could in principle all
        # report 0 on sub-ms storage, so only require non-negative
        # there — the 32-store default leg's 256 commits per drain are
        # reliably measurable on this container (r9 probe: ~80 s)
        assert ph["commit_io_s"] >= 0, (leg, ph)
        assert payload["commit_io_s"][leg] == ph["commit_io_s"], (leg, ph)
    assert detail["phases"]["rollup_maintain_serve_v2"]["commit_io_s"] > 0


def test_merge_bench_lines_recovery_shapes():
    """The one shared merge implementation behind both the gauntlet
    artifact and the driver-tail recovery (r10 review: two diverging
    copies): headline+detail merge, headline-only tails, mid-object
    cut detail lines, and the no-headline failure mode."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from check_bench_pins import merge_bench_lines

    detail = json.dumps(
        {
            "metric": "headline_query_mix_detail",
            "spread": {"q1": {"min": 1, "med": 2, "max": 3}},
            "phases": {"leg": {"maintain": 1.0, "commit_io_s": 0.5}},
        }
    )
    head = json.dumps(
        {"metric": "headline_query_mix_total", "value": 2.0, "queries": {"q1": 2}}
    )

    merged = merge_bench_lines([detail, head])
    assert merged["value"] == 2.0
    assert merged["spread"]["q1"]["med"] == 2
    assert merged["phases"]["leg"]["commit_io_s"] == 0.5

    # headline only (the common driver-tail case): no spread/phases keys
    only = merge_bench_lines(["some noise", head])
    assert only["value"] == 2.0 and "spread" not in only

    # detail cut mid-object by the tail window: skipped, not a crash
    cut = merge_bench_lines([detail[:80], head])
    assert cut["value"] == 2.0 and "spread" not in cut

    # headline cut mid-object, earlier intact headline recovered
    assert merge_bench_lines([head, head[:40]])["value"] == 2.0

    # nothing parseable -> None (checker prints its VIOLATION path)
    assert merge_bench_lines([detail, '{"metric": "headline_query_mix_total'] ) is None
