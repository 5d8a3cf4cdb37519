"""bench.py contract smoke — the driver records BENCH_r{N}.json from
bench.py's stdout; a crash there costs the round its performance
evidence (it happened in round 2). Run the real script as a
subprocess at the smallest SF and validate the one-JSON-line
contract."""

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
    assert len(lines) == 1, out.stdout[-2000:]
    payload = json.loads(lines[0])
    assert payload["metric"] == "headline_query_mix_total"
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
    assert set(payload["spread"]) == set(payload["queries"])
    for name, sp in payload["spread"].items():
        assert sp["min"] <= sp["med"] <= sp["max"], (name, sp)
        assert payload["queries"][name] == sp["med"], (name, sp)
    # the rollup lifecycle decomposition names where its seconds go,
    # including the r9 setup phase (r8-advisor: serve must not absorb
    # the builder's pre-maintain setup)
    ph = payload["phases"]["rollup_maintain_serve_v2"]
    assert {"setup", "maintain", "compact", "serve"} <= set(ph)
