#!/usr/bin/env python
"""Same-window interleaved A/B of the two shipped rollup lifecycle
legs (r14 verdict item 1): auto_est (the shipped default) vs sized
(the hand-sized twin).

Why this exists: the r13 done-bar "auto_est wall <= the old auto leg"
stayed open through r14 because every comparison crossed bench
windows on a machine whose own artifacts prove the windows aren't
comparable — the r14 window carried a +13.3% mix-wide shift at
identical code, and the supplemental same-window attempt
(BENCH_r14_CONTROL_DIAG.json) landed in an fsync-degraded mode with
4-5x per-store commit latency. Cross-window deltas on this box are
machine evidence first.

What it does instead: runs the two legs INTERLEAVED inside one
process — pass pairs in alternating order (A,B / B,A / A,B) so slow
window drift cancels within each pair rather than accumulating on
one side — after the same warm passes bench.py uses, gated on
load AND on bench.calibrate_ms being inside its idle band, with a
calibration stamp before every pair and at the end so the window is
self-described. Medians-of-3 per leg plus the per-pass walls,
phase decompositions, and summed state-store commit I/O (the axis
the design argument lives on: fewer stores -> less commit I/O).

Either outcome closes the item: auto_est <= sized on the same-window
wall, or a stamped same-window result that it isn't — with the
commit-I/O axis printed next to the walls so the governing axis is
in the artifact, not in prose.

Builders, staging, phases, and the commit-I/O accounting are
bench.py's own (`_rollup_maintain_serve`, `EXTRA_BUILDERS`) — this
script adds only the interleaving and the artifact shape, so the
legs here ARE the legs in BENCH_r*.json.

Usage: python scripts/rollup_ab_interleaved.py [TAG]
Writes BENCH_<TAG>_AB.json (default TAG r15) in the repo root and
prints the artifact JSON to stdout (one line, the driver-safe shape).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import bench  # noqa: E402
from bench import (  # noqa: E402
    CALIB_IDLE_BAND_MS,
    EXTRA_BUILDERS,
    _await_quiet_machine,
    calibrate_ms,
)
from video_stream_processor_spark.session import get_spark  # noqa: E402

#: (artifact key, builder name) — A is the shipped default, B the
#: hand-sized twin it is measured against.
LEG_A = "rollup_maintain_serve_v2_auto_est"
LEG_B = "rollup_maintain_serve_v2_sized"

#: Timed pairs. Order alternates (A,B / B,A / A,B) so a monotone
#: window drift contributes symmetrically to both legs' medians.
PAIRS = 3


def _await_calm() -> tuple[float, bool, float]:
    """(load_1m, comparable, calib_ms): bench's load gate, then the
    calibration gate — the r14 degraded windows passed the load gate
    at 0.11-0.15, so 'calm' here means both axes agree."""
    load_1m, comparable = _await_quiet_machine()
    waited, max_wait = 0.0, float(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "300")
    )
    while True:
        ms = calibrate_ms()
        if ms <= CALIB_IDLE_BAND_MS or waited >= max_wait:
            return load_1m, comparable and ms <= CALIB_IDLE_BAND_MS, ms
        print(
            f"# calib {ms} ms > idle band {CALIB_IDLE_BAND_MS}: waiting "
            f"({waited:.0f}/{max_wait:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(20)
        waited += 20


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    load_1m, comparable, calib_gate_ms = _await_calm()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vsp-rollup-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> dict:
        t0 = time.perf_counter()
        EXTRA_BUILDERS[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.perf_counter() - t0, 3)
        ph = dict(bench._ROLLUP_PHASES)
        eager = round(sum(ph.values()), 3)
        stores, open_groups = bench._ROLLUP_SIZING[0]
        return {
            "wall": wall,
            **ph,
            "serve": round(max(wall - eager, 0.0), 3),
            "commit_io_s": bench._ROLLUP_COMMIT_S[0],
            "state_stores": stores,
            **(
                {"open_groups": open_groups}
                if open_groups is not None
                else {}
            ),
            **(
                {"open_groups_src": bench._ROLLUP_EST_SRC[0]}
                if bench._ROLLUP_EST_SRC[0] is not None
                else {}
            ),
        }

    # same warm discipline as bench.py: codegen + JIT settle once, and
    # the auto_est leg's estimate gets computed+cached so every timed
    # pass reads it (the shipped steady state)
    for _ in range(2):
        for name in (LEG_A, LEG_B):
            run(name)

    passes: dict[str, list[dict]] = {LEG_A: [], LEG_B: []}
    pair_calibs: list[float] = []
    for i in range(PAIRS):
        pair_calibs.append(calibrate_ms())
        order = (LEG_A, LEG_B) if i % 2 == 0 else (LEG_B, LEG_A)
        for name in order:
            passes[name].append(run(name))

    def med(leg: str, key: str) -> float:
        vals = sorted(p[key] for p in passes[leg])
        return vals[len(vals) // 2]

    wall_a, wall_b = med(LEG_A, "wall"), med(LEG_B, "wall")
    cio_a, cio_b = med(LEG_A, "commit_io_s"), med(LEG_B, "commit_io_s")
    calib_end = calibrate_ms()
    in_band = all(
        ms <= CALIB_IDLE_BAND_MS for ms in [*pair_calibs, calib_end]
    )
    artifact = {
        "metric": "rollup_ab_interleaved",
        "tag": tag,
        "sf_dir": sf_dir,
        "pairs": PAIRS,
        "order": "alternating (A,B / B,A / A,B)",
        "legs": {
            LEG_A: {
                "role": "A (shipped default)",
                "wall_med": wall_a,
                "commit_io_med": cio_a,
                "passes": passes[LEG_A],
            },
            LEG_B: {
                "role": "B (hand-sized twin)",
                "wall_med": wall_b,
                "commit_io_med": cio_b,
                "passes": passes[LEG_B],
            },
        },
        "wall_ratio_a_over_b": round(wall_a / wall_b, 3) if wall_b else None,
        "commit_io_ratio_a_over_b": (
            round(cio_a / cio_b, 3) if cio_b else None
        ),
        "auto_est_wall_le_sized": wall_a <= wall_b,
        "load_1m": load_1m,
        "comparable": comparable,
        "calib_ms": calib_gate_ms,
        "calib_ms_pairs": pair_calibs,
        "calib_ms_end": calib_end,
        "calib_band_ms": CALIB_IDLE_BAND_MS,
        "same_window_verified": in_band,
    }
    out_path = os.path.join(_REPO, f"BENCH_{tag}_AB.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(json.dumps(artifact))
    print(f"# written: {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
