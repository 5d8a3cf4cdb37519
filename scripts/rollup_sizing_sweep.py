#!/usr/bin/env python
"""Store-count sweep for the rollup maintainer's state sizing (r12
verdict item 1): measure maintain WALL and state-commit I/O as a
function of the state-store count at fixed data (the bench fixture's
staged 4-file events source at $SPARK_GRAFT_SF_DIR), so the
wall-vs-commit-I/O trade the auto_est estimator navigates is a
MEASURED curve, not an inference from cross-round artifacts.

Why this exists: the occupancy estimator (`estimate_open_groups`)
derives 6 stores on the bench fixture where the static default is 8 —
halving state-commit I/O (the fsync axis) but showing a consistently
slower total wall in all three r12-era artifacts. The curve this
script prints decides whether that trade is real (a U-shaped wall with
its minimum above the commit-I/O minimum) and where the wall-optimal
count sits for THIS machine's fsync regime.

Method per store count: one warm lifecycle pass (codegen/JIT + source
staging via bench's memo), then N timed passes (default 3) of the full
lifecycle (maintain + compact + serve noop write — bench.py's exact
timed unit, same builder); the median pass's phase decomposition and
summed state-store commitTimeMs are recorded next to the wall median.

Usage: python scripts/rollup_sizing_sweep.py [--fsync-stress] [stores ...]
       (default sweep: 4 6 8 12 16)
Prints one JSON line per store count plus a final summary line; the
curated table lands in SCALE.md.

--fsync-stress (r14 verdict item 4): runs the timed passes with a
background fsync hammer on the same filesystem as the checkpoints —
the deliberate degraded-window data point. BENCH_r14_CONTROL_DIAG
observed that in fsync-degraded windows fewer/fatter stores
CONCENTRATE per-commit latency (auto_est 6.6 s/store vs auto's 1.4),
which means the quiet-window 6-8 wall plateau may invert when the
disk is slow; this flag measures that regime on purpose instead of
waiting to catch it by accident. The hammer's own achieved fsync
latency is stamped in the output so "how degraded" is in the
artifact.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import bench  # noqa: E402  (the bench builders ARE the measured unit)


class _FsyncHammer:
    """Background fsync-pressure inducer: N threads each rewriting and
    fsyncing a small file in a tight loop on the target filesystem.
    Small files + fsync is exactly the state-store delta-commit I/O
    shape, so the induced contention degrades the same queue the
    maintainer's commits sit in. Tracks its own per-fsync latency so
    the artifact records the achieved degradation, not just the
    intent."""

    def __init__(self, dirpath: str, threads: int = 4):
        self._dir = dirpath
        self._stop = threading.Event()
        self._lat_ms: list[float] = []
        self._lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._loop, args=(i,), daemon=True)
            for i in range(threads)
        ]

    def _loop(self, i: int) -> None:
        payload = os.urandom(64 * 1024)
        path = os.path.join(self._dir, f"stress_{i}.bin")
        while not self._stop.is_set():
            t0 = time.perf_counter()
            with open(path, "wb") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            with self._lock:
                self._lat_ms.append((time.perf_counter() - t0) * 1000)

    def __enter__(self) -> "_FsyncHammer":
        for t in self._threads:
            t.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=10)

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._lat_ms)
        if not lat:
            return {"fsyncs": 0}
        return {
            "fsyncs": len(lat),
            "fsync_p50_ms": round(lat[len(lat) // 2], 2),
            "fsync_p99_ms": round(lat[int(len(lat) * 0.99)], 2),
        }


def run_once(spark, sf_dir: str, stores: int) -> dict:
    t0 = time.perf_counter()
    df = bench._rollup_maintain_serve(spark, sf_dir, state_partitions=stores)
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 3)
    phases = dict(bench._ROLLUP_PHASES)
    eager = round(sum(phases.values()), 3)
    phases["serve"] = round(max(wall - eager, 0.0), 3)
    return {
        "wall": wall,
        "commit_io_s": bench._ROLLUP_COMMIT_S[0],
        "observed_stores": bench._ROLLUP_SIZING[0][0],
        **phases,
    }


def main() -> None:
    argv = list(sys.argv[1:])
    fsync_stress = "--fsync-stress" in argv
    if fsync_stress:
        argv.remove("--fsync-stress")
    sweep = [int(a) for a in argv] or [4, 6, 8, 12, 16]
    n_timed = int(os.environ.get("SWEEP_PASSES", "3"))
    load_1m, comparable = bench._await_quiet_machine()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from video_stream_processor_spark.streaming.rollup import (
        MIN_DERIVED_STATE_STORES,
        SIZING_SWEEP_CPUS,
    )

    cpus = os.cpu_count()
    if cpus != SIZING_SWEEP_CPUS:
        # r13 verdict item 5: the floor's U-curve (and therefore
        # MIN_DERIVED_STATE_STORES) was measured on a specific machine
        # class — the low-side parallelism-loss knee moves with core
        # count, so a sweep on a different box is a NEW measurement,
        # not a comparison against the stamped one.
        print(
            json.dumps(
                {
                    "warning": "machine-class mismatch",
                    "detail": (
                        f"this box has {cpus} CPUs; the stamped sweep "
                        f"behind MIN_DERIVED_STATE_STORES="
                        f"{MIN_DERIVED_STATE_STORES} ran on "
                        f"{SIZING_SWEEP_CPUS} (SCALE.md r13 block). "
                        "Treat this run as a fresh measurement and "
                        "re-derive the floor; update SIZING_SWEEP_CPUS "
                        "when adopting it."
                    ),
                }
            ),
            flush=True,
        )

    from video_stream_processor_spark.session import get_spark

    spark = get_spark(app_name="vsp-sizing-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[int, dict] = {}
    for stores in sweep:
        run_once(spark, sf_dir, stores)  # warm (also stages the source)
        if fsync_stress:
            # the stress dir lives inside bench's scratch root, which
            # is where the checkpoints live too — same filesystem,
            # same fsync queue (the whole point); hammer runs ONLY
            # around the timed passes, fresh per store count so the
            # achieved degradation is stamped per point
            stress_dir = tempfile.mkdtemp(
                prefix="fsync_stress_", dir=bench._tmp_root()
            )
            with _FsyncHammer(stress_dir) as hammer:
                passes = [
                    run_once(spark, sf_dir, stores) for _ in range(n_timed)
                ]
            hammer_stats = hammer.stats()
        else:
            passes = [run_once(spark, sf_dir, stores) for _ in range(n_timed)]
        med = sorted(passes, key=lambda r: r["wall"])[len(passes) // 2]
        med["spread"] = {
            "min": min(r["wall"] for r in passes),
            "max": max(r["wall"] for r in passes),
        }
        if fsync_stress:
            med["fsync_stress"] = hammer_stats
        results[stores] = med
        print(json.dumps({"stores": stores, **med}), flush=True)

    by_wall = min(results, key=lambda s: results[s]["wall"])
    by_cio = min(results, key=lambda s: results[s]["commit_io_s"])
    print(
        json.dumps(
            {
                "metric": "rollup_sizing_sweep",
                "sf_dir": sf_dir,
                "timed_passes": n_timed,
                "load_1m": load_1m,
                "comparable": comparable,
                "fsync_stress": fsync_stress,
                "wall_optimal_stores": by_wall,
                "commit_io_optimal_stores": by_cio,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
