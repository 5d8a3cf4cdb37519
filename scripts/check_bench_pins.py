#!/usr/bin/env python
"""Executable form of the bench pin contract (BENCH_BASELINE.json).

The contract, stated in BENCH_BASELINE.json's comment and enforced by
eye in every round's verdict until now: each of the 13 pinned query
names must appear in the round's bench artifact running its pinned
computation, no pinned query may exceed 2x its pinned time, and the
pinned-sum total must stay <= 2x the pinned total.  Round 7 broke the
contract silently (stream_session_30m grew to 3 legs under the pinned
name); this checker makes the numeric half of the contract a command:

    python scripts/check_bench_pins.py BENCH_r08.json

Exit 0 = every pinned name present, individually under 2x, sum under
2x, and the artifact stamped comparable (load-gated by bench.py).
Exit 1 = any violation; each is printed.  Since round 9 the artifact's
per-query numbers are the MEDIAN of 3 back-to-back timed passes and
carry min/med/max spread fields (r8 measured a 20% same-head
single-pass noise floor); the checker prints each pin's spread and the
worst relative spread so the reader sees the achieved noise floor next
to the ratios.  What this CANNOT catch is a
pinned name silently re-routed to a different computation — that half
of the contract lives in bench.py (EXTRA_BUILDERS pins the verbatim
builder per name, enriched registry forms are timed under *_full
names) and is what code review must keep holding.
"""

import json
import sys


def check(baseline_path: str, bench_path: str) -> int:
    with open(baseline_path) as f:
        base = json.load(f)
    with open(bench_path) as f:
        run = json.load(f)
    if "queries" not in run and "tail" in run:
        # driver-written artifact: bench.py's one-line JSON is embedded in
        # the captured stdout tail — recover the last {"metric": ...} line
        for line in reversed(run["tail"].replace("\r", "\n").splitlines()):
            line = line.strip()
            if line.startswith('{"metric"'):
                run = json.loads(line)
                break
        else:
            print(f"VIOLATION: no bench JSON line found in {bench_path} tail")
            return 1

    pins = base["queries"]
    times = run.get("queries", {})
    spread = run.get("spread", {})  # r9 artifacts: per-query min/med/max
    problems = []

    if not run.get("comparable", False):
        problems.append(
            f"artifact not comparable (load_1m={run.get('load_1m')}): "
            "timings untrustworthy, re-run idle"
        )
    if run.get("sf") != base.get("sf"):
        problems.append(f"sf mismatch: run {run.get('sf')} vs pin {base.get('sf')}")

    pinned_sum = 0.0
    missing = 0
    rows = []
    worst_rel_spread = 0.0
    for name, pinned in sorted(pins.items()):
        got = times.get(name)
        if got is None:
            problems.append(f"pinned query missing from artifact: {name}")
            # count the missing pin at its pinned time so the printed
            # sum ratio stays a statement about the full pinned set
            # instead of silently comparing a subset against the bar
            # (the run fails regardless, via the violation above)
            pinned_sum += pinned
            missing += 1
            continue
        ratio = got / pinned
        pinned_sum += got
        sp = spread.get(name)
        rel = (sp["max"] - sp["min"]) / sp["med"] if sp and sp["med"] else None
        if rel is not None:
            worst_rel_spread = max(worst_rel_spread, rel)
        rows.append((name, pinned, got, ratio, sp, rel))
        if ratio > 2.0:
            problems.append(f"{name}: {got:.3f}s is {ratio:.2f}x its {pinned:.3f}s pin (bar 2x)")

    total_ratio = pinned_sum / base["total"] if pins else float("nan")
    if total_ratio > 2.0:
        problems.append(
            f"pinned sum {pinned_sum:.3f}s is {total_ratio:.2f}x the {base['total']:.3f}s pinned total (bar 2x)"
        )

    for name, pinned, got, ratio, sp, rel in rows:
        # rel is None when med == 0.0 (a sub-0.5ms query rounds to 0
        # at bench.py's 3-decimal resolution) — print the range alone
        spread_txt = (
            f"  [{sp['min']:.3f}-{sp['max']:.3f}"
            + (f", {rel * 100:3.0f}%]" if rel is not None else "]")
            if sp
            else ""
        )
        print(
            f"  {name:28s} {got:7.3f}s  pin {pinned:6.3f}s  {ratio:5.2f}x"
            f"{spread_txt}"
        )
    missing_txt = f", {missing} missing counted at pin" if missing else ""
    spread_txt = (
        f", worst per-query spread {worst_rel_spread * 100:.0f}% of median"
        f" over {run.get('timed_passes')} passes"
        if spread
        else " (single-pass artifact: no spread fields)"
    )
    print(
        f"pinned sum {pinned_sum:.3f}s = {total_ratio:.2f}x the {base['total']:.3f}s bar "
        f"({len(rows)}/{len(pins)} pins present{missing_txt}, "
        f"load_1m={run.get('load_1m')}{spread_txt})"
    )
    if problems:
        for p in problems:
            print(f"VIOLATION: {p}")
        return 1
    print("pin contract: OK")
    return 0


if __name__ == "__main__":
    bench = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r08.json"
    baseline = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.json"
    sys.exit(check(baseline, bench))
