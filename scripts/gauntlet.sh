#!/usr/bin/env bash
# One-command end-of-round gauntlet (VERDICT r8, item 3): round 7
# skipped the evidence gauntlet because it was N manual steps; this
# makes it one.  Chains, failing fast with a nonzero exit on the first
# broken step:
#
#   1. calm-gated scale_smoke        (scaling curves)             -> SCALE.md appendix
#   2. full pytest suite at sf0.01   (driver correctness scale)   -> REHEARSAL.md
#   3. full pytest suite at sf0.1    (scale rehearsal)            -> REHEARSAL.md
#   4. calm-gated bench.py, twice    (artifact + same-head repeat) -> BENCH_<tag>.json
#   5. check_bench_pins.py           (executable pin contract)
#   6. gen_plan_audit.py             (plan fingerprints)          -> PLANS.md
#   7. gen_coverage.py               (SURVEY-ID evidence map)     -> COVERAGE.md
#
# scale_smoke runs FIRST (r14 verdict item 3): in r9, r13, and twice
# in r14 a smoke that followed the ~70 min of full-width suites hit a
# post-suite machine-slow mode the loadavg gate (green at 0.11-0.15)
# provably cannot see, costing supplemental dismissal runs each time.
# Running it before the suites takes the smoke out of that window
# entirely; the calm gate (loadavg AND the fixed-work calibration
# inside its idle band) guards both timing steps against walking into
# a degraded window from the previous activity.
#
# The bench step records TWO back-to-back runs at the same head and
# appends the worst per-pin median delta to REHEARSAL.md — the
# demonstrated same-head repeatability the median-of-3 change exists
# to provide (r8 measured a 20% single-pass noise floor).  The repeat
# delta is reported, not gated: it measures the machine, not the code;
# the pin contract (step 5, <=2x bars) is what gates.
#
# Usage:   bash scripts/gauntlet.sh <round-tag> [<resume-from-step>]
#          e.g. bash scripts/gauntlet.sh r09-final
#               bash scripts/gauntlet.sh r15 3     # resume at step 3
# Output:  REHEARSAL.md / SCALE.md entries appended, BENCH_<tag>.json
#          written, PLANS.md + COVERAGE.md regenerated — all at the
#          invoking head, by this single invocation.
#
# Resume (r15): the ~2 h chain can be interrupted (the r15 run lost
# its driving session mid-step-3 and the remaining steps had to be
# replayed from a hand-extracted copy).  Passing a second argument
# skips the steps below it and runs the rest unchanged, so a resumed
# gauntlet is the SAME script, not a fork that can drift.  Resume at
# the same head the earlier steps ran at — the appended evidence all
# stamps HEAD, and a cross-head resume would mislabel it (the final
# OK line records the resume point so an auditor can line the two
# invocations up).
set -u -o pipefail
cd "$(dirname "$0")/.."

TAG="${1:?usage: bash scripts/gauntlet.sh <round-tag> [<resume-from-step>]}"
FROM_STEP="${2:-1}"
case "$FROM_STEP" in
  [1-7]) ;;
  *) echo "resume-from-step must be 1-7, got: ${FROM_STEP}" >&2; exit 2;;
esac
HEAD_SHA="$(git rev-parse --short HEAD)"
STAMP() { date -u +%Y-%m-%dT%H:%M:%SZ; }

say() { echo "[gauntlet ${TAG}] $*" >&2; }

# Step gate for resume: true when step $1 is at or past the resume
# point.  Skipped steps are announced so the log still shows the full
# 7-step shape.
should_run() {
  if [ "$1" -ge "$FROM_STEP" ]; then return 0; fi
  say "step $1/7: skipped (resuming from step ${FROM_STEP})"
  return 1
}

fail() {
  say "FAILED at step: $*"
  echo "- $(STAMP) tag=${TAG} head=${HEAD_SHA} GAUNTLET FAILED at: $*" >> REHEARSAL.md
  exit 1
}

# Wait (bounded) for a quiet machine before the timing-sensitive
# steps.  bench.py has its own gate and self-describes comparability;
# this outer gate just avoids starting scale_smoke hot.  The wait
# budget is overridable so the harness test (tests/test_gauntlet.py)
# can drive the script on a busy machine without a 10-min stall; real
# runs keep the 600 s default.
CALM_BUDGET_S="${GAUNTLET_CALM_BUDGET_S:-600}"
await_idle() {
  local waited=0
  while :; do
    local l1
    l1="$(awk '{print $1}' /proc/loadavg)"
    awk -v l="$l1" 'BEGIN{exit !(l < 0.5)}' && { say "idle (load ${l1})"; return 0; }
    [ "$waited" -ge "$CALM_BUDGET_S" ] && { say "WARN: still load ${l1} after ${CALM_BUDGET_S}s; proceeding"; return 0; }
    sleep 20; waited=$((waited + 20))
  done
}

# r15 (r14 verdict items 2-3): loadavg passed green (0.11-0.15) during
# both r14 degraded smokes, so "calm" also requires bench.calibrate_ms
# inside its idle band — the single-thread fixed-work stamp that DOES
# see the post-suite machine mode. Bounded like await_idle: a machine
# that never calms still produces the round's artifacts, which
# self-describe via their own calib stamps.
await_calm() {
  await_idle
  # One python process loops internally until in-band or budget —
  # the first cut re-spawned python (and bench's import chain) every
  # 30 s poll, paying a multi-second import on the very box being
  # measured for idleness (r15 review; rollup_ab_interleaved's
  # _await_calm already used the in-process pattern).
  local result
  result="$(GAUNTLET_CALM_BUDGET="$CALM_BUDGET_S" python - <<'PY'
import os
import sys
import time

sys.path.insert(0, ".")
from bench import CALIB_IDLE_BAND_MS, calibrate_ms

deadline = time.monotonic() + float(os.environ["GAUNTLET_CALM_BUDGET"])
while True:
    ms = calibrate_ms()
    if ms <= CALIB_IDLE_BAND_MS:
        print(f"ok:{ms}")
        break
    if time.monotonic() >= deadline:
        print(f"hot:{ms}")
        break
    time.sleep(30)
PY
)"
  case "$result" in
    ok:*) say "calib in idle band (${result#ok:} ms)";;
    hot:*) say "WARN: calib still ${result#hot:} ms after ${CALM_BUDGET_S}s budget; proceeding (artifact self-describes via its calib stamps)";;
    *) say "WARN: calm probe did not report (${result:-empty}); proceeding";;
  esac
}

# r13 verdict item 8: the gauntlet's evidence runs buy a 4x hypothesis
# example budget (tests/test_properties.py scales every max_examples;
# derandomize stays on, so the bigger budget extends the deterministic
# example prefix rather than re-rolling it). CI/default runs keep
# scale 1 for latency; measured cost here is a few minutes per suite
# leg, inside the r11-r13 wall-time band's headroom.
export VSP_HYPOTHESIS_SCALE="${VSP_HYPOTHESIS_SCALE:-4}"

# Resume precheck (r15 review): the final OK line asserts the skipped
# steps ran "in a prior invocation at the same head" — so before
# running anything, verify each skipped step actually left its
# evidence at THIS tag and THIS head.  Without this, a typo'd resume
# (wrong tag, wrong head, no prior run at all) would write a GAUNTLET
# OK record certifying suites and artifacts that never ran anywhere.
if [ "$FROM_STEP" -gt 1 ]; then
  say "resume precheck: verifying steps 1-$((FROM_STEP - 1)) evidence (tag ${TAG}, head ${HEAD_SHA})"
  grep -Eq "^### Gauntlet run ${TAG} \(.*head ${HEAD_SHA}" SCALE.md \
    || fail "resume precheck: no step-1 scale_smoke block for tag ${TAG} at head ${HEAD_SHA} in SCALE.md"
fi
if [ "$FROM_STEP" -gt 2 ]; then
  grep -Eq "tag=${TAG}-sf001 .*head=${HEAD_SHA} rc=0" REHEARSAL.md \
    || fail "resume precheck: no step-2 sf0.01 suite entry for tag ${TAG}-sf001 at head ${HEAD_SHA} in REHEARSAL.md"
fi
if [ "$FROM_STEP" -gt 3 ]; then
  grep -Eq "tag=${TAG}-sf01 .*head=${HEAD_SHA} rc=0" REHEARSAL.md \
    || fail "resume precheck: no step-3 sf0.1 suite entry for tag ${TAG}-sf01 at head ${HEAD_SHA} in REHEARSAL.md"
fi
if [ "$FROM_STEP" -gt 4 ]; then
  [ -f "BENCH_${TAG}.json" ] \
    || fail "resume precheck: BENCH_${TAG}.json not found (step 4 evidence missing)"
fi

# One appender for both SCALE.md block generations — the step-1 smoke
# and the optional x64 stage (r15 review: the two verbatim copies meant
# the r13-item-6 header-labeling fix had to be mirrored by hand, the
# exact drift class check_scale_claims' two-generation header regex
# exists to absorb).  $1 = kind (smoke|x64), $2 = run log, $3 = tag
# suffix ("" | "-x64").
#
# Header labeling (r13 verdict item 6): the old header sampled
# /proc/loadavg AFTER the run finished ("load at start 9.35" — our own
# just-ended executor threads), while the GOVERNING gate is the
# script's internal one (bench._await_quiet_machine, stamped as
# load_1m_start in the log's first JSON line). Print both, labeled, so
# an idle-discipline auditor reads the in-script gate value first.
#
# Derived claims (r12 verdict item 2): the monotonicity/skew/bound
# claims are DERIVED from the raw block just appended (outliers named
# with load context), so the committed summary can never again
# contradict its own appendix the way the r12 hand prose did
# ("flat-or-falling everywhere" over a 12x quality_score spike
# recorded 400 lines below it).
append_scale_block() {
  local kind="$1" log="$2" suffix="$3" unit desc gate_load claims
  case "$kind" in
    smoke) unit="op"; desc="the curated tables above interpret these";;
    x64)   unit="leg"; desc="design bounds stamped next to the walls";;
  esac
  gate_load="$(python - "$log" <<'PY' || true
import json, sys
for ln in open(sys.argv[1]):
    ln = ln.strip()
    if ln.startswith("{"):
        o = json.loads(ln)
        if "load_1m_start" in o:
            print(o["load_1m_start"]); break
PY
)"
  {
    echo ""
    echo "### Gauntlet run ${TAG}${suffix} ($(STAMP), head ${HEAD_SHA}; scale_${kind} calm-gated at load ${gate_load:-n/a}, post-run load at append $(awk '{print $1}' /proc/loadavg))"
    echo ""
    echo "Raw scale_${kind} output (one JSON line per ${unit}; appended verbatim by"
    echo "scripts/gauntlet.sh — ${desc}):"
    echo ""
    echo '```json'
    cat "$log"
    echo '```'
  } >> SCALE.md
  claims="$(python scripts/check_scale_claims.py SCALE.md --tag "${TAG}${suffix}")" \
    || return 1
  { echo ""; echo "$claims"; } >> SCALE.md
  say "scale_${kind} appended to SCALE.md ($(wc -l < "$log") JSON lines) + derived claims"
}

if should_run 1; then
  say "step 1/7: scale_smoke (calm-gated; BEFORE the full-width suites — r14 verdict item 3)"
  await_calm
  SMOKE_LOG="$(mktemp /tmp/scale_smoke_${TAG}_XXXX.log)"
  python scripts/scale_smoke.py > "$SMOKE_LOG" 2>/tmp/scale_smoke_stderr.log \
    || fail "scale_smoke (stderr: /tmp/scale_smoke_stderr.log)"
  append_scale_block smoke "$SMOKE_LOG" "" || fail "check_scale_claims"
fi

if should_run 2; then
  say "step 2/7: pytest at sf0.01 (hypothesis scale ${VSP_HYPOTHESIS_SCALE})"
  VSP_TEST_SF_DIR=/root/testdata/sf0.01 bash scripts/dress_rehearsal.sh "${TAG}-sf001" \
    || fail "pytest sf0.01"
fi

if should_run 3; then
  say "step 3/7: pytest at sf0.1 (hypothesis scale ${VSP_HYPOTHESIS_SCALE})"
  VSP_TEST_SF_DIR=/root/testdata/sf0.1 bash scripts/dress_rehearsal.sh "${TAG}-sf01" \
    || fail "pytest sf0.1"
fi

# Defined outside the step guard: step 5 and the final OK line name the
# artifact even when a resume skips step 4.
BENCH_OUT="BENCH_${TAG}.json"

if should_run 4; then
  say "step 4/7: bench.py twice (calm-gated; artifact + same-head repeat)"
  await_calm
  BENCH_RAW="$(mktemp /tmp/bench_${TAG}_raw_XXXX.out)"
  python bench.py 2>/tmp/bench_${TAG}_a.stderr > "$BENCH_RAW" \
    || fail "bench.py first run"
  # bench.py emits a detail line (spread/phases) then a compact headline
  # line LAST (guaranteed to fit the driver's 2000-char tail capture,
  # trailing newline included — r9's single fat line truncated there).
  # The committed artifact of record merges both via the same helper the
  # pin checker's tail recovery uses (one merge implementation, no
  # drift), keeping the r8/r9 one-object shape.
  python - "$BENCH_RAW" "$BENCH_OUT" <<'PY' || fail "bench artifact merge"
import json, sys
sys.path.insert(0, "scripts")
from check_bench_pins import merge_bench_lines
lines = [l for l in open(sys.argv[1]).read().splitlines() if l.strip()]
# unconditional exits, not asserts: PYTHONOPTIMIZE would strip asserts
# and silently ship a truncatable artifact (r10 advisor)
if len(lines[-1]) + 1 > 2000:
    sys.exit(
        f"final bench line {len(lines[-1])} chars: with its newline it "
        "overflows the driver's 2000-char tail window"
    )
head = merge_bench_lines(lines)
if head is None:
    sys.exit("no parseable headline line in bench stdout")
if "spread" not in head or "phases" not in head:
    sys.exit("detail line missing/unmerged")
json.dump(head, open(sys.argv[2], "w"))
PY
  python -c "import json;json.load(open('$BENCH_OUT'))" || fail "bench artifact not valid JSON"
  REPEAT_OUT="$(mktemp /tmp/bench_${TAG}_repeat_XXXX.json)"
  python bench.py 2>/tmp/bench_${TAG}_b.stderr | tail -1 > "$REPEAT_OUT" \
    || fail "bench.py repeat run"
  REPEAT_LINE="$(python - "$BENCH_OUT" "$REPEAT_OUT" <<'PY'
import json, sys
a = json.load(open(sys.argv[1])); b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
deltas = {k: abs(qb[k] - qa[k]) / qa[k] for k in qa if k in qb and qa[k] > 0}
worst = max(deltas, key=deltas.get)
print(
    f"same-head bench repeat: total {a['value']:.3f}s vs {b['value']:.3f}s "
    f"({abs(b['value']-a['value'])/a['value']*100:.1f}% delta), "
    f"worst per-query median delta {deltas[worst]*100:.1f}% ({worst}), "
    f"loads {a.get('load_1m')}/{b.get('load_1m')}"
)
PY
)" || fail "repeat comparison"
  echo "- $(STAMP) tag=${TAG} head=${HEAD_SHA} rc=0: ${REPEAT_LINE}" >> REHEARSAL.md
  say "$REPEAT_LINE"
fi

if should_run 5; then
  # A resume that lands here without step 4 must find the artifact the
  # earlier invocation wrote — pinning a stale or absent file would
  # certify the wrong bytes.
  [ -f "$BENCH_OUT" ] || fail "check_bench_pins: ${BENCH_OUT} not found (resume from step ${FROM_STEP} expects the earlier invocation's step 4 to have written it)"
  say "step 5/7: check_bench_pins"
  PINS_LOG="$(mktemp /tmp/pins_${TAG}_XXXX.log)"
  python scripts/check_bench_pins.py "$BENCH_OUT" | tee "$PINS_LOG" \
    || fail "pin contract on ${BENCH_OUT}"
  # the classified cross-round verdict (r10 verdict item 1: the r10-vs-r9
  # "regression" took a human four artifacts to dismiss as cross-process
  # noise; the classifier's one-liner is the mechanical record of that
  # dismissal — or the loud pointer when a delta really is code)
  XROUND_LINE="$(grep '^cross-round' "$PINS_LOG" | tail -1 || true)"
  if [ -n "$XROUND_LINE" ]; then
    echo "- $(STAMP) tag=${TAG} head=${HEAD_SHA} rc=0: ${XROUND_LINE}" >> REHEARSAL.md
    say "$XROUND_LINE"
  fi
fi

if should_run 6; then
  say "step 6/7: gen_plan_audit -> PLANS.md"
  python scripts/gen_plan_audit.py 2>/tmp/plan_audit_${TAG}.stderr || fail "gen_plan_audit"
fi

if should_run 7; then
  say "step 7/7: gen_coverage -> COVERAGE.md"
  python scripts/gen_coverage.py > COVERAGE.md || fail "gen_coverage"
fi

# Optional x64 stateful-leg stage (r14 verdict item 8): repeatable
# re-verification of the design bounds (rollup state bound, session
# slice histograms, LSH bucket dispersion) whenever the stateful
# legs' code changes — opt-in because it adds ~20-30 min.
if [ "${SPARK_GRAFT_GAUNTLET_X64:-0}" = "1" ]; then
  say "optional step: scale_x64 (calm-gated; SPARK_GRAFT_GAUNTLET_X64=1)"
  await_calm
  X64_LOG="$(mktemp /tmp/scale_x64_${TAG}_XXXX.log)"
  python scripts/scale_x64.py > "$X64_LOG" 2>/tmp/scale_x64_stderr.log \
    || fail "scale_x64 (stderr: /tmp/scale_x64_stderr.log)"
  append_scale_block x64 "$X64_LOG" "-x64" || fail "check_scale_claims (x64)"
fi

# End-of-round artifact rule (r11 verdict item 3): evidence artifacts
# must be COMMITTED before judging — the judge and the cross-round
# classifier auto-discover "the previous artifact" by filename, and an
# uncommitted refresh that differs from the committed bytes makes two
# readers classify different data under one label (r11's spurious
# cross-artifact `code` flags). Loud reminder, not a gate: the gauntlet
# itself just produced new artifacts that the builder commits next.
UNCOMMITTED="$(git status --porcelain -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' LEAKCHECK.json COPYCHECK.json 2>/dev/null || true)"
if [ -n "$UNCOMMITTED" ]; then
  say "REMINDER: commit these evidence artifacts before the round is judged:"
  echo "$UNCOMMITTED" >&2
fi
# ...and the same check is the FIRST action of the NEXT round (README,
# round-START corollary): the driver writes its refresh after the
# round's last commit, so next round's builder commits it before any
# code change.

RESUME_NOTE=""
if [ "$FROM_STEP" -gt 1 ]; then
  RESUME_NOTE="; resumed from step ${FROM_STEP} — steps 1-$((FROM_STEP - 1)) ran in a prior invocation at the same head (evidence verified by the resume precheck)"
fi
echo "- $(STAMP) tag=${TAG} head=${HEAD_SHA} rc=0: GAUNTLET OK (suite sf0.01 + sf0.1 green, scale_smoke appended, ${BENCH_OUT} written + pins OK, PLANS.md + COVERAGE.md regenerated${RESUME_NOTE})" >> REHEARSAL.md
say "OK — all 7 steps green${RESUME_NOTE}"
