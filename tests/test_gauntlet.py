"""gauntlet.sh resume contract — the ~2 h evidence chain can lose its
driving session mid-run (it happened in round 15, mid-step-3), and the
recovery used to be a hand-extracted copy of the remaining steps that
could silently drift from the script of record.  Since r15 the script
itself takes a resume-from-step argument; these tests drive the REAL
scripts/gauntlet.sh (no fork, no extraction) against a stub harness:
every child script (scale_smoke, dress_rehearsal, bench, pins, plan
audit, coverage) is replaced by a marker-writing stub and `git` by a
one-line shim, so each invocation costs ~1 s and asserts only the
orchestration — which steps ran, which were skipped, what the OK /
FAILED lines record.

Covered:
* full run executes all 7 steps and writes BENCH_<tag>.json;
* resume-from-3 skips steps 1-2 (no markers, no SCALE.md append) and
  the OK line records the resume point;
* the resume precheck: a resume whose skipped steps left no evidence
  at this tag+head fails BEFORE running anything — without it, a
  typo'd resume would write a GAUNTLET OK record certifying suites
  and artifacts that never ran anywhere (r15 review);
* resume-from-5 without the earlier invocation's bench artifact fails
  loudly instead of pinning absent bytes;
* a non-1..7 resume argument is rejected before anything runs.
"""

from __future__ import annotations

import os
import shutil
import stat
import subprocess
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GAUNTLET = os.path.join(REPO, "scripts", "gauntlet.sh")


def _write(path: str, text: str, executable: bool = False) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(textwrap.dedent(text))
    if executable:
        os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


def _stub_tree(root: str) -> None:
    """A minimal repo the real gauntlet.sh can run in: stub children
    that append to markers.log, a git shim, empty evidence files."""
    os.makedirs(os.path.join(root, "scripts"), exist_ok=True)
    shutil.copy(GAUNTLET, os.path.join(root, "scripts", "gauntlet.sh"))
    # git shim: gauntlet only needs rev-parse --short HEAD and a
    # porcelain status (empty = no reminder block)
    _write(
        os.path.join(root, "bin", "git"),
        """\
        #!/bin/sh
        case "$1" in
          rev-parse) echo stub0000;;
        esac
        exit 0
        """,
        executable=True,
    )
    mark = 'open("markers.log", "a").write('
    # bench stub is BOTH the calibration import target (await_calm does
    # `from bench import CALIB_IDLE_BAND_MS, calibrate_ms`) and the
    # step-4 subprocess; the two emitted lines honor the real two-line
    # contract (detail, then headline LAST) that the merge validates.
    _write(
        os.path.join(root, "bench.py"),
        f"""\
        import json

        CALIB_IDLE_BAND_MS = 230.0

        def calibrate_ms():
            return 1.0

        if __name__ == "__main__":
            {mark}"step4\\n")
            print(json.dumps({{"spread": {{"q": [1.0, 1.0, 1.0]}}, "phases": {{}}}}))
            print(json.dumps({{"metric": "m", "value": 1.0, "unit": "sec",
                              "queries": {{"q": 1.0}}, "load_1m": 0.1}}))
        """,
    )
    _write(
        os.path.join(root, "scripts", "scale_smoke.py"),
        f"""\
        import json
        {mark}"step1\\n")
        print(json.dumps({{"meta": "scale_smoke", "load_1m_start": 0.1}}))
        print(json.dumps({{"op": "stub", "curve": {{}}}}))
        """,
    )
    _write(
        os.path.join(root, "scripts", "check_scale_claims.py"),
        f"""\
        {mark}"claims\\n")
        print("Derived claims (stub)")
        """,
    )
    _write(
        os.path.join(root, "scripts", "dress_rehearsal.sh"),
        """\
        #!/bin/sh
        echo "suite:$1" >> markers.log
        echo "- stub suite tag=$1 rc=0" >> REHEARSAL.md
        """,
        executable=True,
    )
    # merge_bench_lines import target for the step-4 heredoc AND the
    # step-5 pin subprocess
    _write(
        os.path.join(root, "scripts", "check_bench_pins.py"),
        f"""\
        import json

        def merge_bench_lines(lines):
            out = {{}}
            for ln in lines:
                out.update(json.loads(ln))
            return out

        if __name__ == "__main__":
            {mark}"step5\\n")
            print("pin contract: OK")
        """,
    )
    _write(os.path.join(root, "scripts", "gen_plan_audit.py"), f'{mark}"step6\\n")\n')
    _write(
        os.path.join(root, "scripts", "gen_coverage.py"),
        f'{mark}"step7\\n")\nprint("stub coverage")\n',
    )
    for f in ("REHEARSAL.md", "SCALE.md"):
        _write(os.path.join(root, f), "")


def _seed_prior_evidence(root: str, tag: str, through_step: int) -> None:
    """Leave the evidence a prior invocation's steps 1..through_step
    would have left, in the exact shapes the resume precheck greps for
    (SCALE.md block header, REHEARSAL.md suite entries, bench
    artifact). HEAD is always the git-shim's stub0000."""
    if through_step >= 1:
        with open(os.path.join(root, "SCALE.md"), "a") as f:
            f.write(
                f"### Gauntlet run {tag} (2026-01-01T00:00:00Z, head "
                "stub0000; scale_smoke calm-gated at load 0.1, post-run "
                "load at append 0.2)\n"
            )
    with open(os.path.join(root, "REHEARSAL.md"), "a") as f:
        if through_step >= 2:
            f.write(
                f"- 2026-01-01T00:00:00Z tag={tag}-sf001 sf_dir=/x "
                "head=stub0000 rc=0: stub suite\n"
            )
        if through_step >= 3:
            f.write(
                f"- 2026-01-01T00:00:00Z tag={tag}-sf01 sf_dir=/x "
                "head=stub0000 rc=0: stub suite\n"
            )
    if through_step >= 4:
        _write(
            os.path.join(root, f"BENCH_{tag}.json"),
            '{"value": 1.0, "queries": {"q": 1.0}}',
        )


def _run(root: str, *args: str) -> subprocess.CompletedProcess:
    env = dict(
        os.environ,
        PATH=os.path.join(root, "bin") + os.pathsep + os.environ["PATH"],
        # never stall on this (possibly busy) machine's loadavg — the
        # stub calibrate_ms is always in band, and orchestration is
        # what's under test, not idle discipline
        GAUNTLET_CALM_BUDGET_S="0",
    )
    return subprocess.run(
        ["bash", os.path.join(root, "scripts", "gauntlet.sh"), *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )


def _markers(root: str) -> list[str]:
    p = os.path.join(root, "markers.log")
    if not os.path.exists(p):
        return []
    return [ln for ln in open(p).read().splitlines() if ln]


def test_full_run_executes_all_seven_steps(tmp_path):
    root = str(tmp_path)
    _stub_tree(root)
    res = _run(root, "t1")
    assert res.returncode == 0, res.stderr
    marks = _markers(root)
    for expected in ("step1", "suite:t1-sf001", "suite:t1-sf01", "step5", "step6", "step7"):
        assert expected in marks, (expected, marks)
    assert marks.count("step4") == 2, marks  # artifact run + same-head repeat
    assert os.path.exists(os.path.join(root, "BENCH_t1.json"))
    rehearsal = open(os.path.join(root, "REHEARSAL.md")).read()
    assert "GAUNTLET OK" in rehearsal
    assert "resumed" not in rehearsal
    # smoke block + derived claims landed in SCALE.md
    scale = open(os.path.join(root, "SCALE.md")).read()
    assert "Gauntlet run t1" in scale and "Derived claims (stub)" in scale


def test_resume_from_step_3_skips_smoke_and_sf001(tmp_path):
    root = str(tmp_path)
    _stub_tree(root)
    _seed_prior_evidence(root, "t2", 2)
    scale_before = open(os.path.join(root, "SCALE.md")).read()
    res = _run(root, "t2", "3")
    assert res.returncode == 0, res.stderr
    marks = _markers(root)
    assert "step1" not in marks and "suite:t2-sf001" not in marks, marks
    for expected in ("suite:t2-sf01", "step5", "step6", "step7"):
        assert expected in marks, (expected, marks)
    assert marks.count("step4") == 2, marks
    # skipped steps still announced, so the log keeps the 7-step shape
    assert "step 1/7: skipped (resuming from step 3)" in res.stderr
    # step 1 skipped: SCALE.md keeps only the prior invocation's block
    assert open(os.path.join(root, "SCALE.md")).read() == scale_before
    rehearsal = open(os.path.join(root, "REHEARSAL.md")).read()
    assert "resumed from step 3 — steps 1-2 ran in a prior invocation" in rehearsal


def test_resume_precheck_rejects_resume_with_no_prior_evidence(tmp_path):
    """A resume whose skipped steps left nothing at this tag+head must
    fail before running anything — the OK line would otherwise certify
    suites and a smoke that never ran anywhere."""
    root = str(tmp_path)
    _stub_tree(root)
    res = _run(root, "t6", "3")  # empty SCALE.md/REHEARSAL.md: no prior run
    assert res.returncode == 1
    assert _markers(root) == []
    rehearsal = open(os.path.join(root, "REHEARSAL.md")).read()
    assert "GAUNTLET FAILED" in rehearsal and "resume precheck" in rehearsal
    assert "GAUNTLET OK" not in rehearsal

    # step-1 evidence alone is not enough for a resume past step 2
    root2 = str(tmp_path / "two")
    os.makedirs(root2)
    _stub_tree(root2)
    _seed_prior_evidence(root2, "t7", 1)
    res = _run(root2, "t7", "3")
    assert res.returncode == 1
    assert "tag=t7-sf001" in open(os.path.join(root2, "REHEARSAL.md")).read() or (
        "resume precheck" in open(os.path.join(root2, "REHEARSAL.md")).read()
    )
    assert _markers(root2) == []


def test_resume_from_5_without_bench_artifact_fails_loudly(tmp_path):
    root = str(tmp_path)
    _stub_tree(root)
    _seed_prior_evidence(root, "t3", 3)  # steps 1-3 ran, bench did not
    res = _run(root, "t3", "5")
    assert res.returncode == 1
    marks = _markers(root)
    assert "step4" not in marks and "step5" not in marks, marks
    rehearsal = open(os.path.join(root, "REHEARSAL.md")).read()
    assert "GAUNTLET FAILED" in rehearsal and "BENCH_t3.json not found" in rehearsal


def test_resume_from_5_uses_prior_invocations_artifact(tmp_path):
    root = str(tmp_path)
    _stub_tree(root)
    _seed_prior_evidence(root, "t4", 4)
    res = _run(root, "t4", "5")
    assert res.returncode == 0, res.stderr
    marks = _markers(root)
    assert "step4" not in marks and "step5" in marks, marks


def test_rejects_out_of_range_resume_step(tmp_path):
    root = str(tmp_path)
    _stub_tree(root)
    for bad in ("0", "8", "abc", "17"):
        res = _run(root, "t5", bad)
        assert res.returncode == 2, (bad, res.stderr)
        assert "resume-from-step must be 1-7" in res.stderr
    assert _markers(root) == []
