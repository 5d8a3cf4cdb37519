#!/usr/bin/env bash
# Pre-driver dress rehearsal (VERDICT r3, item 3): run the FULL pytest
# suite at the driver's own correctness scale (sf0.01) instead of the
# default fast sf0.001, so fixture drift or scale-sensitive failures
# surface in our own run before the driver's CORRECTNESS pass does.
#
# Usage:   bash scripts/dress_rehearsal.sh [round-tag]
# Output:  REHEARSAL.md gains one dated entry with the pytest summary
#          line and exit code; nonzero exit propagates.
set -u
cd "$(dirname "$0")/.."

TAG="${1:-adhoc}"
SF="${VSP_TEST_SF_DIR:-/root/testdata/sf0.01}"
LOG="$(mktemp /tmp/rehearsal_XXXX.log)"

echo "# rehearsal: pytest at ${SF} (tag ${TAG}) ..." >&2
VSP_TEST_SF_DIR="$SF" python -m pytest tests/ -q >"$LOG" 2>&1
RC=$?
SUMMARY="$(grep -E '^[0-9]+ (passed|failed)|passed|failed|error' "$LOG" | tail -1)"
HEAD_SHA="$(git rev-parse --short HEAD)"

{
  echo "- $(date -u +%Y-%m-%dT%H:%M:%SZ) tag=${TAG} sf_dir=${SF} head=${HEAD_SHA} rc=${RC}: ${SUMMARY}"
} >> REHEARSAL.md

echo "# rehearsal rc=${RC}: ${SUMMARY} (full log: ${LOG})" >&2
exit $RC
