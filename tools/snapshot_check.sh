#!/usr/bin/env bash
# Pre-snapshot gate: nothing ships without (1) a green full test run,
# (2) a green FULL-registry oracle sweep at sf0.01, (3) the same
# sweep at sf0.1, and (4) the streaming stream≡batch equivalence
# sweep — all written to committed artifacts. Round 4 registered two
# queries in the final commit with neither (one was wrong); round 5
# ran the sf0.1 sweep ad hoc and it is exactly the scale class that
# exposed the r4 centroid rounding bug; round 6's verdict flagged
# that the speed layer had NO per-round evidence trail, so the
# streaming sweep (r7) is part of the gate too.
# Usage: tools/snapshot_check.sh [round]
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:-7}"
ARTIFACT="CORRECTNESS_FULL_r0${ROUND}.json"
ARTIFACT_SF01="CORRECTNESS_FULL_r0${ROUND}_sf0.1.json"
ARTIFACT_STREAM="STREAMING_r0${ROUND}.json"

echo "== pytest (full suite, includes full-registry oracle check at sf0.001)"
python -m pytest tests/ -x -q

echo "== full-registry oracle sweep at sf0.01 -> ${ARTIFACT}"
python tools/oracle_check.py --json "${ARTIFACT}" /root/testdata/sf0.01

echo "== full-registry oracle sweep at sf0.1 -> ${ARTIFACT_SF01}"
python tools/oracle_check.py --json "${ARTIFACT_SF01}" /root/testdata/sf0.1

echo "== streaming stream≡batch sweep -> ${ARTIFACT_STREAM}"
python tools/streaming_check.py --json "${ARTIFACT_STREAM}"

echo "== registry-wide plan lint -> PLANAUDIT.json"
python tools/plan_audit.py --json PLANAUDIT.json

echo "== snapshot gate green: commit ${ARTIFACT} + ${ARTIFACT_SF01} + ${ARTIFACT_STREAM}"
