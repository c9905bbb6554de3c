#!/usr/bin/env bash
# Pre-snapshot gate: nothing ships without (1) a green full test run
# and (2) a green FULL-registry oracle sweep at sf0.01 written to a
# committed artifact. Round 4 registered two queries in the final
# commit with neither — one was wrong; this script is the mechanical
# fix. Usage: tools/snapshot_check.sh [round_number]
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:-5}"
ARTIFACT="CORRECTNESS_FULL_r0${ROUND}.json"

echo "== pytest (full suite, includes full-registry oracle check at sf0.001)"
python -m pytest tests/ -x -q

echo "== full-registry oracle sweep at sf0.01 -> ${ARTIFACT}"
python tools/oracle_check.py --json "${ARTIFACT}" /root/testdata/sf0.01

echo "== snapshot gate green: commit ${ARTIFACT} with the snapshot"
