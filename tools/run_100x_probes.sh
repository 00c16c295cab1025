#!/bin/bash
# One fresh process per query (same-JVM probes contaminate via leftover
# localCheckpoint blocks). Sequential on purpose: probes are timing runs.
# Failures are VISIBLE: each query's exit status is checked and a
# FAILED/TIMEOUT line printed (timeout(1) exits 124 on expiry); stderr
# goes to a per-run log instead of /dev/null so crashes are diagnosable.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
FACTOR="${CDA_PROBE_FACTOR:-100}"
LOG="${PROBE_LOG:-/tmp/probe${FACTOR}x.stderr.log}"
LIMIT="${PROBE_TIMEOUT:-3000}"
cd "$REPO" || exit 1
for q in "$@"; do
  timeout "$LIMIT" env CDA_PROBE_FACTOR="$FACTOR" \
    python tools/probe10x.py "$q" 2>>"$LOG"
  rc=$?
  if [ "$rc" -eq 124 ]; then
    echo "PROBE $q: TIMEOUT (>${LIMIT}s)"
  elif [ "$rc" -ne 0 ]; then
    echo "PROBE $q: FAILED (exit $rc; see $LOG)"
  fi
done
