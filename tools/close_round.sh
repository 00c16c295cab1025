#!/bin/bash
# Atomic round close-out (round-7/8 verdict item: the committed close-out
# claims and the working tree must agree). Regenerates every derived
# artifact, re-runs the full contract gate, refreshes the bench snapshot,
# and commits ALL of it in one snapshot commit whose message quotes the
# contract RESULT line. After this script, `git status` is clean.
set -u
set -o pipefail  # a failed `bench.py | tail` must abort, not take tail's rc
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO" || exit 1

echo "== render generated blocks"
python tools/render_probes.py || exit 1
python tools/render_rows_only.py || exit 1

echo "== full contract gate (every registry entry vs DuckDB at sf0.01)"
# stderr is Spark progress-bar noise whose \r can glue onto the RESULT
# line — discard it and match RESULT anywhere, not just line-start
CONTRACT_OUT=$(python tools/drive_contract.py 2>/dev/null | tail -20)
RESULT_LINE=$(echo "$CONTRACT_OUT" | grep -o "RESULT:.*" | tail -1)
echo "$CONTRACT_OUT" | tail -3
if [ -z "$RESULT_LINE" ]; then
  echo "close_round: contract run produced no RESULT line; aborting" >&2
  exit 1
fi
# the RESULT line must actually report a PASS — a run with mismatches or
# errors must not be committed as a 'Round close-out' (round-9 advice)
case "$RESULT_LINE" in
  *" 0 mismatch,"*" 0 error"*) : ;;
  *)
    echo "close_round: contract gate FAILED: $RESULT_LINE" >&2
    exit 1
    ;;
esac

echo "== bench snapshot (min of 2 fresh processes)"
python bench.py | tail -1 || exit 1

echo "== commit"
git add -A
git commit -m "Round close-out: regenerate artifacts, contract + bench re-run

$RESULT_LINE
Bench protocol: min over 2 fresh processes x 2 reps (BENCH_FULL.json
carries both raw runs)."
git status --short
