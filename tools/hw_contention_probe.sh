#!/bin/bash
# Controlled contention experiment. The round-5 variance analysis claims the
# 4x training-cell swings are host-side: this VM exposes ONE vCPU, and a
# training bench dispatches one jitted step at a time through it, so any
# concurrent host process inflates every dispatch. Test it causally: run the
# b3 default cell in a quiet window, then the identical cell with a pure-CPU
# hog pinned to the same (only) core, then quiet again to bracket.
set -u
cd /root/repo
mkdir -p /tmp/hw_logs
RESULTS=/tmp/hw_results.jsonl
STATUS=/tmp/hw_status.txt
export BENCH_PROBE_DEADLINE_S=900

run_one() {
  local label="$1"; shift
  echo "$(date -u +%H:%M:%S) START $label" >> "$STATUS"
  local log="/tmp/hw_logs/${label}.log"
  timeout 2800 env "$@" > "$log" 2>&1
  local rc=$?
  local line
  line=$(grep -h '^{' "$log" | tail -1)
  echo "{\"label\": \"${label}\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
  echo "$(date -u +%H:%M:%S) DONE  $label rc=$rc" >> "$STATUS"
}

while ! grep -q "round5 consolidated queue complete" "$STATUS" 2>/dev/null; do sleep 30; done
echo "$(date -u +%H:%M:%S) contention probe starting" >> "$STATUS"

run_one ctl_b3_quiet1  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

# CPU hog: one full-speed spinner on the single core for the duration of the
# contended cell only.
( while :; do :; done ) & HOG=$!
run_one ctl_b3_hogged  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
kill "$HOG" 2>/dev/null

run_one ctl_b3_quiet2  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

echo "$(date -u +%H:%M:%S) contention probe complete" >> "$STATUS"
