#!/bin/bash
# Follow-up hardware runs after tools/hw_retry.sh: the round-3-snapshot
# replay of the b3 XLA-backward control (settles VERDICT r4 weak #1 — is the
# r4-measured 0.65 steps/s a code regression or environmental?), plus the AR
# sequential-floor decomposition for BENCHMARKS.md, plus a current-tree
# b3 flash cell for the same-day r3-vs-r5 comparison.
set -u
cd /root/repo
mkdir -p /tmp/hw_logs
RESULTS=/tmp/hw_results.jsonl
STATUS=/tmp/hw_status.txt
export BENCH_PROBE_DEADLINE_S=600

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

for i in $(seq 1 360); do
  if grep -q "retry pass complete" "$STATUS" 2>/dev/null; then break; fi
  sleep 30
done
echo "$(date -u +%H:%M:%S) followup starting" >> "$STATUS"

# Round-3 snapshot replay (same chip, same day): the b3 training control at
# the r3 code state, where the XLA chunked backward was the default.
if [ ! -d /tmp/r3replay ]; then
  git worktree add --detach /tmp/r3replay be6465f >> "$STATUS" 2>&1
fi
( cd /tmp/r3replay && \
  echo "$(date -u +%H:%M:%S) START r3replay_train_b3" >> "$STATUS" && \
  timeout 2800 env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train \
      > /tmp/hw_logs/r3replay_train_b3.log 2>&1; \
  rc=$?; line=$(grep -h '^{' /tmp/hw_logs/r3replay_train_b3.log | tail -1); \
  echo "{\"label\": \"r3replay_train_b3\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"; \
  echo "$(date -u +%H:%M:%S) DONE  r3replay_train_b3 rc=$rc" >> "$STATUS" )

# Current tree, b3 flash backward (the non-control row, same day).
run_one train_b3_flash_today MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

# AR sequential-dependency decomposition (VERDICT r4 #7).
echo "$(date -u +%H:%M:%S) START ar_decompose" >> "$STATUS"
timeout 2800 python tools/bench_ar_decompose.py > /tmp/hw_logs/ar_decompose.log 2>&1
rc=$?
line=$(grep -h '^{' /tmp/hw_logs/ar_decompose.log | tail -1)
echo "{\"label\": \"ar_decompose\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
echo "$(date -u +%H:%M:%S) DONE  ar_decompose rc=$rc" >> "$STATUS"

echo "$(date -u +%H:%M:%S) followup complete" >> "$STATUS"
