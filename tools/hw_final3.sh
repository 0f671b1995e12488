#!/bin/bash
# Variance discrimination pass: run the headline sampling cell and the b3
# training cell BACK TO BACK, twice. If a window degrades training steps/s
# ~4x while sampling holds ~7.8 f/s, the variance is training-step-specific;
# if both degrade together, it's chip/tunnel tenancy. Evidence feeds the
# BENCHMARKS round-5 variance note.
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

for i in $(seq 1 480); do
  if grep -q "final2 complete" "$STATUS" 2>/dev/null; then break; fi
  sleep 30
done
echo "$(date -u +%H:%M:%S) final3 (variance pairs) starting" >> "$STATUS"

run_one pair1_headline  python bench.py
run_one pair1_train_b3  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one pair2_headline  python bench.py
run_one pair2_train_b3  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

echo "$(date -u +%H:%M:%S) final3 complete" >> "$STATUS"
