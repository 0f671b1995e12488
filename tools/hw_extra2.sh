#!/bin/bash
# Fourth hardware pass: no-remat cells. Block remat recomputes the forward
# (~+1/3 step FLOPs); with bf16 mu+nu freeing ~5.6 GB the larger batches may
# now fit WITHOUT remat — potentially the biggest remaining training win.
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

for i in $(seq 1 480); do
  if grep -q "extra pass complete" "$STATUS" 2>/dev/null; then break; fi
  sleep 30
done
echo "$(date -u +%H:%M:%S) extra2 pass starting" >> "$STATUS"

run_one train_b4_lp_noremat          MVLDM_TRAIN_BENCH_BATCH=4 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train
run_one train_b8_lp_latents_noremat  MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train
run_one train_b8_lp_noremat          MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train

echo "$(date -u +%H:%M:%S) extra2 pass complete" >> "$STATUS"
