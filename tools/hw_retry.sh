#!/bin/bash
# Retry the hardware matrix cells that died on probe timeouts (the tunnel's
# first-contact init can exceed bench.py's default 150s deadline). Waits for
# the round-1 matrix script to finish, then re-runs each rc!=0 label with
# BENCH_PROBE_DEADLINE_S=600. Results append to the same JSONL.
set -u
cd /root/repo
mkdir -p /tmp/hw_logs
RESULTS=/tmp/hw_results.jsonl
STATUS=/tmp/hw_status.txt
export BENCH_PROBE_DEADLINE_S=600

run_one() {
  local label="$1"; shift
  # Skip cells that already have a good result.
  if grep -q "\"label\": \"${label}\", \"rc\": 0" "$RESULTS" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) SKIP  $label (already ok)" >> "$STATUS"
    return
  fi
  echo "$(date -u +%H:%M:%S) START $label (retry)" >> "$STATUS"
  local log="/tmp/hw_logs/${label}.log"
  timeout 2800 env "$@" > "$log" 2>&1
  local rc=$?
  local line
  line=$(grep -h '^{' "$log" | tail -1)
  echo "{\"label\": \"${label}\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
  echo "$(date -u +%H:%M:%S) DONE  $label rc=$rc" >> "$STATUS"
}

# Wait for the first matrix run to finish so we never share the chip.
for i in $(seq 1 240); do
  if grep -q "matrix complete" "$STATUS" 2>/dev/null; then break; fi
  sleep 30
done
echo "$(date -u +%H:%M:%S) retry pass starting" >> "$STATUS"

run_one headline_scene_batch4      python bench.py
run_one single_scene_anchored      python bench.py --single-scene
run_one single_scene_ar            python bench.py --single-scene --autoregressive
run_one scene_batch4_ar            python bench.py --scene-batch 4 --autoregressive
run_one train_b1_default           MVLDM_TRAIN_BENCH_BATCH=1 python bench.py --train
run_one train_b3_default           MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one train_b8_default           MVLDM_TRAIN_BENCH_BATCH=8 python bench.py --train
run_one train_b3_lp                MVLDM_TRAIN_BENCH_BATCH=3 MVLDM_TRAIN_BENCH_LP=1 python bench.py --train
run_one train_b8_lp                MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 python bench.py --train
run_one train_b8_lp_latents        MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train
run_one train_b3_xla_bwd           MVLDM_TRAIN_BENCH_BATCH=3 MVLDM_FLASH_BWD=0 python bench.py --train
run_one train_b1_xla_bwd           MVLDM_TRAIN_BENCH_BATCH=1 MVLDM_FLASH_BWD=0 python bench.py --train

echo "$(date -u +%H:%M:%S) retry pass complete" >> "$STATUS"
